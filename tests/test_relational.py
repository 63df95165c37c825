"""Relational Steps: aggregation modes, partition control, skew tools."""

from __future__ import annotations

from pyspark.sql import functions as F

from pipz_spark import P, split_ok


def test_rollup_and_cube(orders):
    base = orders.select("o_orderstatus", "o_orderpriority", "o_totalprice")
    roll = split_ok(
        P.group_agg("r", ["o_orderstatus", "o_orderpriority"], {"n": F.count(F.lit(1))}, mode="rollup")(base)
    )
    cube = split_ok(
        P.group_agg("c", ["o_orderstatus", "o_orderpriority"], {"n": F.count(F.lit(1))}, mode="cube")(base)
    )
    n_status = base.select("o_orderstatus").distinct().count()
    n_prio = base.select("o_orderpriority").distinct().count()
    n_pairs = base.select("o_orderstatus", "o_orderpriority").distinct().count()
    assert roll.count() == n_pairs + n_status + 1
    assert cube.count() == n_pairs + n_status + n_prio + 1
    grand = roll.where(F.col("o_orderstatus").isNull() & F.col("o_orderpriority").isNull())
    assert grand.first()["n"] == base.count()


def test_repartition_and_coalesce(orders):
    out = P.repartition_rows("rp", 4, by=["o_custkey"])(orders)
    assert out.rdd.getNumPartitions() == 4
    out2 = P.coalesce_rows("co", 1)(out)
    assert out2.rdd.getNumPartitions() == 1


def test_persist_step_caches_and_closes(orders):
    step = P.persist_step("cache-here")
    out = step(orders)
    out.count()
    assert out.storageLevel.useMemory or out.storageLevel.useDisk
    step.close()
    assert not (out.storageLevel.useMemory or out.storageLevel.useDisk)


def test_salted_join_matches_plain_join(orders, customer):
    plain = orders.join(
        customer.withColumnRenamed("c_custkey", "o_custkey"), ["o_custkey"], "inner"
    )
    salted = P.salted_join(
        "skew-join",
        customer.withColumnRenamed("c_custkey", "o_custkey"),
        on=["o_custkey"],
        salt=4,
    )(orders)
    assert split_ok(salted).count() == plain.count()
    # spot-check content equivalence
    a = split_ok(salted).select("o_orderkey", "c_name").orderBy("o_orderkey").limit(50).collect()
    b = plain.select("o_orderkey", "c_name").orderBy("o_orderkey").limit(50).collect()
    assert a == b
