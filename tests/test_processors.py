"""Unit tests for the five processor adapters (SURVEY §2.1).

Style mirrors the reference's colocated table-driven tests
(reference: transform_test.go / apply_test.go / …): construct
operator → run → assert output + error + path.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pipz_spark import ERROR_COL, P, split_failed, split_ok
from pipz_spark.core.errors import error_path_str


def test_transform_pure(orders):
    step = P.transform("upper", {"o_orderpriority": F.upper("o_orderpriority")})
    out = split_ok(step(orders))
    assert out.count() == orders.count()  # transform cannot fail
    vals = {r[0] for r in out.select("o_orderpriority").distinct().collect()}
    assert all(v == v.upper() for v in vals)


def test_transform_new_column(orders):
    step = P.transform("tax", {"with_tax": F.col("o_totalprice") * 1.1})
    out = step(orders)
    assert "with_tax" in out.columns
    row = out.select("o_totalprice", "with_tax").first()
    assert abs(row["with_tax"] - row["o_totalprice"] * 1.1) < 1e-9


def test_apply_error_routing(orders):
    step = P.apply(
        "validate",
        error_when=F.col("o_totalprice") <= 0,
        message="non-positive total",
    )
    out = step(orders)
    bad = split_failed(out)
    ok = split_ok(out)
    n_bad_src = orders.where("o_totalprice <= 0").count()
    assert bad.count() == n_bad_src
    assert ok.count() == orders.count() - n_bad_src
    if n_bad_src:
        err = bad.select(F.col(ERROR_COL)).first()[0]
        assert err["message"] == "non-positive total"
        assert err["path"] == ["validate"]


def test_apply_skips_updates_on_error(orders):
    step = P.apply(
        "normalize",
        updates={"o_totalprice": F.col("o_totalprice") * 2},
        error_when=F.col("o_totalprice") <= 0,
        message="bad",
    )
    out = step(orders)
    # errored rows keep their original value (update skipped)
    bad = out.where(F.col(ERROR_COL).isNotNull()).select("o_totalprice").collect()
    assert all(r[0] <= 0 for r in bad)


def test_effect_passthrough_and_observe(spark, orders):
    step = P.effect("count-obs", metrics={"n": F.count(F.lit(1))})
    out = step(orders)
    # identical data (pass-through, effect.go:136)
    assert out.drop(ERROR_COL).exceptAll(orders).count() == 0
    collected = out.collect()
    assert len(collected) == orders.count()


def test_effect_error_stops_row(orders):
    step = P.effect("guard", error_when=F.col("o_custkey").isNull(), message="no cust")
    out = step(orders)
    assert split_failed(out).count() == orders.where("o_custkey IS NULL").count()


def test_mutate_conditional(orders):
    step = P.mutate(
        "discount",
        {"o_totalprice": F.round(F.col("o_totalprice") * 0.9, 2)},
        condition=F.col("o_totalprice") > 100,
    )
    out = split_ok(step(orders))
    joined = out.select("o_orderkey", F.col("o_totalprice").alias("new")).join(
        orders.select("o_orderkey", "o_totalprice"), "o_orderkey"
    )
    for r in joined.collect():
        if r["o_totalprice"] > 100:
            # 0.011 tolerance: Spark rounds HALF_UP, Python rounds HALF_EVEN
            assert abs(r["new"] - round(r["o_totalprice"] * 0.9, 2)) < 0.011
        else:
            assert r["new"] == r["o_totalprice"]


def test_enrich_left_join_swallow(orders, customer):
    step = P.enrich(
        "crm",
        customer.withColumnRenamed("c_custkey", "o_custkey"),
        on=["o_custkey"],
        select={"c_name": "c_name"},
    )
    out = split_ok(step(orders))
    assert out.count() == orders.count()  # never drops rows
    assert "c_name" in out.columns
    # orphans survive with NULL enrichment (swallow-on-miss)
    n_match = out.where(F.col("c_name").isNotNull()).count()
    assert 0 < n_match <= orders.count()


def test_enrich_source_failure_is_identity(orders):
    def broken():
        raise RuntimeError("source down")

    step = P.enrich("flaky", broken, on=["o_custkey"])
    out = step(orders)
    assert out.drop(ERROR_COL).exceptAll(orders).count() == 0


def test_error_path_includes_connectors(orders):
    pipe = P.sequence(
        "outer",
        P.sequence(
            "inner",
            P.apply("check", error_when=F.col("o_totalprice") <= 0, message="bad"),
        ),
    )
    out = pipe(orders)
    bad = split_failed(out)
    if bad.count():
        path = bad.select(error_path_str()).first()[0]
        assert path == "outer -> inner -> check"


def test_enrich_assume_unique_skips_preagg(spark, orders, customer):
    from pipz_spark.core.errors import split_ok

    fast = P.enrich(
        "crm", customer, on={"o_custkey": "c_custkey"},
        select={"c_name": "c_name"}, assume_unique=True,
    )
    out = split_ok(fast(orders))
    plan = out._jdf.queryExecution().executedPlan().toString()
    # no aggregation stage on the dim side — just the broadcast join
    assert "HashAggregate" not in plan
    assert out.count() == orders.count()  # PK dim: still 1:1
    # default path keeps the dedup guarantee for non-unique lookups
    dup = customer.unionByName(customer.limit(5))
    safe = P.enrich("crm2", dup, on={"o_custkey": "c_custkey"}, select={"c_name": "c_name"})
    assert split_ok(safe(orders)).count() == orders.count()
