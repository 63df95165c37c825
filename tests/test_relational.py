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


def test_bucketed_join_no_exchange(spark, orders, lineitem):
    from pipz_spark.sources.sinks import write_bucketed

    write_bucketed(
        orders.select("o_orderkey", "o_totalprice"),
        "orders_b", buckets=4, bucket_cols=["o_orderkey"], sort_cols=["o_orderkey"],
    )
    write_bucketed(
        lineitem.select("l_orderkey", "l_extendedprice"),
        "lineitem_b", buckets=4, bucket_cols=["l_orderkey"], sort_cols=["l_orderkey"],
    )
    a = spark.table("orders_b")
    b = spark.table("lineitem_b")
    # disable broadcast so the planner must choose SMJ — at real scale
    # neither side fits in memory and this is the shape that matters
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = a.join(b, a["o_orderkey"] == b["l_orderkey"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # the shuffle was paid at write time: SMJ with NO shuffle exchange
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan
        assert joined.count() == orders.join(
            lineitem, orders["o_orderkey"] == lineitem["l_orderkey"]
        ).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_as_of_join_backward_and_strict(spark):
    from pipz_spark.operators.relational import as_of_join

    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (2, 15, "c")], "k long, ts long, tag string"
    )
    right = spark.createDataFrame(
        [(1, 5, 100.0), (1, 20, 200.0), (2, 30, 300.0)], "k long, ts long, v double"
    )
    got = {
        (r["k"], r["ts"]): r["asof_v"]
        for r in as_of_join(left, right, keys=["k"], payload=["v"]).collect()
    }
    # non-strict: equal-ts right row (1,20) is visible to left (1,20);
    # (2,15) has no prior right -> NULL
    assert got == {(1, 10): 100.0, (1, 20): 200.0, (2, 15): None}

    strict = {
        (r["k"], r["ts"]): r["asof_v"]
        for r in as_of_join(left, right, keys=["k"], payload=["v"], strict=True).collect()
    }
    # strict: (1,20) must NOT see the simultaneous right row
    assert strict == {(1, 10): 100.0, (1, 20): 100.0, (2, 15): None}


def test_as_of_join_single_shuffle_no_join(spark):
    # the point of the union-window formulation: ONE exchange on the
    # keys and no Join operator anywhere in the plan
    from pipz_spark.operators.relational import as_of_join

    left = spark.range(100).selectExpr("id % 5 AS k", "id AS ts", "id AS x")
    right = spark.range(50).selectExpr("id % 5 AS k", "id * 2 AS ts", "id AS v")
    plan = (
        as_of_join(left, right, keys=["k"], payload=["v"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_as_of_join_null_payload_row_wins(spark):
    # ASOF semantics attach the latest prior ROW — a NULL payload on
    # that row must come through as NULL, never resurrect an older
    # non-NULL value, and multi-column payloads must never mix fields
    # from different right rows
    from pipz_spark.operators.relational import as_of_join

    left = spark.createDataFrame([(1, 10)], "k long, ts long")
    right = spark.createDataFrame(
        [(1, 5, 100.0, "old"), (1, 8, None, "new")],
        "k long, ts long, v double, tag string",
    )
    row = as_of_join(left, right, keys=["k"], payload=["v", "tag"]).first()
    assert row["asof_v"] is None and row["asof_tag"] == "new"


def test_as_of_join_null_keys_and_null_ts_never_match(spark):
    # join equality never matches NULL keys; a NULL right_ts is never
    # "as of" anything — both must yield NULL payload like the
    # DuckDB ASOF oracle, not a window artifact
    from pipz_spark.operators.relational import as_of_join

    left = spark.createDataFrame([(None, 10), (1, 10)], "k long, ts long")
    right = spark.createDataFrame(
        [(None, 5, 7.0), (1, None, 99.0)], "k long, ts long, v double"
    )
    got = {r["k"]: r["asof_v"] for r in as_of_join(left, right, keys=["k"], payload=["v"]).collect()}
    assert got == {None: None, 1: None}


def test_as_of_join_map_payload_is_supported(spark):
    # map columns cannot appear in a sort order; the deterministic
    # tiebreak must degrade gracefully instead of failing analysis
    from pyspark.sql import functions as F2

    from pipz_spark.operators.relational import as_of_join

    left = spark.createDataFrame([(1, 10)], "k long, ts long")
    right = spark.createDataFrame([(1, 5,)], "k long, ts long").select(
        "k", "ts", F2.create_map(F2.lit("a"), F2.lit("b")).alias("attrs")
    )
    row = as_of_join(left, right, keys=["k"], payload=["attrs"]).first()
    assert row["asof_attrs"] == {"a": "b"}


# ---------------------------------------------------------------- range_join
def _mk_range_frames(spark):
    from pyspark.sql import functions as F2

    # points at varied offsets; intervals shorter than, equal to, and
    # spanning multiple 10-second bins; one degenerate (end < start),
    # one NULL-bounded
    pts = spark.createDataFrame(
        [(i, t) for i, t in enumerate([0, 5, 9, 10, 15, 29, 30, 61, 95, 119, 120, 200])],
        "pid long, sec long",
    ).select("pid", F2.timestamp_seconds("sec").alias("ts"))
    iv = spark.createDataFrame(
        [
            (100, 0, 10),      # one bin, half-open: excludes sec=10
            (101, 5, 35),      # spans 4 bins
            (102, 30, 30),     # empty half-open interval
            (103, 90, 121),    # spans bins, includes 95/119/120
            (104, 50, 40),     # degenerate, must match nothing
            (105, None, 60),   # NULL start, must match nothing
        ],
        "iid long, s long, e long",
    ).select(
        "iid",
        F2.timestamp_seconds("s").alias("start"),
        F2.timestamp_seconds("e").alias("end"),
    )
    return pts, iv


def test_range_join_matches_naive_nonequi(spark):
    from pipz_spark.operators.relational import range_join

    pts, iv = _mk_range_frames(spark)
    got = {
        (r["pid"], r["iid"])
        for r in range_join(pts, iv, "ts", "start", "end", bin_width_us=10_000_000).collect()
    }
    naive = {
        (r["pid"], r["iid"])
        for r in pts.join(
            iv, (pts.ts >= iv.start) & (pts.ts < iv.end), "inner"
        ).collect()
    }
    assert got == naive
    assert (0, 100) in got and (9, 103) in got
    assert all(iid != 104 and iid != 105 for _, iid in got)
    # half-open: point at sec=10 sits exactly at interval 100's end
    assert (3, 100) not in got


def test_range_join_end_inclusive_and_keys(spark):
    from pyspark.sql import functions as F2

    from pipz_spark.operators.relational import range_join

    pts, iv = _mk_range_frames(spark)
    incl = {
        (r["pid"], r["iid"])
        for r in range_join(
            pts, iv, "ts", "start", "end", bin_width_us=10_000_000, end_inclusive=True
        ).collect()
    }
    assert (3, 100) in incl and (10, 103) in incl  # end point now included
    # equi-keys: split both sides into two groups; cross-group pairs vanish
    pts_k = pts.withColumn("g", (F2.col("pid") % 2).cast("long"))
    iv_k = iv.withColumn("g", (F2.col("iid") % 2).cast("long"))
    keyed = {
        (r["pid"], r["iid"])
        for r in range_join(
            pts_k, iv_k, "ts", "start", "end", bin_width_us=10_000_000, keys=["g"]
        ).collect()
    }
    naive_keyed = {
        (r["pid"], r["iid"])
        for r in pts_k.alias("l")
        .join(
            iv_k.alias("r"),
            (F2.col("l.g") == F2.col("r.g"))
            & (F2.col("l.ts") >= F2.col("r.start"))
            & (F2.col("l.ts") < F2.col("r.end")),
            "inner",
        )
        .select(F2.col("l.pid"), F2.col("r.iid"))
        .collect()
    }
    assert keyed == naive_keyed and keyed < incl


def test_range_join_plan_has_no_nested_loop(spark):
    # the whole point of the binning: an equi-join (SortMergeJoin /
    # ShuffledHashJoin / BroadcastHashJoin), never the O(L*R)
    # BroadcastNestedLoopJoin a raw inequality join compiles to
    from pipz_spark.operators.relational import range_join

    pts, iv = _mk_range_frames(spark)
    plan = (
        range_join(pts, iv, "ts", "start", "end", bin_width_us=10_000_000)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    assert "Join" in plan


def test_range_join_overlapping_column_names_resolve(spark):
    # the right side also carries a 'ts' column (a representative
    # timestamp): the exact predicate must resolve via frame-
    # qualified refs instead of raising AMBIGUOUS_REFERENCE
    from pyspark.sql import functions as F2

    from pipz_spark.operators.relational import range_join

    pts, iv = _mk_range_frames(spark)
    iv2 = iv.withColumn("ts", F2.col("start"))
    got = {
        (r["pid"], r["iid"])
        for r in range_join(pts, iv2, "ts", "start", "end", bin_width_us=10_000_000)
        .select(pts["pid"], iv2["iid"])
        .collect()
    }
    base = {
        (r["pid"], r["iid"])
        for r in range_join(pts, iv, "ts", "start", "end", bin_width_us=10_000_000).collect()
    }
    assert got == base


def test_range_join_reserves_bin_column(spark):
    import pytest as _pytest
    from pyspark.sql import functions as F2

    from pipz_spark.operators.relational import range_join

    pts, iv = _mk_range_frames(spark)
    with _pytest.raises(ValueError, match="_bin"):
        range_join(pts.withColumn("_bin", F2.lit(1)), iv, "ts", "start", "end", bin_width_us=10_000_000)
