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


def test_window_calc_excludes_errored_rows_from_frames(spark):
    # an errored row must neither feed the window frame (its value
    # would contaminate every OK row's aggregate in the partition) nor
    # gain update values (r7 review finding)
    from pyspark.sql import Window

    from pipz_spark import P, split_failed, split_ok
    from pipz_spark.core.errors import ensure_error_column

    df = ensure_error_column(
        spark.createDataFrame(
            [("k", 1, 10.0), ("k", 2, 20.0), ("k", 3, 999.0)], "g string, i int, v double"
        )
    )
    poisoned = P.apply("taint", error_when=F.col("v") > 100, message="bad")(df)
    spec = Window.partitionBy("g").orderBy("i")
    out = P.window_calc("run", spec, {"total": F.sum("v")})(poisoned)
    ok = {r["i"]: r["total"] for r in split_ok(out).collect()}
    assert ok == {1: 10.0, 2: 30.0}  # 999.0 never entered the frame
    dead = split_failed(out).collect()
    assert len(dead) == 1 and dead[0]["total"] is None


def test_top_k_preserves_dead_letters_and_slots(spark):
    # errored rows neither win top-k slots nor get cut by the rank
    # filter (r7 review finding)
    from pipz_spark import P, split_failed, split_ok
    from pipz_spark.core.errors import ensure_error_column

    rows = [("g", i, float(i)) for i in range(1, 6)]  # v = 1..5
    df = ensure_error_column(
        spark.createDataFrame(rows, "g string, i int, v double")
    )
    # error the two HIGHEST values — they must not occupy slots
    poisoned = P.apply("taint", error_when=F.col("v") >= 4, message="bad")(df)
    step = P.top_k("top2", 2, order=[F.col("v").desc(), F.col("i")], partition_by=["g"])
    out = step(poisoned)
    kept = sorted(r["i"] for r in split_ok(out).collect())
    assert kept == [2, 3]  # the top-2 of the OK rows
    assert sorted(r["i"] for r in split_failed(out).collect()) == [4, 5]
    # global form: same contract
    out2 = P.top_k("top1", 1, order=[F.col("v").desc()])(poisoned)
    assert [r["i"] for r in split_ok(out2).collect()] == [3]
    assert split_failed(out2).count() == 2


def test_set_ops_accept_step_outputs_and_except_dedups(spark):
    # a Step output (carrying _pipz_error) as the operand used to
    # raise NUM_COLUMNS_MISMATCH; and except is SET difference —
    # surviving duplicates dedup like SQL EXCEPT (r7 review finding)
    from pipz_spark import P, split_ok
    from pipz_spark.core.errors import ensure_error_column

    left = ensure_error_column(
        spark.createDataFrame([(1,), (1,), (2,), (3,)], "k int")
    )
    other_step_out = P.transform("noop", {})(
        ensure_error_column(spark.createDataFrame([(2,), (9,)], "k int"))
    )
    inter = split_ok(P.intersect_with("i", other_step_out)(left))
    assert sorted(r["k"] for r in inter.collect()) == [2]
    exc = split_ok(P.except_with("e", other_step_out)(left))
    assert sorted(r["k"] for r in exc.collect()) == [1, 3]  # 1 deduped, 2 removed


def test_salted_join_and_repartition_guards(spark, orders, customer):
    import pytest

    from pipz_spark import P
    from pipz_spark.core.errors import ensure_error_column

    with pytest.raises(ValueError, match="_salt"):
        P.salted_join("s", customer, on=["o_custkey"])(
            ensure_error_column(orders.withColumn("_salt", F.lit(1)))
        )
    with pytest.raises(ValueError, match="repartition"):
        P.repartition_rows("r")


def test_enrich_rejects_unorderable_lookup_and_prunes_expr_join(spark, orders, customer):
    import pytest

    from pipz_spark import P, split_ok
    from pipz_spark.core.errors import ensure_error_column

    dim = customer.select(
        "c_custkey", F.create_map(F.lit("a"), F.col("c_name")).alias("meta")
    )
    with pytest.raises(ValueError, match="unorderable"):
        P.enrich("e", dim, on=["c_custkey"])(ensure_error_column(orders))
    # raw-Column join + select: the condition's key column must
    # survive pruning; unselected right columns drop after the join
    cond = orders["o_custkey"] == customer["c_custkey"]
    step = P.enrich("e2", customer, on=cond, select={"cust_name": "c_name"})
    out = split_ok(step(ensure_error_column(orders)))
    assert "cust_name" in out.columns and "c_acctbal" not in out.columns
    assert out.where(F.col("cust_name").isNotNull()).count() > 0


def test_enrich_expr_join_colliding_right_columns_dropped(spark, orders, customer):
    # r7 advisory: an unselected right column whose name collides with
    # a left column must not survive the expression join as an
    # ambiguous duplicate — the left column alone remains selectable
    from pipz_spark import P, split_ok
    from pipz_spark.core.errors import ensure_error_column

    dim = customer.withColumn("o_totalprice", F.lit(-1.0))
    cond = orders["o_custkey"] == dim["c_custkey"]
    step = P.enrich("e3", dim, on=cond, select={"cust_name": "c_name"})
    out = split_ok(step(ensure_error_column(orders)))
    assert out.columns.count("o_totalprice") == 1
    # the survivor is the LEFT side's value — and referencing it by
    # name no longer throws AMBIGUOUS_REFERENCE
    assert out.where(F.col("o_totalprice") == -1.0).count() == 0
    assert out.where(F.col("cust_name").isNotNull()).count() > 0
    # r8 review: a caller condition may REFERENCE the colliding right
    # column by bound attribute — the collision fix must not rename
    # it pre-join (a new exprId would fail analysis with
    # MISSING_ATTRIBUTES); the drop happens post-join by bound ref
    cond2 = (orders["o_custkey"] == dim["c_custkey"]) & (dim["o_totalprice"] < 0)
    out2 = split_ok(
        P.enrich("e4", dim, on=cond2, select={"cust_name": "c_name"})(
            ensure_error_column(orders)
        )
    )
    assert out2.columns.count("o_totalprice") == 1
    assert out2.where(F.col("o_totalprice") == -1.0).count() == 0
    assert out2.where(F.col("cust_name").isNotNull()).count() > 0
