"""Unit tests for the data-plane connectors (SURVEY §2.2)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pipz_spark import ERROR_COL, P, split_failed, split_ok


def test_sequence_fail_fast(orders):
    pipe = P.sequence(
        "flow",
        P.apply("validate", error_when=F.col("o_totalprice") <= 0, message="bad total"),
        P.transform("double", {"o_totalprice": F.col("o_totalprice") * 2}),
    )
    out = pipe(orders)
    # errored rows skipped the transform (fail-fast)
    bad = out.where(F.col(ERROR_COL).isNotNull()).select("o_totalprice").collect()
    assert all(r[0] <= 0 for r in bad)
    ok = split_ok(out)
    src_ok = orders.where("o_totalprice > 0")
    assert ok.count() == src_ok.count()


def test_sequence_runtime_modification(orders):
    pipe = P.sequence("flow", P.transform("a", {"x": F.lit(1)}))
    pipe.register(P.transform("b", {"y": F.lit(2)}))
    pipe.before("a", P.transform("z", {"z": F.lit(0)}))
    assert [s.name for s in pipe.children] == ["z", "a", "b"]
    out = pipe(orders)
    assert {"x", "y", "z"} <= set(out.columns)
    pipe.remove("b")
    assert [s.name for s in pipe.children] == ["z", "a"]
    pipe.replace("a", P.transform("a2", {"x": F.lit(9)}))
    assert [s.name for s in pipe.children] == ["z", "a2"]


def test_switch_routing_and_passthrough(orders):
    sw = P.switch(
        "by-status",
        F.col("o_orderstatus"),
        {
            "O": P.transform("open", {"tag": F.lit("open")}),
            "F": P.transform("filled", {"tag": F.lit("filled")}),
        },
    )
    out = split_ok(sw(orders))
    assert out.count() == orders.count()  # no-match passes through
    got = {r["o_orderstatus"]: r["tag"] for r in out.select("o_orderstatus", "tag").distinct().collect()}
    assert got.get("O") == "open"
    assert got.get("F") == "filled"
    assert got.get("P") is None  # passthrough arm: NULL tag


def test_switch_errored_rows_passthrough(orders):
    pipe = P.sequence(
        "flow",
        P.apply("validate", error_when=F.col("o_totalprice") <= 0, message="bad"),
        P.switch(
            "route",
            F.col("o_orderstatus"),
            {"O": P.transform("open", {"tag": F.lit("open")})},
        ),
    )
    out = pipe(orders)
    # errored rows must not be routed/tagged
    bad = out.where(F.col(ERROR_COL).isNotNull())
    assert bad.where(F.col("tag").isNotNull()).count() == 0


def test_filter_conditional_application(customer):
    step = P.filter_if(
        "building-only",
        F.col("c_mktsegment") == "BUILDING",
        P.transform("flag", {"c_acctbal": F.col("c_acctbal") + 1000}),
    )
    out = split_ok(step(customer))
    assert out.count() == customer.count()
    joined = out.select("c_custkey", F.col("c_acctbal").alias("new")).join(
        customer.select("c_custkey", "c_acctbal", "c_mktsegment"), "c_custkey"
    )
    for r in joined.collect():
        expected = r["c_acctbal"] + 1000 if r["c_mktsegment"] == "BUILDING" else r["c_acctbal"]
        assert abs(r["new"] - expected) < 1e-9


def test_concurrent_reducer(lineitem):
    branches = {
        "gross": {"price": F.col("l_extendedprice")},
        "disc": {"price": F.col("l_extendedprice") * (1 - F.col("l_discount"))},
        "taxed": {"price": F.col("l_extendedprice") * (1 + F.col("l_tax"))},
    }
    step = P.concurrent(
        "best-price",
        branches,
        reducer=lambda b: {
            "best_price": F.round(
                F.least(b["gross"]["price"], b["disc"]["price"], b["taxed"]["price"]), 2
            )
        },
    )
    out = split_ok(step(lineitem))
    r = out.select("l_extendedprice", "l_discount", "l_tax", "best_price").first()
    expected = min(
        r["l_extendedprice"],
        r["l_extendedprice"] * (1 - r["l_discount"]),
        r["l_extendedprice"] * (1 + r["l_tax"]),
    )
    assert abs(r["best_price"] - round(expected, 2)) < 1e-6


def test_concurrent_no_reducer_returns_original(orders):
    step = P.concurrent("fanout", {"a": {"x": F.lit(1)}, "b": {"y": F.lit(2)}})
    out = step(orders)
    assert set(out.columns) == set(orders.columns) | {ERROR_COL}


def test_fallback_first_success(orders):
    step = P.fallback(
        "price-source",
        [
            P.Attempt("primary", {"px": F.col("o_totalprice")},
                      fail_when=F.col("o_totalprice") <= 0),
            P.Attempt("backup", {"px": F.lit(0.01)}),
        ],
    )
    out = step(orders)
    assert split_failed(out).count() == 0  # backup always succeeds
    ok = split_ok(out)
    neg = ok.where(F.col("o_totalprice") <= 0)
    assert neg.where(F.col("px") != 0.01).count() == 0
    pos = ok.where(F.col("o_totalprice") > 0)
    assert pos.where(F.col("px") != F.col("o_totalprice")).count() == 0


def test_fallback_all_fail_is_error(orders):
    step = P.fallback(
        "doomed",
        [
            P.Attempt("a", {"px": F.lit(1.0)}, fail_when=F.lit(True)),
            P.Attempt("b", {"px": F.lit(2.0)}, fail_when=F.lit(True)),
        ],
    )
    out = step(orders)
    assert split_failed(out).count() == orders.count()
    err = split_failed(out).select(ERROR_COL).first()[0]
    assert "all 2 attempts failed" in err["message"]
    assert err["path"] == ["doomed"]


def test_race_priority_semantics(orders):
    step = P.race(
        "sources",
        [
            P.Attempt("fast", {"v": F.lit("fast")}, fail_when=F.col("o_orderstatus") == "O"),
            P.Attempt("slow", {"v": F.lit("slow")}),
        ],
    )
    out = split_ok(step(orders))
    o_rows = out.where(F.col("o_orderstatus") == "O")
    assert o_rows.where(F.col("v") != "slow").count() == 0
    rest = out.where(F.col("o_orderstatus") != "O")
    assert rest.where(F.col("v") != "fast").count() == 0


def test_contest_winning_condition(lineitem):
    # cheapest-rate-under-threshold (mirror of contest.go:43-51)
    step = P.contest(
        "best-under-cap",
        condition=lambda u: u["rate"] < 1000.0,
        attempts=[
            P.Attempt("carrier-a", {"rate": F.col("l_extendedprice") * 0.01}),
            P.Attempt("carrier-b", {"rate": F.col("l_extendedprice") * 0.005}),
            P.Attempt("carrier-c", {"rate": F.lit(999.0)}),
        ],
    )
    out = step(lineitem)
    ok = split_ok(out)
    # winner is the FIRST attempt meeting the cap, not the cheapest
    sample = ok.select("l_extendedprice", "rate").collect()
    for r in sample:
        a, b = r["l_extendedprice"] * 0.01, r["l_extendedprice"] * 0.005
        expected = a if a < 1000 else (b if b < 1000 else 999.0)
        assert abs(r["rate"] - expected) < 1e-9


def test_handle_dead_letter(orders):
    captured = {}

    def collect_dlq(failed_df):
        captured["df"] = failed_df

    pipe = P.handle(
        "guarded",
        P.apply("validate", error_when=F.col("o_totalprice") <= 0, message="bad"),
        handler=collect_dlq,
    )
    out = pipe(orders)
    n_bad = orders.where("o_totalprice <= 0").count()
    # original errors pass through unchanged (handle.go:96)
    assert split_failed(out).count() == n_bad
    assert captured["df"].count() == n_bad


def test_plan_json_export(orders):
    pipe = P.sequence(
        "root",
        P.apply("validate", error_when=F.lit(False), message="x"),
        P.switch("route", F.col("o_orderstatus"), {"O": P.transform("t", {"z": F.lit(1)})}),
    )
    node = pipe.to_node()
    assert node["name"] == "root"
    assert node["type"] == "sequence"
    names = [s.name for s in pipe.walk()]
    assert names == ["root", "validate", "route", "t"]
    assert pipe.find_by_name("route").node_type == "switch"
    assert pipe.count() == 4


def test_switch_expression_mode_single_scan(spark):
    # Expression-shaped branches must compile to ONE projection over
    # ONE scan (VERDICT r1: no filter-split/union re-scans).
    df = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    sw = P.switch(
        "by-status",
        F.col("o_orderstatus"),
        {
            "O": {"tag": F.lit("open"), "score": F.col("o_totalprice") * 2},
            "F": {"tag": F.lit("filled")},
        },
        default={"tag": F.lit("other")},
    )
    out = sw(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1
    got = {
        r["o_orderstatus"]: (r["tag"], r["score"])
        for r in out.select("o_orderstatus", "tag", "score").distinct().collect()
    }
    assert got["O"][0] == "open" and got["O"][1] is not None
    assert got["F"] == ("filled", None)
    assert got["P"] == ("other", None)


def test_filter_if_expression_mode_single_scan(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    step = P.filter_if(
        "building-bonus",
        F.col("c_mktsegment") == "BUILDING",
        {"c_acctbal": F.col("c_acctbal") + 1000},
    )
    out = step(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1
    assert out.count() == df.count()


def test_first_qualifying_null_totality(orders):
    # A NULL fail_when must count as a failed attempt, not a silent
    # pass-through: every row ends with a result OR an error.
    null_cond = F.when(F.lit(False), F.lit(True))  # always NULL boolean
    step = P.fallback(
        "maybe",
        [P.Attempt("a", {"px": F.lit(1.0)}, fail_when=~null_cond)],
    )
    out = step(orders)
    # fail_when = NOT NULL = NULL → qual coalesces to False → all error
    assert split_failed(out).count() == orders.count()


def test_winner_takes_whole_result(orders):
    # ADVICE r1: winner is chosen per ROW, not per column. Attempt A
    # (qualifying) sets only x; attempt B (also qualifying) sets x and
    # y. y must stay NULL (input value), never taken from B.
    step = P.race(
        "mixed-columns",
        [
            P.Attempt("a", {"x": F.lit("ax")}),
            P.Attempt("b", {"x": F.lit("bx"), "y": F.lit("by")}),
        ],
    )
    out = split_ok(step(orders))
    assert out.where(F.col("x") != "ax").count() == 0
    assert out.where(F.col("y").isNotNull()).count() == 0


def test_handle_step_handler_executes(orders):
    from pipz_spark.core.step import Step

    seen = {}

    def dlq_fn(df, path):
        seen["n"] = df.count()
        return df

    pipe = P.handle(
        "guarded",
        P.apply("validate", error_when=F.col("o_totalprice") <= 0, message="bad"),
        handler=Step("dlq-counter", dlq_fn),
    )
    out = pipe(orders)
    n_bad = orders.where("o_totalprice <= 0").count()
    assert seen["n"] == n_bad
    assert out.where(F.col(ERROR_COL).isNotNull()).count() == n_bad


def test_plan_render(orders):
    pipe = P.sequence(
        "root",
        P.apply("validate", error_when=F.lit(False), message="x"),
        P.switch("route", F.col("o_orderstatus"), {"O": P.transform("t", {"z": F.lit(1)})}),
    )
    art = pipe.render()
    assert "sequence:root" in art.splitlines()[0]
    assert any("apply:validate" in ln for ln in art.splitlines())
    assert any("transform:t" in ln for ln in art.splitlines())


def test_step_mode_caches_released(spark):
    # switch/filter/handle persist internally per apply; release_caches
    # (called per micro-batch by run_step_stream) must free them so a
    # long-running stream doesn't accumulate cached blocks.
    # (fresh uncached input — the table fixtures are session-cached and
    # would keep their own entry in getPersistentRDDs)
    rows = spark.range(100).select(F.col("id"), (F.col("id") * 10.0).alias("o_totalprice"))
    child = P.apply("noop", error_when=F.lit(False), message="x")
    pipe = P.filter_if("maybe", F.col("o_totalprice") > 100, child)
    sc = spark.sparkContext
    baseline = sc._jsc.getPersistentRDDs().size()
    out = pipe(rows)
    out.count()
    assert sc._jsc.getPersistentRDDs().size() > baseline
    pipe.release_caches()
    assert sc._jsc.getPersistentRDDs().size() == baseline
    # repeated drain is a no-op, and close() still works afterwards
    pipe.release_caches()
    pipe.close()
