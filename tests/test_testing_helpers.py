"""pipz_spark.testing — the public test-helper surface (reference:
testing/helpers.go:38-385 and helpers_test.go)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from pipz_spark import P
from pipz_spark.core.errors import split_failed, split_ok
from pipz_spark.testing import (
    ChaosAction,
    FakeClock,
    FlakyAction,
    MockStep,
    assert_dead_letters,
    assert_df_equal,
    assert_no_dead_letters,
    assert_not_processed,
    assert_processed,
    assert_processed_between,
    chaos_step,
)


def test_mock_step_counts_and_history(orders):
    mock = MockStep("m").with_updates({"flag": F.lit(1)})
    pipe = P.sequence("pipe", mock)
    out = pipe(orders)
    assert_processed(mock, 1)
    assert mock.last_input is not None
    assert split_ok(out).where(F.col("flag") == 1).count() == orders.count()
    out2 = pipe(orders)
    assert_processed_between(mock, 2, 2)
    assert len(mock.calls) == 2
    mock.reset()
    assert_not_processed(mock)
    assert out2 is not None


def test_mock_step_error_injection(orders):
    mock = MockStep("gate").with_error_when(
        F.col("o_totalprice") > 100_000, "too big"
    )
    out = mock(orders)
    n_big = orders.where("o_totalprice > 100000").count()
    assert_dead_letters(out, n_big)
    failed = split_failed(out)
    assert failed.where(F.col("_pipz_error.message") == "too big").count() == n_big


def test_mock_step_raise(spark):
    mock = MockStep("boom").with_raise("mock panic")
    df = spark.range(1)
    with pytest.raises(RuntimeError, match="mock panic"):
        mock(df)


def test_chaos_step_deterministic(orders):
    chaos = chaos_step("chaos", failure_rate=0.1, key_col="o_orderkey")
    n1 = split_failed(chaos(orders)).count()
    n2 = split_failed(chaos(orders)).count()
    assert n1 == n2  # seeded: same rows every run
    total = orders.count()
    assert 0.05 * total < n1 < 0.15 * total
    # errored rows are exempt (no double-fail), rate 0 and 1 behave
    assert split_failed(chaos_step(failure_rate=0.0)(orders)).count() == 0
    assert split_ok(chaos_step(failure_rate=1.0)(orders)).count() == 0
    with pytest.raises(ValueError):
        chaos_step(failure_rate=1.5)


def test_chaos_step_downstream_skip(orders):
    # chaos dead letters skip later steps and survive to the sink —
    # the exact integration a user would chaos-test
    chaos = chaos_step("chaos", failure_rate=0.2, key_col="o_orderkey")
    mark = P.transform("mark", {"seen": F.lit(True)})
    out = P.sequence("pipe", chaos, mark)(orders)
    failed = split_failed(out)
    assert failed.count() > 0
    assert failed.where(F.col("seen").isNull()).count() == failed.count()
    assert_no_dead_letters(split_ok(out))


def test_action_fakes():
    a = ChaosAction(fail_n=2)
    for _ in range(2):
        with pytest.raises(RuntimeError):
            a()
    assert a() == "ok" and a.calls == 3

    f = FlakyAction(fail_on={2})
    assert f() == "ok"
    with pytest.raises(RuntimeError):
        f()
    assert f() == "ok"

    clock = FakeClock()
    clock.sleep(1.5)
    assert clock.now() == 1.5 and clock.sleeps == [1.5]


def test_assert_df_equal(spark):
    a = spark.createDataFrame([(1, "x"), (2, "y")], "id long, v string")
    b = spark.createDataFrame([(2, "y"), (1, "x")], "id long, v string").select("v", "id")
    assert_df_equal(a, b)  # order- and column-order-insensitive
    c = spark.createDataFrame([(1, "x")], "id long, v string")
    with pytest.raises(AssertionError):
        assert_df_equal(a, c)
