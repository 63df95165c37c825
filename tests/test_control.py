"""Behavioral tests for the driver-side control plane.

Mirrors the reference's strategy: a fault-injecting ChaosAction
(testing/helpers.go:257-385) driven through single connectors and
stacked combinations (testing/integration/
resilience_patterns_test.go:14,99,172).
"""

from __future__ import annotations

import pytest

from pipz_spark.control import (
    ActionTimeout,
    CircuitBreaker,
    CircuitOpenError,
    Pipeline,
    RateLimiter,
    RateLimitExceeded,
    SignalBus,
    backoff,
    retry,
    scaffold,
    timeout,
    worker_pool,
)
from pipz_spark.control import signals as S

# the fault injectors these tests drove ad-hoc in round 1 are now the
# engine's PUBLIC testing surface (pipz_spark.testing, mirroring the
# reference's testing/helpers.go) — the tests consume them as users do
from pipz_spark.testing import ChaosAction, FakeClock


def test_retry_first_success_no_extra_calls():
    a = ChaosAction(fail_n=0)
    assert retry(a, max_attempts=3) == "ok"
    assert a.calls == 1


def test_retry_recovers_then_exhausts():
    a = ChaosAction(fail_n=2)
    assert retry(a, max_attempts=3) == "ok"
    assert a.calls == 3
    b = ChaosAction(fail_n=5)
    with pytest.raises(RuntimeError, match="chaos failure #2"):
        retry(b, max_attempts=2)


def test_backoff_exponential_delays():
    clock = FakeClock()
    a = ChaosAction(fail_n=3)
    assert backoff(a, max_attempts=4, base_delay=0.1, sleep=clock.sleep) == "ok"
    assert clock.sleeps == [0.1, 0.2, 0.4]


def test_timeout_fast_child_passes_slow_child_flagged():
    assert timeout(lambda: "fast", seconds=5.0) == "fast"
    import time

    with pytest.raises(ActionTimeout) as ei:
        timeout(lambda: time.sleep(2), seconds=0.05, name="slow-op")
    assert ei.value.timeout is True
    assert "slow-op" in str(ei.value)


def test_circuit_breaker_state_machine():
    clock = FakeClock()
    bus = SignalBus()
    seen: list[str] = []
    bus.on_any(lambda sig, f: seen.append(sig))
    cb = CircuitBreaker(
        "db", failure_threshold=3, reset_timeout=10.0,
        success_threshold=2, clock=clock.now, bus=bus,
    )
    boom = ChaosAction(fail_n=100)
    for _ in range(3):
        with pytest.raises(RuntimeError):
            cb.call(boom)
    assert cb.state == CircuitBreaker.OPEN
    with pytest.raises(CircuitOpenError):
        cb.call(lambda: "nope")  # fast-fail while open
    clock.t += 11.0
    assert cb.state == CircuitBreaker.HALF_OPEN
    assert cb.call(lambda: "a") == "a"
    assert cb.state == CircuitBreaker.HALF_OPEN  # needs 2 successes
    assert cb.call(lambda: "b") == "b"
    assert cb.state == CircuitBreaker.CLOSED
    assert S.BREAKER_OPENED in seen and S.BREAKER_CLOSED in seen
    assert S.BREAKER_REJECTED in seen and S.BREAKER_HALF_OPEN in seen


def test_circuit_breaker_half_open_failure_reopens():
    clock = FakeClock()
    cb = CircuitBreaker("api", failure_threshold=1, reset_timeout=5.0, clock=clock.now)
    with pytest.raises(RuntimeError):
        cb.call(ChaosAction(fail_n=1))
    assert cb.state == CircuitBreaker.OPEN
    clock.t += 6.0
    with pytest.raises(RuntimeError):
        cb.call(ChaosAction(fail_n=1))
    assert cb.state == CircuitBreaker.OPEN


def test_rate_limiter_wait_mode_throttles():
    clock = FakeClock()
    rl = RateLimiter("api", rate=10.0, burst=2, mode="wait",
                     clock=clock.now, sleep=clock.sleep)
    for _ in range(2):
        rl.acquire()  # burst tokens, no wait
    assert clock.sleeps == []
    rl.acquire()  # empty bucket → waits 1/rate
    assert len(clock.sleeps) == 1
    assert abs(clock.sleeps[0] - 0.1) < 1e-9


def test_rate_limiter_drop_mode_raises():
    clock = FakeClock()
    rl = RateLimiter("api", rate=1.0, burst=1, mode="drop", clock=clock.now)
    rl.acquire()
    with pytest.raises(RateLimitExceeded):
        rl.acquire()
    clock.t += 1.0  # refill one token
    rl.acquire()


def test_worker_pool_bounded_first_error_wins():
    import threading

    peak = {"n": 0, "cur": 0}
    lock = threading.Lock()

    def task():
        with lock:
            peak["cur"] += 1
            peak["n"] = max(peak["n"], peak["cur"])
        import time

        time.sleep(0.02)
        with lock:
            peak["cur"] -= 1

    worker_pool([task] * 6, workers=2)
    assert peak["n"] <= 2

    def bad():
        raise ValueError("first failure")

    with pytest.raises(ValueError, match="first failure"):
        worker_pool([task, bad, task], workers=3)


def test_scaffold_fire_and_forget_drops_errors():
    import threading

    done = threading.Event()

    def ok_task():
        done.set()

    def bad_task():
        raise RuntimeError("dropped silently")

    scaffold([bad_task, ok_task])
    assert done.wait(timeout=2.0)


# -- stacked resilience (resilience_patterns_test.go:14,99,172) -------
def test_stack_breaker_around_retry():
    clock = FakeClock()
    cb = CircuitBreaker("svc", failure_threshold=2, reset_timeout=30.0, clock=clock.now)
    flaky = ChaosAction(fail_n=1)
    # retry absorbs the transient failure; breaker sees one success
    assert cb.call(lambda: retry(flaky, max_attempts=3)) == "ok"
    assert cb.state == CircuitBreaker.CLOSED
    # persistent failure: retry exhausts twice → breaker opens
    for _ in range(2):
        with pytest.raises(RuntimeError):
            cb.call(lambda: retry(ChaosAction(fail_n=99), max_attempts=2))
    assert cb.state == CircuitBreaker.OPEN


def test_stack_ratelimit_then_backoff():
    clock = FakeClock()
    rl = RateLimiter("out", rate=100.0, burst=1, mode="wait",
                     clock=clock.now, sleep=clock.sleep)
    flaky = ChaosAction(fail_n=2)
    result = backoff(
        lambda: rl.call(flaky), max_attempts=3, base_delay=0.5, sleep=clock.sleep
    )
    assert result == "ok"
    assert 0.5 in clock.sleeps and 1.0 in clock.sleeps


def test_stack_timeout_with_fallback():
    import time

    def slow_primary():
        time.sleep(2)
        return "primary"

    def fast_backup():
        return "backup"

    try:
        got = timeout(slow_primary, seconds=0.05)
    except ActionTimeout:
        got = fast_backup()
    assert got == "backup"


def test_pipeline_run_ids(spark, orders):
    from pyspark.sql import functions as F

    from pipz_spark import P

    bus = SignalBus()
    events: list[dict] = []
    bus.on(S.PIPELINE_COMPLETED, lambda sig, f: events.append(f))
    pipe = Pipeline(
        "flow", P.transform("t", {"x": F.lit(1)}), bus=bus
    )
    out1 = pipe.run(spark, orders)
    ex1 = pipe.last_execution_id
    out2 = pipe.run(spark, orders)
    ex2 = pipe.last_execution_id
    assert out1.count() == orders.count() and out2.count() == orders.count()
    assert ex1 != ex2  # fresh execution UUID per run (pipeline.go:52-55)
    assert events[0]["pipeline_id"] == events[1]["pipeline_id"]  # stable
    assert pipe.to_node()["type"] == "pipeline"


def test_race_actions_first_success_wins():
    import time

    from pipz_spark.control import race_actions

    def slow_ok():
        time.sleep(1.0)
        return "slow"

    def fast_ok():
        time.sleep(0.05)
        return "fast"

    def fast_fail():
        raise RuntimeError("nope")

    t0 = time.time()
    assert race_actions([slow_ok, fast_ok, fast_fail]) == "fast"
    assert time.time() - t0 < 0.9  # did not wait for the slow one


def test_race_actions_all_fail_raises_last():
    import pytest as _pytest

    from pipz_spark.control import race_actions

    def boom_a():
        raise ValueError("a")

    def boom_b():
        raise ValueError("b")

    with _pytest.raises(ValueError):
        race_actions([boom_a, boom_b])


def test_fallback_actions_emits_signals():
    from pipz_spark.control import fallback_actions

    bus = SignalBus()
    seen = []
    bus.on_any(lambda sig, f: seen.append((sig, f.get("attempt"))))
    result = fallback_actions(
        [ChaosAction(fail_n=1), lambda: "secondary"], name="src", bus=bus
    )
    assert result == "secondary"
    assert (S.FALLBACK_ATTEMPT, 0) in seen
    assert (S.FALLBACK_FAILED, 0) in seen
    assert (S.FALLBACK_ATTEMPT, 1) in seen
    # all-fail raises the LAST error (fallback.go:131)
    with pytest.raises(RuntimeError, match="chaos failure"):
        fallback_actions([ChaosAction(fail_n=9), ChaosAction(fail_n=9)], bus=bus)


def test_write_split_emits_sequence_completed(spark, orders, tmp_path):
    from pipz_spark import P
    from pipz_spark.sources.sinks import write_split
    from pyspark.sql import functions as F

    bus = SignalBus()
    seen = []
    bus.on(S.SEQUENCE_COMPLETED, lambda sig, f: seen.append(f))
    out = P.apply("gate", error_when=F.col("o_totalprice") <= 0, message="bad")(orders)
    counts = write_split(
        out,
        str(tmp_path / "ok"),
        str(tmp_path / "dead"),
        name="nightly",
        bus=bus,
    )
    assert seen and seen[0]["name"] == "nightly"
    assert seen[0]["ok"] == counts["ok"]
    assert seen[0]["dead_letter"] == counts["dead_letter"]


def test_handle_emits_error_handled(spark, orders):
    from pipz_spark import P
    from pyspark.sql import functions as F

    seen = []
    S.BUS.on(S.HANDLE_ERROR_HANDLED, lambda sig, f: seen.append(f))
    try:
        pipe = P.handle(
            "guarded",
            P.apply("validate", error_when=F.col("o_totalprice") <= 0, message="bad"),
            handler=lambda failed: None,
        )
        pipe(orders)
        n_bad = orders.where("o_totalprice <= 0").count()
        assert seen and seen[0]["handled"] == n_bad
    finally:
        S.BUS.clear()


def test_handle_ignores_on_any_only_listeners(spark, orders):
    """A generic on_any logger must NOT opt handle into the extra
    count() action; only naming the signal does (ADVICE r3). Since r5
    the on_any audience still SEES the lifecycle event — with the
    count field absent (None), not a silently skipped emission
    (ADVICE r4)."""
    from pipz_spark import P
    from pyspark.sql import functions as F

    bus = SignalBus()
    seen_any = []
    bus.on_any(lambda sig, f: seen_any.append((sig, f.get("handled"))))
    pipe = P.handle(
        "guarded",
        P.apply("validate", error_when=F.col("o_totalprice") <= 0, message="bad"),
        handler=lambda failed: None,
        bus=bus,
    )
    pipe(orders).count()
    assert (S.HANDLE_ERROR_HANDLED, None) in seen_any  # visible, count-free
    # naming the signal opts in, on the SAME injected bus
    seen = []
    bus.on(S.HANDLE_ERROR_HANDLED, lambda sig, f: seen.append(f))
    pipe2 = P.handle(
        "guarded2",
        P.apply("validate", error_when=F.col("o_totalprice") <= 0, message="bad"),
        handler=lambda failed: None,
        bus=bus,
    )
    pipe2(orders).count()
    assert seen and seen[0]["name"] == "guarded2"


def test_observed_filter_evaluated_counts(spark, orders):
    from pipz_spark import P
    from pipz_spark.control import collect_observation, observed_filter
    from pyspark.sql import functions as F

    bus = SignalBus()
    seen = []
    bus.on(S.FILTER_EVALUATED, lambda sig, f: seen.append(f))
    cond = F.col("o_orderpriority") == "1-URGENT"
    flt = P.filter_if("urgent", cond, {"flagged": F.lit(True)})
    counter, obs = observed_filter("urgent-evals", cond)
    out = counter.apply(flt(orders), ())
    out.count()
    vals = collect_observation(obs, "urgent", bus=bus, signal=S.FILTER_EVALUATED)
    n_hit = orders.where("o_orderpriority = '1-URGENT'").count()
    assert vals["processed"] == n_hit
    assert vals["passed_through"] == orders.count() - n_hit
    assert seen and seen[0]["processed"] == n_hit


def test_contest_winner_counts(spark, orders):
    from pipz_spark import P
    from pipz_spark.control import collect_observation, observed_routing, winner_labels
    from pipz_spark.operators.connectors import Attempt
    from pyspark.sql import functions as F

    bus = SignalBus()
    seen = []
    bus.on(S.CONTEST_WINNER, lambda sig, f: seen.append(f))
    attempts = [
        Attempt("big", {"tier": F.lit("big")}, fail_when=F.col("o_totalprice") < 100000),
        Attempt("any", {"tier": F.lit("any")}),
    ]
    cond = lambda u: F.lit(True)  # noqa: E731 — winning condition: any success
    contest = P.contest("tiering", cond, attempts)
    counter, obs = observed_routing("tier-winners", winner_labels(attempts, cond))
    out = contest(counter(orders))
    out.count()
    vals = collect_observation(obs, "tiering", bus=bus, signal=S.CONTEST_WINNER)
    n_big = orders.where("o_totalprice >= 100000").count()
    assert vals["big"] == n_big
    assert vals["any"] == orders.count() - n_big
    # the observed counts agree with the contest's actual routing
    from pipz_spark import split_ok

    assert split_ok(out).where("tier = 'big'").count() == n_big
    assert seen and seen[0]["any"] == orders.count() - n_big


def test_observed_concurrent_completed(spark, orders):
    from pipz_spark.control import collect_observation, observed_concurrent
    from pyspark.sql import functions as F

    bus = SignalBus()
    seen = []
    bus.on(S.CONCURRENT_COMPLETED, lambda sig, f: seen.append(f))
    step, obs = observed_concurrent(
        "fanout",
        {
            "a": {"x2": F.col("o_totalprice") * 2},
            "b": {"half": F.col("o_totalprice") / 2},
        },
    )
    step(orders).count()
    collect_observation(obs, "fanout", bus=bus, signal=S.CONCURRENT_COMPLETED)
    assert seen and seen[0]["rows"] == orders.count()


def test_observed_routing_switch_counts(spark, orders):
    from pipz_spark import P
    from pipz_spark.control import collect_observation, observed_routing
    from pyspark.sql import functions as F

    bus = SignalBus()
    seen = []
    bus.on(S.SWITCH_ROUTED, lambda sig, f: seen.append(f))
    route = F.col("o_orderstatus")
    sw = P.switch("route", route, {"O": {"z": F.lit(1)}, "F": {"z": F.lit(2)}})
    counter, obs = observed_routing("route-counts", {"O": route == "O", "F": route == "F"})
    out = counter.apply(sw(orders), ())
    out.count()  # the action that materializes the observation
    vals = collect_observation(obs, "route", bus=bus, signal=S.SWITCH_ROUTED)
    assert vals["O"] == orders.where("o_orderstatus = 'O'").count()
    assert seen and seen[0]["F"] == orders.where("o_orderstatus = 'F'").count()


def test_breaker_signal_handler_may_inspect_breaker():
    # signals must emit OUTSIDE the breaker's non-reentrant lock: a
    # handler reading .state / snapshot() deadlocked permanently
    # before r7 (the RateLimiter had the same fix earlier)
    bus = SignalBus()
    states = []
    br = CircuitBreaker("b", failure_threshold=2, reset_timeout=0.0, bus=bus)
    bus.on(S.BREAKER_OPENED, lambda sig, f: states.append(br.state))
    bus.on(S.BREAKER_HALF_OPEN, lambda sig, f: states.append(br.snapshot()["state"]))

    def boom():
        raise RuntimeError("x")

    for _ in range(2):
        with pytest.raises(RuntimeError):
            br.call(boom)
    # reset_timeout=0 → next inspection half-opens; the handler
    # re-entering .state/.snapshot() must not deadlock
    assert br.state == CircuitBreaker.HALF_OPEN
    assert states and states[0] in (
        CircuitBreaker.OPEN,
        CircuitBreaker.HALF_OPEN,  # 0s reset: state may flip by handler time
    )


def test_breaker_restore_rejects_garbage_state():
    br = CircuitBreaker("b", failure_threshold=2)
    with pytest.raises(ValueError, match="invalid breaker snapshot"):
        br.restore({"state": "totally-bogus"})


def test_rate_limiter_validates_rate_and_burst_and_clamps_restore():
    with pytest.raises(ValueError, match="rate"):
        RateLimiter("r", rate=0, burst=5)
    with pytest.raises(ValueError, match="burst"):
        RateLimiter("r", rate=2, burst=0)
    # corrupted snapshot tokens clamp into [0, burst] instead of
    # scheduling a ~1e9/rate-second sleep
    lim = RateLimiter("r", rate=1000.0, burst=2, mode="wait")
    lim.restore({"tokens": -1e9})
    lim.acquire()  # refills from 0 at 1000/s — returns immediately-ish


def test_race_actions_timeout_raises_action_timeout():
    import time

    from pipz_spark.control import race_actions

    def slow():
        time.sleep(30)
        return "late"

    t0 = time.monotonic()
    with pytest.raises(ActionTimeout):
        race_actions([slow, slow], timeout_seconds=0.2)
    assert time.monotonic() - t0 < 5  # expired at the deadline, not at join


def test_race_actions_skipped_losers_do_not_mask_winner():
    import time

    from pipz_spark.control import race_actions

    def fast():
        return 42

    def slow():
        time.sleep(0.3)
        return 7

    assert race_actions([slow, fast]) == 42


def test_pipeline_attributed_restores_outer_job_group(spark):
    from pipz_spark.core.step import Step

    ident = Step("id", lambda df, path: df)
    pipe = Pipeline("p", ident)
    sc = spark.sparkContext
    sc.setJobGroup("outer-group", "outer")
    try:
        with pipe.attributed(spark):
            assert sc.getLocalProperty("spark.jobGroup.id").startswith("pipz:p:")
        # the OUTER attribution must survive (clearing it would strand
        # the caller's later actions unattributed — r7 review finding)
        assert sc.getLocalProperty("spark.jobGroup.id") == "outer-group"
    finally:
        sc._jsc.clearJobGroup()
