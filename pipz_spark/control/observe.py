"""Observation → signal-bus bridge (the consumer side of SURVEY S3).

The reference's Effect processors emit metrics to the capitan bus;
the Spark analog is ``df.observe`` aggregates that materialize with
the action. ``observed_effect`` pairs an Effect step with a
``pyspark.sql.Observation``; ``collect_observation`` reads the values
after the action ran and publishes them as a signal — closing the
loop VERDICT r1 flagged (metrics registered but never read).
"""

from __future__ import annotations

from collections.abc import Mapping
from typing import Any

from pyspark.sql import Column, Observation

from ..core.step import Step
from ..operators.processors import effect
from . import signals as S

EFFECT_OBSERVED = "effect.observed"


def observed_effect(
    name: str,
    metrics: Mapping[str, Column],
    error_when: Column | None = None,
) -> tuple[Step, Observation]:
    """An Effect step whose metrics are readable driver-side. Note an
    Observation binds to ONE action — build a fresh pair per run."""
    obs = Observation(name)
    step = effect(name, metrics=metrics, error_when=error_when, observation=obs)
    return step, obs


def collect_observation(
    obs: Observation,
    name: str = "effect",
    bus: S.SignalBus = S.BUS,
    signal: str = EFFECT_OBSERVED,
) -> dict[str, Any]:
    """Read observed metric values (blocks until the action that
    materialized the observed DataFrame has completed) and emit them
    on the signal bus."""
    values = dict(obs.get)
    bus.emit(signal, name=name, **values)
    return values


def observed_routing(
    name: str,
    labels: Mapping[str, Column],
) -> tuple[Step, Observation]:
    """Per-route counts for routing connectors — the batch face of the
    reference's per-value ``switch.routed`` / ``contest.winner``
    signals (signals.go:7-137). In a vectorized engine routing is a
    projection, so route events are COUNTS aggregated with the action:
    compose the returned step after a switch/contest, run the action,
    then ``collect_observation(obs, name, signal=S.SWITCH_ROUTED)``.

    ``labels`` maps route name → row predicate (e.g. the switch's
    route condition). Adds one observe node — no extra scan, no
    shuffle."""
    from pyspark.sql import functions as F

    metrics = {
        k: F.count(F.when(F.coalesce(cond, F.lit(False)), 1)).alias(k)
        for k, cond in labels.items()
    }
    return observed_effect(name, metrics)
