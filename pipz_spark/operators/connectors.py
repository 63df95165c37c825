"""Pipeline-level combinators (the reference's connectors).

Data-plane connectors compile to lazy DataFrame algebra:

  Sequence  (sequence.go:67-172)   fold of Steps; fail-fast = per-row
                                   error guard, Catalyst fuses steps
  Switch    (switch.go:76-127)     route key → branch; no match = pass
  Filter    (filter.go:66-118)     cond ? step(x) : x  (NOT row drop)
  Concurrent(concurrent.go:118-250) N branch derivations in ONE pass +
                                   reducer expression (no clones needed:
                                   DataFrames are immutable)
  Race      (race.go:58-159)       batch semantic: first success BY
                                   DECLARED PRIORITY (documented
                                   divergence from wall-clock racing;
                                   SURVEY §7.3.3)
  Contest   (contest.go:64-190)    first by priority that succeeds AND
                                   meets the winning condition
  Fallback  (fallback.go:59-144)   declaration-order first success
  Handle    (handle.go:60-120)     dead-letter split; original error
                                   passes through unchanged

Control-plane connectors (Retry/Backoff/Timeout/CircuitBreaker/
RateLimiter/WorkerPool/Scaffold) wrap driver-side ACTIONS, not rows —
see pipz_spark.control.
"""

from __future__ import annotations

from collections.abc import Callable, Mapping, Sequence as Seq
from dataclasses import dataclass, field
from functools import reduce as _reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..core.errors import ERROR_COL, is_ok, make_error
from ..core.step import Step, identity_step
from .processors import _guarded, _resolve, Updates

_ROUTE = "_pipz_route"


class Sequence(Step):
    """Ordered fail-fast chain; output of step i feeds step i+1.

    Runtime-mutable like the reference (sequence.go:87-303); each
    apply() snapshots the current child list (the analog of the
    reference's snapshot-under-RLock, sequence.go:118-121).
    """

    node_type = "sequence"

    def __init__(self, name: str, *steps: Step) -> None:
        # the children setter below routes this into self._steps
        super().__init__(name, self._run, node_type="sequence", children=tuple(steps))

    @property
    def children(self) -> tuple[Step, ...]:  # type: ignore[override]
        return tuple(self._steps)

    @children.setter
    def children(self, value: tuple[Step, ...]) -> None:
        # Step.__init__ assigns children; route it into the live list.
        self._steps = list(value)

    def _run(self, df: DataFrame, path: tuple[str, ...]) -> DataFrame:
        snapshot = list(self._steps)
        return _reduce(lambda acc, s: s.apply(acc, path), snapshot, df)

    # -- runtime modification API (mirror of sequence.go:87-303) ------
    def register(self, *steps: Step) -> "Sequence":
        self._steps.extend(steps)
        return self

    push = register

    def unshift(self, *steps: Step) -> "Sequence":
        self._steps[:0] = list(steps)
        return self

    def pop(self) -> Step:
        return self._steps.pop()

    def shift(self) -> Step:
        return self._steps.pop(0)

    def remove(self, name: str) -> "Sequence":
        self._steps = [s for s in self._steps if s.name != name]
        return self

    def replace(self, name: str, step: Step) -> "Sequence":
        self._steps = [step if s.name == name else s for s in self._steps]
        return self

    def after(self, name: str, *steps: Step) -> "Sequence":
        idx = self._names().index(name) + 1
        self._steps[idx:idx] = list(steps)
        return self

    def before(self, name: str, *steps: Step) -> "Sequence":
        idx = self._names().index(name)
        self._steps[idx:idx] = list(steps)
        return self

    def clear(self) -> "Sequence":
        self._steps.clear()
        return self

    def _names(self) -> list[str]:
        return [s.name for s in self._steps]


def sequence(name: str, *steps: Step) -> Sequence:
    return Sequence(name, *steps)


def switch(
    name: str,
    route_key: Column,
    routes: Mapping[str, Step],
    default: Step | None = None,
) -> Step:
    """Per-row routing on a string key; unmatched rows pass through
    unchanged (switch.go:104-107).

    Implementation: filter-split per route + unionByName. Each branch
    filter lands next to the scan, so Catalyst prunes per branch; at
    100 TB, prefer expression-style branches (Transform/Mutate steps)
    so AQE can coalesce the union's partitions. Errored rows always
    take the passthrough arm (they must skip processing).
    """
    branch_steps = dict(routes)

    def fn(df: DataFrame, path: tuple[str, ...]) -> DataFrame:
        routed = df.withColumn(_ROUTE, F.when(is_ok(), route_key))
        outs: list[DataFrame] = []
        keys = list(branch_steps.keys())
        for key, child in branch_steps.items():
            arm = routed.where(F.col(_ROUTE).eqNullSafe(F.lit(key)))
            outs.append(child.apply(arm, path))
        rest = routed.where(
            ~F.coalesce(F.col(_ROUTE).isin(keys), F.lit(False))
        )
        if default is not None:
            rest = default.apply(rest, path)
        outs.append(rest)
        out = _reduce(
            lambda a, b: a.unionByName(b, allowMissingColumns=True), outs
        )
        return out.drop(_ROUTE)

    children = tuple(branch_steps.values()) + ((default,) if default else ())
    return Step(
        name,
        fn,
        node_type="switch",
        children=children,
        metadata={"routes": list(branch_steps.keys())},
    )


def filter_if(name: str, condition: Column, child: Step) -> Step:
    """Conditional application: condition true → child(x), else x.

    This is the reference's Filter (filter.go:94-97) — NOT row
    elimination. (Row-dropping selection is plain ``where_rows``.)
    """

    def fn(df: DataFrame, path: tuple[str, ...]) -> DataFrame:
        # null-safe: a NULL condition counts as "no hit" (row passes through)
        hit_cond = F.coalesce(is_ok() & condition, F.lit(False))
        processed = child.apply(df.where(hit_cond), path)
        miss = df.where(~hit_cond)
        return processed.unionByName(miss, allowMissingColumns=True)

    return Step(name, fn, node_type="filter", children=(child,))


@dataclass
class Attempt:
    """One fallible derivation for Race/Contest/Fallback.

    ``updates`` computes candidate column values from the input row;
    ``fail_when`` (evaluated on the input row) marks the attempt
    failed — the batch analog of the processor returning an error.
    """

    name: str
    updates: dict[str, Column]
    fail_when: Column | None = None
    metadata: dict = field(default_factory=dict)

    def ok(self) -> Column:
        return F.lit(True) if self.fail_when is None else ~self.fail_when


def _first_qualifying(
    name: str,
    node_type: str,
    attempts: Seq[Attempt],
    qualifies: Callable[[Attempt], Column],
    all_fail_message: str,
) -> Step:
    """Shared engine for Race/Contest/Fallback batch semantics: pick,
    per row, the first attempt (declaration order) whose ``qualifies``
    predicate holds; if none, the row errors (last-error semantics,
    fallback.go:138-143 / contest.go:174-189).

    All candidate expressions evaluate in ONE projection over ONE scan
    — the batch improvement over goroutine-per-branch + clones
    (concurrent.go:180): no data copies, no coordination.
    """
    if not attempts:
        raise ValueError(f"{node_type} '{name}' needs at least one attempt")
    target_cols: list[str] = list(
        dict.fromkeys(c for a in attempts for c in a.updates)
    )

    def fn(df: DataFrame, path: tuple[str, ...]) -> DataFrame:
        quals = [qualifies(a) for a in attempts]
        updates: dict[str, Column] = {}
        for col in target_cols:
            expr: Column | None = None
            chain = F
            for a, q in zip(attempts, quals):
                if col not in a.updates:
                    continue
                chain = chain.when(q, a.updates[col])  # type: ignore[assignment]
            fallback_val = F.col(col) if col in df.columns else F.lit(None)
            expr = chain.otherwise(fallback_val)  # type: ignore[union-attr]
            updates[col] = expr
        none_qualify = ~_reduce(lambda a, b: a | b, quals)
        err = make_error(list(path), all_fail_message)
        df = df.withColumn(
            ERROR_COL,
            F.when(is_ok() & none_qualify, err).otherwise(F.col(ERROR_COL)),
        )
        return _guarded(df, updates)

    return Step(
        name,
        fn,
        node_type=node_type,
        metadata={"attempts": [a.name for a in attempts]},
    )


def fallback(name: str, attempts: Seq[Attempt]) -> Step:
    """Declaration-order first-success (fallback.go:90-143)."""
    return _first_qualifying(
        name, "fallback", attempts, lambda a: a.ok(),
        all_fail_message=f"{name}: all {len(attempts)} attempts failed",
    )


def race(name: str, attempts: Seq[Attempt]) -> Step:
    """First success wins. Batch semantic = first by declared priority
    (deterministic; documented divergence from wall-clock racing,
    race.go:123 / SURVEY §7.3.3). For true concurrent multi-source
    reads use pipz_spark.control.WorkerPool driver-side."""
    return _first_qualifying(
        name, "race", attempts, lambda a: a.ok(),
        all_fail_message=f"{name}: all {len(attempts)} competitors failed",
    )


def contest(
    name: str,
    condition: Callable[[Mapping[str, Column]], Column],
    attempts: Seq[Attempt],
) -> Step:
    """First (by priority) that succeeds AND whose RESULT meets the
    winning condition (contest.go:144-158); none → error with the
    original value intact (contest.go:174-189)."""
    return _first_qualifying(
        name,
        "contest",
        attempts,
        lambda a: a.ok() & condition(a.updates),
        all_fail_message=f"{name}: no attempt met the winning condition",
    )


def concurrent(
    name: str,
    branches: Mapping[str, Updates],
    reducer: Callable[[Mapping[str, Mapping[str, Column]]], Mapping[str, Column]]
    | None = None,
) -> Step:
    """Run N derivations per row; reducer combines (concurrent.go:108).

    Without a reducer the original input is returned unchanged —
    side-effect fan-out (concurrent.go:222); branch expressions are
    still registered as observations so their cost is explicit.
    With a reducer, all branches + the reduction compile into ONE
    projection (Spark evaluates the N branches with partition
    parallelism for free — no goroutines, no Cloner copies).
    """

    def fn(df: DataFrame, path: tuple[str, ...]) -> DataFrame:
        resolved = {b: dict(_resolve(u, df)) for b, u in branches.items()}
        if reducer is None:
            return df
        return _guarded(df, dict(reducer(resolved)))

    return Step(
        name,
        fn,
        node_type="concurrent",
        metadata={"branches": list(branches.keys()), "reduced": reducer is not None},
    )


def handle(
    name: str,
    child: Step,
    handler: Callable[[DataFrame], None] | Step,
) -> Step:
    """Dead-letter pattern (handle.go:69-120): on child errors, feed
    the failed rows to an observation/cleanup handler; the ORIGINAL
    errors pass through unchanged (handle.go:96) — handler output is
    discarded and error rows stay excluded downstream.
    """

    def fn(df: DataFrame, path: tuple[str, ...]) -> DataFrame:
        out = child.apply(df, path)
        failed = out.where(F.col(ERROR_COL).isNotNull())
        try:
            if isinstance(handler, Step):
                handler.apply(failed, path)  # lazy observation pipeline
            else:
                handler(failed)
        except Exception:
            pass  # handler errors ignored (handle.go:94)
        return out

    return Step(name, fn, node_type="handle", children=(child,))


# Row-dropping selection — native engine capability beyond the
# reference (SURVEY §2.4: "row elimination exists only as
# error-routing"); plain df.where under the hood.
def where_rows(name: str, condition: Column) -> Step:
    def fn(df: DataFrame, path: tuple[str, ...]) -> DataFrame:
        return df.where(condition | F.col(ERROR_COL).isNotNull())

    return Step(name, fn, node_type="where")


__all__ = [
    "Sequence",
    "sequence",
    "switch",
    "filter_if",
    "Attempt",
    "fallback",
    "race",
    "contest",
    "concurrent",
    "handle",
    "where_rows",
    "identity_step",
]
