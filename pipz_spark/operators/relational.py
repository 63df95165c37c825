"""Relational Steps — native engine capabilities beyond the reference.

SURVEY §2.4: the reference has no group-by, windows, sorts, limits,
set ops, or general joins (joins exist only as the Enrich lookup
pattern, aggregation only as Concurrent's per-value reducer). An
analytics engine needs them natively, so they are first-class Steps
here, compiled to the corresponding Catalyst operators (hash
aggregate with map-side partial agg, sort-merge/broadcast joins,
window exec) — nothing hand-rolled.

Error-column semantics: operators compute from the happy path only.
Where the output schema still matches the input (distinct, set ops,
dedup), errored rows PASS THROUGH unchanged so upstream dead letters
reach the sink — fail-fast skips rows, it never deletes them.
Aggregations (group_agg, profile) genuinely change shape, so errored
rows cannot appear in their output — land the dead letter (Handle /
write_split) BEFORE aggregating. Row-preserving operators
(sort/limit/join) carry the error column through untouched.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence as Seq

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F

from ..core.errors import ERROR_COL, ensure_error_column, is_ok, null_error
from ..core.step import Step


def _ok_only(df: DataFrame) -> DataFrame:
    return ensure_error_column(df).where(is_ok()).drop(ERROR_COL)


def group_agg(
    name: str,
    keys: Seq[str | Column],
    aggs: Mapping[str, Column],
    mode: str = "group",
) -> Step:
    """Hash aggregation: ``groupBy|cube|rollup(keys).agg(...)``.

    Catalyst plans partial (map-side) aggregation before the shuffle
    automatically, so only the per-key partials cross the wire — the
    correct 100 TB shape. Every output is aliased to its dict key so
    results stay oracle-comparable. ``mode`` picks plain grouping,
    ``cube`` (all key combinations) or ``rollup`` (hierarchical
    prefixes)."""
    if mode not in ("group", "cube", "rollup"):
        raise ValueError("mode must be 'group', 'cube' or 'rollup'")

    def fn(df: DataFrame, path: tuple[str, ...]) -> DataFrame:
        ok = _ok_only(df)
        grouped = (
            ok.cube(*keys)
            if mode == "cube"
            else ok.rollup(*keys) if mode == "rollup" else ok.groupBy(*keys)
        )
        out = grouped.agg(*[c.alias(k) for k, c in aggs.items()])
        return out.withColumn(ERROR_COL, null_error())

    return Step(
        name, fn, node_type="group_agg", metadata={"aggs": list(aggs.keys()), "mode": mode}
    )


def repartition_rows(
    name: str, num_partitions: int | None = None, by: Seq[str | Column] | None = None
) -> Step:
    """Explicit partitioning control: hash-partition on ``by`` (co-
    locate keys ahead of repeated joins/aggs on them) and/or set the
    partition count. A deliberate shuffle — the lever for layout, not
    a default."""

    def fn(df: DataFrame, path: tuple[str, ...]) -> DataFrame:
        if by is not None and num_partitions is not None:
            return df.repartition(num_partitions, *by)
        if by is not None:
            return df.repartition(*by)
        return df.repartition(num_partitions)

    return Step(name, fn, node_type="repartition")


def coalesce_rows(name: str, num_partitions: int) -> Step:
    """Shrink partition count WITHOUT a shuffle (output files, small
    tails after heavy filters)."""

    def fn(df: DataFrame, path: tuple[str, ...]) -> DataFrame:
        return df.coalesce(num_partitions)

    return Step(name, fn, node_type="coalesce")


def persist_step(name: str, storage_level: str = "MEMORY_AND_DISK") -> Step:
    """Materialization boundary (SURVEY §7.3.1: cache at connector
    boundaries when a subtree feeds multiple consumers). The Step
    registers an on_close hook so Close() releases the cache."""
    from pyspark import StorageLevel

    level = getattr(StorageLevel, storage_level)

    def fn(df: DataFrame, path: tuple[str, ...]) -> DataFrame:
        cached = df.persist(level)
        step.on_release(lambda: cached.unpersist())
        return cached

    step = Step(name, fn, node_type="persist", metadata={"level": storage_level})
    return step


def salted_join(
    name: str,
    right: DataFrame,
    on: Seq[str],
    how: str = "inner",
    salt: int = 8,
    seed: int = 42,
) -> Step:
    """Skew-buster join: the left (big, skewed) side gets a random
    salt in [0, salt); the right side is replicated once per salt
    value; the join key becomes (keys..., salt). A hot key's rows
    spread over ``salt`` tasks instead of one straggler. Use when AQE
    skew splitting isn't enough (single monster key); costs salt×
    duplication of the right side — keep it for moderate-size rights.

    Only left-preserving join types are valid: right/full outer would
    emit one NULL-padded row PER SALT REPLICA for unmatched right
    keys (salt× duplicates), so they are rejected."""
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti"):
        raise ValueError(
            f"salted_join supports left-preserving joins only, got {how!r} "
            "(unmatched right rows would duplicate once per salt replica)"
        )

    def fn(df: DataFrame, path: tuple[str, ...]) -> DataFrame:
        left = df.withColumn("_salt", (F.rand(seed) * salt).cast("int"))
        replicated = right.withColumn(
            "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
        )
        out = left.join(replicated, [*on, "_salt"], how)
        return out.drop("_salt")

    return Step(name, fn, node_type="salted_join", metadata={"salt": salt, "how": how})


def window_calc(
    name: str,
    spec: WindowSpec,
    updates: Mapping[str, Column],
) -> Step:
    """Window functions over a partition/order spec; row-preserving.

    ``updates`` maps output column → window function (e.g.
    ``F.row_number()``); each is applied ``.over(spec)``. One window
    exec node — a single shuffle on the partition keys.
    """

    def fn(df: DataFrame, path: tuple[str, ...]) -> DataFrame:
        return df.withColumns({k: c.over(spec) for k, c in updates.items()})

    return Step(name, fn, node_type="window")


def sort_rows(name: str, *order: Column | str) -> Step:
    """Global sort (range-partitioned exchange + per-partition sort)."""

    def fn(df: DataFrame, path: tuple[str, ...]) -> DataFrame:
        return df.orderBy(*order)

    return Step(name, fn, node_type="sort")


def limit_rows(name: str, n: int) -> Step:
    def fn(df: DataFrame, path: tuple[str, ...]) -> DataFrame:
        return df.limit(n)

    return Step(name, fn, node_type="limit")


def top_k(
    name: str,
    n: int,
    order: Seq[Column],
    partition_by: Seq[str | Column] | None = None,
) -> Step:
    """Top-k rows, optionally per group.

    Global top-k compiles to ``orderBy().limit(n)`` — Spark's
    TakeOrderedAndProject: each partition keeps only its local top-k
    and the driver merges k·p rows, never a full global sort. Grouped
    top-k is a row_number window (one shuffle on the group keys).
    Include a unique tiebreaker in ``order`` for deterministic output.
    """

    def fn(df: DataFrame, path: tuple[str, ...]) -> DataFrame:
        if partition_by:
            spec = Window.partitionBy(*partition_by).orderBy(*order)
            return (
                df.withColumn("_pipz_rank", F.row_number().over(spec))
                .where(F.col("_pipz_rank") <= n)
                .drop("_pipz_rank")
            )
        return df.orderBy(*order).limit(n)

    return Step(name, fn, node_type="top_k", metadata={"k": n})


def distinct_rows(name: str, subset: Seq[str] | None = None) -> Step:
    """Exact distinct on the happy path (hash aggregate on all/subset
    columns — map-side partial dedup before the shuffle). Errored rows
    are exempt and pass through, preserving the dead letter."""

    def fn(df: DataFrame, path: tuple[str, ...]) -> DataFrame:
        df = ensure_error_column(df)
        failed = df.where(~is_ok())
        ok = df.where(is_ok()).drop(ERROR_COL)
        out = ok.dropDuplicates(list(subset)) if subset else ok.distinct()
        return out.withColumn(ERROR_COL, null_error()).unionByName(failed)

    return Step(name, fn, node_type="distinct")


def join_with(
    name: str,
    right: DataFrame,
    on: Seq[str] | Column,
    how: str = "inner",
    broadcast: bool = False,
) -> Step:
    """General join Step. ``broadcast=True`` hints the right side for
    dimension tables; otherwise Catalyst/AQE picks the strategy
    (sort-merge with skew splitting at scale)."""

    def fn(df: DataFrame, path: tuple[str, ...]) -> DataFrame:
        r = F.broadcast(right) if broadcast else right
        return df.join(r, on=on, how=how)

    return Step(name, fn, node_type="join", metadata={"how": how})


def union_with(name: str, other: DataFrame) -> Step:
    def fn(df: DataFrame, path: tuple[str, ...]) -> DataFrame:
        return df.unionByName(ensure_error_column(other), allowMissingColumns=True)

    return Step(name, fn, node_type="union")


def intersect_with(name: str, other: DataFrame) -> Step:
    """Set intersection on the happy path; errored rows pass through."""

    def fn(df: DataFrame, path: tuple[str, ...]) -> DataFrame:
        df = ensure_error_column(df)
        failed = df.where(~is_ok())
        out = df.where(is_ok()).drop(ERROR_COL).intersect(other)
        return out.withColumn(ERROR_COL, null_error()).unionByName(failed)

    return Step(name, fn, node_type="intersect")


def except_with(name: str, other: DataFrame) -> Step:
    """Set difference on the happy path; errored rows pass through."""

    def fn(df: DataFrame, path: tuple[str, ...]) -> DataFrame:
        df = ensure_error_column(df)
        failed = df.where(~is_ok())
        out = df.where(is_ok()).drop(ERROR_COL).exceptAll(other)
        return out.withColumn(ERROR_COL, null_error()).unionByName(failed)

    return Step(name, fn, node_type="except")


__all__ = [
    "coalesce_rows",
    "group_agg",
    "persist_step",
    "repartition_rows",
    "salted_join",
    "window_calc",
    "sort_rows",
    "limit_rows",
    "top_k",
    "distinct_rows",
    "join_with",
    "union_with",
    "intersect_with",
    "except_with",
]
