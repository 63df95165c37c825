"""Writers + the dead-letter landing path (SURVEY §2.4 sinks).

The reference has no sinks (users call APIs inside closures); an
analytics engine needs durable ones. ``write_split`` is the canonical
terminal action: ONE computation of the pipeline output lands happy
rows AND the dead-letter (flattened error struct) — the persistent
form of Handle's observation pattern (handle.go:69-120).

Scale notes: writers take partition_by for layout-aware placement
(partition pruning on read is free scan reduction at 100 TB);
dead-letter rows are written with the path/message flattened so the
DLQ is queryable without knowing the engine's struct."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..control import signals as S
from ..core.errors import ERROR_COL, ensure_error_column, error_path_str, is_failed, is_ok


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite", header: bool = True) -> None:
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def flatten_dead_letter(df: DataFrame) -> DataFrame:
    """Failed rows with the error struct flattened to plain columns."""
    return df.where(is_failed()).select(
        "*",
        error_path_str().alias("_error_path"),
        F.col(ERROR_COL)["message"].alias("_error_message"),
        F.col(ERROR_COL)["timeout"].alias("_error_timeout"),
        F.col(ERROR_COL)["canceled"].alias("_error_canceled"),
    ).drop(ERROR_COL)


def write_split(
    df: DataFrame,
    ok_path: str,
    dead_letter_path: str | None = None,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    name: str = "write-split",
    bus: S.SignalBus = S.BUS,
) -> dict[str, int]:
    """Terminal action: persist once, write happy path + dead letter.

    Returns row counts per side (the counts come from the SAME
    persisted computation the writes used — no recompute), and emits
    ``sequence.completed`` with them — the terminal action is where a
    batch pipeline's completion becomes observable (signals.go's
    sequence.completed, at the only point counts exist for free)."""
    df = ensure_error_column(df).persist()
    try:
        ok = df.where(is_ok()).drop(ERROR_COL)
        write_parquet(ok, ok_path, mode=mode, partition_by=partition_by)
        counts = {"ok": ok.count()}
        if dead_letter_path is not None:
            dead = flatten_dead_letter(df)
            write_parquet(dead, dead_letter_path, mode=mode)
            counts["dead_letter"] = dead.count()
        bus.emit(S.SEQUENCE_COMPLETED, name=name, **counts)
        return counts
    finally:
        df.unpersist()


def write_bucketed(
    df: DataFrame,
    table: str,
    buckets: int,
    bucket_cols: list[str],
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table.

    Bucketing is THE lever for repeated large-large joins/aggs on the
    same key at 100 TB: two tables bucketed (and sorted) on the join
    key by the same bucket count join with NO exchange and NO sort —
    the shuffle is paid once at write time instead of per query.
    """
    spark = df.sparkSession
    if mode == "overwrite":
        # the in-memory catalog forgets tables across sessions while
        # their warehouse directories persist; clear BOTH so overwrite
        # means overwrite
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        warehouse = spark.conf.get("spark.sql.warehouse.dir")
        parts = table.lower().split(".")
        # managed location: warehouse/<db>.db/<table> when qualified,
        # warehouse/<table> in the default database
        rel = f"{parts[-2]}.db/{parts[-1]}" if len(parts) > 1 else parts[-1]
        jvm = spark._jvm
        loc = jvm.org.apache.hadoop.fs.Path(f"{warehouse}/{rel}")
        fs = loc.getFileSystem(spark._jsc.hadoopConfiguration())
        if fs.exists(loc):
            fs.delete(loc, True)
    w = df.write.mode(mode).bucketBy(buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def dead_letter_handler(path: str, mode: str = "append"):
    """A Handle-compatible callable that durably lands failed rows
    (the 'Step handlers must terminate in a sink' rule, VERDICT r1)."""

    def handler(failed: DataFrame) -> None:
        write_parquet(flatten_dead_letter(failed), path, mode=mode)

    return handler
