"""Streaming operators over the `events` table and Step pipelines.

100 TB posture: source throttling via maxFilesPerTrigger (the
streaming analog of the reference's RateLimiter ingestion control,
ratelimiter.go:96-112), watermarks bound state for late data, and all
stateful aggregation uses Spark's own state store (checkpointable,
restart-safe — SURVEY §7.3.4).
"""

from __future__ import annotations

import os
from collections.abc import Callable, Iterator, Mapping

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..core.errors import ERROR_COL, is_failed, is_ok
from ..core.step import Step
from ..control import signals as S
from ..control.resilience import CircuitBreaker, RateLimiter

# events.parquet physical schema: ts is TIMESTAMP(NANOS) which Spark
# reads as long under nanosAsLong (see session.py).
EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(
    spark: SparkSession,
    sf_dir: str,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """File-source stream over events.parquet with source throttling
    (maxFilesPerTrigger — ingestion rate control lives at the SOURCE
    in Spark, not per value). ts normalized to a real timestamp."""
    # glob form: the file source requires a directory basePath, so
    # match the single file with a pattern (parent dir becomes base)
    df = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(os.path.join(sf_dir, "events.[p]arquet"))
    )
    # integer division — float /1000 of nanosecond epochs drifts ±1 µs
    return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def windowed_agg(
    events: DataFrame,
    aggs: Mapping[str, Column],
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "1 hour",
    keys: list[str] | None = None,
    ts_col: str = "ts",
) -> DataFrame:
    """Watermarked tumbling (or sliding when ``slide`` is given)
    window aggregation. The watermark bounds state AND defines the
    late-data policy: events older than it are dropped, on-time
    updates flow to the sink in append/update mode."""
    w = F.window(F.col(ts_col), window, slide) if slide else F.window(F.col(ts_col), window)
    grouped = (
        events.withWatermark(ts_col, watermark)
        .groupBy(w.alias("win"), *(keys or []))
        .agg(*[c.alias(k) for k, c in aggs.items()])
    )
    return grouped.select(
        F.col("win.start").alias("win_start"),
        F.col("win.end").alias("win_end"),
        *(keys or []),
        *aggs.keys(),
    )


def session_window_agg(
    events: DataFrame,
    aggs: Mapping[str, Column],
    gap: str = "30 minutes",
    keys: list[str] | None = None,
    watermark: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """Session windows (dynamic gap-closed) per key — e.g. user
    sessionization over the events stream."""
    grouped = (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("win"), *(keys or []))
        .agg(*[c.alias(k) for k, c in aggs.items()])
    )
    return grouped.select(
        F.col("win.start").alias("win_start"),
        F.col("win.end").alias("win_end"),
        *(keys or []),
        *aggs.keys(),
    )


def dedupe_stream(
    events: DataFrame,
    keys: list[str],
    watermark: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming exact dedup with bounded state:
    dropDuplicatesWithinWatermark keeps only in-horizon keys in the
    state store — the streaming face of datapipe.exact_dedup."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


_RUNNING_SCHEMA = "user_id long, n_events long, total_value double"
_STATE_SCHEMA = "n long, total double"


def running_totals(events: DataFrame, timeout_minutes: int | None = None) -> DataFrame:
    """Custom stateful per-key operator via applyInPandasWithState:
    cumulative event count + value per user across micro-batches (the
    pattern slot for bespoke stateful logic the built-in aggs can't
    express — per-key breakers, decaying counters, model state).

    ``timeout_minutes`` evicts abandoned keys via processing-time
    timeout — REQUIRED on unbounded key spaces at scale, but note the
    timeout wake-ups keep scheduling micro-batches, so leave it None
    for finite replays/tests that wait with processAllAvailable."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    use_timeout = timeout_minutes is not None

    def update(key, pdfs: Iterator["object"], state: GroupState):
        import pandas as pd

        if use_timeout and state.hasTimedOut:
            state.remove()
            return
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        if use_timeout:
            state.setTimeoutDuration(timeout_minutes * 60 * 1000)
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 4)]})

    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=_RUNNING_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout
                if use_timeout
                else GroupStateTimeout.NoTimeout
            ),
        )
    )


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
    max_skew: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream equi-join with an event-time range
    bound. The time bound is what makes the state PRUNABLE: each side
    buffers only rows within watermark+skew, so state size is
    rate-bounded instead of unbounded — mandatory for a join of two
    infinite streams. Output columns are the left row plus the right
    side's ts/value columns suffixed ``_r``."""
    l = left.withWatermark(ts_col, watermark).alias("l")
    suffixed = right.select(
        *[F.col(k).alias(k) for k in keys],
        *[
            F.col(c).alias(f"{c}_r")
            for c in right.columns
            if c not in keys
        ],
    )
    r = suffixed.withWatermark(f"{ts_col}_r", watermark).alias("r")
    key_cond = None
    for k in keys:
        c = F.col(f"l.{k}") == F.col(f"r.{k}")
        key_cond = c if key_cond is None else (key_cond & c)
    time_cond = F.expr(
        f"{ts_col}_r BETWEEN {ts_col} - INTERVAL {max_skew} AND {ts_col} + INTERVAL {max_skew}"
    )
    joined = l.join(r, key_cond & time_cond, how)
    return joined.select("l.*", *[c for c in suffixed.columns if c.endswith("_r")])


def run_step_stream(
    stream: DataFrame,
    step: Step,
    ok_sink: Callable[[DataFrame, int], None],
    dead_letter_sink: Callable[[DataFrame, int], None] | None = None,
    breaker: CircuitBreaker | None = None,
    limiter: RateLimiter | None = None,
    checkpoint: str | None = None,
    query_name: str = "pipz-stream",
    output_mode: str | None = None,
    bus: S.SignalBus = S.BUS,
):
    """Apply a Step pipeline per micro-batch with dead-letter split,
    the sink action optionally wrapped by a CircuitBreaker and/or
    RateLimiter (the reference's operational connectors in their
    streaming home, SURVEY §1.5). Returns the StreamingQuery.

    The batch is persisted so the ok/dead-letter writes share one
    computation; breaker-open or limiter-drop raises inside
    foreachBatch → the micro-batch fails and Spark retries/stops per
    its policy, which is exactly the fail-fast contract."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        out = step.apply(batch_df, ()).persist()
        try:
            ok = out.where(is_ok()).drop(ERROR_COL)
            dead = out.where(is_failed())

            def write_ok() -> None:
                ok_sink(ok, batch_id)

            action = write_ok
            if limiter is not None:
                inner = action

                def limited() -> None:
                    limiter.call(inner)

                action = limited
            if breaker is not None:
                inner2 = action

                def guarded() -> None:
                    breaker.call(inner2)

                action = guarded
            action()
            if dead_letter_sink is not None:
                dead_letter_sink(dead, batch_id)
            # per-micro-batch completion signal; the counts cost an
            # extra action on the persisted batch, so compute them
            # only when someone is actually listening
            if bus.has_listeners(S.SEQUENCE_COMPLETED):
                bus.emit(
                    S.SEQUENCE_COMPLETED,
                    name=query_name,
                    batch_id=batch_id,
                    ok=ok.count(),
                    dead_letter=dead.count(),
                )
        finally:
            out.unpersist()
            # free step-internal caches (switch/filter/handle persist
            # per apply) now that this batch's sink actions are done —
            # otherwise a long-running stream accumulates cached blocks
            step.release_caches()

    writer = stream.writeStream.foreachBatch(process).queryName(query_name)
    if output_mode:
        # aggregated streams need an explicit mode: "complete" re-emits
        # the full state each trigger (what a finite replay needs to
        # surface its final windows), "update" emits changed rows only
        writer = writer.outputMode(output_mode)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()


def replay_events_files(
    spark: SparkSession, sf_dir: str, n_files: int = 4, out_dir: str | None = None
) -> str:
    """Materialize events as ``n_files`` parquet parts so the file
    source replays them as a genuine multi-trigger stream (one file
    per micro-batch) instead of a single batch."""
    import tempfile

    from ..sources.catalog import load_table

    out_dir = out_dir or tempfile.mkdtemp(prefix="pipz_events_replay_")
    load_table(spark, "events", sf_dir).repartition(n_files).write.mode(
        "overwrite"
    ).parquet(out_dir)
    return out_dir


def stream_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING-EXECUTED hourly window, landed to parquet: replay
    events as 4 micro-batches, aggregate incrementally in the state
    store (complete mode — a finite replay must re-emit open windows),
    drive the sink through ``run_step_stream``'s foreachBatch, and
    return the landed table. Output shape matches the batch
    ``events_hourly_window`` query, so the same SQL oracle checks that
    the streaming execution path computes the identical answer."""
    import tempfile

    from ..operators.processors import transform

    replay = replay_events_files(spark, sf_dir)
    normalized = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    stream = (
        spark.readStream.schema(normalized)
        .option("maxFilesPerTrigger", 1)
        .parquet(replay)
    )
    agg = windowed_agg(
        stream,
        {
            "n": F.count(F.lit(1)),
            # decimal partial sums: associative AND exact, so the
            # micro-batch accumulation order cannot change the result
            "total_value": F.sum(F.col("value").cast("decimal(18,4)")).cast("double"),
        },
        window="1 hour",
        keys=["event_type"],
    )
    fmt = transform(
        "format-hour", {"hour": F.date_format(F.col("win_start"), "yyyy-MM-dd HH:mm")}
    )
    land = tempfile.mkdtemp(prefix="pipz_stream_land_")

    def ok_sink(df: DataFrame, batch_id: int) -> None:
        # complete mode: every emission carries the FULL window state,
        # so overwrite-per-batch leaves the final answer on disk
        df.select("hour", "event_type", "n", "total_value").write.mode(
            "overwrite"
        ).parquet(land)

    q = run_step_stream(
        agg,
        fmt,
        ok_sink,
        checkpoint=tempfile.mkdtemp(prefix="pipz_stream_ckpt_"),
        query_name="pipz-hourly-window",
        output_mode="complete",
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.read.parquet(land)
