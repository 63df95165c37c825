"""Structured Streaming layer (SURVEY §7.1 M4).

The reference is a synchronous request-scoped library; its streaming
concerns are OPERATIONAL (rate limiting ratelimiter.go, breaker state
circuitbreaker.go, fire-and-forget scaffold.go). Spark-native
equivalents live here: file/rate sources with trigger throttling,
watermarked tumbling/sliding/session windows over `events`, stateful
per-key operators, and a foreachBatch runner that applies a Step
pipeline per micro-batch with dead-letter split + control-plane
wrapping (breaker/limiter around the sink action).
"""

from .streams import (
    dedupe_stream,
    read_events_stream,
    replay_events_files,
    run_step_stream,
    running_totals,
    running_totals_tws,
    session_window_agg,
    stream_events_dedup,
    stream_ingest_dedup,
    stream_events_hourly,
    stream_events_join,
    stream_bloom_signatures,
    stream_cms_traffic,
    stream_kll_values,
    stream_events_sessions,
    stream_running_totals,
    stream_static_join,
    stream_stream_join,
    windowed_agg,
)

__all__ = [
    "dedupe_stream",
    "read_events_stream",
    "replay_events_files",
    "run_step_stream",
    "running_totals",
    "running_totals_tws",
    "session_window_agg",
    "stream_events_dedup",
    "stream_ingest_dedup",
    "stream_events_hourly",
    "stream_events_join",
    "stream_bloom_signatures",
    "stream_cms_traffic",
    "stream_kll_values",
    "stream_events_sessions",
    "stream_running_totals",
    "stream_static_join",
    "stream_stream_join",
    "windowed_agg",
]
