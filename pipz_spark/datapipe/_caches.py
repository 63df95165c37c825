"""Explicit lifetime tracking for DataFrames the datapipe operators
persist internally (signature frames that feed both sides of a
self-join).

The operators return lazy DataFrames, so they cannot unpersist their
intermediates themselves — the cache must outlive the returned plan.
Callers that run operators in a loop (query suites, foreachBatch)
call :func:`release_caches` between iterations instead of waiting for
the JVM ContextCleaner to notice the plans are garbage. Frames are
held by weak reference: anything the caller has already dropped is
skipped (the ContextCleaner owns it again).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# STRONG references, deliberately: the operator's local variable is
# usually the only other Python reference, and the JVM CacheManager
# pins the cached data regardless of the Python wrapper's lifetime —
# a weakref here would clear at operator return and make every
# release a no-op while the JVM cache lives on. The registry IS the
# owner until release_caches() drops it.
_TRACKED: list[DataFrame] = []


def track(df: DataFrame) -> DataFrame:
    """Register an internally-persisted frame for later release."""
    _TRACKED.append(df)
    return df


def release_caches() -> int:
    """Unpersist every tracked frame; returns the count. Safe to call
    at any time — a released cache is rebuilt on next use (persist
    marks a re-creatable resource, never a correctness one)."""
    global _TRACKED
    frames, _TRACKED = _TRACKED, []
    n = 0
    for df in frames:
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass
    return n
