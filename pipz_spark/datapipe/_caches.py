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

import weakref

from pyspark.sql import DataFrame

_TRACKED: list[weakref.ref] = []


def track(df: DataFrame) -> DataFrame:
    """Register an internally-persisted frame for later release."""
    _TRACKED.append(weakref.ref(df))
    return df


def release_caches() -> int:
    """Unpersist every tracked frame still alive; returns the count.
    Safe to call at any time — a released cache is rebuilt on next use
    (persist marks a re-creatable resource, never a correctness one)."""
    global _TRACKED
    refs, _TRACKED = _TRACKED, []
    n = 0
    for ref in refs:
        df = ref()
        if df is None:
            continue
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass
    return n
