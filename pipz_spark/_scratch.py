"""Session-scoped scratch directories with exit-time cleanup.

Declared queries and streaming rigs need short-lived on-disk landing
zones (a parquet fingerprint index, a stream's source/checkpoint
dirs). ``tempfile.mkdtemp`` alone leaks one orphan directory per
invocation across repeated bench/correctness runs (r15 advice);
every caller goes through :func:`scratch_dir` instead, which nests
the directories under ONE per-process root that is removed at
interpreter exit — after every query has materialized and every
stream has stopped, and long after any lazy parquet read under the
root has been collected by the driver."""

from __future__ import annotations

import atexit
import shutil
import tempfile
import threading

_ROOT: list[str] = []
_LOCK = threading.Lock()


def scratch_dir(prefix: str = "pipz_") -> str:
    """A fresh empty directory under the process-scoped scratch root
    (created on first use, ``shutil.rmtree``'d via ``atexit``).
    Lock-guarded: the bench harness starts streaming rigs from a
    thread pool, and an unguarded first-use race would register two
    roots and leak one past the atexit cleanup."""
    with _LOCK:
        if not _ROOT:
            root = tempfile.mkdtemp(prefix="pipz_scratch_")
            _ROOT.append(root)
            atexit.register(shutil.rmtree, root, ignore_errors=True)
    return tempfile.mkdtemp(prefix=prefix, dir=_ROOT[0])
