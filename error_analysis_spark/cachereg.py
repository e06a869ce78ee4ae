"""Session-scoped registry of persisted DataFrames handed to callers
that never see the persist (registry queries, packs, bench): operators
that pin an intermediate for intra-query reuse register it here, and a
long-lived session (the driver's query loop, bench) releases everything
between query invocations instead of accumulating cache entries.

Single-invocation consumers (pipelines, tests) may still unpersist
directly — a double unpersist is a no-op. Releasing is always safe:
holders of a released DataFrame keep working (the plan recomputes).

Concurrency contract: the registry is GLOBAL, not per-query. The
driver contract (one query at a time per process) and bench are
single-threaded, which is the assumed mode; list mutation is
lock-guarded so concurrent track/release calls cannot corrupt the
list, but `release_tracked()` still releases EVERY tracked cache —
a concurrent driver releasing mid-flight would drop another query's
pinned intermediate back to recompute-on-touch (correct, just slower).
Library callers that want scoped release without a harness wrapper
should use the `scoped()` context manager, which releases only the
caches tracked inside its block.
"""

from __future__ import annotations

import threading
from contextlib import contextmanager

from pyspark.sql import DataFrame

_LOCK = threading.Lock()
_TRACKED: list[DataFrame] = []


def track(df: DataFrame) -> DataFrame:
    """Register a persisted DataFrame for deferred release."""
    with _LOCK:
        _TRACKED.append(df)
    return df


def release_tracked() -> int:
    """Unpersist every tracked cache (newest first); returns how many
    were released."""
    with _LOCK:
        drained = _TRACKED[::-1]
        _TRACKED.clear()
    n = 0
    for df in drained:
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass
    return n


@contextmanager
def scoped():
    """Release exactly the caches tracked inside this block — the
    scoped alternative for direct library callers (tests, pipelines)
    that have no harness wrapper calling `release_tracked()`:

        with cachereg.scoped():
            out = corpus_line_dedup(docs)
            out.collect()          # caches live here
        # caches pinned inside the block are released on exit

    Caches tracked BEFORE the block stay tracked (they are restored on
    exit for the harness-level release to claim).
    """
    with _LOCK:
        outer = _TRACKED[:]
        _TRACKED.clear()
    try:
        yield
    finally:
        release_tracked()
        with _LOCK:
            _TRACKED[:0] = outer
