"""Session-scoped registry of persisted DataFrames handed to callers
that never see the persist (registry queries, packs, bench): operators
that pin an intermediate for intra-query reuse register it here, and a
long-lived session (the driver's query loop, bench) releases everything
between query invocations instead of accumulating cache entries.

Single-invocation consumers (pipelines, tests) may still unpersist
directly — a double unpersist is a no-op. Releasing is always safe:
holders of a released DataFrame keep working (the plan recomputes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def track(df: DataFrame) -> DataFrame:
    """Register a persisted DataFrame for deferred release."""
    _TRACKED.append(df)
    return df


def release_tracked() -> int:
    """Unpersist every tracked cache (newest first); returns how many
    were released."""
    n = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass
    return n
