"""Tracked persistence for operator-internal caches.

The LSH dedup family persists intermediates as plan barriers (the shingle
table must compute once, not once per self-join side, and persisting
defeats the InferFiltersFromGenerate recompute trap).  Those caches must
outlive the operator call — the caller materializes the returned plan
later — so the operators cannot unpersist eagerly.  Instead every such
persist is registered here, and long-lived pipelines release executor
storage memory between stages:

    pairs = minhash_lsh_pairs(df, ...)
    pairs.write.parquet(out)          # materialize first
    cache.release_persisted()         # then drop the cached blocks

Unreleased entries are bounded by the number of operator calls, and
``release_persisted`` is idempotent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def persist_tracked(df: DataFrame) -> DataFrame:
    """Persist ``df`` (MEMORY_AND_DISK) and register it for later release."""
    df = df.persist()
    _TRACKED.append(df)
    return df


def track(df: DataFrame) -> DataFrame:
    """Register an ALREADY-persisted DataFrame for later release (for
    operators that manage persist timing themselves, e.g. iterative
    loops that persist per round)."""
    _TRACKED.append(df)
    return df


def release_persisted(blocking: bool = False) -> int:
    """Unpersist every tracked DataFrame; returns how many were released.

    Safe to call at any time: plans derived from a released cache simply
    recompute on their next action.
    """
    released = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist(blocking)
            released += 1
        except Exception:  # session already stopped — nothing to release
            pass
    return released
