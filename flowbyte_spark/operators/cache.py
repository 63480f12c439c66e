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

# DataFrames (persist) and CheckpointHandles — both expose .unpersist().
_TRACKED: list = []


class CheckpointHandle:
    """Release handle for ``localCheckpoint`` block storage.

    Checkpoint blocks live on an internal RDD OUTSIDE the CacheManager, so
    ``DataFrame.unpersist()`` cannot reach them and waiting on driver GC +
    ContextCleaner is nondeterministic.  The handle frees the underlying
    RDD by id.  One contract difference from a persist: a released
    checkpoint CANNOT recompute (the blocks were the data) — release only
    after every plan built on it has been materialized.
    """

    def __init__(self, spark_context, rdd_ids: list[int]):
        self._jsc = spark_context._jsc
        self.rdd_ids = list(rdd_ids)

    def unpersist(self, blocking: bool = False) -> None:
        mapping = self._jsc.getPersistentRDDs()
        for rid in self.rdd_ids:
            rdd = mapping.get(rid)
            if rdd is not None:
                rdd.unpersist(blocking)
        self.rdd_ids = []


def local_checkpoint(
    df: DataFrame, release: CheckpointHandle | None = None
) -> tuple[DataFrame, CheckpointHandle]:
    """Eager ``localCheckpoint`` with deterministic block accounting.

    Returns ``(checkpointed_df, handle)``.  ``release`` — the handle of a
    now-superseded checkpoint (e.g. the previous round of an iterative
    operator) — is freed only AFTER the new checkpoint materializes, so at
    any instant at most two round tables are resident and old rounds never
    pile up waiting for a GC cycle.

    The new checkpoint's RDD ids are found by diffing the persistent-RDD
    registry around the call; the eager materialization happens inside the
    diff window, and these operators run their rounds serially on the
    session, so the diff is exactly the checkpoint's RDDs.
    """
    sc = df.sparkSession.sparkContext
    before = set(sc._jsc.getPersistentRDDs().keySet().toArray())
    out = df.localCheckpoint(eager=True)
    after = set(sc._jsc.getPersistentRDDs().keySet().toArray())
    handle = CheckpointHandle(sc, sorted(after - before))
    if release is not None:
        release.unpersist()
    return out, handle


def track_checkpoint(handle: CheckpointHandle) -> CheckpointHandle:
    """Register a checkpoint handle for ``release_persisted``.  Unlike a
    tracked persist, the checkpointed plan is UNUSABLE after release —
    materialize results first (the documented usage pattern)."""
    _TRACKED.append(handle)
    return handle


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
    """Unpersist every tracked entry; returns how many were released.

    Persist entries are safe to release at any time (plans recompute on
    the next action); checkpoint entries are gone for good — callers
    follow the materialize-then-release pattern above.
    """
    released = 0
    while _TRACKED:
        entry = _TRACKED.pop()
        try:
            entry.unpersist(blocking)
            released += 1
        except Exception:  # session already stopped — nothing to release
            pass
    return released
