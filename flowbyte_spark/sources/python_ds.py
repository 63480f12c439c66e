"""Spark-4 Python Data Source: the reference connector's role as a
first-class pluggable source.

The reference library IS a connector (chunked ODBC fetch with
``chunksize=10000`` — ``src/flowbyte/sql.py:88,113-116`` — plus progress
reporting); its Spark-native re-expression is not a driver-side fetch
loop but a ``DataSource`` implementation: the engine plans one input
partition per chunk, executors fetch chunks in parallel, and filter
pushdown prunes chunks before any fetch happens.  No JDBC jar is needed —
the reader runs in the Python workers, which is exactly what the Python
Data Source API (Spark 4.0+) exists for.

``SyntheticEventsDataSource`` demonstrates the full surface against a
deterministic arithmetic backend (each row derives from md5 of its row
id, so a DuckDB oracle can re-generate the identical table and
hash-gate the connector end-to-end — see v82):

- schema declaration (``schema()``),
- chunk partition planning (``partitions()`` — one ``InputPartition``
  per ``chunk_size`` rows, the reference's fetch unit),
- predicate pushdown (``pushFilters()`` — range filters on ``event_id``
  narrow the planned row range, so out-of-range CHUNKS are never
  planned; unsupported filters are handed back to Spark unchanged),
- per-partition iterators (``read()`` — yields plain tuples; Arrow
  ``RecordBatch`` is the high-volume variant).

A real deployment swaps ``_row`` for the remote fetch (REST page, SQL
chunk, object-store listing); planning, pushdown and parallelism carry
over unchanged.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)

EVENT_TYPES = ("click", "view", "purchase", "signup", "error")

SCHEMA = "event_id bigint, user_id bigint, event_type string, value double"


def _h(prefix: str, i: int) -> int:
    return int(hashlib.md5(f"{prefix}|{i}".encode()).hexdigest()[:8], 16)


def _row(i: int) -> tuple:
    return (
        i,
        _h("u", i) % 100,
        EVENT_TYPES[_h("t", i) % 5],
        (_h("v", i) % 10**6) / 100.0,
    )


class _Chunk(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class _Reader(DataSourceReader):
    def __init__(self, options):
        self.rows = int(options.get("rows", 10000))
        self.chunk = int(options.get("chunk_size", 10000))
        # arrow=true serves whole pyarrow RecordBatches per chunk instead
        # of per-row tuples.  On THIS synthetic backend the two measure
        # identically (0.63 s/1M rows either way — per-row md5 generation
        # dominates, and Spark batches tuple results internally anyway);
        # the path exists for backends that are already columnar (Arrow
        # Flight, parquet-over-REST), where pivoting to tuples first
        # would add a per-row cost the batch hand-off avoids.
        self.arrow = str(options.get("arrow", "false")).lower() == "true"
        self.lo, self.hi = 0, self.rows

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        for f in filters:
            attr = getattr(f, "attribute", None)
            if attr == ("event_id",):
                if isinstance(f, EqualTo):
                    self.lo = max(self.lo, f.value)
                    self.hi = min(self.hi, f.value + 1)
                    continue
                if isinstance(f, GreaterThan):
                    self.lo = max(self.lo, f.value + 1)
                    continue
                if isinstance(f, GreaterThanOrEqual):
                    self.lo = max(self.lo, f.value)
                    continue
                if isinstance(f, LessThan):
                    self.hi = min(self.hi, f.value)
                    continue
                if isinstance(f, LessThanOrEqual):
                    self.hi = min(self.hi, f.value + 1)
                    continue
            yield f  # unsupported: Spark re-applies it above the scan

    def partitions(self) -> list[_Chunk]:
        return [
            _Chunk(s, min(s + self.chunk, self.hi))
            for s in range(self.lo, self.hi, self.chunk)
        ] or [_Chunk(0, 0)]

    def read(self, partition: _Chunk):
        if not self.arrow:
            for i in range(partition.start, partition.end):
                yield _row(i)
            return
        import pyarrow as pa

        rows = [_row(i) for i in range(partition.start, partition.end)]
        if rows:
            ids, users, kinds, values = zip(*rows)
        else:
            ids = users = kinds = values = ()
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(ids, pa.int64()),
                pa.array(users, pa.int64()),
                pa.array(kinds, pa.string()),
                pa.array(values, pa.float64()),
            ],
            names=["event_id", "user_id", "event_type", "value"],
        )


class SyntheticEventsDataSource(DataSource):
    """``spark.read.format("flowbyte_synth").option("rows", n)`` after
    ``spark.dataSource.register(SyntheticEventsDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "flowbyte_synth"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> _Reader:
        return _Reader(self.options)

    def writer(self, schema, overwrite: bool) -> "_DirWriter":
        return _DirWriter(self.options, overwrite)

    def simpleStreamReader(self, schema) -> "_StreamReader":
        return _StreamReader(self.options)

    def streamWriter(self, schema, overwrite: bool) -> "_DirStreamWriter":
        return _DirStreamWriter(self.options)


def register(spark) -> None:
    """Idempotent session registration.

    Also enables ``spark.sql.python.filterPushdown.enabled`` (runtime
    conf, off by default in 4.1): a reader that implements
    ``pushFilters`` fails loudly at planning time when the flag is off,
    rather than silently skipping pushdown.
    """
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SyntheticEventsDataSource)


# ---------------------------------------------------------------------------
# Write half: the reference's chunked bulk insert (sql.py:174-188) as a
# DataSourceWriter with a real two-phase commit protocol.
# ---------------------------------------------------------------------------
import json
import os

from dataclasses import dataclass

from pyspark import TaskContext
from pyspark.sql.datasource import DataSourceWriter, WriterCommitMessage


@dataclass
class _FileCommit(WriterCommitMessage):
    filename: str
    rows: int


class _DirWriter(DataSourceWriter):
    """Executor tasks stage one JSONL file each under ``_staging/`` (named
    by partition + task attempt, so a retried task never collides with its
    zombie predecessor); the DRIVER publishes exactly the staged files
    named in the returned commit messages — the same speculative-task-safe
    rename protocol FileOutputCommitter implements for file formats, here
    standing in for the reference's chunked-INSERT + transaction commit.
    ``abort()`` leaves the destination untouched.  Readers trust the
    ``_MANIFEST`` (written last), never directory listing, so a crashed
    job is invisible rather than half-visible."""

    def __init__(self, options, overwrite: bool):
        path = options.get("path")
        if not path:
            raise ValueError("flowbyte_synth writer requires .option('path', ...)")
        self.path, self.overwrite = path, overwrite
        # job-unique token, minted once on the driver and pickled to every
        # task: append jobs into the same directory must not collide on
        # the (partition, attempt) name a second job would also produce
        import uuid

        self.job = uuid.uuid4().hex[:12]

    def write(self, iterator) -> _FileCommit:
        ctx = TaskContext.get()
        fname = f"part-{self.job}-{ctx.partitionId():05d}-a{ctx.attemptNumber()}.jsonl"
        staging = os.path.join(self.path, "_staging")
        os.makedirs(staging, exist_ok=True)
        n = 0
        with open(os.path.join(staging, fname), "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict()) + "\n")
                n += 1
        return _FileCommit(fname, n)

    def commit(self, messages) -> None:
        # Exclusive commit lock: two concurrent append jobs otherwise race
        # the manifest read-modify-write and the last writer orphans the
        # other's rows.  O_EXCL create is atomic on POSIX; a crashed
        # holder's stale lock times out fail-loud rather than deadlocking.
        import time

        lock = os.path.join(self.path, "_MANIFEST.lock")
        deadline = time.monotonic() + 30.0
        while True:
            try:
                fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.close(fd)
                break
            except FileExistsError:
                if time.monotonic() > deadline:
                    raise TimeoutError(
                        f"commit lock {lock} held for >30s — remove the "
                        "stale lock if the holding job crashed"
                    )
                time.sleep(0.05)
        try:
            self._commit_locked(messages)
        finally:
            try:
                os.remove(lock)
            except OSError:
                pass

    def _commit_locked(self, messages) -> None:
        staging = os.path.join(self.path, "_staging")
        published = []
        manifest = os.path.join(self.path, "_MANIFEST")
        if self.overwrite:
            for f in os.listdir(self.path):
                if f.endswith(".jsonl"):
                    os.remove(os.path.join(self.path, f))
        elif os.path.exists(manifest):
            # append mode extends the previous commit's manifest — a
            # rewritten manifest listing only this job's files would
            # silently orphan every previously committed row
            with open(manifest) as f:
                published = json.load(f)
        for m in messages:
            if m is None:
                continue
            os.replace(
                os.path.join(staging, m.filename),
                os.path.join(self.path, m.filename),
            )
            published.append({"file": m.filename, "rows": m.rows})
        # Zombie cleanup is scoped to THIS job's token: a concurrent
        # append job stages into the same _staging/ dir, and a blanket
        # sweep would delete its in-flight files mid-commit.
        for leftover in os.listdir(staging):
            if self.job in leftover:
                os.remove(os.path.join(staging, leftover))
        try:
            os.rmdir(staging)  # succeeds only once the last job drains it
        except OSError:
            pass
        # Atomic manifest swap: a crash mid-write must leave the PREVIOUS
        # manifest intact, not a truncated one that orphans every
        # committed row.
        tmp = os.path.join(self.path, f"_MANIFEST.{self.job}.tmp")
        with open(tmp, "w") as f:
            json.dump(sorted(published, key=lambda p: p["file"]), f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, os.path.join(self.path, "_MANIFEST"))

    def abort(self, messages) -> None:
        # Scoped like commit(): drop only this job's staged files so a
        # concurrent append job's in-flight staging survives our abort.
        staging = os.path.join(self.path, "_staging")
        try:
            for leftover in os.listdir(staging):
                if self.job in leftover:
                    os.remove(os.path.join(staging, leftover))
            os.rmdir(staging)
        except OSError:
            pass


def read_manifest(spark, path: str):
    """Committed rows only: the manifest names the published files."""
    with open(os.path.join(path, "_MANIFEST")) as f:
        files = [os.path.join(path, p["file"]) for p in json.load(f)]
    return spark.read.json(files) if files else None


# ---------------------------------------------------------------------------
# Stream half: the same row arithmetic as a checkpoint-driven stream
# reader.  The SIMPLE stream API is the deliberate choice here, not the
# lightweight one: the partition-planned ``DataSourceStreamReader`` derives
# ``latestOffset`` from reader-instance state, which resets on restart —
# a restarted query then plans offsets BACKWARD from the checkpoint and
# re-emits committed rows (measured: a drained 100-row stream replayed 60
# rows after restart).  ``SimpleDataSourceStreamReader.read(start)``
# receives the checkpointed start offset instead, so progress derives
# from the checkpoint and restarts are exact by construction.  A real
# high-volume backend would use the partitioned API backed by an
# EXTERNAL cursor (Kafka-style), which is what makes its latestOffset
# restart-safe.
# ---------------------------------------------------------------------------
from pyspark.sql.datasource import SimpleDataSourceStreamReader


class _StreamReader(SimpleDataSourceStreamReader):
    """Offsets are row indices; each micro-batch serves the next
    ``rows_per_batch`` rows; ``readBetweenOffsets`` replays any committed
    range identically (rows derive from their index alone)."""

    def __init__(self, options):
        self.rows = int(options.get("rows", 10000))
        self.batch_rows = int(
            options.get("rows_per_batch", options.get("chunk_size", 10000))
        )

    def initialOffset(self) -> dict:
        return {"index": 0}

    def read(self, start: dict):
        lo = start["index"]
        hi = min(self.rows, lo + self.batch_rows)
        return iter([_row(i) for i in range(lo, hi)]), {"index": hi}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        return iter([_row(i) for i in range(start["index"], end["index"])])

    def commit(self, end: dict) -> None:
        pass  # idempotent arithmetic backend: nothing to acknowledge


# ---------------------------------------------------------------------------
# Streaming write half (round 6): DataSourceStreamWriter — exactly-once
# per-epoch sink, completing the connector matrix (batch read + pushdown,
# 2PC batch write, checkpoint-exact stream read, and now epoch-committed
# stream write).  Protocol: tasks stage one JSONL file per (epoch,
# partition, attempt) under _staging/; the DRIVER's commit(batchId)
# publishes exactly the staged files named in that epoch's messages and
# appends one manifest entry per epoch — so a replayed epoch (restart
# re-runs the last uncommitted batch) OVERWRITES its own entry instead of
# duplicating rows, which is what makes the sink exactly-once on top of
# Structured Streaming's at-least-once epoch replay.  abort(batchId)
# drops only that epoch's staged files.
# ---------------------------------------------------------------------------
from pyspark.sql.datasource import DataSourceStreamWriter


class _DirStreamWriter(DataSourceStreamWriter):
    def __init__(self, options):
        path = options.get("path")
        if not path:
            raise ValueError(
                "flowbyte_synth stream writer requires .option('path', ...)"
            )
        self.path = path
        import uuid as _uuid

        self.job = _uuid.uuid4().hex[:12]

    # -- executor side -------------------------------------------------------

    def write(self, iterator) -> _FileCommit:
        ctx = TaskContext.get()
        # epoch id rides the task-local property Structured Streaming sets
        epoch = ctx.getLocalProperty("streaming.sql.batchId") or "0"
        fname = (
            f"epoch-{int(epoch):08d}-{self.job}-"
            f"{ctx.partitionId():05d}-a{ctx.attemptNumber()}.jsonl"
        )
        staging = os.path.join(self.path, "_staging")
        os.makedirs(staging, exist_ok=True)
        n = 0
        with open(os.path.join(staging, fname), "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict()) + "\n")
                n += 1
        return _FileCommit(fname, n)

    # -- driver side -----------------------------------------------------------

    def _manifest(self):
        p = os.path.join(self.path, "_STREAM_MANIFEST")
        if os.path.exists(p):
            with open(p) as f:
                return json.load(f)
        return {}

    def _write_manifest(self, m) -> None:
        tmp = os.path.join(self.path, f"_STREAM_MANIFEST.{self.job}.tmp")
        with open(tmp, "w") as f:
            json.dump(m, f, sort_keys=True)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, os.path.join(self.path, "_STREAM_MANIFEST"))

    def commit(self, messages, batchId: int) -> None:
        staging = os.path.join(self.path, "_staging")
        published = []
        for m in messages:
            if m is None:
                continue
            os.replace(
                os.path.join(staging, m.filename),
                os.path.join(self.path, m.filename),
            )
            published.append({"file": m.filename, "rows": m.rows})
        manifest = self._manifest()
        old = manifest.get(str(batchId))
        manifest[str(batchId)] = sorted(published, key=lambda p: p["file"])
        # Publish the manifest BEFORE retracting the replaced attempt's
        # files: the atomic manifest swap is the commit point.  A crash
        # after it leaves the old attempt's files as harmless orphans;
        # the previous order (delete, then write) could crash in between
        # and leave _STREAM_MANIFEST referencing deleted files — silently
        # losing a committed epoch.
        self._write_manifest(manifest)
        if old:  # epoch replay: retract the previous attempt's files
            keep = {p["file"] for p in manifest[str(batchId)]}
            for entry in old:
                if entry["file"] in keep:
                    continue
                try:
                    os.remove(os.path.join(self.path, entry["file"]))
                except OSError:
                    pass
        # scoped zombie cleanup, same policy as the batch writer
        try:
            for leftover in os.listdir(staging):
                if self.job in leftover and f"epoch-{int(batchId):08d}" in leftover:
                    os.remove(os.path.join(staging, leftover))
        except OSError:
            pass

    def abort(self, messages, batchId: int) -> None:
        staging = os.path.join(self.path, "_staging")
        try:
            for leftover in os.listdir(staging):
                if self.job in leftover and f"epoch-{int(batchId):08d}" in leftover:
                    os.remove(os.path.join(staging, leftover))
        except OSError:
            pass


def read_stream_manifest(spark, path: str):
    """Committed rows only, across every committed epoch."""
    with open(os.path.join(path, "_STREAM_MANIFEST")) as f:
        manifest = json.load(f)
    files = [
        os.path.join(path, entry["file"])
        for epoch in sorted(manifest, key=int)
        for entry in manifest[epoch]
    ]
    return spark.read.json(files) if files else None
