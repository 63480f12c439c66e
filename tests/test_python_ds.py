"""Python Data Source connector: partition planning, filter pushdown
(pruned chunks observable in the partition count), residual-filter
correctness, and determinism."""

from __future__ import annotations

from flowbyte_spark.sources import python_ds


def _read(spark, rows=10000, chunk=2000):
    python_ds.register(spark)
    return (
        spark.read.format("flowbyte_synth")
        .option("rows", rows)
        .option("chunk_size", chunk)
        .load()
    )


def test_partition_planning(spark):
    df = _read(spark)
    assert df.count() == 10000
    assert df.rdd.getNumPartitions() == 5  # ceil(10000 / 2000)
    assert df.columns == ["event_id", "user_id", "event_type", "value"]
    # zero-row source still plans a (single, empty) partition
    assert _read(spark, rows=0).count() == 0


def test_range_pushdown_prunes_chunks(spark):
    df = _read(spark)
    pruned = df.where("event_id >= 2500 AND event_id < 4500")
    # [2500, 4500) re-chunks from the pushed lower bound: one 2000-row chunk
    assert pruned.rdd.getNumPartitions() == 1
    assert pruned.count() == 2000
    ids = pruned.agg({"event_id": "min"}).first()[0], pruned.agg(
        {"event_id": "max"}
    ).first()[0]
    assert ids == (2500, 4499)


def test_residual_filters_stay_correct(spark):
    df = _read(spark)
    # event_type is NOT pushable: the reader hands it back and Spark
    # applies it above the scan — counts must match a local recompute
    expected = sum(
        1 for i in range(10000) if python_ds._row(i)[2] == "click"
    )
    assert df.where("event_type = 'click'").count() == expected
    # combined pushed + residual
    both = df.where("event_id < 2000 AND event_type = 'click'")
    expected_both = sum(
        1 for i in range(2000) if python_ds._row(i)[2] == "click"
    )
    assert both.count() == expected_both
    assert both.rdd.getNumPartitions() == 1


def test_rows_match_local_generator(spark):
    got = {
        r.event_id: (r.user_id, r.event_type, r.value)
        for r in _read(spark, rows=50, chunk=7).collect()
    }
    want = {i: python_ds._row(i)[1:] for i in range(50)}
    assert got == want


def test_writer_commit_protocol(spark, tmp_path):
    import os

    dest = str(tmp_path / "sink")
    os.makedirs(dest)
    df = _read(spark, rows=100, chunk=25)
    df.write.format("flowbyte_synth").option("path", dest).mode("append").save()
    # staging is gone, manifest published, committed rows round-trip
    assert not os.path.exists(os.path.join(dest, "_staging"))
    assert os.path.exists(os.path.join(dest, "_MANIFEST"))
    back = python_ds.read_manifest(spark, dest)
    assert back.count() == 100
    got = {
        r.event_id: (r.user_id, r.event_type, r.value) for r in back.collect()
    }
    assert got == {i: python_ds._row(i)[1:] for i in range(100)}
    # a stray uncommitted staging file must stay invisible to readers
    os.makedirs(os.path.join(dest, "_staging"), exist_ok=True)
    with open(os.path.join(dest, "_staging", "part-zombie.jsonl"), "w") as f:
        f.write('{"event_id": -1}\n')
    assert python_ds.read_manifest(spark, dest).count() == 100
    # append mode must EXTEND the manifest: a second job's commit may not
    # orphan the first job's rows
    _read(spark, rows=10, chunk=5).where("event_id >= 100").write.format(
        "flowbyte_synth"
    ).option("path", dest).mode("append").save()
    assert python_ds.read_manifest(spark, dest).count() == 100  # 0 new rows
    more = _read(spark, rows=120, chunk=30).where("event_id >= 100")
    more.write.format("flowbyte_synth").option("path", dest).mode("append").save()
    assert python_ds.read_manifest(spark, dest).count() == 120
    # overwrite mode replaces previously committed files
    _read(spark, rows=10, chunk=5).write.format("flowbyte_synth").option(
        "path", dest
    ).mode("overwrite").save()
    assert python_ds.read_manifest(spark, dest).count() == 10


def test_stream_reader_offsets(spark, tmp_path):
    """Micro-batches advance the row-index offset by rows_per_batch;
    the drained stream equals the batch read, with no duplicate or
    missing offsets across batches."""
    python_ds.register(spark)
    batches = []

    def sink(batch_df, batch_id):
        batches.append(
            {r.event_id: (r.user_id, r.event_type, r.value) for r in batch_df.collect()}
        )

    q = (
        spark.readStream.format("flowbyte_synth")
        .option("rows", 100)
        .option("chunk_size", 25)
        .option("rows_per_batch", 40)
        .load()
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    sizes = sorted(len(b) for b in batches if b)
    assert sizes == [20, 40, 40]
    merged = {}
    for b in batches:
        assert not (set(b) & set(merged)), "offset ranges must not overlap"
        merged.update(b)
    assert merged == {i: python_ds._row(i)[1:] for i in range(100)}
    # restart on the drained checkpoint: progress derives from the
    # checkpoint (SimpleDataSourceStreamReader.read receives the start
    # offset), so NOTHING replays — the partition-planned stream API's
    # reader-instance latestOffset measured a 60-row replay here
    batches.clear()
    q2 = (
        spark.readStream.format("flowbyte_synth")
        .option("rows", 100)
        .option("chunk_size", 25)
        .option("rows_per_batch", 40)
        .load()
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    assert sum(len(b) for b in batches) == 0, batches


def test_arrow_read_path_matches_row_path(spark):
    """arrow=true serves RecordBatches per chunk — identical rows, and
    pushdown/pruning still applies before any batch is built."""
    python_ds.register(spark)
    row = _read(spark, rows=3000, chunk=700)
    arrow = (
        spark.read.format("flowbyte_synth")
        .option("rows", 3000)
        .option("chunk_size", 700)
        .option("arrow", "true")
        .load()
    )
    a = sorted(map(tuple, row.collect()))
    b = sorted(map(tuple, arrow.collect()))
    assert a == b
    pruned = arrow.where("event_id >= 1400 AND event_id < 2100")
    assert pruned.rdd.getNumPartitions() == 1
    assert pruned.count() == 700


def test_pushdown_property(spark):
    """Random range-predicate combinations: pushed planning must never
    change results vs the local generator (the property that matters —
    pruning is an optimization, not a semantics change)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    python_ds.register(spark)
    df = _read(spark, rows=200, chunk=30)

    @given(
        st.lists(
            st.tuples(st.sampled_from([">=", ">", "<", "<=", "="]),
                      st.integers(min_value=-10, max_value=210)),
            min_size=0,
            max_size=3,
        )
    )
    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def check(preds):
        cond = " AND ".join(f"event_id {op} {v}" for op, v in preds) or "true"
        got = sorted(r.event_id for r in df.where(cond).collect())

        def ok(i):
            for op, v in preds:
                if op == ">=" and not i >= v: return False
                if op == ">" and not i > v: return False
                if op == "<" and not i < v: return False
                if op == "<=" and not i <= v: return False
                if op == "=" and not i == v: return False
            return True

        assert got == [i for i in range(200) if ok(i)]

    check()


def test_commit_scoped_to_own_job_and_manifest_atomic(spark, tmp_path):
    """ADVICE r5: commit() must only sweep ITS OWN staged files (a
    concurrent append job's in-flight files survive), and the manifest
    must be swapped atomically (no .tmp debris, previous manifest never
    truncated in place)."""
    import os

    dest = str(tmp_path / "sink2")
    os.makedirs(dest)
    staging = os.path.join(dest, "_staging")
    os.makedirs(staging)
    # another job's in-flight staged file (different job token)
    inflight = os.path.join(staging, "part-otherjob0001-00000-a0.jsonl")
    with open(inflight, "w") as f:
        f.write('{"event_id": -7}\n')
    _read(spark, rows=20, chunk=5).write.format("flowbyte_synth").option(
        "path", dest
    ).mode("append").save()
    # our commit published our rows but left the other job's file alone
    assert os.path.exists(inflight), "concurrent job's staged file was swept"
    assert python_ds.read_manifest(spark, dest).count() == 20
    # no temp-manifest debris after the atomic swap
    assert not [f for f in os.listdir(dest) if f.startswith("_MANIFEST.")]


def test_commit_lock_blocks_and_releases(tmp_path):
    """The commit lock must serialize manifest read-modify-writes: while
    another job holds _MANIFEST.lock, commit() blocks; when the lock
    clears, it proceeds and merges; a stale lock times out fail-loud."""
    import json
    import os
    import threading
    import time

    from flowbyte_spark.sources.python_ds import _DirWriter, _FileCommit

    dest = str(tmp_path / "sink3")
    staging = os.path.join(dest, "_staging")
    os.makedirs(staging)

    # pre-existing committed state from "another job"
    with open(os.path.join(dest, "old.jsonl"), "w") as f:
        f.write('{"event_id": 1}\n')
    with open(os.path.join(dest, "_MANIFEST"), "w") as f:
        json.dump([{"file": "old.jsonl", "rows": 1}], f)

    w = _DirWriter({"path": dest}, overwrite=False)
    fname = f"part-{w.job}-00000-a0.jsonl"
    with open(os.path.join(staging, fname), "w") as f:
        f.write('{"event_id": 2}\n')

    # hold the lock; the commit thread must NOT publish until release
    lock = os.path.join(dest, "_MANIFEST.lock")
    open(lock, "w").close()
    done = threading.Event()

    def run():
        w.commit([_FileCommit(fname, 1)])
        done.set()

    t = threading.Thread(target=run)
    t.start()
    time.sleep(0.5)
    assert not done.is_set(), "commit proceeded while lock was held"
    with open(os.path.join(dest, "_MANIFEST")) as f:
        assert json.load(f) == [{"file": "old.jsonl", "rows": 1}]
    os.remove(lock)
    t.join(timeout=10)
    assert done.is_set()
    with open(os.path.join(dest, "_MANIFEST")) as f:
        files = {p["file"]: p["rows"] for p in json.load(f)}
    assert files == {"old.jsonl": 1, fname: 1}
    assert not os.path.exists(lock)


def test_commit_stale_lock_times_out(tmp_path, monkeypatch):
    import os

    import pytest

    from flowbyte_spark.sources import python_ds as pds

    dest = str(tmp_path / "sink4")
    os.makedirs(os.path.join(dest, "_staging"))
    open(os.path.join(dest, "_MANIFEST.lock"), "w").close()
    w = pds._DirWriter({"path": dest}, overwrite=False)
    # shrink the 30 s deadline for the test
    real_monotonic = __import__("time").monotonic
    base = real_monotonic()
    monkeypatch.setattr(
        "time.monotonic", lambda: base + (real_monotonic() - base) * 1000
    )
    with pytest.raises(TimeoutError, match="commit lock"):
        w.commit([])


def test_stream_writer_commits_per_epoch(spark, tmp_path):
    """DataSourceStreamWriter: each micro-batch publishes its staged
    files under one manifest entry; the drained sink equals the full
    synthetic table exactly (no dupes, no gaps)."""
    import json
    import os

    python_ds.register(spark)
    dest = str(tmp_path / "stream_sink")
    os.makedirs(dest)
    q = (
        spark.readStream.format("flowbyte_synth")
        .option("rows", 100)
        .option("chunk_size", 25)
        .option("rows_per_batch", 40)
        .load()
        .writeStream.format("flowbyte_synth")
        .option("path", dest)
        .option("checkpointLocation", str(tmp_path / "sw_ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    manifest = json.load(open(os.path.join(dest, "_STREAM_MANIFEST")))
    assert {k: sum(e["rows"] for e in v) for k, v in manifest.items()} == {
        "0": 40, "1": 40, "2": 20,
    }
    back = python_ds.read_stream_manifest(spark, dest)
    got = {r.event_id: (r.user_id, r.event_type, r.value) for r in back.collect()}
    assert got == {i: python_ds._row(i)[1:] for i in range(100)}
    # staged files all published, no leftovers
    assert not os.listdir(os.path.join(dest, "_staging"))


def test_stream_writer_epoch_replay_overwrites(tmp_path):
    """Exactly-once on top of at-least-once epoch replay: committing the
    SAME batchId again (restart re-runs the last uncommitted batch)
    replaces that epoch's manifest entry and retracts its old files
    instead of duplicating rows."""
    import json
    import os

    from flowbyte_spark.sources.python_ds import (
        _DirStreamWriter,
        _FileCommit,
        read_stream_manifest,
    )

    dest = str(tmp_path / "replay_sink")
    staging = os.path.join(dest, "_staging")
    os.makedirs(staging)

    def stage(writer, name, ids):
        with open(os.path.join(staging, name), "w") as f:
            for i in ids:
                f.write(json.dumps({"event_id": i}) + "\n")
        return _FileCommit(name, len(ids))

    w1 = _DirStreamWriter({"path": dest})
    m1 = stage(w1, f"epoch-00000007-{w1.job}-00000-a0.jsonl", [1, 2, 3])
    w1.commit([m1], 7)
    # replayed epoch 7 from a second attempt (fresh writer instance)
    w2 = _DirStreamWriter({"path": dest})
    m2 = stage(w2, f"epoch-00000007-{w2.job}-00000-a0.jsonl", [1, 2, 3, 4])
    w2.commit([m2], 7)

    manifest = json.load(open(os.path.join(dest, "_STREAM_MANIFEST")))
    assert list(manifest) == ["7"]
    assert [e["rows"] for e in manifest["7"]] == [4]
    # the first attempt's published file is gone from disk
    assert not os.path.exists(os.path.join(dest, m1.filename))
    # abort drops only that epoch's staged files
    w3 = _DirStreamWriter({"path": dest})
    m3 = stage(w3, f"epoch-00000008-{w3.job}-00000-a0.jsonl", [9])
    w3.abort([m3], 8)
    assert not os.listdir(staging)


def test_stream_writer_replay_crash_between_manifest_and_retract(
    tmp_path, monkeypatch, spark
):
    """Crash-injection for the commit ordering contract (ADVICE r6): the
    manifest must be published BEFORE the replaced epoch's files are
    deleted, so a crash in between leaves orphan files — never a manifest
    entry pointing at deleted data."""
    import json
    import os

    from flowbyte_spark.sources import python_ds
    from flowbyte_spark.sources.python_ds import (
        _DirStreamWriter,
        _FileCommit,
        read_stream_manifest,
    )

    dest = str(tmp_path / "crash_sink")
    staging = os.path.join(dest, "_staging")
    os.makedirs(staging)

    def stage(name, ids):
        with open(os.path.join(staging, name), "w") as f:
            for i in ids:
                f.write(json.dumps({"event_id": i}) + "\n")
        return _FileCommit(name, len(ids))

    w1 = _DirStreamWriter({"path": dest})
    m1 = stage(f"epoch-00000003-{w1.job}-00000-a0.jsonl", [1, 2])
    w1.commit([m1], 3)

    # Replay epoch 3; kill the process (simulated) on the FIRST retract
    # os.remove — i.e. after the manifest swap, before cleanup finishes.
    real_remove = os.remove

    def dying_remove(path, *a, **k):
        if os.path.basename(path).startswith("epoch-"):
            raise RuntimeError("simulated crash mid-retract")
        return real_remove(path, *a, **k)

    w2 = _DirStreamWriter({"path": dest})
    m2 = stage(f"epoch-00000003-{w2.job}-00000-a0.jsonl", [1, 2, 9])
    monkeypatch.setattr(python_ds.os, "remove", dying_remove)
    try:
        w2.commit([m2], 3)
    except RuntimeError:
        pass
    monkeypatch.setattr(python_ds.os, "remove", real_remove)

    # Every manifest-referenced file must exist; the committed epoch is
    # fully readable (the old attempt's file is a harmless orphan).
    manifest = json.load(open(os.path.join(dest, "_STREAM_MANIFEST")))
    for epoch, entries in manifest.items():
        for e in entries:
            assert os.path.exists(os.path.join(dest, e["file"])), (
                epoch,
                e,
            )
    back = read_stream_manifest(spark, dest)
    assert sorted(r.event_id for r in back.collect()) == [1, 2, 9]
