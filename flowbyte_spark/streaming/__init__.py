"""Structured Streaming operators (charter scope; the reference is
batch-only — SURVEY.md §2.9).

Everything operates on the ``events`` shape (event_id, ts, user_id,
event_type, value, props) and mirrors a batch twin so correctness is
checkable deterministically:

- tumbling/sliding windowed aggregation == V15's ``F.window`` batch query;
- session windows via ``F.session_window``;
- stateful dedup via ``dropDuplicatesWithinWatermark``;
- ``foreach_batch_sink`` carries the reference's post-load orchestration
  hook (Power BI refresh trigger, pbi.py:163-214) into streaming land.

Watermarks bound state: at 100 TB/day the windowed-agg state store holds
only (watermark horizon / slide) windows per key, and late rows beyond the
horizon are dropped deterministically.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from flowbyte_spark.functions import dec_sum

EVENTS_SCHEMA = (
    "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
    "event_type STRING, value DOUBLE, props STRING"
)


def read_event_stream(
    spark: SparkSession,
    path: str,
    schema: StructType | str = EVENTS_SCHEMA,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """File-source stream over parquet event files.

    ``maxFilesPerTrigger`` shapes deterministic micro-batches in tests; in
    production it is the ingest back-pressure knob.
    """
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def tumbling_window_agg(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    slide: str | None = None,
) -> DataFrame:
    """Windowed count+sum per (window, event_type) with late-data bound.

    ``slide`` turns the tumbling window into a sliding one.  The output is
    schema-compatible with the batch twin (V15) so streaming results can be
    asserted against a plain batch aggregation of the same files.
    """
    win = (
        F.window("ts", window, slide) if slide else F.window("ts", window)
    )
    return (
        events.withWatermark("ts", watermark)
        .groupBy(win.alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            dec_sum("value", "sum_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("hour_ts"),
            "event_type",
            "cnt",
            "sum_value",
        )
    )


def session_window_agg(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-user session windows: a session closes after ``gap`` of
    inactivity.  State per key is one open session — the canonical
    ``F.session_window`` operator."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("s"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dec_sum("value", "sum_value"),
        )
        .select(
            F.date_format("s.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format("s.end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )


def dedup_within_watermark(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Stateful streaming dedup: drops rows whose keys were already seen
    within the watermark horizon (state is GC'd past it — bounded memory,
    unlike a naive distinct)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        keys or ["event_id"]
    )


def foreach_batch_sink(
    stream: DataFrame,
    write: Callable[[DataFrame, int], None],
    post_batch_hook: Callable[[int], None] | None = None,
    checkpoint: str | None = None,
    output_mode: str = "update",
):
    """``foreachBatch`` sink with an optional post-load orchestration hook.

    The hook is the streaming home of the reference's dataset-refresh
    trigger (pbi.py:163-214): after each micro-batch lands, notify the
    downstream consumer (REST call, cache bust, BI refresh).  Hook failures
    are isolated — a refresh error must not poison the stream.
    """
    from flowbyte_spark import log

    def process(batch_df: DataFrame, batch_id: int) -> None:
        write(batch_df, batch_id)
        if post_batch_hook is not None:
            try:
                post_batch_hook(batch_id)
            except Exception as exc:  # orchestration is best-effort
                log.warning(f"post-batch hook failed for batch {batch_id}: {exc}")

    writer = stream.writeStream.foreachBatch(process).outputMode(output_mode)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer


def run_available_now(writer) -> None:
    """Drain everything currently available, then stop — the deterministic
    trigger used by tests and backfills."""
    q = writer.trigger(availableNow=True).start()
    q.awaitTermination()


import contextlib


@contextlib.contextmanager
def scoped_sql_conf(spark: SparkSession, **confs: str):
    """Set runtime SQL confs for the duration of a synchronous streaming
    run, restoring the previous values after.

    The canonical use is right-sizing stateful-shuffle width: a stream's
    state-store partition count is fixed from ``spark.sql.shuffle.partitions``
    when its (fresh) checkpoint is initialized, and a watermarked hourly
    window grid holds only (horizon / slide) windows — 32 state partitions
    for ~25 live windows is 32 store opens + commits + checkpoint files
    per micro-batch of pure overhead.  On a real cluster the same knob is
    sized to executor count before the stream starts; AQE cannot help,
    because stateful exchanges are excluded from runtime coalescing
    (state partitioning must stay stable across batches).

    CONCURRENCY (ADVICE r11): runtime SQL confs are SESSION-global —
    any query submitted on the same ``SparkSession`` while this scope
    is open inherits the overridden values.  Callers (the bench driver,
    the importance-weights collect) are sequential by construction; for
    concurrent use, take a cloned session (``spark.newSession()``
    shares the SparkContext but isolates the SQL conf) and scope the
    confs there instead.
    """
    keys = {k.replace("__", ".") if "__" in k else k: v for k, v in confs.items()}
    old: dict[str, str | None] = {}
    for k, v in keys.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def stream_stream_outer_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    max_delay: str = "30 minutes",
    watermark: str = "1 second",
    how: str = "left_outer",
) -> DataFrame:
    """LEFT (or FULL) OUTER event-time join of two streams: like
    :func:`stream_stream_join`, but a left row whose match window
    closes unmatched EMITS with a null right side instead of vanishing.
    ``how="full_outer"`` additionally emits unmatched RIGHT rows with a
    null left side — the time-range condition bounds both sides'
    state, so eviction works symmetrically.

    The emission is watermark-driven: an unmatched left row surfaces
    only once the global watermark (the MIN across both sides) passes
    ``left_ts + max_delay`` — so, unlike the inner join, the tail of a
    finite run never flushes by itself.  Callers that drain a bounded
    backfill deterministically must push the watermark past every real
    row's expiry — the sentinel pattern: append one far-future row per
    side (keys that match nothing), run availableNow, filter sentinels
    out of the sink (see queries/round10b.py:v119).  At 100 TB the
    state bound is identical to the inner join's: per key, whatever
    falls inside the delay window.
    """
    l = left.withWatermark(left_ts, watermark).alias("l")
    r = right.withWatermark(right_ts, watermark).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}"))
        & (
            F.col(f"r.{right_ts}")
            <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {max_delay}")
        )
    )
    if how not in ("left_outer", "full_outer"):
        raise ValueError(f"how must be left_outer or full_outer, got {how!r}")
    return l.join(r, cond, how)


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    max_delay: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Event-time inner join of two streams: right rows within
    ``[left_ts, left_ts + max_delay]`` of a matching key.

    Both sides carry watermarks and the join condition carries the time
    range — the pair Structured Streaming needs to bound join state: a
    buffered left row can be dropped once the right watermark passes
    ``left_ts + max_delay``, a right row once the left watermark passes
    ``right_ts``.  At 100 TB/day the state per key is whatever falls in
    the delay window, independent of stream length.  Sides are aliased
    ``l``/``r``; callers project from those.
    """
    l = left.withWatermark(left_ts, watermark).alias("l")
    r = right.withWatermark(right_ts, watermark).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}"))
        & (
            F.col(f"r.{right_ts}")
            <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {max_delay}")
        )
    )
    return l.join(r, cond, "inner")
