"""Round-12 verification queries (VERDICT r11 "next round" items):

- V133 triple-chained stateful streaming pipeline — the production
  dedup→attribute→window shape: ``dropDuplicatesWithinWatermark``
  upstream of the v132 stream-stream join feeding a tumbling-window
  aggregate, THREE chained stateful operators in ONE streaming query
  (Spark 4 multi-stateful support).  The source is deliberately
  poisoned with duplicate event rows; if the dedup stage silently
  failed, every duplicated view/click would double its join pairs and
  the hash gate against the clean batch twin would miss.
- V134 CBO statistics tier — ``ANALYZE TABLE ... COMPUTE STATISTICS
  FOR COLUMNS`` flipping a join ORDER (plan-asserted with the stats-on
  / stats-off disabler-control pattern, tests/test_cbo.py).  The one
  Catalyst-given capability (SURVEY §4.2) the reference delegates to
  SQL Server's optimizer (sql.py:109) that had no proof query.
"""

from __future__ import annotations

import shutil

from pyspark.sql import DataFrame, SparkSession, functions as F

from flowbyte_spark.catalog import load_table
from flowbyte_spark.queries import register


# ---------------------------------------------------------------------------
# V133 — dedup → stream-stream join → windowed agg, one streaming query.
# The v132 skeleton (two file-stream readers over one directory, two
# trailing sentinel files, sentinel filtering at the SINK only) with a
# dropDuplicatesWithinWatermark stage ahead of each join input.  The
# source holds every event whose event_id is divisible by 10 TWICE; the
# oracle is the clean batch join→window twin, so a dedup miss (doubled
# pairs) or an over-drop (missing pairs) both break the value hash.
# ---------------------------------------------------------------------------
@register(
    "v133_stream_dedup_join_window",
    oracle="""
    SELECT strftime(date_trunc('hour', v.ts), '%Y-%m-%d %H:%M:%S') AS hour_ts,
           CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM (SELECT * FROM events WHERE event_type = 'view') v
    JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON v.user_id = c.user_id
     AND c.ts >= v.ts
     AND c.ts <= v.ts + INTERVAL 30 MINUTE
    GROUP BY 1
    ORDER BY 1
    """,
)
def v133_stream_dedup_join_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flowbyte_spark.queries.streaming_q import (
        _memo_source,
        _scratch_dir,
        _write_events_then_sentinels,
    )
    from flowbyte_spark.streaming import (
        foreach_batch_sink,
        read_event_stream,
        run_available_now,
        scoped_sql_conf,
    )

    def build(path: str) -> None:
        events = load_table(spark, sf_dir, "events")
        cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
        # Poison the stream: every 10th event appears twice.  The
        # duplicates ride in the SAME write (shuffled across the real
        # files), so each side's dedup state must actually hold them
        # across micro-batches.
        dupes = events.where(F.col("event_id") % 10 == 0)
        poisoned = events.unionByName(dupes)
        sentinels = spark.createDataFrame(
            [
                (-1, -999901, "view", 0.0, "{}"),
                (-2, -999902, "click", 0.0, "{}"),
            ],
            "event_id long, user_id long, event_type string, "
            "value double, props string",
        ).withColumn("ts", F.lit("2100-01-01 00:00:00").cast("timestamp"))
        _write_events_then_sentinels(
            path, poisoned, sentinels, cols, sentinel_copies=2
        )

    src = _memo_source("v133_events", sf_dir, build)
    ckpt = _scratch_dir("v133_ckpt")

    def deduped_side(event_type: str, alias: str) -> DataFrame:
        # Watermark FIRST (dropDuplicatesWithinWatermark requires one),
        # then dedup on the event key: state is per-side and expires
        # with the watermark on a live stream; the horizon here spans
        # the bounded run, as in every sentinel-flushed query.  The
        # event_type filter is safe to push into the scan — each side's
        # sentinel carries that side's type, so row-group stats cannot
        # starve a watermark node (the v132 root cause only bites on
        # predicates that exclude sentinel files entirely).
        return (
            read_event_stream(spark, src, max_files_per_trigger=1)
            .where(F.col("event_type") == event_type)
            .withWatermark("ts", "3650 days")
            .dropDuplicatesWithinWatermark(["event_id"])
            .alias(alias)
        )

    views = deduped_side("view", "l")
    clicks = deduped_side("click", "r")
    cond = (
        (F.col("l.user_id") == F.col("r.user_id"))
        & (F.col("r.ts") >= F.col("l.ts"))
        & (F.col("r.ts") <= F.col("l.ts") + F.expr("INTERVAL 30 minutes"))
    )
    # No sentinel guard in-plan (v132 landmine): sentinels join nothing
    # (disjoint negative user ids) and windows on ts=2100 never emit
    # inside the run, so the sink filter below is belt-and-braces.
    joined = views.join(clicks, cond, "inner")
    agg = (
        joined.groupBy(F.window(F.col("l.ts"), "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("hour_ts"),
            "n_pairs",
        )
    )
    out = _scratch_dir("v133_result")

    def write(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.where(F.col("hour_ts") < "2099-01-01").write.mode(
            "append"
        ).parquet(out)

    writer = foreach_batch_sink(
        agg, write, checkpoint=ckpt, output_mode="append"
    )
    with scoped_sql_conf(spark, **{"spark.sql.shuffle.partitions": "4"}):
        run_available_now(writer)
    shutil.rmtree(ckpt, ignore_errors=True)
    return spark.read.parquet(out).orderBy("hour_ts")


# ---------------------------------------------------------------------------
# V134 — CBO statistics tier: ANALYZE'd catalog tables + cost-based join
# reorder.  Written in the WORST order — the two big facts joined first,
# the selective customer filter last; with stats + CBO the optimizer
# rewrites it to hit the filtered dimension before the lineitem fan-out.
# tests/test_cbo.py asserts the ORDER flip stats-on vs stats-off (v120
# disabler-control pattern); this query gates the RESULT is order-
# independent.  The aggregate is materialized inside the scoped-conf
# block (localCheckpoint) because optimization happens at action time —
# a lazily returned plan would be optimized AFTER the scope exits, with
# CBO silently off (the v132 materialize-inside-scope precedent).
# ---------------------------------------------------------------------------
@register(
    "v134_cbo_join_order",
    oracle="""
    SELECT o.o_orderpriority AS priority,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           ROUND(CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                               AS DECIMAL(38,6))) AS DOUBLE), 2) AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_mktsegment = 'BUILDING' AND c.c_nationkey = 3
    GROUP BY 1
    ORDER BY 1
    """,
)
def v134_cbo_join_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flowbyte_spark.functions import dec_sum
    from flowbyte_spark.operators.cbo import CBO_CONFS, register_analyzed_table
    from flowbyte_spark.streaming import scoped_sql_conf

    li = register_analyzed_table(
        spark, sf_dir, "lineitem",
        ["l_orderkey", "l_extendedprice", "l_discount"],
    )
    orders = register_analyzed_table(
        spark, sf_dir, "orders",
        ["o_orderkey", "o_custkey", "o_orderpriority"],
    )
    cust = register_analyzed_table(
        spark, sf_dir, "customer",
        ["c_custkey", "c_mktsegment", "c_nationkey"],
    )
    l, o, c = spark.table(li), spark.table(orders), spark.table(cust)
    shaped = (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .where(
            (F.col("c_mktsegment") == "BUILDING") & (F.col("c_nationkey") == 3)
        )
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dec_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")),
                "revenue",
            ),
        )
        .orderBy("priority")
    )
    with scoped_sql_conf(spark, **CBO_CONFS):
        return shaped.localCheckpoint(eager=True)
