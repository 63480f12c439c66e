"""V32 — streaming verification query: an actual Structured Streaming job
whose final state must equal the batch twin (and therefore the same DuckDB
oracle as the batch time-bucket query V15).

The events fixture is re-materialized into scratch as 2 files → 2
deterministic micro-batches (the first proves incremental state, the
second the final answer; deeper 4-batch/late-data scenarios live in
tests/test_streaming.py); the tumbling-window aggregation runs with
``availableNow`` and complete output mode; the final batch is the answer.
"""

from __future__ import annotations

import shutil

from pyspark.sql import DataFrame, SparkSession

from flowbyte_spark.catalog import load_table
from flowbyte_spark.queries import register
from flowbyte_spark.queries.tier_a import _scratch_dir
from flowbyte_spark.streaming import (
    foreach_batch_sink,
    read_event_stream,
    run_available_now,
    tumbling_window_agg,
)

_V15_ORACLE = """
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_ts,
           event_type,
           COUNT(*) AS cnt,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE), 2) AS sum_value
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
"""


@register("v32_streaming_window", oracle=_V15_ORACLE)
def v32_streaming_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    src = _scratch_dir("v32_events")
    ckpt = _scratch_dir("v32_ckpt")
    # Re-materialize with microsecond timestamps (the raw fixture is
    # nanos-typed parquet, which the file-stream source cannot consume).
    load_table(spark, sf_dir, "events").repartition(2).write.parquet(src)

    stream = read_event_stream(spark, src, max_files_per_trigger=1)
    agg = tumbling_window_agg(stream, "1 hour", watermark="3650 days")

    final: list = []

    def write(batch_df: DataFrame, batch_id: int) -> None:
        final.clear()
        final.extend(batch_df.collect())

    writer = foreach_batch_sink(
        agg, write, checkpoint=ckpt, output_mode="complete"
    )
    run_available_now(writer)

    schema = "hour_ts STRING, event_type STRING, cnt BIGINT, sum_value DOUBLE"
    result = spark.createDataFrame(final, schema)
    shutil.rmtree(src, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)
    return result.orderBy("hour_ts", "event_type")
