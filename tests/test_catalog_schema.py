"""Schema contract for the fixture catalog (VERDICT r3 #6).

Round 3's only wrong answer (v34) came from fixture-type drift: the events
``ts`` column regenerated as naive ``timestamp[us]``, Spark 4 read it as
TIMESTAMP_NTZ, and a downstream cast became illegal.  ``load_table`` is now
the single choke point that normalizes every temporal column to
TimestampType (LTZ under the pinned-UTC session); this test pins that
contract for EVERY table at EVERY scale factor, so a fixture regen with
us/ns/NTZ timestamps cannot reach a registered query un-normalized.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql.types import TimestampType

from flowbyte_spark.catalog import TABLES, load_table, table_path

SF_DIRS = [
    d for d in (
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    )
    if os.path.exists(d)
]


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_no_raw_temporal_types_survive_load(spark, sf_dir):
    # Schema-only assertions: load_table is lazy, so this reads parquet
    # footers, never data — cheap enough to cover every (table, sf) pair.
    for name in TABLES:
        if not os.path.exists(table_path(sf_dir, name)):
            continue
        df = load_table(spark, sf_dir, name)
        for f in df.schema.fields:
            assert f.dataType.typeName() != "timestamp_ntz", (
                f"{sf_dir}/{name}.{f.name} leaked TIMESTAMP_NTZ through "
                "load_table — the NTZ→LTZ normalization is broken"
            )


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_events_ts_is_ltz_timestamp(spark, sf_dir):
    # The column whose drift broke v34: must always land as TimestampType.
    df = load_table(spark, sf_dir, "events")
    assert isinstance(df.schema["ts"].dataType, TimestampType)


def test_int96_spark_written_table_roundtrips(spark, tmp_path):
    # Spark's legacy INT96 timestamps report as timestamp[ns] in parquet
    # footers, but Spark reads them as proper TIMESTAMP — load_table must
    # NOT apply the nanos-as-long rewrite to them (found at 10x bench:
    # inflated Spark-written tables hit a div-on-timestamp type error).
    from datetime import datetime

    sf_dir = str(tmp_path)
    spark.conf.set("spark.sql.parquet.outputTimestampType", "INT96")
    try:
        spark.createDataFrame(
            [(1, datetime(2024, 1, 1, 12, 0, 0))], "id BIGINT, ts TIMESTAMP"
        ).write.parquet(os.path.join(sf_dir, "events.parquet"))
    finally:
        spark.conf.set(
            "spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS"
        )

    df = load_table(spark, sf_dir, "events")
    assert isinstance(df.schema["ts"].dataType, TimestampType)
    [row] = df.collect()
    assert row["ts"].replace(tzinfo=None) == datetime(2024, 1, 1, 12, 0, 0)


def test_ntz_fixture_roundtrip(spark, tmp_path):
    # Synthesize the exact drift that broke v34: a naive-micros parquet
    # file.  load_table must hand back LTZ with identical wall-clock values.
    import pyarrow as pa
    import pyarrow.parquet as pq
    from datetime import datetime

    sf_dir = str(tmp_path)
    t = pa.table(
        {
            "id": pa.array([1, 2], pa.int64()),
            "ts": pa.array(
                [datetime(2024, 1, 1, 12, 0, 0, 123456), datetime(2024, 6, 1)],
                pa.timestamp("us"),  # naive → Spark 4 reads TIMESTAMP_NTZ
            ),
        }
    )
    pq.write_table(t, os.path.join(sf_dir, "events.parquet"))

    df = load_table(spark, sf_dir, "events")
    assert isinstance(df.schema["ts"].dataType, TimestampType)
    got = sorted(r["ts"].replace(tzinfo=None) for r in df.collect())
    assert got == [
        datetime(2024, 1, 1, 12, 0, 0, 123456),
        datetime(2024, 6, 1),
    ]
