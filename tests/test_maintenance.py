"""Table maintenance: compaction and z-order clustering (operators/mutate.py)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from flowbyte_spark.catalog import load_table
from flowbyte_spark.operators.maintenance import compact, zorder_by, zorder_key
from flowbyte_spark.operators.mutate import ParquetTable

SF = "/root/testdata/sf0.001"


def _parquet_files(path):
    return sorted(
        os.path.join(r, f)
        for r, _d, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )


def test_compact_reduces_files_preserving_content(spark, tmp_path):
    path = str(tmp_path / "frag")
    src = load_table(spark, SF, "orders")
    # simulate streaming fragmentation: 40 tiny files
    src.repartition(40).write.parquet(path)
    t = ParquetTable(spark, path)
    before_rows = sorted(map(tuple, t.read().collect()))
    n_before, n_after = compact(t, target_file_mb=128)
    assert n_before >= 40 and n_after < n_before and n_after >= 1
    assert sorted(map(tuple, t.read().collect())) == before_rows


def test_zorder_key_interleaves_bits():
    # (x=0b10, y=0b01, 2 bits) -> z = x1 y1 x0 y0 = 1 0 0 1
    import pyspark.sql.functions as F  # noqa: F401

    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    row = spark.createDataFrame([(2, 1)], "x long, y long").select(
        zorder_key(["x", "y"], bits=2).alias("z")
    ).collect()[0]
    assert row.z == 0b1001


def test_zorder_clusters_both_dimensions(spark, tmp_path):
    """After z-order, a box predicate on EITHER clustered column touches
    a strict subset of files (parquet min/max pruning locality); a
    lexicographic sort only achieves that for its leading column."""
    path = str(tmp_path / "zt")
    events = load_table(spark, SF, "events").select(
        "event_id", "user_id", (F.round(F.col("value") * 100)).cast("long").alias("cents")
    )
    events.repartition(8).write.parquet(path)
    t = ParquetTable(spark, path)
    before_rows = sorted(map(tuple, t.read().collect()))
    zorder_by(t, ["user_id", "cents"], num_files=8, bits=12)
    assert sorted(map(tuple, t.read().collect())) == before_rows

    def files_touched(pred):
        return (
            t.read()
            .where(pred)
            .select(F.input_file_name())
            .distinct()
            .count()
        )

    total_files = len(_parquet_files(path))
    assert total_files >= 4
    # small boxes on each dimension touch < all files
    assert files_touched(F.col("user_id") < 5) < total_files
    assert files_touched(F.col("cents") < 500) < total_files


def test_zorder_nulls_go_to_bucket_zero(spark, tmp_path):
    """Review finding: F.least skips NULLs — they must land in bucket 0
    (with the minimums), not the top bucket."""
    path = str(tmp_path / "znull")
    spark.createDataFrame(
        [(i, None if i % 10 == 0 else i) for i in range(200)],
        "id long, k long",
    ).repartition(4).write.parquet(path)
    t = ParquetTable(spark, path)
    zorder_by(t, ["k", "id"], num_files=4, bits=8)
    f_null = {
        r.f
        for r in t.read()
        .where(F.col("k").isNull())
        .select(F.input_file_name().alias("f"))
        .distinct()
        .collect()
    }
    f_low = {
        r.f
        for r in t.read()
        .where(F.col("k") < 20)
        .select(F.input_file_name().alias("f"))
        .distinct()
        .collect()
    }
    f_high = {
        r.f
        for r in t.read()
        .where(F.col("k") > 180)
        .select(F.input_file_name().alias("f"))
        .distinct()
        .collect()
    }
    assert f_null & f_low, "NULLs not co-located with the low bucket"
    assert not (f_null & f_high), "NULLs leaked into the top bucket files"


def test_zorder_key_overflow_and_collision_guards(spark, tmp_path):
    import pytest as _pytest

    with _pytest.raises(ValueError, match="63"):
        zorder_key(["a", "b", "c", "d", "e", "f"], bits=12)
    # a user column literally named like an old temp col survives
    path = str(tmp_path / "zcoll")
    spark.createDataFrame(
        [(i, i % 7, f"v{i}") for i in range(50)],
        "id long, k long, __z__ string",
    ).write.parquet(path)
    t = ParquetTable(spark, path)
    zorder_by(t, ["k"], num_files=2, bits=8)
    assert "__z__" in t.read().columns
    assert t.read().count() == 50


def test_compact_refuses_partitioned_layout(spark, tmp_path):
    import pytest as _pytest

    path = str(tmp_path / "parts")
    load_table(spark, SF, "orders").withColumn(
        "pri", F.col("o_orderpriority")
    ).write.partitionBy("pri").parquet(path)
    t = ParquetTable(spark, path)
    with _pytest.raises(ValueError, match="partitioned"):
        compact(t)
