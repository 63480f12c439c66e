"""sources/evolved.py unit coverage beyond the v123 oracle gate:
contract conformance (defaults, casts, extras, order) and merge-read
NULL fill."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flowbyte_spark.sources.evolved import conform, read_evolved


def test_conform_defaults_casts_order_and_extras(spark):
    df = spark.createDataFrame(
        [(1, "7.5", "junk")], "id int, amount string, extra string"
    )
    out = conform(
        df,
        "id BIGINT, amount DOUBLE, source STRING",
        defaults={"source": "legacy"},
    )
    assert [f.name for f in out.schema.fields] == ["id", "amount", "source"]
    assert [str(f.dataType) for f in out.schema.fields] == [
        "LongType()", "DoubleType()", "StringType()",
    ]
    row = out.collect()[0]
    assert (row.id, row.amount, row.source) == (1, 7.5, "legacy")


def test_conform_missing_without_default_is_null(spark):
    df = spark.createDataFrame([(1,)], "id int")
    row = conform(df, "id INT, tag STRING").collect()[0]
    assert row.tag is None


def test_read_evolved_fills_absent_columns(spark, tmp_path):
    p1, p2 = str(tmp_path / "e1"), str(tmp_path / "e2")
    spark.createDataFrame([(1, 10.0)], "k int, v double").write.parquet(p1)
    spark.createDataFrame(
        [(2, 20.0, "new")], "k int, v double, tag string"
    ).write.parquet(p2)
    df = read_evolved(spark, [p1, p2])
    rows = {r.k: r.tag for r in df.collect()}
    assert rows == {1: None, 2: "new"}


def test_read_evolved_rejects_empty(spark):
    with pytest.raises(ValueError, match="no paths"):
        read_evolved(spark, [])
