"""sources/evolved.py unit coverage beyond the v123 oracle gate:
contract conformance (defaults, casts, extras, order) and merge-read
NULL fill."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flowbyte_spark.sources.evolved import (
    conform,
    read_evolved,
    read_evolved_widening,
    widened_schema,
)


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
    with pytest.raises(ValueError, match="no paths"):
        read_evolved_widening(spark, [])


def test_merge_schema_hard_errors_on_type_drift(spark, tmp_path):
    # The failure mode the widening reader exists for: mergeSchema does
    # NOT NULL-fill conflicting types, it throws at planning time.
    p1, p2 = str(tmp_path / "e1"), str(tmp_path / "e2")
    spark.createDataFrame([(1,)], "k int").write.parquet(p1)
    spark.createDataFrame([(2,)], "k bigint").write.parquet(p2)
    with pytest.raises(Exception, match="[Mm]erg"):
        read_evolved(spark, [p1, p2]).collect()


def test_widening_int_to_long_and_float_to_double(spark, tmp_path):
    p1, p2 = str(tmp_path / "e1"), str(tmp_path / "e2")
    spark.createDataFrame([(1, 1.5)], "k int, v float").write.parquet(p1)
    spark.createDataFrame(
        [(2_000_000_000_000, 2.5, "new")], "k bigint, v double, tag string"
    ).write.parquet(p2)
    df = read_evolved_widening(spark, [p1, p2])
    assert df.schema.simpleString() == (
        "struct<k:bigint,v:double,tag:string>"
    )
    rows = {r.k: (r.v, r.tag) for r in df.collect()}
    assert rows == {1: (1.5, None), 2_000_000_000_000: (2.5, "new")}


def test_widening_cross_chain_goes_to_double(spark):
    # int-or-narrower vs fractional widens to double LOSSLESSLY (53-bit
    # mantissa holds every int32); bigint vs fractional fails loud —
    # double rounds integers above 2^53 (ADVICE r11: match the decimal
    # branch's no-silent-truncation policy).
    import pytest
    from pyspark.sql import types as T

    s1 = T.StructType.fromDDL("v INT")
    s2 = T.StructType.fromDDL("v FLOAT")
    assert widened_schema([s1, s2]).fields[0].dataType == T.DoubleType()
    s3 = T.StructType.fromDDL("v BIGINT")
    with pytest.raises(ValueError, match="2\\^53"):
        widened_schema([s3, s2])


def test_widening_covers_narrow_integrals(spark):
    # ByteType/ShortType simpleString() are 'tinyint'/'smallint' — the
    # lattice must widen them, not reject them as incompatible.
    from pyspark.sql import types as T

    s1 = T.StructType.fromDDL("v SMALLINT")
    s2 = T.StructType.fromDDL("v INT")
    assert widened_schema([s1, s2]).fields[0].dataType == T.IntegerType()
    s3 = T.StructType.fromDDL("v TINYINT")
    assert widened_schema([s3, s1]).fields[0].dataType == T.ShortType()


def test_widening_decimals(spark, tmp_path):
    # decimal(p,s) drift widens to hold every value of both epochs:
    # integer digits max, scale max — and hard-caps at precision 38.
    from pyspark.sql import types as T

    s1 = T.StructType.fromDDL("v DECIMAL(10,2)")
    s2 = T.StructType.fromDDL("v DECIMAL(12,4)")
    assert widened_schema([s1, s2]).fields[0].dataType == T.DecimalType(12, 4)
    # (20,0) vs (10,6): 20 int digits + 6 scale = 26
    s3 = T.StructType.fromDDL("v DECIMAL(20,0)")
    s4 = T.StructType.fromDDL("v DECIMAL(10,6)")
    assert widened_schema([s3, s4]).fields[0].dataType == T.DecimalType(26, 6)
    with pytest.raises(ValueError, match="precision"):
        widened_schema(
            [
                T.StructType.fromDDL("v DECIMAL(38,0)"),
                T.StructType.fromDDL("v DECIMAL(38,20)"),
            ]
        )
    # end-to-end through parquet epochs
    from decimal import Decimal

    p1, p2 = str(tmp_path / "e1"), str(tmp_path / "e2")
    spark.createDataFrame(
        [(1, Decimal("12345678.99"))], "k int, v decimal(10,2)"
    ).write.parquet(p1)
    spark.createDataFrame(
        [(2, Decimal("1.2345"))], "k int, v decimal(12,4)"
    ).write.parquet(p2)
    df = read_evolved_widening(spark, [p1, p2])
    assert df.schema["v"].dataType.simpleString() == "decimal(12,4)"
    rows = {r.k: str(r.v) for r in df.collect()}
    assert rows == {1: "12345678.9900", 2: "1.2345"}


def test_widening_incompatible_fails_loud(spark, tmp_path):
    p1, p2 = str(tmp_path / "e1"), str(tmp_path / "e2")
    spark.createDataFrame([(1, "abc")], "k int, v string").write.parquet(p1)
    spark.createDataFrame([(2, 9.0)], "k int, v double").write.parquet(p2)
    with pytest.raises(ValueError, match="incompatible epoch types"):
        read_evolved_widening(spark, [p1, p2])
