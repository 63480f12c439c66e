"""Unit tests for Tier-A operators: merge semantics (incl. the reference's
quirks), mutation protocol, cast directives."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DecimalType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from flowbyte_spark.operators.casts import apply_casts, normalize_decimals
from flowbyte_spark.operators.merge import update_by_keys, update_from_table
from flowbyte_spark.operators.mutate import ParquetTable

SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("name", StringType()),
        StructField("bal", DoubleType()),
    ]
)


@pytest.fixture
def target(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], SCHEMA
    )


def rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_update_by_keys_list_of_dicts(spark, target):
    merged = update_by_keys(target, [{"id": 2, "bal": 99.0}], ["id"])
    assert rows(merged) == [(1, "a", 10.0), (2, "b", 99.0), (3, "c", 30.0)]


def test_update_by_keys_last_record_wins(spark, target):
    # the reference applies records in order, each overwriting the previous
    merged = update_by_keys(
        target, [{"id": 2, "bal": 50.0}, {"id": 2, "bal": 75.0}], ["id"]
    )
    assert rows(merged) == [(1, "a", 10.0), (2, "b", 75.0), (3, "c", 30.0)]


def test_update_by_keys_unmatched_update_ignored(spark, target):
    # an UPDATE never inserts
    merged = update_by_keys(target, [{"id": 42, "bal": 1.0}], ["id"])
    assert rows(merged) == rows(target)


def test_update_by_keys_idempotent(spark, target):
    delta = [{"id": 1, "name": "z"}]
    once = update_by_keys(target, delta, ["id"])
    twice = update_by_keys(once, delta, ["id"])
    assert rows(once) == rows(twice)


def test_update_by_keys_missing_key_skipped_with_warning(spark, target):
    # mirror of sql.py:236-239: a key column absent from the records is
    # dropped from the merge predicate (with a warning); the rest still joins
    merged = update_by_keys(target, [{"id": 1, "bal": 0.0}], ["id", "nope_key"])
    assert rows(merged) == [(1, "a", 0.0), (2, "b", 20.0), (3, "c", 30.0)]


def test_update_by_keys_no_usable_keys_raises(spark, target):
    with pytest.raises(ValueError):
        update_by_keys(target, [{"bal": 0.0}], ["nope"])


def test_update_by_keys_rejects_non_dicts(spark, target):
    with pytest.raises(TypeError):
        update_by_keys(target, [("id", 1)], ["id"])


def test_update_from_table_skips_first_column_quirk(spark, target):
    # reference SETs df.columns[1:] (sql.py:271): first source column is
    # never written even when it is a data column
    source = spark.createDataFrame(
        [("IGNORED", 1, 111.0)],
        StructType(
            [
                StructField("name", StringType()),
                StructField("id", LongType()),
                StructField("bal", DoubleType()),
            ]
        ),
    )
    merged = update_from_table(target, source, ["id"])
    assert rows(merged) == [(1, "a", 111.0), (2, "b", 20.0), (3, "c", 30.0)]


def test_update_from_table_native_mode_updates_all(spark, target):
    source = spark.createDataFrame(
        [("ZZZ", 1, 111.0)],
        StructType(
            [
                StructField("name", StringType()),
                StructField("id", LongType()),
                StructField("bal", DoubleType()),
            ]
        ),
    )
    merged = update_from_table(
        target, source, ["id"], compat_skip_first_column=False
    )
    assert rows(merged) == [(1, "ZZZ", 111.0), (2, "b", 20.0), (3, "c", 30.0)]


# ---------------------------------------------------------------------------
# ParquetTable mutation protocol
# ---------------------------------------------------------------------------


def test_parquet_table_cycle(spark, target, tmp_path):
    path = str(tmp_path / "t")
    table = ParquetTable(spark, path)
    table.overwrite(target)
    assert table.read().count() == 3

    extra = spark.createDataFrame([(4, "d", 40.0)], SCHEMA)
    table.append(extra)
    assert table.read().count() == 4

    deleted = table.delete_where("bal >= 30.0")
    assert deleted == 2
    assert rows(table.read()) == [(1, "a", 10.0), (2, "b", 20.0)]

    table.update_by_keys([{"id": 1, "name": "A"}], ["id"])
    assert rows(table.read()) == [(1, "A", 10.0), (2, "b", 20.0)]

    table.truncate()
    assert table.read().count() == 0
    assert [f.name for f in table.read().schema.fields] == ["id", "name", "bal"]


def test_delete_where_rejects_garbage(spark, target, tmp_path):
    path = str(tmp_path / "t2")
    table = ParquetTable(spark, path)
    table.overwrite(target)
    with pytest.raises(Exception):
        # not a boolean expression — fails closed (the reference would
        # happily interpolate this into SQL, sql.py:331)
        table.delete_where("DROP TABLE students")
    assert table.read().count() == 3  # unchanged


# ---------------------------------------------------------------------------
# Cast directives
# ---------------------------------------------------------------------------


def test_apply_casts(spark):
    df = spark.createDataFrame([(1, 1, "2.5")], "a INT, b INT, c STRING")
    out = apply_casts(
        df, category_columns=["a"], bool_columns=["b"], float_columns=["c"]
    )
    types = {f.name: f.dataType.simpleString() for f in out.schema.fields}
    assert types == {"a": "string", "b": "boolean", "c": "double"}
    assert out.collect()[0] == ("1", True, 2.5)


def test_round_columns_is_noop(spark):
    df = spark.createDataFrame([(1.234,)], "x DOUBLE")
    out = apply_casts(df, round_columns=["x"])
    assert out.collect()[0][0] == 1.234  # dead parameter, parity with sql.py:88


def test_normalize_decimals(spark):
    df = spark.createDataFrame([(1,)], "k INT").select(
        F.col("k").cast(DecimalType(10, 2)).alias("d"), F.col("k")
    )
    out = normalize_decimals(df)
    types = {f.name: f.dataType for f in out.schema.fields}
    assert types["d"] == DecimalType(38, 20)
    assert types["k"].simpleString() == "int"  # non-decimals untouched
