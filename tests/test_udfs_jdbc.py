"""Tests: pandas-UDF tier equivalence with the Catalyst tier, and JDBC
option construction (no driver in env — construction must be exact and
fail-fast)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flowbyte_spark.catalog import load_table
from flowbyte_spark.functions import cosine_similarity, q4
from flowbyte_spark.functions.udfs import (
    cosine_sim_pandas,
    grouped_mean_embedding,
    token_count_pandas,
)
from flowbyte_spark.operators.text import token_count
from flowbyte_spark.sources.jdbc import JDBCSource

SF = "/root/testdata/sf0.001"


def test_pandas_cosine_matches_catalyst(spark):
    emb = load_table(spark, SF, "embeddings")
    pair = emb.alias("a").limit(50).crossJoin(
        emb.alias("b").where(F.col("vec_id") == 3).select(
            F.col("embedding").alias("qv")
        )
    )
    both = pair.select(
        q4(cosine_similarity(F.col("embedding"), F.col("qv"))).alias("catalyst"),
        q4(cosine_sim_pandas(F.col("embedding"), F.col("qv"))).alias("pandas"),
    ).collect()
    assert all(r.catalyst == r.pandas for r in both)


def test_pandas_token_count_matches_catalyst(spark):
    docs = load_table(spark, SF, "documents").limit(100)
    rows = docs.select(
        token_count("text").alias("catalyst"),
        token_count_pandas(F.col("text")).alias("pandas"),
    ).collect()
    assert all(r.catalyst == r.pandas for r in rows)


def test_grouped_mean_embedding(spark):
    emb = load_table(spark, SF, "embeddings")
    out = grouped_mean_embedding(emb, "label", "embedding")
    rows = {r.label: r for r in out.collect()}
    assert set(rows) == set(range(10))
    assert sum(r.n for r in rows.values()) == emb.count()
    assert all(len(r.mean_embedding) == 64 for r in rows.values())


# ---------------------------------------------------------------------------
# JDBC configuration building
# ---------------------------------------------------------------------------


def _src() -> JDBCSource:
    return JDBCSource(
        url="jdbc:sqlserver://h;databaseName=db",
        user="u",
        password="p",
        driver="com.microsoft.sqlserver.jdbc.SQLServerDriver",
    )


def test_jdbc_read_options_query():
    opts = _src().read_options(query="SELECT 1 AS x")
    assert opts["query"] == "SELECT 1 AS x"
    assert opts["fetchsize"] == "10000"  # reference default chunksize
    assert "dbtable" not in opts


def test_jdbc_read_options_partitioned():
    opts = _src().read_options(
        table="dbo.orders",
        partition_column="o_orderkey",
        lower_bound=0,
        upper_bound=1_000_000,
        num_partitions=64,
    )
    assert opts["partitionColumn"] == "o_orderkey"
    assert opts["numPartitions"] == "64"
    assert opts["dbtable"] == "dbo.orders"


@pytest.mark.parametrize(
    "kwargs",
    [
        {},  # neither query nor table
        {"query": "SELECT 1", "table": "t"},  # both
        {"table": "t", "partition_column": "k"},  # incomplete partitioning
        {"query": "SELECT 1", "partition_column": "k", "lower_bound": 0,
         "upper_bound": 1, "num_partitions": 2},  # partitioned query
    ],
)
def test_jdbc_read_options_validation(kwargs):
    with pytest.raises(ValueError):
        _src().read_options(**kwargs)


def test_jdbc_write_options():
    opts = _src().write_options("dbo.t", batchsize=5000, truncate=True)
    assert opts["batchsize"] == "5000"
    assert opts["truncate"] == "true"
    assert opts["url"].startswith("jdbc:sqlserver://")
