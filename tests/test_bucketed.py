"""Bucketed-table co-location: the join of two tables bucketed on the join
key must plan with zero shuffle exchanges."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flowbyte_spark import plans
from flowbyte_spark.catalog import load_table
from flowbyte_spark.sources.bucketed import read_bucketed, write_bucketed

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        write_bucketed(
            load_table(spark, SF, "orders"),
            "b_orders",
            ["o_orderkey"],
            num_buckets=8,
            sort_by=["o_orderkey"],
        )
        write_bucketed(
            load_table(spark, SF, "lineitem"),
            "b_lineitem",
            ["l_orderkey"],
            num_buckets=8,
            sort_by=["l_orderkey"],
        )
        yield
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_is_shuffle_free(spark, bucketed_tables):
    orders = read_bucketed(spark, "b_orders")
    lineitem = read_bucketed(spark, "b_lineitem")
    # merge hint: this test verifies the SMB shape specifically (bucketed
    # scans report their layout as output partitioning, so the merge join
    # needs neither shuffle nor sort).  Since r16 the engine default
    # allows shuffled-hash joins (session.py), which would also be
    # shuffle-free here but is not the shape under test.
    joined = lineitem.hint("merge").join(
        orders, lineitem.l_orderkey == orders.o_orderkey
    ).select("l_orderkey", "o_totalprice")
    plan = plans.physical_plan(joined)
    assert plans.shuffle_exchanges(joined) == 0, plan
    assert "SortMergeJoin" in plan, plan


def test_bucketed_join_matches_plain_join(spark, bucketed_tables):
    bucketed = (
        read_bucketed(spark, "b_lineitem")
        .join(
            read_bucketed(spark, "b_orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    plain = (
        load_table(spark, SF, "lineitem")
        .join(
            load_table(spark, SF, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    assert sorted(map(tuple, bucketed.collect())) == sorted(
        map(tuple, plain.collect())
    )