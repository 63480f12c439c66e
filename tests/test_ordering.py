"""Size-adaptive global sort (operators/ordering.py) and its v13 user."""

from __future__ import annotations

from pyspark.sql import functions as F

from flowbyte_spark.catalog import load_table, table_path
from flowbyte_spark.operators import ordering
from flowbyte_spark.plans import physical_plan
from tests.conftest import SF_DIR_CORRECTNESS as SF


def _joined(spark, broadcast: bool):
    orders = load_table(spark, SF, "orders").select("o_orderkey", "o_custkey")
    customer = load_table(spark, SF, "customer").select("c_custkey")
    if broadcast:
        customer = F.broadcast(customer)
    return orders.join(customer, orders.o_custkey == F.col("c_custkey"))


def test_single_partition_claim_matches_fixture(spark):
    assert ordering.fits_single_partition(
        spark, table_path(SF, "orders"), table_path(SF, "customer")
    )
    # and a deliberately tiny threshold flips it (the 100 TB branch)
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "1024")
    spark.conf.set("spark.sql.files.openCostInBytes", "1024")
    try:
        assert not ordering.fits_single_partition(
            spark, table_path(SF, "orders")
        )
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)
        spark.conf.set("spark.sql.files.openCostInBytes", "4194304")


def test_scan_partitions_matches_spark(spark, tmp_path):
    """The simulation must agree with Spark's actual FilePartition packing
    — single file, and the multi-small-file layout where a byte threshold
    gets it wrong (ten 60 KB files pack by open cost, not by size)."""
    for name in ("orders", "customer", "lineitem"):
        path = table_path(SF, name)
        actual = spark.read.parquet(path).rdd.getNumPartitions()
        assert ordering.scan_partitions(spark, path) == actual, name
    multi = str(tmp_path / "multi.parquet")
    spark.range(100000).repartition(10).write.parquet(multi)
    actual = spark.read.parquet(multi).rdd.getNumPartitions()
    assert ordering.scan_partitions(spark, multi) == actual
    assert not ordering.fits_single_partition(spark, multi)


def test_small_path_elides_range_exchange_and_totally_orders(spark):
    df = ordering.global_sort(
        _joined(spark, broadcast=True), "o_orderkey", single_partition=True
    )
    plan = physical_plan(df)
    assert "rangepartitioning" not in plan.lower()
    assert "Exchange hashpartitioning" not in plan
    keys = [r["o_orderkey"] for r in df.select("o_orderkey").collect()]
    assert keys == sorted(keys) and len(keys) > 0


def test_large_path_is_plain_orderby(spark):
    df = ordering.global_sort(
        _joined(spark, broadcast=False), "o_orderkey", single_partition=False
    )
    assert "rangepartitioning" in physical_plan(df).lower()


def test_both_paths_agree_on_v13(spark):
    from flowbyte_spark.queries import QUERIES

    small = QUERIES["v13_scalar_funcs"](spark, SF).collect()
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "1024")
    try:
        large = QUERIES["v13_scalar_funcs"](spark, SF).collect()
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)
    assert sorted(map(tuple, small)) == sorted(map(tuple, large))
    # the small path's rows come back already in ORDER BY order
    keys = [r["o_orderkey"] for r in small]
    assert keys == sorted(keys)
