"""Scale-killer verification queries: partition pruning, static and
dynamic (SURVEY.md §2 scale row; r8 VERDICT mandate #2).

Both queries write a date-partitioned copy of ``orders`` (partitioned
by order year — the layout a 100 TB deployment would use) and run a
predicated scan over it.  The DRIVER hash-gates the values against
DuckDB over the raw table; the PLAN-side proof (the scan actually read
only the selected partitions) lives in tests/test_partitions.py, which
asserts FileSourceScan's ``numPartitions`` metric post-execution — the
same split as test_maintenance's z-order file-pruning proof.

Reference anchor: delete_data_with_conditions (sql.py:321-332) is the
predicated pattern the reference's users run on partitioned layouts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from flowbyte_spark.catalog import load_table
from flowbyte_spark.functions import dec_sum
from flowbyte_spark.operators.partitions import dpp_join, write_partitioned
from flowbyte_spark.queries import register
from flowbyte_spark.queries.tier_a import _scratch_dir

_DSUM = "ROUND(CAST(SUM(CAST({x} AS DECIMAL(38,6))) AS DOUBLE), 2)"


_PART_CACHE: dict[str, str] = {}


def partitioned_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write orders partitioned by order year, return the partitioned
    scan.  The o_year directory column comes back as INT; o_orderdate
    itself is kept so row content is lossless.

    The layout is immutable once written (v102/v103 only read it), so
    it is built ONCE per (sf_dir, process) and reused — the write is
    table setup, exactly like bucketing: at 100 TB you partition at
    ingest, not per query.  Bench iterations therefore time the pruned
    SCAN, not a re-partitioning of the fixture."""
    import os

    path = _PART_CACHE.get(sf_dir)
    if path is not None and os.path.isdir(path):
        return spark.read.parquet(path)
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "o_year", F.year("o_orderdate")
    )
    path = _scratch_dir("orders_by_year")
    write_partitioned(orders, path, ["o_year"])
    _PART_CACHE[sf_dir] = path
    return spark.read.parquet(path)


@register(
    "v102_partition_pruning",
    oracle=f"""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           {_DSUM.format(x="o_totalprice")} AS sum_price
    FROM orders
    WHERE year(o_orderdate) = 1996
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def v102_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Static partition pruning: predicate on the partition column must
    reach the file index (PartitionFilters), so the scan lists exactly
    one year directory however many years the table holds."""
    scan = partitioned_orders(spark, sf_dir)
    return (
        scan.where(F.col("o_year") == 1996)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"), dec_sum("o_totalprice", "sum_price"))
        .orderBy("o_orderpriority")
    )


@register(
    "v103_dpp_star_join",
    oracle=f"""
    SELECT CAST(year(o_orderdate) AS INT) AS o_year,
           COUNT(*) AS n_orders,
           {_DSUM.format(x="o_totalprice")} AS sum_price
    FROM orders
    WHERE year(o_orderdate) % 2 = 0
    GROUP BY 1
    ORDER BY 1
    """,
)
def v103_dpp_star_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning: the fact (orders partitioned by year)
    is pruned at runtime by the dim side's selective filter.  The dim is
    a static year dimension — deliberately wider than the data's span,
    the inner join drops absent years — filtered with an EQUALITY
    predicate (a bare boolean column would not count as selective for
    Spark's DPP rule) and pinned as the broadcast side via dpp_join
    (else, at test scale, Spark broadcasts the tiny FACT and DPP
    silently never fires; see operators/partitions.py)."""
    scan = partitioned_orders(spark, sf_dir)
    dim = spark.createDataFrame(
        [(y, "EVEN" if y % 2 == 0 else "ODD") for y in range(1990, 2011)],
        "d_year int, d_parity string",
    )
    j = dpp_join(scan, dim.where(F.col("d_parity") == "EVEN"),
                 F.col("o_year") == F.col("d_year"))
    return (
        j.groupBy("o_year")
        .agg(F.count("*").alias("n_orders"), dec_sum("o_totalprice", "sum_price"))
        .orderBy("o_year")
    )


@register(
    "v105_runtime_filter_join",
    oracle=f"""
    SELECT p_brand,
           COUNT(*) AS n_items,
           {_DSUM.format(x="l_extendedprice * (1 - l_discount)")} AS revenue
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE p_size <= 2
    GROUP BY p_brand
    ORDER BY p_brand
    """,
)
def v105_runtime_filter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manual runtime filter (operators/runtime_filter.py): the ~5%-
    selective part dim pre-filters lineitem with a broadcast semi-join
    on the DISTINCT matching partkeys, so the fact's join shuffle moves
    only matchable rows (~20x fewer records; shuffle_stats-asserted in
    tests/test_runtime_filter.py).  Identity rewrite for an inner
    equi-join — the oracle is the plain join."""
    from flowbyte_spark.operators.runtime_filter import reduced_join

    li = load_table(spark, sf_dir, "lineitem").withColumnRenamed(
        "l_partkey", "p_partkey"
    )
    part = load_table(spark, sf_dir, "part").where(F.col("p_size") <= 2)
    return (
        reduced_join(li, part, "p_partkey")
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_items"),
            dec_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"
            ),
        )
        .orderBy("p_brand")
    )
