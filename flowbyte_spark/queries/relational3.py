"""V109-V110: multi-table TPC-H join trees (Q7 volume shipping, Q8
market share) — round 9 breadth for the relational tier.

Both are classic snowflake traversals (5-8 tables) whose plans should
collapse to broadcast-hash joins on every dim side with ONE fact scan:
nation/region/supplier/customer/part all broadcast at any realistic
dim:fact ratio, so the only shuffle left is the final group-by. AQE
makes that call from runtime sizes — no hints, same code at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from flowbyte_spark.catalog import load_table
from flowbyte_spark.functions import dec_sum
from flowbyte_spark.queries import register


@register(
    "v109_q7_volume_shipping",
    oracle="""
    SELECT supp_nation, cust_nation, l_year,
           ROUND(CAST(SUM(CAST(volume AS DECIMAL(38,6))) AS DOUBLE), 2) AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS INT) AS l_year,
               l_extendedprice * (1 - l_discount) AS volume
        FROM supplier s JOIN lineitem l ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
        JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
        WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND l_shipdate BETWEEN TIMESTAMP '1996-01-01'
                             AND TIMESTAMP '1997-12-31 23:59:59'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def v109_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bidirectional nation-pair trade volume.  The
    nation-pair disjunction lands on the two broadcast nation dims; the
    date filter pushes to the lineitem scan."""
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate").between("1996-01-01", "1997-12-31 23:59:59")
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nationkey"),
        F.col("n_name").alias("supp_nation"),
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nationkey"),
        F.col("n_name").alias("cust_nation"),
    )
    j = (
        li.join(supp.select("s_suppkey", "s_nationkey"),
                li.l_suppkey == supp.s_suppkey)
        .join(orders.select("o_orderkey", "o_custkey"),
              li.l_orderkey == orders.o_orderkey)
        .join(cust.select("c_custkey", "c_nationkey"),
              orders.o_custkey == cust.c_custkey)
        .join(n1, "s_nationkey")
        .join(n2, "c_nationkey")
        .where(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
    )
    return (
        j.groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(
            dec_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")),
                "revenue",
            )
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "v110_q8_market_share",
    oracle="""
    SELECT o_year,
           ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_3'
                               THEN vol ELSE CAST(0 AS DECIMAL(38,6)) END)
                      AS DOUBLE)
                 / CAST(SUM(vol) AS DOUBLE), 6) AS mkt_share
    FROM (
        SELECT CAST(year(o_orderdate) AS INT) AS o_year,
               CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6)) AS vol,
               n1.n_name AS supp_nation
        FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
        JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
        JOIN region r ON r.r_regionkey = n2.n_regionkey
        WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
    ) x
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def v110_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of PROMO-part revenue sold
    into ASIA, per order year — an 8-table tree with a conditional
    decimal aggregate.  Both sums stay exact DECIMAL(38,6) and convert
    to double only for the final division, so the share hash-matches."""
    DEC = "decimal(38,6)"
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(
        F.col("r_name") == "ASIA"
    )
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nationkey"),
        F.col("n_name").alias("supp_nation"),
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nationkey"),
        F.col("n_regionkey").alias("c_regionkey"),
    )
    j = (
        li.join(part.select("p_partkey"), li.l_partkey == part.p_partkey)
        .join(supp.select("s_suppkey", "s_nationkey"),
              li.l_suppkey == supp.s_suppkey)
        .join(orders.select("o_orderkey", "o_custkey", "o_orderdate"),
              li.l_orderkey == orders.o_orderkey)
        .join(cust.select("c_custkey", "c_nationkey"),
              orders.o_custkey == cust.c_custkey)
        .join(n1, "s_nationkey")
        .join(n2, "c_nationkey")
        .join(
            region.select(F.col("r_regionkey").alias("c_regionkey")),
            "c_regionkey",
        )
    )
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC)
    nation_vol = F.when(
        F.col("supp_nation") == "NATION_3", vol
    ).otherwise(F.lit(0).cast(DEC))
    return (
        j.groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.round(
                F.sum(nation_vol).cast("double")
                / F.sum(vol).cast("double"),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )
