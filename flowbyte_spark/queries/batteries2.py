"""V45-V47: date/time, array, and null/conditional function batteries —
the remaining §2.8 families, oracle-verified.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flowbyte_spark.catalog import load_table
from flowbyte_spark.queries import register


# ---------------------------------------------------------------------------
# V45 — date/time functions
# ---------------------------------------------------------------------------
@register(
    "v45_date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS y,
           CAST(month(o_orderdate) AS INT) AS m,
           CAST(day(o_orderdate) AS INT) AS d,
           CAST(hour(o_orderdate) AS INT) AS h,
           strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS plus30,
           CAST(datediff('day', DATE '1995-01-01', o_orderdate) AS INT) AS days_since,
           CAST(year(o_orderdate) * 12 + month(o_orderdate) - (1995 * 12 + 1) AS BIGINT) AS months_since,
           CAST(epoch(o_orderdate) AS BIGINT) AS unix_ts,
           strftime(date_trunc('quarter', o_orderdate), '%Y-%m-%d') AS qtr,
           CAST(dayofweek(o_orderdate) AS INT) + 1 AS dow,
           CAST(weekofyear(o_orderdate) AS INT) AS woy,
           strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end
    FROM orders
    WHERE o_orderkey < 500
    ORDER BY o_orderkey
    """,
)
def v45_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date battery.  Cross-engine notes: months_between has engine-specific
    fraction semantics, so the verified form is whole calendar months
    (y*12+m delta); Spark's dayofweek is 1=Sunday while DuckDB's is
    0=Sunday (+1 aligns them)."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 500)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
        F.hour("o_orderdate").alias("h"),
        F.date_format(F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"), "yyyy-MM-dd").alias("plus30"),
        F.datediff(F.to_date("o_orderdate"), F.lit("1995-01-01").cast("date")).alias("days_since"),
        (F.year("o_orderdate") * 12 + F.month("o_orderdate") - (1995 * 12 + 1))
        .cast("long")
        .alias("months_since"),
        F.unix_timestamp("o_orderdate").alias("unix_ts"),
        F.date_format(F.date_trunc("quarter", "o_orderdate"), "yyyy-MM-dd").alias("qtr"),
        F.dayofweek("o_orderdate").alias("dow"),
        F.weekofyear("o_orderdate").alias("woy"),
        F.date_format(F.last_day("o_orderdate"), "yyyy-MM-dd").alias("month_end"),
    ).orderBy("o_orderkey")


# ---------------------------------------------------------------------------
# V46 — array functions over embeddings
# ---------------------------------------------------------------------------
@register(
    "v46_array_funcs",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INT) AS dim,
           FLOOR(embedding[1]::DOUBLE * 10000 + 0.5) / 10000 AS first_elem,
           FLOOR(list_aggregate(embedding[1:8]::DOUBLE[], 'sum') * 10000 + 0.5) / 10000 AS head_sum,
           CAST(len(list_filter(embedding::DOUBLE[], x -> x > 0)) AS INT) AS n_pos,
           FLOOR(list_aggregate(list_transform(embedding::DOUBLE[], x -> abs(x)), 'max') * 10000 + 0.5) / 10000 AS max_abs,
           list_contains(list_transform(embedding::DOUBLE[], x -> x > 0.5), true) AS any_large,
           FLOOR(list_sort(embedding::DOUBLE[])[1] * 10000 + 0.5) / 10000 AS smallest
    FROM embeddings
    WHERE vec_id < 100
    ORDER BY vec_id
    """,
)
def v46_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") < 100)
    from flowbyte_spark.functions import q4

    arr = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        q4(F.element_at(arr, 1)).alias("first_elem"),
        q4(
            F.aggregate(F.slice(arr, 1, 8), F.lit(0.0), lambda a, x: a + x)
        ).alias("head_sum"),
        F.size(F.filter(arr, lambda x: x > 0)).alias("n_pos"),
        q4(F.array_max(F.transform(arr, F.abs))).alias("max_abs"),
        F.array_contains(
            F.transform(arr, lambda x: x > 0.5), True
        ).alias("any_large"),
        q4(F.element_at(F.sort_array(arr), 1)).alias("smallest"),
    ).orderBy("vec_id")


# ---------------------------------------------------------------------------
# V47 — null / conditional functions
# ---------------------------------------------------------------------------
@register(
    "v47_null_conditional",
    oracle="""
    SELECT c_custkey,
           COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_masked,
           CAST(c_mktsegment = 'BUILDING' AS BOOLEAN) AS is_building,
           CASE WHEN c_acctbal < 0 THEN 'neg'
                WHEN c_acctbal < 5000 THEN 'low'
                ELSE 'high' END AS bal_bucket,
           ROUND(COALESCE(NULLIF(c_acctbal, 0.0), -1.0), 2) AS bal_or_flag,
           (NULLIF(c_nationkey, 0) IS NULL) AS nation_zeroed,
           ROUND(GREATEST(c_acctbal, 0.0), 2) AS bal_floor0,
           ROUND(LEAST(c_acctbal, 1000.0), 2) AS bal_cap
    FROM customer
    ORDER BY c_custkey
    """,
)
def v47_null_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.coalesce(
            F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")
        ).alias("seg_masked"),
        (F.col("c_mktsegment") == "BUILDING").alias("is_building"),
        F.when(F.col("c_acctbal") < 0, "neg")
        .when(F.col("c_acctbal") < 5000, "low")
        .otherwise("high")
        .alias("bal_bucket"),
        F.round(
            F.coalesce(F.nullif(F.col("c_acctbal"), F.lit(0.0)), F.lit(-1.0)), 2
        ).alias("bal_or_flag"),
        F.isnull(F.nullif(F.col("c_nationkey"), F.lit(0))).alias("nation_zeroed"),
        F.round(F.greatest(F.col("c_acctbal"), F.lit(0.0)), 2).alias("bal_floor0"),
        F.round(F.least(F.col("c_acctbal"), F.lit(1000.0)), 2).alias("bal_cap"),
    ).orderBy("c_custkey")
