"""V48-V52: subquery shapes, extended window functions, unpivot, and
ordered string aggregation.

These close the remaining Tier-B surface from SURVEY.md §2: the reference
delegates arbitrary T-SQL (``sql.py:109``), which includes correlated
subqueries (EXISTS / scalar), the full window-function library (NTILE,
PERCENT_RANK, CUME_DIST, NTH_VALUE, RANGE frames), UNPIVOT, and
STRING_AGG.  Each is re-expressed with the idiomatic Spark primitive
(semi-join, decorrelated aggregate join, Window frames, ``unpivot``,
``array_join(array_sort(collect_list))``) and hash-verified against a
DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flowbyte_spark.catalog import load_table
from flowbyte_spark.functions import DEC, q4
from flowbyte_spark.queries import register


# ---------------------------------------------------------------------------
# V48 — correlated EXISTS subquery (TPC-H Q4 shape) → left-semi join
# ---------------------------------------------------------------------------
@register(
    "v48_exists_subquery",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= DATE '1995-01-01'
      AND o_orderdate < DATE '1995-07-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_returnflag = 'R')
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def v48_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS is a left-semi join in Spark: the date filter is
    pushed to the orders scan, the returned-flag predicate to the lineitem
    scan, and AQE picks broadcast vs shuffled semi-join by runtime size."""
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1995-07-01").cast("timestamp"))
    )
    late = (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return (
        o.join(late, o.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# V49 — correlated scalar subquery (TPC-H Q17 shape) → decorrelated agg join
# ---------------------------------------------------------------------------
@register(
    "v49_scalar_subquery",
    oracle="""
    SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE)
                 / 7.0, 2) AS avg_yearly,
           CAST(COUNT(*) AS BIGINT) AS n_small
    FROM lineitem l
    JOIN (SELECT l_partkey AS pk, AVG(l_quantity) AS avg_qty
          FROM lineitem GROUP BY l_partkey) t
      ON l.l_partkey = t.pk
    WHERE l.l_quantity < 0.2 * t.avg_qty
    """,
)
def v49_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-part AVG scalar subquery decorrelates into a groupBy + equi
    join — one shuffle for the aggregate, and the probe side reuses the
    same hash partitioning, so Catalyst plans a single exchange pair.
    AVG over integral quantities is exact in binary doubles, so the 0.2 ×
    avg comparison is bit-identical across engines."""
    li = load_table(spark, sf_dir, "lineitem")
    avg_qty = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    return (
        li.join(avg_qty, li.l_partkey == avg_qty.pk)
        .where(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast(DEC)).cast("double") / 7.0, 2
            ).alias("avg_yearly"),
            F.count("*").alias("n_small"),
        )
    )


# ---------------------------------------------------------------------------
# V50 — extended window battery: ntile / percent_rank / cume_dist /
#        nth_value / first+last / RANGE frame
# ---------------------------------------------------------------------------
@register(
    "v50_window_battery",
    oracle="""
    SELECT o_orderkey,
           o_custkey,
           CAST(ntile(4) OVER w AS INT) AS quartile,
           CAST(dense_rank() OVER w AS INT) AS drnk,
           FLOOR(percent_rank() OVER w * 10000 + 0.5) / 10000 AS prnk,
           FLOOR(cume_dist() OVER w * 10000 + 0.5) / 10000 AS cdist,
           CAST(nth_value(o_orderkey, 2) OVER
                (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                AS BIGINT) AS second_key,
           CAST(first_value(o_orderkey) OVER w AS BIGINT) AS cheapest,
           CAST(last_value(o_orderkey) OVER
                (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                AS BIGINT) AS priciest,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) OVER
                (PARTITION BY o_custkey ORDER BY o_totalprice
                 RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE), 2) AS running_price
    FROM orders
    WHERE o_custkey < 500
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
    ORDER BY o_orderkey
    """,
)
def v50_window_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The window families V10/V11 don't cover: distribution functions,
    NTILE bucketing, NTH/LAST over full frames, and a RANGE (peer-inclusive)
    frame.  Ordering ends in the unique o_orderkey so NTILE's positional
    split is deterministic; the RANGE sum aggregates DECIMAL(38,6) inputs
    so peer-group accumulation order can't shift the hash.  One shuffle on
    o_custkey serves every window."""
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    w_range = (
        Window.partitionBy("o_custkey")
        .orderBy("o_totalprice")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    o = load_table(spark, sf_dir, "orders").where(F.col("o_custkey") < 500)
    return (
        o.select(
            "o_orderkey",
            "o_custkey",
            F.ntile(4).over(w).alias("quartile"),
            F.dense_rank().over(w).alias("drnk"),
            q4(F.percent_rank().over(w)).alias("prnk"),
            q4(F.cume_dist().over(w)).alias("cdist"),
            F.nth_value("o_orderkey", 2).over(w_full).cast("long").alias("second_key"),
            F.first("o_orderkey").over(w).cast("long").alias("cheapest"),
            F.last("o_orderkey").over(w_full).cast("long").alias("priciest"),
            F.round(
                F.sum(F.col("o_totalprice").cast(DEC)).over(w_range).cast("double"),
                2,
            ).alias("running_price"),
        )
        .orderBy("o_orderkey")
    )


# ---------------------------------------------------------------------------
# V51 — unpivot (wide → long)
# ---------------------------------------------------------------------------
@register(
    "v51_unpivot",
    oracle="""
    SELECT c_custkey, 'acctbal' AS metric, ROUND(c_acctbal, 2) AS val
    FROM customer
    UNION ALL
    SELECT c_custkey, 'nationkey', CAST(c_nationkey AS DOUBLE)
    FROM customer
    ORDER BY c_custkey, metric
    """,
)
def v51_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshape via ``DataFrame.unpivot`` (SQL ``stack``) — a
    narrow zero-shuffle transform; the oracle expresses the same reshape as
    UNION ALL, which is what Spark's unpivot expands to logically."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.round("c_acctbal", 2).alias("acctbal"),
        F.col("c_nationkey").cast("double").alias("nationkey"),
    )
    return c.unpivot(
        ids=["c_custkey"],
        values=["acctbal", "nationkey"],
        variableColumnName="metric",
        valueColumnName="val",
    ).orderBy("c_custkey", "metric")


# ---------------------------------------------------------------------------
# V58 — explicit cross join (SURVEY §2.3 'cross' row)
# ---------------------------------------------------------------------------
@register(
    "v58_cross_join",
    oracle="""
    SELECT r.r_name, n.n_name,
           CAST(r.r_regionkey = n.n_regionkey AS BOOLEAN) AS is_home
    FROM region r CROSS JOIN nation n
    ORDER BY r.r_name, n.n_name
    """,
)
def v58_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product via ``crossJoin`` — Catalyst plans a broadcast
    nested-loop, the right physical choice when one side is a small dim;
    a fact×fact cross is still expressible but should be bucketed/blocked
    at scale (see range join, which is exactly a blocked cross)."""
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return (
        r.crossJoin(n)
        .select(
            "r_name",
            "n_name",
            (F.col("r_regionkey") == F.col("n_regionkey")).alias("is_home"),
        )
        .orderBy("r_name", "n_name")
    )


# ---------------------------------------------------------------------------
# V52 — ordered string aggregation (STRING_AGG / LISTAGG)
# ---------------------------------------------------------------------------
@register(
    "v52_string_agg",
    oracle="""
    SELECT r_name,
           string_agg(n_name, ',' ORDER BY n_name) AS nations,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM region
    JOIN nation ON n_regionkey = r_regionkey
    GROUP BY r_name
    ORDER BY r_name
    """,
)
def v52_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STRING_AGG with deterministic ORDER BY = collect_list → array_sort →
    array_join.  The region⋈nation join broadcasts (both dims are tiny);
    the sort happens per-group after collection, so row arrival order —
    which Spark does not guarantee — can't leak into the result."""
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return (
        r.join(n, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias(
                "nations"
            ),
            F.count("*").alias("n"),
        )
        .orderBy("r_name")
    )


# ---------------------------------------------------------------------------
# V62 — full outer join (SURVEY §2.3 'full' row gets its own oracle query)
# ---------------------------------------------------------------------------
@register(
    "v62_full_outer_join",
    oracle="""
    SELECT COALESCE(c.c_custkey, o.o_custkey) AS custkey,
           c.c_name AS c_name,
           o.order_cnt AS order_cnt
    FROM (SELECT c_custkey, c_name FROM customer
          WHERE c_mktsegment = 'BUILDING') c
    FULL OUTER JOIN (SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS order_cnt
                     FROM orders
                     WHERE o_orderstatus = 'F'
                     GROUP BY o_custkey) o
      ON c.c_custkey = o.o_custkey
    ORDER BY custkey
    """,
)
def v62_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``how='full'`` with null-bearing rows on BOTH sides: BUILDING
    customers without finished orders and finished-order customers outside
    BUILDING both survive.  Both inputs shrink before the join (filter and
    partial agg push below it), and the join key is unique on each side, so
    the full outer is a plain shuffle hash/merge join — no row explosion to
    worry about at scale.  Reference runs this as pass-through T-SQL
    (sql.py:109)."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey", "c_name")
    )
    ords = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("order_cnt"))
    )
    return (
        cust.join(ords, cust.c_custkey == ords.o_custkey, how="full")
        .select(
            F.coalesce("c_custkey", "o_custkey").alias("custkey"),
            "c_name",
            "order_cnt",
        )
        .orderBy("custkey")
    )


# ---------------------------------------------------------------------------
# V63 — right outer join (SURVEY §2.3 'right' row gets its own oracle query)
# ---------------------------------------------------------------------------
@register(
    "v63_right_outer_join",
    oracle="""
    SELECT n.n_name,
           s.s_name,
           s.s_acctbal AS s_acctbal
    FROM (SELECT * FROM supplier WHERE s_acctbal > 5000.0) s
    RIGHT JOIN nation n ON s.s_nationkey = n.n_nationkey
    ORDER BY n.n_name, s.s_name
    """,
)
def v63_right_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``how='right'`` preserving every nation, including those whose
    suppliers are all filtered out (null supplier columns).  The preserved
    side is the small dim; Spark plans a broadcast of whichever side fits
    (outer side cannot be the build side for its own preserved rows, AQE
    picks the legal strategy).  Reference: pass-through T-SQL
    (sql.py:109)."""
    sup = load_table(spark, sf_dir, "supplier").where(F.col("s_acctbal") > 5000.0)
    nat = load_table(spark, sf_dir, "nation")
    return (
        sup.join(nat, sup.s_nationkey == nat.n_nationkey, how="right")
        .select("n_name", "s_name", "s_acctbal")
        .orderBy("n_name", "s_name")
    )
