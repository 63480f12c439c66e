"""V112-V114: round-10 relational plan-shape queries.

Three classic plan shapes the r9 VERDICT called out as the last
unverified relational primitives:

- V112 bucketed sort-merge join: the 100 TB fact⋈fact staple — both
  sides stored pre-shuffled on the join key, so the join plans ZERO
  exchanges (proof in tests/test_relational4_plans.py via
  plans.shuffle_exchanges == the one agg exchange).
- V113 null-aware anti join: ``NOT IN`` over a nullable key.  SQL's
  three-valued NOT IN differs from ``left_anti`` (one NULL in the
  subquery empties the result); Spark plans it as a null-aware
  BroadcastHashJoin and a wrong rewrite silently keeps/drops rows.
  Reference anchor: delegated T-SQL ``NOT IN`` subqueries
  (``src/flowbyte/sql.py:109``).
- V114 correlated scalar-aggregate subquery (TPC-H Q2/Q15/Q20 class):
  the correlation target is an aggregate; Catalyst must decorrelate it
  into a join over a grouped aggregate — the one subquery shape
  v48/v49/v90/v91 do not cover.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession, functions as F

from flowbyte_spark.catalog import load_table
from flowbyte_spark.functions import dec_sum
from flowbyte_spark.queries import register
from flowbyte_spark.queries.relational import _DSUM
from flowbyte_spark.sources.bucketed import read_bucketed, write_bucketed


def _sf_tag(sf_dir: str) -> str:
    return re.sub(r"[^A-Za-z0-9_]", "_", sf_dir.rstrip("/").rsplit("/", 1)[-1])


def bucketed_pair(
    spark: SparkSession, sf_dir: str, num_buckets: int = 16
) -> tuple[DataFrame, DataFrame]:
    """orders + customer stored bucketed (and bucket-sorted) on the
    custkey.  Written ONCE per (session, sf): bucketing is an INGEST
    decision — at 100 TB you pay the layout shuffle when the table
    lands, and every subsequent join on the bucket key is shuffle-free.
    Bench iterations therefore time the co-located JOIN, not the
    layout write (same contract as scale_q.partitioned_orders)."""
    # num_buckets is part of the memo key: otherwise a same-session call
    # with a different bucket count silently gets the first layout back.
    tag = f"{_sf_tag(sf_dir)}_{num_buckets}b"
    names = (f"fb112_orders_{tag}", f"fb112_customer_{tag}")
    if not all(spark.catalog.tableExists(n) for n in names):
        # The in-memory catalog dies with the session but the managed-
        # table directories persist in spark-warehouse/ — a fresh
        # process would hit LOCATION_ALREADY_EXISTS, so sweep orphaned
        # locations before (re)writing.
        import os
        import shutil
        from urllib.parse import urlparse

        warehouse = urlparse(
            spark.conf.get("spark.sql.warehouse.dir")
        ).path or spark.conf.get("spark.sql.warehouse.dir")
        for n in names:
            if not spark.catalog.tableExists(n):
                shutil.rmtree(os.path.join(warehouse, n), ignore_errors=True)
        write_bucketed(
            load_table(spark, sf_dir, "orders"),
            names[0],
            ["o_custkey"],
            num_buckets=num_buckets,
            sort_by=["o_custkey"],
        )
        write_bucketed(
            load_table(spark, sf_dir, "customer"),
            names[1],
            ["c_custkey"],
            num_buckets=num_buckets,
            sort_by=["c_custkey"],
        )
    return read_bucketed(spark, names[0]), read_bucketed(spark, names[1])


@register(
    "v112_bucketed_smb_join",
    oracle=f"""
    SELECT c_mktsegment,
           COUNT(*) AS n_orders,
           {_DSUM.format(x="o_totalprice")} AS sum_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def v112_bucketed_smb_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-free sort-merge join of two tables bucketed on the join
    key.  The MERGE hint pins SMJ (at fixture scale AQE would broadcast
    the dim and the bucketing would prove nothing); both scans report
    the bucket layout as their output partitioning, so the join itself
    plans zero Exchange nodes — the only shuffle in the whole query is
    the final 5-group aggregate (asserted in
    tests/test_relational4_plans.py)."""
    orders, customer = bucketed_pair(spark, sf_dir)
    return (
        orders.hint("merge")
        .join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dec_sum("o_totalprice", "sum_price"),
        )
        .orderBy("c_mktsegment")
    )


_V113_SQL = """
    WITH sub AS (
        SELECT CASE WHEN o_orderkey % 97 = 0 THEN NULL
                    ELSE o_custkey END AS k
        FROM {orders}
        WHERE o_orderstatus = 'F'
    )
    SELECT 'null_poisoned' AS variant,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           COALESCE({acct_sum}, 0.0) AS acct_sum
    FROM {customer}
    WHERE c_custkey NOT IN (SELECT k FROM sub)
    UNION ALL
    SELECT 'null_filtered' AS variant,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           COALESCE({acct_sum}, 0.0) AS acct_sum
    FROM {customer}
    WHERE c_custkey NOT IN (SELECT k FROM sub WHERE k IS NOT NULL)
    ORDER BY variant
"""
_V113_ACCT = _DSUM.format(x="c_acctbal")


@register(
    "v113_null_aware_anti",
    oracle=_V113_SQL.format(
        orders="orders", customer="customer", acct_sum=_V113_ACCT
    ),
)
def v113_null_aware_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``NOT IN`` over a nullable key, both branches of the three-valued
    semantics: the poisoned variant (one NULL in the subquery) must
    return ZERO rows — NOT IN is never TRUE when the list has a NULL —
    while the null-filtered variant is the ordinary anti join.  Runs as
    literal SQL so Spark actually plans its null-aware anti join
    (single-key BroadcastHashJoin with the NAAJ flag) rather than a
    hand rewrite; the identical text runs in DuckDB.  Scale note: NAAJ
    requires a broadcastable subquery side — past that, rewrite as the
    two-aggregate form (any-NULL flag crossed with left_anti)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("fb113_orders")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "fb113_customer"
    )
    return spark.sql(
        _V113_SQL.format(
            orders="fb113_orders",
            customer="fb113_customer",
            acct_sum=_V113_ACCT,
        )
    )


_V114_SQL = """
    SELECT c_custkey, c_name, o_orderkey,
           CAST(o_totalprice AS DOUBLE) AS best_price
    FROM {customer} JOIN {orders} ON o_custkey = c_custkey
    WHERE o_totalprice = (
        SELECT MAX(o2.o_totalprice) FROM {orders} o2
        WHERE o2.o_custkey = c_custkey
    )
    ORDER BY c_custkey, o_orderkey
"""


@register(
    "v114_correlated_max_order",
    oracle=_V114_SQL.format(customer="customer", orders="orders"),
)
def v114_correlated_max_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar-AGGREGATE subquery (TPC-H Q2/Q15/Q20 class):
    each customer's most expensive order(s), the correlation target
    being MAX over the correlated group.  Catalyst must decorrelate
    into a join over ``orders GROUP BY o_custkey`` — one aggregate of
    the fact plus one equi-join, no per-row re-execution (asserted in
    tests/test_relational4_plans.py: the executed plan has no subquery
    nodes and exactly one fact aggregate).  Ties keep every tying
    order, which is deterministic.  Equality on o_totalprice is exact:
    MAX returns an existing parquet double, never arithmetic."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "fb114_customer"
    )
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("fb114_orders")
    return spark.sql(
        _V114_SQL.format(customer="fb114_customer", orders="fb114_orders")
    )
