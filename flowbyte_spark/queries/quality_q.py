"""V106-V108: data-quality tier — expectations battery, snapshot diff,
column profiling (round 9).

The reference's surface mutates warehouse tables (insert/update/delete,
sql.py:174-332) but offers nothing to VALIDATE the result; these are
the checks its users run by hand, as single-pass Spark operators, each
hash-gated against a DuckDB recomputation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from flowbyte_spark.catalog import load_table
from flowbyte_spark.queries import register


# ---------------------------------------------------------------------------
# V106 — expectations battery over orders: two passing rules and two
# deliberately violated ones (FK against a filtered parent simulates the
# missing-dimension load failure; a tight range bound flags outliers),
# so the gate checks nonzero violation COUNTS, not just zeros.
# ---------------------------------------------------------------------------
@register(
    "v106_data_expectations",
    oracle="""
    SELECT "check", n_violations, n_violations = 0 AS passed FROM (
        SELECT 'foreign_key(o_custkey)' AS "check",
               CAST((SELECT COUNT(*) FROM orders
                     WHERE o_custkey IS NOT NULL
                       AND o_custkey NOT IN (
                           SELECT c_custkey FROM customer
                           WHERE c_acctbal > 0)) AS BIGINT) AS n_violations
        UNION ALL
        SELECT 'not_null(o_custkey)',
               CAST((SELECT COUNT(*) FROM orders
                     WHERE o_custkey IS NULL) AS BIGINT)
        UNION ALL
        SELECT 'range(o_totalprice,0.0,300000.0)',
               CAST((SELECT COUNT(*) FROM orders
                     WHERE o_totalprice < 0.0 OR o_totalprice > 300000.0)
                    AS BIGINT)
        UNION ALL
        SELECT 'unique(o_orderkey)',
               CAST(COALESCE((SELECT SUM(n) FROM (
                   SELECT COUNT(*) AS n FROM orders
                   GROUP BY o_orderkey HAVING COUNT(*) > 1)), 0) AS BIGINT)
    ) t
    ORDER BY "check"
    """,
)
def v106_data_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Battery = ONE scan for all row-predicate rules (fused scalar
    aggregate, round 10 — N rules no longer cost N scans of the fact),
    one key groupBy for uniqueness, one anti-join for the FK — unioned
    into a (check, n_violations, passed) report
    (operators/expectations.py; single-scan proof in
    tests/test_quality_tier.py)."""
    from flowbyte_spark.operators import expectations as E

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    checks = [
        E.fused_scalar_checks(
            orders,
            [
                E.not_null_rule("o_custkey"),
                E.range_rule("o_totalprice", 0.0, 300000.0),
            ],
        ),
        E.check_unique(orders, ["o_orderkey"]),
        E.check_foreign_key(
            orders,
            customer.where(F.col("c_acctbal") > 0),
            "o_custkey",
            "c_custkey",
        ),
    ]
    return E.run_expectations(checks)


# ---------------------------------------------------------------------------
# V107 — snapshot diff: recover a CDC delta from two full extracts.
# "new" is customer with a deterministic churn applied (delete keys
# %13=0, bump balances on %10=0, append re-keyed copies of %17=0), so
# both engines derive the same snapshots and the per-change-type counts
# and key checksums hash-match.
# ---------------------------------------------------------------------------
@register(
    "v107_snapshot_diff",
    oracle="""
    WITH old AS (SELECT c_custkey, c_acctbal, c_mktsegment FROM customer),
    new AS (
        SELECT c_custkey,
               CASE WHEN c_custkey % 10 = 0 THEN c_acctbal + 100.0
                    ELSE c_acctbal END AS c_acctbal,
               c_mktsegment
        FROM customer WHERE c_custkey % 13 <> 0
        UNION ALL
        SELECT c_custkey + 1000000000000, c_acctbal, c_mktsegment
        FROM customer WHERE c_custkey % 17 = 0),
    d AS (
        SELECT COALESCE(o.c_custkey, n.c_custkey) AS k,
               CASE WHEN o.c_custkey IS NULL THEN 'inserted'
                    WHEN n.c_custkey IS NULL THEN 'deleted'
                    WHEN o.c_acctbal IS DISTINCT FROM n.c_acctbal
                      OR o.c_mktsegment IS DISTINCT FROM n.c_mktsegment
                    THEN 'updated'
                    ELSE 'unchanged' END AS change_type
        FROM old o FULL OUTER JOIN new n ON o.c_custkey = n.c_custkey)
    SELECT change_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(k) AS BIGINT) AS key_checksum
    FROM d
    GROUP BY change_type
    ORDER BY change_type
    """,
)
def v107_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One full-outer join on the key + null-safe struct compare
    (operators/diff.py), rolled up per change type with a key checksum
    so the gate pins WHICH rows changed, not just how many."""
    from flowbyte_spark.operators.diff import snapshot_diff

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", "c_mktsegment"
    )
    new = cust.where(F.col("c_custkey") % 13 != 0).withColumn(
        "c_acctbal",
        F.when(
            F.col("c_custkey") % 10 == 0, F.col("c_acctbal") + 100.0
        ).otherwise(F.col("c_acctbal")),
    ).unionByName(
        # Re-key offset 1e12 >> max c_custkey at any TPC-H scale factor
        # (sf100 tops out at 15M keys); a small additive offset collides
        # with real keys at sf >= 0.67 and snapshot_diff's duplicate-key
        # contract then silently multiplies rows (ADVICE r9).
        cust.where(F.col("c_custkey") % 17 == 0).withColumn(
            "c_custkey",
            (F.col("c_custkey").cast("long") + F.lit(1_000_000_000_000)),
        )
    )
    return (
        snapshot_diff(cust, new, ["c_custkey"])
        .groupBy("change_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("c_custkey").cast("long").alias("key_checksum"),
        )
        .orderBy("change_type")
    )


# ---------------------------------------------------------------------------
# V108 — one-pass column profile of orders (exact distincts for the
# gate; operators/profile.py documents the approx swap for 100 TB).
# ---------------------------------------------------------------------------
@register(
    "v108_table_profile",
    oracle="""
    SELECT * FROM (
        SELECT 'o_orderkey' AS "column",
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
               CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
               CAST(MIN(o_orderkey) AS DOUBLE) AS min_num,
               CAST(MAX(o_orderkey) AS DOUBLE) AS max_num
        FROM orders
        UNION ALL
        SELECT 'o_custkey', CAST(COUNT(*) AS BIGINT),
               CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               CAST(COUNT(DISTINCT o_custkey) AS BIGINT),
               CAST(MIN(o_custkey) AS DOUBLE), CAST(MAX(o_custkey) AS DOUBLE)
        FROM orders
        UNION ALL
        SELECT 'o_orderstatus', CAST(COUNT(*) AS BIGINT),
               CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT),
               CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
        FROM orders
        UNION ALL
        SELECT 'o_totalprice', CAST(COUNT(*) AS BIGINT),
               CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               CAST(COUNT(DISTINCT o_totalprice) AS BIGINT),
               CAST(MIN(o_totalprice) AS DOUBLE), CAST(MAX(o_totalprice) AS DOUBLE)
        FROM orders
        UNION ALL
        SELECT 'o_orderpriority', CAST(COUNT(*) AS BIGINT),
               CAST(SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT),
               CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
        FROM orders
    ) t
    ORDER BY "column"
    """,
)
def v108_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flowbyte_spark.operators.profile import profile

    orders = load_table(spark, sf_dir, "orders")
    return profile(
        orders,
        [
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
            "o_orderpriority",
        ],
        exact=True,
    )


# ---------------------------------------------------------------------------
# V115 — the profile's 100 TB mode: exact=False swaps the multi-distinct
# Expand for HLL++ (one ordinary partial-aggregatable shuffle, bounded
# state).  Error-bound contract row (the v37/v61 pattern): the Spark
# side emits the EXACT counts plus a within_bound flag comparing the
# approx run against them (5 sigma at rsd=0.02); the oracle recomputes
# the exact counts and asserts TRUE, so the hash gate pins both the
# exact values and the approx path's error bound.
# ---------------------------------------------------------------------------
_V115_COLS = ["o_custkey", "o_orderkey", "o_orderpriority", "o_orderstatus"]


@register(
    "v115_profile_approx",
    oracle="""
    SELECT * FROM (
        SELECT 'o_custkey' AS "column",
               CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_distinct_exact,
               TRUE AS within_bound
        FROM orders
        UNION ALL
        SELECT 'o_orderkey', CAST(COUNT(DISTINCT o_orderkey) AS BIGINT), TRUE
        FROM orders
        UNION ALL
        SELECT 'o_orderpriority',
               CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT), TRUE
        FROM orders
        UNION ALL
        SELECT 'o_orderstatus',
               CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT), TRUE
        FROM orders
    ) t
    ORDER BY "column"
    """,
)
def v115_profile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r16 (guide §2.3, the v37 pattern): both counters run over each
    # column's pre-deduped value stream instead of two full profile
    # passes (exact Expand + approx) joined after the fact.  HLL++
    # registers are duplicate-insensitive, so approx_count_distinct over
    # the distinct values is bit-identical to running it over the raw
    # rows, and the exact count becomes count(v); the error-bound
    # contract is computed from the same pair of numbers as before.
    # Each branch scans ONE parquet column and shuffles only its
    # map-side-deduped values — the same total I/O as the old single
    # scan of 4 columns, without the Expand row multiplication.  A
    # combined one-pass agg (count_distinct + approx per column) was
    # measured WORSE (5.7 s: the mixed multi-distinct Expand carries the
    # HLL buffers through every branch); measured: two-profile 3.0 s ->
    # per-column 1.2 s, rows identical (OPTIMIZATION_r16.md).
    from functools import reduce

    orders = load_table(spark, sf_dir, "orders")
    parts = []
    for c in _V115_COLS:
        d = orders.select(F.col(c).alias("v")).dropDuplicates()
        parts.append(
            d.agg(
                F.count("v").cast("long").alias("ex"),
                F.approx_count_distinct("v", rsd=0.02).alias("ap"),
            ).select(F.lit(c).alias("column"), "ex", "ap")
        )
    return (
        reduce(lambda a, b: a.unionByName(b), parts)
        .select(
            "column",
            F.col("ex").alias("n_distinct_exact"),
            (F.abs(F.col("ap") - F.col("ex")) <= 5 * 0.02 * F.col("ex")).alias(
                "within_bound"
            ),
        )
        .orderBy("column")
    )
