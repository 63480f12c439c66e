"""Round-11 verification queries (VERDICT r10 "next round" items):

- V124 incremental MIN/MAX maintenance — the targeted-recompute path
  ``operators/incremental.py`` hands off to for non-invertible
  measures: inserts merge algebraically, only extremum-hit groups
  re-aggregate against a semi-join-filtered fact read.  Gated against
  DuckDB's full recompute of the post-delta snapshot.
- V125 streaming session windows — the one §2.9 shape previously only
  gated through its batch twin (v41) now executed as a real
  multi-micro-batch stream.
- V126 type-widening schema evolution — the int→long / float→double
  epoch-drift path v123's column-add case left uncovered.
- V127 prefix-filtered sparse cosine pairs — the documented 100 TB
  extension of v122's inverted-index join (index only each doc's
  top-weight terms; provably recall-lossless at the threshold).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from flowbyte_spark.catalog import load_table
from flowbyte_spark.queries import register


# ---------------------------------------------------------------------------
# V124 — incremental MIN/MAX maintenance (targeted recompute).
# Same CDC delta as v118 (deletes: keys %13 = 0; inserts: re-keyed
# copies of %17 = 0) so the two rows document the same pipeline's
# invertible and non-invertible legs side by side.  At sf0.01 the
# deletes hit per-priority extremum rows, so the recompute path
# genuinely fires; the safe path covers the rest.
# ---------------------------------------------------------------------------
@register(
    "v124_incremental_minmax",
    oracle="""
    WITH post AS (
        SELECT o_orderkey, o_orderpriority, o_totalprice
        FROM orders WHERE o_orderkey % 13 <> 0
        UNION ALL
        SELECT o_orderkey + 1000000000000 AS o_orderkey,
               o_orderpriority, o_totalprice
        FROM orders WHERE o_orderkey % 17 = 0
    )
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(CAST(MIN(o_totalprice) AS DOUBLE), 2) AS min_price,
           ROUND(CAST(MAX(o_totalprice) AS DOUBLE), 2) AS max_price
    FROM post
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def v124_incremental_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority MIN/MAX of order totals maintained through a CDC
    delta WITHOUT a full fact rescan: the state merges the insert leg
    with least/greatest, and only groups whose deletes tie a current
    extremum re-aggregate over a broadcast-semi-filtered read of the
    post-delta fact (operators/incremental.py:incremental_minmax_update).
    The oracle recomputes the post-delta snapshot from scratch, so the
    gate proves targeted-recompute == rescan."""
    from flowbyte_spark.operators.incremental import (
        incremental_minmax_update,
        minmax_state,
    )

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    state = minmax_state(orders, ["o_orderpriority"], ["o_totalprice"])
    deletes = orders.where(F.col("o_orderkey") % 13 == 0)
    inserts = orders.where(F.col("o_orderkey") % 17 == 0).withColumn(
        "o_orderkey",
        F.col("o_orderkey").cast("long") + F.lit(1_000_000_000_000),
    )
    post = orders.where(F.col("o_orderkey") % 13 != 0).unionByName(inserts)
    new_state = incremental_minmax_update(
        state, post, inserts, deletes, ["o_orderpriority"], ["o_totalprice"]
    )
    return new_state.select(
        "o_orderpriority",
        F.col("__cnt__").alias("n_orders"),
        F.round(F.col("min_o_totalprice").cast("double"), 2).alias(
            "min_price"
        ),
        F.round(F.col("max_o_totalprice").cast("double"), 2).alias(
            "max_price"
        ),
    ).orderBy("o_orderpriority")
