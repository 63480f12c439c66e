"""V77+: relational additions registered after round 4.

Lives apart from relational.py on purpose: the function-level change
tracker (queries/_coverage.py) conservatively marks every unit of a
module changed when its module-level residue changes, and relational.py
holds 18 r4-verified queries — more than the driver window can absorb.
New relational queries land here so existing verified code stays
byte-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flowbyte_spark.catalog import load_table
from flowbyte_spark.functions import dec_sum, ts_str
from flowbyte_spark.queries import register
from flowbyte_spark.queries.relational import _DSUM

# ---------------------------------------------------------------------------
# V77 — TPC-H Q18 shape: large-volume orders (HAVING subquery semi-join)
# ---------------------------------------------------------------------------
_Q18_QTY = 250


@register(
    "v77_q18_large_orders",
    oracle=f"""
    SELECT c_name, c_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS orderdate,
           o_totalprice,
           {_DSUM.format(x='l_quantity')} AS sum_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING SUM(l_quantity) > {_Q18_QTY})
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def v77_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: customers with large-volume orders.  The HAVING
    subquery becomes an aggregate-then-semi-join: lineitem aggregates
    once into a small qualifying-key set (sum(qty) > threshold keeps a
    fraction of orders), AQE broadcasts it, and the second lineitem pass
    plus the orders/customer dims join against only qualifying keys.
    Two lineitem scans, one fact-sized shuffle (the qualifying agg) —
    the other joins are broadcast-sized by construction."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    qualifying = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("__q"))
        .where(F.col("__q") > _Q18_QTY)
        .select("l_orderkey")
    )
    li = lineitem.select("l_orderkey", "l_quantity").join(
        qualifying, "l_orderkey", "left_semi"
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice"
        )
        .agg(dec_sum(F.col("l_quantity"), "sum_qty"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            ts_str("o_orderdate", "orderdate"),
            "o_totalprice",
            "sum_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# V85/V86 — skew-resilient window tier under the hash gate (round 6).
# The salted operators (operators/skew.py, VERDICT r4 #4) had property
# tests but never a driver row; these two pin them to the driver oracle.
# Running sums use integer cents (the v75 rule): FP addition order would
# otherwise differ between the two-phase merge and the oracle's single
# window pass.
# ---------------------------------------------------------------------------
_SKEW_BUCKET_S = 6 * 3600  # wide enough that cross-bucket carry paths run


@register(
    "v85_salted_window",
    oracle="""
    SELECT event_id,
           COUNT(*) OVER w AS run_cnt,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER w AS BIGINT)
               AS run_cents,
           CAST(MIN(CAST(ROUND(value * 100) AS BIGINT)) OVER w AS BIGINT)
               AS run_min_cents
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ORDER BY event_id
    """,
)
def v85_salted_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running count/sum/min over event time computed by the
    TWO-PHASE salted window (within-bucket window + cross-bucket offset
    merge — the shape that survives one hot key at 100x, where a plain
    Window.partitionBy puts a key's whole history in one task).  Equality
    with the oracle's single-pass window proves the bucket split, the
    offset carry, and the (ts, event_id) tie-break all compose exactly."""
    from flowbyte_spark.operators.skew import salted_window_agg

    events = load_table(spark, sf_dir, "events").withColumn(
        "cents", F.round(F.col("value") * 100).cast("long")
    )
    out = salted_window_agg(
        events,
        keys=["user_id"],
        order_by="ts",
        aggs={
            "run_cnt": ("count", "cents"),
            "run_cents": ("sum", "cents"),
            "run_min_cents": ("min", "cents"),
        },
        bucket_width_seconds=_SKEW_BUCKET_S,
        tiebreakers=("event_id",),
    )
    return out.select(
        "event_id",
        F.col("run_cnt").cast("long").alias("run_cnt"),
        F.col("run_cents").cast("long").alias("run_cents"),
        F.col("run_min_cents").cast("long").alias("run_min_cents"),
    ).orderBy("event_id")


@register(
    "v86_salted_lag",
    oracle="""
    SELECT event_id,
           LAG(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_event
    FROM events
    ORDER BY event_id
    """,
)
def v86_salted_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user previous-event id via the two-phase salted lag: plain lag
    within (user, time bucket), bucket-boundary rows take the previous
    non-empty bucket's last value through a one-row-per-bucket carry
    table.  The oracle's single-pass LAG distinguishes genuine NULLs
    (first event of a user) from bucket boundaries — any carry bug
    surfaces as a NULL/value mismatch."""
    from flowbyte_spark.operators.skew import salted_lag

    events = load_table(spark, sf_dir, "events")
    out = salted_lag(
        events,
        keys=["user_id"],
        order_by="ts",
        col="event_id",
        out="prev_event",
        bucket_width_seconds=_SKEW_BUCKET_S,
        tiebreakers=("event_id",),
    )
    return out.select("event_id", "prev_event").orderBy("event_id")
