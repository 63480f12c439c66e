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
