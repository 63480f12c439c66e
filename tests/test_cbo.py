"""operators/cbo.py: statistics must CHANGE the chosen join order
(stats-on vs stats-off disabler-control, the v120 pattern), and the
ANALYZE bookkeeping must be idempotent."""

from __future__ import annotations

from pyspark.sql import functions as F

from flowbyte_spark.operators.cbo import (
    CBO_CONFS,
    join_leaf_order,
    register_analyzed_table,
)
from flowbyte_spark.streaming import scoped_sql_conf

SF = "/root/testdata/sf0.01"


def _shaped(spark):
    li = register_analyzed_table(
        spark, SF, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"]
    )
    orders = register_analyzed_table(
        spark, SF, "orders", ["o_orderkey", "o_custkey", "o_orderpriority"]
    )
    cust = register_analyzed_table(
        spark, SF, "customer", ["c_custkey", "c_mktsegment", "c_nationkey"]
    )
    l, o, c = spark.table(li), spark.table(orders), spark.table(cust)
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .where(
            (F.col("c_mktsegment") == "BUILDING")
            & (F.col("c_nationkey") == 3)
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def test_stats_flip_join_order(spark):
    # Written order: lineitem ⋈ orders first, selective customer last.
    # CBO + stats must pull the filtered dimension AHEAD of the
    # lineitem fan-out; with CBO off (the disabler control) the
    # optimizer keeps the written order.
    with scoped_sql_conf(spark, **CBO_CONFS):
        on = join_leaf_order(_shaped(spark))
    with scoped_sql_conf(
        spark,
        **{
            "spark.sql.cbo.enabled": "false",
            "spark.sql.cbo.joinReorder.enabled": "false",
        },
    ):
        off = join_leaf_order(_shaped(spark))
    assert [t.split("_")[0] for t in off] == ["lineitem", "orders", "customer"], off
    assert on != off, f"CBO reorder did not change the join order: {on}"
    # the selective table must come BEFORE lineitem in the CBO plan
    names = [t.split("_")[0] for t in on]
    assert names.index("customer") < names.index("lineitem"), names


def test_stats_on_off_same_result(spark):
    with scoped_sql_conf(spark, **CBO_CONFS):
        on = sorted(map(tuple, _shaped(spark).collect()))
    with scoped_sql_conf(spark, **{"spark.sql.cbo.enabled": "false"}):
        off = sorted(map(tuple, _shaped(spark).collect()))
    assert on == off and len(on) == 5


def test_register_analyzed_table_idempotent(spark):
    t1 = register_analyzed_table(spark, SF, "orders", ["o_orderkey"])
    t2 = register_analyzed_table(spark, SF, "orders", ["o_orderkey"])
    assert t1 == t2
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {t1}").collect()
    assert any(
        r.col_name == "Statistics" and "rows" in (r.data_type or "")
        for r in rows
    )
