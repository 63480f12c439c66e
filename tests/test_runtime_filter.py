"""Manual runtime filter (operators/runtime_filter.py, v105).

Value correctness is the oracle differential; the POINT of the operator
is shuffle-volume reduction, proven here with shuffle_stats: under a
forced shuffle join (broadcast disabled), the semi-join-reduced fact
moves ~5% of the records the plain join moves.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flowbyte_spark.catalog import load_table
from flowbyte_spark.operators.partitions import shuffle_stats
from flowbyte_spark.operators.runtime_filter import (
    reduced_join,
    semi_join_reduction,
)
from tests.oracle_util import assert_query_matches

SF = "/root/testdata/sf0.01"


def test_semi_join_reduction_cuts_fact_shuffle(spark):
    li = load_table(spark, SF, "lineitem").withColumnRenamed(
        "l_partkey", "p_partkey"
    )
    part = load_table(spark, SF, "part").where(F.col("p_size") <= 2)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plain = li.join(part, "p_partkey").groupBy("p_brand").count()
        plain.collect()
        fact_shuffle_plain = max(
            s["records_written"] for s in shuffle_stats(plain)
        )
        reduced = reduced_join(li, part, "p_partkey").groupBy("p_brand").count()
        reduced.collect()
        fact_shuffle_reduced = max(
            s["records_written"] for s in shuffle_stats(reduced)
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    # ~4.7% of parts survive p_size <= 2; the fact shuffle must shrink
    # in kind (plain moves all 60k lineitem rows).
    assert fact_shuffle_plain >= 50_000, fact_shuffle_plain
    assert fact_shuffle_reduced < fact_shuffle_plain * 0.15, (
        fact_shuffle_reduced,
        fact_shuffle_plain,
    )


def test_rejects_empty_keys(spark):
    df = spark.range(1)
    with pytest.raises(ValueError, match="at least one"):
        semi_join_reduction(df, df, [])


def test_v105_matches_oracle(spark, sf_dir):
    assert_query_matches(spark, "v105_runtime_filter_join", sf_dir)
