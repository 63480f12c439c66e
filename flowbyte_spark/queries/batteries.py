"""V43-V44: exact percentiles and the string-function battery — closing the
last §2.4/§2.8 function families with oracle-verified queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flowbyte_spark.catalog import load_table
from flowbyte_spark.queries import register


# ---------------------------------------------------------------------------
# V43 — exact percentiles (linear interpolation: Spark percentile ==
# DuckDB quantile_cont), plus min/max/stddev/variance/corr
# ---------------------------------------------------------------------------
@register(
    "v43_percentiles_stats",
    oracle="""
    SELECT l_returnflag,
           FLOOR(quantile_cont(l_extendedprice, 0.5) * 100 + 0.5) / 100 AS p50,
           FLOOR(quantile_cont(l_extendedprice, 0.9) * 100 + 0.5) / 100 AS p90,
           FLOOR(quantile_cont(l_extendedprice, 0.99) * 100 + 0.5) / 100 AS p99,
           FLOOR(stddev_samp(l_quantity) * 10000 + 0.5) / 10000 AS sd_qty,
           FLOOR(var_samp(l_quantity) * 10000 + 0.5) / 10000 AS var_qty,
           FLOOR(corr(l_quantity, l_extendedprice) * 10000 + 0.5) / 10000 AS corr_qp,
           ROUND(MIN(l_extendedprice), 2) AS min_p,
           ROUND(MAX(l_extendedprice), 2) AS max_p
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def v43_percentiles_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r16 rewrite (guide §1.2 "per-task work", §2.3 "aggregate before you
    # shuffle"): the old single agg mixed F.percentile with the moment
    # stats, which forced the WHOLE aggregate down the ObjectHashAggregate
    # path — every group buffered a value->count map per partition (plus
    # the ensure_parallelism round-robin exchange, which pays a local sort
    # of all rows and made the plain stats ~2x SLOWER than a single-task
    # codegen aggregate at this scale; interleaved A/B in
    # OPTIMIZATION_r16.md).  Now the moment stats run as a pure codegen
    # HashAggregate and the exact percentiles come from the
    # distinct-value-histogram order statistics in exact_group_percentiles
    # (r17: the r16 window sort of every row became a codegen
    # groupBy(group, value).count() + a window over distinct values only;
    # heavy-tier A/B 6.5 s -> 1.65 s, sf0.1 2.3 -> 2.0 s) — bit-identical
    # to F.percentile (the weighted interpolation lower*(1-f)+higher*f is
    # Spark's own formula; asserted in tests/test_percentile_rewrite.py)
    # — joined back per group.  r16 interleaved A/B: 2.34 s -> 1.79 s.
    from flowbyte_spark.functions import q4
    from flowbyte_spark.operators.ordering import exact_group_percentiles

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity", "l_extendedprice"
    )
    stats = li.groupBy("l_returnflag").agg(
        q4(F.stddev_samp("l_quantity")).alias("sd_qty"),
        q4(F.var_samp("l_quantity")).alias("var_qty"),
        q4(F.corr("l_quantity", "l_extendedprice")).alias("corr_qp"),
        F.round(F.min("l_extendedprice"), 2).alias("min_p"),
        F.round(F.max("l_extendedprice"), 2).alias("max_p"),
    )
    pct = exact_group_percentiles(
        li, ["l_returnflag"], "l_extendedprice",
        [(0.5, "p50"), (0.9, "p90"), (0.99, "p99")],
    ).select(
        F.col("l_returnflag").alias("rf"),
        q4(F.col("p50"), scale=2).alias("p50"),
        q4(F.col("p90"), scale=2).alias("p90"),
        q4(F.col("p99"), scale=2).alias("p99"),
    )
    # Null-safe group-key join (ADVICE r16): a NULL l_returnflag group
    # would have percentiles in `pct` (its VALUES are non-null) that a
    # null-unsafe USING key silently drops.  Unreachable on TPC-H data
    # (l_returnflag is never NULL) but the single-aggregate form this
    # rewrite replaced preserved NULL groups, so the join must too —
    # same idiom as v03_agg_q1.
    return (
        stats.join(pct, stats["l_returnflag"].eqNullSafe(pct["rf"]), "left")
        .select(
            "l_returnflag",
            "p50",
            "p90",
            "p99",
            "sd_qty",
            "var_qty",
            "corr_qp",
            "min_p",
            "max_p",
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# V44 — string-function battery (§2.8 full list)
# ---------------------------------------------------------------------------
@register(
    "v44_string_funcs",
    oracle="""
    SELECT p_partkey,
           TRIM(p_name) AS trimmed,
           LPAD(p_brand, 12, '*') AS lpadded,
           RPAD(p_brand, 12, '#') AS rpadded,
           REPLACE(p_type, ' ', '_') AS replaced,
           CAST(strpos(p_name, 'a') AS BIGINT) AS instr_a,
           string_split(p_type, ' ')[1] AS first_word,
           regexp_extract(p_brand, '[0-9]+') AS brand_num,
           regexp_replace(p_name, '[aeiou]', '', 'g') AS devoweled,
           REVERSE(p_brand) AS reversed,
           CAST(p_name LIKE '%a%' AS BOOLEAN) AS has_a,
           LEFT(p_name, 5) AS left5,
           RIGHT(p_name, 5) AS right5,
           repeat(p_brand, 2) AS doubled
    FROM part
    ORDER BY p_partkey
    """,
)
def v44_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.trim("p_name").alias("trimmed"),
        F.lpad("p_brand", 12, "*").alias("lpadded"),
        F.rpad("p_brand", 12, "#").alias("rpadded"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("replaced"),
        F.instr("p_name", "a").cast("long").alias("instr_a"),
        F.split("p_type", " ")[0].alias("first_word"),
        F.regexp_extract("p_brand", "[0-9]+", 0).alias("brand_num"),
        F.regexp_replace("p_name", "[aeiou]", "").alias("devoweled"),
        F.reverse("p_brand").alias("reversed"),
        F.col("p_name").like("%a%").alias("has_a"),
        F.substring("p_name", 1, 5).alias("left5"),
        F.substring(F.col("p_name"), -5, 5).alias("right5"),
        F.repeat("p_brand", 2).alias("doubled"),
    ).orderBy("p_partkey")


# ---------------------------------------------------------------------------
# V61 — approx percentiles: the 100 TB twin of V43.  Exact F.percentile
# buffers every group value in the aggregation buffer (per-group memory
# grows with data); approx_percentile keeps a bounded KLL-style sketch per
# group, so partial-aggregate state is O(accuracy), not O(rows).
#
# HASH-GATED error CONTRACT (round 9; rows-only before): the returned
# VALUES are engine-specific, but the guarantee isn't — with
# accuracy=10000 the rank error is <= 1e-4, so the fraction of group
# rows <= each returned percentile must sit within 0.5% of its target
# quantile (50x the guarantee; measured <= 0.01% at sf0.1 —
# l_extendedprice is near-continuous, so tie inflation is negligible).
# A second pass over lineitem computes the actual rank of each returned
# value; DuckDB's oracle emits the exact group counts with all three
# flags TRUE, so a drifting sketch flips the driver row red.
# ---------------------------------------------------------------------------
@register(
    "v61_approx_percentiles",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           TRUE AS p50_ok, TRUE AS p90_ok, TRUE AS p99_ok
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def v61_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pct = F.approx_percentile(
        "l_extendedprice",
        F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)),
        F.lit(10000),
    )
    sketches = li.groupBy("l_returnflag").agg(
        pct.alias("pcts"), F.count(F.lit(1)).alias("cnt")
    )
    ranked = li.join(sketches, "l_returnflag")
    targets = (0.5, 0.9, 0.99)
    fracs = [
        (
            F.sum(
                (F.col("l_extendedprice") <= F.col("pcts")[i]).cast("long")
            )
            / F.first("cnt")
        ).alias(f"frac{i}")
        for i in range(3)
    ]
    return (
        ranked.groupBy("l_returnflag")
        .agg(F.first("cnt").alias("cnt"), *fracs)
        .select(
            "l_returnflag",
            "cnt",
            *[
                (F.abs(F.col(f"frac{i}") - targets[i]) <= 0.005).alias(
                    f"p{int(targets[i] * 100)}_ok"
                )
                for i in range(3)
            ],
        )
        .orderBy("l_returnflag")
    )
