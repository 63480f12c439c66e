"""V41-V42: session windows (batch twin, gaps-and-islands oracle) and CUBE.

V41 is the strongest session-window check available without streaming
nondeterminism: Spark's ``F.session_window`` in batch mode must equal the
classic SQL gaps-and-islands construction (new session when the gap from
the previous event exceeds the threshold), which DuckDB runs natively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flowbyte_spark.catalog import load_table
from flowbyte_spark.functions import dec_sum, ts_str
from flowbyte_spark.queries import register

SESSION_GAP_MIN = 30


@register(
    "v41_session_window",
    oracle=f"""
    WITH marked AS (
        SELECT user_id, ts, value,
               CASE WHEN ts - LAG(ts) OVER w > INTERVAL {SESSION_GAP_MIN} MINUTE
                    OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    sessions AS (
        SELECT user_id, ts, value,
               SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts
                   ROWS UNBOUNDED PRECEDING) AS session_id
        FROM marked)
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           COUNT(*) AS n_events,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE), 2) AS sum_value
    FROM sessions
    GROUP BY user_id, session_id
    ORDER BY user_id, session_start
    """,
)
def v41_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F.session_window in batch mode vs the SQL gaps-and-islands twin.

    Same operator Structured Streaming uses for session state — verified
    here deterministically (streaming tests cover the incremental path).
    """
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.session_window("ts", f"{SESSION_GAP_MIN} minutes").alias("s"),
            "user_id",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dec_sum("value", "sum_value"),
        )
        .select(
            "user_id",
            ts_str(F.col("s.start"), "session_start"),
            "n_events",
            "sum_value",
        )
        .orderBy("user_id", "session_start")
    )


@register(
    "v42_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS cnt,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE), 2) AS sum_qty,
           CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
           CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY g_rf, g_ls, l_returnflag, l_linestatus
    """,
)
def v42_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE via cascade aggregation (operators/cube_agg.py): one
    data-scale pass at the finest grain, coarser sets re-aggregated from
    the tiny intermediate — instead of built-in ``.cube()``'s Expand,
    which replicates every input row 2^n times before its shuffle.
    Decimal partial sums re-sum exactly, so the hash matches the expanded
    plan."""
    from flowbyte_spark.functions import DEC
    from flowbyte_spark.operators.cube_agg import cube_cascade

    li = load_table(spark, sf_dir, "lineitem")
    cc = cube_cascade(
        li,
        ["l_returnflag", "l_linestatus"],
        {
            "cnt": (F.lit(1), "count"),
            "sum_qty": (F.col("l_quantity").cast(DEC), "sum"),
        },
    )
    return (
        cc.select(
            "l_returnflag",
            "l_linestatus",
            "cnt",
            F.round(F.col("sum_qty").cast("double"), 2).alias("sum_qty"),
            F.col("g_l_returnflag").alias("g_rf"),
            F.col("g_l_linestatus").alias("g_ls"),
        )
        .orderBy("g_rf", "g_ls", "l_returnflag", "l_linestatus")
    )
