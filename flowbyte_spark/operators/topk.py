"""Top-k helpers (SURVEY.md §2.7)."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    group_by: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """k best rows per group via row_number — one shuffle on the group key.

    Pass fully tie-broken ``order_by`` columns (end with a unique key) for
    deterministic output.  For global top-k just use orderBy().limit(k):
    Spark plans it as TakeOrdered, no full sort.
    """
    w = Window.partitionBy(*group_by).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .where(F.col(rank_col) <= k)
    )
