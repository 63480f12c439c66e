"""Arbitrary stateful streaming via applyInPandasWithState (SURVEY.md §2.9).

The built-in windows cover time bucketing; this module is the escape hatch
for custom per-key state machines.  Reference operator:
:func:`running_user_totals` — per-user running event count + value sum
maintained across micro-batches, with watermark-driven state expiry.
"""

from __future__ import annotations

from typing import Any, Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "cnt BIGINT, total DOUBLE"
OUTPUT_SCHEMA = "user_id BIGINT, cnt BIGINT, total DOUBLE"


def _update_user(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        cnt, total = state.get
    else:
        cnt, total = 0, 0.0
    for pdf in pdfs:
        cnt += len(pdf)
        total += float(pdf["value"].sum())
    state.update((cnt, round(total, 2)))
    yield pd.DataFrame(
        {"user_id": [user_id], "cnt": [cnt], "total": [round(total, 2)]}
    )


def running_user_totals(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Per-user running (count, sum) across micro-batches.

    State is one (cnt, total) tuple per user — O(users), not O(events);
    each micro-batch ships only that user's new rows through Arrow.  This
    is the applyInPandasWithState shape any custom session/feature
    accumulator follows.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


EXACT_STATE_SCHEMA = "cnt BIGINT, cents BIGINT"
EXACT_OUTPUT_SCHEMA = "user_id BIGINT, cnt BIGINT, total DOUBLE"


def _update_user_exact(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        cnt, cents = state.get
    else:
        cnt, cents = 0, 0
    for pdf in pdfs:
        cnt += len(pdf)
        cents += int((pdf["value"] * 100).round().astype("int64").sum())
    state.update((cnt, cents))
    yield pd.DataFrame(
        {"user_id": [user_id], "cnt": [cnt], "total": [cents / 100.0]}
    )


def running_user_totals_exact(
    events: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """Per-user running (count, total) with EXACT integer-cent state.

    The float variant (:func:`running_user_totals`) rounds its stored
    total every batch, so the final value depends on how rows split
    across micro-batches — fine for dashboards, unverifiable for a hash
    gate.  Money-like columns (fixed decimals) instead accumulate as
    scaled integers: addition is exact and order/batching-independent,
    and the single final division is IEEE-exact in every engine.  Same
    rule as the DSIR weights (operators/importance.py): state that must
    survive accumulation is kept integral, rounding happens once at the
    edge.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_exact,
            outputStructType=EXACT_OUTPUT_SCHEMA,
            stateStructType=EXACT_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
