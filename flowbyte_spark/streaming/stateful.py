"""Arbitrary stateful streaming via applyInPandasWithState (SURVEY.md §2.9).

The built-in windows cover time bucketing; this module is the escape hatch
for custom per-key state machines.  Reference operator:
:func:`running_user_totals` — per-user running event count + value sum
maintained across micro-batches, with watermark-driven state expiry.

Key-cardinality guard (lifted out of the v75 query in round 6 — VERDICT
r5 defect 3): ``applyInPandasWithState`` pays ~1 ms per key per batch
(Arrow group round-trip + state-store write; measured 8.6 s for 1500
unbounded keys vs 2.6 s capped), and state grows O(keys) forever under
``NoTimeout``, so a direct caller with an unbounded key column (user id,
session id, URL) gets a silently degrading query.  Both helpers therefore
take ``max_keys`` (default ``DEFAULT_MAX_KEYS``) and FAIL LOUDLY when the
bound is crossed.  Accounting is per-Python-worker DISTINCT KEYS SEEN
(a bounded set — at most max_keys+1 hashes are retained before the
raise): keys inherited from a checkpoint restart count the first time
they are touched, so the brake survives restarts and worker-reuse=false
(the created-count form it replaced reset to zero on both).  A single
worker exceeding ``max_keys`` distinct keys proves global distinct-key
cardinality is at least that large — a true positive, though it fires
late when keys spread across many workers (global state may reach
``workers x max_keys`` first).  Callers that have already bounded their
key domain (v75 filters ``user_id < 300`` before grouping) can pass
``max_keys=None`` to waive the guard explicitly.
"""

from __future__ import annotations

import uuid
from typing import Any, Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# nn = running NON-NULL value count (round 15, the incremental-agg
# NULL-measure fix's streaming twin): pandas .sum() over an all-NaN
# series returns 0.0 where SQL SUM over an all-NULL group is NULL, so
# without it a user whose every value is NULL reports total = 0.0.
#
# STATE-FORMAT BREAK (r15, ADVICE r15): the pre-r15 state was the
# 2-field "cnt BIGINT, total DOUBLE".  A stream restored from a
# checkpoint written under that schema will fail at the 3-way
# `cnt, nn, total = state.get` unpack — LOUDLY, not by misbinding
# (tuple unpack of 2 into 3 raises).  There is no in-place upgrade:
# Spark pins the state schema inside the checkpoint, so resuming an
# old stream requires a NEW checkpointLocation (the stream then
# rebuilds state from the source, the standard Structured Streaming
# schema-evolution posture for applyInPandasWithState).
STATE_SCHEMA = "cnt BIGINT, nn BIGINT, total DOUBLE"
OUTPUT_SCHEMA = "user_id BIGINT, cnt BIGINT, total DOUBLE"

DEFAULT_MAX_KEYS = 10_000

# per-worker-process sets of distinct keys seen, keyed by operator
# instance (populated inside executor Python workers, never the driver);
# bounded: a set stops growing at max_keys+1 because the add that crosses
# the bound raises
_SEEN_KEYS: dict[str, set] = {}


def _count_seen_key(guard_id: str, key: tuple, max_keys: int | None) -> None:
    """Executor-side accounting: called on EVERY key touch (state
    existing or not, so checkpoint-inherited keys count on first touch
    after a restart).  Raises once this worker alone has seen more than
    ``max_keys`` distinct keys — a lower bound on global distinct-key
    cardinality."""
    if max_keys is None:
        return
    seen = _SEEN_KEYS.setdefault(guard_id, set())
    seen.add(key)
    if len(seen) > max_keys:
        raise RuntimeError(
            f"stateful operator exceeded max_keys={max_keys}: this worker "
            f"alone has seen {len(seen)} distinct keys, so global state is "
            "at least that large.  applyInPandasWithState costs ~1 ms per "
            "key per batch and state grows O(keys) under NoTimeout — bound "
            "the key domain before groupBy, add a timeout/expiry, or pass "
            "max_keys=None to waive the guard deliberately."
        )


def _update_user(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
    guard_id: str,
    max_keys: int | None,
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    _count_seen_key(guard_id, key, max_keys)
    if state.exists:
        cnt, nn, total = state.get
    else:
        cnt, nn, total = 0, 0, 0.0
    for pdf in pdfs:
        cnt += len(pdf)
        v = pdf["value"].dropna()
        nn += len(v)
        total += float(v.sum())
    state.update((cnt, nn, round(total, 2)))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "cnt": [cnt],
            # SQL SUM semantics: no non-null value seen yet -> NULL
            "total": [round(total, 2) if nn else None],
        }
    )


def running_user_totals(
    events: DataFrame,
    watermark: str = "1 hour",
    max_keys: int | None = DEFAULT_MAX_KEYS,
) -> DataFrame:
    """Per-user running (count, sum) across micro-batches.

    State is one (cnt, total) tuple per user — O(users), not O(events);
    each micro-batch ships only that user's new rows through Arrow.  This
    is the applyInPandasWithState shape any custom session/feature
    accumulator follows.  ``max_keys`` is the module-level cardinality
    brake; see the module docstring.
    """
    guard_id = uuid.uuid4().hex

    def update(key, pdfs, state):
        yield from _update_user(key, pdfs, state, guard_id, max_keys)

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


EXACT_STATE_SCHEMA = "cnt BIGINT, nn BIGINT, cents BIGINT"
EXACT_OUTPUT_SCHEMA = "user_id BIGINT, cnt BIGINT, total DOUBLE"


def _update_user_exact(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
    guard_id: str,
    max_keys: int | None,
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    _count_seen_key(guard_id, key, max_keys)
    if state.exists:
        cnt, nn, cents = state.get
    else:
        cnt, nn, cents = 0, 0, 0
    for pdf in pdfs:
        cnt += len(pdf)
        # dropna BEFORE the int cast (round 15): astype("int64") on a
        # NaN-bearing series RAISES, so a single NULL value crashed the
        # stream mid-trigger; and the non-null count keeps SQL SUM
        # semantics (all-NULL user -> NULL total, not 0.00).
        v = pdf["value"].dropna()
        nn += len(v)
        cents += int((v * 100).round().astype("int64").sum())
    state.update((cnt, nn, cents))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "cnt": [cnt],
            "total": [cents / 100.0 if nn else None],
        }
    )


def running_user_totals_exact(
    events: DataFrame,
    watermark: str = "1 hour",
    max_keys: int | None = DEFAULT_MAX_KEYS,
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
    edge.  ``max_keys`` is the module-level cardinality brake; see the
    module docstring.
    """
    guard_id = uuid.uuid4().hex

    def update(key, pdfs, state):
        yield from _update_user_exact(key, pdfs, state, guard_id, max_keys)

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=EXACT_OUTPUT_SCHEMA,
            stateStructType=EXACT_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------------------------------
# transformWithStateInPandas (Spark 4's arbitrary-state API; round 6).
# applyInPandasWithState's successor: a StatefulProcessor object with
# named state variables (value/list/map), timers, and TTL, backed by the
# RocksDB state store.  The operator below is the exact-integer-cent
# running-totals machine again — same semantics as
# running_user_totals_exact — so the two APIs are mutually verifiable.
# ENVIRONMENT GATE: the transformWithState Python worker speaks a
# protobuf-encoded state-server protocol; this sandbox has no
# `google.protobuf`, so execution is covered by a skip-marked test
# (tests/test_skew_stateful.py) that runs wherever protobuf exists —
# same policy as the Delta e2e variant.  Plan construction and the
# processor class itself are exercised unconditionally.
# ---------------------------------------------------------------------------
try:  # pyspark >= 4
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )
except ImportError:  # pragma: no cover - pyspark 3.x fallback
    StatefulProcessor = object  # type: ignore[assignment,misc]
    StatefulProcessorHandle = None  # type: ignore[assignment]


class RunningTotalsProcessor(StatefulProcessor):
    """Per-key (cnt, cents) accumulator with update-mode emissions.

    State is ONE value-state entry per user; integer cents keep the
    result independent of micro-batch row splits (the v75 rule).  The
    ``max_keys`` brake reuses the module accounting above.
    """

    def __init__(self, max_keys: int | None = DEFAULT_MAX_KEYS):
        self._max_keys = max_keys
        self._guard_id = uuid.uuid4().hex

    def init(self, handle) -> None:
        self._state = handle.getValueState("totals", EXACT_STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        _count_seen_key(self._guard_id, tuple(key), self._max_keys)
        if self._state.exists():
            cnt, cents = self._state.get()
        else:
            cnt, cents = 0, 0
        for pdf in rows:
            cnt += len(pdf)
            cents += int((pdf["value"] * 100).round().astype("int64").sum())
        self._state.update((cnt, cents))
        yield pd.DataFrame(
            {"user_id": [key[0]], "cnt": [cnt], "total": [cents / 100.0]}
        )

    def close(self) -> None:
        pass


ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def running_user_totals_tws(
    events: DataFrame,
    max_keys: int | None = DEFAULT_MAX_KEYS,
) -> DataFrame:
    """``running_user_totals_exact`` through transformWithStateInPandas.

    Requires the RocksDB state store provider (bundled ``rocksdbjni``):
    set ``spark.sql.streaming.stateStore.providerClass`` to
    :data:`ROCKSDB_PROVIDER` on the session — and ``google.protobuf``
    in the Python workers (see the section comment's environment gate).
    """
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningTotalsProcessor(max_keys),
        outputStructType=EXACT_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


# ---------------------------------------------------------------------------
# Streaming top-k maintenance (round 12): the live twin of the batch
# top-k state monoid (operators/incremental.py:topk_state).  State per
# key is the CURRENT top-k as two parallel arrays — O(k) per key, not
# O(events) — and each micro-batch folds its rows in by the same
# (value DESC, id ASC) cut, so the final emission equals batch top-k
# over everything seen regardless of how rows split across batches
# (the v146 monoid law, applied once per batch).  Values are COMPARED,
# never accumulated, so doubles are safe in state (the v75 integral
# rule guards accumulation, not comparison).
# ---------------------------------------------------------------------------
TOPK_STATE_SCHEMA = "vals ARRAY<DOUBLE>, ids ARRAY<BIGINT>"
TOPK_OUTPUT_SCHEMA = (
    "event_type STRING, vals ARRAY<DOUBLE>, ids ARRAY<BIGINT>"
)


def _update_topk(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
    guard_id: str,
    max_keys: int | None,
    k: int,
) -> Iterable[pd.DataFrame]:
    (etype,) = key
    _count_seen_key(guard_id, key, max_keys)
    if state.exists:
        vals, ids = state.get
        pairs = list(zip(vals, ids))
    else:
        pairs = []
    for pdf in pdfs:
        pairs.extend(
            zip(
                (float(v) for v in pdf["value"]),
                (int(i) for i in pdf["event_id"]),
            )
        )
    pairs.sort(key=lambda p: (-p[0], p[1]))
    del pairs[k:]
    vals = [p[0] for p in pairs]
    ids = [p[1] for p in pairs]
    state.update((vals, ids))
    yield pd.DataFrame(
        {"event_type": [etype], "vals": [vals], "ids": [ids]}
    )


def running_topk(
    events: DataFrame,
    k: int = 5,
    watermark: str = "1 hour",
    max_keys: int | None = DEFAULT_MAX_KEYS,
) -> DataFrame:
    """Per-event-type running top-k (by value, event_id tie-break)
    across micro-batches.  ``max_keys`` is the module cardinality
    brake; see the module docstring."""
    guard_id = uuid.uuid4().hex

    def update(key, pdfs, state):
        yield from _update_topk(key, pdfs, state, guard_id, max_keys, k)

    return (
        events.withWatermark("ts", watermark)
        .groupBy("event_type")
        .applyInPandasWithState(
            update,
            outputStructType=TOPK_OUTPUT_SCHEMA,
            stateStructType=TOPK_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
