"""Property-based DML fuzz for the bundled memcat DSv2 catalog: a random
sequence of INSERT / MERGE / DELETE / UPDATE statements must leave the
table equal to a sequential Python reference model applying the same
operations — and every intermediate commit must be time-travel readable.

This is the catalog analog of the operator property tests: per-statement
unit tests (test_table_seam) can miss interactions (merge after delete,
update of merge-inserted rows, snapshot pinning across the sequence).
"""

from __future__ import annotations

import uuid

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

pytestmark = pytest.mark.filterwarnings("ignore")

# ops: ("insert", [(k, v)]) | ("merge", [(k, v)]) | ("delete_eq", k)
#      | ("delete_lt", k) | ("update_add", k_mod)
key = st.integers(min_value=0, max_value=9)
val = st.integers(min_value=0, max_value=99)
op = st.one_of(
    st.tuples(st.just("insert"), st.lists(st.tuples(key, val), min_size=1, max_size=3)),
    st.tuples(st.just("merge"), st.lists(st.tuples(key, val), min_size=1, max_size=3)),
    st.tuples(st.just("delete_eq"), key),
    st.tuples(st.just("delete_lt"), key),
    st.tuples(st.just("update_add"), st.integers(min_value=1, max_value=3)),
)
ops_strategy = st.lists(op, min_size=1, max_size=8)

SETTINGS = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _apply_reference(ops):
    """Sequential model: rows is a MULTISET of (k, v); merge updates all
    rows of matching k to the source v (last source row per k wins, like
    MERGE with a deduped source) or inserts when absent."""
    rows: list[tuple[int, int]] = []
    snapshots = [list(rows)]
    for kind, arg in ops:
        if kind == "insert":
            rows.extend(arg)
        elif kind == "merge":
            src = {}
            for k, v in arg:
                src[k] = v  # dedupe source: last wins per key
            present = {k for k, _ in rows}
            rows = [(k, src.get(k, v) if k in src else v) for k, v in rows]
            rows.extend((k, v) for k, v in src.items() if k not in present)
        elif kind == "delete_eq":
            rows = [(k, v) for k, v in rows if k != arg]
        elif kind == "delete_lt":
            rows = [(k, v) for k, v in rows if not (k < arg)]
        elif kind == "update_add":
            rows = [(k, v + 1 if k % arg == 0 else v) for k, v in rows]
        snapshots.append(list(rows))
    return rows, snapshots


@given(ops_strategy)
@SETTINGS
def test_memcat_dml_sequence_matches_reference(spark, ops):
    ident = f"memcat.db.fuzz_{uuid.uuid4().hex[:10]}"
    spark.sql(f"CREATE TABLE {ident} (k INT, v INT)")
    for kind, arg in ops:
        if kind == "insert":
            values = ", ".join(f"({k},{v})" for k, v in arg)
            spark.sql(f"INSERT INTO {ident} VALUES {values}")
        elif kind == "merge":
            src = {}
            for k, v in arg:
                src[k] = v
            rows = [(k, v) for k, v in src.items()]
            spark.createDataFrame(rows, "k int, v int").createOrReplaceTempView(
                "fuzz_src"
            )
            spark.sql(
                f"MERGE INTO {ident} t USING fuzz_src s ON t.k = s.k "
                "WHEN MATCHED THEN UPDATE SET * "
                "WHEN NOT MATCHED THEN INSERT *"
            )
        elif kind == "delete_eq":
            spark.sql(f"DELETE FROM {ident} WHERE k = {arg}")
        elif kind == "delete_lt":
            spark.sql(f"DELETE FROM {ident} WHERE k < {arg}")
        elif kind == "update_add":
            spark.sql(f"UPDATE {ident} SET v = v + 1 WHERE k % {arg} = 0")

    want, want_snapshots = _apply_reference(ops)
    got = sorted((r.k, r.v) for r in spark.table(ident).collect())
    assert got == sorted(want), f"ops={ops}"

    # every intermediate state is time-travel readable and matches the
    # reference model's snapshot at the same op index.  memcat snapshots
    # are per COMMIT; each statement above commits exactly once, so
    # version i == state after op i (version 0 = empty).
    for i, snap in enumerate(want_snapshots):
        rows = spark.sql(f"SELECT * FROM {ident} VERSION AS OF {i}").collect()
        assert sorted((r.k, r.v) for r in rows) == sorted(snap), (i, ops)
    spark.sql(f"DROP TABLE {ident}")
