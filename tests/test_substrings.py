"""Exact-substring span dedup: sequential-reference property test,
edge-case units, a DuckDB differential on the fixture corpus, and plan
assertions."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from flowbyte_spark.catalog import load_table
from flowbyte_spark.operators.substrings import exact_substring_dedup

pytestmark = pytest.mark.filterwarnings("ignore")

SF = "/root/testdata/sf0.01"

# 2-word vocabulary with k=2: duplicate windows are near-certain, so the
# keep-first tie-break, overlapping covered spans, fully-emptied docs and
# sub-k docs all occur constantly.
doc = st.lists(st.sampled_from(["a", "b"]), min_size=1, max_size=7)
corpus_strategy = st.lists(doc, min_size=1, max_size=5)

SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _reference(corpus, k):
    """Definitional O(N*k) walk: first-ever occurrence of each k-window
    (by doc, then position) is kept; tokens covered by any later
    occurrence are removed."""
    first: dict[tuple[str, ...], tuple[int, int]] = {}
    for doc_id, toks in enumerate(corpus):
        for pos in range(len(toks) - k + 1):
            first.setdefault(tuple(toks[pos : pos + k]), (doc_id, pos))
    out = {}
    for doc_id, toks in enumerate(corpus):
        covered = set()
        for pos in range(len(toks) - k + 1):
            if first[tuple(toks[pos : pos + k])] != (doc_id, pos):
                covered.update(range(pos, pos + k))
        kept = [t for i, t in enumerate(toks) if i not in covered]
        out[doc_id] = (" ".join(kept), len(toks), len(kept))
    return out


@given(corpus_strategy)
@SETTINGS
def test_matches_sequential_reference(spark, corpus):
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(corpus)],
        "doc_id INT, text STRING",
    )
    got = {
        r.id: (r.text_dedup, r.n_tokens, r.n_kept)
        for r in exact_substring_dedup(df, "doc_id", "text", k=2).collect()
    }
    assert got == _reference(corpus, 2)


def _run(spark, rows, k):
    df = spark.createDataFrame(rows, "id long, text string")
    out = exact_substring_dedup(df, "id", "text", k=k)
    return {r.id: (r.text_dedup, r.n_tokens, r.n_kept) for r in out.collect()}


def test_edge_cases(spark):
    out = _run(
        spark,
        [
            (1, "u v w x y z"),          # first occurrence of the span: intact
            (2, "p q u v w x y z r s"),  # later copy: 6-token span removed
            (3, "u v w"),                # sub-k doc: no windows, passes whole
            (4, "u v w x y z"),          # exact duplicate doc: fully emptied
            (5, "k k k k k k"),          # periodic self-repeat: every window
                                          # after pos 0 duplicates it, covering
                                          # positions 1..5 -> one token survives
        ],
        k=4,
    )
    assert out[1] == ("u v w x y z", 6, 6)
    assert out[2] == ("p q r s", 10, 4)
    assert out[3] == ("u v w", 3, 3)
    assert out[4] == ("", 6, 0)
    assert out[5] == ("k", 6, 1)


def test_null_text_doc_keeps_its_row(spark):
    # Round-15 (r14 size(NULL) audit's deferred site): a NULL-body doc
    # must come back as (id, NULL, NULL, 0) — before the fix posexplode
    # emitted no rows for it and the doc VANISHED from the rewrite, and
    # the non-ANSI size(NULL) = -1 sentinel sat behind n_tokens.  NULL
    # must also stay distinct from the fully-deduplicated empty string.
    df = spark.createDataFrame(
        [(1, "u v w x y z"), (2, None), (3, "u v w x y z")],
        "id long, text string",
    )
    rows = {
        r["id"]: (r["text_dedup"], r["n_tokens"], r["n_kept"])
        for r in exact_substring_dedup(df, "id", "text", k=4).collect()
    }
    assert set(rows) == {1, 2, 3}
    assert rows[2] == (None, None, 0)
    assert rows[1] == ("u v w x y z", 6, 6)
    assert rows[3] == ("", 6, 0)


def test_k_validation(spark):
    df = spark.createDataFrame([(1, "a b")], "id long, text string")
    with pytest.raises(ValueError):
        exact_substring_dedup(df, "id", "text", k=1)


def test_differential_vs_duckdb(spark):
    """Same comparison the driver runs, plus non-vacuousness: the fixture's
    near-dup replicas must produce trimmed and fully-emptied docs."""
    from flowbyte_spark.queries import ORACLE, QUERIES
    from tests.oracle_util import canon, duckdb_conn

    eng = QUERIES["v80_exact_substrings"](spark, SF).toPandas()
    con = duckdb_conn(SF)
    oracle = con.execute(ORACLE["v80_exact_substrings"]).fetchdf()
    con.close()
    assert (eng["n_kept"] < eng["n_tokens"]).any()
    assert (eng["n_kept"] == 0).any()
    assert canon(eng) == canon(oracle)


def test_plan_shape(spark):
    from flowbyte_spark import plans

    df = exact_substring_dedup(load_table(spark, SF, "documents"), "doc_id", "text", k=5)
    plan = plans.physical_plan(df)
    # all shuffles keyed and bounded; the window stream is derived twice
    # (dup-table agg + probe side) by the same two-scans-beat-caching-a-
    # wide-stream call v71 documents.  Small sides (dup-window table,
    # covered sets) broadcast under AQE at runtime.
    assert plans.shuffle_exchanges(df) <= 4, plan
    assert "RoundRobinPartitioning" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_partitioning_independent(spark):
    """keep-first tie-break and reassembly must not depend on physical
    layout: a hostile repartition yields byte-identical results."""
    docs = load_table(spark, SF, "documents")
    base = sorted(
        map(tuple, exact_substring_dedup(docs, "doc_id", "text", k=5).collect())
    )
    weird = sorted(
        map(
            tuple,
            exact_substring_dedup(
                docs.repartition(7), "doc_id", "text", k=5, fan_out=False
            ).collect(),
        )
    )
    assert base == weird
