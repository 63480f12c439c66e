"""Property-based check of the C4 → ExactSubstr PIPELINE against a
sequential reference (round-6 mandate: per-operator tests can't see
cross-operator contract drift — e.g. which documents survive the quality
filter, how emptied documents flow into span dedup, separator handling
across the boundary).

Hypothesis drives tiny-vocab random corpora (collisions constant), runs
``c4_quality_filter`` (line rules only) then ``exact_substring_dedup``
over the survivors, and compares against the obvious sequential
implementation of both stages composed in Python.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from flowbyte_spark.operators.quality_filter import c4_quality_filter
from flowbyte_spark.operators.substrings import exact_substring_dedup

pytestmark = pytest.mark.filterwarnings("ignore")

K = 2  # window length for span dedup
MIN_WORDS = 2  # C4 line rule
MIN_KEPT = 1  # survive with any kept line

# lines of 0-4 words from a 3-word vocabulary; 1-4 lines per doc; up to
# 5 docs: line-rule kills, whole-doc kills, and cross-doc duplicated
# 2-grams all occur constantly.
line = st.lists(st.sampled_from(["x", "y", "z"]), min_size=0, max_size=4)
doc = st.lists(line, min_size=1, max_size=4)
corpus_strategy = st.lists(doc, min_size=1, max_size=5)

SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _ref_c4(corpus):
    """id -> kept-lines text (docs with < MIN_KEPT kept lines dropped)."""
    out = {}
    for doc_id, lines in enumerate(corpus):
        kept = [" ".join(ws) for ws in lines if len(ws) >= MIN_WORDS]
        if len(kept) >= MIN_KEPT:
            out[doc_id] = "\n".join(kept)
    return out


def _ref_substr(texts, k, sep=" "):
    """Sequential ExactSubstr over {id: text}: first occurrence of every
    duplicated k-token window is kept, tokens covered by later
    occurrences are dropped, survivors re-join in order."""
    toks = {i: t.split(sep) for i, t in texts.items()}
    occ: dict[tuple, list[tuple[int, int]]] = {}
    for i in sorted(toks):
        ts = toks[i]
        for p in range(len(ts) - k + 1):
            occ.setdefault(tuple(ts[p : p + k]), []).append((i, p))
    covered: dict[int, set[int]] = {i: set() for i in toks}
    for places in occ.values():
        if len(places) < 2:
            continue
        for i, p in places[1:]:  # every non-first occurrence
            covered[i].update(range(p, p + k))
    out = {}
    for i, ts in toks.items():
        kept = [t for p, t in enumerate(ts) if p not in covered[i]]
        out[i] = (sep.join(kept), len(ts), len(kept))
    return out


@given(corpus_strategy)
@SETTINGS
def test_c4_then_substr_matches_sequential_reference(spark, corpus):
    df = spark.createDataFrame(
        [
            (i, "\n".join(" ".join(ws) for ws in lines))
            for i, lines in enumerate(corpus)
        ],
        "doc_id INT, text STRING",
    )
    cleaned = c4_quality_filter(
        df,
        "doc_id",
        "text",
        min_words=MIN_WORDS,
        terminal_punct=None,
        line_blocklist=(),
        doc_blocklist=(),
        min_kept_lines=MIN_KEPT,
    )
    # pipeline composition: spans dedup over the SURVIVING cleaned text,
    # newline-joined lines re-tokenized on whitespace via a single-space
    # normalization (the newline separator must not glue words together)
    piped = exact_substring_dedup(
        cleaned.selectExpr(
            "id", "replace(text_clean, '\\n', ' ') AS text"
        ),
        "id",
        "text",
        k=K,
    )
    got = {
        r.id: (r.text_dedup, r.n_tokens, r.n_kept) for r in piped.collect()
    }

    ref_texts = {
        i: t.replace("\n", " ") for i, t in _ref_c4(corpus).items()
    }
    assert got == _ref_substr(ref_texts, K)


@given(corpus_strategy)
@SETTINGS
def test_c4_survivor_set_matches_reference(spark, corpus):
    # the cross-operator contract at the boundary: WHICH docs flow on
    df = spark.createDataFrame(
        [
            (i, "\n".join(" ".join(ws) for ws in lines))
            for i, lines in enumerate(corpus)
        ],
        "doc_id INT, text STRING",
    )
    out = {
        r.id: r.text_clean
        for r in c4_quality_filter(
            df,
            "doc_id",
            "text",
            min_words=MIN_WORDS,
            terminal_punct=None,
            line_blocklist=(),
            doc_blocklist=(),
            min_kept_lines=MIN_KEPT,
        ).collect()
    }
    assert out == _ref_c4(corpus)
