"""Property-based check: paragraph_dedup vs the obvious sequential
reference.

The single-aggregate keep-first (operators/paragraphs.py) earns its
join-free plan with a struct-min tie-break, and reassembly rides an
array_sort of (pos, para) structs — so hypothesis drives random tiny-
vocab corpora (heavy cross- and same-doc collisions guaranteed) against
the definition: walk documents by id, paragraphs by position, keep only
first-ever-seen strings, re-join in order.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from flowbyte_spark.operators.paragraphs import paragraph_dedup

pytestmark = pytest.mark.filterwarnings("ignore")

# 4-word vocabulary, 0-4 paragraphs per doc, up to 6 docs: same-doc and
# cross-doc repeats (and fully-deduplicated docs) occur constantly.
# A doc may also be None (round 14): NULL text is an absent body —
# zero paragraphs, nothing kept — and before the fix Spark's non-ANSI
# size(NULL) = -1 sentinel leaked into the n_paras count column.
doc = st.one_of(
    st.none(),
    st.lists(st.sampled_from(["a", "b", "c", "d"]), min_size=0, max_size=4),
)
corpus_strategy = st.lists(doc, min_size=1, max_size=6)

SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _reference(corpus):
    seen: set[str] = set()
    out = {}
    for doc_id, paras in enumerate(corpus):
        if paras is None:  # NULL text: zero paragraphs, nothing kept
            out[doc_id] = ("", 0, 0)
            continue
        kept = []
        for p in paras:
            if p not in seen:
                seen.add(p)
                kept.append(p)
        out[doc_id] = ("\n".join(kept), len(kept), len(paras))
    return out


@given(corpus_strategy)
@SETTINGS
def test_paragraph_dedup_matches_sequential_reference(spark, corpus):
    # split("", sep) yields [""] — a zero-paragraph doc is not expressible
    # through a text column, so the reference models it as the one-empty-
    # paragraph doc the operator actually sees.  None is DIFFERENT: it
    # stays a NULL text cell (absent body, zero paragraphs).
    corpus = [
        paras if paras is None or paras else [""] for paras in corpus
    ]
    df = spark.createDataFrame(
        [
            (i, None if paras is None else "\n".join(paras))
            for i, paras in enumerate(corpus)
        ],
        "doc_id INT, text STRING",
    )
    got = {
        r.id: (r.text_dedup, r.n_kept, r.n_paras)
        for r in paragraph_dedup(df, "doc_id", "text").collect()
    }
    assert got == _reference(corpus)
