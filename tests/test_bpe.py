"""BPE tokenizer (operators/bpe.py): training determinism, apply-vs-
sequential-reference differential, and composition with budget packing.

The reference implementation here is written independently of the
operator (naive re-derivation from the paper's description), so a bug
that is self-consistent between train and apply still fails.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flowbyte_spark.catalog import load_table
from flowbyte_spark.operators.bpe import (
    END,
    bpe_tokenize,
    segment_word,
    train_bpe,
)

SF = "/root/testdata/sf0.001"


def _ref_segment(word, merges):
    """Independent apply: replay the merge LIST in learned order, each
    merge applied everywhere in the word before the next (training-time
    semantics — equivalent to rank-greedy apply for a consistent list)."""
    sym = list(word) + [END]
    for a, b in merges:
        i, out = 0, []
        while i < len(sym):
            if i < len(sym) - 1 and sym[i] == a and sym[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out
    return sym


def test_train_is_deterministic(spark):
    docs = load_table(spark, SF, "documents")
    m1 = train_bpe(docs, "text", "doc_id", num_merges=50)
    m2 = train_bpe(docs, "text", "doc_id", num_merges=50)
    assert m1 == m2 and len(m1) == 50
    # merges actually compress: frequent pairs got merged into multi-char
    # symbols
    assert any(len(a + b) > 2 for a, b in m1)


def test_apply_matches_sequential_reference(spark):
    docs = load_table(spark, SF, "documents")
    merges = train_bpe(docs, "text", "doc_id", num_merges=80)
    got = {
        r.id: (r.n_bpe_tokens, list(r.tokens))
        for r in bpe_tokenize(
            docs, "doc_id", "text", merges, keep_tokens=True
        ).collect()
    }
    rows = docs.select("doc_id", "text").collect()
    for r in rows:
        want = []
        for w in r.text.split():
            want.extend(_ref_segment(w, merges))
        assert got[r.doc_id] == (len(want), want), r.doc_id
    # segmentation is lossless: concatenating tokens re-spells the words
    for r in rows[:20]:
        rebuilt = "".join(got[r.doc_id][1]).replace(END, " ").strip()
        assert rebuilt == " ".join(r.text.split())


def test_rank_greedy_equals_list_replay():
    # the operator's rank-greedy segmenter and the reference's list
    # replay are equivalent on adversarial overlap cases
    merges = [("a", "b"), ("ab", "c"), ("b", "c"), ("c", "d")]
    ranks = {p: i for i, p in enumerate(merges)}
    for w in ["abc", "abcd", "bcd", "aabbcc", "abcbcab", "dcba", ""]:
        if not w:
            continue
        assert segment_word(w, ranks) == _ref_segment(w, merges), w


def test_bpe_counts_feed_budget_packing(spark):
    """Composition: learned-token counts drive pack_by_budget exactly as
    the regex counts do — the production budgeting path."""
    from flowbyte_spark.operators.split import pack_by_budget

    docs = load_table(spark, SF, "documents")
    merges = train_bpe(docs, "text", "doc_id", num_merges=60)
    counts = bpe_tokenize(docs, "doc_id", "text", merges)
    packed = pack_by_budget(
        counts.withColumnRenamed("id", "doc_id"),
        "doc_id",
        F.col("n_bpe_tokens"),
        budget=500,
    )
    rows = packed.collect()
    assert {r.doc_id for r in rows} == {
        r.doc_id for r in docs.select("doc_id").collect()
    }
    # pack_by_budget's contract (chunk = floor((cum-1)/budget)): a chunk
    # only exceeds the budget through its FIRST row straddling the
    # boundary — total < budget + first_member_tokens.
    from collections import defaultdict

    packs = defaultdict(list)
    for r in rows:
        packs[r.chunk].append(r)
    for pid, members in packs.items():
        members.sort(key=lambda m: m.doc_id)
        total = sum(m.n_bpe_tokens for m in members)
        assert total < 500 + members[0].n_bpe_tokens, (pid, total)
