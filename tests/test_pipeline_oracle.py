"""Oracle tests for V53-V54 (hash split, token-budget packing) plus
operator-level invariants of operators/split.py."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flowbyte_spark.catalog import load_table
from flowbyte_spark.operators.split import hash_split, pack_by_budget
from tests.oracle_util import assert_query_matches


@pytest.mark.parametrize(
    "name",
    [
        "v53_hash_split",
        "v54_pack_by_budget",
        "v55_stratified_sample",
        "v56_interleave",
        "v57_corpus_prep",
        "v72_global_shuffle",
    ],
)
def test_pipeline_matches_oracle(spark, sf_dir, name):
    assert_query_matches(spark, name, sf_dir)


def test_stratified_sample_append_stable(spark, sf_dir):
    """Sampling a subset yields exactly the sampled rows of the full
    corpus that fall in the subset — appends never flip membership."""
    from flowbyte_spark.operators.split import stratified_hash_sample

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    rates = {"en": 0.5, "de": 0.25}
    full = {
        r.doc_id
        for r in stratified_hash_sample(
            docs, "doc_id", "lang", rates, default_rate=0.1
        ).collect()
    }
    half = docs.where(F.col("doc_id") % 2 == 0)
    sub = {
        r.doc_id
        for r in stratified_hash_sample(
            half, "doc_id", "lang", rates, default_rate=0.1
        ).collect()
    }
    assert sub == {d for d in full if d % 2 == 0}


def test_rate_to_hex_bound_limits():
    from flowbyte_spark.operators.split import rate_to_hex_bound

    assert rate_to_hex_bound(0.0) == "0000"
    assert rate_to_hex_bound(1.0) == "g"  # sorts after every hex string
    assert rate_to_hex_bound(0.5) == "8000"
    with pytest.raises(ValueError):
        rate_to_hex_bound(1.5)


def test_hash_split_stable_under_append_and_repartition(spark, sf_dir):
    """Membership depends only on (seed, key): a subset of the corpus and
    a differently-partitioned corpus assign identical splits."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    full = dict(
        hash_split(docs, "doc_id").select("doc_id", "split").collect()
    )
    subset = dict(
        hash_split(docs.where(F.col("doc_id") % 3 == 0), "doc_id")
        .select("doc_id", "split")
        .collect()
    )
    assert all(full[k] == v for k, v in subset.items())
    repart = dict(
        hash_split(docs.repartition(7), "doc_id")
        .select("doc_id", "split")
        .collect()
    )
    assert repart == full


def test_pack_by_budget_chunks_respect_budget(spark, sf_dir):
    """Every chunk except the last per partition accumulates ≥ budget
    tokens by its final row, and chunk ids are contiguous from 0."""
    budget = 500
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.size(F.split("text", " ")).cast("long").alias("n_tok")
    )
    packed = pack_by_budget(
        docs, "doc_id", F.col("n_tok"), budget, partition_cols=["lang"]
    )
    rows = packed.select("lang", "doc_id", "n_tok", "chunk").collect()
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rs in by_lang.items():
        rs.sort(key=lambda r: r.doc_id)
        cum = 0
        for r in rs:
            cum += r.n_tok
            assert r.chunk == (cum - 1) // budget, (lang, r.doc_id)


def test_global_shuffle_is_permutation_and_partition_invariant(spark, sf_dir):
    """Positions form exactly 0..n-1 (no gaps/dupes) and do not depend on
    the input's physical partitioning — only on (seed, key)."""
    from flowbyte_spark.catalog import load_table
    from flowbyte_spark.operators.split import global_shuffle

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    a = global_shuffle(docs, "doc_id", seed="perm7")
    pos_a = {r["doc_id"]: r["pos"] for r in a.collect()}
    assert sorted(pos_a.values()) == list(range(len(pos_a)))
    b = global_shuffle(docs.repartition(7), "doc_id", seed="perm7")
    pos_b = {r["doc_id"]: r["pos"] for r in b.collect()}
    assert pos_a == pos_b
