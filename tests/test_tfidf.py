"""operators/tfidf.py prefix filtering: the pruned plan must return the
EXACT pair set of the full inverted-index join for any corpus — prefix
filtering is provably recall-lossless at the threshold, not
approximate.  (v127's oracle differential proves the same at fixture
scale against DuckDB's quadratic computation.)"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from flowbyte_spark.operators.tfidf import (
    PREFIX_MARGIN,
    prefix_index,
    sparse_cosine_pairs,
)

SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# Small vocabulary + short docs: maximizes shared-term collisions, so
# generated corpora hold pairs straddling the threshold from both sides.
word = st.sampled_from(["a", "b", "c", "d", "e", "f", "g", "h"])
doc = st.lists(word, min_size=1, max_size=8).map(" ".join)


def _pairs(df):
    return sorted((r.id1, r.id2, r.sim) for r in df.collect())


@given(
    docs=st.lists(doc, min_size=2, max_size=14),
    threshold=st.sampled_from([0.3, 0.5, 0.7, 0.9]),
)
@SETTINGS
def test_prefix_filter_is_lossless(spark, docs, threshold):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    kw = dict(threshold=threshold, n_docs=len(docs))
    full = _pairs(sparse_cosine_pairs(df, "doc_id", "text", **kw))
    pref = _pairs(
        sparse_cosine_pairs(df, "doc_id", "text", prefix_filter=True, **kw)
    )
    assert pref == full


def test_prefix_index_suffix_mass_bound(spark):
    # The invariant the losslessness proof rests on: per doc, the
    # UN-indexed terms carry < threshold - margin of the unit
    # norm-squared.
    threshold = 0.6
    unit_rows = [
        (1, "t1", 0.8), (1, "t2", 0.5), (1, "t3", 0.3317),
        (2, "t1", 0.7071), (2, "t4", 0.7071),
    ]
    unit = spark.createDataFrame(unit_rows, "id long, term string, u double")
    idx = {(r.id, r.term) for r in prefix_index(unit, threshold).collect()}
    for doc_id in (1, 2):
        sfx_sq = sum(
            u * u
            for (i, t, u) in unit_rows
            if i == doc_id and (i, t) not in idx
        )
        assert sfx_sq < threshold - PREFIX_MARGIN + 1e-9, (doc_id, sfx_sq)


def test_prefix_index_reduces_postings(spark):
    # A doc with one dominant term and a long light tail must index far
    # fewer terms than it has (the whole point at 100 TB).
    rows = [(1, "big", 0.99)] + [
        (1, f"t{i}", 0.99 / 100) for i in range(100)
    ]
    unit = spark.createDataFrame(rows, "id long, term string, u double")
    kept = prefix_index(unit, 0.5).count()
    assert kept < 20, kept


def test_prefix_filter_fixture_reduction(spark, sf_dir):
    # Pin the measured candidate reduction on the v127 shingled fixture
    # so a regression in the index construction (e.g. indexing
    # everything) fails loudly rather than silently degrading to the
    # full join.
    from flowbyte_spark.functions import ensure_parallelism
    from flowbyte_spark.functions.hashing import words
    from flowbyte_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 500)
    toks = F.split(F.col("text"), " ")
    tri = F.transform(
        F.sequence(F.lit(1), F.size(toks) - 2),
        lambda i: F.concat_ws(
            "_",
            F.element_at(toks, i),
            F.element_at(toks, i + 1),
            F.element_at(toks, i + 2),
        ),
    )
    shingled = docs.select("doc_id", F.array_join(tri, " ").alias("text"))
    n = shingled.count()
    terms = (
        ensure_parallelism(shingled)
        .select(F.col("doc_id").alias("id"), F.explode(words("text")).alias("term"))
        .groupBy("id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfq = terms.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log((F.lit(float(n)) + 1.0) / (F.col("df") + 1.0)) + 1.0
    w = terms.join(dfq, "term").select(
        "id", "term", (F.col("tf") * idf).alias("w")
    )
    norms = w.groupBy("id").agg(
        F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm")
    )
    unit = w.join(norms, "id").select(
        "id", "term", (F.col("w") / F.col("nrm")).alias("u")
    )
    idx = prefix_index(unit, 0.7)
    full_cand = (
        unit.select(F.col("id").alias("id1"), "term")
        .join(unit.select(F.col("id").alias("id2"), "term"), "term")
        .where(F.col("id1") < F.col("id2"))
        .select("id1", "id2")
        .distinct()
        .count()
    )
    pref_cand = (
        idx.select(F.col("id").alias("ia"), "term")
        .join(unit.select(F.col("id").alias("ib"), "term"), "term")
        .where(F.col("ia") != F.col("ib"))
        .select(
            F.least("ia", "ib").alias("id1"),
            F.greatest("ia", "ib").alias("id2"),
        )
        .distinct()
        .count()
    )
    assert pref_cand < full_cand / 2, (pref_cand, full_cand)
