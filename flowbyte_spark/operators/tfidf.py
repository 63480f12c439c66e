"""TF-IDF as pure DataFrame algebra (SURVEY.md §2.10).

No MLlib pipeline objects: term frequencies and document frequencies are
plain aggregations, so the result is oracle-checkable SQL and the plan is
two shuffles (explode→count, join on term).  ``pyspark.ml``'s
HashingTF+IDF trades exactness for a fixed-width vector — at 100 TB both
paths work; this one keeps terms inspectable and join-able.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flowbyte_spark.functions import ensure_parallelism, q4
from flowbyte_spark.functions.hashing import words


def tfidf(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_doc_freq: int = 1,
) -> DataFrame:
    """Per (doc, term) TF-IDF scores.

    tf = term count within the doc; idf = ln((N+1)/(df+1)) + 1 (the
    smoothed sklearn/MLlib convention).  Returns
    (id, term, tf BIGINT, df BIGINT, tfidf DOUBLE[q4]).
    """
    n_docs = df.count()  # one cheap metadata-ish job; N is a plan literal
    terms = (
        ensure_parallelism(df)
        .select(F.col(id_col).alias("id"), F.explode(words(text_col)).alias("term"))
        .groupBy("id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    doc_freq = (
        terms.groupBy("term")
        .agg(F.countDistinct("id").alias("df"))
        .where(F.col("df") >= min_doc_freq)
    )
    idf = F.log((F.lit(float(n_docs)) + 1.0) / (F.col("df") + 1.0)) + 1.0
    return (
        terms.join(doc_freq, "term")
        .select(
            "id",
            "term",
            "tf",
            "df",
            q4(F.col("tf") * idf).alias("tfidf"),
        )
    )


# Prefix-filter safety margin: missed pairs are provably < threshold -
# margin, so q4 rounding (1e-4 grid) can never lift one back over the
# threshold.  Costs a slightly larger index; correctness direction only.
PREFIX_MARGIN = 1e-3


def sparse_cosine_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    max_df: int | None = None,
    n_docs: int | None = None,
    prefix_filter: bool = False,
) -> DataFrame:
    """Document pairs with TF-IDF cosine >= ``threshold`` via an
    INVERTED-INDEX self-join — the sparse lexical twin of the dense
    embedding near-dup family (SRP/MinHash find surface/semantic dups;
    this finds vocabulary-overlap dups).

    Never all-pairs: two documents meet only through terms they SHARE,
    so the join is posting-list x posting-list per term.  ``max_df``
    drops ubiquitous terms from the index — the classic posting-list
    cap that simultaneously (a) bounds the join fan-out at
    sum_t df_t^2 <= max_df * |postings| (the skew valve: a stopword's
    posting list is the hot key), and (b) removes terms that carry no
    discriminative cosine mass anyway.  The cap is part of the
    operator's SEMANTICS (cosine over non-ubiquitous terms), applied
    identically by the DuckDB oracle.

    Returns ``(id1, id2, sim)`` with ``id1 < id2``, sim quantized q4.

    ``prefix_filter=True`` switches to the PREFIX-FILTERED plan
    (Bayardo/Chaudhuri all-pairs bound, the documented 100 TB
    extension): only each document's top-weight terms enter the
    inverted index — the minimal prefix whose remaining (suffix) share
    of the unit norm-squared stays below the threshold.  A pair both of
    whose docs overlap ONLY through un-indexed terms then has
    ``dot <= ||sfx_x|| * ||sfx_y|| < threshold``, so pruning it is
    provably recall-lossless (property-tested in tests/test_tfidf.py;
    v127 hash-matches v122's full-computation oracle).  Candidates come
    from index x FULL-postings (one side indexed suffices for the
    bound); exact cosines are then verified per candidate against
    broadcast-free per-doc weight maps — verification work is
    O(|candidates| * doc_len), not O(sum_t df_t^2).

    Pass ``n_docs`` when the caller already counted the corpus (idf
    needs N; recounting is a full extra scan per call).
    """
    if n_docs is None:
        n_docs = df.count()
    terms = (
        ensure_parallelism(df)
        .select(
            F.col(id_col).alias("id"), F.explode(words(text_col)).alias("term")
        )
        .groupBy("id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    doc_freq = terms.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    if max_df is not None:
        doc_freq = doc_freq.where(F.col("df") <= max_df)
    idf = F.log((F.lit(float(n_docs)) + 1.0) / (F.col("df") + 1.0)) + 1.0
    w = terms.join(doc_freq, "term").select(
        "id", "term", (F.col("tf") * idf).alias("w")
    )
    # ``w`` feeds three legs (norms + both self-join sides; the r16
    # before-plan for v122 shows four corpus scans, one per leg), which
    # makes it LOOK like a persist candidate — measured, it is not: a
    # tracked persist here ran v122 ~25 % SLOWER at sf0.1 (interleaved
    # A/B, 4.04 s -> 5.19 s median, all iterations worse; same outcome
    # class as the r16 minhash-signature experiment).  The duplicated
    # tokenize legs run as parallel stages across 32 cores, while the
    # persist serializes the pipeline behind one materialization and
    # pays executor-storage writes.  At 100 TB, where a corpus re-scan
    # is the dominant cost, the calculus flips — that shape already
    # exists measured and documented in ``_prefix_filtered_pairs``
    # (unit-table persist, neutral at fixture scale).
    norms = w.groupBy("id").agg(
        F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm")
    )
    if prefix_filter:
        unit = w.join(norms, "id").select(
            "id", "term", (F.col("w") / F.col("nrm")).alias("u")
        )
        return _prefix_filtered_pairs(unit, threshold)
    a = w.select(F.col("id").alias("id1"), "term", F.col("w").alias("w1"))
    b = w.select(F.col("id").alias("id2"), "term", F.col("w").alias("w2"))
    dots = (
        a.join(b, "term")
        .where(F.col("id1") < F.col("id2"))
        .groupBy("id1", "id2")
        .agg(F.sum(F.col("w1") * F.col("w2")).alias("dot"))
    )
    n1 = norms.select(F.col("id").alias("id1"), F.col("nrm").alias("n1"))
    n2 = norms.select(F.col("id").alias("id2"), F.col("nrm").alias("n2"))
    return (
        dots.join(n1, "id1")
        .join(n2, "id2")
        .select(
            "id1",
            "id2",
            q4(F.col("dot") / (F.col("n1") * F.col("n2"))).alias("sim"),
        )
        .where(F.col("sim") >= threshold)
    )


def prefix_index(unit: DataFrame, threshold: float) -> DataFrame:
    """The indexed (id, term) prefix of each UNIT-normalized document.

    Rows sort per doc by weight descending (term ascending on ties —
    deterministic); a row is indexed while the norm-squared mass from
    it to the tail is still >= threshold - PREFIX_MARGIN.  The
    un-indexed suffix therefore carries < threshold - margin of the
    unit norm-squared, which is what the losslessness proof needs.
    """
    from pyspark.sql import Window

    win = (
        Window.partitionBy("id")
        .orderBy(F.col("u").desc(), F.col("term"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col("u") * F.col("u")).over(win)
    sfx_incl = F.lit(1.0) - (cum - F.col("u") * F.col("u"))
    return (
        unit.withColumn("__sfx__", sfx_incl)
        .where(F.col("__sfx__") >= threshold - PREFIX_MARGIN)
        .select("id", "term")
    )


def _prefix_filtered_pairs(unit: DataFrame, threshold: float) -> DataFrame:
    """Candidate generation via prefix-index x full-postings, then exact
    per-candidate cosine verification against per-doc weight maps.

    ``unit`` feeds three legs (index window, candidate probe, doc-vector
    maps), so it persists under the tracked materialize-then-release
    contract.  At fixture scale this is neutral (measured ~4.0 s both
    ways at sf0.1 — the wall there is stage count, and the duck twin is
    a 0.09 s single-process pass, the v117 "dispatch-floor lens" class);
    the cache is for the at-scale shape, where each un-cached leg would
    re-run the tf/df/idf pipeline's corpus scan + two shuffles.
    MEMORY_AND_DISK, so a 100 TB posting stream spills rather than
    triple-scanning."""
    from flowbyte_spark.operators import cache

    unit = cache.persist_tracked(unit)
    idx = prefix_index(unit, threshold)
    cand = (
        idx.select(F.col("id").alias("ia"), "term")
        .join(unit.select(F.col("id").alias("ib"), "term"), "term")
        .where(F.col("ia") != F.col("ib"))
        .select(
            F.least("ia", "ib").alias("id1"),
            F.greatest("ia", "ib").alias("id2"),
        )
        .distinct()
    )
    docvec = unit.groupBy("id").agg(
        F.map_from_entries(F.collect_list(F.struct("term", "u"))).alias("v")
    )
    v1 = docvec.select(F.col("id").alias("id1"), F.col("v").alias("v1"))
    v2 = docvec.select(F.col("id").alias("id2"), F.col("v").alias("v2"))
    # Unit vectors: cosine == dot.  map_zip_with pairs shared terms
    # (missing-on-one-side -> NULL -> 0 contribution); interpreted
    # higher-order lambdas are fine here — the input is |candidates|
    # rows, not the posting-list join volume.
    dot = F.aggregate(
        F.map_values(
            F.map_zip_with("v1", "v2", lambda _k, a, b: a * b)
        ),
        F.lit(0.0),
        lambda acc, x: acc + F.coalesce(x, F.lit(0.0)),
    )
    return (
        cand.join(v1, "id1")
        .join(v2, "id2")
        .select("id1", "id2", q4(dot).alias("sim"))
        .where(F.col("sim") >= threshold)
    )
