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


def sparse_cosine_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    max_df: int | None = None,
    n_docs: int | None = None,
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
    At 100 TB add prefix filtering (index only each doc's top-weight
    terms) to cut candidate pairs further; the shape stays two keyed
    shuffles + one pair aggregate.

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
    norms = w.groupBy("id").agg(
        F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm")
    )
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
