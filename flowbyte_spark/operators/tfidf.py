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
