"""V53-V54: training-data pipeline operators — deterministic dataset
splitting and token-budget sequence packing (operators/split.py),
oracle-verified on the documents table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flowbyte_spark.catalog import load_table
from flowbyte_spark.operators import split as SP
from flowbyte_spark.operators import text as T
from flowbyte_spark.queries import register

PACK_BUDGET = 2048


# ---------------------------------------------------------------------------
# V53 — deterministic hash-based train/val/test split
# ---------------------------------------------------------------------------
@register(
    "v53_hash_split",
    oracle="""
    SELECT split, lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS chars
    FROM (
        SELECT lang, n_chars,
               CASE WHEN md5('split42|' || CAST(doc_id AS VARCHAR)) < 'cc'
                    THEN 'train'
                    WHEN md5('split42|' || CAST(doc_id AS VARCHAR)) < 'e6'
                    THEN 'val'
                    ELSE 'test' END AS split
        FROM documents) t
    GROUP BY split, lang
    ORDER BY split, lang
    """,
)
def v53_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assignment depends only on (seed, doc_id): stable under re-runs,
    appends, and repartitioning — unlike randomSplit.  The hash is a
    narrow projection (no shuffle); only the verification rollup
    aggregates."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        SP.hash_split(docs, "doc_id")
        .groupBy("split", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("chars"),
        )
        .orderBy("split", "lang")
    )


# ---------------------------------------------------------------------------
# V54 — token-budget sequence packing (context-window chunking)
# ---------------------------------------------------------------------------
@register(
    "v54_pack_by_budget",
    oracle=f"""
    SELECT lang,
           CAST(FLOOR((cum - 1) / {PACK_BUDGET}) AS BIGINT) AS chunk,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS chunk_tokens,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc,
           CAST(MAX(doc_id) AS BIGINT) AS last_doc
    FROM (
        SELECT doc_id, lang, n_tok,
               SUM(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS cum
        FROM (SELECT doc_id, lang,
                     CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
              FROM documents) t) c
    GROUP BY lang, chunk
    ORDER BY lang, chunk
    """,
)
def v54_pack_by_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk boundaries come from a window cumsum over (lang, doc_id) —
    one shuffle on lang; the rollup reuses the same partitioning so AQE
    plans a single exchange.  Integer cumsums stay < 2^53, so the
    floor-division is exact in both engines."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", T.token_count("text").alias("n_tok")
    )
    packed = SP.pack_by_budget(
        docs, "doc_id", F.col("n_tok"), PACK_BUDGET, partition_cols=["lang"]
    )
    return (
        packed.groupBy("lang", "chunk")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("chunk_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("lang", "chunk")
    )
