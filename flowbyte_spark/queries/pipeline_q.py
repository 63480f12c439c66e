"""V53-V57: training-data pipeline operators — deterministic dataset
splitting, stratified sampling, reproducible interleave, token-budget
sequence packing, and the composed corpus-prep chain
(operators/split.py + operators/text.py), oracle-verified on the
documents table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flowbyte_spark.catalog import load_table
from flowbyte_spark.operators import split as SP
from flowbyte_spark.operators import text as T
from flowbyte_spark.queries import register

PACK_BUDGET = 2048
SAMPLE_RATES = {"en": 0.5, "de": 0.25, "zh": 0.25}
SAMPLE_DEFAULT = 0.1
QUALITY_MIN = 0.5


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
# V55 — stratified deterministic sampling
# ---------------------------------------------------------------------------
def _rate_case() -> str:
    from flowbyte_spark.operators.split import rate_to_hex_bound

    arms = " ".join(
        f"WHEN lang = '{s}' THEN '{rate_to_hex_bound(r)}'"
        for s, r in sorted(SAMPLE_RATES.items())
    )
    return f"CASE {arms} ELSE '{rate_to_hex_bound(SAMPLE_DEFAULT)}' END"


@register(
    "v55_stratified_sample",
    oracle=f"""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_sampled,
           CAST(MIN(doc_id) AS BIGINT) AS first_id,
           CAST(MAX(doc_id) AS BIGINT) AS last_id
    FROM documents
    WHERE md5('sample42|' || CAST(doc_id AS VARCHAR)) < {_rate_case()}
    GROUP BY lang
    ORDER BY lang
    """,
)
def v55_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum rates via hash thresholds — membership is f(seed,
    doc_id, rate) only, so the sample is reproducible and append-stable
    (unlike sampleBy's RNG over partition iteration order).  Narrow
    filter, no shuffle before the verification rollup."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        SP.stratified_hash_sample(
            docs, "doc_id", "lang", SAMPLE_RATES,
            seed="sample42", default_rate=SAMPLE_DEFAULT,
        )
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_sampled"),
            F.min("doc_id").alias("first_id"),
            F.max("doc_id").alias("last_id"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# V56 — deterministic corpus interleave (reproducible shuffle order)
# ---------------------------------------------------------------------------
@register(
    "v56_interleave",
    oracle="""
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY md5('shuffle42|' ||
               CAST(doc_id AS VARCHAR))) AS INT) AS pos,
           doc_id, lang
    FROM documents
    ORDER BY pos
    LIMIT 50
    """,
)
def v56_interleave(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible dataset shuffling: global order by md5(seed|key).
    Hash order is uniform, so sources/languages interleave without a
    stateful shuffle operator; at scale the same key range-partitions
    shuffled shard writes."""
    docs = load_table(spark, sf_dir, "documents")
    # TakeOrdered-limit FIRST (parallel per-partition heaps), then number
    # the 50 survivors — the global window never sees the full corpus.
    head = (
        docs.select(
            SP.interleave_key("doc_id", "shuffle42").alias("__h"),
            "doc_id",
            "lang",
        )
        .orderBy("__h")
        .limit(50)
    )
    return (
        head.select(
            F.row_number().over(Window.orderBy("__h")).alias("pos"),
            "doc_id",
            "lang",
        )
        .orderBy("pos")
    )


# ---------------------------------------------------------------------------
# V57 — composed corpus prep: quality filter → content dedup → split
# ---------------------------------------------------------------------------
def _qs_sql() -> str:
    """DuckDB twin of text.quality_features' composite score (q4 form),
    over the CTE columns (text, w)."""
    stop = ", ".join(f"'{s}'" for s in T.STOPWORDS)
    alpha = "len(list_filter(w, x -> regexp_matches(x, '^[A-Za-z]+$'))) / len(w)"
    wlen = "(length(text) - (len(w) - 1)) / len(w)"
    punct = f"len(regexp_extract_all(text, '{T.PUNCT_REGEX}')) / length(text)"
    stopr = f"len(list_filter(w, x -> x IN ({stop}))) / len(w)"
    score = (
        f"0.4 * ({alpha}) "
        f"+ 0.3 * (1.0 - LEAST(ABS(({wlen}) - 5.0) / 5.0, 1.0)) "
        f"+ 0.2 * (1.0 - ({punct})) "
        f"+ 0.1 * LEAST(({stopr}) * 5.0, 1.0)"
    )
    return f"FLOOR(({score}) * 10000 + 0.5) / 10000"


@register(
    "v57_corpus_prep",
    oracle=f"""
    WITH q AS (
        SELECT doc_id, text, CAST(len(w) AS BIGINT) AS n_tok,
               {_qs_sql()} AS qs
        FROM (SELECT doc_id, text, string_split(text, ' ') AS w
              FROM documents) t),
    kept AS (
        SELECT MIN(doc_id) AS doc_id, MIN(n_tok) AS n_tok
        FROM q WHERE qs >= {QUALITY_MIN} GROUP BY text)
    SELECT CASE WHEN md5('split42|' || CAST(doc_id AS VARCHAR)) < 'cc'
                THEN 'train'
                WHEN md5('split42|' || CAST(doc_id AS VARCHAR)) < 'e6'
                THEN 'val'
                ELSE 'test' END AS split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS tokens
    FROM kept
    GROUP BY split
    ORDER BY split
    """,
)
def v57_corpus_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full prep chain as one lazy plan: quality scoring (narrow),
    content dedup keeping the lowest doc_id (one shuffle on text),
    deterministic split assignment (narrow), final rollup (one small
    shuffle).  Catalyst pipelines all four stages; nothing materializes
    between operators."""
    docs = load_table(spark, sf_dir, "documents")
    scored = T.quality_features(docs).where(
        F.col("quality_score") >= QUALITY_MIN
    )
    deduped = scored.groupBy("text").agg(
        F.min("doc_id").alias("doc_id"),
        F.min("n_words").alias("n_tok"),
    )
    return (
        SP.hash_split(deduped, "doc_id")
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("tokens"),
        )
        .orderBy("split")
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


# ---------------------------------------------------------------------------
# V72 — deterministic global shuffle (seeded total order with positions)
# ---------------------------------------------------------------------------
@register(
    "v72_global_shuffle",
    oracle="""
    SELECT doc_id,
           CAST(ROW_NUMBER() OVER (
                    ORDER BY md5('shuffle42|' || CAST(doc_id AS VARCHAR)),
                             doc_id
                ) - 1 AS BIGINT) AS pos
    FROM documents
    ORDER BY doc_id
    """,
)
def v72_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every document's position in the seeded global shuffle order —
    checked against a single-window ROW_NUMBER oracle, while the engine
    computes the same total order WITHOUT a single-partition window
    (hex-prefix range buckets + prefix-sum offsets)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        SP.global_shuffle(docs, "doc_id")
        .select("doc_id", "pos")
        .orderBy("doc_id")
    )
