"""Round-2 pipeline queries V64-V66: near-dup cluster resolution,
repetition quality signals, SCD2 history merge.

Each pairs a Spark operator with a DuckDB oracle that replicates the
algorithm (same md5 minhash family, same q4 quantization, same
tie-breaks), extending the LLM-pipeline tier (V19-V31) and the keyed
mutation tier (V17-V18).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flowbyte_spark.catalog import load_table
from flowbyte_spark.functions import DEC
from flowbyte_spark.operators import components as C
from flowbyte_spark.operators import dedup as D
from flowbyte_spark.operators import merge as M
from flowbyte_spark.operators import split as SP
from flowbyte_spark.operators import text as T
from flowbyte_spark.queries import register
from flowbyte_spark.queries.llm import (
    _SH_DOCS,
    JACCARD_N,
    MINHASH_BANDS,
    MINHASH_K,
    MINHASH_ROWS,
    MINHASH_THRESHOLD,
)
from flowbyte_spark.queries.pipeline_q import QUALITY_MIN, _qs_sql

# ---------------------------------------------------------------------------
# V64 — near-dup cluster resolution: MinHash pairs → connected components
# ---------------------------------------------------------------------------
# The oracle re-derives the SAME pair list as V22, then computes components
# with a recursive transitive closure: reach(id, r) holds "node r reaches
# node id"; MIN(r) per id is the component representative, exactly the
# fixpoint min-label propagation converges to.
_V64_PAIRS = f"""
    sigs AS (
        SELECT doc_id, sh,
               [list_aggregate([md5(j::VARCHAR || '|' || s) for s in sh], 'min')
                for j in range(0, {MINHASH_K})] AS sig
        FROM docs),
    bands AS (
        SELECT doc_id, b AS band_idx,
               md5(array_to_string(sig[b*{MINHASH_ROWS}+1 : b*{MINHASH_ROWS}+{MINHASH_ROWS}], '')) AS band_hash
        FROM sigs, UNNEST(range(0, {MINHASH_BANDS})) t(b)),
    cands AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a JOIN bands b
          ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
         AND a.doc_id < b.doc_id),
    pairs AS (
        SELECT id_a, id_b
        FROM cands
        JOIN docs sa ON sa.doc_id = id_a
        JOIN docs sb ON sb.doc_id = id_b
        WHERE ROUND(len(list_filter(sa.sh, x -> list_contains(sb.sh, x)))
                    / (len(sa.sh) + len(sb.sh)
                       - len(list_filter(sa.sh, x -> list_contains(sb.sh, x)))),
                    4) >= {MINHASH_THRESHOLD})
"""


@register(
    "v64_neardup_clusters",
    oracle=f"""
    WITH RECURSIVE {_SH_DOCS},
    {_V64_PAIRS},
    edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION
        SELECT id_b, id_a FROM pairs),
    reach AS (
        SELECT src AS id, src AS r FROM edges
        UNION
        SELECT e.dst AS id, re.r FROM reach re JOIN edges e ON e.src = re.id),
    comp AS (SELECT id, MIN(r) AS comp FROM reach GROUP BY id),
    sizes AS (SELECT comp, COUNT(*) AS cluster_size FROM comp GROUP BY comp)
    SELECT c.id AS doc_id, c.comp AS comp,
           CAST(CASE WHEN c.id = c.comp THEN 1 ELSE 0 END AS BIGINT) AS is_canonical,
           s.cluster_size AS cluster_size
    FROM comp c JOIN sizes s USING (comp)
    ORDER BY doc_id
    """,
)
def v64_neardup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairs → clusters → survivors: the step every near-dup pipeline
    needs after LSH.  Distributed min-label propagation
    (operators/components.py) over the V22 MinHash pair list; survivor =
    min doc_id per component."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_pairs(
        docs,
        "doc_id",
        "text",
        n=JACCARD_N,
        num_hashes=MINHASH_K,
        bands=MINHASH_BANDS,
        threshold=MINHASH_THRESHOLD,
    )
    return (
        C.neardup_clusters(pairs)
        .select(
            F.col("id").alias("doc_id"), "comp", "is_canonical", "cluster_size"
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# V67 — cluster-aware corpus prep: near-dup CLUSTER survivors (not just
# pair-wise dedup) feed the quality filter → split → token rollup chain.
# V57 stops at exact-content dedup; this composes the V64 clustering tier
# into the same prep pipeline, so transitive near-dups (A~B, B~C) keep
# exactly one representative.
# ---------------------------------------------------------------------------
@register(
    "v67_cluster_corpus_prep",
    oracle=f"""
    WITH RECURSIVE {_SH_DOCS},
    {_V64_PAIRS},
    edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION
        SELECT id_b, id_a FROM pairs),
    reach AS (
        SELECT src AS id, src AS r FROM edges
        UNION
        SELECT e.dst AS id, re.r FROM reach re JOIN edges e ON e.src = re.id),
    comp AS (SELECT id, MIN(r) AS comp FROM reach GROUP BY id),
    losers AS (SELECT id FROM comp WHERE id <> comp),
    q AS (
        SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tok, {{qs}} AS qs
        FROM (SELECT doc_id, text, string_split(text, ' ') AS w
              FROM documents
              WHERE doc_id NOT IN (SELECT id FROM losers)) t),
    kept AS (SELECT doc_id, n_tok FROM q WHERE qs >= {QUALITY_MIN})
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
    """.replace("{qs}", _qs_sql()),
)
def v67_cluster_corpus_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash pairs → connected components → drop non-canonical cluster
    members (anti-join, survivor = min doc_id per component) → quality
    filter (narrow) → deterministic hash split (narrow) → token rollup
    (one small shuffle).  Docs in no pair are their own canonical member
    and pass through untouched — the anti-join never sees them."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_pairs(
        docs,
        "doc_id",
        "text",
        n=JACCARD_N,
        num_hashes=MINHASH_K,
        bands=MINHASH_BANDS,
        threshold=MINHASH_THRESHOLD,
    )
    losers = (
        C.neardup_clusters(pairs)
        .where(F.col("is_canonical") == 0)
        .select(F.col("id").alias("doc_id"))
    )
    survivors = docs.join(losers, "doc_id", "left_anti")
    kept = T.quality_features(survivors).where(
        F.col("quality_score") >= QUALITY_MIN
    )
    return (
        SP.hash_split(kept, "doc_id")
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_words").alias("tokens"),
        )
        .orderBy("split")
    )


# ---------------------------------------------------------------------------
# V65 — Gopher-style repetition signals, aggregated per language
# ---------------------------------------------------------------------------
@register(
    "v65_repetition_signals",
    oracle="""
    WITH base AS (
        SELECT doc_id, lang, string_split(text, ' ') AS w
        FROM documents
        WHERE len(string_split(text, ' ')) >= 2),
    word_stats AS (
        SELECT doc_id, lang,
               FLOOR(((len(w) - len(list_distinct(w))) / len(w)) * 10000 + 0.5) / 10000 AS dup_word_frac,
               [w[i] || ' ' || w[i+1] for i in range(1, len(w))] AS bg
        FROM base),
    bg_counts AS (
        SELECT doc_id, g, COUNT(*) AS c
        FROM (SELECT doc_id, unnest(bg) AS g FROM word_stats)
        GROUP BY doc_id, g),
    bg_stats AS (
        SELECT doc_id,
               FLOOR((MAX(c) / SUM(c)) * 10000 + 0.5) / 10000 AS top_bigram_frac
        FROM bg_counts GROUP BY doc_id),
    per_doc AS (
        SELECT w.lang, w.dup_word_frac, b.top_bigram_frac
        FROM word_stats w JOIN bg_stats b USING (doc_id))
    SELECT lang,
           COUNT(*) AS n_docs,
           FLOOR((CAST(SUM(CAST(dup_word_frac AS DECIMAL(38,6))) AS DOUBLE)
                  / COUNT(*)) * 10000 + 0.5) / 10000 AS avg_dup_word_frac,
           FLOOR((CAST(SUM(CAST(top_bigram_frac AS DECIMAL(38,6))) AS DOUBLE)
                  / COUNT(*)) * 10000 + 0.5) / 10000 AS avg_top_bigram_frac,
           COUNT(*) FILTER (WHERE top_bigram_frac > 0.2) AS n_repetitive
    FROM per_doc
    GROUP BY lang
    ORDER BY lang
    """,
)
def v65_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language roll-up of Gopher repetition signals
    (operators/text.repetition_signals): average duplicate-word fraction,
    average top-bigram share, and the count of documents a
    top-bigram-share > 0.2 rule would drop.  Averages follow the decimal
    determinism convention (exact decimal sums, q4 final)."""
    docs = load_table(spark, sf_dir, "documents")
    # lang rides through the map-only operator — no second corpus scan and
    # no join back on id (which doubled this query's cost at bench scale).
    labeled = T.repetition_signals(docs, "doc_id", "text", keep_cols=("lang",))

    def _q4(c):
        return F.floor(c * 10000 + F.lit(0.5)) / 10000

    return (
        labeled.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            _q4(
                F.sum(F.col("dup_word_frac").cast(DEC)).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_dup_word_frac"),
            _q4(
                F.sum(F.col("top_bigram_frac").cast(DEC)).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_top_bigram_frac"),
            F.count(F.when(F.col("top_bigram_frac") > 0.2, F.lit(1))).alias(
                "n_repetitive"
            ),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# V66 — SCD2 history merge, two update batches applied in sequence
# ---------------------------------------------------------------------------
@register(
    "v66_scd2_merge",
    oracle="""
    WITH t0 AS (
        SELECT c_custkey, c_mktsegment,
               '2020-01-01' AS valid_from, CAST(NULL AS VARCHAR) AS valid_to,
               TRUE AS cur
        FROM customer),
    u1 AS (SELECT c_custkey, 'MACHINERY' AS seg FROM customer WHERE c_custkey % 10 = 0),
    ch1 AS (
        SELECT t.c_custkey FROM t0 t JOIN u1 u USING (c_custkey)
        WHERE t.cur AND t.c_mktsegment IS DISTINCT FROM u.seg),
    t1 AS (
        SELECT t.c_custkey, t.c_mktsegment, t.valid_from,
               CASE WHEN ch.c_custkey IS NOT NULL AND t.cur
                    THEN '2023-01-01' ELSE t.valid_to END AS valid_to,
               CASE WHEN ch.c_custkey IS NOT NULL AND t.cur
                    THEN FALSE ELSE t.cur END AS cur
        FROM t0 t LEFT JOIN ch1 ch ON t.c_custkey = ch.c_custkey
        UNION ALL
        SELECT u.c_custkey, u.seg, '2023-01-01', NULL, TRUE
        FROM u1 u JOIN ch1 USING (c_custkey)),
    u2 AS (SELECT c_custkey, 'FURNITURE' AS seg FROM customer WHERE c_custkey % 20 = 0),
    ch2 AS (
        SELECT t.c_custkey FROM t1 t JOIN u2 u USING (c_custkey)
        WHERE t.cur AND t.c_mktsegment IS DISTINCT FROM u.seg),
    t2 AS (
        SELECT t.c_custkey, t.c_mktsegment, t.valid_from,
               CASE WHEN ch.c_custkey IS NOT NULL AND t.cur
                    THEN '2024-01-01' ELSE t.valid_to END AS valid_to,
               CASE WHEN ch.c_custkey IS NOT NULL AND t.cur
                    THEN FALSE ELSE t.cur END AS cur
        FROM t1 t LEFT JOIN ch2 ch ON t.c_custkey = ch.c_custkey
        UNION ALL
        SELECT u.c_custkey, u.seg, '2024-01-01', NULL, TRUE
        FROM u2 u JOIN ch2 USING (c_custkey))
    SELECT c_custkey, c_mktsegment, valid_from, valid_to,
           CAST(CASE WHEN cur THEN 1 ELSE 0 END AS BIGINT) AS is_current
    FROM t2
    WHERE c_custkey % 10 = 0
    ORDER BY c_custkey, valid_from
    """,
)
def v66_scd2_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two SCD2 batches against a customer dimension: every 10th customer
    moves to MACHINERY in 2023 (no-op where already MACHINERY — the
    null-safe change detector must skip those), every 20th to FURNITURE in
    2024 (versioning on top of the 2023 version).  Output is the full
    version history of the touched keys."""
    cust = load_table(spark, sf_dir, "customer")
    target = cust.select(
        "c_custkey",
        "c_mktsegment",
        F.lit("2020-01-01").alias("valid_from"),
        F.lit(None).cast("string").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    u1 = cust.where(F.col("c_custkey") % 10 == 0).select(
        "c_custkey", F.lit("MACHINERY").alias("c_mktsegment")
    )
    u2 = cust.where(F.col("c_custkey") % 20 == 0).select(
        "c_custkey", F.lit("FURNITURE").alias("c_mktsegment")
    )
    t1 = M.scd2_apply(
        target, u1, ["c_custkey"], ["c_mktsegment"], "2023-01-01"
    )
    t2 = M.scd2_apply(t1, u2, ["c_custkey"], ["c_mktsegment"], "2024-01-01")
    return (
        t2.where(F.col("c_custkey") % 10 == 0)
        .select(
            "c_custkey",
            "c_mktsegment",
            "valid_from",
            "valid_to",
            F.col("is_current").cast("long").alias("is_current"),
        )
        .orderBy("c_custkey", "valid_from")
    )
