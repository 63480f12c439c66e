"""LLM-data-pipeline verification queries V19-V31 (charter scope).

Dedup (exact, content-hash, MinHash+LSH, SimHash, n-gram Jaccard),
similarity search (brute-force top-k, embedding near-dup, IVF ANN), text
analysis (quality, lang-id, token counts, fingerprints) and multimodal
feature plumbing — every one paired with a DuckDB oracle that replicates
the exact algorithm (same md5 hash family, same rounding, same tie-breaks),
so the driver's hash comparison verifies the *algorithm*, not just row
counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flowbyte_spark.catalog import load_table
from flowbyte_spark.operators import dedup as D
from flowbyte_spark.operators import multimodal as M
from flowbyte_spark.operators import similarity as S
from flowbyte_spark.operators import text as T
from flowbyte_spark.queries import register

# ---------------------------------------------------------------------------
# Shared oracle fragments (DuckDB SQL twins of functions/hashing.py)
# ---------------------------------------------------------------------------

# word 3-gram distinct shingles per doc (docs shorter than 3 words excluded)
_SH_DOCS = """
    docs AS (
      SELECT doc_id,
             list_distinct([array_to_string(w[i:i+2], ' ')
                            for i in range(1, len(w) - 1)]) AS sh
      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
      WHERE len(w) >= 3)
"""

_COS = (
    "list_dot_product({a}, {b}) / "
    "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))"
)


def _q4(x: str) -> str:
    """SQL twin of functions.q4: binary-exact HALF-UP quantization."""
    return f"FLOOR(({x}) * 10000 + 0.5) / 10000"

MINHASH_K = 32
MINHASH_BANDS = 8
MINHASH_ROWS = MINHASH_K // MINHASH_BANDS
MINHASH_THRESHOLD = 0.5
JACCARD_N = 3
JACCARD_THRESHOLD = 0.8
SIMHASH_MAX_HAMMING = 3
SIMHASH_BANDS = 4
NEARDUP_COS_THRESHOLD = 0.45
TOPK_QUERY_ID = 1
IVF_QUERY_ID = 7
IVF_CENTROIDS = 16
IVF_NPROBE = 4


# ---------------------------------------------------------------------------
# V19 — exact dedup on a duplicate-inflated corpus
# ---------------------------------------------------------------------------
@register(
    "v19_dedup_exact",
    oracle="""
    SELECT lang, COUNT(*) AS n_docs FROM (
        SELECT DISTINCT lang, text FROM (
            SELECT lang, text FROM documents
            UNION ALL
            SELECT lang, text FROM documents WHERE doc_id % 10 = 0) t) d
    GROUP BY lang
    ORDER BY lang
    """,
)
def v19_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    inflated = docs.select("lang", "text").unionByName(
        docs.where(F.col("doc_id") % 10 == 0).select("lang", "text")
    )
    return (
        D.dedup_exact(inflated, ["lang", "text"])
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# V21 — content-hash dedup, deterministic first-wins survivor
# ---------------------------------------------------------------------------
@register(
    "v21_dedup_content_hash",
    oracle="""
    WITH inflated AS (
        SELECT doc_id, text, source FROM documents
        UNION ALL
        SELECT doc_id + 10000, text, source FROM documents WHERE doc_id % 7 = 0),
    ranked AS (
        SELECT source,
               ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        FROM inflated)
    SELECT source, COUNT(*) AS n_docs
    FROM ranked WHERE rn = 1
    GROUP BY source
    ORDER BY source
    """,
)
def v21_dedup_content_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "source")
    inflated = docs.unionByName(
        docs.where(F.col("doc_id") % 7 == 0).withColumn(
            "doc_id", F.col("doc_id") + 10000
        )
    )
    survivors = D.dedup_by_content_hash(
        inflated, content_columns=["text"], order_by=["doc_id"], hash_algo="md5"
    )
    return (
        survivors.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# V22 — MinHash + LSH near-dup pairs, exact-Jaccard verified
# ---------------------------------------------------------------------------
@register(
    "v22_minhash_lsh",
    oracle=f"""
    WITH {_SH_DOCS},
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
    verified AS (
        SELECT id_a, id_b,
               ROUND(len(list_filter(sa.sh, x -> list_contains(sb.sh, x)))
                     / (len(sa.sh) + len(sb.sh)
                        - len(list_filter(sa.sh, x -> list_contains(sb.sh, x)))),
                     4) AS jaccard
        FROM cands
        JOIN docs sa ON sa.doc_id = id_a
        JOIN docs sb ON sb.doc_id = id_b)
    SELECT id_a, id_b, jaccard
    FROM verified WHERE jaccard >= {MINHASH_THRESHOLD}
    ORDER BY id_a, id_b
    """,
)
def v22_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return D.minhash_lsh_pairs(
        docs,
        "doc_id",
        "text",
        n=JACCARD_N,
        num_hashes=MINHASH_K,
        bands=MINHASH_BANDS,
        threshold=MINHASH_THRESHOLD,
    ).orderBy("id_a", "id_b")


# ---------------------------------------------------------------------------
# V23 — exact n-gram Jaccard near-dup pairs
# ---------------------------------------------------------------------------
@register(
    "v23_jaccard_pairs",
    oracle=f"""
    WITH {_SH_DOCS},
    ex AS (SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS g FROM docs),
    inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               a.n_sh AS n_a, b.n_sh AS n_b, COUNT(*) AS cnt
        FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
        GROUP BY 1, 2, 3, 4)
    SELECT id_a, id_b, ROUND(cnt / (n_a + n_b - cnt), 4) AS jaccard
    FROM inter
    WHERE ROUND(cnt / (n_a + n_b - cnt), 4) >= {JACCARD_THRESHOLD}
    ORDER BY id_a, id_b
    """,
)
def v23_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return D.ngram_jaccard_pairs(
        docs, "doc_id", "text", n=JACCARD_N, threshold=JACCARD_THRESHOLD
    ).orderBy("id_a", "id_b")


# ---------------------------------------------------------------------------
# V24 — SimHash near-dup pairs (banded, Hamming-verified)
# ---------------------------------------------------------------------------
_SIMHASH_SLICE = 60 // SIMHASH_BANDS


@register(
    "v24_simhash",
    oracle=f"""
    WITH docs AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM documents
        WHERE len(string_split(text, ' ')) > 0),
    sims AS (
        SELECT doc_id,
               [CASE WHEN list_aggregate(
                        [(((strpos('0123456789abcdef',
                                   substr(md5(x), (b // 4) + 1, 1)) - 1)
                           >> (3 - (b % 4))) & 1) * 2 - 1 for x in w],
                        'sum') > 0 THEN 1 ELSE 0 END
                for b in range(0, 60)] AS bits
        FROM docs),
    bands AS (
        SELECT doc_id, j AS band_idx,
               array_to_string(bits[j*{_SIMHASH_SLICE}+1 : j*{_SIMHASH_SLICE}+{_SIMHASH_SLICE}], '') AS band_val
        FROM sims, UNNEST(range(0, {SIMHASH_BANDS})) t(j)),
    cands AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a JOIN bands b
          ON a.band_idx = b.band_idx AND a.band_val = b.band_val
         AND a.doc_id < b.doc_id),
    verified AS (
        SELECT id_a, id_b,
               CAST(list_aggregate([abs(sa.bits[i] - sb.bits[i])
                                    for i in range(1, 61)], 'sum') AS BIGINT) AS hamming
        FROM cands
        JOIN sims sa ON sa.doc_id = id_a
        JOIN sims sb ON sb.doc_id = id_b)
    SELECT id_a, id_b, hamming
    FROM verified WHERE hamming <= {SIMHASH_MAX_HAMMING}
    ORDER BY id_a, id_b
    """,
)
def v24_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pairs = D.simhash_pairs(
        docs,
        "doc_id",
        "text",
        max_hamming=SIMHASH_MAX_HAMMING,
        bands=SIMHASH_BANDS,
    )
    return pairs.select(
        "id_a", "id_b", F.col("hamming").cast("long").alias("hamming")
    ).orderBy("id_a", "id_b")


# ---------------------------------------------------------------------------
# V20 — brute-force cosine top-k (exact baseline)
# ---------------------------------------------------------------------------
@register(
    "v20_cosine_topk",
    oracle=f"""
    WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings
               WHERE vec_id = {TOPK_QUERY_ID})
    SELECT vec_id AS id,
           {_q4(_COS.format(a='embedding::DOUBLE[]', b='qv'))} AS sim
    FROM embeddings, q
    WHERE vec_id <> {TOPK_QUERY_ID}
    ORDER BY sim DESC, id
    LIMIT 5
    """,
)
def v20_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return S.cosine_topk(emb, "vec_id", "embedding", TOPK_QUERY_ID, k=5)


# ---------------------------------------------------------------------------
# V26 — embedding near-dup pairs above a cosine threshold
# ---------------------------------------------------------------------------
@register(
    "v26_embedding_neardup",
    oracle=f"""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           {_q4(_COS.format(a='a.embedding::DOUBLE[]', b='b.embedding::DOUBLE[]'))} AS sim
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE {_q4(_COS.format(a='a.embedding::DOUBLE[]', b='b.embedding::DOUBLE[]'))}
          >= {NEARDUP_COS_THRESHOLD}
    ORDER BY id_a, id_b
    """,
)
def v26_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Served by the distributed block-pair GEMM (nothing collected to the
    driver; exact — every unordered row pair lives in exactly one block
    pair).  embedding_neardup_pairs is the pure-Catalyst reference
    implementation and stays equivalence-tested against this."""
    emb = load_table(spark, sf_dir, "embeddings")
    return S.embedding_neardup_blocked(
        emb, "vec_id", "embedding", threshold=NEARDUP_COS_THRESHOLD
    ).orderBy("id_a", "id_b")


# ---------------------------------------------------------------------------
# V25 — IVF ANN top-k (deterministic coarse quantizer)
# ---------------------------------------------------------------------------
@register(
    "v25_ann_ivf",
    oracle=f"""
    WITH c AS (
        SELECT vec_id AS cid, embedding::DOUBLE[] AS cvec
        FROM embeddings ORDER BY vec_id LIMIT {IVF_CENTROIDS}),
    v AS (SELECT vec_id AS id, embedding::DOUBLE[] AS vec FROM embeddings),
    scored AS (
        SELECT v.id, c.cid, v.vec,
               ROW_NUMBER() OVER (
                   PARTITION BY v.id
                   ORDER BY {_q4(_COS.format(a='v.vec', b='c.cvec'))} DESC, c.cid
               ) AS rn
        FROM v, c),
    assign AS (SELECT id, cid, vec FROM scored WHERE rn = 1),
    q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings
          WHERE vec_id = {IVF_QUERY_ID}),
    probed AS (
        SELECT cid FROM c, q
        ORDER BY {_q4(_COS.format(a='cvec', b='qv'))} DESC, cid
        LIMIT {IVF_NPROBE})
    SELECT id, {_q4(_COS.format(a='vec', b='qv'))} AS sim
    FROM assign JOIN probed USING (cid), q
    WHERE id <> {IVF_QUERY_ID}
    ORDER BY sim DESC, id
    LIMIT 5
    """,
)
def v25_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return S.ivf_topk(
        emb,
        "vec_id",
        "embedding",
        IVF_QUERY_ID,
        k=5,
        num_centroids=IVF_CENTROIDS,
        nprobe=IVF_NPROBE,
    )


# ---------------------------------------------------------------------------
# V27 — text quality features
# ---------------------------------------------------------------------------
_STOP_SQL = ", ".join(f"'{s}'" for s in T.STOPWORDS)


@register(
    "v27_text_quality",
    oracle=f"""
    SELECT doc_id,
           CAST(len(w) AS BIGINT) AS n_words,
           CAST(len(regexp_extract_all(text, '{T.TOKEN_REGEX}')) AS BIGINT) AS n_tokens,
           ROUND(len(list_filter(w, x -> regexp_matches(x, '^[A-Za-z]+$'))) / len(w), 4) AS alpha_ratio,
           ROUND(len(list_filter(w, x -> x IN ({_STOP_SQL}))) / len(w), 4) AS stop_ratio,
           ROUND(len(regexp_extract_all(text, '{T.PUNCT_REGEX}')) / length(text), 4) AS punct_ratio,
           ROUND((length(text) - (len(w) - 1)) / len(w), 4) AS avg_word_len,
           FLOOR((0.4 * (len(list_filter(w, x -> regexp_matches(x, '^[A-Za-z]+$'))) / len(w))
                 + 0.3 * (1.0 - LEAST(ABS((length(text) - (len(w) - 1)) / len(w) - 5.0) / 5.0, 1.0))
                 + 0.2 * (1.0 - len(regexp_extract_all(text, '{T.PUNCT_REGEX}')) / length(text))
                 + 0.1 * LEAST((len(list_filter(w, x -> x IN ({_STOP_SQL}))) / len(w)) * 5.0, 1.0))
                 * 10000 + 0.5) / 10000 AS quality_score
    FROM (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents) t
    ORDER BY doc_id
    """,
)
def v27_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return T.quality_features(docs).select(
        "doc_id",
        "n_words",
        "n_tokens",
        "alpha_ratio",
        "stop_ratio",
        "punct_ratio",
        "avg_word_len",
        "quality_score",
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# V28 — heuristic language ID
# ---------------------------------------------------------------------------
def _lang_score_sql(lang: str) -> str:
    profile = ", ".join(f"'{s}'" for s in T.LANG_PROFILES[lang])
    return f"len(list_filter(w, x -> x IN ({profile})))"


_LANG_CASE = " ".join(
    f"WHEN {_lang_score_sql(lang)} = best THEN '{lang}'"
    for lang in T.LANG_PROFILES
)
_LANG_BEST = "GREATEST(" + ", ".join(
    _lang_score_sql(lang) for lang in T.LANG_PROFILES
) + ")"


@register(
    "v28_lang_id",
    oracle=f"""
    SELECT lang_pred, COUNT(*) AS n_docs FROM (
        SELECT CASE {_LANG_CASE} END AS lang_pred FROM (
            SELECT string_split(text, ' ') AS w, {_LANG_BEST} AS best
            FROM documents) s) p
    GROUP BY lang_pred
    ORDER BY lang_pred
    """,
)
def v28_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        T.lang_id(docs)
        .groupBy("lang_pred")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("lang_pred")
    )


# ---------------------------------------------------------------------------
# V29 — token counting per source
# ---------------------------------------------------------------------------
@register(
    "v29_token_count",
    oracle=f"""
    SELECT source,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS ws_tokens,
           CAST(SUM(len(regexp_extract_all(text, '{T.TOKEN_REGEX}'))) AS BIGINT) AS bpe_tokens
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
)
def v29_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy("source")
        .agg(
            F.sum(T.token_count("text")).alias("ws_tokens"),
            F.sum(T.bpe_token_count("text")).alias("bpe_tokens"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# V30 — document fingerprinting (rolling-hash min)
# ---------------------------------------------------------------------------
@register(
    "v30_fingerprint",
    oracle="""
    SELECT lang,
           COUNT(DISTINCT fp) AS n_fp,
           COUNT(*) AS n_docs
    FROM (
        SELECT lang,
               CASE WHEN length(text) >= 16
                    THEN list_aggregate([md5(substr(text, i, 16))
                                         for i in range(1, length(text) - 14)], 'min')
                    ELSE md5(text) END AS fp
        FROM documents) t
    GROUP BY lang
    ORDER BY lang
    """,
)
def v30_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        T.fingerprint(docs, "text", "fp", k=16)
        .groupBy("lang")
        .agg(
            F.countDistinct("fp").alias("n_fp"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# V31 — multimodal feature plumbing (mapInPandas, deterministic stub decode)
# ---------------------------------------------------------------------------
@register(
    "v31_multimodal_features",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(length(text) AS BIGINT) AS n_bytes,
           ROUND((strpos('0123456789abcdef', substr(sha256('image' || text), 1, 1)) - 1) * 16.0
                 + (strpos('0123456789abcdef', substr(sha256('image' || text), 2, 1)) - 1), 0) / 255.0 AS f0
    FROM documents
    WHERE doc_id < 50
    ORDER BY media_id
    """,
)
def v31_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exercise the full multimodal path: binary payload column + struct
    metadata → Arrow-batched mapInPandas decode (deterministic sha256
    stub) → feature vector.  The oracle recomputes feature[0] from the
    same sha256 in SQL, verifying the batch plumbing produced exactly the
    declared bytes."""
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 50)
    # deterministic id: reuse doc_id (monotonically_increasing_id is
    # partition-layout-dependent, useless for cross-engine comparison)
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
    )
    feats = M.extract_features(media, batch_size=16, fake_decode=True)
    return feats.select(
        "media_id",
        F.col("n_bytes").cast("long").alias("n_bytes"),
        F.round(F.element_at("features", 1).cast("double") * 255.0, 0)
        .cast("double").alias("f0_raw"),
    ).withColumn("f0", F.col("f0_raw") / 255.0).drop("f0_raw").orderBy("media_id")


# ---------------------------------------------------------------------------
# V68 — PII scrubbing (regex redaction + per-category counts)
# ---------------------------------------------------------------------------
# The fixture text is synthetic and PII-free, so both sides inject the
# SAME deterministic PII spans (email/phone/IP derived from doc_id) and
# then scrub them — the oracle checks counts AND the redacted text, so a
# pattern that over- or under-matches in either regex engine fails the
# hash.  Patterns are shared RE2-compatible strings (operators/text.py
# PII_PATTERNS).
_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_PHONE = r"\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}"
_PII_IP = r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b"


@register(
    "v68_pii_scrub",
    oracle=f"""
    WITH aug AS (
        SELECT doc_id,
               substr(text, 1, 40) || ' contact user' || doc_id ||
               '@example.com call +1-555-' ||
               lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
               ' ip 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.1' AS raw
        FROM documents)
    SELECT doc_id,
           CAST(len(regexp_extract_all(raw, '{_PII_EMAIL}')) AS BIGINT) AS n_email,
           CAST(len(regexp_extract_all(raw, '{_PII_PHONE}')) AS BIGINT) AS n_phone,
           CAST(len(regexp_extract_all(raw, '{_PII_IP}')) AS BIGINT) AS n_ipv4,
           regexp_replace(
             regexp_replace(
               regexp_replace(raw, '{_PII_EMAIL}', '<EMAIL>', 'g'),
               '{_PII_PHONE}', '<PHONE>', 'g'),
             '{_PII_IP}', '<IP>', 'g') AS scrubbed
    FROM aug
    ORDER BY doc_id
    """,
)
def v68_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    aug = docs.select(
        "doc_id",
        F.concat(
            F.substring("text", 1, 40),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com call +1-555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.lit(" ip 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".1"),
        ).alias("raw"),
    )
    return (
        T.pii_scrub(aug, "raw")
        .select("doc_id", "n_email", "n_phone", "n_ipv4", "scrubbed")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# V69 — benchmark decontamination (eval-set leakage check)
# ---------------------------------------------------------------------------
_DECONTAM_N = 8


@register(
    "v69_decontaminate",
    oracle=f"""
    WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    sh AS (
        SELECT doc_id,
               list_distinct([array_to_string(w[i:i+{_DECONTAM_N - 1}], ' ')
                              for i in range(1, len(w) - {_DECONTAM_N - 2})]) AS g
        FROM d WHERE len(w) >= {_DECONTAM_N}),
    bench AS (SELECT DISTINCT unnest(g) AS gg FROM sh WHERE doc_id % 50 = 0),
    hits AS (
        SELECT s.doc_id, COUNT(*) AS n_matched
        FROM (SELECT doc_id, unnest(g) AS gg FROM sh WHERE doc_id % 50 <> 0) s
        JOIN bench USING (gg)
        GROUP BY s.doc_id)
    SELECT doc_id, n_matched FROM hits ORDER BY doc_id
    """,
)
def v69_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic benchmark split (doc_id % 50 = 0 plays the eval set);
    contaminated train docs are those sharing any 8-gram with it — at
    fixture scale exactly the planted near-duplicates surface.  The
    companion ``decontaminate`` anti-join is exercised in the operator
    tests; the registered query returns the contamination report (stable,
    small, hashable)."""
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % 50 == 0)
    train = docs.where(F.col("doc_id") % 50 != 0)
    return (
        D.benchmark_contamination(
            train, bench, "doc_id", "text", n=_DECONTAM_N
        )
        .select(F.col("id").alias("doc_id"), "n_matched")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# V70 — semantic dedup (SemDeDup: cluster + within-cluster cosine prune)
# ---------------------------------------------------------------------------
SEMDEDUP_THRESHOLD = 0.45  # cosine; matches NEARDUP_COS_THRESHOLD scale
SEMDEDUP_DUP_OFFSET = 100_000  # inflated-copy id offset (keeps ids disjoint)


@register(
    "v70_semantic_dedup",
    oracle=f"""
    WITH emb AS (
        SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings
        UNION ALL
        SELECT vec_id + {SEMDEDUP_DUP_OFFSET}, embedding::DOUBLE[]
        FROM embeddings WHERE vec_id % 5 = 0),
    c AS (SELECT vec_id AS cid, vec AS cvec FROM emb ORDER BY vec_id
          LIMIT {IVF_CENTROIDS}),
    scored AS (
        SELECT emb.vec_id AS id, c.cid, emb.vec,
               ROW_NUMBER() OVER (
                   PARTITION BY emb.vec_id
                   ORDER BY {_q4(_COS.format(a='emb.vec', b='c.cvec'))} DESC,
                            c.cid
               ) AS rn
        FROM emb, c),
    assign AS (SELECT id, cid, vec FROM scored WHERE rn = 1),
    dropped AS (
        SELECT DISTINCT a.id
        FROM assign a JOIN assign b USING (cid)
        WHERE b.id < a.id
          AND {_q4(_COS.format(a='a.vec', b='b.vec'))} >= {SEMDEDUP_THRESHOLD})
    SELECT id, cid, id NOT IN (SELECT id FROM dropped) AS kept
    FROM assign ORDER BY id
    """,
)
def v70_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over a duplicate-inflated embedding corpus: every fifth
    vector reappears under a high id, so the exact copies MUST land in
    their original's cluster and prune (the lowest-id exemplar survives),
    alongside whatever organic near-dups sit above the cosine threshold.
    The full (id, cid, kept) assignment is hash-checked, so a wrong
    cluster, a missed prune, or a flipped survivor all break the gate."""
    emb = load_table(spark, sf_dir, "embeddings")
    inflated = emb.select("vec_id", "embedding").unionByName(
        emb.where(F.col("vec_id") % 5 == 0).select(
            (F.col("vec_id") + SEMDEDUP_DUP_OFFSET).alias("vec_id"),
            "embedding",
        )
    )
    return S.semantic_dedup(
        inflated,
        "vec_id",
        "embedding",
        threshold=SEMDEDUP_THRESHOLD,
        num_centroids=IVF_CENTROIDS,
    ).orderBy("id")


# ---------------------------------------------------------------------------
# V71 — DSIR importance weighting (hashed n-gram log-likelihood ratio)
# ---------------------------------------------------------------------------
_DSIR_N = 2
_DSIR_BUCKET_CHARS = 3  # md5-hex prefix → 16^3 = 4096 hashed buckets
_DSIR_B = 16**_DSIR_BUCKET_CHARS


@register(
    "v71_dsir_importance",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, lang = 'en' AS t, w
        FROM (SELECT doc_id, lang, string_split(text, ' ') AS w
              FROM documents)
        WHERE len(w) >= {_DSIR_N}),
    g AS (
        SELECT doc_id, t,
               substr(md5(unnest([array_to_string(w[i:i+{_DSIR_N - 1}], ' ')
                                  for i in range(1, len(w) - {_DSIR_N - 2})])),
                      1, {_DSIR_BUCKET_CHARS}) AS bkt
        FROM d),
    cnt AS (
        SELECT bkt,
               SUM(CASE WHEN t THEN 1 ELSE 0 END) AS ct,
               COUNT(*) AS cr
        FROM g GROUP BY bkt),
    tot AS (SELECT SUM(ct) AS tt, SUM(cr) AS rt FROM cnt),
    wt AS (
        SELECT bkt,
               CAST(FLOOR((ln((ct + 1.0) / (tt + {_DSIR_B}))
                           - ln((cr + 1.0) / (rt + {_DSIR_B}))) * 10000
                          + 0.5) AS BIGINT) AS wq
        FROM cnt, tot)
    SELECT g.doc_id,
           COUNT(*) AS n_grams,
           CAST(SUM(wq) AS BIGINT) / 10000.0 AS score
    FROM g JOIN wt USING (bkt)
    GROUP BY g.doc_id
    ORDER BY doc_id
    """,
)
def v71_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance scores over the fixture corpus with English docs
    as the target distribution: every document's hashed-bigram bag is
    scored by the add-1-smoothed target-vs-raw log-likelihood ratio.
    Weights are quantized to integer 1e-4 units before the per-doc sum,
    so the score arithmetic is exact and order-independent — the full
    (doc_id, n_grams, score) table hash-checks across engines."""
    from flowbyte_spark.operators.importance import dsir_importance

    docs = load_table(spark, sf_dir, "documents")
    return (
        dsir_importance(
            docs,
            "doc_id",
            "text",
            target=F.col("lang") == "en",
            n=_DSIR_N,
            bucket_chars=_DSIR_BUCKET_CHARS,
        )
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# V74 — per-domain document cap (URL domain extraction + top-k per group)
# ---------------------------------------------------------------------------
_DOMAIN_CAP = 5


@register(
    "v74_domain_cap",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, n_chars,
               'https://www.' || source || '-'
                   || CAST(doc_id % 7 AS VARCHAR)
                   || '.example.com/page/' || CAST(doc_id AS VARCHAR)
                   AS url
        FROM documents),
    x AS (
        SELECT doc_id, n_chars,
               regexp_extract(url, 'https?://(?:www\\.)?([^/:]+)', 1)
                   AS domain
        FROM d),
    r AS (
        SELECT doc_id, domain,
               ROW_NUMBER() OVER (PARTITION BY domain
                                  ORDER BY n_chars DESC, doc_id) AS rk
        FROM x)
    SELECT doc_id, domain, CAST(rk AS BIGINT) AS rk
    FROM r WHERE rk <= {_DOMAIN_CAP}
    ORDER BY doc_id
    """,
)
def v74_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain document caps — the Common Crawl curation staple that
    stops one prolific site from dominating a source mix.  URLs are
    synthesized deterministically from the fixture (as v68 does for
    PII), the domain comes from the shared RE2-safe regex, and the cap
    is a row_number top-k per domain keyed on quality (n_chars proxy)
    with a unique tie-break — one shuffle on the domain key."""
    from flowbyte_spark.operators.topk import top_k_per_group

    docs = load_table(spark, sf_dir, "documents")
    aug = docs.select(
        "doc_id",
        "n_chars",
        F.concat(
            F.lit("https://www."),
            F.col("source"),
            F.lit("-"),
            (F.col("doc_id") % 7).cast("string"),
            F.lit(".example.com/page/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
    )
    capped = top_k_per_group(
        T.extract_domain(aug, "url"),
        ["domain"],
        [F.col("n_chars").desc(), F.col("doc_id")],
        k=_DOMAIN_CAP,
        rank_col="rk",
    )
    return capped.select(
        "doc_id", "domain", F.col("rk").cast("long").alias("rk")
    ).orderBy("doc_id")
