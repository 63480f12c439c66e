"""Round-5 LLM-pipeline verification queries, continued (V78+).

Charter-extension operators with no counterpart in the reference
(`src/flowbyte/sql.py` delegates every set operation to SQL Server);
algorithms follow the published pipelines cited in each operator module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flowbyte_spark.catalog import load_table
from flowbyte_spark.operators.paragraphs import paragraph_dedup
from flowbyte_spark.queries import register

# ---------------------------------------------------------------------------
# V78 — corpus-wide paragraph dedup (CCNet-style keep-first + reassembly)
# ---------------------------------------------------------------------------
# The fixture corpus is single-line, so both engines first derive
# paragraphs deterministically: a codegen-only regexp turns every 3rd
# word boundary into a newline (greedy, left-to-right, identical in Java
# regex and RE2).  ~19% of the resulting 3-word paragraphs are corpus-
# level repeats at sf0.01, and some documents dedup away entirely — so
# the hash gate exercises keep-first ordering, same-doc repeats, empty
# reassembly, and the (id, pos) tie-break all at once.
_PARA_WORDS = 3
_CHUNK_RE = r"((?:\S+ ){%d}\S+) " % (_PARA_WORDS - 1)


@register(
    "v78_paragraph_dedup",
    oracle=rf"""
    WITH chunked AS (
        SELECT doc_id,
               regexp_replace(text, '{_CHUNK_RE}', '\1' || chr(10), 'g')
                   AS ptext
        FROM documents),
    p AS (
        SELECT doc_id,
               unnest(string_split(ptext, chr(10))) AS para,
               unnest(range(1, len(string_split(ptext, chr(10))) + 1)) AS pos
        FROM chunked),
    flagged AS (
        SELECT doc_id, para, pos,
               ROW_NUMBER() OVER (PARTITION BY para
                                  ORDER BY doc_id, pos) AS rn
        FROM p),
    rebuilt AS (
        SELECT doc_id,
               string_agg(para, chr(10) ORDER BY pos) AS text_dedup,
               COUNT(*) AS n_kept
        FROM flagged WHERE rn = 1 GROUP BY doc_id)
    SELECT d.doc_id,
           COALESCE(r.text_dedup, '') AS text_dedup,
           CAST(COALESCE(r.n_kept, 0) AS BIGINT) AS n_kept,
           CAST(len(string_split(c.ptext, chr(10))) AS BIGINT) AS n_paras
    FROM documents d
    JOIN chunked c USING (doc_id)
    LEFT JOIN rebuilt r ON d.doc_id = r.doc_id
    """,
)
def v78_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide keep-first paragraph dedup over the documents table:
    every 3-word pseudo-paragraph occurrence after its global first (by
    doc_id, then position) is dropped and documents are reassembled in
    order.  The full (doc_id, text_dedup, n_kept, n_paras) table is
    hash-checked, so a wrong survivor, a broken tie-break, or an
    out-of-order rebuild all break the gate.  No cosmetic final ORDER BY
    on either side: dedup output has no inherent order, the driver (and
    the oracle harness) compare row multisets, and the range exchange a
    global sort plans costs more than the rest of the query at fixture
    scale (measured +0.6 s for the sampling pass + shuffle + AQE
    barrier)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.regexp_replace("text", _CHUNK_RE, "$1\n").alias("ptext"),
    )
    return paragraph_dedup(docs, "doc_id", "ptext", sep="\n").withColumnRenamed(
        "id", "doc_id"
    )
