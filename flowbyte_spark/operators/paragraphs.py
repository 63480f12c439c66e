"""Corpus-wide paragraph-level deduplication (CCNet / RefinedWeb style).

Web-scale training corpora repeat boilerplate *within* otherwise-unique
pages (navigation bars, cookie banners, license footers), so document-level
dedup misses most of the redundancy.  The published pipelines (CCNet,
Wenzek et al. 2019; RefinedWeb, Penedo et al. 2023) therefore dedup at
paragraph granularity: every paragraph occurrence after the first —
anywhere in the corpus — is dropped, and documents are reassembled from
their surviving paragraphs.  The reference has no such capability
(charter extension; nothing comparable in `src/flowbyte/` — sql.py
delegates all set logic to SQL Server).

Scale shape — three linear shuffles, zero joins on the paragraph stream:

1. ``posexplode`` the split text: map-only, one (id, pos, para) row per
   paragraph occurrence.
2. keep-first selection is a single ``groupBy(para).agg(min(struct(id,
   pos)))``: the winning occurrence is *recovered from the aggregate
   itself* (para is the group key, the min-struct carries id+pos), so no
   probe join back to the occurrence stream is needed.  ``min`` is
   partially aggregatable — a boilerplate paragraph repeated 10⁹ times
   collapses to one candidate per map partition before the exchange, so
   hot paragraphs cost nothing extra (contrast a window
   ``row_number() OVER (PARTITION BY para)``, which ships every
   occurrence of the hot key to one task — the skew class
   ``skew.salted_window_agg`` exists for).
3. reassembly: ``groupBy(id)`` over the ≤N surviving occurrences,
   order restored by an ``array_sort`` of (pos, para) structs — field
   extraction (``.getField``) instead of a ``transform`` lambda keeps
   the rebuild inside codegen (see BASELINE.md round-5 finding 1), and
   a broadcast-free left join against the (id, n_paras) projection of
   the input re-attaches fully-deduplicated documents as empty strings.

Shuffle volume is O(occurrences) for stage 2 and O(surviving
occurrences) for stage 3 — both strictly linear in corpus size; nothing
is collected to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flowbyte_spark.functions import reassemble_in_order, regex_literal


def paragraph_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    sep: str = "\n",
) -> DataFrame:
    """Drop every non-first paragraph occurrence corpus-wide; reassemble.

    A paragraph occurrence (a ``sep``-delimited segment of ``text_col``)
    is kept iff it is the globally first occurrence of that exact string,
    ordered by ``(id, position)``.  Later occurrences are dropped whether
    they sit in other documents or later in the same document.

    Returns one row per input document::

        (id, text_dedup, n_kept, n_paras)

    where ``text_dedup`` re-joins the surviving paragraphs in their
    original order (empty string when every paragraph was a repeat),
    ``n_kept`` counts survivors and ``n_paras`` the original paragraph
    count.  Deterministic: independent of partitioning and input order.

    A NULL ``text_col`` is an absent document body: zero paragraphs
    (``n_paras = 0``, distinct from the empty string's one empty
    paragraph), nothing kept, empty ``text_dedup``.  Before round 14
    Spark's non-ANSI ``size(NULL) = -1`` sentinel leaked into
    ``n_paras`` for such rows.
    """
    # No fan-out repartition here (contrast the CPU-bound operators that
    # route through ensure_parallelism): the pre-shuffle work is a split
    # and an explode — scan-bound — so at scale parallelism comes from
    # file splits, and at fixture scale the extra exchange costs more
    # than the single-task map it parallelizes (measured +0.4 s).
    # F.split takes a regex but reassembly re-inserts sep literally —
    # quote it so metacharacter separators split/rejoin consistently.
    sep_lit = F.lit(regex_literal(sep))
    base = df.select(
        F.col(id_col).alias("id"),
        F.split(F.col(text_col), sep_lit).alias("paras"),
    )
    occ = base.select("id", F.posexplode("paras").alias("pos", "para"))
    # Keep-first: min over (id, pos) structs per paragraph; the group key
    # IS the paragraph text, so the aggregate row is the kept occurrence.
    kept = (
        occ.groupBy("para")
        .agg(F.min(F.struct("id", "pos")).alias("first_occ"))
        .select(
            F.col("first_occ.id").alias("id"),
            F.col("first_occ.pos").alias("pos"),
            "para",
        )
    )
    rebuilt = kept.groupBy("id").agg(
        reassemble_in_order("pos", "para", sep).alias("text_dedup"),
        F.count("*").alias("n_kept"),
    )
    return (
        # coalesce BEFORE size: size(NULL array) is -1 in non-ANSI mode,
        # and a count column must not leak that sentinel for NULL text.
        base.select(
            "id",
            F.size(F.coalesce("paras", F.array()))
            .cast("long")
            .alias("n_paras"),
        )
        .join(rebuilt, "id", "left")
        .select(
            "id",
            F.coalesce("text_dedup", F.lit("")).alias("text_dedup"),
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            "n_paras",
        )
    )
