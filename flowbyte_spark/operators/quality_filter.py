"""C4-style heuristic quality filtering (Raffel et al. 2020, §2.2).

The C4 pipeline cleans Common Crawl with line- and document-level rules
before any model-based scoring: keep only lines that end in terminal
punctuation and have enough words, drop lines carrying boilerplate
markers ("javascript"), drop whole pages containing blocklist strings
("lorem ipsum", "{") or too few surviving lines.  The reference has no
such capability (charter extension; `src/flowbyte/sql.py` delegates all
row logic to SQL Server) — this is the standard first pass of a
training-data pipeline, so it gets a first-class operator.

Scale shape — one reassembly shuffle, everything else codegen map work
(plus a fan-out repartition only when the input is under-parallel,
never on real multi-split inputs):

1. document-level blocklist: on already-parallel inputs, a scan-side
   ``contains`` filter — blocked pages never produce line rows.  When a
   fan-out repartition is inserted (or the caller's plan has one below
   an expensive text derivation — ``early_page_filter=False``), the
   page verdict rides as a column to the post-aggregation filter
   instead: predicate pushdown crosses repartition exchanges and would
   otherwise inline the text derivation into a serial pre-exchange
   filter (measured 1.6x whole-query cost, BASELINE.md round-5).
2. ``posexplode`` the split text, then the line rules (word count via
   ``regexp_count``, terminal punctuation via one anchored regex, line
   blocklist via ``contains``) — all whole-stage-codegen, no UDFs, so
   the per-line pass scales linearly with executors.
3. reassembly: one ``groupBy(id)`` over surviving lines; order restored
   by ``array_sort`` of (pos, line) structs with ``.getField`` (not a
   ``transform`` lambda — keeps the rebuild inside codegen, see
   BASELINE.md round-5 finding 1).  ``n_lines`` rides the group as
   ``first()`` (functionally dependent on id), so no join back.

Shuffle volume is O(surviving lines) — strictly less than the corpus.
Dropped pages simply produce no output row, matching C4's semantics of
discarding the page.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from flowbyte_spark.functions import reassemble_in_order, regex_literal

#: C4's published defaults (Raffel et al. 2020 §2.2): the terminal
#: punctuation set, the line-level "javascript" rule, the page-level
#: "lorem ipsum" / "{" rules, and the ≥3-sentence page floor (expressed
#: here as kept lines, since lines are the unit this operator filters).
TERMINAL_PUNCT = '[.!?"]'
LINE_BLOCKLIST = ("javascript",)
DOC_BLOCKLIST = ("lorem ipsum", "{")


def _contains_any(c: Column, needles: Sequence[str]) -> Column:
    hit = F.lit(False)
    for w in needles:
        hit = hit | F.contains(c, F.lit(w))
    return hit


def c4_quality_filter(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    sep: str = "\n",
    min_words: int = 5,
    terminal_punct: str | None = TERMINAL_PUNCT,
    line_blocklist: Sequence[str] = LINE_BLOCKLIST,
    doc_blocklist: Sequence[str] = DOC_BLOCKLIST,
    min_kept_lines: int = 3,
    early_page_filter: bool | None = None,
) -> DataFrame:
    """Apply C4's line- and page-level quality rules; rebuild survivors.

    A line (a ``sep``-delimited segment of ``text_col``) is kept iff it
    has at least ``min_words`` whitespace-delimited words, matches the
    ``terminal_punct`` character class at its (whitespace-trimmed) end
    when that rule is enabled, and contains no ``line_blocklist`` needle
    (case-insensitive).  A document survives iff its lowercased full text
    contains no ``doc_blocklist`` needle and at least ``min_kept_lines``
    of its lines were kept.

    Returns one row per *surviving* document::

        (id, text_clean, n_lines, n_kept)

    where ``text_clean`` re-joins the kept lines in original order.
    Deterministic: independent of partitioning and input order.
    """
    if min_kept_lines < 1:
        # C4 semantics: a page with zero surviving lines is an empty page
        # and is dropped — and the plan relies on it (zero-kept docs have
        # no group row).  Callers wanting emptied docs retained want a
        # dedup-style rebuild (see exact_substring_dedup), not a filter.
        raise ValueError("min_kept_lines must be >= 1 (C4 drops empty pages)")
    t = F.col(text_col)
    doc_ok = ~_contains_any(F.lower(t), doc_blocklist)
    # The rule pass is CPU-bound per line (two regexes + contains), like
    # the minhash/simhash tier: a single-file fixture input would pin it
    # to one task, so under-parallel inputs get a fan-out repartition.
    # The page-blocklist placement then depends on the regime:
    # - already-parallel input (the 100 TB case: parallelism comes from
    #   file splits): filter BEFORE the explode — the predicate pushes
    #   toward the scan and blocked pages are pruned for free.
    # - fan-out needed: the same early filter would be pushed BELOW the
    #   repartition exchange, inlining the (possibly expensive) upstream
    #   derivation of ``text_col`` into a serial pre-exchange filter and
    #   then recomputing it above (measured 1.6x whole-query cost on the
    #   fixture, BASELINE.md round-5).  Carry the page verdict as a
    #   column instead — it cannot cross the aggregation boundary — and
    #   settle it after the group-by; blocked pages riding the shuffle
    #   cost O(their lines), bounded by the blocklist hit rate.
    # ``early_page_filter=None`` auto-selects by the partition check
    # (one plan->RDD conversion, same cost class as ensure_parallelism);
    # a caller whose input plan already contains a fan-out below an
    # expensive text derivation must pass False explicitly — the
    # partition count alone cannot see that shape, and an explicit False
    # also skips the conversion and trusts the caller's parallelism.
    sc = df.sparkSession.sparkContext
    src = df
    if early_page_filter is None:
        under_parallel = df.rdd.getNumPartitions() < sc.defaultParallelism
        early_page_filter = not under_parallel
        if under_parallel:
            # fan out BY THE DOC KEY, not round-robin: the same exchange
            # then satisfies the reassembly groupBy's distribution
            # (alias-aware output partitioning carries it through the
            # id rename), so the whole operator runs in ONE shuffle
            # (measured 0.98 -> 0.57 s vs a round-robin fan-out).
            src = df.repartition(sc.defaultParallelism, F.col(id_col))
    if early_page_filter:
        src, doc_ok = src.where(doc_ok), F.lit(True)
    base = src.select(
        F.col(id_col).alias("id"),
        # F.split takes a regex but reassembly re-inserts sep literally —
        # quote it so metacharacter separators split/rejoin consistently.
        F.split(t, F.lit(regex_literal(sep))).alias("arr"),
        doc_ok.alias("doc_ok"),
    ).select(
        "id",
        F.size("arr").cast("long").alias("n_lines"),
        "doc_ok",
        F.posexplode("arr").alias("pos", "line"),
    )
    line = F.col("line")
    keep = F.regexp_count(line, F.lit(r"\S+")) >= min_words
    if terminal_punct is not None:
        keep = keep & line.rlike(terminal_punct + r"\s*$")
    if line_blocklist:
        keep = keep & ~_contains_any(F.lower(line), line_blocklist)
    return (
        base.where(keep)
        .groupBy("id")
        .agg(
            reassemble_in_order("pos", "line", sep).alias("text_clean"),
            F.first("n_lines").alias("n_lines"),
            F.first("doc_ok").alias("doc_ok"),
            F.count("*").alias("n_kept"),
        )
        .where(F.col("doc_ok") & (F.col("n_kept") >= min_kept_lines))
        .select("id", "text_clean", "n_lines", F.col("n_kept").cast("long").alias("n_kept"))
    )
