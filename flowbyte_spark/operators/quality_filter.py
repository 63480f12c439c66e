"""C4-style heuristic quality filtering (Raffel et al. 2020, §2.2).

The C4 pipeline cleans Common Crawl with line- and document-level rules
before any model-based scoring: keep only lines that end in terminal
punctuation and have enough words, drop lines carrying boilerplate
markers ("javascript"), drop whole pages containing blocklist strings
("lorem ipsum", "{") or too few surviving lines.  The reference has no
such capability (charter extension; `src/flowbyte/sql.py` delegates all
row logic to SQL Server) — this is the standard first pass of a
training-data pipeline, so it gets a first-class operator.

Scale shape — MAP-ONLY (round-8 rework; the previous
explode→filter→groupBy reassembly spent a keyed shuffle and an
aggregation to rebuild line order that the array representation never
loses).  The line rules evaluate inside ``F.filter`` over the split
array and survivors rejoin with ``array_join``, so a document never
leaves its partition:

1. document-level blocklist: on already-parallel inputs, a scan-side
   ``contains`` filter — blocked pages never reach the line pass.  When
   a fan-out repartition is inserted (or the caller's plan has one
   below an expensive text derivation — ``early_page_filter=False``),
   the page verdict rides as a column to the final filter instead:
   predicate pushdown crosses repartition exchanges and would otherwise
   inline the text derivation into a serial pre-exchange filter
   (measured 1.6x whole-query cost, BASELINE.md round-5).
2. line rules (word count via ``regexp_count``, terminal punctuation
   via one anchored regex, line blocklist via ``contains``) run as a
   higher-order ``F.filter`` lambda — JVM-side per-element eval, no
   UDFs, no per-line row blowup, and the per-line pass still scales
   linearly with executors.
3. reassembly is ``array_join`` on the filtered array — order is free.

The only exchange the operator can introduce is the under-parallel
fan-out (never triggered on real multi-split inputs).  Shuffle volume
is zero in the already-parallel regime.  Dropped pages simply produce
no output row, matching C4's semantics of discarding the page.
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


def _pin_above_exchange(cond: Column) -> Column:
    """Return ``cond`` wrapped so Catalyst cannot push it down the plan.

    Catalyst only pushes deterministic predicates; the WHEN fuses the
    real condition with a never-true nondeterministic guard
    (``monotonically_increasing_id() < -1``, ids are non-negative) so
    conjunct-splitting cannot separate them.  Row semantics are exactly
    ``where(cond)`` — null condition drops the row.  Used when the final
    survivor filter sits above a fan-out exchange: pushed below it, the
    filter inlines the whole line pass (split + lambda + upstream text
    derivation) into the serial pre-exchange stage and the projections
    recompute it above — measured 1.6x whole-query cost (BASELINE.md
    round-5) and visible as a duplicated ``lambdafunction`` in the plan.
    """
    return F.when(cond, F.lit(True)).otherwise(
        F.monotonically_increasing_id() < F.lit(-1)
    )


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

    def _line_ok(line: Column) -> Column:
        keep = F.regexp_count(line, F.lit(r"\S+")) >= min_words
        if terminal_punct is not None:
            keep = keep & line.rlike(terminal_punct + r"\s*$")
        if line_blocklist:
            keep = keep & ~_contains_any(F.lower(line), line_blocklist)
        return keep

    # The split array is referenced twice (size + filter); keeping it in
    # its own projection lets CollapseProject's duplicate-expensive-expr
    # guard preserve single evaluation of the split (the fused form the
    # round-5/7 plans paid twice for).
    base = src.select(
        F.col(id_col).alias("id"),
        # F.split takes a regex but reassembly re-inserts sep literally —
        # quote it so metacharacter separators split/rejoin consistently.
        F.split(t, F.lit(regex_literal(sep))).alias("arr"),
        doc_ok.alias("doc_ok"),
    ).select(
        "id",
        F.size("arr").cast("long").alias("n_lines"),
        F.filter("arr", _line_ok).alias("kept"),
        "doc_ok",
    )
    # The survivor predicate is evaluated as a PINNED COLUMN, not a bare
    # where(): substituted through the projections by predicate pushdown,
    # it re-inlines the whole line pass (split + lambda) into a second
    # evaluation — and, below a fan-out exchange, a serial one.  A
    # nondeterministic projection field blocks the substitution, so the
    # split and the higher-order filter each appear exactly once in the
    # physical plan (asserted in tests/test_quality_filter.py).
    survive = F.col("doc_ok") & (F.size("kept") >= min_kept_lines)
    return (
        base.withColumn("survive", _pin_above_exchange(survive))
        .where("survive")
        .select(
            "id",
            F.array_join("kept", sep).alias("text_clean"),
            "n_lines",
            F.size("kept").cast("long").alias("n_kept"),
        )
    )
