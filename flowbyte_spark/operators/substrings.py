"""Exact-substring span deduplication (ExactSubstr; Lee et al. 2021,
"Deduplicating Training Data Makes Language Models Better").

Verbatim-copied spans (license boilerplate, quoted articles, mirrored
pages) survive document- and paragraph-level dedup whenever the
surrounding text differs; ExactSubstr removes every later copy of any
k-token substring that occurs more than once in the corpus.  The paper
builds a corpus-wide suffix array — inherently single-machine; the
distributed re-expression here is the standard k-gram rolling-window
form: every k-token window is keyed by its content, the globally first
occurrence (by id, then position) of each duplicated window is kept, and
tokens covered by any LATER occurrence of a duplicated window are
removed.  A span of j >= k copied tokens is covered by j-k+1 duplicate
windows, so whole copied regions vanish; spans shorter than k never
match a full window and are kept — k is exactly the paper's "minimum
match length".  The reference has no such capability (charter extension;
`src/flowbyte/sql.py` delegates all row logic to SQL Server).

Scale shape — linear shuffles only, no all-pairs anywhere:

1. token stream: tokenize once, pinned below a keyed fan-out on the doc
   id when under-parallel — ONE scan + ONE exchange serve every per-doc
   stage below through ReusedExchange (BASELINE.md round-5 finding 7;
   re-fused round 10 after branch-specific pushdown had split it into
   three scans).
2. windows: md5 of the space-joined k-token ``slice`` of the carried
   token array — sort-free whole-stage codegen (content-keyed, not a
   lossy 32-bit hash, so no false merges).
3. duplicated-window table: two stacked long-only HashAggregates —
   per (window, id) earliest position + count, then per window the
   lexicographic (id, pos) first occurrence via ``min``/``min_by`` —
   partial-aggregatable, so a boilerplate window repeated 10**9 times
   collapses to one candidate per map partition (v78's keep-first
   shape), and hash-mutable, so no sort of the window stream (the
   round-9 ``min(struct)`` form planned a SortAggregate).  Only windows
   with count > 1 survive, which is the table the full window stream
   joins against — at realistic dup rates it is orders of magnitude
   smaller than the corpus and AQE broadcasts it.
4. covered tokens: duplicate occurrences explode to their k covered
   positions (k-times blowup of DUPLICATED regions only) and aggregate
   to one position-set per doc — a small table that broadcasts back
   onto the token stream.
5. reassembly: one ``groupBy(id)`` over ALL tokens with the covered
   filter folded into the aggregate itself (``collect_list`` keeps the
   struct(pos, NULL) entries; ``array_join`` without nullReplacement
   then drops the nulled tokens), order restored by an ``array_sort`` of
   (pos, tok) structs.  Every doc keeps its group row, so fully
   deduplicated documents fall out as empty strings with no extra
   corpus pass and no final join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flowbyte_spark.functions import reassemble_in_order, regex_literal


def exact_substring_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 50,
    sep: str = " ",
    fan_out: bool | None = None,
) -> DataFrame:
    """Remove every later copy of any k-token substring duplicated
    corpus-wide; reassemble surviving tokens in order.

    A window occurrence ``(id, pos)`` is a duplicate iff the same
    k-token string occurs anywhere in the corpus at a smaller
    ``(id, pos)``.  Tokens covered by at least one duplicate window are
    dropped.  Documents shorter than ``k`` tokens have no windows and
    pass through whole.

    Returns one row per input document::

        (id, text_dedup, n_tokens, n_kept)

    NULL-text documents keep their row as ``(id, NULL, NULL, 0)``
    (round 15 — the r14 size(NULL) audit's deferred site): a NULL body
    has no tokens, which is distinct from the empty string's one empty
    token, and before this round such docs VANISHED from the output
    (``posexplode`` of a NULL array emits no rows — silent data loss
    for a corpus-rewrite operator).  ``posexplode_outer`` keeps the
    group row at zero extra corpus passes.

    Deterministic: independent of partitioning and input order.
    """
    if k < 2:
        raise ValueError("k must be >= 2 (a 1-token window dedups words)")
    sc = df.sparkSession.sparkContext
    # NULL ids are dropped up front (a doc id is the dedup identity; a
    # NULL one is undefined).  Also load-bearing for the plan: the dup
    # join infers isnotnull(id) on ONE branch of the shared corpus
    # subtree — filtering explicitly keeps all three branches' pushed
    # filter sets identical so their fan-out exchange is reused instead
    # of re-scanned (see below).
    src = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("t")).where(
        F.col("id").isNotNull()
    )
    # fan_out=None probes the plan (one plan->RDD conversion, ~0.2 s of
    # planning — BASELINE.md round-5 finding 6); callers that can read
    # scan metadata (scan_partitions) pass the decision in directly.
    if fan_out is None:
        fan_out = src.rdd.getNumPartitions() < sc.defaultParallelism
    # Tokenize ONCE, below the fan-out exchange, and PIN the split so
    # every downstream branch shares one scan + one exchange.  Unpinned,
    # each branch's inferred filters (posexplode's size(arr) > 0, the
    # wh join's isnotnull) substitute through the projection and push
    # below the exchange, specializing the three subtrees — round 9
    # planned THREE parquet scans and three fan-out exchanges of the
    # same corpus (r9 VERDICT #2).  The nondeterministic guard (same
    # trick as quality_filter._pin_above_exchange) blocks both the
    # substitution and the pushdown, so scan → split → exchange is
    # canonically identical across branches and physical planning folds
    # them into one Exchange + two ReusedExchange nodes.  F.split takes
    # a regex but array_join re-inserts sep literally — quote it so
    # metacharacter separators split/rejoin consistently.
    arr_pinned = F.when(
        F.monotonically_increasing_id() >= 0,  # always true: ids are >= 0
        F.split("t", F.lit(regex_literal(sep))),
    ).alias("arr")
    base = src.select("id", arr_pinned)
    if fan_out:
        base = base.repartition(sc.defaultParallelism, "id")
    # posexplode_outer + the isNotNull guard keep NULL-text docs: the
    # outer form emits one (pos=NULL, tok=NULL) row for a NULL array
    # where plain posexplode emits none (doc silently dropped), and the
    # guard stops the non-ANSI size(NULL) = -1 sentinel reaching
    # n_tokens (split() never returns NULL for non-NULL text, so the
    # guard is exactly the NULL-doc marker).
    toks = base.select(
        "id",
        F.when(F.col("arr").isNotNull(), F.size("arr"))
        .cast("long")
        .alias("n_tokens"),
        F.posexplode_outer("arr").alias("pos", "tok"),
    )

    # Window key from a slice of the carried token array — NOT k-1
    # ``lead`` expressions over a Window: the analytic form plans a sort
    # per branch (Window.partitionBy(id).orderBy(pos)) and its id
    # exchange prunes differently per consumer, defeating exchange
    # reuse; the slice form is sort-free whole-stage codegen (measured
    # 1.26 -> ~0.9 s at sf0.1, 5 -> 3 keyed exchanges in round 5).
    # The window key is pinned too: the dup equi-join infers
    # isnotnull(wh), and unpinned that predicate substitutes the md5
    # expression into a Filter below the Project — the slice + join +
    # md5 (the operator's dominant CPU) then runs TWICE per branch.
    # Pinned, the inferred filter stays an attribute test above the
    # Project and each branch computes the key exactly once.
    wh_pinned = F.when(
        F.monotonically_increasing_id() >= 0,
        F.md5(F.array_join(F.slice("arr", F.col("pos") + 1, k), sep)),
    ).alias("wh")
    wins = base.select(
        "id",
        F.size("arr").alias("n"),
        F.posexplode("arr").alias("pos", "tok"),
        F.col("arr"),
    ).where(F.col("pos") + k <= F.col("n")).select("id", "pos", wh_pinned)

    # Global first occurrence per duplicated window WITHOUT min(struct):
    # struct-valued aggregation buffers are not hash-mutable, so the r9
    # single-stage form planned a SortAggregate with a full double sort
    # of the window stream.  Two stacked long-only aggregates stay in
    # whole-stage-codegen HashAggregate with map-side partial combine:
    # (1) per (wh, id): earliest position + occurrence count — a
    # boilerplate window repeated 10**9 times still collapses per map
    # partition; (2) per wh: smallest id and — ids being unique within a
    # (wh) group after stage 1 — min_by picks that id's position, which
    # together ARE the lexicographic (id, pos) minimum.  Both stages'
    # buffers are plain longs (min_by(long, long) is hash-aggregatable;
    # probed on Spark 4.1).
    occ = wins.groupBy("wh", "id").agg(
        F.min("pos").alias("mp"), F.count(F.lit(1)).alias("c")
    )
    dup_firsts = (
        occ.groupBy("wh")
        .agg(
            F.min("id").alias("fid"),
            F.min_by("mp", "id").alias("fpos"),
            F.sum("c").alias("n"),
        )
        .where(F.col("n") > 1)
        .select("wh", "fid", "fpos")
    )
    dups = (
        wins.join(dup_firsts, "wh")
        .where((F.col("id") != F.col("fid")) | (F.col("pos") != F.col("fpos")))
        .select("id", "pos")
    )
    covered = dups.select(
        "id", F.explode(F.sequence(F.col("pos"), F.col("pos") + (k - 1))).alias("cpos")
    ).groupBy("id").agg(F.collect_set("cpos").alias("cov"))

    # The covered-position filter lives INSIDE the reassembly aggregate:
    # collect_list keeps the struct(pos, NULL) entries (the struct itself
    # is non-null) and it is array_join — called WITHOUT nullReplacement
    # inside reassemble_in_order — that drops the nulled-out tokens.
    # (Swapping array_join for concat_ws/transform would re-emit doubled
    # separators.)  Every document keeps a group row, so
    # fully-deduplicated docs fall out as empty strings without the
    # extra (id, n_tokens) branch + left join a where() would force —
    # one fewer pass over the corpus and no final join at all.
    not_cov = F.expr("cov IS NULL OR NOT array_contains(cov, pos)")
    # NULL-doc fixups (round 15): the posexplode_outer sentinel row has
    # pos=NULL, so n_kept's count must require a real position, and
    # text_dedup nulls out where n_tokens is NULL (reassembly of the
    # one all-NULL struct row would otherwise read as the empty string
    # — the fully-deduplicated-doc value, a different fact).
    return (
        toks.join(covered, "id", "left")
        .withColumn("tok", F.when(not_cov, F.col("tok")))
        .groupBy("id")
        .agg(
            reassemble_in_order("pos", "tok", sep).alias("__txt__"),
            F.first("n_tokens").alias("n_tokens"),
            F.count(F.when(not_cov & F.col("pos").isNotNull(), F.lit(1)))
            .cast("long")
            .alias("n_kept"),
        )
        .select(
            "id",
            F.when(F.col("n_tokens").isNotNull(), F.col("__txt__")).alias(
                "text_dedup"
            ),
            "n_tokens",
            "n_kept",
        )
    )
