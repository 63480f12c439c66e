"""Query registry: every verification query (SURVEY.md §2.11) registered as
a (Spark callable, DuckDB oracle SQL) pair.

``QUERIES[name]`` is ``(spark, sf_dir) -> DataFrame``; ``ORACLE[name]`` is
ANSI SQL DuckDB runs over the same parquet fixtures.  Column names/aliases
match exactly between the two — the driver sorts columns by name before
hashing values.  Queries with no SQL-expressible oracle (streaming, LSH
internals) register with ``oracle=None`` and get a rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}

# Queries introduced AFTER the current round's 50-slot driver window
# saturated.  Tier-3 coverage contract, pinned by tests/test_registry.py:
# each entry must carry a hash oracle AND an in-suite differential test
# (the identical comparison the driver runs), and the NEXT round's window
# must lead with these names.  Round 13: the 26 r12 post-saturation
# queries (v135-v160) now LEAD the window per the pinned rotation, so
# this set is EMPTY — it refills only if round 13 registers queries
# after its own window saturates.
POST_WINDOW_NEW: frozenset[str] = frozenset()

# The r13 window held 26 first-driver-row queries + 24 refreshes, which
# left 16 r10-aged queries un-refreshed.  Those 16 (formerly
# ``R14_PINNED``) now LEAD round 14's window — see ``_reorder`` —
# executing the recipe pinned at r13 close exactly.
R14_PINNED: frozenset[str] = frozenset(
    {
        "v68_pii_scrub",
        "v69_decontaminate",
        "v73_stream_dedup",
        "v76_stream_upsert",
        "v91_lateral_topk",
        "v92_recursive_cte",
        "v93_xml_extract",
        "v94_salted_join",
        "v96_salted_asof",
        "v106_data_expectations",
        "v107_snapshot_diff",
        "v108_table_profile",
        "v112_bucketed_smb_join",
        "v113_null_aware_anti",
        "v114_correlated_max_order",
        "v115_profile_approx",
    }
)

# The r14 window = 16 R14_PINNED + 25 of the 34 planned r11-aged
# refills + 9 in-round-changed queries (v33/v89 — asof NULL
# predicate-semantics fix, the third asof caller v96 is pinned;
# v85/v86 — salted window/lag NULL-group row-loss fix; v124/v135 —
# incremental minmax struct-key NULL-group fix; v78 — paragraph-count
# size(NULL) sentinel fix; v157 — funnel NULL-ts fix, ADVICE r13;
# v95 — skew.py module residue, conservative re-verification).  That
# displaces NINE refills — v56, v57, v58, v65, v71, v72, v74, v90,
# v95, the nine highest-numbered of the planned 34 — and all but
# re-entering v95 land in the r11-aged residue.  These 18 names are
# PINNED to lead round 15's window; tests/test_registry.py derives the
# same set from the CORRECTNESS_r* ledger (latest driver row <= r11
# and outside this round's window) so the pin cannot drift.
#
# R15 RECIPE (assuming CORRECTNESS_r14 lands green on the current
# window): these 18 lead; the remaining 32 slots refill from the 44
# r12-aged queries (v33/v78/v85/v86/v89/v124 freshen to r14 this
# round, as do r11-aged v95 and r13-aged v135), lowest query number
# first — v11-v18, v31, v37-v39, v43, v61, v70, v75, v77, v79,
# v81-v84, v87, v88, v97-v99, v103-v105, v109, v110 — leaving the
# 12-query r12-aged residue (v111, v118, v122, v126-v134) to pin for
# r16; any in-round-changed query claiming a slot displaces the
# highest-numbered refill into that residue.
R15_PINNED: frozenset[str] = frozenset(
    {
        "v56_interleave",
        "v57_corpus_prep",
        "v58_cross_join",
        "v65_repetition_signals",
        "v71_dsir_importance",
        "v72_global_shuffle",
        "v74_domain_cap",
        "v90_q21_waiting_suppliers",
        "v100_srp_neardup",
        "v101_url_dedup",
        "v102_partition_pruning",
        "v116_q22_idle_customers",
        "v117_batched_ann",
        "v119_stream_outer_join",
        "v120_skewed_join_agg",
        "v121_bloom_filter_join",
        "v123_schema_evolution",
        "v125_stream_session_window",
    }
)


def register(name: str, oracle: str | None = None):
    """Decorator: add a query (and optionally its DuckDB oracle) to the
    registry."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def _load_all() -> None:
    # Import for side effects: each module registers its queries.
    from flowbyte_spark.queries import (  # noqa: F401
        batteries,
        batteries2,
        batteries3,
        connectors_q,
        extended,
        functions_q,
        session_q,
        llm,
        llm2,
        pipeline_q,
        pipeline2,
        quality_q,
        relational,
        relational2,
        relational3,
        relational4,
        round10b,
        round11,
        round12,
        round12b,
        round12c,
        scale_q,
        streaming_q,
        tier_a,
    )


_load_all()


def _reorder() -> None:
    """Deterministic driver-facing ordering.

    The driver's correctness sweep caps at 50 queries per round in
    dict-iteration order, so with 80+ registered queries we rotate which
    ones lead.  Policy (pinned by tests/test_registry.py via
    queries/_coverage.py): any query whose code changed in-round — at
    function granularity, transitively — must also sit inside the
    50-query window, so in-round rewrites always get an in-round driver
    row (the gap that shipped v34 broken in r3 and left v64/v65/v67
    unverified in r4).
    """
    # ROUND-14 WINDOW (executes the recipe pinned at r13 close —
    # VERDICT r13 "next round" #1):
    # (a) the 16 R14_PINNED r10-aged queries LEAD, lowest number first;
    # (b) refill with r11-aged queries, lowest query number first —
    # 33 of the planned 34 (v95, the highest-numbered, is displaced
    # into R15_PINNED) because
    # (c) v157 must re-verify in-round: its funnel operator changed
    # this round (ADVICE r13 NULL-timestamp equivalence fix), and
    # in-round-changed queries must sit inside the window.
    first = [
        # (a) r10-aged residue from the r13 rotation — must lead r14.
        "v68_pii_scrub",
        "v69_decontaminate",
        "v73_stream_dedup",
        "v76_stream_upsert",
        "v91_lateral_topk",
        "v92_recursive_cte",
        "v93_xml_extract",
        "v94_salted_join",
        "v96_salted_asof",
        "v106_data_expectations",
        "v107_snapshot_diff",
        "v108_table_profile",
        "v112_bucketed_smb_join",
        "v113_null_aware_anti",
        "v114_correlated_max_order",
        "v115_profile_approx",
        # (b) r11-aged refills (33 of 44; 11-query residue = R15_PINNED).
        "v01_scan",
        "v02_project_filter",
        "v03_agg_q1",
        "v04_join_agg",
        "v05_q3_top10",
        "v06_left_join_coalesce",
        "v07_semi_anti",
        "v08_theta_join",
        "v09_rollup",
        "v10_window_rank",
        "v27_text_quality",
        "v28_lang_id",
        "v29_token_count",
        "v30_fingerprint",
        "v34_range_join",
        "v36_grouping_sets",
        "v42_cube",
        "v46_array_funcs",
        "v47_null_conditional",
        "v50_window_battery",
        "v51_unpivot",
        "v52_string_agg",
        "v53_hash_split",
        "v54_pack_by_budget",
        "v55_stratified_sample",
        # (c) in-round-changed queries claim the remaining 9 slots (the
        # 9 highest-numbered planned refills — v56, v57, v58, v65, v71,
        # v72, v74, v90, v95 — are displaced; all but re-entering v95
        # join R15_PINNED): v157 (operators/funnel.py NULL-ts fix,
        # ADVICE r13); asof_join callers v33/v89 (operators/asof.py
        # NULL predicate-semantics fix; the third caller v96 is pinned
        # above); salted-window callers v85/v86 (operators/skew.py
        # NULL-group row-loss fix); v95 (skew.py module residue,
        # conservative re-verification); minmax-merge callers v124/v135
        # (operators/incremental.py struct-key NULL-group fix); v78
        # (operators/paragraphs.py size(NULL)=-1 count-sentinel fix).
        "v33_asof_join",
        "v78_paragraph_dedup",
        "v85_salted_window",
        "v86_salted_lag",
        "v89_asof_forward",
        "v95_two_phase_agg",
        "v124_incremental_minmax",
        "v135_incremental_minmax_pruned",
        "v157_funnel_analysis",
    ]
    # Runtime stays lenient (an import-time crash here would zero a whole
    # driver round); tests/test_registry.py asserts the list is exact.
    rest = sorted(k for k in QUERIES if k not in first)
    order = [k for k in first if k in QUERIES] + rest
    for mapping in (QUERIES, ORACLE):
        snapshot = {k: mapping[k] for k in order if k in mapping}
        mapping.clear()
        mapping.update(snapshot)


_reorder()
