"""operators/incremental.py: state + delta must equal a full rescan,
for any delta — including group-emptying deletes and group-creating
inserts.  (V118's oracle differential lives in test_llm2_oracle.py.)"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, example, given, settings, strategies as st
from pyspark.sql import functions as F

from flowbyte_spark.operators.incremental import (
    agg_state,
    incremental_minmax_update,
    incremental_update,
    merge_states,
    minmax_state,
)

# FB_HYP_EXAMPLES=200 runs the soak profile the round-15 audit used;
# the default stays CI-sized.
import os

SETTINGS = settings(
    max_examples=int(os.environ.get("FB_HYP_EXAMPLES", "12")),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# group key and measure may be None (round 14): groupBy puts NULL keys
# in one group, and the minmax merge joins must pair that group's
# state/insert/delete legs instead of dropping or splitting it — the
# raw-key full-outer join did exactly that before the struct-key fix.
row = st.tuples(
    st.one_of(st.none(), st.integers(min_value=0, max_value=4)),
    st.one_of(
        st.none(),
        st.floats(
            min_value=-1e6,
            max_value=1e6,
            allow_nan=False,
            allow_infinity=False,
        ),
    ),
)


def _df(spark, rows, start_id=0):
    return spark.createDataFrame(
        [
            (start_id + i, k, None if v is None else float(v))
            for i, (k, v) in enumerate(rows)
        ],
        "id long, k int, v double",
    )


def _canon(df):
    # r["__cnt__"]: Row.__getattr__ blocks dunder-prefixed names
    return sorted(
        (
            (
                r.k,
                r["__cnt__"],
                None if r.sum_v is None else float(r.sum_v),
                r["__nn_v__"],
            )
            for r in df.collect()
        ),
        key=str,
    )


@given(
    base=st.lists(row, max_size=30),
    ins=st.lists(row, max_size=15),
    del_keys=st.sets(st.integers(min_value=0, max_value=4)),
)
# Round-14 judge counterexample, pinned so it persists as a regression
# even though the hypothesis example database is gitignored (commit
# 38183ca): delete a group's only real value, insert a NULL-valued row
# for the same key — the group's sum must become NULL (SQL SUM over an
# all-NULL group), not the 0.0 the signed partials cancel to.
@example(base=[(3, 0.0)], ins=[(3, None)], del_keys={3})
# The converse leg: a group BORN all-NULL that later gains a real
# value must come back from NULL, not stay stuck at it.
@example(base=[(2, None)], ins=[(2, 1.5)], del_keys=set())
@SETTINGS
def test_incremental_equals_rescan(spark, base, ins, del_keys):
    base_df = _df(spark, base)
    inserts = _df(spark, ins, start_id=10_000)
    deletes = base_df.where(F.col("k").isin(list(del_keys)) if del_keys else F.lit(False))
    post = base_df.exceptAll(deletes).unionByName(inserts)

    state = agg_state(base_df, ["k"], ["v"])
    incremental = incremental_update(state, inserts, deletes, ["k"], ["v"])
    rescan = agg_state(post, ["k"], ["v"])
    assert _canon(incremental) == _canon(rescan)


def _canon_mm(df):
    return sorted(
        ((r.k, r["__cnt__"], r.min_v, r.max_v) for r in df.collect()),
        key=str,
    )


@given(
    base=st.lists(row, max_size=30),
    ins=st.lists(row, max_size=15),
    del_ids=st.sets(st.integers(min_value=0, max_value=29)),
)
@SETTINGS
def test_minmax_incremental_equals_rescan(spark, base, ins, del_ids):
    # Row-level deletes (not whole groups): the interesting cases are a
    # delete that removes the extremum row (targeted recompute must
    # fire) and one that doesn't (algebraic merge must suffice) — the
    # id-subset strategy generates both, plus duplicated-extremum ties.
    base_df = _df(spark, base)
    inserts = _df(spark, ins, start_id=10_000)
    deletes = base_df.where(
        F.col("id").isin(list(del_ids)) if del_ids else F.lit(False)
    )
    post = base_df.exceptAll(deletes).unionByName(inserts)

    state = minmax_state(base_df, ["k"], ["v"])
    incremental = incremental_minmax_update(
        state, post, inserts, deletes, ["k"], ["v"]
    )
    rescan = minmax_state(post, ["k"], ["v"])
    assert _canon_mm(incremental) == _canon_mm(rescan)


def test_minmax_safe_delete_merges_without_touching_fact(spark):
    # A delete that does NOT tie the extremum must resolve purely from
    # state+delta: pass a poisoned fact (wrong values) and assert the
    # output still matches the algebraic merge — proof no fact scan
    # happened for the safe group.
    base = _df(spark, [(1, 1.0), (1, 5.0), (1, 9.0)])
    deletes = base.where(F.col("v") == 5.0)
    poisoned_fact = _df(spark, [(1, -777.0)], start_id=500)
    out = incremental_minmax_update(
        minmax_state(base, ["k"], ["v"]),
        poisoned_fact,
        _df(spark, [], start_id=99),
        deletes,
        ["k"],
        ["v"],
    )
    assert _canon_mm(out) == [(1, 2, 1.0, 9.0)]


def test_minmax_extremum_delete_recomputes_only_that_group(spark):
    base = _df(spark, [(1, 1.0), (1, 5.0), (2, 3.0), (2, 4.0)])
    deletes = base.where((F.col("k") == 1) & (F.col("v") == 1.0))
    post = base.exceptAll(deletes)
    out = incremental_minmax_update(
        minmax_state(base, ["k"], ["v"]),
        post,
        _df(spark, [], start_id=99),
        deletes,
        ["k"],
        ["v"],
    )
    assert _canon_mm(out) == [(1, 1, 5.0, 5.0), (2, 2, 3.0, 4.0)]


def test_chained_merges_keep_null_sum_semantics(spark):
    # The NULL guard must survive CHAINED merges: a state whose sum is
    # already NULL (nn=0) is an input to the next delta merge, where
    # F.sum skips the NULL leg — correct only because the nn partial
    # carries what the skipped leg lost.  Chain: group 1 born all-NULL
    # -> stays NULL after an unrelated delta -> comes back with a real
    # insert -> returns to NULL when the real rows are deleted.
    base = _df(spark, [(1, None), (1, None), (2, 5.0)])
    s0 = agg_state(base, ["k"], ["v"])
    empty = _df(spark, [], start_id=90)
    # merge 1: unrelated delta (group 2 only)
    s1 = incremental_update(
        s0, _df(spark, [(2, 1.0)], start_id=100), empty, ["k"], ["v"]
    )
    rows = {r.k: (r["__cnt__"], r.sum_v, r["__nn_v__"]) for r in s1.collect()}
    assert rows[1] == (2, None, 0)
    # merge 2: group 1 gains a real value
    ins2 = _df(spark, [(1, 7.0)], start_id=200)
    s2 = incremental_update(s1, ins2, empty, ["k"], ["v"])
    rows = {r.k: (r["__cnt__"], float(r.sum_v), r["__nn_v__"]) for r in s2.collect()}
    assert rows[1] == (3, 7.0, 1)
    # merge 3: delete that real row again -> back to NULL, group survives
    s3 = incremental_update(s2, empty, ins2, ["k"], ["v"])
    rows = {r.k: (r["__cnt__"], r.sum_v, r["__nn_v__"]) for r in s3.collect()}
    assert rows[1] == (2, None, 0)


def test_emptied_group_vanishes_exactly(spark):
    base = _df(spark, [(1, 0.1), (1, 0.2), (2, 5.0)])
    deletes = base.where(F.col("k") == 1)
    state = agg_state(base, ["k"], ["v"])
    out = incremental_update(
        state, _df(spark, [], start_id=99), deletes, ["k"], ["v"]
    )
    rows = out.collect()
    # group 1 fully deleted: no zero-count residue row survives (the
    # exact-decimal sums cancel to 0 with the count)
    assert [r.k for r in rows] == [2]


def test_agg_state_rejects_bad_sign(spark):
    df = _df(spark, [(1, 1.0)])
    with pytest.raises(ValueError, match="sign"):
        agg_state(df, ["k"], ["v"], sign=2)
    with pytest.raises(ValueError, match="no states"):
        merge_states([], ["k"])


def test_partition_col_prunes_recompute_scan(spark, tmp_path):
    # The partition_col path must reach the fact scan as a STATIC
    # partition filter: deletes hit extrema only in kb=0, so the
    # recompute leg may read ONLY that partition (round-12 soak
    # demonstrated the same at 480M rows; this pins the plan shape).
    from flowbyte_spark.operators.partitions import file_scan_stats

    fact = spark.createDataFrame(
        [(i % 8, (i % 8) // 4, float(i)) for i in range(64)],
        "k long, kb int, v double",
    )
    path = str(tmp_path / "fact")
    fact.repartition("kb").write.partitionBy("kb").parquet(path)
    pre = spark.read.parquet(path)
    state = minmax_state(pre, ["kb", "k"], ["v"])
    # delete the min row of group k=0 (kb=0) — the only unsafe group
    dels = pre.where((F.col("k") == 0) & (F.col("v") == 0.0))
    ins = spark.createDataFrame([], "k long, kb int, v double")
    post_pdf = (
        pre.where(~((F.col("k") == 0) & (F.col("v") == 0.0)))
    )
    post_path = str(tmp_path / "post")
    post_pdf.repartition("kb").write.partitionBy("kb").parquet(post_path)
    post = spark.read.parquet(post_path)
    out = incremental_minmax_update(
        state, post, ins, dels, ["kb", "k"], ["v"], partition_col="kb"
    )
    rows = {
        (r["kb"], r["k"]): (r["__cnt__"], r["min_v"], r["max_v"])
        for r in out.collect()
    }
    assert rows[(0, 0)] == (7, 8.0, 56.0)  # min recomputed from the fact
    scans = [
        s
        for s in file_scan_stats(out)
        if "post" in (s["location"] or "")
    ]
    assert scans, "recompute fact scan missing from the executed plan"
    assert scans[0]["num_partitions"] == 1, scans
    assert "kb" in (scans[0]["partition_filters"] or ""), scans


def test_partition_col_must_be_a_key(spark):
    df = spark.createDataFrame([(1, 1, 1.0)], "k long, kb int, v double")
    with pytest.raises(ValueError, match="partition_col"):
        incremental_minmax_update(
            df, df, df, df, ["k"], ["v"], partition_col="kb"
        )
