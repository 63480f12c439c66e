"""operators/funnel.py: variant equivalence + the hot-user skew brake.

VERDICT r12 "What's wrong" #1: the one-pass array funnel buffered
unbounded per-user arrays.  The contract now: the ``array`` variant's
``max_events_per_user`` brake FIRES on a hot key (fail-loud, naming the
user), and the ``staged`` variant — bounded state per key at every
step — returns the same answer on the same corpus.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from flowbyte_spark.operators.funnel import funnel_counts

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ev(user, etype, minutes):
    return (user, etype, T0 + dt.timedelta(minutes=minutes))


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        # user 1: full funnel (view 0h, click +1h, purchase +2h)
        _ev(1, "view", 0), _ev(1, "click", 60), _ev(1, "purchase", 180),
        # user 2: view + click, purchase too late (>24h after click)
        _ev(2, "view", 0), _ev(2, "click", 30),
        _ev(2, "purchase", 30 + 25 * 60),
        # user 3: click BEFORE view — stage 2 must not match
        _ev(3, "click", 0), _ev(3, "view", 60),
        # user 4: view only
        _ev(4, "view", 10),
        # user 11 (same segment as 1): click at exactly +12h (inclusive)
        _ev(11, "view", 0), _ev(11, "click", 12 * 60),
        # user 12: second view earlier than first click — anchor is MIN
        _ev(12, "view", 100), _ev(12, "view", 0), _ev(12, "click", 30),
        # noise the type filter must drop
        (1, "scroll", T0),
        # NULL timestamps (ADVICE r13): an unstamped event matches no
        # stage in EITHER variant — user 5 (view is NULL-ts only) must
        # vanish entirely, and user 1's NULL-ts click must not perturb
        # the real conversion.  Without the shared ts-NOT-NULL filter
        # the staged variant's groupBy-min would emit user 5 with
        # t1=NULL while the array variant drops them: variant split.
        (5, "view", None),
        (1, "click", None),
        # NULL users (ADVICE r14): unattributed events belong to no
        # per-user funnel and must vanish in BOTH variants.  Without
        # the shared user-NOT-NULL filter this full in-window sequence
        # converts in the array variant (groupBy pools every NULL user
        # into one synthetic key) while the staged variant's equi-joins
        # on user_id never advance it past stage 1: variant split, and
        # a phantom segment-NULL row in the output.
        (None, "view", T0),
        (None, "click", T0 + dt.timedelta(minutes=30)),
        (None, "purchase", T0 + dt.timedelta(minutes=90)),
    ]
    return spark.createDataFrame(
        rows, "user_id bigint, event_type string, ts timestamp"
    )


EXPECTED = {
    # segment -> (n_view, n_click, n_purchase); segment = user_id % 10
    1: (2, 2, 1),  # users 1 and 11 convert view->click; only 1 buys
    2: (2, 2, 0),  # users 2 and 12 (12 % 10 = 2) convert view->click
    3: (1, 0, 0),
    4: (1, 0, 0),
}


def _as_dict(df):
    return {
        r["segment"]: (r["n_view"], r["n_click"], r["n_purchase"])
        for r in df.collect()
    }


def test_array_and_staged_variants_agree(corpus):
    seg = F.col("user_id") % 10
    arr = _as_dict(funnel_counts(corpus, segment=seg, variant="array"))
    staged = _as_dict(funnel_counts(corpus, segment=seg, variant="staged"))
    assert arr == EXPECTED
    assert staged == EXPECTED


def test_array_brake_fires_on_hot_user(spark, corpus):
    # One bot owns ~50x the cap; the brake must fail LOUD (not OOM, not
    # silently degrade) and the error must name the knob and the hatch.
    bot = spark.range(500).select(
        F.lit(7).alias("user_id"),
        F.lit("click").alias("event_type"),
        (F.lit(T0) + F.make_interval(mins=F.col("id"))).alias("ts"),
    )
    skewed = corpus.unionByName(bot)
    with pytest.raises(Exception) as exc:
        funnel_counts(
            skewed,
            segment=F.col("user_id") % 10,
            variant="array",
            max_events_per_user=50,
        ).collect()
    msg = str(exc.value)
    assert "max_events_per_user=50" in msg
    assert "user 7" in msg
    assert "staged" in msg


def test_staged_variant_handles_hot_user_flat(spark, corpus):
    # The staged form's per-key state is one MIN per stage — the same
    # bot that trips the array brake must flow through and convert
    # (bot user 7: no view -> not even an anchor; bot user 5 with a
    # view converts on its first in-window click).
    bot = spark.range(2000).select(
        F.lit(5).alias("user_id"),
        F.lit("click").alias("event_type"),
        (F.lit(T0) + F.make_interval(mins=F.col("id") + 1)).alias("ts"),
    )
    anchor = spark.createDataFrame(
        [_ev(5, "view", 0)], "user_id bigint, event_type string, ts timestamp"
    )
    skewed = corpus.unionByName(bot).unionByName(anchor)
    out = _as_dict(
        funnel_counts(skewed, segment=F.col("user_id") % 10, variant="staged")
    )
    expected = dict(EXPECTED)
    expected[5] = (1, 1, 0)
    assert out == expected


def test_array_brake_waivable(corpus):
    # max_events_per_user=None deliberately waives the guard.
    out = _as_dict(
        funnel_counts(
            corpus,
            segment=F.col("user_id") % 10,
            variant="array",
            max_events_per_user=None,
        )
    )
    assert out == EXPECTED


def test_staged_funnel_has_no_collect_list(corpus):
    # The escape hatch must never buffer a key's events: no
    # ObjectHashAggregate/collect_list in the plan.
    df = funnel_counts(corpus, segment=F.col("user_id") % 10, variant="staged")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "collect_list" not in plan, plan


# ---------------------------------------------------------------------------
# Property: the two physical forms are the SAME operator.  Random event
# sets (few users/instants so stage collisions, ties, and out-of-order
# arrivals are guaranteed) must produce identical per-segment counts
# from the array walk and the staged min-joins, and both must match a
# sequential Python reference of the funnel contract.
# ---------------------------------------------------------------------------
from hypothesis import HealthCheck, given, settings as _settings
from hypothesis import strategies as st

# user may be None (ADVICE r14): a generator that never emits NULL
# users could not catch the variant split where groupBy pools NULL
# users into one synthetic converting key while the staged equi-joins
# never advance them past stage 1.
_EV = st.tuples(
    st.one_of(st.none(), st.integers(0, 3)),   # user; None = NULL user
    st.sampled_from(["view", "click", "purchase"]),
    st.one_of(st.none(), st.integers(0, 40)),  # hours offset; None = NULL ts
)
_SETTINGS = _settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _py_funnel(rows):
    # sequential reference: first view; first click in (t1, t1+12h];
    # first purchase in (t2, t2+24h].  NULL-ts and NULL-user events
    # (predicate semantics, ADVICE r13/r14) are outside the contract —
    # dropped before matching.
    rows = [(u, t, h) for u, t, h in rows if h is not None and u is not None]
    out = {}
    users = {u for u, _, _ in rows}
    for u in users:
        views = sorted(h for uu, t, h in rows if uu == u and t == "view")
        if not views:
            continue
        t1 = views[0]
        clicks = sorted(
            h for uu, t, h in rows
            if uu == u and t == "click" and t1 < h <= t1 + 12
        )
        t2 = clicks[0] if clicks else None
        t3 = None
        if t2 is not None:
            purchases = sorted(
                h for uu, t, h in rows
                if uu == u and t == "purchase" and t2 < h <= t2 + 24
            )
            t3 = purchases[0] if purchases else None
        seg = u % 10
        n1, n2, n3 = out.get(seg, (0, 0, 0))
        out[seg] = (
            n1 + 1,
            n2 + (t2 is not None),
            n3 + (t3 is not None),
        )
    return out


@given(rows=st.lists(_EV, min_size=1, max_size=25))
@_SETTINGS
def test_funnel_variants_agree_with_reference(spark, rows):
    df = spark.createDataFrame(
        [
            (u, t, None if h is None else T0 + dt.timedelta(hours=h))
            for u, t, h in rows
        ],
        "user_id bigint, event_type string, ts timestamp",
    )
    expected = _py_funnel(rows)
    seg = F.col("user_id") % 10
    arr = _as_dict(funnel_counts(df, segment=seg, variant="array"))
    staged = _as_dict(funnel_counts(df, segment=seg, variant="staged"))
    assert arr == expected
    assert staged == expected
