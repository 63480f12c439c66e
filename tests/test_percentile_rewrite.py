"""exact_group_percentiles must be BIT-identical to F.percentile.

The r16 optimization replaced v43's ObjectHashAggregate percentile with
the sort-based order-statistics form (operators/ordering.py).  The
driver gate is a value hash, so "close" is not enough: the interpolation
must reproduce Spark's own double arithmetic (weighted form
``lower*(1-f) + higher*f``; the algebraically equal ``lower +
(higher-lower)*f`` differs by an ulp on real data).  Cases cover ties,
single-row groups, exact-index percentiles (frac == 0), NULL values
inside a group, and an all-NULL group (absent from the sort-based
result by contract; the builtin twin row is NULL).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flowbyte_spark.operators.ordering import exact_group_percentiles

PCTS = [(0.5, "p50"), (0.9, "p90"), (0.99, "p99")]


def _builtin(df):
    pct = F.percentile("v", F.array(*[F.lit(p) for p, _ in PCTS]))
    return df.groupBy("g").agg(pct.alias("ps")).select(
        "g", *[F.col("ps")[i].alias(n) for i, (_, n) in enumerate(PCTS)]
    )


def _assert_match(spark, rows):
    df = spark.createDataFrame(rows, "g string, v double")
    want = {
        r["g"]: tuple(r[n] for _, n in PCTS)
        for r in _builtin(df).collect()
    }
    got = {
        r["g"]: tuple(r[n] for _, n in PCTS)
        for r in exact_group_percentiles(df, ["g"], "v", PCTS).collect()
    }
    for g, expected in want.items():
        if all(x is None for x in expected):
            # all-NULL group: absent by contract (callers re-join)
            assert g not in got
        else:
            assert got[g] == expected, (g, got[g], expected)


def test_bit_exact_vs_builtin(spark):
    rows = [
        # group with ties and a value spread that exercises interpolation
        *[("a", float(v)) for v in [1, 1, 2, 3, 3, 3, 10, 100, 1000, 12.34]],
        # single-row group: lower == higher, frac == 0 path
        ("b", 42.5),
        # two-row group: every percentile interpolates
        ("c", 1.1), ("c", 2.2),
        # NULLs inside a group are ignored, like the builtin
        ("d", None), ("d", 5.0), ("d", 7.0),
        # all-NULL group
        ("e", None),
        # 101 rows: p99 lands between indexes 99 and 100
        *[("f", float(i) * 1.07) for i in range(101)],
    ]
    _assert_match(spark, rows)


def test_bit_exact_on_fixture_prices(spark):
    from flowbyte_spark.catalog import load_table

    li = load_table(spark, "/root/testdata/sf0.01", "lineitem").select(
        F.col("l_returnflag").alias("g"), F.col("l_extendedprice").alias("v")
    )
    want = {r["g"]: tuple(r[n] for _, n in PCTS) for r in _builtin(li).collect()}
    got = {
        r["g"]: tuple(r[n] for _, n in PCTS)
        for r in exact_group_percentiles(li, ["g"], "v", PCTS).collect()
    }
    assert got == want
