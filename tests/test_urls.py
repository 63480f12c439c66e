"""URL canonicalization (operators/urls.py): rule-by-rule unit coverage."""

from __future__ import annotations

from pyspark.sql import functions as F

from flowbyte_spark.operators.urls import canonical_url, dedup_by_canonical_url


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [
        r.c for r in df.select(canonical_url(F.col("url")).alias("c")).collect()
    ]


def test_rules_unit(spark):
    got = _canon(spark, [
        "HTTPS://WWW.Example.COM:443/a/b/?utm_source=x&b=2&a=1#frag",
        "http://example.com:80",
        "http://example.com:8080/x",           # non-default port kept
        "https://example.com/x//",             # trailing slashes
        "https://example.com/?utm_source=x",   # query all-tracking
        "http://sub.www.example.com/x",        # www only stripped as PREFIX
        "not a url at all",
        "ftp://files.example.com/pub/",        # other schemes pass through
    ])
    assert got == [
        "https://example.com/a/b?a=1&b=2",
        "http://example.com/",
        "http://example.com:8080/x",
        "https://example.com/x",
        "https://example.com/",
        "http://sub.www.example.com/x",
        None,
        "ftp://files.example.com/pub",
    ]


def test_dedup_keep_first_and_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "http://a.com/x?b=2&a=1"),
            (2, "HTTP://WWW.A.com:80/x/?a=1&b=2#f"),
            (3, "https://a.com/x?a=1&b=2"),   # different scheme: distinct
            (4, "garbage"),                   # unparseable: dropped
        ],
        "id long, url string",
    )
    out = {
        r.canonical_url: (r.keeper_id, r.n_fetches)
        for r in dedup_by_canonical_url(df, "id", "url").collect()
    }
    assert out == {
        "http://a.com/x?a=1&b=2": (1, 2),
        "https://a.com/x?a=1&b=2": (3, 1),
    }


def test_plan_is_single_aggregation(spark):
    from flowbyte_spark import plans

    df = spark.createDataFrame([(1, "http://a.com/")], "id long, url string")
    out = dedup_by_canonical_url(df, "id", "url")
    plan = plans.physical_plan(out)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("HashAggregate") <= 4  # partial+final, no join back
