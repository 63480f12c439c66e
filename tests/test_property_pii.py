"""Property test: the PII patterns behave identically in Spark (Java
regex) and DuckDB (RE2) on adversarial inputs.

The v68 oracle pins behavior on fixture-derived strings; this generates
strings stuffed with near-misses (half-formed emails, over-long IP
octets, '+' runs, doubled '@', trailing dots) and asserts match COUNTS
and REDACTED OUTPUT agree engine-for-engine.  Any pattern edit that
introduces a construct the two regex dialects disagree on fails here
before it can ship a silent oracle divergence.
"""

from __future__ import annotations

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from flowbyte_spark.operators.text import PII_PATTERNS

# Fragments chosen to sit on the boundaries of each pattern.
_FRAGMENTS = st.sampled_from(
    [
        "a@b.io",
        "x.y+z@e-f.org",
        "@nope",
        "no@tld",
        "trail@dot.com.",
        "a@b.c",  # 1-char TLD: not a match
        "+1-555-0042",
        "+421-123-4567",
        "+1-23-4567",  # short middle group: no match
        "1-555-0042",  # no leading +: no match
        "10.0.0.1",
        "999.999.999.999",  # still 1-3 digit octets: matches by design
        "1.2.3",  # 3 octets: no match
        "256.1.1.1.1",
        " ",
        "..",
        "@@",
        "++",
        "word",
        "a1-b2",
        ".com",
    ]
)


@st.composite
def _texts(draw):
    parts = draw(st.lists(_FRAGMENTS, min_size=0, max_size=8))
    return " ".join(parts)


@settings(max_examples=60, deadline=None)
@given(_texts())
def test_pii_patterns_agree_with_re2(text):
    con = duckdb.connect()
    for _name, (pat, rep) in PII_PATTERNS.items():
        n_duck, scrubbed_duck = con.execute(
            "SELECT len(regexp_extract_all(?, ?)),"
            " regexp_replace(?, ?, ?, 'g')",
            [text, pat, text, pat, rep],
        ).fetchone()
        import re

        # Java regex semantics via re: both are leftmost, non-overlapping,
        # greedy — the python re module mirrors Java for this construct
        # class (no lookaround/backrefs/possessives in the patterns).
        n_java = len(re.findall(pat.replace("\\b", r"\b"), text))
        scrubbed_java = re.sub(pat, rep, text)
        assert n_java == n_duck, (pat, text)
        assert scrubbed_java == scrubbed_duck, (pat, text)


def test_pii_spark_matches_python_re(spark):
    """One Spark-side spot check over the same fragment inventory (the
    property loop above avoids a Spark job per example; this pins the
    Java engine itself on a batch of concatenated adversarial rows)."""
    import re

    from pyspark.sql import functions as F

    rows = [
        (i, s)
        for i, s in enumerate(
            [
                "a@b.io x.y+z@e-f.org @nope no@tld trail@dot.com.",
                "+1-555-0042 +421-123-4567 +1-23-4567 1-555-0042",
                "10.0.0.1 999.999.999.999 1.2.3 256.1.1.1.1",
                "a@b.c .com @@ ++ word",
            ]
        )
    ]
    df = spark.createDataFrame(rows, "id INT, t STRING")
    for name, (pat, rep) in PII_PATTERNS.items():
        got = {
            r["id"]: (r["n"], r["s"])
            for r in df.select(
                "id",
                F.regexp_count("t", F.lit(pat)).alias("n"),
                F.regexp_replace("t", pat, rep).alias("s"),
            ).collect()
        }
        for i, t in rows:
            assert got[i][0] == len(re.findall(pat, t)), (name, t)
            assert got[i][1] == re.sub(pat, rep, t), (name, t)
