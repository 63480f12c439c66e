"""C4 quality filter: rule-by-rule unit coverage + a DuckDB differential
over the fixture corpus (same canonicalized-multiset comparison the
driver's oracle harness uses)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from flowbyte_spark.catalog import load_table
from flowbyte_spark.operators.quality_filter import c4_quality_filter
from tests.oracle_util import canon, duckdb_conn

SF = "/root/testdata/sf0.01"


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "id long, text string")
    out = c4_quality_filter(df, "id", "text", **kw)
    return {r.id: (r.text_clean, r.n_lines, r.n_kept) for r in out.collect()}


GOOD = "one two three four five.\nsix seven eight nine ten!\nmore good words here too?"


def test_rules_unit(spark):
    rows = [
        (1, GOOD),  # 3 kept lines -> survives intact
        # terminal punctuation: middle line lacks it -> dropped -> doc
        # falls below min_kept_lines
        (2, GOOD.replace("ten!", "ten")),
        # word floor: trailing short line dropped, doc keeps 3 of 4
        (3, GOOD + "\ntoo short."),
        # line blocklist is case-insensitive
        (4, GOOD.replace("nine", "JavaScript")),
        # page blocklist: whole doc gone
        (5, GOOD + "\nlorem IPSUM."),
        (6, GOOD.replace("seven", "{")),
    ]
    out = _run(spark, rows, min_words=5)
    assert out[1] == (GOOD, 3, 3)
    assert 2 not in out  # 2 kept < 3
    assert out[3] == (GOOD, 4, 3)
    assert 4 not in out
    assert 5 not in out and 6 not in out


def test_punct_rule_optional_and_trailing_space(spark):
    rows = [(1, "a b c d e.   \nf g h i j?\nk l m n o!")]
    # terminal punct may be followed by trailing whitespace
    assert _run(spark, rows)[1][2] == 3
    # disabling the rule keeps unpunctuated lines
    rows2 = [(1, "a b c d e\nf g h i j\nk l m n o")]
    assert _run(spark, rows2, terminal_punct=None)[1][2] == 3
    assert 1 not in _run(spark, rows2)


# --- differential vs DuckDB on the fixture corpus ------------------------
# The fixture is single-line word soup, so both engines first decorate it
# deterministically (the v78 convention): chunk every 4th word boundary
# into a newline, give ~half the lines a terminal '.' (md5-parity of the
# line), and append ' {' to ~1/16 of documents (md5-parity of the text) so
# the page blocklist discriminates.  Every rule then has live kill paths:
# punctuation (~half the lines), word floor (ragged tail lines), line
# blocklist ('slow' is a fixture word), page blocklist, and the
# min-kept-lines floor.

_CHUNK_RE = r"((?:\S+ ){3}\S+) "
_NL = "\n"


def _decorated_spark(spark):
    docs = load_table(spark, SF, "documents").select(
        "doc_id", F.regexp_replace("text", _CHUNK_RE, "$1\n").alias("pt")
    )
    lines = F.transform(
        F.split("pt", _NL),
        lambda x: F.concat(
            x,
            F.when(F.substring(F.md5(x), 1, 1) < F.lit("8"), F.lit(".")).otherwise(
                F.lit("")
            ),
        ),
    )
    t1 = F.array_join(lines, _NL)
    t2 = F.concat(
        t1,
        F.when(F.substring(F.md5(t1), 1, 1) == F.lit("0"), F.lit(" {")).otherwise(
            F.lit("")
        ),
    )
    return docs.select("doc_id", t2.alias("text"))


_ORACLE = rf"""
WITH chunked AS (
    SELECT doc_id,
           regexp_replace(text, '{_CHUNK_RE}', '\1' || chr(10), 'g') AS pt
    FROM documents),
decorated AS (
    SELECT doc_id,
           array_to_string(
               list_transform(string_split(pt, chr(10)),
                   x -> x || CASE WHEN substring(md5(x), 1, 1) < '8'
                                  THEN '.' ELSE '' END),
               chr(10)) AS t1
    FROM chunked),
doc AS (
    SELECT doc_id,
           t1 || CASE WHEN substring(md5(t1), 1, 1) = '0'
                      THEN ' {{' ELSE '' END AS text
    FROM decorated),
pages AS (
    SELECT doc_id, text FROM doc
    WHERE NOT contains(lower(text), 'lorem ipsum')
      AND NOT contains(lower(text), '{{')),
lines AS (
    SELECT doc_id,
           len(string_split(text, chr(10))) AS n_lines,
           unnest(range(0, len(string_split(text, chr(10))))) AS pos,
           unnest(string_split(text, chr(10))) AS line
    FROM pages),
kept AS (
    SELECT * FROM lines
    WHERE len(regexp_extract_all(line, '\S+')) >= 4
      AND regexp_matches(line, '[.!?"]\s*$')
      AND NOT contains(lower(line), 'slow'))
SELECT doc_id AS id,
       string_agg(line, chr(10) ORDER BY pos) AS text_clean,
       CAST(any_value(n_lines) AS BIGINT) AS n_lines,
       CAST(COUNT(*) AS BIGINT) AS n_kept
FROM kept GROUP BY doc_id HAVING COUNT(*) >= 3
"""


def test_differential_vs_duckdb(spark):
    eng = c4_quality_filter(
        _decorated_spark(spark),
        "doc_id",
        "text",
        min_words=4,
        line_blocklist=("slow",),
    ).toPandas()
    con = duckdb_conn(SF)
    oracle = con.execute(_ORACLE).fetchdf()
    con.close()
    # both rule tiers must discriminate on the fixture, or the test is
    # vacuous: some docs dropped, some lines dropped within survivors
    assert 0 < len(eng) < 500
    assert (eng["n_kept"] < eng["n_lines"]).any()
    assert canon(eng) == canon(oracle)


def test_differential_is_not_vacuous_on_rules(spark):
    """Each individually-disabled rule must change the survivor set —
    proof every rule has a live kill path on the decorated fixture."""
    base = _decorated_spark(spark)
    kw = dict(min_words=4, line_blocklist=("slow",))
    def survivors(**over):
        out = c4_quality_filter(base, "doc_id", "text", **dict(kw, **over))
        return {r.id: r.n_kept for r in out.collect()}

    ref = survivors()
    assert ref != survivors(min_words=0)
    assert ref != survivors(line_blocklist=())
    assert ref != survivors(terminal_punct=None)
    assert ref != survivors(doc_blocklist=("lorem ipsum",))
    assert ref != survivors(min_kept_lines=1)


def test_page_filter_modes_agree(spark):
    """Early scan-side page filter and the carried post-agg verdict are
    the same operator semantics — both modes must return identical rows."""
    base = _decorated_spark(spark)
    kw = dict(min_words=4, line_blocklist=("slow",))
    early = c4_quality_filter(
        base, "doc_id", "text", early_page_filter=True, **kw
    ).collect()
    carried = c4_quality_filter(
        base, "doc_id", "text", early_page_filter=False, **kw
    ).collect()
    assert sorted(map(tuple, early)) == sorted(map(tuple, carried))
    assert len(early) > 0


def test_plan_shape(spark):
    from flowbyte_spark import plans

    # MAP-ONLY contract (round-8 rework): the line pass runs array-side
    # (higher-order filter + array_join), so the operator introduces no
    # aggregate, no explode, and no shuffle beyond the under-parallel
    # fan-out — and the split/lambda each appear EXACTLY once (predicate
    # pushdown used to substitute the survivor filter through the
    # projections, evaluating the whole line pass twice).
    df = c4_quality_filter(load_table(spark, SF, "documents"), "doc_id", "text")
    plan = plans.physical_plan(df)
    assert plans.shuffle_exchanges(df) == 1, plan  # keyed fan-out only
    assert "RoundRobinPartitioning" not in plan, plan
    assert "Aggregate" not in plan and "Generate" not in plan, plan
    assert plan.count("lambdafunction") == 1, plan
    assert plan.count("split(") == 1, plan
    # already-parallel input: the operator adds NO exchange at all (the
    # round-robin below is the input's own repartition)
    wide = c4_quality_filter(
        load_table(spark, SF, "documents").repartition(64), "doc_id", "text"
    )
    wide_plan = plans.physical_plan(wide)
    assert plans.shuffle_exchanges(wide) == 0, wide_plan
    assert wide_plan.count("RoundRobinPartitioning") == 1, wide_plan
    assert "Aggregate" not in wide_plan and "Generate" not in wide_plan
    assert wide_plan.count("lambdafunction") == 1, wide_plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# --- property test vs a sequential reference ------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# tiny vocab with punctuation and blocklist markers mixed in, so every
# rule trips regularly; docs are small line lists
_word = st.sampled_from(["aa", "bb.", "x", "javascript", "{", "lorem", "ipsum"])
_line = st.lists(_word, min_size=0, max_size=6).map(" ".join)
_corpus = st.lists(st.lists(_line, min_size=1, max_size=4), min_size=1, max_size=4)

_SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _reference(corpus, min_words=2, min_kept=1):
    import re

    out = {}
    for doc_id, doc_lines in enumerate(corpus):
        text = "\n".join(doc_lines)
        low = text.lower()
        if "lorem ipsum" in low or "{" in low:
            continue
        kept = [
            ln
            for ln in doc_lines
            if len(re.findall(r"\S+", ln)) >= min_words
            and re.search(r'[.!?"]\s*$', ln)
            and "javascript" not in ln.lower()
        ]
        if len(kept) >= min_kept:
            out[doc_id] = ("\n".join(kept), len(doc_lines), len(kept))
    return out


@given(_corpus)
@_SETTINGS
def test_matches_sequential_reference(spark, corpus):
    df = spark.createDataFrame(
        [(i, "\n".join(lines)) for i, lines in enumerate(corpus)],
        "doc_id INT, text STRING",
    )
    got = {
        r.id: (r.text_clean, r.n_lines, r.n_kept)
        for r in c4_quality_filter(
            df, "doc_id", "text", min_words=2, min_kept_lines=1
        ).collect()
    }
    assert got == _reference(corpus)
