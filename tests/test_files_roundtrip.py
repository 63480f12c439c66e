"""File-format source/sink round-trips (sources/files.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flowbyte_spark.catalog import load_table
from flowbyte_spark.sources.files import read_table, write_table

SF = "/root/testdata/sf0.001"


def rows(df, key):
    return sorted(tuple(r) for r in df.select(*key).collect())


@pytest.mark.parametrize("fmt", ["parquet", "csv", "json", "orc"])
def test_roundtrip_preserves_rows(spark, tmp_path, fmt):
    src = load_table(spark, SF, "nation")
    path = str(tmp_path / f"nation_{fmt}")
    write_table(src, path, fmt=fmt)
    back = read_table(spark, path, fmt=fmt)
    cols = ["n_nationkey", "n_name", "n_regionkey"]
    # csv/json re-infer types; compare canonical string forms
    a = sorted(
        tuple(str(v) for v in r) for r in src.select(cols).collect()
    )
    b = sorted(
        tuple(str(v) for v in r) for r in back.select(cols).collect()
    )
    assert a == b


def test_partitioned_write_enables_pruning(spark, tmp_path):
    from flowbyte_spark import plans

    src = load_table(spark, SF, "orders")
    path = str(tmp_path / "orders_part")
    write_table(src, path, partition_by=["o_orderstatus"])
    back = read_table(spark, path).where(F.col("o_orderstatus") == "F")
    # partition pruning: only the o_orderstatus=F directory is scanned
    plan = plans.physical_plan(back)
    assert "PartitionFilters" in plan and "o_orderstatus" in plan
    expected = src.where(F.col("o_orderstatus") == "F").count()
    assert back.count() == expected


def test_unknown_format_rejected(spark):
    with pytest.raises(ValueError, match="unsupported format"):
        read_table(spark, "/nonexistent", fmt="avro")

def test_read_with_quarantine_splits_malformed(spark, tmp_path):
    """Malformed CSV/JSON rows land in the quarantine, clean rows parse —
    nothing dropped silently, nothing kills the job."""
    import os

    from flowbyte_spark.sources.files import read_with_quarantine

    jpath = str(tmp_path / "q.jsonl")
    with open(jpath, "w") as f:
        f.write('{"id": 1, "v": "a"}\n')
        f.write('{"id": 2, "v": "b"}\n')
        f.write('{oops not json\n')
        f.write('{"id": "NaNope", "v": 3}\n')  # type mismatch -> corrupt
    clean, quarantined = read_with_quarantine(
        spark, jpath, "json", "id BIGINT, v STRING"
    )
    assert sorted((r.id, r.v) for r in clean.collect()) == [(1, "a"), (2, "b")]
    q = [r._corrupt_record for r in quarantined.collect()]
    assert len(q) == 2 and any("oops" in x for x in q)

    cpath = str(tmp_path / "q.csv")
    with open(cpath, "w") as f:
        f.write("1,a\n")
        f.write("2,b,EXTRA,COLUMNS,HERE\n")
        f.write("notanint,c\n")
    clean, quarantined = read_with_quarantine(
        spark, cpath, "csv", "id BIGINT, v STRING"
    )
    assert sorted((r.id, r.v) for r in clean.collect()) == [(1, "a")]
    assert quarantined.count() == 2


def test_read_with_quarantine_cache_is_tracked(spark, tmp_path):
    """The split's backing cache registers with the repo's tracked-cache
    accounting (ADVICE r6: a raw .cache() leaked one persisted DF per
    call in long-lived sessions) — release_persisted() frees it."""
    from flowbyte_spark.operators import cache as cache_mod
    from flowbyte_spark.sources.files import read_with_quarantine

    jpath = str(tmp_path / "t.jsonl")
    with open(jpath, "w") as f:
        f.write('{"id": 1, "v": "a"}\n')
        f.write("{bad\n")
    cache_mod.release_persisted()  # clean slate
    clean, quarantined = read_with_quarantine(
        spark, jpath, "json", "id BIGINT, v STRING"
    )
    assert clean.count() == 1 and quarantined.count() == 1
    assert cache_mod.release_persisted() >= 1
