"""Oracle-differential tests for the round-2 pipeline queries (V64-V66)."""

from __future__ import annotations

import pytest

from tests.oracle_util import assert_query_matches

PIPELINE2 = [
    "v64_neardup_clusters",
    "v65_repetition_signals",
    "v66_scd2_merge",
    "v67_cluster_corpus_prep",
]


@pytest.mark.parametrize("name", PIPELINE2)
def test_pipeline2_query_matches_oracle(spark, sf_dir, name):
    assert_query_matches(spark, name, sf_dir)
