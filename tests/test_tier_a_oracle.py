"""Oracle-differential tests for the Tier-A mutation queries (V17-V18)."""

from __future__ import annotations

import pytest

from tests.oracle_util import assert_query_matches


@pytest.mark.parametrize("name", ["v17_update_by_keys", "v18_insert_delete"])
def test_tier_a_query_matches_oracle(spark, sf_dir, name):
    assert_query_matches(spark, name, sf_dir)
