"""Registry invariants: the driver consumes QUERIES/ORACLE in dict order
with a 50-row cap, so ordering bugs ship silently — pin them here.
"""

from __future__ import annotations

import re

from flowbyte_spark.queries import ORACLE, QUERIES, _reorder


def test_rotation_head_names_all_exist():
    # A renamed query must fail HERE, not crash the driver's import.
    import inspect

    src = inspect.getsource(_reorder)
    listed = re.findall(r'"(v\d\d_\w+)"', src)
    assert listed, "rotation head list is empty?"
    missing = [n for n in listed if n not in QUERIES]
    assert not missing, f"rotation names not in registry: {missing}"
    # and the head actually leads the dict
    assert list(QUERIES)[: len(listed)] == listed


def test_every_oracle_has_a_query():
    assert set(ORACLE) <= set(QUERIES)


def test_driver_window_plus_r3_file_covers_everything():
    # Union-coverage contract: the first 50 (this round's driver window)
    # plus round 3's recorded rows must leave no query unverified.
    import json
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r3 = set(json.load(open(os.path.join(repo, "CORRECTNESS_r03.json"))))
    window = set(list(QUERIES)[:50])
    uncovered = set(QUERIES) - window - r3
    assert not uncovered, f"queries with no driver row in r3∪r4: {uncovered}"
