"""The bench's driver contract, end-to-end (VERDICT r16 #2).

Round 15's BENCH artifact was unusable to the driver (`prev_bench_ok:
false` — the captured one-line JSON failed its parse) and nothing
in-repo guarded against it, so the round-over-round baseline was lost.
These tests pin the contract at both granularities:

- unit: `scripts/check_bench_artifact.py`'s validator accepts the good
  shape and rejects each failure mode (truncated JSON, missing metric,
  value drift between the primary line and the reversed copy);
- end-to-end: a real `bench.py` subprocess run (one query, sf0.001,
  fresh JVM) honors $SPARK_GRAFT_SF_DIR / $SPARK_GRAFT_CPUS /
  $SPARK_GRAFT_BENCH_ONLY and prints stdout whose primary line
  round-trips through json.loads with the documented fields.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from check_bench_artifact import check_lines  # noqa: E402

GOOD_PRIMARY = json.dumps(
    {
        "metric": "sum_of_median_query_seconds",
        "value": 1.23,
        "unit": "sec",
        "queries": {"v01_scan": 1.23},
        "sf": 0.001,
        "substrate_probe_sec": 0.1,
    },
    separators=(",", ":"),
)
GOOD_COPY = json.dumps(
    {
        "metric": "sum_of_median_query_seconds_reversed_copy",
        "value": 1.23,
        "unit": "sec",
        "order": "reversed",
        "queries": {"v01_scan": 1.23},
        "sf": 0.001,
    },
    separators=(",", ":"),
)


def test_validator_accepts_the_good_shape():
    primary, copy = check_lines(["noise\n", GOOD_PRIMARY, GOOD_COPY])
    assert primary["value"] == 1.23
    assert copy is not None


def test_validator_rejects_truncated_json():
    # The r15 failure mode: a brace-led line the driver cannot parse.
    with pytest.raises(ValueError, match="json.loads"):
        check_lines([GOOD_PRIMARY[: len(GOOD_PRIMARY) // 2]])


def test_validator_rejects_missing_primary():
    with pytest.raises(ValueError, match="no line with metric"):
        check_lines([GOOD_COPY])


def test_validator_rejects_copy_drift():
    drifted = GOOD_COPY.replace("1.23", "9.99")
    with pytest.raises(ValueError, match="reversed-copy value"):
        check_lines([GOOD_PRIMARY, drifted])


def test_validator_rejects_failed_query_sentinel_type():
    bad = GOOD_PRIMARY.replace("1.23}", '"broken"}').replace(
        '"v01_scan":1.23', '"v01_scan":"broken"'
    )
    with pytest.raises(ValueError):
        check_lines([bad])


def test_bench_subprocess_honors_env_and_prints_parseable_json(tmp_path):
    """One-query bench run in a fresh JVM: the full driver contract.

    bench.py is copied into tmp_path so its BENCH_ONLY.json side artifact
    lands there instead of clobbering the repo's tracked copy; the engine
    imports resolve via PYTHONPATH.
    """
    sf_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(sf_dir):
        pytest.skip("sf0.001 fixtures unavailable")
    shutil.copyfile(
        os.path.join(REPO, "bench.py"), tmp_path / "bench.py"
    )
    env = dict(os.environ)
    env.update(
        {
            "PYTHONPATH": REPO + os.pathsep + env.get("PYTHONPATH", ""),
            "SPARK_GRAFT_SF_DIR": sf_dir,
            "SPARK_GRAFT_CPUS": "4",
            "SPARK_GRAFT_BENCH_ONLY": "v01_scan",
            "SPARK_GRAFT_BENCH_RUNS": "1",
            "SPARK_GRAFT_BENCH_WARMUPS": "0",
        }
    )
    proc = subprocess.run(
        [sys.executable, str(tmp_path / "bench.py")],
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
        cwd=tmp_path,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    # The stdout contract itself — exactly what the driver parses.
    primary, copy = check_lines(proc.stdout.splitlines())
    assert primary["sf"] == 0.001  # $SPARK_GRAFT_SF_DIR honored
    assert list(primary["queries"]) == ["v01_scan"]  # BENCH_ONLY honored
    assert primary["queries"]["v01_scan"] > 0
    assert copy is not None
    # Subset runs must write BENCH_ONLY.json, never BENCH_FULL.json.
    assert (tmp_path / "BENCH_ONLY.json").exists()
    assert not (tmp_path / "BENCH_FULL.json").exists()
    only = json.loads((tmp_path / "BENCH_ONLY.json").read_text())
    assert only["queries"]["v01_scan"] == primary["queries"]["v01_scan"]


def test_session_factory_honors_cpus_env():
    """$SPARK_GRAFT_CPUS must reach the master line (the driver re-runs
    the bench at a lower core count to measure scaling; a hard-coded
    master would silently void that measurement).  Fresh subprocess so
    the session-wide singleton in this suite's JVM is untouched."""
    env = dict(os.environ)
    env.pop("SPARK_GRAFT_MASTER", None)
    env["SPARK_GRAFT_CPUS"] = "3"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [
            sys.executable,
            "-c",
            "from flowbyte_spark.session import get_spark;"
            "s = get_spark(app_name='cpus-contract');"
            "print('MASTER=' + s.sparkContext.master)",
        ],
        capture_output=True,
        text=True,
        timeout=300,
        env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "MASTER=local[3]" in proc.stdout
