"""Compare BENCH_FULL.json against a same-day DuckDB baseline log.

Prints the three headline numbers the round verdicts use — all-in
ratio, batch-comparable ratio (the 14 streaming rows excluded: their
walls are per-trigger state-store constants with no DuckDB analogue),
and the weak-row list (ratio > 2x with a twin > 0.25 s) — plus the
substrate probe, so a wall shift is attributed to host or code before
any ratio is read.

Definition change (r16, VERDICT r15 "what's wrong" #3): v41 is the
BATCH session-window twin (SURVEY §2.11; v125 is the real 3-batch
stream), so it now counts in the batch-comparable set.  Its exclusion
understated the batch numerator by ~0.7 s; the judge-recomputed effect
on the r15 ratio was <=0.01x either way.

Usage: python scripts/compare_bench.py [bench_json] [duck_log]
       (defaults: BENCH_FULL.json, newest .tmp/duck_r*_full*.log)
"""

from __future__ import annotations

import glob
import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

STREAMING = {
    "v32_streaming_window",
    "v59_sliding_window",
    "v60_late_data_drop",
    "v73_stream_dedup",
    "v75_stateful_totals",
    "v76_stream_upsert",
    "v81_stream_stream_join",
    "v111_stream_static_join",
    "v119_stream_outer_join",
    "v125_stream_session_window",
    "v130_stream_full_outer_join",
    "v132_stream_join_window",
    "v133_stream_dedup_join_window",
    "v159_stream_topk",
}


def main() -> None:
    bench_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        _REPO, "BENCH_FULL.json"
    )
    if len(sys.argv) > 2:
        duck_path = sys.argv[2]
    else:
        logs = sorted(
            glob.glob(os.path.join(_REPO, ".tmp", "duck_r*_full*.log")),
            key=os.path.getmtime,
        )
        if not logs:
            sys.exit("no .tmp/duck_r*_full*.log found; pass one explicitly")
        duck_path = logs[-1]

    b = json.load(open(bench_path))
    duck_line = [
        ln for ln in open(duck_path).read().strip().splitlines()
        if ln.startswith("{")
    ][-1]
    d = json.loads(duck_line)
    sq, dq = b["queries"], d["queries"]

    print(f"bench: {bench_path}  (probe {b.get('substrate_probe_sec')}s, "
          f"contended={b.get('contended', '?')})")
    print(f"duck:  {duck_path}")
    both = sorted(k for k in sq if k in dq and sq[k] > 0)
    missing = sorted(set(sq) ^ set(dq))
    if missing:
        print(f"NOT IN BOTH (excluded): {missing}")
    st = sum(sq[k] for k in both)
    dt = sum(dq[k] for k in both)
    print(f"all-in ({len(both)}): {st:.1f} vs {dt:.1f} = {st/dt:.2f}x")
    batch = [k for k in both if k not in STREAMING]
    sb = sum(sq[k] for k in batch)
    db = sum(dq[k] for k in batch)
    print(f"batch-comparable ({len(batch)}): "
          f"{sb:.1f} vs {db:.1f} = {sb/db:.3f}x")
    stream = [k for k in both if k in STREAMING]
    print(f"streaming rows ({len(stream)}): spark total "
          f"{sum(sq[k] for k in stream):.1f} s")

    weak = sorted(
        (
            (k, sq[k], dq[k], sq[k] / dq[k])
            for k in batch
            if dq[k] > 0.25 and sq[k] / dq[k] > 2
        ),
        key=lambda t: -t[3],
    )
    if weak:
        print("weak rows (>2x, twin >0.25s):")
        for k, s, du, r in weak:
            print(f"  {k}: {s:.2f} vs {du:.2f} = {r:.2f}x")
    else:
        print("weak rows (>2x, twin >0.25s): none")
    inverted = sorted(
        (
            (k, sq[k] / dq[k])
            for k in batch
            if dq[k] > 1.0 and sq[k] / dq[k] < 0.5
        ),
        key=lambda t: t[1],
    )
    if inverted:
        print("heavy inversions (twin >1s, ratio <0.5x):")
        for k, r in inverted:
            print(f"  {k}: {r:.2f}x")


if __name__ == "__main__":
    main()
