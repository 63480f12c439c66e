"""Validate the bench's one-line-JSON driver contract against a captured
stdout (or log) file.

WHY (VERDICT r16 #2): the r15 round lost its round-over-round comparison
because BENCH_r15.json's captured stdout line failed the driver's JSON
parse (`prev_bench_ok: false`, `parsed: null`) and nothing in-repo
noticed.  This check is the missing tripwire: run it on the bench log
before closing a round and it fails LOUD if the primary line would not
round-trip through ``json.loads`` — i.e. if a future driver would lose
the baseline again.

Usage: python scripts/check_bench_artifact.py <bench_stdout_or_log_file>
Exit 0 = contract holds; exit 1 + message otherwise.

The contract checked (bench.py's stdout):
- at least one line parses as a JSON object with
  ``metric == "sum_of_median_query_seconds"``;
- that object carries ``value`` (number), ``unit == "sec"``,
  ``queries`` (non-empty dict of name -> seconds), and ``sf``;
- the reversed-copy mitigation line, when present, agrees with the
  primary line's value and query set.
"""

from __future__ import annotations

import json
import sys

PRIMARY_METRIC = "sum_of_median_query_seconds"
COPY_METRIC = "sum_of_median_query_seconds_reversed_copy"


def check_lines(lines: list[str]) -> tuple[dict, dict | None]:
    """Return (primary, copy_or_None); raise ValueError on any violation."""
    primary = copy = None
    for line in lines:
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:
            obj = json.loads(line)
        except ValueError as exc:
            # A brace-led stdout line that is NOT valid JSON is exactly
            # the failure mode that silently broke r15's artifact.
            raise ValueError(f"brace-led line fails json.loads: {exc}: "
                             f"{line[:120]}...") from exc
        if not isinstance(obj, dict):
            continue
        if obj.get("metric") == PRIMARY_METRIC:
            primary = obj
        elif obj.get("metric") == COPY_METRIC:
            copy = obj
    if primary is None:
        raise ValueError(f"no line with metric={PRIMARY_METRIC!r} found")
    if primary.get("unit") != "sec":
        raise ValueError(f"unit is {primary.get('unit')!r}, expected 'sec'")
    if not isinstance(primary.get("value"), (int, float)):
        raise ValueError(f"value is not numeric: {primary.get('value')!r}")
    queries = primary.get("queries")
    if not isinstance(queries, dict) or not queries:
        raise ValueError("queries missing or empty")
    bad = {k: v for k, v in queries.items()
           if not isinstance(v, (int, float))}
    if bad:
        raise ValueError(f"non-numeric query timings: {bad}")
    if "sf" not in primary:
        raise ValueError("sf field missing")
    if copy is not None:
        if copy.get("value") != primary.get("value"):
            raise ValueError(
                f"reversed-copy value {copy.get('value')} != primary "
                f"{primary.get('value')}")
        if set(copy.get("queries", {})) != set(queries):
            raise ValueError("reversed-copy query set differs from primary")
    return primary, copy


def main() -> int:
    if len(sys.argv) != 2:
        print(__doc__, file=sys.stderr)
        return 2
    with open(sys.argv[1], errors="replace") as fh:
        lines = fh.readlines()
    try:
        primary, copy = check_lines(lines)
    except ValueError as exc:
        print(f"BENCH ARTIFACT CONTRACT VIOLATION: {exc}", file=sys.stderr)
        return 1
    print(
        f"bench artifact OK: {len(primary['queries'])} queries, "
        f"value={primary['value']} sec, sf={primary['sf']}, "
        f"reversed copy {'present+consistent' if copy else 'absent'}"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
