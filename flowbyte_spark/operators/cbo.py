"""Cost-based-optimizer statistics tier: ANALYZE the fixture tables and
let Catalyst's CostBasedJoinReorder pick the join order.

The reference delegates all join planning to SQL Server's cost-based
optimizer (its queries are pass-through SQL, sql.py:109); Spark's
equivalent needs two things the DataFrame reader alone doesn't give:
catalog TABLES (stats live in the catalog, not on a path-based scan)
and ``ANALYZE TABLE ... COMPUTE STATISTICS FOR COLUMNS`` (row counts +
per-column NDV/min/max, which the reorder's cardinality model consumes).

Scale shape: ANALYZE is one scan per table, amortized across every
query planned afterwards; at 100 TB it is the same nightly-stats job
every warehouse runs, and partition-level stats keep it incremental.
The pay-off is plan quality: with stats, a join written
``big ⋈ big ⋈ selective-small`` re-orders to hit the selective table
first — the difference between shuffling |lineitem| rows twice and
once (plan-asserted stats-on vs stats-off in tests/test_cbo.py, the
v120 disabler-control pattern).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

# Confs the CBO path needs at PLANNING time.  joinReorder is off by
# default; both are per-query scoped by callers (scoped_sql_conf), never
# session-global.
CBO_CONFS = {
    "spark.sql.cbo.enabled": "true",
    "spark.sql.cbo.joinReorder.enabled": "true",
}


def _safe_tag(sf_dir: str) -> str:
    return re.sub(r"[^a-z0-9]+", "_", sf_dir.lower()).strip("_")


def register_analyzed_table(
    spark: SparkSession, sf_dir: str, name: str, columns: list[str]
) -> str:
    """Expose ``sf_dir/name.parquet`` as a catalog table with column
    statistics; returns the qualified table name.

    Idempotent per (session, sf_dir, table): the table is created
    ``IF NOT EXISTS`` and re-ANALYZEd only when row-count stats are
    absent (a fresh in-memory catalog).  Stats are what make a scan a
    CBO citizen — path-based ``spark.read.parquet`` has a size estimate
    but no row count or NDV, so CostBasedJoinReorder skips it.
    """
    db = "flowbyte_cbo"
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    table = f"{db}.{name}_{_safe_tag(sf_dir)}"
    spark.sql(
        f"CREATE TABLE IF NOT EXISTS {table} USING parquet "
        f"LOCATION '{sf_dir}/{name}.parquet'"
    )
    described = spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
    has_stats = any(
        r.col_name == "Statistics" and "rows" in (r.data_type or "")
        for r in described
    )
    if not has_stats:
        cols = ", ".join(columns)
        spark.sql(
            f"ANALYZE TABLE {table} COMPUTE STATISTICS FOR COLUMNS {cols}"
        )
    return table


def join_leaf_order(df: DataFrame) -> list[str]:
    """Catalog-table leaf names in optimized-plan order — the join
    order the optimizer actually chose (plan-audit dual of the CBO
    knobs; used by the stats-on/off disabler test)."""
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    seen: list[str] = []
    for m in re.finditer(r"flowbyte_cbo\.(\w+)", plan):
        t = m.group(1)
        if t not in seen:
            seen.append(t)
    return seen
