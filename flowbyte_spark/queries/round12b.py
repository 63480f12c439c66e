"""Round-12 second-batch verification queries: the remaining
distinctive TPC-H decision-support shapes (the reference delegates ALL
of these to its attached SQL Server via pass-through SQL,
sql.py:88-109 — here they are Catalyst-native), plus the top-k entry
in the incremental-maintenance family.

The fixtures carry no partsupp table and no comment/container columns,
so each query keeps its TPC-H *plan shape* (the thing being verified)
on the columns that exist:

- V138  Q2  — multi-table correlated scalar-MIN subquery (min-cost
              supplier per part within a region), Catalyst
              decorrelation plan-asserted in tests/test_round12b.py.
- V139  Q13 — outer-join count distribution: LEFT OUTER with an
              ON-clause filter, COUNT per key, then GROUP BY the
              count (aggregate-of-aggregate).
- V140  Q20 — nested semi-join chain with an aggregate threshold
              (excess-1996-shippers of 'small%' parts).
- V141  Q19 — disjunctive OR-of-ANDs join predicate; the implied
              brand IN-list is pushed to the part scan.
- V142  Q15 — aggregate view + uncorrelated scalar-MAX equality
              (top supplier by window revenue).
- V143  Q16 — NOT IN anti-join + COUNT(DISTINCT) rollup per part
              attribute.
- V144  Q11 — group sums filtered against a fraction of the global
              sum (uncorrelated scalar threshold over the same CTE).
- V145  Q14 — conditional-aggregate ratio (promo revenue share).
- V146  — incremental TOP-K maintenance: per-load mergeable top-k
          states (operators/incremental.py:topk_state), the
          order-statistic answer to v118 (sums) / v124 (extrema) /
          v137 (distinct counts).

Numeric conventions: exact DECIMAL(38,6) sums (order-independent),
ROUND(CAST(... AS DOUBLE), n) only at the output edge — both engines
round the same exact decimal, so the hash gate is deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from flowbyte_spark.catalog import load_table
from flowbyte_spark.functions import DEC, dec_sum
from flowbyte_spark.queries import register


# ---------------------------------------------------------------------------
# V138 — TPC-H Q2 shape: min-cost supplier.  The correlated scalar-MIN
# subquery correlates through a JOIN CHAIN (offers re-joins supplier →
# nation → region inside the subquery), unlike v114/v128 whose
# correlation target is a single table.  Catalyst DOES decorrelate the
# literal SQL (no surviving subquery nodes — proven in
# tests/test_round12b.py on _V138_SQL), but inlines the offers CTE
# into BOTH consumers: two full lineitem scans and a doubled join
# tree, which is the wrong plan at 100 TB.  The registered query is
# therefore the equivalent single-scan form — offers computed once,
# per-part MIN as a window over the partkey shuffle, equality filter
# in the same stage (plan-asserted: exactly one lineitem scan).  With
# no partsupp fixture, lineitem plays the offer table: unit_cost =
# l_extendedprice / l_quantity (IEEE division — bit-identical in both
# engines, so the MIN-equality filter is exact).
# ---------------------------------------------------------------------------
_V138_SQL = """
WITH offers AS (
  SELECT l.l_partkey AS partkey, l.l_suppkey AS suppkey,
         l.l_extendedprice / l.l_quantity AS unit_cost
  FROM {lineitem} l JOIN {supplier} s ON s.s_suppkey = l.l_suppkey
  JOIN {nation} n ON n.n_nationkey = s.s_nationkey
  JOIN {region} r ON r.r_regionkey = n.n_regionkey
  WHERE r.r_name = 'EUROPE')
SELECT DISTINCT s.s_acctbal, s.s_name, n.n_name AS nation,
       p.p_partkey, p.p_name
FROM {part} p JOIN offers o ON p.p_partkey = o.partkey
JOIN {supplier} s ON s.s_suppkey = o.suppkey
JOIN {nation} n ON n.n_nationkey = s.s_nationkey
WHERE p.p_size <= 10 AND p.p_type = 'LARGE'
  AND o.unit_cost = (SELECT MIN(o2.unit_cost) FROM offers o2
                     WHERE o2.partkey = p.p_partkey)
ORDER BY s.s_acctbal DESC, nation, s.s_name, p.p_partkey
"""


@register(
    "v138_q2_min_cost_supplier",
    oracle=_V138_SQL.format(
        lineitem="lineitem",
        supplier="supplier",
        nation="nation",
        region="region",
        part="part",
    ),
)
def v138_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(
        F.col("r_name") == "EUROPE"
    )
    # dims chain broadcasts into the fact — one lineitem scan total
    euro_supp = (
        supp.join(
            F.broadcast(
                nation.join(
                    F.broadcast(region),
                    nation["n_regionkey"] == region["r_regionkey"],
                )
            ),
            supp["s_nationkey"] == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", F.col("n_name"))
    )
    offers = (
        load_table(spark, sf_dir, "lineitem")
        .join(
            F.broadcast(euro_supp),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select(
            F.col("l_partkey").alias("partkey"),
            (F.col("l_extendedprice") / F.col("l_quantity")).alias(
                "unit_cost"
            ),
            "s_acctbal",
            "s_name",
            F.col("n_name").alias("nation"),
        )
    )
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_size") <= 10) & (F.col("p_type") == "LARGE")
    )
    # The correlation is per-part, so the selective part filter pushes
    # BELOW the window: discarding other parts cannot change any
    # surviving part's MIN.  The window's shuffle then carries ~3% of
    # the offers instead of all of them — the decorrelation-aware
    # pushdown Catalyst can't do through a literal correlated subquery.
    offers = offers.join(
        F.broadcast(part.select("p_partkey")),
        offers["partkey"] == F.col("p_partkey"),
        "left_semi",
    )
    # per-part MIN as a window over the one partkey shuffle; the
    # equality filter runs in the same stage (no self-join, no second
    # scan — the decorrelated form Catalyst produces, minus the CTE
    # duplication)
    w = Window.partitionBy("partkey")
    best = offers.withColumn(
        "min_cost", F.min("unit_cost").over(w)
    ).where(F.col("unit_cost") == F.col("min_cost"))
    return (
        best.join(F.broadcast(part), best["partkey"] == part["p_partkey"])
        .select("s_acctbal", "s_name", "nation", "p_partkey", "p_name")
        .distinct()
        .orderBy(
            F.col("s_acctbal").desc(), "nation", "s_name", "p_partkey"
        )
    )


# ---------------------------------------------------------------------------
# V139 — TPC-H Q13 shape: customer order-count distribution.  The
# LEFT OUTER's filter lives in the ON clause (NOT the WHERE — a WHERE
# would silently turn the join inner and drop zero-order customers),
# then the aggregate of an aggregate: COUNT per customer, COUNT of
# customers per count.  Scale shape: both aggregations partial-combine;
# the second one's key domain is tiny (distinct counts), so the final
# shuffle is negligible.
# ---------------------------------------------------------------------------
@register(
    "v139_q13_order_distribution",
    oracle="""
    SELECT CAST(c_count AS BIGINT) AS c_count,
           CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
          FROM customer c LEFT OUTER JOIN orders o
            ON c.c_custkey = o.o_custkey
           AND o.o_orderpriority NOT LIKE '%URGENT%'
          GROUP BY c.c_custkey) t
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def v139_q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(
        ~F.col("o_orderpriority").like("%URGENT%")
    )
    per_cust = (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


# ---------------------------------------------------------------------------
# V140 — TPC-H Q20 shape: excess-stock suppliers.  Nested semi-join
# chain — suppliers IN (grouped lineitem over parts IN (name-prefix
# parts)) — with an aggregate threshold: 1996 shipments exceed 30% of
# all-years shipments for that (supplier, part).  Quantities sum as
# exact DECIMAL and the threshold compares decimal-to-decimal
# (q96*10 > qall*3), so the boundary cannot drift between engines.
# Scale shape: part prefix filter broadcasts into a semi join on the
# fact; one grouped aggregate; the supplier probe is a broadcast semi.
# ---------------------------------------------------------------------------
@register(
    "v140_q20_excess_shippers",
    oracle="""
    SELECT s.s_name, n.n_name AS nation
    FROM supplier s JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE n.n_regionkey = 2
      AND s.s_suppkey IN (
        SELECT suppkey FROM (
          SELECT l_suppkey AS suppkey, l_partkey AS partkey,
                 SUM(CASE WHEN year(l_shipdate) = 1996
                     THEN CAST(l_quantity AS DECIMAL(38,6))
                     ELSE CAST(0 AS DECIMAL(38,6)) END) AS q96,
                 SUM(CAST(l_quantity AS DECIMAL(38,6))) AS qall
          FROM lineitem
          WHERE l_partkey IN (SELECT p_partkey FROM part
                              WHERE p_name LIKE 'small%')
          GROUP BY 1, 2) g
        WHERE q96 * 10 > qall * 3)
    ORDER BY s.s_name
    """,
)
def v140_q20_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part_keys = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    qty = F.col("l_quantity").cast(DEC)
    zero = F.lit(0).cast(DEC)
    grouped = (
        li.join(
            F.broadcast(part_keys),
            li["l_partkey"] == part_keys["p_partkey"],
            "left_semi",
        )
        .groupBy(
            F.col("l_suppkey").alias("suppkey"),
            F.col("l_partkey").alias("partkey"),
        )
        .agg(
            F.sum(
                F.when(F.year("l_shipdate") == 1996, qty).otherwise(zero)
            ).alias("q96"),
            F.sum(qty).alias("qall"),
        )
        .where(F.col("q96") * 10 > F.col("qall") * 3)
        .select("suppkey")
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").where(
        F.col("n_regionkey") == 2
    )
    return (
        supp.join(grouped, supp["s_suppkey"] == grouped["suppkey"], "left_semi")
        .join(nation, supp["s_nationkey"] == nation["n_nationkey"])
        .select("s_name", F.col("n_name").alias("nation"))
        .orderBy("s_name")
    )


# ---------------------------------------------------------------------------
# V141 — TPC-H Q19 shape: disjunctive OR-of-ANDs join predicate.  The
# natural formulation puts the whole OR above the join; the plan we
# want at 100 TB pushes the IMPLIED per-side conjuncts down — the part
# scan needs only 3 brands, the lineitem scan only quantities 1-30 —
# so both written explicitly (the DNF common-factor extraction the
# engines' CNF rewrites may or may not perform; the redundant
# conjuncts are implied by the OR, hence semantically free).
# tests/test_round12b.py asserts both pushed filters reach the scans.
# ---------------------------------------------------------------------------
@register(
    "v141_q19_disjunctive_revenue",
    oracle="""
    SELECT ROUND(CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                              AS DECIMAL(38,6))) AS DOUBLE), 2) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE ((p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
            AND l.l_quantity BETWEEN 1 AND 11)
        OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
            AND l.l_quantity BETWEEN 10 AND 20)
        OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 35
            AND l.l_quantity BETWEEN 20 AND 30))
    """,
)
def v141_q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(
        # implied by the OR below: every branch bounds l_quantity
        F.col("l_quantity").between(1, 30)
    )
    part = load_table(spark, sf_dir, "part").where(
        # implied by the OR below: every branch names one of 3 brands
        F.col("p_brand").isin("Brand#12", "Brand#23", "Brand#34")
    )
    branch = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .where(branch)
        .agg(
            dec_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")),
                "revenue",
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# V142 — TPC-H Q15 shape: top supplier by windowed revenue.  The
# aggregate view is computed ONCE and reused for both the scalar MAX
# and the equality probe; the MAX side is a 1-row broadcast, so no
# second scan and no single-partition global window.  Revenue is an
# exact decimal, so the MAX-equality can't float-drift.
# ---------------------------------------------------------------------------
@register(
    "v142_q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             SUM(CAST(l_extendedprice * (1 - l_discount)
                 AS DECIMAL(38,6))) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-04-01'
      GROUP BY l_suppkey)
    SELECT s.s_suppkey, s.s_name,
           ROUND(CAST(r.total_rev AS DOUBLE), 2) AS total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_rev = (SELECT MAX(total_rev) FROM revenue)
    ORDER BY s.s_suppkey
    """,
)
def v142_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    rev = (
        li.where(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1996-04-01")
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    DEC
                )
            ).alias("total_rev")
        )
        # the view feeds BOTH the scalar MAX and the equality probe;
        # without materialization each consumer replays the fact scan
        # (plan-asserted single scan in tests/test_round12b.py).  The
        # view is |suppliers| rows — state-table-sized at any SF.
        .localCheckpoint(eager=True)
    )
    mx = rev.agg(F.max("total_rev").alias("mx"))
    supp = load_table(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(mx), rev["total_rev"] == mx["mx"])
        .join(supp, supp["s_suppkey"] == rev["supplier_no"])
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("total_rev").cast("double"), 2).alias(
                "total_revenue"
            ),
        )
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# V143 — TPC-H Q16 shape: supplier count by part attribute with a
# NOT IN exclusion.  s_suppkey is non-nullable and the subquery is
# over a non-null column, so NOT IN degenerates to a plain left-anti
# join (the 3VL-correct null-aware form is v113's subject); the
# exclusion list is tiny → broadcast anti.  COUNT(DISTINCT) shuffles
# once on (attrs, suppkey) for the distinct, once for the rollup.
# ---------------------------------------------------------------------------
@register(
    "v143_q16_supplier_count",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#45' AND p.p_type NOT IN ('PROMO', 'ECONOMY')
      AND p.p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                              WHERE s_acctbal < 500)
    GROUP BY 1, 2, 3
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def v143_q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#45")
        & ~F.col("p_type").isin("PROMO", "ECONOMY")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    )
    excluded = (
        load_table(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 500)
        .select("s_suppkey")
    )
    return (
        li.join(
            F.broadcast(excluded),
            li["l_suppkey"] == excluded["s_suppkey"],
            "left_anti",
        )
        .join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size"
        )
    )


# ---------------------------------------------------------------------------
# V144 — TPC-H Q11 shape: important stock.  Group sums filtered
# against a fraction of the GLOBAL sum over the same aggregate — the
# group table is computed once, its global total reduced to one
# broadcast row, and the threshold compares decimal-to-decimal
# (val*1000 > total: both sides exact, no float fraction).
# ---------------------------------------------------------------------------
@register(
    "v144_q11_important_parts",
    oracle="""
    WITH pv AS (
      SELECT l.l_partkey AS partkey,
             SUM(CAST(l.l_extendedprice AS DECIMAL(38,6))) AS val
      FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = 'NATION_7'
      GROUP BY 1)
    SELECT partkey, ROUND(CAST(val AS DOUBLE), 2) AS val
    FROM pv WHERE val * 1000 > (SELECT SUM(val) FROM pv)
    ORDER BY val DESC, partkey
    """,
)
def v144_q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").where(
        F.col("n_name") == "NATION_7"
    )
    pv = (
        li.join(
            F.broadcast(
                supp.join(
                    F.broadcast(nation),
                    supp["s_nationkey"] == nation["n_nationkey"],
                ).select("s_suppkey")
            ),
            li["l_suppkey"] == F.col("s_suppkey"),
            "left_semi",
        )
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum(F.col("l_extendedprice").cast(DEC)).alias("val"))
        # consumed by the global total AND the threshold filter —
        # materialize the |parts|-row aggregate once (single fact
        # scan, plan-asserted)
        .localCheckpoint(eager=True)
    )
    total = pv.agg(F.sum("val").cast(DEC).alias("total"))
    return (
        pv.join(F.broadcast(total), pv["val"] * 1000 > total["total"])
        .select(
            "partkey", F.round(F.col("val").cast("double"), 2).alias("val")
        )
        .orderBy(F.col("val").desc(), "partkey")
    )


# ---------------------------------------------------------------------------
# V145 — TPC-H Q14 shape: promo revenue share.  Conditional aggregate
# ratio over one month — both legs exact decimal sums, divided as
# doubles only at the output edge (the v110 convention).
# ---------------------------------------------------------------------------
@register(
    "v145_q14_promo_share",
    oracle="""
    SELECT ROUND(100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                 THEN CAST(l.l_extendedprice * (1 - l.l_discount)
                      AS DECIMAL(38,6))
                 ELSE CAST(0 AS DECIMAL(38,6)) END) AS DOUBLE)
               / CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                      AS DECIMAL(38,6))) AS DOUBLE), 4) AS promo_revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= '1997-09-01' AND l.l_shipdate < '1997-10-01'
    """,
)
def v145_q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1997-09-01")
        & (F.col("l_shipdate") < "1997-10-01")
    )
    part = load_table(spark, sf_dir, "part")
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC)
    zero = F.lit(0).cast(DEC)
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .agg(
            F.round(
                100.0
                * F.sum(
                    F.when(F.col("p_type") == "PROMO", vol).otherwise(zero)
                ).cast("double")
                / F.sum(vol).cast("double"),
                4,
            ).alias("promo_revenue")
        )
    )


# ---------------------------------------------------------------------------
# V146 — incremental TOP-K maintenance.  Order statistics are not
# group-homomorphic under deletes, but under INSERT-only loads top-k
# is a mergeable monoid (topk(A∪B) ⊆ topk(A)∪topk(B)), so the
# pipeline persists one k-row state per (group, load) and merges —
# O(groups·k·loads) IO, never a fact rescan.  Three deterministic
# "loads" (event_id mod 3) each reduce to a 5-row-per-group state;
# the merged answer must equal the oracle's full-fact ROW_NUMBER.
# ---------------------------------------------------------------------------
_V146_K = 5


@register(
    "v146_incremental_topk",
    oracle=f"""
    SELECT event_type, CAST(rn AS BIGINT) AS rank, event_id, value
    FROM (SELECT event_type, event_id, value,
                 ROW_NUMBER() OVER (PARTITION BY event_type
                                    ORDER BY value DESC, event_id) AS rn
          FROM events) t
    WHERE rn <= {_V146_K}
    ORDER BY event_type, rank
    """,
)
def v146_incremental_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flowbyte_spark.operators.incremental import (
        merge_topk_states,
        topk_state,
    )
    from flowbyte_spark.operators.topk import top_k_per_group

    events = load_table(spark, sf_dir, "events")
    states = [
        topk_state(
            events.where(F.col("event_id") % 3 == i),
            ["event_type"],
            "value",
            "event_id",
            _V146_K,
        )
        for i in range(3)
    ]
    merged = merge_topk_states(
        states, ["event_type"], "value", "event_id", _V146_K
    )
    return (
        top_k_per_group(
            merged,
            ["event_type"],
            [F.col("value").desc(), F.col("event_id").asc()],
            _V146_K,
            rank_col="rank",
        )
        .select(
            "event_type", F.col("rank").cast("long").alias("rank"),
            "event_id", "value",
        )
        .orderBy("event_type", "rank")
    )
