"""Cascade CUBE: aggregate once at the finest grain, derive every coarser
grouping set from that tiny intermediate.

Spark's built-in ``df.cube(k1..kn)`` physically EXPANDS the input — every
row is replicated once per grouping set (2^n copies) before a single
shuffle aggregates them all.  That is the right plan when group
cardinality approaches row count, but for the common OLAP shape
(billions of rows, thousands of groups) it multiplies scan output 2^n
times.  The cascade instead:

1. one pass: ``groupBy(k1..kn)`` with decomposable partials
   (sum/count/min/max) — the only shuffle that sees data-scale rows;
2. for each of the 2^n grouping sets, re-aggregate the finest-grain
   result (rows = distinct key combinations, usually tiny) — COUNT
   partials re-aggregate with SUM, the rest with their own combiner;
3. union, with NULL-filled key columns and synthesized GROUPING flags.

At 100 TB with 2 cube keys this reads 1× instead of 4× of the input
through the shuffle.  Exactness: decimal partial sums re-summed are
exact (no float reordering), so results hash-match the expanded plan —
final rounding/casting belongs in the caller's projection, after the
cascade.

Caveat (same as SQL CUBE): a genuinely-NULL key value groups as its own
key within ``grouping = 0`` sets; consumers must use the grouping flags,
not NULL-ness, to tell subtotal rows apart.

Reference parity: the reference delegates CUBE to its attached engine as
pass-through T-SQL (/root/reference/src/flowbyte/sql.py:109); this is the
Spark-native scale path behind the same query surface.
"""

from __future__ import annotations

from itertools import product

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from flowbyte_spark.operators.cache import persist_tracked

_PARTIAL = {
    "sum": F.sum,
    "count": F.count,
    "min": F.min,
    "max": F.max,
}
# how a partial re-aggregates at coarser grains
_MERGE = {
    "sum": F.sum,
    "count": F.sum,
    "min": F.min,
    "max": F.max,
}


def cube_cascade(
    df: DataFrame,
    keys: list[str],
    measures: dict[str, tuple[Column | str, str]],
    grouping_prefix: str = "g_",
) -> DataFrame:
    """CUBE(keys) over decomposable measures via cascade aggregation.

    ``measures`` maps output alias -> (input expression, kind) with kind in
    ``sum | count | min | max``.  Output columns: ``*keys`` (NULL where the
    set aggregates the key away), ``*measures``, one BIGINT
    ``{grouping_prefix}{key}`` flag per key (1 = aggregated away), matching
    SQL ``GROUPING(key)``.
    """
    bad = [k for _, (_, k) in measures.items() if k not in _PARTIAL]
    if bad:
        raise ValueError(f"non-decomposable measure kinds: {bad}")

    key_types = {f.name: f.dataType for f in df.schema.fields if f.name in keys}
    missing = [k for k in keys if k not in key_types]
    if missing:
        raise ValueError(f"cube keys not in schema: {missing}")

    base = df.groupBy(*keys).agg(
        *[
            _PARTIAL[kind](F.col(c) if isinstance(c, str) else c).alias(alias)
            for alias, (c, kind) in measures.items()
        ]
    )
    # the cascade re-reads this 2^n times; it is |distinct keys| rows
    base = persist_tracked(base)

    pieces = []
    for mask in product((0, 1), repeat=len(keys)):
        kept = [k for k, m in zip(keys, mask) if m == 0]
        regg = base.groupBy(*kept).agg(
            *[
                _MERGE[kind](F.col(alias)).alias(alias)
                for alias, (_, kind) in measures.items()
            ]
        )
        pieces.append(
            regg.select(
                *[
                    (
                        F.col(k)
                        if m == 0
                        else F.lit(None).cast(key_types[k]).alias(k)
                    )
                    for k, m in zip(keys, mask)
                ],
                *measures,
                *[
                    F.lit(m).cast("long").alias(f"{grouping_prefix}{k}")
                    for k, m in zip(keys, mask)
                ],
            )
        )
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    return out
