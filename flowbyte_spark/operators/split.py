"""Dataset splitting and sequence packing for training-data pipelines.

Charter scope (the reference has no dataset-preparation surface).  Two
operators every corpus pipeline needs before training:

- :func:`hash_split` — deterministic train/val/test assignment from a
  seeded md5 of the row key.  Stable under re-runs, insertions, and
  repartitioning (membership depends only on (seed, key), never on row
  order or partition layout), which is what makes it safe at 100 TB:
  adding documents never reshuffles existing assignments the way
  ``randomSplit`` or modulo-over-row-number would.
- :func:`pack_by_budget` — assign rows to fixed-token-budget chunks by
  cumulative token count within an ordered partition (the batch twin of
  context-window packing).  Chunk id = floor((cumsum - 1) / budget): a
  document whose tokens straddle a boundary belongs to the chunk its
  cumulative end falls in.  One window shuffle per partition key.

Both are pure Catalyst (md5 / window cumsum) — no UDFs — so they
hash-verify against DuckDB oracles (V53/V54) and stay in whole-stage
codegen at scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Lexicographic md5-hex thresholds: a uniform hex string is < 'cc' with
# probability 204/256 (~79.7%) and < 'e6' with 230/256 (~89.8%), giving a
# ~80/10/10 split.  String comparison on fixed-width hex is identical in
# every engine — no base-16 integer conversion needed.
DEFAULT_BOUNDS = (("train", "cc"), ("val", "e6"))
FALLBACK_SPLIT = "test"


def split_hash(key: Column | str, seed: str = "split42") -> Column:
    """md5(seed || '|' || key) — the assignment hash (hex string)."""
    c = F.col(key) if isinstance(key, str) else key
    return F.md5(F.concat(F.lit(seed), F.lit("|"), c.cast("string")))


def hash_split(
    df: DataFrame,
    key: str,
    seed: str = "split42",
    bounds=DEFAULT_BOUNDS,
    out_col: str = "split",
) -> DataFrame:
    """Add ``out_col`` ∈ {train, val, test} from a seeded hash of ``key``."""
    h = split_hash(key, seed)
    expr = F.lit(FALLBACK_SPLIT)
    for name, bound in reversed(bounds):
        expr = F.when(h < bound, name).otherwise(expr)
    return df.withColumn(out_col, expr)


def rate_to_hex_bound(rate: float, digits: int = 4) -> str:
    """Hex-prefix threshold with P(md5 < bound) ≈ rate (exact to 16^-digits).

    A uniform hex string is lexicographically below a ``digits``-long
    bound b with probability int(b, 16) / 16**digits.  rate=1.0 returns
    'g' (sorts after every hex char), since no fixed-width hex bound can
    include the whole space."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    scaled = int(rate * (16**digits))
    if scaled >= 16**digits:
        return "g"
    return format(scaled, f"0{digits}x")


def stratified_hash_sample(
    df: DataFrame,
    key: str,
    strata_col: str,
    rates: dict[str, float],
    seed: str = "sample42",
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum sampling: keep a row iff
    md5(seed|key) < hex_bound(rates[stratum]).

    Unlike ``df.sampleBy`` (seeded RNG over partition iteration order),
    membership is a pure function of (seed, key, stratum rate): re-runs,
    repartitioning, and appends never change which existing rows are
    sampled — the same property as :func:`hash_split`, which makes
    sampled corpora reproducible across pipeline versions."""
    h = split_hash(key, seed)
    bound = F.lit(rate_to_hex_bound(default_rate))
    for stratum, rate in sorted(rates.items()):
        bound = F.when(
            F.col(strata_col) == stratum, F.lit(rate_to_hex_bound(rate))
        ).otherwise(bound)
    return df.where(h < bound)


def interleave_key(key: Column | str, seed: str = "shuffle42") -> Column:
    """Deterministic shuffle order: sort by md5(seed|key).

    The hash is uniform, so ordering by it interleaves strata/sources
    uniformly (the batch analog of dataset shuffling before training),
    and it is reproducible — same seed, same order, on any cluster
    layout.  Use as ``df.orderBy(interleave_key("doc_id"))`` or as a
    range-partitioning key for shuffled shard writes."""
    return split_hash(key, seed)


def pack_by_budget(
    df: DataFrame,
    order_col: str,
    tokens: Column,
    budget: int,
    partition_cols: list[str] | None = None,
    out_col: str = "chunk",
) -> DataFrame:
    """Assign each row a chunk id so consecutive rows (by ``order_col``
    within ``partition_cols``) accumulate ≈``budget`` tokens per chunk."""
    w = (
        Window.partitionBy(*(partition_cols or []))
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(tokens).over(w)
    return df.withColumn(out_col, F.floor((cum - 1) / budget).cast("long"))


def global_shuffle(
    df: DataFrame,
    key: str,
    seed: str = "shuffle42",
    bucket_chars: int = 2,
    pos_col: str = "pos",
) -> DataFrame:
    """Deterministic global shuffle: a reproducible 0-based position for
    every row, equal to its rank in the seeded-md5 order of ``key``.

    The last step of every training-data pipeline — examples must reach
    the trainer in a well-mixed order, and that order must be
    reproducible (resume, audit) rather than ``rand()``.  Writing the
    output sorted by ``pos`` (or range-partitioned on it) yields shard
    files any reader can consume sequentially.

    Scale shape: a naive global ``row_number`` needs a single partition
    (the window has no PARTITION BY) — a driver-sized bottleneck.  Here
    the hash's own hex prefix provides ``16^bucket_chars`` RANGE-disjoint,
    skew-free buckets (md5 is uniform, and lexicographic prefix order IS
    global hash order), so the rank decomposes into a per-bucket
    ``row_number`` (parallel, one exchange on the bucket key) plus a
    prefix-sum offset from the bucket counts — a ≤16^bucket_chars-row
    collect, independent of data size.  Raise ``bucket_chars`` so one
    bucket (~n/16^k rows) fits an executor's window buffer at scale.

    Ties (md5 collisions) break on ``key`` so the order is total on any
    corpus; position assignment is NOT append-stable by design — adding
    rows permutes positions, which a global shuffle requires (use
    :func:`hash_split` / :func:`interleave_sources` for append-stable
    assignment semantics).
    """
    h = F.md5(F.concat(F.lit(seed), F.lit("|"), F.col(key).cast("string")))
    base = df.withColumn("__h", h).withColumn(
        "__b", F.substring(F.col("__h"), 1, bucket_chars)
    )
    counts = (
        base.groupBy("__b").count().orderBy("__b").collect()
    )
    offsets, acc = {}, 0
    for row in counts:
        offsets[row["__b"]] = acc
        acc += row["count"]
    spark = df.sparkSession
    off_df = F.broadcast(
        spark.createDataFrame(
            list(offsets.items()), "__b STRING, __off LONG"
        )
    )
    rn = F.row_number().over(
        Window.partitionBy("__b").orderBy("__h", F.col(key))
    )
    return (
        base.join(off_df, "__b")
        .withColumn(pos_col, (F.col("__off") + rn.cast("long") - 1))
        .drop("__h", "__b", "__off")
    )


def temperature_mixture_rates(
    counts: dict[str, int], alpha: float, budget: int
) -> dict[str, float]:
    """Per-source keep rates realizing sampling weights ∝ n_i^alpha.

    The data-mixing staple (GPT-3/LLaMA-style source weighting): alpha=1
    is natural proportions, alpha=0 is uniform-across-sources, values in
    between up-weight small high-quality sources.  A source whose target
    exceeds its size caps at rate 1.0 (you cannot sample rows that do
    not exist); the shortfall is NOT silently redistributed — callers
    who need an exact budget re-run with the capped source pinned, which
    keeps each source's rate a pure function of (counts, alpha, budget)
    and therefore reproducible."""
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    weights = {s: float(n) ** alpha for s, n in counts.items() if n > 0}
    z = sum(weights.values())
    if not z:
        return {s: 0.0 for s in counts}
    return {
        s: min(1.0, budget * weights.get(s, 0.0) / z / n) if n else 0.0
        for s, n in counts.items()
    }


def temperature_mixture_sample(
    df: DataFrame,
    key: str,
    source_col: str,
    alpha: float,
    budget: int,
    seed: str = "mix42",
) -> DataFrame:
    """Sample a ``budget``-row mixture with source weights ∝ n_i^alpha.

    One tiny aggregate (|sources| rows to the driver — mixture design is
    a per-SOURCE decision, there are dozens of sources, not millions)
    computes the rates; membership is then the seeded-md5 predicate of
    :func:`stratified_hash_sample`, so the sample is deterministic,
    partitioning-independent, and append-stable like every split in this
    module."""
    # NULL sources are unclassifiable: excluded deterministically (rate 0
    # via stratified_hash_sample's default) rather than crashing the
    # sorted() over rate keys with a None/str comparison.
    counts = {
        r[0]: r[1]
        for r in df.groupBy(source_col).count().collect()
        if r[0] is not None
    }
    rates = temperature_mixture_rates(counts, alpha, budget)
    return stratified_hash_sample(df, key, source_col, rates, seed=seed)
