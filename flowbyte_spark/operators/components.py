"""Connected components over a near-duplicate pair list.

Near-dup detection (MinHash/SimHash/embedding blocking) emits PAIRS, but a
dedup pipeline needs CLUSTERS: if A~B and B~C, all three are one group and
exactly one survivor should be kept.  That is connected components on the
pair graph, which the reference delegates wholesale to its attached engine
(pass-through SQL, /root/reference/src/flowbyte/sql.py:109); Spark has no
built-in either, so this implements distributed min-label propagation:

1. symmetrize the edge list (one shuffle, done once);
2. every node starts labeled with its own id;
3. iterate: each node takes ``min(own label, min over neighbors'
   labels)`` — a join + partial-aggregating ``groupBy(dst).min`` per
   round, each O(|E|) with map-side combine;
4. stop when a round changes no label.

Rounds needed = graph diameter.  Near-dup clusters are dense and tiny
(a duplicate "family" collapses in 2-3 hops), so the loop converges in a
handful of rounds even at 100 TB; the per-round cost is bounded by the
pair list, which LSH banding already keeps near-linear.  For adversarial
long-chain graphs the large-star/small-star algorithm (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) halves diameter
per round — the iteration harness here is the place to drop it in if a
workload ever produces path-shaped duplicate graphs.

Each round persists the new label table and unpersists the previous one,
so lineage stays one round deep (no exponential plan growth) and executor
storage holds exactly one O(|V|) table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flowbyte_spark.operators.cache import persist_tracked, track


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 25,
) -> DataFrame:
    """Assign every node in ``pairs`` its component id (= min node id in
    the component).

    Returns ``(id, comp)`` for every node that appears in at least one
    pair.  Isolated nodes (no pairs) are the caller's concern — they are
    their own component by definition and need no shuffle to label.

    The returned DataFrame is persisted and registered with
    ``cache.release_persisted()``; materialize it before releasing.
    """
    e = pairs.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    # symmetrize WITHOUT distinct: the pair list already has id_a < id_b
    # unique, and duplicate edges would only add rows to a min-aggregate —
    # a needless shuffle to remove.
    edges = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    # reused every round: keep it resident instead of re-shuffling
    edges = persist_tracked(edges)

    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
        .persist()
    )
    # Labels only ever DECREASE (min of self and neighbors), so
    # sum(comp) is strictly monotone until the fixpoint: one cheap
    # aggregate per round doubles as the convergence test — no
    # old-vs-new join, half the jobs per round.
    prev_sum = labels.agg(F.sum("comp")).collect()[0][0]
    for _ in range(max_iterations):
        nbr_min = (
            edges.join(labels, edges.src == labels.id)
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("comp").alias("nbr_min"))
        )
        new_labels = (
            labels.join(nbr_min, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("comp"), F.coalesce(F.col("nbr_min"), F.col("comp"))
                ).alias("comp"),
            )
            .persist()
        )
        cur_sum = new_labels.agg(F.sum("comp")).collect()[0][0]
        labels.unpersist()
        labels = new_labels
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum

    return track(labels)


def neardup_clusters(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Cluster near-dup pairs and mark the survivor of each cluster.

    Returns ``(id, comp, is_canonical, cluster_size)`` — ``is_canonical``
    is 1 for the minimum id of each component (the deterministic keeper),
    ``cluster_size`` counts the component's members.  The size join
    broadcasts when components are few; AQE decides (no hint — component
    count grows with data).
    """
    cc = connected_components(pairs, src, dst)
    sizes = cc.groupBy("comp").agg(F.count(F.lit(1)).alias("cluster_size"))
    return cc.join(sizes, "comp").select(
        "id",
        "comp",
        (F.col("id") == F.col("comp")).cast("long").alias("is_canonical"),
        "cluster_size",
    )
