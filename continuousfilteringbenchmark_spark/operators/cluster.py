"""Transitive clustering: connected components over the match-pair graph.

The reference stops at candidate pairs (it never clusters); the north rule
adds transitive clustering. Implementation: alternating large-star /
small-star contraction (Kiveris et al., "Connected Components in MapReduce
and Beyond", SoCC'14) expressed as DataFrame joins — the only iterative
physical pattern in the engine (SURVEY.md §4.2). Lineage is cut by local
checkpoints every round (on a production cluster swap for reliable
checkpoints so the loop survives executor loss).

Converges in O(log^2 n) rounds; each round is two (groupBy-min + join)
passes. Cluster ids are the minimum doc_id of the component (deterministic,
independent of partitioning — tested at local[2] vs local[8]).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(edges: DataFrame) -> DataFrame:
    """For each node u: connect every strictly-larger neighbor to
    min(Γ(u) ∪ {u}). Emits (larger_nbr, min)."""
    nbrs = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = nbrs.groupBy("u").agg(F.min("v").alias("_mv"))
    mins = mins.select("u", F.least("u", "_mv").alias("m"))
    return (
        nbrs.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Operating on edges directed high->low (u > v): for each u, link all of
    its smaller neighbors and itself to the minimum of them. Emits star
    edges (node, min)."""
    directed = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    )
    mins = directed.groupBy("u").agg(F.min("v").alias("m"))
    relink = (
        directed.join(mins, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .union(mins.select(F.col("u"), F.col("m").alias("v")))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    return relink


def _checksum(edges: DataFrame) -> tuple[int, int]:
    row = edges.agg(
        F.count("*").alias("n"),
        F.coalesce(F.expr("bit_xor(xxhash64(u, v))"), F.lit(0)).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def connected_components(
    pairs: DataFrame, max_iter: int = 30, check_every: int = 4
) -> DataFrame:
    """Connected components of an undirected pair graph.

    Input:  DataFrame(left_id, right_id)
    Output: DataFrame(doc_id, cluster_id) for every node appearing in any
            pair; cluster_id = min doc_id of the component.

    The loop checkpoints EVERY round but checksums only every
    ``check_every``-th: the checkpoint is what truncates lineage — each
    large-star/small-star round references its input ~12x, so skipping
    checkpoints grows the logical plan ~12^k between cuts and Catalyst
    re-analysis becomes the bottleneck (measured: minutes of pure driver CPU
    at k=4). The convergence checksum, by contrast, is just an extra driver
    job whose latency CAN be amortized: star contraction converges in
    O(log^2 n) rounds regardless, so coarser detection costs at most k-1
    extra cheap rounds while cutting the job count.
    """
    edges = (
        pairs.select(F.col("left_id").alias("u"), F.col("right_id").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    prev = _checksum(edges)
    for i in range(max_iter):
        edges = _small_star(_large_star(edges)).localCheckpoint(eager=True)
        if (i + 1) % check_every == 0 or i == max_iter - 1:
            cur = _checksum(edges)
            if cur == prev:
                break
            prev = cur

    # fixpoint is a star forest: edges (node -> component min)
    assign = (
        edges.select(F.col("u").alias("doc_id"), F.col("v").alias("cluster_id"))
        .union(edges.select(F.col("v").alias("doc_id"), F.col("v").alias("cluster_id")))
        .groupBy("doc_id")
        .agg(F.min("cluster_id").alias("cluster_id"))
    )
    return assign


def clusters_with_singletons(docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Full clustering table: every doc gets a cluster; unmatched docs become
    singleton clusters (cluster_id = own doc_id)."""
    cc = connected_components(pairs)
    all_ids = docs.select(F.col(id_col).alias("doc_id")).distinct()
    return all_ids.join(cc, "doc_id", "left").select(
        "doc_id", F.coalesce("cluster_id", "doc_id").alias("cluster_id")
    )
