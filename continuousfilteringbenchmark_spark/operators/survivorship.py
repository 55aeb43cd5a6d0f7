"""Survivorship / golden-record construction after transitive clustering.

The reference benchmark ends at candidate pairs (its workflows measure
PC/PQ/F1 of the pair set — ``blockingWorkflows/src/.../TokenBlocking.java``
never merges records); a production ER pipeline must CONSUME the clusters:
one canonical ("golden") record per entity, with deterministic attribute
survivorship rules. This module implements the standard rule set:

* representative text — the member with the LONGEST normalized text,
  ties broken by smallest doc_id (deterministic under any partitioning);
* categorical attributes — the most frequent value in the cluster, ties
  broken by the lexicographically smallest value;
* provenance stats — member count, summed character count, min doc_id.

Scale shape (100 TB): one hash join docs x clusters on doc_id, then
per-attribute two-level aggregation (groupBy (cluster, value) with map-side
partial combine, then a per-cluster window over the VALUE-COUNT rows — the
window's partition size is the number of distinct values in the cluster,
not the member count, so a hot cluster with millions of members and 3
languages costs 3 rows in the window). The representative pick is one
window over cluster members ordered by (length DESC, id ASC) — ER clusters
are small by construction (post-threshold match graphs); a runaway cluster
is the same pathology the blocking purge caps upstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def golden_records(
    docs: DataFrame,
    clusters: DataFrame,
    categorical: tuple[str, ...] = ("lang", "source"),
    text_col: str = "text",
    chars_col: str = "n_chars",
    id_col: str = "doc_id",
) -> DataFrame:
    """One canonical record per cluster.

    ``clusters``: (doc_id, cluster_id) — e.g. the output of
    ``cluster.clusters_with_singletons``. Returns one row per cluster_id:
    (cluster_id, rep_id, rep_text, canon_<attr>..., n_members, sum_chars,
    min_doc_id). Every rule is deterministic: ties cannot depend on
    partitioning or execution order.
    """
    mem = clusters.select(F.col(id_col).alias("_id"), "cluster_id").join(
        docs.select(
            F.col(id_col).alias("_id"),
            F.lower(F.trim(F.col(text_col))).alias("_norm"),
            F.col(chars_col).alias("_chars"),
            *categorical,
        ),
        "_id",
    )

    stats = mem.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.sum("_chars").alias("sum_chars"),
        F.min("_id").alias("min_doc_id"),
    )

    rep_w = Window.partitionBy("cluster_id").orderBy(
        F.length("_norm").desc(), F.col("_id").asc()
    )
    rep = (
        mem.select("cluster_id", "_id", "_norm", F.row_number().over(rep_w).alias("_rn"))
        .where(F.col("_rn") == 1)
        .select(
            "cluster_id", F.col("_id").alias("rep_id"), F.col("_norm").alias("rep_text")
        )
    )

    out = stats.join(rep, "cluster_id")
    for attr in categorical:
        cnt = mem.groupBy("cluster_id", attr).agg(F.count(F.lit(1)).alias("_c"))
        pick_w = Window.partitionBy("cluster_id").orderBy(
            F.col("_c").desc(), F.col(attr).asc()
        )
        pick = (
            cnt.select("cluster_id", attr, F.row_number().over(pick_w).alias("_rn"))
            .where(F.col("_rn") == 1)
            .select("cluster_id", F.col(attr).alias(f"canon_{attr}"))
        )
        out = out.join(pick, "cluster_id")

    return out.select(
        "cluster_id",
        "rep_id",
        "rep_text",
        *[f"canon_{a}" for a in categorical],
        "n_members",
        "sum_chars",
        "min_doc_id",
    )
