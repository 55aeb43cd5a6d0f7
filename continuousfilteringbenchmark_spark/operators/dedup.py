"""Deduplication family for large-scale training-data pipelines.

Beyond the reference's candidate-generation methods, these are the dedup
modes a 100 TB corpus pipeline runs as first-class jobs (brief requirement):

* exact dedup        — hash-groupBy on normalized text
* n-gram Jaccard     — ε-self-join on char n-gram sets (reference J5 shape)
* MinHash + LSH      — shingle -> minhash -> band -> bucket join (N1/N2)
* SimHash            — 64-bit fingerprint + hamming blocks (operators/lsh.py)
* embedding cosine   — range_search on an embedding column (operators/dense.py)

Each returns either a keep/drop assignment or near-dup pairs; group
representative selection is deterministic (min doc_id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import tokenize as tk
from .cluster import connected_components
from .joins import epsilon_join
from .lsh import minhash_lsh_join


def exact_duplicates(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup: normalize -> md5 -> groupBy hash.

    Output: (doc_id, content_hash, is_duplicate, keep_id) — keep_id is the
    min doc_id of the hash group (deterministic representative).
    One shuffle on the 128-bit hash; no skew (hashes are uniform).
    """
    hashed = df.select(
        F.col(id_col).alias("doc_id"),
        F.md5(tk.normalize(text_col)).alias("content_hash"),
    )
    w = Window.partitionBy("content_hash")
    return hashed.select(
        "doc_id",
        "content_hash",
        (F.count("*").over(w) > 1).alias("is_duplicate"),
        F.min("doc_id").over(w).alias("keep_id"),
    )


def ngram_jaccard_near_duplicates(
    df: DataFrame,
    threshold: float = 0.8,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    prefix_filter: bool = True,
) -> DataFrame:
    """Near-dup pairs by char n-gram Jaccard ε-self-join (PPJoin prefix
    pruning on by default — at corpus scale the prefix join is the only
    viable plan)."""
    toks = df.select(
        F.col(id_col).alias("doc_id"), tk.char_ngram_set(text_col, n).alias("tokens")
    )
    return epsilon_join(toks, None, threshold, "jaccard", prefix_filter=prefix_filter)


def minhash_near_duplicates(
    df: DataFrame,
    threshold: float = 0.5,
    n: int = 3,
    n_bands: int = 32,
    n_buckets: int = 4096,
    seed: int = 42,
    text_col: str = "text",
    id_col: str = "doc_id",
    verify: bool = True,
) -> DataFrame:
    """MinHash-LSH near-dup: shingle -> minhash -> band bucket join; optional
    exact-Jaccard verification of the candidates (the scale path: candidates
    are << quadratic, verification joins token arrays back only for them).
    Output: (left_id, right_id[, score])."""
    toks = df.select(
        F.col(id_col).alias("doc_id"), tk.char_ngram_set(text_col, n).alias("tokens")
    ).where(F.size("tokens") > 0)
    if verify:
        # the shingle table feeds the band join AND both sides of the
        # verification join — persist it instead of recomputing the n-gram
        # chain 3x (the in-session analogue of staging it to the StageStore)
        toks = toks.persist()
    cand = minhash_lsh_join(toks, None, n_bands, n_buckets, threshold, seed)
    if not verify:
        return cand
    # pin the verify's parallelism: the candidate table is narrow (two ids)
    # so AQE coalesces the distinct's output to a handful of tasks, and the
    # per-pair exact-Jaccard intersect over wide shingle arrays serializes;
    # an explicit repartition on left_id spreads the verification
    cand = cand.repartition(
        toks.sparkSession.sparkContext.defaultParallelism, "left_id"
    )
    hashed = toks.select("doc_id", tk.hash_token_set(F.col("tokens")).alias("_h"))
    lt = hashed.select(F.col("doc_id").alias("left_id"), F.col("_h").alias("_lt"))
    rt = hashed.select(F.col("doc_id").alias("right_id"), F.col("_h").alias("_rt"))
    scored = (
        cand.join(lt, "left_id")
        .join(rt, "right_id")
        .withColumn("_c", F.size(F.array_intersect("_lt", "_rt")).cast("double"))
        .withColumn(
            "score", F.col("_c") / (F.size("_lt") + F.size("_rt") - F.col("_c"))
        )
    )
    return scored.where(F.col("score") >= threshold).select("left_id", "right_id", "score")


def dedup_assignments(
    df: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Turn near-dup pairs into keep/drop decisions: connected components of
    the pair graph; keep the min doc_id per component.

    Output: (doc_id, group_id, keep boolean).
    """
    # every near-dup generator ends in a pair distinct / per-pair agg
    cc = connected_components(
        pairs.select("left_id", "right_id"), input_distinct=True
    )
    all_ids = df.select(F.col(id_col).alias("doc_id")).distinct()
    return all_ids.join(cc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("cluster_id", "doc_id").alias("group_id"),
        (F.coalesce("cluster_id", "doc_id") == F.col("doc_id")).alias("keep"),
    )
