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


def word_ngram_windows(
    df: DataFrame, n: int, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Sliding word n-gram windows: one row per (doc, token position).

    Output: (doc_id, pos int, gram long) — ``pos`` is the 0-based token
    index of the window start, ``gram`` the xxhash64 of the n tokens joined
    by a single space. Tokenization is the engine's word bag
    (``tokenize.word_tokens``: lower/trim, split on non-word, blanks
    dropped, duplicates kept, input order). Docs shorter than n tokens
    contribute no windows.

    Scale shape: a pure map — ``transform`` over a token array inside
    whole-stage codegen, then one explode; output rows ~= input tokens.
    Hashing to int64 keeps the shuffle key 8 bytes instead of the n-token
    string; a cross-window collision needs ~2^32 DISTINCT grams per
    equality cell to matter (birthday bound) and only ever merges two
    spans, never loses one.
    """
    toks = tk.word_tokens(text_col)
    wins = F.transform(
        F.sequence(F.lit(1), F.size(toks) - n + 1),
        lambda i: F.struct(
            (i - 1).cast("int").alias("pos"),
            F.xxhash64(F.concat_ws(" ", F.slice(toks, i, F.lit(n)))).alias("gram"),
        ),
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.when(F.size(toks) >= n, wins).otherwise(
                F.array().cast("array<struct<pos:int,gram:bigint>>")
            )
        ).alias("w"),
    ).select("doc_id", F.col("w.pos").alias("pos"), F.col("w.gram").alias("gram"))


def duplicated_ngram_spans(
    df: DataFrame,
    n: int = 8,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact-substring duplication spans (the ExactSubstr dedup of Lee et
    al., "Deduplicating Training Data Makes Language Models Better",
    re-shaped for DataFrame execution): maximal token ranges of each doc
    whose every n-token window also occurs in >= ``min_docs`` distinct
    documents (including this one).

    Method: hash every n-token window (``word_ngram_windows``), count
    DISTINCT docs per gram, keep windows of grams above the threshold,
    then merge a doc's surviving window starts into maximal spans with a
    gaps-and-islands pass — two windows at ``p < p'`` share a span iff
    ``p' <= p + n`` (their token intervals overlap or touch, i.e. the
    duplicated text is contiguous).

    Output: (doc_id, start_tok int, end_tok int, n_windows long) — token
    index range [start_tok, end_tok] inclusive, 0-based, plus the number
    of duplicated windows the span merged. A true suffix-array pass finds
    duplications >= n tokens at EXACT boundaries; the window formulation
    finds the same runs with boundaries quantized to n-gram starts, in
    exchange for a shuffle-only plan (no global suffix sort).

    Scale shape: window explode (linear) -> gram groupBy-count (one
    shuffle; partial aggregation absorbs hot phrase grams map-side) ->
    semi-join windows against flagged grams (shuffle on gram) -> per-doc
    window-function merge (one shuffle on doc_id). No step is quadratic
    in corpus size.
    """
    wins = word_ngram_windows(df, n, text_col, id_col)
    flagged_grams = (
        wins.groupBy("gram")
        .agg(F.countDistinct("doc_id").alias("_docs"))
        .where(F.col("_docs") >= min_docs)
        .select("gram")
    )
    hits = wins.join(flagged_grams, "gram", "left_semi")
    w = Window.partitionBy("doc_id").orderBy("pos")
    islands = hits.withColumn(
        "_new",
        F.when(F.col("pos") > F.lag("pos").over(w) + n, 1).otherwise(0),
    ).withColumn("_island", F.sum("_new").over(w))
    return islands.groupBy("doc_id", "_island").agg(
        F.min("pos").alias("start_tok"),
        (F.max("pos") + n - 1).alias("end_tok"),
        F.count("*").alias("n_windows"),
    ).select("doc_id", "start_tok", "end_tok", "n_windows")


def contamination_flags(
    df: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination (the GPT-3/PaLM n-gram collision rule):
    flag corpus documents sharing any n-token window with a held-out
    benchmark set. ``n=13`` is the published GPT-3 appendix-C value;
    short-doc corpora want smaller n.

    Output: (doc_id, n_hits long, contaminated boolean) — one row per
    corpus doc; ``n_hits`` counts the doc's DISTINCT n-gram hashes that
    occur anywhere in the benchmark set.

    Scale shape: the benchmark side is the small one by construction
    (eval sets are MBs against a 100 TB corpus) — its distinct gram-hash
    table is broadcast, so the corpus side is a map-side semi-join with
    zero corpus shuffle before the per-doc count (one shuffle on doc_id).
    """
    bench_grams = (
        word_ngram_windows(benchmark, n, text_col, id_col).select("gram").distinct()
    )
    # semi-join FIRST (map-side against the broadcast), dedup per doc after:
    # the corpus table is never shuffled on the gram key, only the tiny
    # surviving hit set shuffles on doc_id
    hits = (
        word_ngram_windows(df, n, text_col, id_col)
        .join(F.broadcast(bench_grams), "gram", "left_semi")
        .groupBy("doc_id")
        .agg(F.countDistinct("gram").alias("n_hits"))
    )
    all_ids = df.select(F.col(id_col).alias("doc_id"))
    return all_ids.join(hits, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
        (F.coalesce("n_hits", F.lit(0)) > 0).alias("contaminated"),
    )


def repetition_profile(
    df: DataFrame,
    n: int = 2,
    top_frac_threshold: float = 0.2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc repetition signals (the Gopher repetition filters of Rae et
    al., "Scaling Language Models: Methods, Analysis & Insights from
    Training Gopher", table A1, re-based on tokens): duplicate-token
    fraction and the fraction of tokens covered by the doc's most frequent
    word n-gram. Gopher drops docs whose top-2-gram covers > 0.20 of the
    text; ``repetitive`` applies that threshold to the token-fraction
    proxy ``top_ngram_count * n / n_tokens`` (clamped to 1.0 — overlapping
    windows can over-count), additionally requiring the gram to actually
    repeat (``top_ngram_count >= 2`` — on short docs any single n-gram
    covers > 20% of the tokens without any repetition).

    Output: (doc_id, n_tokens int, dup_token_frac double,
    top_ngram_count long, top_ngram_frac double, repetitive boolean);
    fractions rounded to 6 decimals.

    Scale shape: token stats are a pure map (array functions in codegen);
    the n-gram mode is explode -> (doc, gram) count -> per-doc max — two
    shuffles both keyed on doc_id-dominated keys, no per-row O(L^2) scan
    (long docs would make an in-array mode quadratic per row).
    """
    toks = tk.word_tokens(text_col)
    stats = df.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
    )
    top = (
        word_ngram_windows(df, n, text_col, id_col)
        .groupBy("doc_id", "gram")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("_top"))
    )
    out = stats.join(top, "doc_id", "left")
    n_tok_d = F.col("n_tokens").cast("double")
    dup_frac = F.when(
        F.col("n_tokens") > 0,
        F.round(F.lit(1.0) - F.col("n_distinct") / n_tok_d, 6),
    ).otherwise(F.lit(0.0))
    top_cnt = F.coalesce(F.col("_top"), F.lit(0)).cast("bigint")
    top_frac = F.when(
        F.col("n_tokens") > 0,
        F.round(F.least(top_cnt * n / n_tok_d, F.lit(1.0)), 6),
    ).otherwise(F.lit(0.0))
    return out.select(
        "doc_id",
        "n_tokens",
        dup_frac.alias("dup_token_frac"),
        top_cnt.alias("top_ngram_count"),
        top_frac.alias("top_ngram_frac"),
        ((top_cnt >= 2) & (top_frac > top_frac_threshold)).alias("repetitive"),
    )


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
