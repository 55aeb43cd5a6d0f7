"""Set-similarity joins (SURVEY.md §2.4, J1-J6).

The reference's inverted index + counters/flags machinery
(``joins/src/joins/AbstractJoin.java:17-39``,
``SchemaAgnosticEJoin.java:83-99``) collapses into:

    explode(tokens) -> equi-join on token -> groupBy(pair).count() -> sim

The token equi-join IS the inverted index (shuffle builds the posting lists);
the hash aggregation IS the counters trick (map-side partial aggregation =
per-partition counters). Both stay in whole-stage codegen.

Optional PPJoin-style prefix + length filtering (north rule; the reference
probes ALL tokens — ``SchemaAgnosticEJoin.java:84-99`` — so this is
flag-gated to keep a reference-equivalent mode for parity tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.similarity import set_similarity
from ..functions.tokenize import hash_token_set


def _tokenized(docs: DataFrame, tokens_col: str, id_col: str) -> DataFrame:
    return docs.select(
        F.col(id_col).alias("_id"),
        F.col(tokens_col).alias("_tokens"),
        F.size(tokens_col).alias("_size"),
    ).where(F.size(tokens_col) > 0)


def _prefix_tokens(df: DataFrame, threshold: float, sim: str) -> DataFrame:
    """PPJoin prefix: order each doc's tokens by ascending global frequency
    (rarest first) and keep a prefix long enough that any pair reaching the
    threshold must share a prefix token.

    Prefix lengths (standard set-similarity-join bounds):
      jaccard: L - ceil(t * L) + 1
      cosine:  L - ceil(t * t * L) + 1
      dice:    L - ceil(t / (2 - t) * L) + 1
    """
    tok = df.select("_id", F.explode("_tokens").alias("_tok"))
    freq = tok.groupBy("_tok").agg(F.count("*").alias("_freq"))
    ranked = tok.join(freq, "_tok")
    w = Window.partitionBy("_id").orderBy(F.col("_freq").asc(), F.col("_tok").asc())
    ranked = ranked.withColumn("_rn", F.row_number().over(w))
    sizes = df.select("_id", "_size")
    ranked = ranked.join(sizes, "_id")
    L = F.col("_size").cast("double")
    t = F.lit(float(threshold))
    if sim == "jaccard":
        plen = L - F.ceil(t * L) + 1
    elif sim == "cosine":
        plen = L - F.ceil(t * t * L) + 1
    else:  # dice
        plen = L - F.ceil(t / (F.lit(2.0) - t) * L) + 1
    return ranked.where(F.col("_rn") <= plen).select("_id", "_tok")


def epsilon_join(
    left: DataFrame,
    right: DataFrame | None,
    threshold: float,
    sim: str = "jaccard",
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    prefix_filter: bool = False,
) -> DataFrame:
    """J1/J5 ε-join: emit (left_id, right_id, score) where set-sim >= threshold.

    ``right=None`` -> Dirty-ER self-join with ``left_id < right_id`` (the
    batch equivalent of the reference's query-then-insert streaming loop,
    ``joins/src/scalabilityAnalysis/SchemaAgnosticEJoin.java:67-111`` — the
    sequential form is only a memory optimization; the pair set is identical).
    Clean-Clean two-sided form: ``joins/src/joins/SchemaAgnosticEJoin.java:66-123``.

    ``prefix_filter=True`` adds PPJoin prefix+length pruning (north rule);
    candidate generation then joins only on prefix tokens, and scoring uses
    the exact intersection count — output identical to the unfiltered mode.
    """
    self_join = right is None
    l = _tokenized(left, tokens_col, id_col)
    r = l if self_join else _tokenized(right, tokens_col, id_col)

    if prefix_filter:
        lp = _prefix_tokens(l, threshold, sim).withColumnRenamed("_id", "left_id")
        rp = (
            lp.withColumnRenamed("left_id", "right_id")
            if self_join
            else _prefix_tokens(r, threshold, sim).withColumnRenamed("_id", "right_id")
        )
        cand = lp.join(rp, "_tok").select("left_id", "right_id").distinct()
        if self_join:
            cand = cand.where(F.col("left_id") < F.col("right_id"))
        # length filter: |A∩B| >= t*|A∪B| implies size ratio bound.
        # Scoring joins carry hashed-long token ids (array_intersect fast
        # path; see functions.tokenize.hash_token_set) — _size stays the
        # ORIGINAL set size so denominators are exact.
        l_h = l.withColumn("_htok", hash_token_set(F.col("_tokens")))
        r_h = r if self_join else r.withColumn("_htok", hash_token_set(F.col("_tokens")))
        if self_join:
            r_h = l_h
        l_full = l_h.select(F.col("_id").alias("left_id"), F.col("_htok").alias("_ltok"), F.col("_size").alias("_lsz"))
        r_full = r_h.select(F.col("_id").alias("right_id"), F.col("_htok").alias("_rtok"), F.col("_size").alias("_rsz"))
        scored = (
            cand.join(l_full, "left_id")
            .join(r_full, "right_id")
            .withColumn("_common", F.size(F.array_intersect("_ltok", "_rtok")))
        )
        scored = scored.withColumn(
            "score", set_similarity(F.col("_common"), F.col("_lsz"), F.col("_rsz"), sim)
        )
    else:
        lt = l.select(F.col("_id").alias("left_id"), F.col("_size").alias("_lsz"), F.explode("_tokens").alias("_tok"))
        rt = r.select(F.col("_id").alias("right_id"), F.col("_size").alias("_rsz"), F.explode("_tokens").alias("_tok"))
        pairs = lt.join(rt, "_tok")
        if self_join:
            pairs = pairs.where(F.col("left_id") < F.col("right_id"))
        scored = pairs.groupBy("left_id", "right_id", "_lsz", "_rsz").agg(
            F.count("*").alias("_common")
        )
        scored = scored.withColumn(
            "score", set_similarity(F.col("_common"), F.col("_lsz"), F.col("_rsz"), sim)
        )
    return scored.where(F.col("score") >= threshold).select("left_id", "right_id", "score")


def weighted_epsilon_join(
    left: DataFrame,
    right: DataFrame | None,
    threshold: float,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """Rarity-weighted (idf-flavored) Jaccard ε-join with INTEGER weights.

    Token weight ``w(t) = N div df(t)`` (integer division; N = docs in the
    weighting corpus, df = the token's document frequency): idf's
    monotonicity — rare tokens heavy, corpus-wide tokens weight 1 — without
    float logarithms, so every partial sum stays exact 64-bit integer
    arithmetic and any SQL engine reproduces each score bit-for-bit (one
    IEEE division per pair at the end):

        score = W(A ∩ B) / (W(A) + W(B) - W(A ∩ B)),  W(S) = sum of w(t)

    Down-weighting hot tokens is the classic fix for Zipf token skew in
    set-similarity joins (the weighted-Jaccard / PPJoin+ literature): the
    stopword postings that dominate the unweighted ε-join's shuffle still
    join here, but contribute ~1 weight instead of deciding the score.

    Scale shape: identical to ``epsilon_join``'s unfiltered mode (explode
    -> token equi-join -> pair aggregation) plus one df aggregation and a
    broadcast of the 1-row corpus count; the weight table joins on the
    token key the postings shuffle already uses. ``right=None`` ->
    Dirty-ER self-join (left < right); two-sided mode weights over the
    UNION of both corpora so both sides score in the same frame.
    """
    self_join = right is None
    l = _tokenized(left, tokens_col, id_col)
    r = l if self_join else _tokenized(right, tokens_col, id_col)
    lt = l.select(F.col("_id").alias("left_id"), F.explode("_tokens").alias("_tok"))
    rt = (
        lt.select(F.col("left_id").alias("right_id"), "_tok")
        if self_join
        else r.select(F.col("_id").alias("right_id"), F.explode("_tokens").alias("_tok"))
    )
    # weighting corpus: the self corpus, or the union of both sides (side
    # tags keep colliding ids distinct for N and df)
    if self_join:
        wt_toks = lt.select(F.col("left_id").alias("_wid"), "_tok")
    else:
        wt_toks = lt.select(
            F.concat(F.lit("L:"), F.col("left_id").cast("string")).alias("_wid"), "_tok"
        ).unionByName(
            rt.select(
                F.concat(F.lit("R:"), F.col("right_id").cast("string")).alias("_wid"),
                "_tok",
            )
        )
    n_row = wt_toks.select("_wid").distinct().agg(F.count(F.lit(1)).alias("_n"))
    dfreq = wt_toks.groupBy("_tok").agg(F.count(F.lit(1)).alias("_df"))
    wtab = dfreq.crossJoin(F.broadcast(n_row)).select(
        "_tok", F.expr("_n div _df").alias("_w")
    )
    docw_l = lt.join(wtab, "_tok").groupBy("left_id").agg(F.sum("_w").alias("_lw"))
    # self-join: the right-side weight table is a column-rename of the left
    # one — deriving it avoids recomputing the whole postings aggregation
    docw_r = (
        docw_l.withColumnsRenamed({"left_id": "right_id", "_lw": "_rw"})
        if self_join
        else rt.join(wtab, "_tok").groupBy("right_id").agg(F.sum("_w").alias("_rw"))
    )
    pairs = lt.join(rt, "_tok")
    if self_join:
        pairs = pairs.where(F.col("left_id") < F.col("right_id"))
    common = (
        pairs.join(wtab, "_tok")
        .groupBy("left_id", "right_id")
        .agg(F.sum("_w").alias("_cw"))
    )
    scored = (
        common.join(docw_l, "left_id")
        .join(docw_r, "right_id")
        .withColumn(
            "score",
            F.col("_cw").cast("double")
            / (F.col("_lw") + F.col("_rw") - F.col("_cw")),
        )
    )
    return scored.where(F.col("score") >= F.lit(float(threshold))).select(
        "left_id", "right_id", "score"
    )


def topk_join(
    source: DataFrame,
    target: DataFrame | None,
    k: int,
    sim: str = "cosine",
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """J2/J3/J6 top-k set-similarity join with TIE-INCLUSIVE semantics.

    Per target entity, the cutoff is the *value* of the k-th best similarity;
    every candidate with sim >= that value survives (reference keeps ties:
    ``joins/src/joins/TopKSchemaAgnosticJoin.java:119-171`` — minimumWeight
    is the PQ head, emission uses ``minimumWeight <= sim``). A plain
    ``rank() <= k`` would differ on ties (SURVEY.md risk #2): we compute the
    k-th value via ``row_number`` then threshold with ``>=``.

    ``target=None`` -> Dirty-ER self-join mode: each doc is both query and
    candidate (pairs deduped by ``left<right`` AFTER per-query selection,
    matching ``joins/src/scalabilityAnalysis/TopKSchemaAgnosticJoin.java``).
    Default config K=5, fivegram multiset, cosine
    (``DefaultTopKSchemaAgnosticJoin.java:27-41``).
    """
    self_join = target is None
    s = _tokenized(source, tokens_col, id_col)
    t = s if self_join else _tokenized(target, tokens_col, id_col)

    st = s.select(F.col("_id").alias("src_id"), F.col("_size").alias("_ssz"), F.explode("_tokens").alias("_tok"))
    tt = t.select(F.col("_id").alias("tgt_id"), F.col("_size").alias("_tsz"), F.explode("_tokens").alias("_tok"))
    pairs = st.join(tt, "_tok")
    if self_join:
        pairs = pairs.where(F.col("src_id") != F.col("tgt_id"))
    scored = pairs.groupBy("tgt_id", "src_id", "_tsz", "_ssz").agg(F.count("*").alias("_common"))
    scored = scored.withColumn(
        "score", set_similarity(F.col("_common"), F.col("_ssz"), F.col("_tsz"), sim)
    )
    w = Window.partitionBy("tgt_id").orderBy(F.col("score").desc(), F.col("src_id").asc())
    wall = Window.partitionBy("tgt_id")
    kth = F.max(F.when(F.row_number().over(w) == k, F.col("score"))).over(wall)
    out = (
        scored.withColumn("_kth", kth)
        .where(F.col("_kth").isNull() | (F.col("score") >= F.col("_kth")))
        .select(F.col("src_id"), F.col("tgt_id"), F.col("score"))
    )
    if self_join:
        return (
            out.select(
                F.least("src_id", "tgt_id").alias("left_id"),
                F.greatest("src_id", "tgt_id").alias("right_id"),
                F.col("score"),
            )
            .groupBy("left_id", "right_id")
            .agg(F.max("score").alias("score"))
        )
    return out.select(
        F.col("src_id").alias("left_id"), F.col("tgt_id").alias("right_id"), F.col("score")
    )


def topk_join_directed(
    d1: DataFrame,
    d2: DataFrame,
    k: int,
    sim: str = "cosine",
    reverse: bool = False,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """J2's per-dataset direction flag (``TopKSchemaAgnosticJoin.java:29``,
    dataset swap at ``:49-56``, emission flip at ``:164-170``): the tuned
    drivers pick which dataset plays the indexed SOURCE vs the queried
    TARGET per dataset pair, usually putting the smaller side on the query
    (per-entity top-k) axis.

    ``reverse=False``: d1 is the source, each d2 entity keeps its k best
    d1 candidates. ``reverse=True``: d2 is the source, each d1 entity keeps
    its k best d2 candidates. Either way the output is emitted in fixed
    (left=d1_id, right=d2_id, score) order, exactly as the reference flips
    the pair at emission so downstream ground-truth comparison is
    direction-agnostic.
    """
    if not reverse:
        return topk_join(d1, d2, k, sim, tokens_col, id_col)
    out = topk_join(d2, d1, k, sim, tokens_col, id_col)
    return out.select(
        F.col("right_id").alias("left_id"),
        F.col("left_id").alias("right_id"),
        F.col("score"),
    )
