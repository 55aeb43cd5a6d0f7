"""End-to-end ER pipeline (SURVEY.md §7 M1 slice).

    docs -> agg_text -> tokens -> blocking -> purging -> (filtering) ->
    comparison propagation -> set-sim scoring -> threshold ->
    connected components -> clusters

This is the reference's Parameter-Free Workflow
(``blockingWorkflows/.../schemaAgnostic/ParameterFreeWorkflow.java:52-61``:
StandardBlocking + ComparisonsBasedBlockPurging + ComparisonPropagation)
extended with the north rule's scoring + transitive clustering.

Stage materialization for resumability lives in plans/stages.py; this module
is the pure logical composition.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..datamodel import agg_text
from ..functions import tokenize as tk
from ..functions.similarity import set_similarity
from ..operators import blocking as B
from ..operators.cluster import clusters_with_singletons


@dataclass
class ERConfig:
    blocking: B.BlockingConfig = field(default_factory=B.BlockingConfig)
    sim: str = "jaccard"
    threshold: float = 0.5


def docs_with_tokens(docs: DataFrame, side_from_prefix: bool = True) -> DataFrame:
    """docs(doc_id, spans) -> (doc_id, side, text, tokens).

    ``side`` is derived from the doc_id prefix ('A:'/'B:') for Clean-Clean
    corpora; Dirty corpora get a constant side.
    """
    side = (
        F.when(F.col("doc_id").startswith("A:"), F.lit("A")).otherwise(F.lit("B"))
        if side_from_prefix
        else F.lit("A")
    )
    return docs.select(
        "doc_id",
        side.alias("side"),
        agg_text("spans").alias("text"),
    ).withColumn("tokens", tk.word_token_set("text"))


def _np_set_similarity(c, a, b, kind: str):
    """Numpy float64 mirror of ``functions.similarity.set_similarity`` — the
    same IEEE-double expression over exact integer operands, so scores are
    bit-identical to the SQL path (int->double is exact below 2^53; +,*,/ and
    sqrt are correctly rounded in both runtimes)."""
    import numpy as np

    if kind == "cosine":
        return c / np.sqrt(a * b)
    if kind == "dice":
        return 2.0 * c / (a + b)
    if kind == "jaccard":
        return c / (a + b - c)
    raise ValueError(f"unknown similarity {kind!r}")


# bitset-kernel caps (see _score_pairs_arrow): max 64-bit words per doc
# (vocabulary <= 4096) and max total dictionary bytes; tests override these
# to force each kernel
_BITSET_MAX_WORDS = 64
_BITSET_MAX_BYTES = 256 * 1024 * 1024


def _score_pairs_arrow(
    pairs: DataFrame, hashed: DataFrame, sim: str, min_score: float | None
) -> DataFrame:
    """Arrow-batched pair scorer over a broadcast token dictionary.

    The token table is collected once (caller gates on ``broadcast_rows``)
    into three flat numpy arrays (ids, concatenated token ids, offsets) and
    broadcast to the python workers; only (left_id, right_id) crosses Arrow.
    Per batch the intersection counts are computed fully vectorized: gather
    both sides' hashed-token runs, lexsort by (pair, token), count adjacent
    duplicates (each side is a set, so a duplicate == one common token).
    No per-row python — the batch cost is two numpy sort passes over the
    batch's tokens (north rule: "vectorized pandas/Arrow UDFs computing
    batched Jaccard ... scores", no per-row Python).
    """
    import numpy as np
    from pyspark.sql.types import DoubleType, StructField, StructType

    spark = pairs.sparkSession
    rows = hashed.collect()
    n_docs = len(rows)
    ids = [r[0] for r in rows]
    arrs = [np.asarray(r[1] or (), dtype=np.int64) for r in rows]
    lens = np.fromiter((a.size for a in arrs), dtype=np.int64, count=n_docs)
    offsets = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    flat = np.concatenate(arrs) if arrs else np.empty(0, dtype=np.int64)

    # rank-encode against the global vocabulary (known at dictionary-build
    # time): ranks are dense [0, V), which unlocks the two batch kernels
    vocab = np.unique(flat)
    V = max(int(vocab.size), 1)
    ranks = np.searchsorted(vocab, flat).astype(np.int64)
    W = (V + 63) // 64
    # mode choice: the bitset kernel is O(pairs x W) with no sort — it wins
    # while W stays small; past the caps the single-key sort kernel takes
    # over (this host: 65k-pair batch = ~4ms at W=1 vs ~2s sorted)
    use_bitset = W <= _BITSET_MAX_WORDS and n_docs * W * 8 <= _BITSET_MAX_BYTES
    if use_bitset:
        bits = np.zeros(n_docs * W, dtype=np.uint64)
        word = np.repeat(np.arange(n_docs, dtype=np.int64) * W, lens) + (ranks >> 6)
        bitval = (np.uint64(1) << (ranks & 63).astype(np.uint64))
        order = np.argsort(word, kind="stable")
        ws, vs = word[order], bitval[order]
        starts = np.flatnonzero(np.r_[True, ws[1:] != ws[:-1]])
        if ws.size:
            bits[ws[starts]] = np.bitwise_or.reduceat(vs, starts)
        bits = bits.reshape(n_docs, W)
        payload = ("bitset", ids, bits, lens)
    else:
        payload = ("sort", ids, ranks, offsets, V)
    bc = spark.sparkContext.broadcast(payload)

    out_schema = StructType(
        [
            StructField("left_id", pairs.schema["left_id"].dataType),
            StructField("right_id", pairs.schema["right_id"].dataType),
            StructField("score", DoubleType()),
        ]
    )

    def batches(it):
        import numpy as np
        import pandas as pd

        mode, ids_, *rest = bc.value
        index = pd.Index(ids_)
        if mode == "bitset":
            bits_, doc_lens = rest
            popcnt = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint16)
        else:
            ranks_, offsets_, v_ = rest
            doc_lens = np.diff(offsets_)
        for pdf in it:
            n = len(pdf)
            if n == 0:
                continue
            lv, rv = pdf["left_id"].values, pdf["right_id"].values
            li = index.get_indexer(lv)
            ri = index.get_indexer(rv)
            if (li < 0).any() or (ri < 0).any():
                raise KeyError("candidate pair references a doc_id missing from the token table")
            lsz, rsz = doc_lens[li], doc_lens[ri]
            if min_score is not None:
                # exact upper bound: score is maximal at c = min(|A|,|B|) —
                # prune pairs that cannot pass before any intersection work
                m = np.minimum(lsz, rsz).astype(np.float64)
                keep = _np_set_similarity(m, lsz.astype(np.float64), rsz.astype(np.float64), sim) >= min_score
                if not keep.all():
                    lv, rv = lv[keep], rv[keep]
                    li, ri, lsz, rsz = li[keep], ri[keep], lsz[keep], rsz[keep]
                    n = len(lv)
                    if n == 0:
                        continue
            if mode == "bitset":
                common = popcnt[(bits_[li] & bits_[ri]).view(np.uint8)].sum(
                    axis=1, dtype=np.int64
                )
            else:
                # single-key sort: key = pair * V + token_rank; each side is a
                # set, so an adjacent duplicate == one common token
                idx2 = np.concatenate([li, ri])
                seg_len = np.concatenate([lsz, rsz])
                pid = np.repeat(np.concatenate([np.arange(n), np.arange(n)]), seg_len)
                cl = np.cumsum(seg_len)
                within = np.arange(cl[-1], dtype=np.int64) - np.repeat(cl - seg_len, seg_len)
                toks = ranks_[np.repeat(offsets_[idx2], seg_len) + within]
                key = pid * v_ + toks
                if n * v_ < 2**31:
                    key = key.astype(np.int32)  # 3x faster sort on this host
                key.sort()
                dup = key[1:] == key[:-1]
                common = np.bincount(
                    (key[1:][dup] // v_).astype(np.int64), minlength=n
                )
            score = _np_set_similarity(
                common.astype(np.float64), lsz.astype(np.float64), rsz.astype(np.float64), sim
            )
            if min_score is not None:
                keep = score >= min_score
                lv, rv, score = lv[keep], rv[keep], score[keep]
            yield pd.DataFrame({"left_id": lv, "right_id": rv, "score": score})

    return pairs.select("left_id", "right_id").mapInPandas(batches, out_schema)


def score_pairs(
    pairs: DataFrame,
    tokened: DataFrame,
    sim: str = "jaccard",
    broadcast_rows: int | None = 1_000_000,
    engine: str = "auto",
    min_score: float | None = None,
) -> DataFrame:
    """Score candidate (left_id, right_id) pairs with exact set similarity.

    Tokens ride as hashed 64-bit ids (``tk.hash_token_set``) — primitive
    long arrays instead of string arrays everywhere downstream.

    ``engine``:

    * ``"arrow"`` — broadcast-token-dictionary scorer (``_score_pairs_arrow``):
      only pair ids cross Arrow, intersection counts are batched numpy
      (lexsort + adjacent-duplicate count). Measured ~2x the jvm path at
      12.5M pairs / local[32] even before the min_score prefilter; requires
      the token table under ``broadcast_rows``.
    * ``"jvm"`` — join the token arrays onto the pairs and
      ``size(array_intersect(...))``. The generic path at any scale: beyond
      the broadcast cap it is two shuffle joins, which production co-locates
      via doc_id bucketing. Under the cap the token tables are broadcast so
      the (pairs x wide-array) intermediate never crosses executors.
    * ``"auto"`` — arrow under the cap, jvm beyond it.

    ``min_score``: when set, only pairs with score >= min_score are
    returned, and an exact size-bound prefilter (score at c = min(|A|,|B|)
    is the achievable maximum) prunes un-passable pairs BEFORE any
    intersection work — pure codegen in the jvm path, vectorized numpy in
    the arrow path.

    The ``broadcast_rows`` probe is a bounded ``limit(cap+1).count()`` —
    it stops scanning at the cap instead of counting the whole table.
    """
    hashed = tokened.select("doc_id", tk.hash_token_set(F.col("tokens")).alias("_h"))
    under_cap = (
        broadcast_rows is not None
        and tokened.limit(broadcast_rows + 1).count() <= broadcast_rows
    )
    if engine == "auto":
        # arrow only when its bitset kernel will apply (small vocabulary):
        # the sort kernel exists as an explicit engine='arrow' choice but
        # does not beat the jvm join on large vocabularies. Probing the
        # vocabulary costs two small jobs, only run when under the cap
        # (<= broadcast_rows docs).
        engine = "jvm"
        if under_cap:
            v_est = (
                hashed.select(F.explode("_h").alias("_t"))
                .agg(F.approx_count_distinct("_t").alias("v"))
                .collect()[0]["v"]
            )
            w_est = (int(v_est * 1.2) + 63) // 64
            if (
                w_est <= _BITSET_MAX_WORDS
                and tokened.count() * w_est * 8 <= _BITSET_MAX_BYTES
            ):
                engine = "arrow"
    if engine == "arrow":
        if not under_cap:
            raise ValueError(
                "engine='arrow' needs the token table under broadcast_rows "
                f"({broadcast_rows}); use engine='jvm' beyond the cap"
            )
        return _score_pairs_arrow(pairs, hashed, sim, min_score)
    if engine != "jvm":
        raise ValueError(f"unknown engine {engine!r} (one of auto/jvm/arrow)")

    lt = hashed.select(
        F.col("doc_id").alias("left_id"),
        F.col("_h").alias("_ltok"),
        F.size("_h").alias("_lsz"),
    )
    rt = hashed.select(
        F.col("doc_id").alias("right_id"),
        F.col("_h").alias("_rtok"),
        F.size("_h").alias("_rsz"),
    )
    if under_cap:
        lt, rt = F.broadcast(lt), F.broadcast(rt)
    scored = pairs.join(lt, "left_id").join(rt, "right_id")
    if min_score is not None:
        max_achievable = set_similarity(
            F.least("_lsz", "_rsz"), F.col("_lsz"), F.col("_rsz"), sim
        )
        scored = scored.where(max_achievable >= F.lit(min_score))
    scored = scored.withColumn(
        "_common", F.size(F.array_intersect("_ltok", "_rtok"))
    ).withColumn(
        "score", set_similarity(F.col("_common"), F.col("_lsz"), F.col("_rsz"), sim)
    )
    if min_score is not None:
        scored = scored.where(F.col("score") >= F.lit(min_score))
    return scored.select("left_id", "right_id", "score")


def er_pipeline(
    docs: DataFrame, cfg: ERConfig | None = None, clean_clean: bool = True
) -> dict[str, DataFrame]:
    """Run the full pipeline; returns every stage for materialization/tests.

    Keys: tokened, blocks, candidate_pairs, matches, clusters.
    """
    cfg = cfg or ERConfig()
    cfg.blocking.clean_clean = clean_clean
    tokened = docs_with_tokens(docs, side_from_prefix=clean_clean)
    blocks = B.build_blocks(tokened, cfg.blocking)
    pairs = B.pairs_from_blocks(blocks, clean_clean)
    # min_score pushes the threshold into the scorer (exact size-bound
    # prefilter before any intersection work)
    matches = score_pairs(pairs, tokened, cfg.sim, min_score=cfg.threshold)
    clusters = clusters_with_singletons(docs, matches.select("left_id", "right_id"))
    return {
        "tokened": tokened,
        "blocks": blocks,
        "candidate_pairs": pairs,
        "matches": matches,
        "clusters": clusters,
    }
