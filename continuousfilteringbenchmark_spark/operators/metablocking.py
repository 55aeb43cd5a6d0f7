"""Meta-blocking: comparison cleaning via pair weighting + pruning
(SURVEY.md §2.3, B9-B15).

The reference drives these through the JedAI jar
(``blockingWorkflowsL1L2L3/src/l1/TokenBlocking.java:83-85`` selects the
algorithm + weighting scheme from numbered grids); semantics are re-derived
from the published definitions (Papadakis et al., "Comparison-Based
Meta-Blocking" / VLDB'16 survey cited at reference ``README.md:38``; BLAST:
Simonini et al. VLDB'16).

Everything is pure groupBy/join/window arithmetic on the exploded block
table (block_key, side, doc_id):

* pair weights from co-occurrence counts (CBS) + per-entity block counts +
  per-block sizes — one shuffle on block_key to emit pairs, one hash agg on
  the pair key;
* pruning = scalar / per-node thresholds via broadcastable aggregates and
  windows.

Weighting schemes (the FULL 15-scheme grid of the reference's bundled
JedAI 3.01, ``blockingWorkflowsL1L2L3/lib/jedai-core-3.01-SNAPSHOT.jar``,
whose ``WeightingScheme`` enum the tuned ``wScheme`` grid ids index —
semantics read from ``AbstractMetablocking.getWeight/getNormWeight/
setStatistics/processNormEntity`` bytecode)::

    CBS     = |B_i ∩ B_j|                                (common blocks)
    COSINE  = CBS / sqrt(|B_i| * |B_j|)
    DICE    = 2*CBS / (|B_i| + |B_j|)
    ECBS    = CBS * log10(|B|/|B_i|) * log10(|B|/|B_j|)
    JS      = CBS / (|B_i| + |B_j| - CBS)
    EJS     = JS * log10(|V|/deg_i) * log10(|V|/deg_j)   (deg = distinct candidates)
    X2      = Pearson chi-square of the 2x2 block-co-occurrence table (BLAST)

    with cn_ij = Σ_{b ∈ B_i∩B_j} 1/||b||  (||b|| = comparisons in b) and
    cn_i = Σ_{b ∈ B_i} 1/||b||  (per-entity CARDINALITY norm sums):
    CARDINALITY_NORM_CBS (= ARCS) = cn_ij
    CARDINALITY_NORM_COSINE       = cn_ij / sqrt(cn_i * cn_j)
    CARDINALITY_NORM_DICE         = 2*cn_ij / (cn_i + cn_j)
    CARDINALITY_NORM_JS           = cn_ij / (cn_i + cn_j - cn_ij)

    with sn_ij / sn_i the same sums over 1/|b| (block ASSIGNMENTS):
    SIZE_NORM_CBS                 = sn_ij
    SIZE_NORM_COSINE              = sn_ij / sqrt(sn_i * sn_j)
    SIZE_NORM_DICE                = 2*sn_ij / (sn_i + sn_j)
    SIZE_NORM_JS                  = sn_ij / (sn_i + sn_j - sn_ij)

``ARCS`` and ``X2`` are accepted aliases for CARDINALITY_NORM_CBS and
PEARSON_X2 (the names the 6-scheme jedai-core 3.2.1 enum uses).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

WEIGHT_SCHEMES = (
    "CBS",
    "COSINE",
    "DICE",
    "ECBS",
    "JS",
    "EJS",
    "PEARSON_X2",
    "CARDINALITY_NORM_CBS",
    "CARDINALITY_NORM_COSINE",
    "CARDINALITY_NORM_DICE",
    "CARDINALITY_NORM_JS",
    "SIZE_NORM_CBS",
    "SIZE_NORM_COSINE",
    "SIZE_NORM_DICE",
    "SIZE_NORM_JS",
)
_SCHEME_ALIASES = {"ARCS": "CARDINALITY_NORM_CBS", "X2": "PEARSON_X2"}


def _block_stats(blocks: DataFrame, clean_clean: bool) -> DataFrame:
    """Per-block cardinality (comparisons) and assignments (size)."""
    if clean_clean:
        sizes = blocks.groupBy("block_key").agg(
            F.sum(F.when(F.col("side") == "A", 1).otherwise(0)).alias("n_a"),
            F.sum(F.when(F.col("side") == "B", 1).otherwise(0)).alias("n_b"),
        )
        return sizes.select(
            "block_key",
            (F.col("n_a") * F.col("n_b")).cast("double").alias("cardinality"),
            (F.col("n_a") + F.col("n_b")).cast("double").alias("assignments"),
        )
    sizes = blocks.groupBy("block_key").agg(F.count("*").alias("n"))
    return sizes.select(
        "block_key",
        (F.col("n") * (F.col("n") - 1) / 2.0).alias("cardinality"),
        F.col("n").cast("double").alias("assignments"),
    )


def _pair_base(blocks: DataFrame, clean_clean: bool) -> DataFrame:
    """Co-occurring pairs with CBS + per-block-normalized ingredients.

    Emits one row per (pair, shared block) then aggregates — the same
    explode-join-aggregate shape as the token join (SURVEY.md §2.7).
    """
    sizes = _block_stats(blocks, clean_clean)
    if clean_clean:
        left = blocks.where(F.col("side") == "A").select("block_key", F.col("doc_id").alias("left_id"))
        right = blocks.where(F.col("side") == "B").select("block_key", F.col("doc_id").alias("right_id"))
        co = left.join(right, "block_key")
    else:
        l = blocks.select("block_key", F.col("doc_id").alias("left_id"))
        r = blocks.select("block_key", F.col("doc_id").alias("right_id"))
        co = l.join(r, "block_key").where(F.col("left_id") < F.col("right_id"))
    co = co.join(sizes, "block_key")
    return co.groupBy("left_id", "right_id").agg(
        F.count("*").alias("cbs"),
        F.sum(F.lit(1.0) / F.col("cardinality")).alias("arcs"),
        F.sum(F.lit(1.0) / F.col("assignments")).alias("sn"),
    )


def _entity_block_counts(blocks: DataFrame) -> DataFrame:
    return blocks.groupBy("side", "doc_id").agg(F.countDistinct("block_key").alias("n_blocks"))


def _entity_norm_sums(blocks: DataFrame, clean_clean: bool) -> DataFrame:
    """Per-entity Σ 1/cardinality and Σ 1/assignments over the entity's
    blocks (JedAI ``setStatistics`` weightPerEntity, one row per entity)."""
    stats = _block_stats(blocks, clean_clean)
    return (
        blocks.join(stats, "block_key")
        .groupBy("side", "doc_id")
        .agg(
            F.sum(F.lit(1.0) / F.col("cardinality")).alias("cn_e"),
            F.sum(F.lit(1.0) / F.col("assignments")).alias("sn_e"),
        )
    )


def weighted_pairs(
    blocks: DataFrame, scheme: str = "CBS", clean_clean: bool = True
) -> DataFrame:
    """B9: candidate pairs weighted by the chosen scheme.

    Output: (left_id, right_id, weight). Per-entity/-block stats ride along
    via broadcastable joins (one row per entity / per block).
    """
    scheme = scheme.upper()
    scheme = _SCHEME_ALIASES.get(scheme, scheme)
    if scheme not in WEIGHT_SCHEMES:
        raise ValueError(f"unknown weighting scheme {scheme!r}")
    pairs = _pair_base(blocks, clean_clean)
    n_blocks_total = blocks.select("block_key").distinct().count()
    ents = _entity_block_counts(blocks)
    if clean_clean:
        left_counts = ents.where(F.col("side") == "A").select(
            F.col("doc_id").alias("left_id"), F.col("n_blocks").alias("bi")
        )
        right_counts = ents.where(F.col("side") == "B").select(
            F.col("doc_id").alias("right_id"), F.col("n_blocks").alias("bj")
        )
    else:
        left_counts = ents.select(F.col("doc_id").alias("left_id"), F.col("n_blocks").alias("bi"))
        right_counts = ents.select(F.col("doc_id").alias("right_id"), F.col("n_blocks").alias("bj"))
    # no forced broadcast: these tables are one row per ENTITY (10^9 rows at
    # corpus scale) — AQE broadcasts them when they are actually small
    pairs = pairs.join(left_counts, "left_id").join(right_counts, "right_id")
    if scheme in (
        "CARDINALITY_NORM_COSINE",
        "CARDINALITY_NORM_DICE",
        "CARDINALITY_NORM_JS",
        "SIZE_NORM_COSINE",
        "SIZE_NORM_DICE",
        "SIZE_NORM_JS",
    ):
        norms = _entity_norm_sums(blocks, clean_clean)
        if clean_clean:
            nl = norms.where(F.col("side") == "A")
            nr = norms.where(F.col("side") == "B")
        else:
            nl = nr = norms
        pairs = pairs.join(
            nl.select(F.col("doc_id").alias("left_id"), F.col("cn_e").alias("cn_i"), F.col("sn_e").alias("sn_i")),
            "left_id",
        ).join(
            nr.select(F.col("doc_id").alias("right_id"), F.col("cn_e").alias("cn_j"), F.col("sn_e").alias("sn_j")),
            "right_id",
        )

    B = float(n_blocks_total)
    cbs = F.col("cbs").cast("double")
    if scheme == "CBS":
        w = cbs
    elif scheme == "COSINE":
        w = cbs / F.sqrt(F.col("bi") * F.col("bj"))
    elif scheme == "DICE":
        w = 2.0 * cbs / (F.col("bi") + F.col("bj"))
    elif scheme == "ECBS":
        w = cbs * F.log10(F.lit(B) / F.col("bi")) * F.log10(F.lit(B) / F.col("bj"))
    elif scheme == "JS":
        w = cbs / (F.col("bi") + F.col("bj") - cbs)
    elif scheme == "CARDINALITY_NORM_CBS":
        w = F.col("arcs")
    elif scheme == "CARDINALITY_NORM_COSINE":
        w = F.col("arcs") / F.sqrt(F.col("cn_i") * F.col("cn_j"))
    elif scheme == "CARDINALITY_NORM_DICE":
        w = 2.0 * F.col("arcs") / (F.col("cn_i") + F.col("cn_j"))
    elif scheme == "CARDINALITY_NORM_JS":
        w = F.col("arcs") / (F.col("cn_i") + F.col("cn_j") - F.col("arcs"))
    elif scheme == "SIZE_NORM_CBS":
        w = F.col("sn")
    elif scheme == "SIZE_NORM_COSINE":
        w = F.col("sn") / F.sqrt(F.col("sn_i") * F.col("sn_j"))
    elif scheme == "SIZE_NORM_DICE":
        w = 2.0 * F.col("sn") / (F.col("sn_i") + F.col("sn_j"))
    elif scheme == "SIZE_NORM_JS":
        w = F.col("sn") / (F.col("sn_i") + F.col("sn_j") - F.col("sn"))
    elif scheme == "EJS":
        # degree = number of distinct candidates of the NODE across both
        # roles (published EJS definition). In Dirty ER the canonical
        # left<right ordering splits a node's edges over both columns, so a
        # per-role count would undercount; the node-centric union view is
        # exact for Clean-Clean too (roles coincide with sides there).
        deg = (
            pairs.select(F.col("left_id").alias("node"))
            .union(pairs.select(F.col("right_id").alias("node")))
            .groupBy("node")
            .agg(F.count("*").alias("deg"))
        )
        deg_l = deg.select(F.col("node").alias("left_id"), F.col("deg").alias("deg_i"))
        deg_r = deg.select(F.col("node").alias("right_id"), F.col("deg").alias("deg_j"))
        # |V| in the same lazy plan (no separate driver-side count/collect
        # materializing the pair graph twice): scalar aggregate + cross join
        v_df = pairs.agg(
            F.greatest(F.count("*"), F.lit(1)).cast("double").alias("_v")
        )
        pairs = (
            pairs.join(deg_l, "left_id")
            .join(deg_r, "right_id")
            .crossJoin(F.broadcast(v_df))
        )
        js = cbs / (F.col("bi") + F.col("bj") - cbs)
        w = (
            js
            * F.log10(F.col("_v") / F.col("deg_i"))
            * F.log10(F.col("_v") / F.col("deg_j"))
        )
    else:  # PEARSON_X2 (chi-square of the co-occurrence table, BLAST weights)
        o11 = cbs
        o12 = F.col("bi") - cbs
        o21 = F.col("bj") - cbs
        o22 = F.lit(B) - F.col("bi") - F.col("bj") + cbs
        # square via multiplication (not pow): bit-exact and oracle-mirrorable
        diff = o11 * o22 - o12 * o21
        num = F.lit(B) * (diff * diff)
        den = (o11 + o12) * (o21 + o22) * (o11 + o21) * (o12 + o22)
        w = F.when(den > 0, num / den).otherwise(F.lit(0.0))
    return pairs.select("left_id", "right_id", w.cast("double").alias("weight"))


# ----------------------------------------------------------------- pruners


def wep(weighted: DataFrame, round_digits: int | None = None) -> DataFrame:
    """B10 Weighted Edge Pruning: keep pairs with weight >= global mean.

    ``round_digits`` rounds the mean before the comparison: the float mean's
    low-order bits depend on summation order (shuffled partitions), so
    boundary pairs could flip run-to-run / vs an oracle; rounding pins the
    threshold deterministically.
    """
    m = F.avg("weight")
    if round_digits is not None:
        m = F.round(m, round_digits)
    mean = weighted.agg(m.alias("m"))
    return (
        weighted.crossJoin(F.broadcast(mean))
        .where(F.col("weight") >= F.col("m"))
        .select("left_id", "right_id", "weight")
    )


def cep(weighted: DataFrame, k: int | None = None, blocks: DataFrame | None = None) -> DataFrame:
    """B11 Cardinality Edge Pruning: keep the global top-K weighted pairs.

    Default K = floor(total block assignments / 2) (meta-blocking paper's
    BC/2 budget) — requires ``blocks`` when ``k`` is None. Ties at the K-th
    weight are broken deterministically by (weight desc, left_id, right_id).
    """
    if k is None:
        if blocks is None:
            raise ValueError("cep needs k or the block table to derive it")
        k = int(blocks.count() // 2)
    # distributed top-K (TakeOrderedAndProject): per-partition heaps merged on
    # the driver — a partition-less row_number window would sort the ENTIRE
    # weighted pair graph in one task (OOM at corpus scale)
    return (
        weighted.orderBy(
            F.col("weight").desc(), F.col("left_id").asc(), F.col("right_id").asc()
        )
        .limit(k)
        .select("left_id", "right_id", "weight")
    )


def _node_edges(weighted: DataFrame) -> DataFrame:
    """Node-centric view: each edge appears once per endpoint."""
    a = weighted.select(
        F.col("left_id").alias("node"), "left_id", "right_id", "weight"
    )
    b = weighted.select(
        F.col("right_id").alias("node"), "left_id", "right_id", "weight"
    )
    return a.union(b)


def wnp(weighted: DataFrame, reciprocal: bool = False) -> DataFrame:
    """B12/B14 (Reciprocal) Weighted Node Pruning: per-node mean-weight
    threshold; an edge survives if it passes for >=1 endpoint (union) or
    both (reciprocal intersection)."""
    ne = _node_edges(weighted)
    thr = Window.partitionBy("node")
    flags = ne.withColumn("_pass", (F.col("weight") >= F.avg("weight").over(thr)).cast("int"))
    agg = flags.groupBy("left_id", "right_id", "weight").agg(F.sum("_pass").alias("_n_pass"))
    need = 2 if reciprocal else 1
    return agg.where(F.col("_n_pass") >= need).select("left_id", "right_id", "weight")


def cnp(
    weighted: DataFrame,
    k: int | None = None,
    blocks: DataFrame | None = None,
    n_entities: int | None = None,
    reciprocal: bool = False,
) -> DataFrame:
    """B13/B14 (Reciprocal) Cardinality Node Pruning: per-node top-k.

    Default k = max(1, round(BC / |E|) - 1) where BC = total block
    assignments (meta-blocking paper's per-node budget). Deterministic
    tie-break by (weight desc, other_id).
    """
    if k is None:
        if blocks is None:
            raise ValueError("cnp needs k or the block table to derive it")
        bc = blocks.count()
        n = n_entities or blocks.select("side", "doc_id").distinct().count()
        # floor(x + 0.5), not python round(): banker's rounding at .5 would
        # disagree with SQL oracles (and most other engines)
        k = max(1, int(math.floor(bc / max(n, 1) + 0.5)) - 1)
    ne = _node_edges(weighted).withColumn(
        "_other", F.when(F.col("node") == F.col("left_id"), F.col("right_id")).otherwise(F.col("left_id"))
    )
    w = Window.partitionBy("node").orderBy(F.col("weight").desc(), F.col("_other").asc())
    flags = ne.withColumn("_pass", (F.row_number().over(w) <= k).cast("int"))
    agg = flags.groupBy("left_id", "right_id", "weight").agg(F.sum("_pass").alias("_n_pass"))
    need = 2 if reciprocal else 1
    return agg.where(F.col("_n_pass") >= need).select("left_id", "right_id", "weight")


def blast_prune(weighted: DataFrame, ratio: float = 0.35) -> DataFrame:
    """BLAST's pruning rule on an already-weighted pair table: keep an edge
    iff weight >= ratio * (local_max_i + local_max_j) / 2."""
    ne = _node_edges(weighted)
    maxes = ne.groupBy("node").agg(F.max("weight").alias("node_max"))
    lm = maxes.select(F.col("node").alias("left_id"), F.col("node_max").alias("_ml"))
    rm = maxes.select(F.col("node").alias("right_id"), F.col("node_max").alias("_mr"))
    # per-node max tables scale with |E| — never force-broadcast them
    return (
        weighted.join(lm, "left_id")
        .join(rm, "right_id")
        .where(F.col("weight") >= F.lit(ratio) * (F.col("_ml") + F.col("_mr")) / 2.0)
        .select("left_id", "right_id", "weight")
    )


def blast(blocks: DataFrame, ratio: float = 0.35, clean_clean: bool = True) -> DataFrame:
    """B15 BLAST (Simonini et al. VLDB'16): X2 weights + node pruning with
    threshold = ratio * (local_max_i + local_max_j) / 2
    (``ComparisonCleaningMethod.BLAST`` selected at reference
    ``blockingWorkflowsL1L2L3/src/l1/TokenBlocking.java:35``)."""
    return blast_prune(weighted_pairs(blocks, "X2", clean_clean), ratio)


def prune(
    blocks: DataFrame,
    algorithm: str,
    scheme: str = "CBS",
    clean_clean: bool = True,
    **kwargs,
) -> DataFrame:
    """One entry point mirroring the reference's numbered-grid selection
    (``l1/TokenBlocking.java:83-85``): algorithm in {WEP, CEP, WNP, CNP,
    RWNP, RCNP, BLAST}."""
    algorithm = algorithm.upper()
    if algorithm == "BLAST":
        return blast(blocks, clean_clean=clean_clean, **kwargs)
    weighted = weighted_pairs(blocks, scheme, clean_clean)
    if algorithm == "WEP":
        return wep(weighted)
    if algorithm == "CEP":
        return cep(weighted, blocks=blocks, **kwargs)
    if algorithm == "WNP":
        return wnp(weighted, reciprocal=False)
    if algorithm == "RWNP":
        return wnp(weighted, reciprocal=True)
    if algorithm == "CNP":
        return cnp(weighted, blocks=blocks, reciprocal=False, **kwargs)
    if algorithm == "RCNP":
        return cnp(weighted, blocks=blocks, reciprocal=True, **kwargs)
    raise ValueError(f"unknown pruning algorithm {algorithm!r}")
