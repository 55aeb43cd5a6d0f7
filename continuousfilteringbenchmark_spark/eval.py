"""Evaluation operators (SURVEY.md §2.6, E1-E5).

PC (Pair Completeness = recall), PQ (Pairs Quality = precision), F1 —
computed exactly as the reference does
(``joins/src/joins/TopKSchemaAgnosticJoin.java:177-195``;
``nnmethods/minhashLSH/src/experiments/schemaAgnostic.java:105-124``):
candidate pairs joined against gold with canonical (min,max) ordering
(``nnmethods/scalabilityAnalysis/MH_LSH.py:88-98``).

Also the pairwise-F1-vs-clusters gate: clusters -> implied intra-cluster
pairs -> PC/PQ/F1 against gold pairs.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def canonical_pairs(pairs: DataFrame, left: str = "left_id", right: str = "right_id") -> DataFrame:
    """E4: (min,max) ordering + dedup (MH_LSH.py:88-98)."""
    return (
        pairs.select(
            F.least(F.col(left), F.col(right)).alias("left_id"),
            F.greatest(F.col(left), F.col(right)).alias("right_id"),
        )
        .where(F.col("left_id") != F.col("right_id"))
        .distinct()
    )


@dataclass
class PairMetrics:
    true_positives: int
    candidates: int
    gold: int

    @property
    def pc(self) -> float:  # recall
        return self.true_positives / self.gold if self.gold else 0.0

    @property
    def pq(self) -> float:  # precision
        return self.true_positives / self.candidates if self.candidates else 0.0

    @property
    def f1(self) -> float:
        p, r = self.pq, self.pc
        return 2 * p * r / (p + r) if (p + r) else 0.0


def evaluate_pairs(candidates: DataFrame, gold: DataFrame) -> PairMetrics:
    """E1-E3 against a gold pair table (both canonicalized first)."""
    cand = canonical_pairs(candidates)
    g = canonical_pairs(gold)
    tp = cand.join(g, ["left_id", "right_id"], "inner").count()
    return PairMetrics(true_positives=tp, candidates=cand.count(), gold=g.count())


def cluster_pairs(clusters: DataFrame) -> DataFrame:
    """Implied intra-cluster pairs (left<right) from (doc_id, cluster_id).

    Scale note: quadratic per cluster — ER clusters are small by construction
    (post-threshold match graphs); a runaway cluster signals a bad threshold,
    guarded by the purging/salting caps upstream.
    """
    a = clusters.select(F.col("cluster_id"), F.col("doc_id").alias("left_id"))
    b = clusters.select(F.col("cluster_id"), F.col("doc_id").alias("right_id"))
    return (
        a.join(b, "cluster_id")
        .where(F.col("left_id") < F.col("right_id"))
        .select("left_id", "right_id")
        .distinct()
    )


def evaluate_clusters(clusters: DataFrame, gold_pairs: DataFrame) -> PairMetrics:
    """Pairwise F1 of a clustering vs gold pairs (the BASELINE.json gate)."""
    return evaluate_pairs(cluster_pairs(clusters), gold_pairs)


def bcubed_contingency(clusters: DataFrame, gold: DataFrame) -> DataFrame:
    """Per-doc B-cubed contingency (Bagga & Baldwin '98; Amigo et al. '09
    showed B-cubed is the extrinsic clustering metric satisfying all four
    formal constraints — pairwise F1 over-rewards large clusters).

    Inputs: two (doc_id, cluster_id)-shaped tables (``gold`` column name
    ``cluster_id`` as well). Output per doc, ALL-INTEGER (exactly
    reproducible in any engine):

        (doc_id, c_size, g_size, overlap)

    where c_size = |system cluster of doc|, g_size = |gold cluster|,
    overlap = |intersection of the two|. B-cubed precision for the doc is
    overlap/c_size, recall overlap/g_size; the corpus scalars are the
    averages (``bcubed``). Three aggregations with map-side combine — no
    quadratic pair materialization (unlike ``cluster_pairs``), so the
    metric itself scales to arbitrarily large clusters.
    """
    sys_a = clusters.select("doc_id", F.col("cluster_id").alias("_c"))
    gold_a = gold.select("doc_id", F.col("cluster_id").alias("_g"))
    j = sys_a.join(gold_a, "doc_id")
    csz = j.groupBy("_c").agg(F.count(F.lit(1)).alias("c_size"))
    gsz = j.groupBy("_g").agg(F.count(F.lit(1)).alias("g_size"))
    ov = j.groupBy("_c", "_g").agg(F.count(F.lit(1)).alias("overlap"))
    return (
        j.join(csz, "_c")
        .join(gsz, "_g")
        .join(ov, ["_c", "_g"])
        .select("doc_id", "c_size", "g_size", "overlap")
    )


def rand_contingency(clusters: DataFrame, gold: DataFrame) -> DataFrame:
    """ONE row of the four integer Rand-index components (Hubert & Arabie
    '85): n docs, sum over contingency cells of C(n_ij, 2), sum over system
    clusters of C(a_i, 2), sum over gold clusters of C(b_j, 2). All exact
    integer arithmetic (x*(x-1) is even, so `div 2` is lossless) — any SQL
    engine reproduces the row bit-for-bit; the float ARI scalar is
    ``adjusted_rand``. BIGINT accumulators are good to ~10^9 docs per
    evaluation scope; at full 10^12-doc scope switch the sums to
    decimal(38,0) (the shuffle shape is unchanged)."""
    sys_a = clusters.select("doc_id", F.col("cluster_id").alias("_c"))
    gold_a = gold.select("doc_id", F.col("cluster_id").alias("_g"))
    j = sys_a.join(gold_a, "doc_id")

    def _pairs(cnt):
        return F.expr(f"({cnt} * ({cnt} - 1)) div 2")

    cells = (
        j.groupBy("_c", "_g")
        .agg(F.count(F.lit(1)).alias("_n"))
        .agg(F.sum(_pairs("_n")).alias("sum_pairs_cells"))
    )
    sysp = (
        j.groupBy("_c")
        .agg(F.count(F.lit(1)).alias("_n"))
        .agg(F.sum(_pairs("_n")).alias("sum_pairs_sys"))
    )
    goldp = (
        j.groupBy("_g")
        .agg(F.count(F.lit(1)).alias("_n"))
        .agg(F.sum(_pairs("_n")).alias("sum_pairs_gold"))
    )
    n = j.agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        n.crossJoin(F.broadcast(cells))
        .crossJoin(F.broadcast(sysp))
        .crossJoin(F.broadcast(goldp))
        .select("n_docs", "sum_pairs_cells", "sum_pairs_sys", "sum_pairs_gold")
    )


def adjusted_rand(clusters: DataFrame, gold: DataFrame) -> float:
    """Adjusted Rand Index scalar from the integer components: 1.0 for an
    identical partition, ~0 for random agreement."""
    r = rand_contingency(clusters, gold).collect()[0]
    n2 = r["n_docs"] * (r["n_docs"] - 1) // 2
    if n2 == 0:
        return 1.0
    idx = r["sum_pairs_cells"]
    exp = r["sum_pairs_sys"] * r["sum_pairs_gold"] / n2
    mx = (r["sum_pairs_sys"] + r["sum_pairs_gold"]) / 2
    if mx == exp:
        return 1.0
    return float((idx - exp) / (mx - exp))


@dataclass
class BCubedMetrics:
    precision: float
    recall: float
    n_docs: int

    @property
    def f1(self) -> float:
        p, r = self.precision, self.recall
        return 2 * p * r / (p + r) if (p + r) else 0.0


def bcubed(clusters: DataFrame, gold: DataFrame) -> BCubedMetrics:
    """Corpus-level B-cubed precision/recall/F1 (averages of the per-doc
    ratios from ``bcubed_contingency``). One extra global aggregate; the
    float average is Spark's sum (order may vary at the last ulp — the
    integer ``bcubed_contingency`` surface is the oracle-checked one)."""
    row = (
        bcubed_contingency(clusters, gold)
        .agg(
            F.avg(F.col("overlap") / F.col("c_size")).alias("p"),
            F.avg(F.col("overlap") / F.col("g_size")).alias("r"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()[0]
    )
    return BCubedMetrics(
        precision=float(row["p"] or 0.0),
        recall=float(row["r"] or 0.0),
        n_docs=int(row["n"]),
    )
