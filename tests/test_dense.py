"""Recall gates for the composed IVF-PQ scale path (X30).

Two gates, because recall on the driver's synthetic embeddings table is
bounded by the DATA, not the plan: those vectors are i.i.d. random (mean
pairwise cosine ~ -0.0003, p99 ~ 0.29 measured on sf0.001), and on
structureless vectors ANY cell-pruning ANN's recall is capped near the
fraction of the corpus scanned — an information-theoretic property, not an
implementation defect (measured ceiling: IVF cells ALONE at nprobe=12/16
reach 0.92).

Gate 1 therefore measures the operating point on a CLUSTERED corpus (the
regime ANN methods exist for) and requires recall@5 >= 0.9; gate 2 runs on
the real embeddings table and requires the PQ layer to cost <= 5% recall
relative to the SAME coarse cells without compression — proving the codes
+ADC+re-rank stack is near-lossless even where the cells themselves are
recall-limited.
"""

from __future__ import annotations

import os

import numpy as np
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from continuousfilteringbenchmark_spark.operators.dense import (
    knn_exact,
    knn_ivf,
    knn_ivfpq,
)

# the registry/bench operating point (q_knn_ivfpq)
POINT = dict(n_cells=16, nprobe=4, m_sub=8, k_sub=64, rerank_factor=8)


def _strict_top5(df):
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("corpus_id").asc()
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where("_rn <= 5")
        .select("query_id", "corpus_id")
    )


def _recall(approx, exact_top) -> float:
    hits = _strict_top5(approx).join(exact_top, ["query_id", "corpus_id"]).count()
    return hits / exact_top.count()


def test_ivfpq_recall_on_clustered_corpus(spark):
    """Gate 1: recall@5 >= 0.9 at the bench operating point where the ANN
    assumption (cluster structure) holds. Seeded 16-cluster corpus;
    measured ~0.99 at authoring time."""
    rng = np.random.RandomState(7)
    centers = rng.randn(16, 64)
    rows = [
        (f"v{i:04d}", [float(x) for x in centers[i % 16] + 0.25 * rng.randn(64)])
        for i in range(600)
    ]
    vecs = spark.createDataFrame(rows, "vec_id string, vec array<double>").repartition(8)
    exact_top = _strict_top5(knn_exact(vecs, vecs, k=5, id_col="vec_id")).cache()
    r = _recall(knn_ivfpq(vecs, None, k=5, id_col="vec_id", **POINT), exact_top)
    assert r >= 0.9, f"IVF-PQ recall@5 {r:.3f} < 0.9 on clustered corpus"


def test_ivfpq_layer_lossless_vs_cells(spark):
    """Gate 2: on the real (structureless) embeddings table the PQ codes +
    ADC + exact re-rank may cost at most 5% recall vs the SAME sampled
    cells scanned uncompressed (knn_ivf, identical seed/nprobe)."""
    path = "/root/testdata/sf0.001/embeddings.parquet"
    if not os.path.exists(path):  # ADVICE r4: skip, don't error, off-sandbox
        pytest.skip("sf0.001 embeddings fixture absent")
    vecs = (
        spark.read.parquet(path)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("vec"))
    )
    exact_top = _strict_top5(knn_exact(vecs, vecs, k=5, id_col="vec_id")).cache()
    r_cells = _recall(
        knn_ivf(
            vecs, vecs, k=5, n_cells=16, nprobe=4, quantizer="sample", id_col="vec_id"
        ),
        exact_top,
    )
    r_ivfpq = _recall(knn_ivfpq(vecs, None, k=5, id_col="vec_id", **POINT), exact_top)
    assert r_ivfpq >= 0.95 * r_cells, (
        f"PQ layer lost too much recall: ivfpq {r_ivfpq:.3f} vs cells {r_cells:.3f}"
    )
