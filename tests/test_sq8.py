"""SQ8 scalar-quantized kNN: code math, re-rank exactness, recall."""

import pytest
from pyspark.sql import functions as F

from continuousfilteringbenchmark_spark.operators.dense import (
    knn_exact,
    knn_sq8,
    sq8_train,
    _sq8_code_col,
)


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "doc_id int, vec array<double>")


def test_sq8_train_and_codes(spark):
    # 1-d corpus already unit-norm after normalization: values {-1, 1}
    df = _vecs(spark, [(1, [1.0, 0.0]), (2, [-1.0, 0.0]), (3, [0.0, 1.0])])
    stats = sq8_train(df)
    assert stats[0] == (-1.0, 2.0)  # dim 0: min -1, range 2
    assert stats[1] == (0.0, 1.0)  # dim 1: min 0, range 1
    from continuousfilteringbenchmark_spark.operators.dense import _norm

    # codes are specified over NORMALIZED vectors (these inputs are unit
    # norm already, but the test pins the real pipeline's shape)
    codes = {
        r["doc_id"]: list(r["c"])
        for r in df.select(
            "doc_id", _norm("vec").alias("_v")
        ).select("doc_id", _sq8_code_col(stats).alias("c")).collect()
    }
    # x=1: (1-(-1))/2*256 = 256 -> clamp 255; x=-1 -> 0; x=0 -> 128
    assert codes[1] == [255, 0]
    assert codes[2] == [0, 0]
    assert codes[3] == [128, 255]


def test_sq8_constant_dim_is_zero(spark):
    df = _vecs(spark, [(1, [0.6, 0.8]), (2, [0.6, 0.8])])
    stats = sq8_train(df)
    assert stats[0][1] == 0.0 and stats[1][1] == 0.0
    out = knn_sq8(df, None, k=1)
    rows = out.collect()
    assert len(rows) == 2 and all(r["score"] == pytest.approx(1.0) for r in rows)


def test_sq8_full_rerank_equals_exact(spark):
    # deterministic distinct-score corpus; with rerank_factor covering the
    # whole corpus the SQ8 result must equal exact top-k (no score ties)
    rows = [
        (i, [((i * 37 + d * 11) % 97) / 97.0 + 0.01 for d in range(8)])
        for i in range(12)
    ]
    df = _vecs(spark, rows)
    sq = knn_sq8(df, None, k=3, rerank_factor=12)
    ex = knn_exact(df, df, k=3)
    # knn_exact is tie-inclusive; this corpus has no exact ties, so both
    # emit exactly 3 rows per query with identical membership and scores
    a = sorted(map(tuple, sq.collect()))
    b = sorted(map(tuple, ex.collect()))
    assert a == b


def test_sq8_small_rerank_recall(spark):
    rows = [
        (i, [((i * 53 + d * 29) % 101) / 101.0 for d in range(16)])
        for i in range(30)
    ]
    df = _vecs(spark, rows)
    sq = {(r["query_id"], r["corpus_id"]) for r in knn_sq8(df, None, k=2, rerank_factor=4).collect()}
    ex = {(r["query_id"], r["corpus_id"]) for r in knn_exact(df, df, k=2).collect()}
    # 8-bit codes at d=16 are near-lossless: expect high overlap
    assert len(sq & ex) / len(ex) >= 0.9


def test_sq8_partition_invariant(spark):
    rows = [(i, [((i * 7 + d) % 13) / 13.0 for d in range(4)]) for i in range(10)]
    df = _vecs(spark, rows)
    a = sorted(map(tuple, knn_sq8(df.repartition(1), None, k=2).collect()))
    b = sorted(map(tuple, knn_sq8(df.repartition(8), None, k=2).collect()))
    assert a == b
