"""Product-quantized kNN: codebook determinism, encode math, re-rank."""

import pytest
from pyspark.sql import functions as F

from continuousfilteringbenchmark_spark.operators.dense import (
    _pq_code_col,
    knn_exact,
    knn_pq,
    pq_train,
)


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "doc_id int, vec array<double>")


def _corpus(spark, n, d, a=37, b=11):
    rows = [
        (i, [((i * a + dd * b) % 97) / 97.0 + 0.01 for dd in range(d)])
        for i in range(n)
    ]
    return _vecs(spark, rows)


def test_pq_train_shape_and_determinism(spark):
    df = _corpus(spark, 20, 8)
    flat1, d1 = pq_train(df, m_sub=2, k_sub=4)
    flat2, d2 = pq_train(df.repartition(7), m_sub=2, k_sub=4)
    assert d1 == d2 == 8
    assert len(flat1) == 2 * 4 * 4  # m * k * dsub
    assert flat1 == flat2


def test_pq_train_validates(spark):
    df = _corpus(spark, 3, 8)
    with pytest.raises(ValueError, match="smaller than"):
        pq_train(df, m_sub=2, k_sub=16)
    with pytest.raises(ValueError, match="divisible"):
        pq_train(df, m_sub=3, k_sub=2)


def test_pq_encode_picks_nearest_codeword(spark):
    # corpus contains the codebook rows themselves: a codebook member must
    # encode to ITSELF in every subspace (distance 0 is uniquely minimal
    # for distinct codewords)
    df = _corpus(spark, 12, 8)
    flat, d = pq_train(df, m_sub=2, k_sub=4)
    dsub = d // 2
    from continuousfilteringbenchmark_spark.operators.dense import _norm

    enc = (
        df.select(F.col("doc_id"), _norm("vec").alias("_v"))
        .select("doc_id", "_v", _pq_code_col(flat, 2, 4, dsub).alias("codes"))
        .collect()
    )
    by_vec = {tuple(r["_v"]): list(r["codes"]) for r in enc}
    for i in range(2):
        for j in range(4):
            sub = tuple(flat[(i * 4 + j) * dsub : (i * 4 + j + 1) * dsub])
            # find a corpus row whose normalized subvector equals this codeword
            hits = [
                codes
                for v, codes in by_vec.items()
                if tuple(v[i * dsub : (i + 1) * dsub]) == sub
            ]
            assert hits and all(h[i] == j or _dup_codeword(flat, i, 4, dsub, j, h[i]) for h in hits)


def _dup_codeword(flat, i, k_sub, dsub, j, got):
    """Tie case: two sample rows shared a subvector — accept the smaller."""
    a = flat[(i * k_sub + j) * dsub : (i * k_sub + j + 1) * dsub]
    b = flat[(i * k_sub + got) * dsub : (i * k_sub + got + 1) * dsub]
    return a == b and got < j


def test_pq_full_rerank_equals_exact(spark):
    df = _corpus(spark, 14, 8)
    pq = knn_pq(df, None, k=3, m_sub=2, k_sub=4, rerank_factor=14)
    ex = knn_exact(df, df, k=3)
    assert sorted(map(tuple, pq.collect())) == sorted(map(tuple, ex.collect()))


def test_pq_recall_reasonable(spark):
    df = _corpus(spark, 30, 16, a=53, b=29)
    pq = {
        (r["query_id"], r["corpus_id"])
        for r in knn_pq(df, None, k=2, m_sub=4, k_sub=8, rerank_factor=5).collect()
    }
    ex = {(r["query_id"], r["corpus_id"]) for r in knn_exact(df, df, k=2).collect()}
    assert len(pq & ex) / len(ex) >= 0.6


def test_pq_partition_invariant(spark):
    df = _corpus(spark, 12, 8)
    a = sorted(map(tuple, knn_pq(df.repartition(1), None, k=2, m_sub=2, k_sub=4).collect()))
    b = sorted(map(tuple, knn_pq(df.repartition(8), None, k=2, m_sub=2, k_sub=4).collect()))
    assert a == b
