"""IVF-PQ composition: cells prune, codes compress, re-rank restores."""

from continuousfilteringbenchmark_spark.operators.dense import knn_exact, knn_ivfpq


def _corpus(spark, n, d, a=37, b=11):
    rows = [
        (i, [((i * a + dd * b) % 97) / 97.0 + 0.01 for dd in range(d)])
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id int, vec array<double>")


def test_full_probe_full_rerank_equals_exact(spark):
    # nprobe = n_cells (no pruning) + rerank over everything -> exact top-k
    df = _corpus(spark, 14, 8)
    pq = knn_ivfpq(
        df, None, k=3, n_cells=4, nprobe=4, m_sub=2, k_sub=4, rerank_factor=14
    )
    ex = knn_exact(df, df, k=3)
    assert sorted(map(tuple, pq.collect())) == sorted(map(tuple, ex.collect()))


def test_pruned_recall_reasonable(spark):
    df = _corpus(spark, 40, 16, a=53, b=29)
    got = {
        (r["query_id"], r["corpus_id"])
        for r in knn_ivfpq(
            df, None, k=2, n_cells=4, nprobe=3, m_sub=4, k_sub=8, rerank_factor=6
        ).collect()
    }
    ex = {(r["query_id"], r["corpus_id"]) for r in knn_exact(df, df, k=2).collect()}
    assert len(got & ex) / len(ex) >= 0.5


def test_at_most_k_per_query_and_partition_invariant(spark):
    df = _corpus(spark, 20, 8)
    out1 = knn_ivfpq(df.repartition(1), None, k=2, n_cells=4, nprobe=2, m_sub=2, k_sub=4)
    out8 = knn_ivfpq(df.repartition(8), None, k=2, n_cells=4, nprobe=2, m_sub=2, k_sub=4)
    rows1 = sorted(map(tuple, out1.collect()))
    rows8 = sorted(map(tuple, out8.collect()))
    assert rows1 == rows8
    per_q = {}
    for q, c, s in rows1:
        per_q.setdefault(q, 0)
        per_q[q] += 1
    assert all(v <= 2 for v in per_q.values())
