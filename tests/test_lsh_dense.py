"""LSH + dense-NN operators: determinism, recall envelopes, oracle checks."""

import pytest
from pyspark.sql import functions as F

from continuousfilteringbenchmark_spark.functions import tokenize as tk
from continuousfilteringbenchmark_spark.fixtures import vector_corpus
from continuousfilteringbenchmark_spark.operators import lsh
from continuousfilteringbenchmark_spark.operators.dense import knn_exact, knn_ivf, range_search


def _toks(spark, rows, n=2):
    df = spark.createDataFrame(rows, "doc_id string, text string")
    return df.withColumn("tokens", tk.char_ngram_set("text", n))


def test_rows_per_band_formula():
    # MH_LSH.py:13-15 with t=0.5: r = ceil(log(1/32)/log(0.5)) + 1 = 6
    assert lsh.rows_per_band(32, 0.5) == 6
    assert lsh.rows_per_band(16, 0.5) == 5


def test_minhash_identical_docs_always_candidate(spark):
    rows = [("1", "entity resolution blocking"), ("2", "entity resolution blocking"),
            ("3", "totally different content here")]
    df = _toks(spark, rows)
    cand = {(r.left_id, r.right_id) for r in lsh.minhash_lsh_join(df).collect()}
    assert ("1", "2") in cand


def test_minhash_deterministic_across_partitioning(spark):
    rows = [(str(i), f"document number {i} about entity resolution topic {i % 7}") for i in range(40)]
    df1 = _toks(spark, rows).repartition(1)
    df8 = _toks(spark, rows).repartition(8)
    c1 = {(r.left_id, r.right_id) for r in lsh.minhash_lsh_join(df1, seed=7).collect()}
    c8 = {(r.left_id, r.right_id) for r in lsh.minhash_lsh_join(df8, seed=7).collect()}
    assert c1 == c8


def test_minhash_recall_on_near_duplicates(spark):
    # planted near-dups share most bigrams -> high minhash collision probability
    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    rows = [("a", base), ("b", base + " x"), ("c", "completely unrelated short string zz")]
    df = _toks(spark, rows)
    cand = {(r.left_id, r.right_id) for r in lsh.minhash_lsh_join(df, n_bands=32, n_buckets=64).collect()}
    assert ("a", "b") in cand


def test_simhash_identical_zero_hamming(spark):
    rows = [("1", "entity resolution at scale"), ("2", "entity resolution at scale"),
            ("3", "zzz qqq www eee rrr")]
    df = spark.createDataFrame(rows, "doc_id string, text string").withColumn(
        "tokens", tk.word_token_set("text")
    )
    pairs = lsh.simhash_near_duplicates(df, max_hamming=3).collect()
    got = {(r.left_id, r.right_id): r.hamming for r in pairs}
    assert got.get(("1", "2")) == 0
    assert ("1", "3") not in got


def test_hyperplane_lsh_buckets_near_vectors_together(spark):
    vecs, gold = vector_corpus(spark, n_entities=60, dim=16, seed=3)
    bands = lsh.hyperplane_bands(vecs, n_tables=12, n_bits=8, dim=16)
    cand = lsh.lsh_candidates(bands)
    g = {(r.left_id, r.right_id) for r in gold.collect()}
    c = {(min(r.left_id, r.right_id), max(r.left_id, r.right_id)) for r in cand.collect()}
    recall = len(g & c) / len(g)
    assert recall >= 0.9, f"recall={recall}"


def test_hyperplane_multiprobe_increases_candidates(spark):
    """FALCONN multiprobe axis: probe buckets are supersets — candidates
    (and so recall) grow monotonically with n_probes at fixed tables/bits."""
    vecs, gold = vector_corpus(spark, n_entities=60, dim=16, seed=3)
    g = {(r.left_id, r.right_id) for r in gold.collect()}

    def recall_and_count(probes):
        base = lsh.hyperplane_bands(vecs, n_tables=4, n_bits=8, dim=16)
        probe = lsh.hyperplane_bands(vecs, n_tables=4, n_bits=8, dim=16, n_probes=probes)
        from pyspark.sql import functions as F

        raw = probe.select("band", "bucket", F.col("doc_id").alias("a")).join(
            base.select("band", "bucket", F.col("doc_id").alias("b")), ["band", "bucket"]
        ).where(F.col("a") != F.col("b"))
        cand = {
            (min(r.a, r.b), max(r.a, r.b)) for r in raw.select("a", "b").distinct().collect()
        }
        return len(g & cand) / len(g), len(cand)

    r0, c0 = recall_and_count(0)
    r3, c3 = recall_and_count(3)
    assert c3 >= c0
    assert r3 >= r0
    assert c3 > c0  # at 4 tables x 8 bits some near pairs differ by 1 bit


def test_hyperplane_probe_zero_unchanged(spark):
    """n_probes=0 must emit exactly the base (band, bucket) table."""
    vecs, _ = vector_corpus(spark, n_entities=20, dim=16, seed=7)
    a = {(r.doc_id, r.band, r.bucket) for r in
         lsh.hyperplane_bands(vecs, n_tables=4, n_bits=6, dim=16).collect()}
    b = {(r.doc_id, r.band, r.bucket) for r in
         lsh.hyperplane_bands(vecs, n_tables=4, n_bits=6, dim=16, n_probes=0).collect()}
    assert a == b
    assert len(a) == vecs.count() * 4  # one base bucket per (doc, table)


def test_l2_normalize_batch_nan_matches_sql_semantics():
    """Spark SQL and DuckDB both order NaN above every double, so the spec's
    `WHEN norm > 0` takes the normalize branch for a NaN norm (yielding a NaN
    vector); the numpy mirror must do the same, in both the uniform-stack
    and the ragged fallback paths."""
    import math

    from continuousfilteringbenchmark_spark.operators.dense import _l2_normalize_batch

    # uniform-dim batch (stacked kernel)
    out = _l2_normalize_batch([[float("nan"), 1.0], [3.0, 4.0], [0.0, 0.0]])
    assert all(math.isnan(v) for v in out[0])
    assert out[1] == [0.6, 0.8]
    assert out[2] == [0.0, 0.0]  # zero norm keeps the raw vector
    # ragged batch (per-row fallback)
    out = _l2_normalize_batch([[float("nan")], [3.0, 4.0], [0.0, 0.0]])
    assert all(math.isnan(v) for v in out[0])
    assert out[1] == [0.6, 0.8]
    assert out[2] == [0.0, 0.0]


def test_knn_exact_matches_numpy_bruteforce(spark):
    import numpy as np

    vecs, _ = vector_corpus(spark, n_entities=25, dim=8, match_rate=0.0, seed=11)
    rows = vecs.collect()
    ids = [r.doc_id for r in rows]
    M = np.array([r.vec for r in rows])
    M = M / np.linalg.norm(M, axis=1, keepdims=True)
    sims = M @ M.T
    got = knn_exact(vecs, vecs, k=3)
    got_map = {}
    for r in got.collect():
        got_map.setdefault(r.query_id, set()).add(r.corpus_id)
    # verify per-query top-1 matches numpy argmax
    for qi, qid in enumerate(ids):
        s = sims[qi].copy()
        s[qi] = -2
        best = ids[int(np.argmax(s))]
        assert best in got_map[qid]


def test_knn_ivf_recall_vs_exact(spark):
    vecs, _ = vector_corpus(spark, n_entities=80, dim=16, seed=5)
    exact = knn_exact(vecs, vecs, k=3)
    approx = knn_ivf(vecs, vecs, k=3, n_cells=4, nprobe=2, seed=5)
    e = {(r.query_id, r.corpus_id) for r in exact.collect()}
    a = {(r.query_id, r.corpus_id) for r in approx.collect()}
    assert len(e & a) / len(e) >= 0.7


def test_knn_ivf_sample_quantizer(spark):
    """quantizer='sample' (seeded md5-sampled member centroids — the
    SQL-replayable mode q_knn_ivf_approx certifies): full-probe output must
    equal exact top-k (routing completeness is centroid-independent), the
    approximate regime keeps reasonable recall, and a bad quantizer raises."""
    import pytest

    vecs, _ = vector_corpus(spark, n_entities=60, dim=16, seed=5)
    exact = knn_exact(vecs, vecs, k=3)
    e = {(r.query_id, r.corpus_id) for r in exact.collect()}
    full = knn_ivf(vecs, vecs, k=3, n_cells=4, nprobe=4, seed=5, quantizer="sample")
    assert {(r.query_id, r.corpus_id) for r in full.collect()} == e
    approx = knn_ivf(vecs, vecs, k=3, n_cells=4, nprobe=2, seed=5, quantizer="sample")
    a = {(r.query_id, r.corpus_id) for r in approx.collect()}
    assert len(e & a) / len(e) >= 0.6
    with pytest.raises(ValueError):
        knn_ivf(vecs, vecs, k=3, quantizer="pq")


def test_range_search_threshold(spark):
    # exact oracle: range_search must return precisely the pairs whose
    # cosine >= threshold (brute force in pure python)
    vecs, _ = vector_corpus(spark, n_entities=40, dim=16, seed=9)
    rows = [(r.doc_id, r.vec) for r in vecs.collect()]

    def cos(a, b):
        na = sum(x * x for x in a) ** 0.5
        nb = sum(x * x for x in b) ** 0.5
        return sum(x * y for x, y in zip(a, b)) / (na * nb)

    expected = {
        (rows[i][0], rows[j][0])
        for i in range(len(rows))
        for j in range(len(rows))
        if rows[i][0] < rows[j][0] and cos(rows[i][1], rows[j][1]) >= 0.85
    }
    pairs = range_search(vecs, None, threshold=0.85, method="exact")
    got = {(r.left_id, r.right_id) for r in pairs.collect()}
    assert got == expected
    for r in pairs.collect():
        assert r.score >= 0.85
    # default (LSH) path: exact-verified candidates -> always a subset of
    # the brute-force answer, never inventing pairs
    lsh_got = {
        (r.left_id, r.right_id)
        for r in range_search(vecs, None, threshold=0.85, lsh_tables=16, lsh_bits=4).collect()
    }
    assert lsh_got <= expected


def test_tuple_embedding_deterministic_and_exact(spark):
    """The N7 encoder: coordinates are exact integer sums of md5-derived
    token draws — identical across partitionings, and equal to a
    hand-computed python replay."""
    import hashlib

    from continuousfilteringbenchmark_spark.functions.vectorize import tuple_embedding

    rows = [("a", "alpha beta gamma"), ("b", "beta gamma delta"), ("c", "alpha")]
    df = spark.createDataFrame(rows, "doc_id string, text string").withColumn(
        "tokens", tk.word_token_set("text")
    )
    got1 = {r.doc_id: list(r.vec) for r in tuple_embedding(df.repartition(1), dim=4).collect()}
    got8 = {r.doc_id: list(r.vec) for r in tuple_embedding(df.repartition(8), dim=4).collect()}
    assert got1 == got8

    def draw(tok, j):
        return int(hashlib.md5(f"te:{tok}:{j}".encode()).hexdigest()[:10], 16) - (1 << 39)

    expect = [sum(draw(t, j) for t in ("alpha", "beta", "gamma")) for j in range(4)]
    assert got1["a"] == expect
    assert got1["c"] == [draw("alpha", j) for j in range(4)]


def test_deepblocker_topk_pairs_near_duplicates(spark):
    """N7 stand-in end-to-end: near-identical docs must be each other's top
    neighbor; ivf mode at full probe agrees with exact on who is rank-1."""
    from continuousfilteringbenchmark_spark.operators.dense import deepblocker_topk

    rows = [
        ("1", "introduction to entity resolution blocking methods"),
        ("2", "introduction to entity resolution blocking method"),
        ("3", "grilled cheese sandwich recipe with tomato soup"),
        ("4", "cheese sandwich recipe grilled with tomato soup"),
        ("5", "quantum chromodynamics lattice gauge theory simulation"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    top1 = deepblocker_topk(df, None, k=1, dim=16).collect()
    best = {r.query_id: r.corpus_id for r in top1}
    assert best["1"] == "2" and best["2"] == "1"
    assert best["3"] == "4" and best["4"] == "3"
    ivf = deepblocker_topk(df, None, k=1, dim=16, method="ivf", n_cells=2, nprobe=2)
    best_ivf = {r.query_id: r.corpus_id for r in ivf.collect()}
    assert best_ivf["1"] == "2" and best_ivf["3"] == "4"


def test_crosspolytope_multiprobe_structure(spark):
    """Probe rows: rank 0 = the base pass (identical to n_probes=0 modulo
    the rounded-magnitude ranking), each probe bucket differs from its
    table's base bucket in exactly one base-(2*proj_dim) digit, and probe
    ranks are 1..n_rotations."""
    from continuousfilteringbenchmark_spark.operators.lsh import crosspolytope_bands
    from pyspark.sql import functions as F

    vecs = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("vec"))
        .limit(50)
    )
    probe = crosspolytope_bands(
        vecs, n_tables=4, n_rotations=2, proj_dim=16, id_col="vec_id", n_probes=2
    ).cache()
    base = {(r.doc_id, r.band): r.bucket for r in probe.where("rank = 0").collect()}
    assert len(base) == 50 * 4
    probes = probe.where("rank > 0").collect()
    assert {r.rank for r in probes} == {1, 2}
    assert len(probes) == 50 * 4 * 2
    for r in probes:
        b = base[(r.doc_id, r.band)]
        assert r.bucket != b
        # single-substitution: exactly one base-32 digit differs
        diffs = sum(
            1 for k in range(2) if (r.bucket // 32**k) % 32 != (b // 32**k) % 32
        )
        assert diffs == 1, (r.bucket, b)
