"""Dense-vector nearest-neighbor operators (SURVEY.md §2.5, N5-N7).

One dense top-k operator with exact and partitioned-approximate modes,
consuming a precomputed embedding column — exactly how the reference
consumes fastText CSVs (``nnmethods/faiss/D4sa.py:217-241``). The reference's
FAISS/SCANN/FALCONN index variety collapses into:

* ``knn_exact``       — brute-force cosine top-k (FAISS 'Flat' parity,
                        ``faiss/D4sa.py:76-121``); the correctness baseline.
* ``knn_ivf``         — IVF-style partitioned search: coarse k-means cells
                        (MLlib KMeans, seeded), probe the ``nprobe`` nearest
                        cells per query, exact re-rank inside
                        (``scalabilityAnalysis/FAISS.py`` IVF1600/nprobe80).
* ``range_search``    — all pairs with cosine >= threshold (FAISS
                        ``range_search``, ``faiss/D4sa.py:123-141``).
* hyperplane/cross-polytope LSH candidates live in operators/lsh.py (N3/N4).

Scale path: the scored cross join is blocked per partition via a pandas UDF
doing a matrix multiply per Arrow batch against a broadcast query block —
at 100 TB you'd IVF-partition first (cells bound the candidate set), which
is what ``knn_ivf`` does; positional-id bookkeeping from the reference
(a recurring bug source there, ``faiss/D4sa.py:242-245``) disappears because
ids ride the rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.similarity import cosine_dense


def _norm_sql(vec_col: str = "vec"):
    """SQL formulation of L2 normalization — kept as the executable spec the
    DuckDB oracles replay, and as documentation of the exact IEEE-double
    fold ``_norm`` must reproduce. NOT used in plans: Catalyst inlines the
    scalar ``n`` into the per-element division lambda (lambda bindings see
    no CSE), making this O(d^2) per row — and when the projection sits
    under a join, the whole thing re-evaluates per JOINED row (measured:
    ~40 CPU-seconds for a 32k-row cell-assignment stage at d=64)."""
    v = F.col(vec_col)
    n = F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))
    return F.when(n > 0, F.transform(v, lambda x: x / n)).otherwise(v)


def _l2_normalize_batch(vs):
    """numpy mirror of ``_norm_sql`` — bit-identical IEEE doubles: the sum
    of squares accumulates dimension-sequentially (the same left fold as
    ``aggregate(v, 0.0D, (a,x) -> a + x*x)``), and sqrt/divide are
    correctly rounded single ops in both runtimes."""
    import numpy as np

    arrs = [None if v is None else np.asarray(v, dtype=np.float64) for v in vs]
    sizes = {a.size for a in arrs if a is not None}
    if len(sizes) == 1 and not any(a is None for a in arrs):
        x = np.stack(arrs)
        s = np.zeros(x.shape[0])
        for d in range(x.shape[1]):  # dim-sequential: same fold as the SQL
            s = s + x[:, d] * x[:, d]
        n = np.sqrt(s)
        # branch must mirror SQL `WHEN n > 0`: Spark AND DuckDB order NaN
        # above every double, so a NaN norm takes the normalize branch there
        # (yielding a NaN vector); numpy's `n > 0` is False for NaN, which
        # would silently keep the raw vector and break hash-exact parity
        pos = (n > 0) | np.isnan(n)
        out = x.copy()
        out[pos] = x[pos] / n[pos, None]
        return [r.tolist() for r in out]
    res = []
    for a in arrs:
        if a is None:
            res.append(None)
            continue
        s = 0.0
        for xv in a.tolist():
            s += xv * xv
        n = s**0.5
        # n != n catches NaN: same `WHEN n > 0` parity as the stacked path
        res.append([xv / n for xv in a.tolist()] if (n > 0 or n != n) else a.tolist())
    return res


def _norm(vec_col: str = "vec"):
    """L2-normalize an array<double> column (Arrow-vectorized pandas UDF).

    Same result as ``_norm_sql`` bit-for-bit (see ``_l2_normalize_batch``),
    so every hash-exact oracle replay is unaffected — but O(d) per row,
    evaluated ONCE per input row at the ArrowEvalPython barrier instead of
    being re-inlined per joined row / per lambda element. At corpus scale
    this is one linear Arrow pass over the vector column, the same traffic
    every signature UDF (N1-N4) already pays.
    """
    import pandas as pd

    def _udf(vs):
        return pd.Series(_l2_normalize_batch(vs))

    # no type hints: `from __future__ import annotations` stringifies them
    # and pandas_udf can't resolve the local pd import
    return F.pandas_udf(_udf, "array<double>")(F.col(vec_col))


def knn_exact(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    vec_col: str = "vec",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact cosine top-k: queries x corpus scored natively, per-query window.

    Tie-inclusive at the k-th value (same contract as the sparse top-k join).
    Output: (query_id, corpus_id, score).
    """
    q = queries.select(F.col(id_col).alias("query_id"), _norm(vec_col).alias("_qv"))
    c = corpus.select(F.col(id_col).alias("corpus_id"), _norm(vec_col).alias("_cv"))
    scored = q.crossJoin(c).where(F.col("query_id") != F.col("corpus_id"))
    scored = scored.withColumn(
        "score",
        F.aggregate(F.zip_with("_qv", "_cv", lambda a, b: a * b), F.lit(0.0), lambda a, x: a + x),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("corpus_id").asc())
    wall = Window.partitionBy("query_id")
    kth = F.max(F.when(F.row_number().over(w) == k, F.col("score"))).over(wall)
    return (
        scored.withColumn("_kth", kth)
        .where(F.col("_kth").isNull() | (F.col("score") >= F.col("_kth")))
        .select("query_id", "corpus_id", "score")
    )


def _sample_centers(
    corpus: DataFrame, n: int, seed: int, vec_col: str, id_col: str
) -> list:
    """Seeded sample draw: the normalized vectors of the ``n`` corpus rows
    with the smallest md5-derived keys (ties by string id) — deterministic,
    one bounded job, and exactly replayable by a SQL oracle (md5 over
    "id:seed", the same idiom as operators/lsh.py)."""
    key = F.conv(
        F.substring(
            F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f":{seed}"))), 1, 10
        ),
        16,
        10,
    ).cast("long")
    rows = (
        corpus.select(
            _norm(vec_col).alias("_v"),
            key.alias("_s"),
            F.col(id_col).cast("string").alias("_id"),
        )
        .orderBy("_s", "_id")
        .limit(n)
        .collect()
    )
    return [list(r["_v"]) for r in rows]


def _assign_cells(df: DataFrame, centers, nprobe: int, vec_col: str, id_col: str, out_id: str) -> DataFrame:
    """Assign each vector to its ``nprobe`` nearest coarse cells (dot product
    against the broadcast centroid table — centroids are tiny)."""
    spark = df.sparkSession
    cdf = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centers)],
        "cell int, center array<double>",
    )
    scored = df.select(F.col(id_col).alias(out_id), _norm(vec_col).alias("_v")).crossJoin(
        F.broadcast(cdf)
    )
    scored = scored.withColumn(
        "_d",
        F.aggregate(F.zip_with("_v", "center", lambda a, b: a * b), F.lit(0.0), lambda a, x: a + x),
    )
    w = Window.partitionBy(out_id).orderBy(F.col("_d").desc(), F.col("cell").asc())
    return scored.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") <= nprobe).select(
        out_id, "cell", "_v"
    )


def knn_ivf(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    n_cells: int = 16,
    nprobe: int = 4,
    seed: int = 42,
    vec_col: str = "vec",
    id_col: str = "doc_id",
    train_points_per_cell: int = 256,
    quantizer: str = "kmeans",
) -> DataFrame:
    """IVF-style approximate top-k: coarse quantizer cells, corpus sharded by
    nearest cell, queries probe ``nprobe`` cells, exact re-rank within.
    FAISS ``IVF{n},Flat`` parity
    (``nnmethods/scalabilityAnalysis/FAISS.py`` config IVF1600/nprobe80).

    ``quantizer``:

    * ``'kmeans'`` (default) — seeded MLlib k-means fit on a BOUNDED SAMPLE
      of ~``train_points_per_cell * n_cells`` vectors (FAISS trains its IVF
      on a sample for the same reason) — at 10^9+ vectors a full-corpus
      k-means fit is itself a scale-killer, while cell routing and re-rank
      only need centroids that roughly partition the space. The sample is
      seeded (deterministic per input); when the corpus is smaller than the
      budget every vector trains.
    * ``'sample'`` — centroids are the normalized vectors of the ``n_cells``
      corpus rows with the smallest md5-derived keys (seeded, deterministic,
      and — unlike k-means — exactly replayable by a SQL oracle: one tiny
      bounded job, no Lloyd iterations). Random-member centroids are the
      classic cheap coarse quantizer; routing quality is a notch below
      k-means at equal n_cells, recall is tunable with nprobe as usual.
    """
    if quantizer not in ("kmeans", "sample"):
        raise ValueError("quantizer must be 'kmeans' or 'sample'")
    if quantizer == "sample":
        centers = _sample_centers(corpus, n_cells, seed, vec_col, id_col)
    else:
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        budget = max(train_points_per_cell * n_cells, n_cells)
        # bounded, deterministic training set: sample() needs a fraction (a
        # count()-free estimate would be another job), so take the first
        # ``budget`` rows ordered by a seeded hash — one small job, and the
        # same rows regardless of partitioning. Persisted across the k-means
        # iterations (each fit iteration re-scans its input; without the cache
        # every iteration would re-run the read+sort chain) and dropped after.
        train = (
            corpus.select(
                _norm(vec_col).alias("_v"), F.xxhash64(F.col(id_col), F.lit(seed)).alias("_s")
            )
            .orderBy("_s")
            .limit(budget)
            .select(array_to_vector(F.col("_v")).alias("features"))
            .persist()
        )
        # random init (not k-means||): the parallel init alone costs ~5 extra
        # passes, and a coarse IVF quantizer only needs centroids that roughly
        # partition the space — FAISS trains its IVF the same way (sampled,
        # few iterations); 10 Lloyd iterations on the cached sample converge
        # far past routing quality
        try:
            km = KMeans(k=n_cells, seed=seed, maxIter=10, initMode="random").fit(train)
        finally:
            train.unpersist()
        centers = [
            (c.toArray() if hasattr(c, "toArray") else c).tolist() for c in km.clusterCenters()
        ]

    c_cells = _assign_cells(corpus, centers, 1, vec_col, id_col, "corpus_id")
    q_cells = _assign_cells(queries, centers, nprobe, vec_col, id_col, "query_id")
    # pin the cell join's parallelism: its INPUT is tiny (one row per doc
    # per probe) but its OUTPUT fans out ~|corpus|/n_cells per probe, so
    # AQE — which sizes reducers by input bytes — coalesces the join to a
    # handful of tasks and the per-candidate re-rank scoring serializes
    # (measured: the whole 1M-candidate stage on ONE core). An explicit
    # hash repartition on the join key is respected by AQE; parallelism
    # is bounded by n_cells, which at production scale is hundreds+
    # (FAISS config IVF1600).
    npart = queries.sparkSession.sparkContext.defaultParallelism
    cand = (
        q_cells.select("query_id", "cell", F.col("_v").alias("_qv"))
        .repartition(npart, "cell")
        .join(
            c_cells.select("corpus_id", "cell", F.col("_v").alias("_cv")).repartition(
                npart, "cell"
            ),
            "cell",
        )
    )
    cand = cand.where(F.col("query_id") != F.col("corpus_id")).withColumn(
        "score",
        F.aggregate(F.zip_with("_qv", "_cv", lambda a, b: a * b), F.lit(0.0), lambda a, x: a + x),
    )
    cand = cand.select("query_id", "corpus_id", "score").distinct()
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("corpus_id").asc())
    return cand.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") <= k).select(
        "query_id", "corpus_id", "score"
    )


def range_search(
    queries: DataFrame,
    corpus: DataFrame | None,
    threshold: float,
    vec_col: str = "vec",
    id_col: str = "doc_id",
    method: str = "lsh",
    lsh_tables: int = 16,
    lsh_bits: int = 4,
    lsh_seed: int = 5721840,
    lsh_probes: int = 0,
) -> DataFrame:
    """All pairs with cosine >= threshold (FAISS range_search parity,
    ``nnmethods/faiss/D4sa.py:123-141``; ``corpus=None`` -> self-join dedup
    with left<right).

    ``method='lsh'`` (default — the only shape that survives 100x scale):
    hyperplane-LSH candidate generation (operators/lsh.py N3) followed by an
    exact cosine verify of the candidates; sub-quadratic, recall tunable via
    ``lsh_tables``/``lsh_bits`` AND ``lsh_probes`` — the FALCONN multiprobe
    axis (``set_num_probes``, ``hyperplaneLSH/D4.py:118-150``): each side's
    query buckets additionally probe the ``lsh_probes`` least-confident
    bit-flips per table, trading compute for recall WITHOUT growing the
    indexed table (probes join against base buckets only). ``method='exact'``
    is the brute-force cross join — the correctness baseline, quadratic,
    test-scale only.
    """
    if method not in ("exact", "lsh"):
        raise ValueError("method must be 'exact' or 'lsh'")
    self_join = corpus is None
    q = queries.select(F.col(id_col).alias("left_id"), _norm(vec_col).alias("_qv"))
    c = (
        q.select(F.col("left_id").alias("right_id"), F.col("_qv").alias("_cv"))
        if self_join
        else corpus.select(F.col(id_col).alias("right_id"), _norm(vec_col).alias("_cv"))
    )
    if method == "exact":
        pairs = q.crossJoin(c)
        if self_join:
            pairs = pairs.where(F.col("left_id") < F.col("right_id"))
        else:
            pairs = pairs.where(F.col("left_id") != F.col("right_id"))
    else:
        from .lsh import hyperplane_bands, lsh_candidates

        # mean-centering needs ONE mean for both sides; the self-join case
        # centers on its own corpus, the two-table case skips centering so
        # both band tables hash in the same frame
        if self_join:
            if lsh_probes > 0:
                # ONE hyperplane_bands construction serves both join sides:
                # the probe pass CONTAINS the base rows (rank = 0), so the
                # base side is a rank filter over the same plan — the
                # centering mean and dim probe are computed once by
                # construction rather than shared by hand. The filter sits
                # BELOW the join (a post-join filter would fan the join out
                # by an extra (1 + probes) factor before discarding); Spark
                # cannot reuse exchanges across Python-UDF subtrees, so both
                # sides still scan — at the same per-row cost either way.
                # Probe buckets join against BASE buckets (FALCONN probes a
                # static index); a pair is found when either endpoint's probe
                # sequence reaches the other's base bucket -> canonicalize
                probe = hyperplane_bands(
                    queries, lsh_tables, lsh_bits, seed=lsh_seed,
                    vec_col=vec_col, id_col=id_col, center=True,
                    n_probes=lsh_probes,
                )
                npart = probe.sparkSession.sparkContext.defaultParallelism
                l = probe.select(
                    "band", "bucket", F.col("doc_id").alias("a")
                ).repartition(npart, "band", "bucket")
                r = (
                    probe.where(F.col("rank") == 0)
                    .select("band", "bucket", F.col("doc_id").alias("b"))
                    .repartition(npart, "band", "bucket")
                )
                raw = l.join(r, ["band", "bucket"]).where(F.col("a") != F.col("b"))
                cand = raw.select(
                    F.least("a", "b").alias("left_id"),
                    F.greatest("a", "b").alias("right_id"),
                ).distinct()
            else:
                bands = hyperplane_bands(
                    queries, lsh_tables, lsh_bits, seed=lsh_seed,
                    vec_col=vec_col, id_col=id_col, center=True,
                )
                cand = lsh_candidates(bands)
        else:
            qb = hyperplane_bands(
                queries, lsh_tables, lsh_bits, seed=lsh_seed,
                vec_col=vec_col, id_col=id_col, center=False,
                n_probes=lsh_probes,
            )
            cb = hyperplane_bands(
                corpus, lsh_tables, lsh_bits, seed=lsh_seed,
                vec_col=vec_col, id_col=id_col, center=False,
            )
            cand = lsh_candidates(qb, cb).where(F.col("left_id") != F.col("right_id"))
        pairs = cand.join(q, "left_id").join(c, "right_id")
    pairs = pairs.withColumn(
        "score",
        F.aggregate(F.zip_with("_qv", "_cv", lambda a, b: a * b), F.lit(0.0), lambda a, x: a + x),
    )
    return pairs.where(F.col("score") >= threshold).select("left_id", "right_id", "score")


def _exact_rerank(
    scored: DataFrame, qn: DataFrame, cn: DataFrame, k: int, rerank_factor: int
) -> DataFrame:
    """Shared tail of every quantized-scan operator (SQ8 / PQ / IVF-PQ) —
    ONE definition of the ordering/tie contract the SQL oracles replay:
    keep the top ``rerank_factor * k`` candidates per query by
    (approximate qscore DESC, corpus_id ASC), join the full-precision
    normalized vectors back (``qn``: (query_id, _qv); ``cn``: (corpus_id,
    _cv)), score with the exact dimension-sequential dot fold, and emit
    top-k by (exact score DESC, corpus_id ASC)."""
    m = max(int(rerank_factor) * k, k)
    wq = Window.partitionBy("query_id").orderBy(
        F.col("qscore").desc(), F.col("corpus_id").asc()
    )
    cand = (
        scored.withColumn("_rm", F.row_number().over(wq))
        .where(F.col("_rm") <= m)
        .select("query_id", "corpus_id")
    )
    rr = (
        cand.join(qn, "query_id")
        .join(cn, "corpus_id")
        .withColumn(
            "score",
            F.aggregate(
                F.zip_with("_qv", "_cv", lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        )
    )
    wr = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("corpus_id").asc()
    )
    return (
        rr.withColumn("_rn", F.row_number().over(wr))
        .where(F.col("_rn") <= k)
        .select("query_id", "corpus_id", "score")
    )


def sq8_train(corpus: DataFrame, vec_col: str = "vec", id_col: str = "doc_id") -> list:
    """Per-dimension (min, range) scalar-quantizer stats over the NORMALIZED
    corpus (FAISS ``SQ8`` trains the same per-dim affine params). One
    aggregation with map-side combine — d output rows regardless of corpus
    size; the range subtraction runs in IEEE double (identical in any
    engine). Returns ``[(mn_0, rg_0), ...]`` ordered by dimension."""
    rows = (
        corpus.select(_norm(vec_col).alias("_v"))
        .select(F.posexplode("_v").alias("pos", "x"))
        .groupBy("pos")
        .agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
        .collect()
    )
    stats = sorted((int(r["pos"]), float(r["mn"]), float(r["mx"])) for r in rows)
    return [(mn, mx - mn) for _, mn, mx in stats]


def _sq8_code_col(stats) -> "F.Column":
    """uint8 code array for a normalized vector column ``_v``:
    ``clamp(floor(((x - mn) / rg) * 256), 0, 255)`` per dimension, 0 when
    the dimension is constant (rg == 0). Every op is a single IEEE-double
    instruction in fixed order, so a SQL oracle replays the codes exactly."""
    mins = F.array(*[F.lit(float(mn)) for mn, _ in stats])
    rgs = F.array(*[F.lit(float(rg)) for _, rg in stats])
    shifted = F.zip_with(F.col("_v"), mins, lambda x, m: x - m)
    return F.zip_with(
        shifted,
        rgs,
        lambda t, r: F.when(r == F.lit(0.0), F.lit(0)).otherwise(
            F.greatest(
                F.lit(0).cast("long"),
                F.least(F.lit(255).cast("long"), F.floor((t / r) * F.lit(256.0))),
            ).cast("int")
        ),
    )


def knn_sq8(
    queries: DataFrame,
    corpus: DataFrame | None,
    k: int,
    rerank_factor: int = 4,
    vec_col: str = "vec",
    id_col: str = "doc_id",
) -> DataFrame:
    """Scalar-quantized (SQ8) top-k with exact re-rank — the memory-bound
    scale path for exhaustive dense search (FAISS ``SQ8`` parity; the
    reference's FAISS driver loads full-precision fastText vectors,
    ``nnmethods/faiss/D4sa.py:76-121`` — at 10^12 docs the float32 matrix
    alone is the bottleneck, and 1-byte codes cut scan bandwidth 4x).

    Two-stage plan: (1) the scan ranks candidates by the INTEGER dot
    product of mean-centered uint8 codes (``sum((ql-128)*(qr-128))`` — a
    64-bit-exact, order-free reduction), keeping ``rerank_factor * k``
    per query; (2) survivors re-rank by the exact full-precision cosine
    (the same left-fold dot product every dense oracle replays). Output:
    (query_id, corpus_id, score) — top-k by exact score, ties broken by
    corpus_id.

    The candidate stage is still an exhaustive scan (SQ compresses, it
    does not prune) — compose with IVF cells for sub-linear candidate
    generation at full scale; the codes here are what the IVF cells would
    store. ``corpus=None`` -> self-search (query_id != corpus_id).
    """
    q = queries.select(F.col(id_col).alias("query_id"), _norm(vec_col).alias("_v"))
    c = (
        q.select(F.col("query_id").alias("corpus_id"), "_v")
        if corpus is None
        else corpus.select(F.col(id_col).alias("corpus_id"), _norm(vec_col).alias("_v"))
    )
    stats = sq8_train(queries if corpus is None else corpus, vec_col, id_col)
    qc = q.select("query_id", _sq8_code_col(stats).alias("_qc"))
    cc = c.select("corpus_id", _sq8_code_col(stats).alias("_cc"))
    scored = (
        qc.crossJoin(cc)
        .where(F.col("query_id") != F.col("corpus_id"))
        .withColumn(
            "qscore",
            F.aggregate(
                F.zip_with("_qc", "_cc", lambda a, b: (a - F.lit(128)) * (b - F.lit(128))),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ),
        )
    )
    return _exact_rerank(
        scored,
        q.select("query_id", F.col("_v").alias("_qv")),
        c.select("corpus_id", F.col("_v").alias("_cv")),
        k,
        rerank_factor,
    )


def pq_train(
    corpus: DataFrame,
    m_sub: int = 8,
    k_sub: int = 16,
    seed: int = 42,
    vec_col: str = "vec",
    id_col: str = "doc_id",
) -> tuple[list[float], int]:
    """Deterministic PQ codebook: the normalized vectors of the ``k_sub``
    corpus rows with the smallest md5-derived keys (the same seeded
    sample-member idiom as ``knn_ivf(quantizer='sample')`` — replayable by
    a SQL oracle, no Lloyd iterations), each split into ``m_sub``
    subvectors. Returns (flat codebook, d): codeword j of subspace i lives
    at ``flat[(i*k_sub + j)*dsub : ...+dsub]``. One bounded job — k_sub
    rows collected regardless of corpus size (FAISS likewise trains PQ on
    a sample)."""
    centers = _sample_centers(corpus, k_sub, seed, vec_col, id_col)
    if len(centers) < k_sub:
        raise ValueError(f"pq_train: corpus smaller than k_sub={k_sub}")
    d = len(centers[0])
    if d % m_sub != 0:
        raise ValueError(f"pq_train: dim {d} not divisible by m_sub={m_sub}")
    dsub = d // m_sub
    flat: list[float] = []
    for i in range(m_sub):
        for j in range(k_sub):
            flat.extend(float(x) for x in centers[j][i * dsub : (i + 1) * dsub])
    return flat, d


def _pq_code_col(flat: list[float], m_sub: int, k_sub: int, dsub: int) -> "F.Column":
    """codes[i] = argmin_j ||x_sub_i - codeword_ij||^2 over a normalized
    vector column ``_v``, as ONE numpy pandas-UDF batched over Arrow.

    An earlier triple-nested higher-order-function formulation claimed
    "pure codegen" — wrong: Catalyst evaluates HOF lambdas interpreted,
    per element (same finding as ``lsh.py``'s minhash note), and measuring
    both on the sf0.1 embeddings (2,000 x d=64, m=8, k=16) gave HOF ~1.05s
    vs numpy ~0.21s for the encode stage (identical codes). The distance
    accumulation below loops dimensions EXPLICITLY so the float adds run
    in the same left-fold order as the SQL oracle, and ``np.argmin`` keeps
    the first (= smallest) codeword index on ties — codes stay bit-exact
    against the oracle's (dist ASC, code ASC) argmin."""
    cwv = np.asarray(flat, dtype=np.float64).reshape(m_sub, k_sub, dsub)

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def codes(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype=object)
        X = np.stack([np.asarray(v, dtype=np.float64) for v in vs])
        Xs = X.reshape(len(X), m_sub, dsub)
        acc = np.zeros((len(X), m_sub, k_sub), dtype=np.float64)
        for dd in range(dsub):  # explicit left fold: oracle-exact add order
            diff = Xs[:, :, dd][:, :, None] - cwv[None, :, :, dd]
            acc = acc + diff * diff
        out = np.argmin(acc, axis=2).astype(np.int32)
        return pd.Series(list(out))

    return codes(F.col("_v"))


def _adc_score(flat: list[float], m_sub: int, k_sub: int, dsub: int, qv_col: str) -> "F.Column":
    """ADC approximate score = dot(query, PQ reconstruction) as one numpy
    pandas-UDF over (query vector, code array) — replaces an interpreted
    ``flatten(zip_with(...))`` reconstruction + 64-element ``aggregate``
    fold per candidate pair (the scan's hot loop: ~nprobe/n_cells of the
    corpus per query). The accumulation loops dimensions EXPLICITLY in
    ascending order, reproducing the SQL oracle's dimension-sequential
    left fold bit-for-bit; the gather from the broadcast codebook is
    float-exact (no arithmetic)."""
    cwv = np.asarray(flat, dtype=np.float64).reshape(m_sub, k_sub, dsub)

    @F.pandas_udf(T.DoubleType())
    def adc(qv: pd.Series, codes: pd.Series) -> pd.Series:
        if len(qv) == 0:
            return pd.Series([], dtype="float64")
        Q = np.stack([np.asarray(v, dtype=np.float64) for v in qv])
        C = np.stack([np.asarray(c, dtype=np.int64) for c in codes])
        R = cwv[np.arange(m_sub)[None, :], C].reshape(len(Q), m_sub * dsub)
        acc = np.zeros(len(Q), dtype=np.float64)
        for d in range(m_sub * dsub):  # oracle-exact left-fold add order
            acc = acc + Q[:, d] * R[:, d]
        return pd.Series(acc)

    return adc(F.col(qv_col), F.col("_codes"))


def knn_pq(
    queries: DataFrame,
    corpus: DataFrame | None,
    k: int,
    m_sub: int = 8,
    k_sub: int = 16,
    rerank_factor: int = 4,
    seed: int = 42,
    vec_col: str = "vec",
    id_col: str = "doc_id",
) -> DataFrame:
    """Product-quantized top-k with exact re-rank (FAISS ``PQ{m}``
    asymmetric-distance parity; the 10^12-vector memory story: m small
    codes per vector — here 8 codes of 4 bits' worth — instead of d
    floats).

    Stages: (1) deterministic sampled codebook (``pq_train``); (2) encode
    the corpus: per subspace, the L2-nearest codeword (tie -> smallest
    index); (3) ADC scan: approximate score = dot(query, reconstruction)
    — the reconstruction is materialized per candidate on the fly from
    the broadcast codebook, the stored column is the m-entry code array;
    (4) exact re-rank of the top ``rerank_factor * k`` per query. Every
    float fold is dimension-sequential, so a SQL oracle replays codes,
    approximate scores and the final exact scores bit-for-bit.

    Like SQ8 the scan is exhaustive (PQ compresses; IVF cells prune) —
    compose with ``knn_ivf`` cells at full scale. ``corpus=None`` ->
    self-search.
    """
    q = queries.select(F.col(id_col).alias("query_id"), _norm(vec_col).alias("_v"))
    c = (
        q.select(F.col("query_id").alias("corpus_id"), "_v")
        if corpus is None
        else corpus.select(F.col(id_col).alias("corpus_id"), _norm(vec_col).alias("_v"))
    )
    flat, d = pq_train(
        queries if corpus is None else corpus, m_sub, k_sub, seed, vec_col, id_col
    )
    dsub = d // m_sub
    enc = c.select(
        "corpus_id", _pq_code_col(flat, m_sub, k_sub, dsub).alias("_codes")
    )
    scored = (
        q.crossJoin(enc)
        .where(F.col("query_id") != F.col("corpus_id"))
        .withColumn("qscore", _adc_score(flat, m_sub, k_sub, dsub, "_v"))
    )
    return _exact_rerank(
        scored,
        q.select("query_id", F.col("_v").alias("_qv")),
        c.select("corpus_id", F.col("_v").alias("_cv")),
        k,
        rerank_factor,
    )


def knn_ivfpq(
    queries: DataFrame,
    corpus: DataFrame | None,
    k: int,
    n_cells: int = 16,
    nprobe: int = 4,
    m_sub: int = 8,
    k_sub: int = 16,
    rerank_factor: int = 4,
    seed: int = 42,
    vec_col: str = "vec",
    id_col: str = "doc_id",
) -> DataFrame:
    """IVF-PQ: the canonical billion-scale ANN composition (FAISS
    ``IVF{n},PQ{m}`` shape) — coarse cells PRUNE the candidate set, PQ
    codes COMPRESS what each cell stores, exact re-rank restores
    full-precision ordering of the survivors.

    Plan: sampled deterministic centroids route the corpus (1 cell each)
    and queries (``nprobe`` cells); inside probed cells the ADC scan
    scores dot(query, PQ reconstruction) over the m-entry code arrays; the
    top ``rerank_factor * k`` per query re-rank by exact cosine. Candidate
    volume is ~``nprobe/n_cells`` of the corpus per query and each stored
    vector is m codes, so both the scan FLOPs and the memory footprint
    shrink — the composition the SQ8/PQ docstrings point to. Simplification
    vs FAISS: codes encode the raw normalized vector, not the cell
    residual (documented contract; residual encoding needs per-cell
    codebooks, which breaks the single-broadcast-codebook plan).

    The PQ codebook draws with ``seed + 1`` so codewords and centroids are
    distinct samples. Fully deterministic — centroid draw, cell routing,
    codes, ADC scores and re-rank are all replayable by a SQL oracle.
    ``corpus=None`` -> self-search.
    """
    self_search = corpus is None
    base = queries if self_search else corpus
    centers = _sample_centers(base, n_cells, seed, vec_col, id_col)
    flat, d = pq_train(base, m_sub, k_sub, seed + 1, vec_col, id_col)
    dsub = d // m_sub
    c_cells = _assign_cells(base, centers, 1, vec_col, id_col, "corpus_id")
    q_cells = _assign_cells(queries, centers, nprobe, vec_col, id_col, "query_id")
    enc = c_cells.select(
        "corpus_id", "cell", _pq_code_col(flat, m_sub, k_sub, dsub).alias("_codes")
    )
    # pin the cell join's parallelism (AQE sizes reducers by INPUT bytes and
    # would serialize the fan-out re-rank — same rationale as knn_ivf)
    npart = queries.sparkSession.sparkContext.defaultParallelism
    cand = (
        q_cells.select("query_id", "cell", F.col("_v").alias("_qv"))
        .repartition(npart, "cell")
        .join(enc.repartition(npart, "cell"), "cell")
        .where(F.col("query_id") != F.col("corpus_id"))
    )
    cand = cand.withColumn("qscore", _adc_score(flat, m_sub, k_sub, dsub, "_qv"))
    return _exact_rerank(
        cand,
        queries.select(F.col(id_col).alias("query_id"), _norm(vec_col).alias("_qv")),
        base.select(F.col(id_col).alias("corpus_id"), _norm(vec_col).alias("_cv")),
        k,
        rerank_factor,
    )


def deepblocker_topk(
    left: DataFrame,
    right: DataFrame | None = None,
    k: int = 5,
    dim: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
    method: str = "exact",
    n_cells: int = 16,
    nprobe: int = 4,
) -> DataFrame:
    """N7 DeepBlocker stand-in: deterministic tuple embedding + top-K pairing.

    Reference shape (``nnmethods/deepblocker/d4SA.py:17-27``,
    ``nnmethods/DDB/d4SA.py:20-30``, Dirty-ER scalability baseline
    ``nnmethods/scalabilityAnalysis/DDB.py:13-57`` with K=5 over
    ``Clean Ag.Value``): tuple_embedding_model encodes each entity's
    aggregate text, ExactTopKVectorPairing(K) emits each left entity's K
    nearest right entities by vector similarity. The learned AutoEncoder
    encoder is replaced by the deterministic feature-hashing embedding
    (``functions/vectorize.tuple_embedding`` — md5-derived token vectors,
    sum-pooled; cosine-equivalent to fastText-style mean pooling); the
    pairing step is IDENTICAL to the reference's (exact top-K cosine,
    tie-inclusive like every top-k in this engine).

    ``right=None`` runs Dirty-ER self-pairing (DDB.py's mode); otherwise
    left entities query against the right collection (d4SA.py's mode).
    ``method='exact'`` is ExactTopKVectorPairing parity (quadratic — the
    reference's own pairing is brute-force over the embedding matrix);
    ``method='ivf'`` swaps in the sampled-quantizer IVF search, the plan
    that survives corpus scale.

    Output: (query_id, corpus_id, score).
    """
    from ..functions import tokenize as tk
    from ..functions.vectorize import tuple_embedding

    def embed(df: DataFrame) -> DataFrame:
        toks = df.select(
            F.col(id_col).alias("doc_id"),
            tk.word_token_set(text_col).alias("tokens"),
        ).where(F.size("tokens") > 0)
        emb = tuple_embedding(toks, dim=dim)
        return emb.select("doc_id", F.col("vec").cast("array<double>").alias("vec"))

    q = embed(left)
    c = q if right is None else embed(right)
    if method == "exact":
        return knn_exact(q, c, k, id_col="doc_id")
    if method == "ivf":
        # quantizer='sample' keeps the promised deterministic, SQL-replayable
        # centroids (the mode q_knn_ivf_approx certifies) — the default
        # k-means fit would break the determinism contract here
        return knn_ivf(
            q, c, k, n_cells=n_cells, nprobe=nprobe,
            quantizer="sample", id_col="doc_id",
        )
    raise ValueError("method must be 'exact' or 'ivf'")
