"""Locality-sensitive hashing operators (SURVEY.md §2.5, N1-N4) + SimHash.

Executable spec for minhash parity: the reference's pure-python Dirty-ER
implementation ``nnmethods/scalabilityAnalysis/MH_LSH.py``:

* rows per band from the target threshold: ``r = ceil(log(1/b)/log(t)) + 1``
  (``MH_LSH.py:13-15`` uses t=0.5 -> log(0.5));
* signature = per-hash-function min over the token set's universal hashes
  ``(a*x + b) mod P`` (``MH_LSH.py:57-71``);
* band hash = ``sum(sig[band]) * LARGE_PRIME % buckets`` (``MH_LSH.py:73-86``);
* candidates = co-bucketed ids per (band, bucket), canonically ordered
  (``MH_LSH.py:88-98``).

DETERMINISM: the reference's Java MinHash seeds with wall-clock time
(``nnmethods/minhashLSH/src/minhash/MinHash.java:14`` — the anti-pattern
SURVEY.md risk #6 bans); we pin an explicit seed so runs are reproducible
across partitionings.

ORACLE-EXACT ARITHMETIC: every quantity is integer math reproducible
bit-for-bit by a SQL oracle on any engine with ``md5``:

* token -> int: the first 10 hex chars (40 bits) of ``md5(token)``;
* universal hash ``(a*x + b) mod P`` with ``a, b < 2^20`` drawn from a
  seeded ``RandomState`` and ``P = 2^31 - 1`` — products stay < 2^61, so
  int64 arithmetic never wraps (numpy, Spark ANSI longs and DuckDB BIGINT
  all agree exactly);
* band bucket = ``((sum(sig_band) mod P) * LARGE_PRIME) mod n_buckets``.

Execution split: token->int40 hashing is native Spark SQL (md5 inside
whole-stage codegen; only primitive longs cross the Arrow boundary); the
192-permutation signature min is ONE vectorized numpy pandas-UDF (Catalyst
evaluates higher-order array lambdas interpreted, per element — measured
~10x slower than the numpy broadcast over identical int64 math); the band
join + distinct is plain DataFrame code — Spark's shuffle is the bucket
table.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_MINHASH_P = (1 << 31) - 1  # Mersenne prime 2^31-1: sig values fit 31 bits
_LARGE_PRIME = 433494437  # same role as MH_LSH.py's LARGE_PRIME band mixer


def rows_per_band(n_bands: int, threshold: float = 0.5) -> int:
    """MH_LSH.py:13-15 compute_sig_size: r = ceil(log(1/b)/log(t)) + 1."""
    return int(math.ceil(math.log(1.0 / n_bands) / math.log(threshold))) + 1


def _hash_params(n_hashes: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """Seeded universal-hash coefficients, bounded to 20 bits so that
    a*x + b < 2^61 for 40-bit token hashes (exact in int64 everywhere)."""
    rng = np.random.RandomState(seed)
    a = rng.randint(1, 1 << 20, size=n_hashes, dtype=np.int64)
    b = rng.randint(0, 1 << 20, size=n_hashes, dtype=np.int64)
    return a, b


def token_hash40(tok):
    """40-bit integer hash of a token: first 10 hex chars of md5.

    Chosen over xxhash64/crc32 because md5 is the one hash every SQL engine
    computes identically — the DuckDB oracle replays it verbatim.
    """
    return F.conv(F.substring(F.md5(tok), 1, 10), 16, 10).cast("long")


def minhash_bands(
    df: DataFrame,
    n_bands: int = 32,
    n_buckets: int = 16,
    threshold: float = 0.5,
    seed: int = 42,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    rows: int | None = None,
) -> DataFrame:
    """Per-doc (band, bucket) table from minhash signatures.

    Output: DataFrame(doc_id, band int, bucket long). Parity with
    ``MH_LSH.py`` modulo the pinned seed; bucket = sum(band rows) * prime
    % n_buckets exactly as ``MH_LSH.py:73-86`` (with a mod-P fold of the
    band sum first so the product can never overflow int64).

    Pure Spark SQL expressions: O(n_hashes * n_tokens) per row inside
    whole-stage codegen; docs with empty token sets emit no bands.
    """
    r = rows or rows_per_band(n_bands, threshold)
    n_hashes = n_bands * r
    a, b = _hash_params(n_hashes, seed)

    # token -> 40-bit int stays JVM-side SQL (md5 inside codegen; only longs
    # cross the Arrow boundary). The 192-permutation min does NOT: Catalyst
    # higher-order functions are interpreted per element (no codegen), so a
    # transform(sequence(0,191), array_min(transform(xs,...))) tree is ~10x
    # slower than one numpy broadcast over the same int64 math. Identical
    # arithmetic either way — the DuckDB oracle replays the SQL formula.
    xs = F.transform(F.col(tokens_col), token_hash40)

    a_col = a.reshape(n_hashes, 1)
    b_col = b.reshape(n_hashes, 1)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def buckets(hashed: pd.Series) -> pd.Series:
        # the permutation table (a*h + b) % P is computed once per DISTINCT
        # gram hash in a chunk of rows, then per-doc signatures gather+min
        # from it: corpora share most shingles across documents, so the
        # expensive int64 mul+mod count drops from n_hashes x total_tokens
        # to n_hashes x unique_tokens (identical minima — dedup before min).
        # Chunks cap the permutation table at ~n_hashes x CH x 8 bytes.
        out = []
        arrs = [np.asarray(row, dtype=np.int64) for row in hashed]
        CH = 100_000  # max tokens (hence unique hashes) per chunk
        i, n = 0, len(arrs)
        while i < n:
            j, tot = i, 0
            while j < n and (tot == 0 or tot + arrs[j].size <= CH):
                tot += arrs[j].size
                j += 1
            flat = (
                np.concatenate(arrs[i:j]) if j > i else np.empty(0, np.int64)
            )
            uniq, inv = np.unique(flat, return_inverse=True)
            # (n_hashes, U): a*h + b < 2^61, exact in int64
            sig_u = (a_col * uniq[None, :] + b_col) % _MINHASH_P
            pos = 0
            for x in arrs[i:j]:
                sig = sig_u[:, inv[pos : pos + x.size]].min(axis=1)
                pos += x.size
                # bands are consecutive r-slices of the signature; sum < r*P
                # < 2^34, then (mod P) * LARGE_PRIME < 2^60 — never wraps
                band_sums = sig.reshape(n_bands, r).sum(axis=1)
                out.append(
                    ((band_sums % _MINHASH_P) * _LARGE_PRIME % n_buckets).tolist()
                )
            i = j
        return pd.Series(out)

    return (
        df.select(F.col(id_col).alias("doc_id"), xs.alias("_xs"))
        .where(F.size("_xs") > 0)
        .select("doc_id", F.posexplode(buckets(F.col("_xs"))).alias("band", "bucket"))
    )


def lsh_candidates(
    bands_df: DataFrame, right_bands: DataFrame | None = None
) -> DataFrame:
    """Candidate pairs = ids co-bucketed in any (band, bucket).

    ``right_bands=None`` -> Dirty-ER self-join with left<right canonical
    ordering (MH_LSH.py:88-98); else Clean-Clean two-table join.
    """
    # pin the bucket join's parallelism: band tables are narrow (a few MB
    # even at 10^6 docs) so AQE — sizing reducers by INPUT bytes — coalesces
    # the join to one task, and the candidate fan-out plus the downstream
    # verification (wide token arrays per pair) serializes on one core
    # (measured 5.8 CPU-s single-task at sf0.1). An explicit hash
    # repartition on the join key is respected by AQE; parallelism is
    # bounded by the number of distinct (band, bucket) cells — thousands.
    npart = bands_df.sparkSession.sparkContext.defaultParallelism
    if right_bands is None:
        l = bands_df.select("band", "bucket", F.col("doc_id").alias("left_id"))
        r = bands_df.select("band", "bucket", F.col("doc_id").alias("right_id"))
        pairs = l.repartition(npart, "band", "bucket").join(
            r.repartition(npart, "band", "bucket"), ["band", "bucket"]
        ).where(F.col("left_id") < F.col("right_id"))
    else:
        l = bands_df.select("band", "bucket", F.col("doc_id").alias("left_id"))
        r = right_bands.select("band", "bucket", F.col("doc_id").alias("right_id"))
        pairs = l.repartition(npart, "band", "bucket").join(
            r.repartition(npart, "band", "bucket"), ["band", "bucket"]
        )
    return pairs.select("left_id", "right_id").distinct()


def minhash_lsh_join(
    left: DataFrame,
    right: DataFrame | None = None,
    n_bands: int = 32,
    n_buckets: int = 16,
    threshold: float = 0.5,
    seed: int = 42,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """N1/N2 MinHash-LSH candidate generation end-to-end."""
    lb = minhash_bands(left, n_bands, n_buckets, threshold, seed, tokens_col, id_col)
    rb = (
        None
        if right is None
        else minhash_bands(right, n_bands, n_buckets, threshold, seed, tokens_col, id_col)
    )
    return lsh_candidates(lb, rb)


# ------------------------------------------------------------ hyperplane LSH


def hash_uniforms(tag: str, shape: tuple[int, ...]) -> np.ndarray:
    """Deterministic pseudo-random array in [-0.5, 0.5): element (i0,i1,..)
    = (first 10 hex chars of md5(f"{tag}:{i0}:{i1}:..") as int) / 2^40 - 0.5.

    Used instead of seeded Gaussian draws for the LSH projections so a SQL
    oracle can regenerate the exact same planes from the md5 formula (no
    giant literal arrays, no RNG-stream coupling). For sign/argmax LSH the
    direction distribution only needs to be symmetric about 0 — the uniform
    cube's mild diagonal bias trades a little hash quality (covered by the
    recall unit tests) for bit-exact cross-engine reproducibility.
    """
    import hashlib

    flat = np.empty(int(np.prod(shape)), dtype=np.float64)
    for n, idx in enumerate(np.ndindex(*shape)):
        key = tag + ":" + ":".join(str(i) for i in idx)
        flat[n] = int(hashlib.md5(key.encode()).hexdigest()[:10], 16) / 2**40 - 0.5
    return flat.reshape(shape)


def _hyperplane_mean(vecs: DataFrame, dim: int, vec_col: str = "vec") -> np.ndarray:
    """Per-dimension mean of a vector column (the FALCONN centering vector);
    one aggregate job. Callers needing both the base and probe buckets get
    them from ONE band table (rank column) — the mean is never recomputed."""
    mean_row = vecs.select(
        F.array(*[F.avg(F.col(vec_col)[i]) for i in range(dim)]).alias("m")
    ).collect()[0]["m"]
    return np.array(mean_row, dtype=np.float64)


def hyperplane_bands(
    vecs: DataFrame,
    n_tables: int = 8,
    n_bits: int = 12,
    dim: int | None = None,
    seed: int = 5721840,  # the reference's pinned FALCONN seed (hyperplaneLSH/D4.py:87)
    vec_col: str = "vec",
    id_col: str = "doc_id",
    center: bool = True,
    n_probes: int = 0,
) -> DataFrame:
    """N3 random-hyperplane signatures: per table, n_bits of sign(V . R).

    Mirrors FALCONN hyperplane hashing (``nnmethods/falconn/hyperplaneLSH/
    D4.py:29-51,77-106``: normalize -> mean-center -> hash). Planes are
    md5-derived (``hash_uniforms``) so the DuckDB oracle replays them
    exactly.

    ``n_probes`` is the FALCONN multiprobe axis (``set_num_probes`` /
    ``get_unique_candidates``, ``hyperplaneLSH/D4.py:118-150``): per table,
    emit ``n_probes`` EXTRA buckets obtained by flipping the least-confident
    bits — the j-th probe flips the bit with the j-th smallest |projection|
    (the standard multiprobe sequence truncated to single-bit flips). Probe
    ranks use |projection| rounded to 9 decimals with the bit index as
    tie-break, so the SQL oracle's ranking agrees bit-for-bit. FALCONN's
    ``num_probes`` counts total probes across tables; here the knob is
    per-table extra probes (total = n_tables * (1 + n_probes)).

    Output: (doc_id, band int, bucket long, rank int) — one row per
    (table, probe); ``rank`` 0 = the base bucket, j >= 1 = the j-th probe.
    A probe pass therefore CONTAINS the base table (``rank = 0`` rows),
    so callers needing both never scan the input twice — filter instead.
    """
    if dim is None:
        dim = len(vecs.select(vec_col).first()[0])
    planes = hash_uniforms(f"hp:{seed}", (n_tables, n_bits, dim))
    mean_vec = _hyperplane_mean(vecs, dim, vec_col) if center else None

    out_type = T.ArrayType(
        T.StructType(
            [
                T.StructField("band", T.IntegerType()),
                T.StructField("bucket", T.LongType()),
                T.StructField("rank", T.IntegerType()),
            ]
        )
    )

    @F.pandas_udf(out_type)
    def buckets(vec: pd.Series) -> pd.Series:
        out = []
        weights = 1 << np.arange(n_bits, dtype=np.int64)
        tables = range(n_tables)
        for v in vec:
            x = np.asarray(v, dtype=np.float64)
            n = np.linalg.norm(x)
            if n > 0:
                x = x / n
            if mean_vec is not None:
                x = x - mean_vec
            proj = np.einsum("tbd,d->tb", planes, x)
            bits = (proj > 0).astype(np.int64)
            base = (bits * weights).sum(axis=1)
            rows = [(t, int(base[t]), 0) for t in tables]
            if n_probes:
                # stable argsort on the rounded magnitudes = rank by
                # (round(|proj|, 9) asc, bit asc) — the oracle's ORDER BY
                order = np.argsort(np.round(np.abs(proj), 9), axis=1, kind="stable")
                for j in range(min(n_probes, n_bits)):
                    pb = base ^ (np.int64(1) << order[:, j])
                    rows += [(t, int(pb[t]), j + 1) for t in tables]
            out.append(rows)
        return pd.Series(out)

    return vecs.select(
        F.col(id_col).alias("doc_id"), F.explode(buckets(F.col(vec_col))).alias("_bb")
    ).select(
        "doc_id",
        F.col("_bb.band").alias("band"),
        F.col("_bb.bucket").alias("bucket"),
        F.col("_bb.rank").alias("rank"),
    )


def crosspolytope_bands(
    vecs: DataFrame,
    n_tables: int = 8,
    n_rotations: int = 2,
    proj_dim: int = 16,
    dim: int | None = None,
    seed: int = 5721840,  # same pinned seed family as the FALCONN scripts
    vec_col: str = "vec",
    id_col: str = "doc_id",
    n_probes: int = 0,
) -> DataFrame:
    """N4 cross-polytope LSH signatures (FALCONN CrossPolytope family,
    ``nnmethods/falconn/crosspolytopeLSH/D4.py``; scalability config l=128,k=2
    ``nnmethods/scalabilityAnalysis/CP_LSH.py:44-53``).

    Per table: ``n_rotations`` pseudo-random rotations (Gaussian projections
    to ``proj_dim``); each hash = index of the largest-|coordinate| axis with
    its sign (a vertex of the cross-polytope, 2*proj_dim outcomes); the
    table's bucket is the base-(2*proj_dim) concatenation. Rotations are
    md5-derived (``hash_uniforms``) for exact oracle parity.

    ``n_probes > 0`` is FALCONN's cross-polytope probe axis
    (``CP_LSH.py:53`` number_of_probes; ours covers the single-substitution
    rung of that sequence): probe j re-hashes the table with the j-th
    WEAKEST rotation — smallest margin round(|top|,9) - round(|second|,9),
    tie -> lower rotation — flipped to its runner-up vertex (second-largest
    rounded |coordinate| with its own sign; the opposite-sign vertex of the
    winning axis is always the farthest, so the runner-up axis is the
    correct next-closest vertex). At most ``n_rotations`` single
    substitutions exist, so ``n_probes`` caps there; in the probe variant
    the BASE vertex also ranks by rounded magnitude so the probe sequence
    and base bucket come from one ordering the SQL oracle replays verbatim.

    Output: (doc_id, band int, bucket long) — or with ``rank int`` (0 =
    base, j >= 1 = j-th probe) when ``n_probes > 0``; a probe pass CONTAINS
    the base rows, so consumers filter ``rank = 0`` for the indexed side.

    Cross-engine rounding assumption (documented, not load-bearing): the
    vertex/margin ranking rounds to 9 decimals with numpy ``np.round``
    (half-to-EVEN) while the DuckDB oracle's ``round()`` is half-AWAY —
    the two differ only when a projection magnitude lands on an exact .5
    at the 9th decimal, a measure-zero event for md5-derived float sums
    (and one that would merely reorder two probes, not corrupt a bucket).
    An integer-exact tie key would close even that gap; kept as-is because
    the rounding itself exists only to ABSORB float noise in the ranking.
    """
    if dim is None:
        dim = len(vecs.select(vec_col).first()[0])
    rots = hash_uniforms(f"cp:{seed}", (n_tables, n_rotations, proj_dim, dim))
    base = 2 * proj_dim
    weights = base ** np.arange(n_rotations, dtype=np.int64)

    if not n_probes:

        @F.pandas_udf(T.ArrayType(T.LongType()))
        def buckets(vec: pd.Series) -> pd.Series:
            out = []
            for v in vec:
                x = np.asarray(v, dtype=np.float64)
                n = np.linalg.norm(x)
                if n > 0:
                    x = x / n
                proj = np.einsum("trpd,d->trp", rots, x)  # (t, r, p)
                axis = np.abs(proj).argmax(axis=2)  # (tables, rotations)
                sign = (
                    np.take_along_axis(proj, axis[:, :, None], axis=2)[:, :, 0] < 0
                ).astype(np.int64)
                vertex = axis * 2 + sign  # in [0, 2*proj_dim)
                out.append((vertex * weights).sum(axis=1).tolist())
            return pd.Series(out)

        return vecs.select(
            F.col(id_col).alias("doc_id"), buckets(F.col(vec_col)).alias("_b")
        ).select("doc_id", F.posexplode("_b").alias("band", "bucket"))

    probe_schema = T.ArrayType(
        T.StructType(
            [
                T.StructField("band", T.IntegerType()),
                T.StructField("bucket", T.LongType()),
                T.StructField("rank", T.IntegerType()),
            ]
        )
    )

    @F.pandas_udf(probe_schema)
    def probe_buckets(vec: pd.Series) -> pd.Series:
        out = []
        nj = min(n_probes, n_rotations)
        for v in vec:
            x = np.asarray(v, dtype=np.float64)
            n = np.linalg.norm(x)
            if n > 0:
                x = x / n
            proj = np.einsum("trpd,d->trp", rots, x)  # (t, r, p)
            absj = np.round(np.abs(proj), 9)
            order = np.argsort(-absj, axis=2, kind="stable")  # ties -> axis asc
            top = order[:, :, 0]
            second = order[:, :, 1]

            def vert(ax):
                s = (np.take_along_axis(proj, ax[:, :, None], axis=2)[:, :, 0] < 0)
                return ax * 2 + s.astype(np.int64)

            v1, v2 = vert(top), vert(second)
            margin = np.take_along_axis(absj, top[:, :, None], axis=2)[
                :, :, 0
            ] - np.take_along_axis(absj, second[:, :, None], axis=2)[:, :, 0]
            weak = np.argsort(margin, axis=1, kind="stable")  # ties -> rot asc
            bkt = (v1 * weights).sum(axis=1)
            rows = [(t, int(bkt[t]), 0) for t in range(n_tables)]
            for j in range(nj):
                rr = weak[:, j]
                delta = (
                    np.take_along_axis(v2 - v1, rr[:, None], axis=1)[:, 0]
                    * weights[rr]
                )
                rows += [(t, int(bkt[t] + delta[t]), j + 1) for t in range(n_tables)]
            out.append(rows)
        return pd.Series(out)

    return vecs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(probe_buckets(F.col(vec_col))).alias("_bb"),
    ).select(
        "doc_id",
        F.col("_bb.band").alias("band"),
        F.col("_bb.bucket").alias("bucket"),
        F.col("_bb.rank").alias("rank"),
    )


# ------------------------------------------------------------------ simhash


def simhash64(
    df: DataFrame, tokens_col: str = "tokens", id_col: str = "doc_id"
) -> DataFrame:
    """64-bit SimHash per doc (near-dup fingerprint for the dedup family),
    carried as two unsigned 32-bit halves in long columns.

    Each token hashes to 64 bits — the first/second 8 hex chars of its md5
    (exactly reproducible by the SQL oracle); bit-wise +1/-1 vote over the
    token set; fingerprint = sign pattern. The halved representation keeps
    every value non-negative, so the arithmetic is identical across Spark
    ANSI longs, numpy and DuckDB BIGINT (no sign-bit juggling).

    Execution split (same as ``minhash_bands``): token -> 64-bit md5 prefix
    stays JVM-side SQL (md5 inside whole-stage codegen; only long arrays
    cross the Arrow boundary); the 64-bit-position vote tally is ONE
    vectorized numpy pandas-UDF — the previous ``F.aggregate``/``zip_with``
    formulation evaluated 64 interpreted higher-order lambdas PER TOKEN
    (Catalyst HOFs don't codegen); the numpy bit-unpack over identical
    integer math measured 1.27x faster END-TO-END at sf0.1 (1.61s -> 1.27s
    median, same session back-to-back — the tally stage itself shrinks much
    more; band-join + distinct dominate the residual). The gap widens with
    tokens/doc. Bit tables are computed
    once per DISTINCT token hash in a chunk of rows (corpora share most
    tokens across documents), then per-doc tallies gather+sum from it.

    Docs with empty token sets are dropped (their fingerprint would be the
    degenerate all-zero pattern, co-bucketing every empty doc).

    Output: (doc_id, fp_hi long, fp_lo long) — each in [0, 2^32).
    """

    def md5_half(t, start: int):
        return F.conv(F.substring(F.md5(t), start, 8), 16, 10).cast("long")

    his = F.transform(F.col(tokens_col), lambda t: md5_half(t, 1))
    los = F.transform(F.col(tokens_col), lambda t: md5_half(t, 9))

    @F.pandas_udf("fp_hi long, fp_lo long")
    def fps(hi_s: pd.Series, lo_s: pd.Series) -> pd.DataFrame:
        sh32 = np.arange(32, dtype=np.int64)
        sh64 = np.arange(64, dtype=np.uint64)
        # combined 64-bit hash per token: bit k<32 = lo bit k, k>=32 = hi
        # bit k-32 — the same layout the fingerprint halves unpack below
        arrs = [
            (np.asarray(h, dtype=np.int64).astype(np.uint64) << np.uint64(32))
            | np.asarray(l, dtype=np.int64).astype(np.uint64)
            for h, l in zip(hi_s, lo_s)
        ]
        out_hi: list[int] = []
        out_lo: list[int] = []
        CH = 100_000  # max tokens (hence unique hashes) per chunk
        i, n = 0, len(arrs)
        while i < n:
            j, tot = i, 0
            while j < n and (tot == 0 or tot + arrs[j].size <= CH):
                tot += arrs[j].size
                j += 1
            flat = np.concatenate(arrs[i:j]) if j > i else np.empty(0, np.uint64)
            uniq, inv = np.unique(flat, return_inverse=True)
            # (U, 64) 0/1 table: one bit-unpack per distinct hash
            bits = ((uniq[:, None] >> sh64) & np.uint64(1)).astype(np.int64)
            pos = 0
            for x in arrs[i:j]:
                ones = bits[inv[pos : pos + x.size]].sum(axis=0)
                pos += x.size
                # vote sum over +1/-1 per token = 2*ones - n_tokens
                fpbits = (2 * ones - x.size) > 0
                out_lo.append(int((fpbits[:32].astype(np.int64) << sh32).sum()))
                out_hi.append(int((fpbits[32:].astype(np.int64) << sh32).sum()))
            i = j
        return pd.DataFrame({"fp_hi": out_hi, "fp_lo": out_lo})

    return (
        df.where(F.size(F.col(tokens_col)) > 0)
        .select(F.col(id_col).alias("doc_id"), fps(his, los).alias("_fp"))
        .select("doc_id", F.col("_fp.fp_hi").alias("fp_hi"), F.col("_fp.fp_lo").alias("fp_lo"))
    )


def simhash_near_duplicates(
    df: DataFrame,
    max_hamming: int = 3,
    n_chunks: int = 4,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup pairs by SimHash: block on fingerprint chunks (pigeonhole:
    hamming <= n_chunks-1 guarantees at least one exact chunk match), verify
    hamming distance natively with bit_count(xor).

    Because the chunk blocking is lossless for the final ``hamming <=
    max_hamming`` filter (requires ``max_hamming <= n_chunks - 1``), the
    output equals the brute-force all-pairs answer — which is exactly what
    the DuckDB oracle computes.

    Output: (left_id, right_id, hamming int).
    """
    if n_chunks % 2 or 64 % n_chunks:
        raise ValueError("n_chunks must be even and divide 64")
    if max_hamming > n_chunks - 1:
        raise ValueError("pigeonhole blocking needs max_hamming <= n_chunks - 1")
    width = 64 // n_chunks
    mask = (1 << width) - 1
    per_half = n_chunks // 2
    # both sides of the chunk self-join derive from the fingerprint table —
    # persist it so the 64-bit vote aggregation runs once, not twice
    fps = simhash64(df, tokens_col, id_col).persist()
    chunk_structs = [
        F.struct(
            F.lit(i).alias("chunk_id"),
            F.shiftright(F.col(half), (i % per_half) * width)
            .bitwiseAND(F.lit(mask))
            .alias("chunk"),
        )
        for i, half in enumerate(["fp_lo"] * per_half + ["fp_hi"] * per_half)
    ]
    chunks = fps.select(
        "doc_id", "fp_hi", "fp_lo", F.explode(F.array(*chunk_structs)).alias("c")
    ).select("doc_id", "fp_hi", "fp_lo", F.col("c.chunk_id"), F.col("c.chunk"))
    l = chunks.select(
        "chunk_id", "chunk", F.col("doc_id").alias("left_id"),
        F.col("fp_hi").alias("_hhl"), F.col("fp_lo").alias("_hll"),
    )
    r = chunks.select(
        "chunk_id", "chunk", F.col("doc_id").alias("right_id"),
        F.col("fp_hi").alias("_hhr"), F.col("fp_lo").alias("_hlr"),
    )
    hamming = (
        F.bit_count(F.col("_hhl").bitwiseXOR(F.col("_hhr")))
        + F.bit_count(F.col("_hll").bitwiseXOR(F.col("_hlr")))
    ).cast("int")
    pairs = (
        l.join(r, ["chunk_id", "chunk"])
        .where(F.col("left_id") < F.col("right_id"))
        .select("left_id", "right_id", hamming.alias("hamming"))
        .distinct()
    )
    return pairs.where(F.col("hamming") <= max_hamming)
