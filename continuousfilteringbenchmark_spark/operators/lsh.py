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
across partitionings. Token -> int uses crc32 (stable across processes,
unlike python's salted ``hash``).

All signatures are computed in vectorized pandas UDFs (Arrow batches); the
band join + distinct is plain DataFrame code — Spark's shuffle is the
bucket table.
"""

from __future__ import annotations

import math
import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_MERSENNE = (1 << 61) - 1
_LARGE_PRIME = 433494437  # same role as MH_LSH.py's LARGE_PRIME band mixer


def rows_per_band(n_bands: int, threshold: float = 0.5) -> int:
    """MH_LSH.py:13-15 compute_sig_size: r = ceil(log(1/b)/log(t)) + 1."""
    return int(math.ceil(math.log(1.0 / n_bands) / math.log(threshold))) + 1


def _hash_params(n_hashes: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=n_hashes, dtype=np.int64)
    b = rng.randint(0, _MERSENNE, size=n_hashes, dtype=np.int64)
    return a, b


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
    % n_buckets exactly as ``MH_LSH.py:73-86``.
    """
    r = rows or rows_per_band(n_bands, threshold)
    n_hashes = n_bands * r
    a, b = _hash_params(n_hashes, seed)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def band_buckets(tokens: pd.Series) -> pd.Series:
        out = []
        for toks in tokens:
            if toks is None or len(toks) == 0:
                out.append([])
                continue
            xs = np.array(
                [zlib.crc32(t.encode("utf-8")) for t in toks], dtype=np.int64
            )
            # sig[i] = min over tokens of (a_i * x + b_i) mod P  (MH_LSH.py:57-71)
            hashed = (xs[None, :] * a[:, None] + b[:, None]) % _MERSENNE
            sig = hashed.min(axis=1)
            bands = sig.reshape(n_bands, r)
            buckets = (bands.sum(axis=1) * _LARGE_PRIME) % n_buckets
            out.append(buckets.tolist())
        return pd.Series(out)

    return (
        df.select(F.col(id_col).alias("doc_id"), band_buckets(F.col(tokens_col)).alias("_b"))
        .select("doc_id", F.posexplode("_b").alias("band", "bucket"))
    )


def lsh_candidates(
    bands_df: DataFrame, right_bands: DataFrame | None = None
) -> DataFrame:
    """Candidate pairs = ids co-bucketed in any (band, bucket).

    ``right_bands=None`` -> Dirty-ER self-join with left<right canonical
    ordering (MH_LSH.py:88-98); else Clean-Clean two-table join.
    """
    if right_bands is None:
        l = bands_df.select("band", "bucket", F.col("doc_id").alias("left_id"))
        r = bands_df.select("band", "bucket", F.col("doc_id").alias("right_id"))
        pairs = l.join(r, ["band", "bucket"]).where(F.col("left_id") < F.col("right_id"))
    else:
        l = bands_df.select("band", "bucket", F.col("doc_id").alias("left_id"))
        r = right_bands.select("band", "bucket", F.col("doc_id").alias("right_id"))
        pairs = l.join(r, ["band", "bucket"])
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


def hyperplane_bands(
    vecs: DataFrame,
    n_tables: int = 8,
    n_bits: int = 12,
    dim: int | None = None,
    seed: int = 5721840,  # the reference's pinned FALCONN seed (hyperplaneLSH/D4.py:87)
    vec_col: str = "vec",
    id_col: str = "doc_id",
    center: bool = True,
) -> DataFrame:
    """N3 random-hyperplane signatures: per table, n_bits of sign(V . R).

    Mirrors FALCONN hyperplane hashing (``nnmethods/falconn/hyperplaneLSH/
    D4.py:29-51,77-106``: normalize -> mean-center -> hash). Multiprobe is
    replaced by more tables (same output-quality contract, SURVEY.md N3).

    Output: (doc_id, band int, bucket long).
    """
    if dim is None:
        dim = len(vecs.select(vec_col).first()[0])
    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(n_tables, n_bits, dim)).astype(np.float64)
    mean_vec = None
    if center:
        mean_row = vecs.select(
            F.array(*[F.avg(F.col(vec_col)[i]) for i in range(dim)]).alias("m")
        ).collect()[0]["m"]
        mean_vec = np.array(mean_row, dtype=np.float64)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def buckets(vec: pd.Series) -> pd.Series:
        out = []
        weights = 1 << np.arange(n_bits, dtype=np.int64)
        for v in vec:
            x = np.asarray(v, dtype=np.float64)
            n = np.linalg.norm(x)
            if n > 0:
                x = x / n
            if mean_vec is not None:
                x = x - mean_vec
            bits = (np.einsum("tbd,d->tb", planes, x) > 0).astype(np.int64)
            out.append((bits * weights).sum(axis=1).tolist())
        return pd.Series(out)

    return vecs.select(F.col(id_col).alias("doc_id"), buckets(F.col(vec_col)).alias("_b")).select(
        "doc_id", F.posexplode("_b").alias("band", "bucket")
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
) -> DataFrame:
    """N4 cross-polytope LSH signatures (FALCONN CrossPolytope family,
    ``nnmethods/falconn/crosspolytopeLSH/D4.py``; scalability config l=128,k=2
    ``nnmethods/scalabilityAnalysis/CP_LSH.py:44-53``).

    Per table: ``n_rotations`` pseudo-random rotations (Gaussian projections
    to ``proj_dim``); each hash = index of the largest-|coordinate| axis with
    its sign (a vertex of the cross-polytope, 2*proj_dim outcomes); the
    table's bucket is the base-(2*proj_dim) concatenation. Multiprobe is
    replaced by more tables (SURVEY.md N3/N4 contract).

    Output: (doc_id, band int, bucket long).
    """
    if dim is None:
        dim = len(vecs.select(vec_col).first()[0])
    rng = np.random.RandomState(seed)
    rots = rng.normal(size=(n_tables, n_rotations, proj_dim, dim)).astype(np.float64)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def buckets(vec: pd.Series) -> pd.Series:
        out = []
        base = 2 * proj_dim
        for v in vec:
            x = np.asarray(v, dtype=np.float64)
            n = np.linalg.norm(x)
            if n > 0:
                x = x / n
            proj = np.einsum("trpd,d->trp", rots, x)  # (tables, rotations, proj_dim)
            axis = np.abs(proj).argmax(axis=2)  # (tables, rotations)
            sign = (np.take_along_axis(proj, axis[:, :, None], axis=2)[:, :, 0] < 0).astype(
                np.int64
            )
            vertex = axis * 2 + sign  # in [0, 2*proj_dim)
            weights = base ** np.arange(n_rotations, dtype=np.int64)
            out.append((vertex * weights).sum(axis=1).tolist())
        return pd.Series(out)

    return vecs.select(F.col(id_col).alias("doc_id"), buckets(F.col(vec_col)).alias("_b")).select(
        "doc_id", F.posexplode("_b").alias("band", "bucket")
    )


# ------------------------------------------------------------------ simhash


def simhash64(
    df: DataFrame, tokens_col: str = "tokens", id_col: str = "doc_id"
) -> DataFrame:
    """64-bit SimHash per doc (near-dup fingerprint for the dedup family).

    Each token hashes to 64 bits (two crc32 halves); bit-wise +1/-1 vote;
    fingerprint = sign pattern. Vectorized pandas UDF.
    Output: (doc_id, simhash long).
    """

    @F.pandas_udf(T.LongType())
    def fp(tokens: pd.Series) -> pd.Series:
        out = []
        for toks in tokens:
            if toks is None or len(toks) == 0:
                out.append(0)
                continue
            votes = np.zeros(64, dtype=np.int64)
            for t in toks:
                bt = t.encode("utf-8")
                h = np.uint64((zlib.crc32(bt) << 32) | zlib.crc32(b"\x00" + bt))
                bits = ((h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.int64)
                votes += 2 * bits - 1
            fp_bits = (votes > 0).astype(np.uint64)
            val = int((fp_bits << np.arange(64, dtype=np.uint64)).sum(dtype=np.uint64))
            out.append(val - (1 << 64) if val >= (1 << 63) else val)
        return pd.Series(out, dtype="int64")

    return df.select(F.col(id_col).alias("doc_id"), fp(F.col(tokens_col)).alias("simhash"))


def simhash_near_duplicates(
    df: DataFrame,
    max_hamming: int = 3,
    n_chunks: int = 4,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup pairs by SimHash: block on 16-bit fingerprint chunks (pigeonhole:
    hamming <= n_chunks-1 guarantees one exact chunk match), verify hamming
    distance natively with bit_count(xor).

    Output: (left_id, right_id, hamming int).
    """
    fps = simhash64(df, tokens_col, id_col)
    chunks = fps.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk_id"),
                        F.shiftrightunsigned(F.col("simhash"), i * (64 // n_chunks))
                        .bitwiseAND(F.lit((1 << (64 // n_chunks)) - 1))
                        .alias("chunk"),
                    )
                    for i in range(n_chunks)
                ]
            )
        ).alias("c"),
    ).select("doc_id", "simhash", F.col("c.chunk_id"), F.col("c.chunk"))
    l = chunks.select(
        "chunk_id", "chunk", F.col("doc_id").alias("left_id"), F.col("simhash").alias("_hl")
    )
    r = chunks.select(
        "chunk_id", "chunk", F.col("doc_id").alias("right_id"), F.col("simhash").alias("_hr")
    )
    pairs = (
        l.join(r, ["chunk_id", "chunk"])
        .where(F.col("left_id") < F.col("right_id"))
        .select("left_id", "right_id", F.bit_count(F.col("_hl").bitwiseXOR(F.col("_hr"))).alias("hamming"))
        .distinct()
    )
    return pairs.where(F.col("hamming") <= max_hamming)
