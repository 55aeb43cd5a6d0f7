"""Similarity functions.

Set similarities from common-token counts (reference
``joins/src/joins/SchemaAgnosticEJoin.java:105-116``; enum
``joins/src/utilities/SimilarityFunction.java:12-16``)::

    c = |A ∩ B|
    cosine  = c / sqrt(|A| * |B|)
    dice    = 2c / (|A| + |B|)
    jaccard = c / (|A| + |B| - c)

String distances for the verification stage (north rule): builtin
``levenshtein`` (JVM-side) and a batched Jaro-Winkler pandas UDF (Spark has
no builtin; vectorized per Arrow batch, pure numpy-ish python per string —
acceptable because it runs on pruned candidate pairs, not the raw space).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

SET_SIMS = ("cosine", "dice", "jaccard")


def set_similarity(common: Column, size_a: Column, size_b: Column, kind: str = "jaccard") -> Column:
    """Similarity from intersection count + set sizes (exact reference formulas)."""
    c = common.cast("double")
    a = size_a.cast("double")
    b = size_b.cast("double")
    if kind == "cosine":
        return c / F.sqrt(a * b)
    if kind == "dice":
        return F.lit(2.0) * c / (a + b)
    if kind == "jaccard":
        return c / (a + b - c)
    raise ValueError(f"unknown similarity {kind!r} (one of {SET_SIMS})")


def edit_distance(left: Column, right: Column) -> Column:
    """Levenshtein distance — Spark builtin, stays JVM-side."""
    return F.levenshtein(left, right)


def edit_similarity(left: Column, right: Column) -> Column:
    """Normalized edit similarity: 1 - lev/max(len) (1.0 for two empties)."""
    m = F.greatest(F.length(left), F.length(right))
    return F.when(m == 0, F.lit(1.0)).otherwise(
        F.lit(1.0) - F.levenshtein(left, right) / m.cast("double")
    )


def _jaro(s: str, t: str) -> float:
    if s == t:
        return 1.0
    ls, lt = len(s), len(t)
    if ls == 0 or lt == 0:
        return 0.0
    window = max(ls, lt) // 2 - 1
    if window < 0:
        window = 0
    s_matches = [False] * ls
    t_matches = [False] * lt
    matches = 0
    for i, ch in enumerate(s):
        lo = max(0, i - window)
        hi = min(i + window + 1, lt)
        for j in range(lo, hi):
            if not t_matches[j] and t[j] == ch:
                s_matches[i] = True
                t_matches[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    transpositions = 0
    j = 0
    for i in range(ls):
        if s_matches[i]:
            while not t_matches[j]:
                j += 1
            if s[i] != t[j]:
                transpositions += 1
            j += 1
    transpositions //= 2
    return (matches / ls + matches / lt + (matches - transpositions) / matches) / 3.0


def _jaro_winkler(s: str, t: str, p: float = 0.1, max_prefix: int = 4) -> float:
    j = _jaro(s, t)
    prefix = 0
    for a, b in zip(s, t):
        if a != b or prefix == max_prefix:
            break
        prefix += 1
    return j + prefix * p * (1.0 - j)


_PAD_S = np.uint32(0xFFFFFFFD)  # sentinels above the Unicode range so a
_PAD_T = np.uint32(0xFFFFFFFE)  # padded position never matches anything


def _jw_chunk(
    ss: list[str], ts: list[str], ls: np.ndarray, lt: np.ndarray,
    p: float, max_prefix: int,
) -> np.ndarray:
    """Jaro-Winkler for one chunk of non-equal, non-empty string pairs,
    vectorized ACROSS the chunk: strings become (n, maxlen) uint32 char
    matrices (numpy's UCS4 buffer viewed directly), and the greedy match
    loop runs over character positions with all rows advancing in lock-step
    — each (i, j) step is a handful of boolean vector ops instead of a
    per-row Python inner loop. Exactly the scalar ``_jaro_winkler``
    semantics (pinned by tests/test_similarity_batch.py)."""
    n = len(ss)
    mls, mlt = int(ls.max()), int(lt.max())
    S = np.array(ss, dtype=f"U{mls}").view(np.uint32).reshape(n, mls).copy()
    Tm = np.array(ts, dtype=f"U{mlt}").view(np.uint32).reshape(n, mlt).copy()
    S[np.arange(mls) >= ls[:, None]] = _PAD_S
    Tm[np.arange(mlt) >= lt[:, None]] = _PAD_T
    w = np.maximum(np.maximum(ls, lt) // 2 - 1, 0)
    W = int(w.max())

    SM = np.zeros((n, mls), dtype=bool)
    TM = np.zeros((n, mlt), dtype=bool)
    for i in range(mls):
        ch = S[:, i]
        found = np.zeros(n, dtype=bool)
        for j in range(max(0, i - W), min(mlt, i + W + 1)):
            cand = (
                ~found
                & (np.abs(i - j) <= w)
                & (Tm[:, j] == ch)
                & ~TM[:, j]
            )
            if cand.any():
                TM[cand, j] = True
                found |= cand
        SM[:, i] = found

    matches = SM.sum(axis=1)
    mm = max(int(matches.max()), 1)
    # matched chars of each side in position order, packed left via the
    # running match rank — the transposition count compares them pairwise
    MS = np.zeros((n, mm), dtype=np.uint32)
    MT = np.full((n, mm), np.uint32(1), dtype=np.uint32)
    ri, ci = np.nonzero(SM)
    MS[ri, (SM.cumsum(axis=1) - 1)[ri, ci]] = S[ri, ci]
    ri, ci = np.nonzero(TM)
    MT[ri, (TM.cumsum(axis=1) - 1)[ri, ci]] = Tm[ri, ci]
    trans = (((MS != MT) & (np.arange(mm) < matches[:, None])).sum(axis=1) // 2)

    m = matches.astype(np.float64)
    safe = np.maximum(matches, 1).astype(np.float64)
    jaro = np.where(
        matches == 0,
        0.0,
        (m / ls + m / lt + (m - trans) / safe) / 3.0,
    )
    k = min(max_prefix, mls, mlt)
    if k > 0:
        prefix = np.cumprod(S[:, :k] == Tm[:, :k], axis=1).sum(axis=1)
    else:
        prefix = np.zeros(n, dtype=np.int64)
    return jaro + prefix * p * (1.0 - jaro)


def _jaro_winkler_batch(
    ss: list[str], ts: list[str], p: float = 0.1, max_prefix: int = 4
) -> np.ndarray:
    """Batch Jaro-Winkler: equal pairs short-circuit to 1.0, empty-side
    pairs to 0.0; the rest are processed in length-SORTED chunks of 1024 so
    each chunk's padded matrix width tracks its own strings (one 10x-longer
    outlier inflates only its own chunk, not the whole batch)."""
    n = len(ss)
    out = np.zeros(n, dtype=np.float64)
    ls = np.fromiter((len(s) for s in ss), count=n, dtype=np.int64)
    lt = np.fromiter((len(t) for t in ts), count=n, dtype=np.int64)
    eq = np.fromiter((a == b for a, b in zip(ss, ts)), count=n, dtype=bool)
    out[eq] = 1.0
    work = np.nonzero(~eq & (ls > 0) & (lt > 0))[0]
    if work.size == 0:
        return out
    work = work[np.argsort(np.maximum(ls, lt)[work], kind="stable")]
    # 4096 measured best (50k x 20-80-char pairs: 1.44s vs 2.05s @1024,
    # 2.47s @8192 — larger chunks lose length homogeneity, so the padded
    # width W and the (i, j) loop trip count grow faster than the per-op
    # amortization gains)
    CH = 4096
    for c0 in range(0, work.size, CH):
        rows = work[c0 : c0 + CH]
        out[rows] = _jw_chunk(
            [ss[i] for i in rows], [ts[i] for i in rows],
            ls[rows], lt[rows], p, max_prefix,
        )
    return out


@F.pandas_udf(T.DoubleType())
def jaro_winkler(left: pd.Series, right: pd.Series) -> pd.Series:
    """Batched Jaro-Winkler similarity (standard Winkler p=0.1, prefix<=4).

    Arrow-vectorized batch transfer AND numpy-vectorized inside the batch
    (``_jaro_winkler_batch``) — the previous per-row Python loop was the
    last hot-path scalar UDF (scoring = 131s of 398s at the 873k-doc
    bench); runs only on pruned candidate pairs either way.
    """
    ss = [a if isinstance(a, str) else "" for a in left]
    ts = [b if isinstance(b, str) else "" for b in right]
    return pd.Series(_jaro_winkler_batch(ss, ts), dtype="float64")


def cosine_dense(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<float/double> columns — pure SQL
    (``zip_with`` dot product + ``aggregate`` norms), stays codegen'd."""
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v * v))
    return F.when((na == 0) | (nb == 0), F.lit(0.0)).otherwise(dot / (na * nb))
