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


@F.pandas_udf(T.DoubleType())
def jaro_winkler(left: pd.Series, right: pd.Series) -> pd.Series:
    """Batched Jaro-Winkler similarity (standard Winkler p=0.1, prefix<=4).

    Arrow-vectorized batch transfer; runs only on pruned candidate pairs.
    """
    return pd.Series(
        [
            _jaro_winkler(a if a is not None else "", b if b is not None else "")
            for a, b in zip(left, right)
        ],
        dtype="float64",
    )


def cosine_dense(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<float/double> columns — pure SQL
    (``zip_with`` dot product + ``aggregate`` norms), stays codegen'd."""
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v * v))
    return F.when((na == 0) | (nb == 0), F.lit(0.0)).otherwise(dot / (na * nb))
