"""Fellegi-Sunter probabilistic record linkage over candidate pairs.

The reference benchmark stops at set-similarity scoring of candidate pairs
(``joins/src/joins/SchemaAgnosticEJoin.java:98-115`` computes one Jaccard /
cosine number per pair); a production linkage pipeline needs a *decision
model* that combines heterogeneous field comparisons (language, source,
length, token overlap, ...) into a single match likelihood. This module
implements the classic Fellegi-Sunter model (Fellegi & Sunter, JASA 1969;
the public Splink/fastLink engines implement the same mathematics):

* ``agreement_vectors`` - per candidate pair, a vector of 0/1 field
  agreements (all comparisons in integer arithmetic - no float drift);
* ``estimate_mu`` - supervised m/u probability estimation from labeled
  pairs (m_f = P(agree on f | match), u_f = P(agree on f | non-match)),
  with add-one smoothing so no likelihood ratio is 0 or infinite;
* ``likelihood_ratios`` - per-pair Fellegi-Sunter likelihood ratio
  prod_f (a_f ? m_f/u_f : (1-m_f)/(1-u_f)) in a FIXED field order
  (bit-reproducible across engines and partitionings);
* ``em_weights`` - unsupervised Expectation-Maximization over agreement-
  PATTERN counts: the E/M loop runs on the driver over at most 2^K pattern
  rows (K = number of fields), so its cost is independent of corpus size -
  the only distributed work is one groupBy over the pairs;
* ``em_posterior_step`` - one distributed E-step (per-pattern posterior)
  from explicit initial weights, used by the exact DuckDB oracle.

Scale shape (100 TB): agreement vectors are two hash joins of the pair
table against the doc table on its id (the same co-partitionable shape as
``plans/pipeline.score_pairs``); ``estimate_mu`` is a single global
aggregate with map-side partial combine (one row out); scoring broadcasts
the ONE-ROW weight table; EM collects <= 2^K pattern counts - for K = 10
fields that is 1024 rows regardless of whether the corpus has 10^4 or
10^12 documents.
"""

from __future__ import annotations

from functools import reduce
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ColFactory = Callable[[str], "F.Column"]
FieldFn = Callable[[ColFactory, ColFactory], "F.Column"]


# --------------------------------------------------------------- field DSL


def _nulls_disagree(cond) -> "F.Column":
    """NULL-safe 0/1: any comparison involving a NULL field value counts as
    DISAGREE (0). Without this, a NULL lang/source would propagate a NULL
    agreement — silently dropped by ``estimate_mu``'s sums, treated as
    disagree by ``likelihood_ratios``'s ``when``, and a TypeError in
    ``em_weights``'s pattern collect: three different behaviors for one
    input. Missing-as-disagree is the documented single contract."""
    return F.coalesce(cond.cast("int"), F.lit(0))


def exact_field(col: str) -> FieldFn:
    """1 iff the two sides agree exactly on ``col`` (nulls disagree)."""
    return lambda L, R: _nulls_disagree(L(col) == R(col))


def normalized_text_field(col: str) -> FieldFn:
    """1 iff lower(trim(col)) agrees - the exact-duplicate label field."""
    return lambda L, R: _nulls_disagree(
        F.lower(F.trim(L(col))) == F.lower(F.trim(R(col)))
    )


def relative_diff_field(col: str, tol_num: int, tol_den: int) -> FieldFn:
    """1 iff |l - r| <= (tol_num/tol_den) * greatest(l, r), evaluated in
    INTEGER cross-multiplied form (``|l-r| * tol_den <= tol_num * greatest``)
    so Spark and any SQL oracle agree bit-for-bit. Nulls disagree."""
    return lambda L, R: _nulls_disagree(
        F.abs(L(col) - R(col)) * F.lit(tol_den)
        <= F.lit(tol_num) * F.greatest(L(col), R(col))
    )


def token_jaccard_field(col: str, thr_num: int, thr_den: int) -> FieldFn:
    """1 iff Jaccard(l.col, r.col) >= thr_num/thr_den over SET-semantics
    token arrays, in cross-multiplied integer form:
    ``c * thr_den >= thr_num * (|A| + |B| - c)`` with c = |A intersect B|.
    Null arrays disagree."""

    def fn(L: ColFactory, R: ColFactory):
        c = F.size(F.array_intersect(L(col), R(col)))
        union = F.size(L(col)) + F.size(R(col)) - c
        return _nulls_disagree(c * F.lit(thr_den) >= F.lit(thr_num) * union)

    return fn


# --------------------------------------------------------------- operators


def agreement_vectors(
    pairs: DataFrame,
    docs: DataFrame,
    fields: dict[str, FieldFn],
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-pair agreement vector: (left_id, right_id, a_<field>...).

    Two equi-joins of the pair table against the doc table (left side then
    right side); every agreement expression is JVM codegen - no Python.
    """
    other = [c for c in docs.columns if c != id_col]
    lside = docs.select(
        F.col(id_col).alias("left_id"), *[F.col(c).alias(f"_l_{c}") for c in other]
    )
    rside = docs.select(
        F.col(id_col).alias("right_id"), *[F.col(c).alias(f"_r_{c}") for c in other]
    )
    L: ColFactory = lambda c: F.col(f"_l_{c}")  # noqa: E731
    R: ColFactory = lambda c: F.col(f"_r_{c}")  # noqa: E731
    j = pairs.select("left_id", "right_id").join(lside, "left_id").join(rside, "right_id")
    return j.select(
        "left_id",
        "right_id",
        *[fn(L, R).alias(f"a_{name}") for name, fn in fields.items()],
    )


def estimate_mu(
    agreements: DataFrame,
    labels: DataFrame | None,
    field_names: list[str],
    smoothing: int = 1,
) -> DataFrame:
    """Supervised m/u estimation from a labeled pair table.

    ``labels``: (left_id, right_id, is_match int 0/1) — or ``None`` when
    ``agreements`` already carries an ``is_match`` column (the one-pass
    shape: compute the label as one more agreement field and skip the
    pair-on-pair join entirely). Returns ONE row:
    (n_match, n_unmatch, m_<f>, u_<f>, ...) where

        m_f = (sum(a_f over matches)     + s) / (n_match   + 2 s)
        u_f = (sum(a_f over non-matches) + s) / (n_unmatch + 2 s)

    (add-``s`` smoothing keeps every ratio in (0, 1) so likelihood ratios
    stay finite). Single global aggregate - map-side partial combine, one
    row on the driver regardless of pair count.
    """
    if labels is None:
        if "is_match" not in agreements.columns:
            raise ValueError(
                "estimate_mu: labels=None requires an is_match column on agreements"
            )
        j = agreements
    else:
        j = agreements.join(
            labels.select("left_id", "right_id", "is_match"), ["left_id", "right_id"]
        )
    s = int(smoothing)
    aggs = [
        F.sum("is_match").alias("n_match"),
        F.sum(1 - F.col("is_match")).alias("n_unmatch"),
    ]
    for f in field_names:
        aggs.append(F.sum(F.col(f"a_{f}") * F.col("is_match")).alias(f"_am_{f}"))
        aggs.append(F.sum(F.col(f"a_{f}") * (1 - F.col("is_match"))).alias(f"_au_{f}"))
    row = j.agg(*aggs)
    out = [F.col("n_match"), F.col("n_unmatch")]
    for f in field_names:
        out.append(
            (
                (F.col(f"_am_{f}") + F.lit(s)).cast("double")
                / (F.col("n_match") + F.lit(2 * s)).cast("double")
            ).alias(f"m_{f}")
        )
        out.append(
            (
                (F.col(f"_au_{f}") + F.lit(s)).cast("double")
                / (F.col("n_unmatch") + F.lit(2 * s)).cast("double")
            ).alias(f"u_{f}")
        )
    return row.select(*out)


def likelihood_ratios(
    agreements: DataFrame, weights: DataFrame, field_names: list[str]
) -> DataFrame:
    """Per-pair Fellegi-Sunter likelihood ratio.

    ``weights`` is the ONE-ROW m/u table from ``estimate_mu`` (broadcast -
    a cross join against a single row is a free map-side operation). The
    product runs in the FIXED order of ``field_names`` (left-associated),
    so the result is bit-identical across partitionings and across engines
    evaluating the same expression - no log-space math (log2 is the
    traditional presentation but libm rounding differs across runtimes;
    the ratio carries the same information exactly).
    """
    j = agreements.crossJoin(F.broadcast(weights))
    terms = [
        F.when(
            F.col(f"a_{f}") == 1, F.col(f"m_{f}") / F.col(f"u_{f}")
        ).otherwise((F.lit(1.0) - F.col(f"m_{f}")) / (F.lit(1.0) - F.col(f"u_{f}")))
        for f in field_names
    ]
    lr = reduce(lambda a, b: a * b, terms)
    return j.select(
        "left_id", "right_id", *[f"a_{f}" for f in field_names], lr.alias("lr")
    )


def fs_classify(
    agreements: DataFrame,
    weights: DataFrame,
    field_names: list[str],
    min_lr: float = 1.0,
) -> DataFrame:
    """Decision rule: keep pairs whose likelihood ratio clears ``min_lr``."""
    return (
        likelihood_ratios(agreements, weights, field_names)
        .where(F.col("lr") >= F.lit(float(min_lr)))
        .select("left_id", "right_id", "lr")
    )


# ------------------------------------------------- multi-level gamma model


def gamma_jaccard_field(col: str, thresholds: list[tuple[int, int]]) -> FieldFn:
    """Graded token-overlap agreement (Splink-style gamma levels): returns
    level len(thresholds) .. 0 — the NUMBER of thresholds the pair's
    Jaccard clears, i.e. len(thresholds) - i for the strictest satisfied
    thresholds[i] = (num, den) (clearing a stricter threshold implies every
    looser one), 0 if none. ``thresholds`` ordered strictest first.
    Integer cross-multiplied."""

    def fn(L: ColFactory, R: ColFactory):
        c = F.size(F.array_intersect(L(col), R(col)))
        union = F.size(L(col)) + F.size(R(col)) - c
        expr = F.lit(0)
        # build from loosest to strictest so the strictest WHEN wins
        for i, (num, den) in reversed(list(enumerate(thresholds))):
            level = len(thresholds) - i
            expr = F.when(c * F.lit(den) >= F.lit(num) * union, F.lit(level)).otherwise(
                expr
            )
        return F.coalesce(expr.cast("int"), F.lit(0))

    return fn


def gamma_reldiff_field(col: str, tolerances: list[tuple[int, int]]) -> FieldFn:
    """Graded numeric closeness: level len(tolerances) .. 0 — the NUMBER of
    tolerances satisfied, i.e. len(tolerances) - i for the tightest
    satisfied tolerances[i] = (num, den) (|l-r|*den <= num*greatest;
    meeting a tighter tolerance implies every looser one), 0 if none.
    ``tolerances`` ordered tightest first. Integer cross-multiplied."""

    def fn(L: ColFactory, R: ColFactory):
        diff = F.abs(L(col) - R(col))
        hi = F.greatest(L(col), R(col))
        expr = F.lit(0)
        for i, (num, den) in reversed(list(enumerate(tolerances))):
            level = len(tolerances) - i
            expr = F.when(diff * F.lit(den) <= F.lit(num) * hi, F.lit(level)).otherwise(
                expr
            )
        return F.coalesce(expr.cast("int"), F.lit(0))

    return fn


def estimate_gamma_mu(
    agreements: DataFrame,
    labels: DataFrame | None,
    field_levels: dict[str, int],
    smoothing: int = 1,
) -> DataFrame:
    """Per-LEVEL m/u estimation for graded gamma fields (the full
    Fellegi-Sunter model; binary fields are the L=2 special case):

        m_{f,l} = (count(gamma_f = l over matches) + s) / (n_match + L_f s)

    (per-level add-``s`` smoothing — the level probabilities of each field
    still sum to 1). ONE row out: columns ``m_<f>_<l>`` / ``u_<f>_<l>``
    plus n_match / n_unmatch; single global aggregate as in
    ``estimate_mu``."""
    if labels is None:
        if "is_match" not in agreements.columns:
            raise ValueError(
                "estimate_gamma_mu: labels=None requires is_match on agreements"
            )
        j = agreements
    else:
        j = agreements.join(
            labels.select("left_id", "right_id", "is_match"), ["left_id", "right_id"]
        )
    s = int(smoothing)
    aggs = [
        F.sum("is_match").alias("n_match"),
        F.sum(1 - F.col("is_match")).alias("n_unmatch"),
    ]
    for f, L in field_levels.items():
        for lv in range(L):
            hit = (F.col(f"a_{f}") == lv).cast("int")
            aggs.append(F.sum(hit * F.col("is_match")).alias(f"_am_{f}_{lv}"))
            aggs.append(F.sum(hit * (1 - F.col("is_match"))).alias(f"_au_{f}_{lv}"))
    row = j.agg(*aggs)
    out = [F.col("n_match"), F.col("n_unmatch")]
    for f, L in field_levels.items():
        for lv in range(L):
            out.append(
                (
                    (F.col(f"_am_{f}_{lv}") + F.lit(s)).cast("double")
                    / (F.col("n_match") + F.lit(L * s)).cast("double")
                ).alias(f"m_{f}_{lv}")
            )
            out.append(
                (
                    (F.col(f"_au_{f}_{lv}") + F.lit(s)).cast("double")
                    / (F.col("n_unmatch") + F.lit(L * s)).cast("double")
                ).alias(f"u_{f}_{lv}")
            )
    return row.select(*out)


def gamma_likelihood_ratios(
    agreements: DataFrame, weights: DataFrame, field_levels: dict[str, int]
) -> DataFrame:
    """Per-pair likelihood ratio under the graded model: fixed field order,
    each term a CASE over the field's levels selecting m_{f,l}/u_{f,l}.
    Same broadcast-one-row / fixed-order-product contract as the binary
    ``likelihood_ratios``."""
    j = agreements.crossJoin(F.broadcast(weights))
    terms = []
    for f, L in field_levels.items():
        t = F.lit(None).cast("double")
        for lv in range(L):
            t = F.when(
                F.col(f"a_{f}") == lv, F.col(f"m_{f}_{lv}") / F.col(f"u_{f}_{lv}")
            ).otherwise(t)
        terms.append(t)
    lr = reduce(lambda a, b: a * b, terms)
    return j.select(
        "left_id", "right_id", *[f"a_{f}" for f in field_levels], lr.alias("lr")
    )


# --------------------------------------------------------------- EM


def _pattern_products(field_names, m, u, lam):
    """Fixed-order per-pattern E-step expressions from explicit weights."""
    p1 = reduce(
        lambda a, b: a * b,
        [
            F.when(F.col(f"a_{f}") == 1, F.lit(float(m[f]))).otherwise(
                F.lit(1.0 - float(m[f]))
            )
            for f in field_names
        ],
    )
    p0 = reduce(
        lambda a, b: a * b,
        [
            F.when(F.col(f"a_{f}") == 1, F.lit(float(u[f]))).otherwise(
                F.lit(1.0 - float(u[f]))
            )
            for f in field_names
        ],
    )
    num = F.lit(float(lam)) * p1
    return num / (num + F.lit(1.0 - float(lam)) * p0)


def em_posterior_step(
    agreements: DataFrame,
    field_names: list[str],
    m: dict[str, float] | float = 0.85,
    u: dict[str, float] | float = 0.15,
    lam: float = 0.5,
) -> DataFrame:
    """One distributed E-step: per agreement PATTERN, the pair count and the
    posterior match probability under explicit (m, u, lambda).

    Output: (a_<f>..., n, posterior) - at most 2^K rows. The posterior is a
    fixed-order product/ratio of double literals, so an independent SQL
    engine evaluating the same expression reproduces it bit-for-bit.
    """
    if not isinstance(m, dict):
        m = {f: float(m) for f in field_names}
    if not isinstance(u, dict):
        u = {f: float(u) for f in field_names}
    acols = [f"a_{f}" for f in field_names]
    pat = agreements.groupBy(*acols).agg(F.count(F.lit(1)).alias("n"))
    return pat.select(
        *acols, "n", _pattern_products(field_names, m, u, lam).alias("posterior")
    )


def em_weights(
    agreements: DataFrame,
    field_names: list[str],
    iters: int = 30,
    init_m: float = 0.85,
    init_u: float = 0.2,
    init_lambda: float = 0.1,
    tol: float = 1e-9,
    clip: float = 1e-6,
) -> dict:
    """Unsupervised EM for (lambda, m_f, u_f) on agreement-pattern counts.

    The ONLY distributed work is one groupBy over the agreement table; the
    EM loop itself runs on the driver over <= 2^K pattern-count rows (K =
    len(field_names)), in sorted-pattern order - deterministic, independent
    of partitioning and of corpus size. Estimates are clipped to
    [clip, 1-clip] so degenerate fields cannot produce 0/1 probabilities.

    Returns {"lambda": float, "m": {f: float}, "u": {f: float},
    "iters": int, "loglik": float, "n_pairs": int}.
    """
    import numpy as np

    acols = [f"a_{f}" for f in field_names]
    rows = agreements.groupBy(*acols).agg(F.count(F.lit(1)).alias("n")).collect()
    # sorted pattern order -> the float reductions below are order-pinned
    pats = sorted((tuple(int(r[c]) for c in acols), int(r["n"])) for r in rows)
    if not pats:
        raise ValueError("em_weights: empty agreement table")
    A = np.array([p for p, _ in pats], dtype=np.float64)  # (P, K)
    n = np.array([c for _, c in pats], dtype=np.float64)  # (P,)
    total = n.sum()
    K = len(field_names)
    m = np.full(K, float(init_m))
    u = np.full(K, float(init_u))
    lam = float(init_lambda)
    prev_ll = -np.inf
    it = 0
    for it in range(1, int(iters) + 1):
        # E-step: posterior per pattern (log-space for stability; the loop
        # is driver-side numpy so cross-engine bit-parity is not a contract
        # here - em_posterior_step is the oracle-checked surface)
        lp1 = (A * np.log(m) + (1 - A) * np.log1p(-m)).sum(axis=1) + np.log(lam)
        lp0 = (A * np.log(u) + (1 - A) * np.log1p(-u)).sum(axis=1) + np.log1p(-lam)
        hi = np.maximum(lp1, lp0)
        ll = float((n * (hi + np.log(np.exp(lp1 - hi) + np.exp(lp0 - hi)))).sum())
        post = 1.0 / (1.0 + np.exp(lp0 - lp1))
        # M-step on pattern counts
        w1 = n * post
        w0 = n - w1
        s1, s0 = w1.sum(), w0.sum()
        lam = min(max(s1 / total, clip), 1.0 - clip)
        m = np.clip((A * w1[:, None]).sum(axis=0) / max(s1, clip), clip, 1 - clip)
        u = np.clip((A * w0[:, None]).sum(axis=0) / max(s0, clip), clip, 1 - clip)
        if abs(ll - prev_ll) <= tol * max(1.0, abs(prev_ll)):
            prev_ll = ll
            break
        prev_ll = ll
    return {
        "lambda": float(lam),
        "m": {f: float(m[i]) for i, f in enumerate(field_names)},
        "u": {f: float(u[i]) for i, f in enumerate(field_names)},
        "iters": it,
        "loglik": float(prev_ll),
        "n_pairs": int(total),
    }
