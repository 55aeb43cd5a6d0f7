"""Fellegi-Sunter linkage: agreement vectors, supervised m/u, likelihood
ratios, and driver-side EM on pattern counts."""

import math

import pytest
from pyspark.sql import functions as F

from continuousfilteringbenchmark_spark.operators import linkage as LK


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # (doc_id, lang, source, n_chars, tokens)
        (1, "en", "s1", 100, ["a", "b", "c"]),
        (2, "en", "s1", 110, ["a", "b", "c", "d"]),
        (3, "en", "s2", 300, ["x", "y"]),
        (4, "fr", "s2", 95, ["a", "b"]),
    ]
    return spark.createDataFrame(
        rows, "doc_id int, lang string, source string, n_chars int, tokens array<string>"
    )


FIELDS = {
    "lang": LK.exact_field("lang"),
    "source": LK.exact_field("source"),
    "len": LK.relative_diff_field("n_chars", 1, 5),  # within 20%
    "jac": LK.token_jaccard_field("tokens", 1, 2),  # jaccard >= 0.5
}
NAMES = list(FIELDS)


@pytest.fixture(scope="module")
def agreements(spark, docs):
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (3, 4)], "left_id int, right_id int"
    )
    return LK.agreement_vectors(pairs, docs, FIELDS)


def test_agreement_vectors(agreements):
    got = {
        (r["left_id"], r["right_id"]): (r["a_lang"], r["a_source"], r["a_len"], r["a_jac"])
        for r in agreements.collect()
    }
    # (1,2): same lang+source, |100-110|*5=50 <= 110, jac 3/4 >= 1/2
    assert got[(1, 2)] == (1, 1, 1, 1)
    # (1,3): lang agrees only; |100-300|*5 > 300; jac 0
    assert got[(1, 3)] == (1, 0, 0, 0)
    # (1,4): lang differs, source differs, |100-95|*5=25<=100 -> 1, jac 2/3 >= 1/2
    assert got[(1, 4)] == (0, 0, 1, 1)
    # (3,4): source agrees; |300-95|*5 > 300 -> 0; jac 0
    assert got[(3, 4)] == (0, 1, 0, 0)


def test_estimate_mu_and_lr(spark, agreements):
    labels = spark.createDataFrame(
        [(1, 2, 1), (1, 3, 0), (1, 4, 0), (3, 4, 0)],
        "left_id int, right_id int, is_match int",
    )
    w = LK.estimate_mu(agreements, labels, NAMES, smoothing=1)
    row = w.collect()[0]
    assert row["n_match"] == 1 and row["n_unmatch"] == 3
    # m_lang = (1+1)/(1+2); u_lang = (1+1)/(3+2)
    assert row["m_lang"] == pytest.approx(2 / 3)
    assert row["u_lang"] == pytest.approx(2 / 5)
    # u_len: agreements on len among non-matches = 1 -> (1+1)/5
    assert row["u_len"] == pytest.approx(2 / 5)

    lrs = {
        (r["left_id"], r["right_id"]): r["lr"]
        for r in LK.likelihood_ratios(agreements, w, NAMES).collect()
    }
    # hand-computed for (1,2): all agree -> prod m_f/u_f
    expect = (
        (row["m_lang"] / row["u_lang"])
        * (row["m_source"] / row["u_source"])
        * (row["m_len"] / row["u_len"])
        * (row["m_jac"] / row["u_jac"])
    )
    assert lrs[(1, 2)] == pytest.approx(expect)
    # the true match outscores every non-match
    assert lrs[(1, 2)] > max(v for k, v in lrs.items() if k != (1, 2))

    kept = LK.fs_classify(agreements, w, NAMES, min_lr=1.0)
    assert {(r["left_id"], r["right_id"]) for r in kept.collect()} == {(1, 2)}


def test_em_posterior_step_matches_hand_math(agreements):
    out = LK.em_posterior_step(agreements, NAMES, m=0.9, u=0.2, lam=0.5)
    rows = {tuple(r[f"a_{f}"] for f in NAMES): r for r in out.collect()}
    # pattern (1,1,1,1): p1 = .9^4, p0 = .2^4
    p1, p0 = 0.9**4, 0.2**4
    assert rows[(1, 1, 1, 1)]["posterior"] == pytest.approx(p1 / (p1 + p0))
    assert rows[(1, 1, 1, 1)]["n"] == 1
    # pattern (1,0,0,0): p1 = .9*.1^3, p0 = .2*.8^3
    p1, p0 = 0.9 * 0.1**3, 0.2 * 0.8**3
    assert rows[(1, 0, 0, 0)]["posterior"] == pytest.approx(p1 / (p1 + p0))


def _np_em_reference(pats, counts, K, iters, m0, u0, l0):
    """Independent plain-python EM for cross-checking em_weights."""
    m = [m0] * K
    u = [u0] * K
    lam = l0
    for _ in range(iters):
        w1s = 0.0
        w1a = [0.0] * K
        w0a = [0.0] * K
        tot = sum(counts)
        w0s = 0.0
        for p, n in zip(pats, counts):
            p1 = lam
            p0 = 1 - lam
            for k in range(K):
                p1 *= m[k] if p[k] else 1 - m[k]
                p0 *= u[k] if p[k] else 1 - u[k]
            post = p1 / (p1 + p0)
            w1s += n * post
            w0s += n * (1 - post)
            for k in range(K):
                if p[k]:
                    w1a[k] += n * post
                    w0a[k] += n * (1 - post)
        lam = w1s / tot
        m = [min(max(w1a[k] / w1s, 1e-6), 1 - 1e-6) for k in range(K)]
        u = [min(max(w0a[k] / w0s, 1e-6), 1 - 1e-6) for k in range(K)]
    return lam, m, u


def test_em_weights_recovers_separated_mixture(spark):
    # synthetic: 200 "match" pairs agree on both fields w.p. ~0.9; 1800
    # non-matches agree w.p. ~0.1 -- deterministic counts, no RNG
    rows = []
    pid = 0

    def emit(n, a1, a2):
        nonlocal pid
        for _ in range(n):
            rows.append((pid, pid + 1_000_000, a1, a2))
            pid += 1

    emit(160, 1, 1)
    emit(40, 1, 0)
    emit(1620, 0, 0)
    emit(180, 0, 1)
    agg = spark.createDataFrame(rows, "left_id long, right_id long, a_f1 int, a_f2 int")
    w = LK.em_weights(agg, ["f1", "f2"], iters=60, init_m=0.8, init_u=0.3, init_lambda=0.2)
    assert w["n_pairs"] == 2000
    # the two latent classes are separable: m >> u on f1
    assert w["m"]["f1"] > 0.6 and w["u"]["f1"] < 0.2
    assert 0.02 < w["lambda"] < 0.4
    # cross-check against an independent EM at the same fixed iteration count
    pats = [(1, 1), (1, 0), (0, 1), (0, 0)]
    counts = [160, 40, 180, 1620]
    lam_ref, m_ref, u_ref = _np_em_reference(
        pats, counts, 2, w["iters"], 0.8, 0.3, 0.2
    )
    assert w["lambda"] == pytest.approx(lam_ref, rel=1e-6)
    assert w["m"]["f1"] == pytest.approx(m_ref[0], rel=1e-6)
    assert w["u"]["f2"] == pytest.approx(u_ref[1], rel=1e-6)
    assert math.isfinite(w["loglik"])


def test_em_weights_partition_invariant(spark):
    rows = [(i, i + 10_000, i % 2, (i // 2) % 2) for i in range(64)]
    agg = spark.createDataFrame(rows, "left_id long, right_id long, a_f1 int, a_f2 int")
    w1 = LK.em_weights(agg.repartition(1), ["f1", "f2"], iters=10)
    w8 = LK.em_weights(agg.repartition(8), ["f1", "f2"], iters=10)
    assert w1 == w8


def test_null_fields_disagree(spark):
    # NULL lang/source/tokens must yield agreement 0 (not NULL): one
    # contract across estimate_mu, likelihood_ratios AND em_weights
    docs = spark.createDataFrame(
        [
            (1, None, "s1", 100, ["a"]),
            (2, None, None, None, None),
            (3, "en", "s1", 100, ["a"]),
        ],
        "doc_id int, lang string, source string, n_chars int, tokens array<string>",
    )
    pairs = spark.createDataFrame([(1, 2), (1, 3), (2, 3)], "left_id int, right_id int")
    ag = LK.agreement_vectors(pairs, docs, FIELDS)
    rows = {(r["left_id"], r["right_id"]): r for r in ag.collect()}
    # NULL vs NULL lang -> disagree; NULL source/chars/tokens -> disagree
    assert (rows[(1, 2)]["a_lang"], rows[(1, 2)]["a_source"]) == (0, 0)
    assert (rows[(1, 2)]["a_len"], rows[(1, 2)]["a_jac"]) == (0, 0)
    # NULL vs value -> disagree; non-null comparisons still work
    assert rows[(1, 3)]["a_lang"] == 0 and rows[(1, 3)]["a_source"] == 1
    assert rows[(1, 3)]["a_len"] == 1 and rows[(1, 3)]["a_jac"] == 1
    # em_weights no longer crashes on the formerly-NULL patterns
    w = LK.em_weights(ag, NAMES, iters=3)
    assert w["n_pairs"] == 3


def test_estimate_mu_inline_labels(spark, docs):
    # labels=None: is_match already on the agreement table (one-pass shape)
    pairs = spark.createDataFrame([(1, 2), (1, 3)], "left_id int, right_id int")
    ag = LK.agreement_vectors(
        pairs, docs, {**FIELDS, "match": LK.exact_field("lang")}
    ).withColumnRenamed("a_match", "is_match")
    w1 = LK.estimate_mu(ag, None, NAMES).collect()[0]
    labels = ag.select("left_id", "right_id", "is_match")
    w2 = LK.estimate_mu(ag.drop("is_match"), labels, NAMES).collect()[0]
    assert w1 == w2
    import pytest as _pt

    with _pt.raises(ValueError, match="is_match"):
        LK.estimate_mu(ag.drop("is_match"), None, NAMES)


GFIELDS = {
    "lang": LK.exact_field("lang"),
    "len": LK.gamma_reldiff_field("n_chars", [(1, 10), (3, 10)]),  # 10% / 30%
    "jac": LK.gamma_jaccard_field("tokens", [(1, 2), (1, 4)]),  # 1/2, 1/4
}
GLEVELS = {"lang": 2, "len": 3, "jac": 3}


def test_gamma_levels(spark, docs):
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4)], "left_id int, right_id int"
    )
    ag = LK.agreement_vectors(pairs, docs, GFIELDS)
    rows = {(r["left_id"], r["right_id"]): r for r in ag.collect()}
    # (1,2): |100-110|*10=100 <= 1*110 -> level 2; jac 3/4 >= 1/2 -> 2
    assert rows[(1, 2)]["a_len"] == 2 and rows[(1, 2)]["a_jac"] == 2
    # (1,3): |100-300| -> neither 10% nor 30% of 300 -> 0; jac 0 -> 0
    assert rows[(1, 3)]["a_len"] == 0 and rows[(1, 3)]["a_jac"] == 0
    # (1,4): |100-95|*10=50 <= 100 -> 2; jac 2/3: >=1/2 -> 2
    assert rows[(1, 4)]["a_len"] == 2 and rows[(1, 4)]["a_jac"] == 2


def test_gamma_mu_and_lr(spark, docs):
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (3, 4)], "left_id int, right_id int"
    )
    ag = LK.agreement_vectors(
        pairs, docs, {**GFIELDS, "match": LK.exact_field("lang")}
    ).withColumnRenamed("a_match", "is_match")
    w = LK.estimate_gamma_mu(ag, None, GLEVELS).collect()[0]
    # matches = pairs agreeing on lang: (1,2), (1,3) -> n_match=2
    assert w["n_match"] == 2 and w["n_unmatch"] == 2
    # m_jac_2 = (count(jac=2 & match)+1)/(2+3) = (1+1)/5
    assert w["m_jac_2"] == pytest.approx(2 / 5)
    # per-field level probabilities sum to 1 after smoothing
    for f, L in GLEVELS.items():
        assert sum(w[f"m_{f}_{lv}"] for lv in range(L)) == pytest.approx(1.0)
        assert sum(w[f"u_{f}_{lv}"] for lv in range(L)) == pytest.approx(1.0)

    wdf = LK.estimate_gamma_mu(ag, None, GLEVELS)
    lrs = {
        (r["left_id"], r["right_id"]): r["lr"]
        for r in LK.gamma_likelihood_ratios(ag, wdf, GLEVELS).collect()
    }
    r12 = {r2["left_id"]: r2 for r2 in ag.collect()}  # noqa: F841
    # hand-compute lr for (1,2): gamma = (lang=1, len=2, jac=2)
    expect = (
        (w["m_lang_1"] / w["u_lang_1"])
        * (w["m_len_2"] / w["u_len_2"])
        * (w["m_jac_2"] / w["u_jac_2"])
    )
    assert lrs[(1, 2)] == pytest.approx(expect)
