"""ε-join / top-k join vs brute-force python oracles, incl. tie semantics."""

import itertools

from pyspark.sql import functions as F

from continuousfilteringbenchmark_spark.functions import tokenize as tk
from continuousfilteringbenchmark_spark.operators.joins import epsilon_join, topk_join


def _with_tokens(spark, rows, gram=None):
    df = spark.createDataFrame(rows, "doc_id string, text string")
    col = tk.char_ngram_multiset("text", gram) if gram else tk.word_token_set("text")
    return df.withColumn("tokens", col)


def _brute_sims(rows, sim, gram=None):
    def toks(s):
        import re

        ws = [t for t in re.split(r"[\W_]+", s.lower().strip()) if t]
        if gram is None:
            return set(dict.fromkeys(ws))
        out = []
        s2 = s.lower().strip()
        grams = [s2[i : i + gram] for i in range(len(s2) - gram + 1)] or [s2]
        seen = {}
        for g in grams:
            seen[g] = seen.get(g, 0)
            out.append(f"{g}{seen[g]}")
            seen[g] += 1
        return set(out)

    sims = {}
    tok = {i: toks(t) for i, t in rows}
    for (i, _), (j, _) in itertools.combinations(rows, 2):
        a, b = tok[i], tok[j]
        c = len(a & b)
        if c == 0:
            continue
        if sim == "jaccard":
            s = c / (len(a) + len(b) - c)
        elif sim == "cosine":
            s = c / (len(a) * len(b)) ** 0.5
        else:
            s = 2 * c / (len(a) + len(b))
        sims[(min(i, j), max(i, j))] = s
    return sims


ROWS = [
    ("1", "efficient entity resolution methods"),
    ("2", "efficient entity resolution method"),
    ("3", "scalable entity matching"),
    ("4", "graph processing systems"),
    ("5", "efficient graph processing"),
    ("6", "entity resolution"),
]


def test_epsilon_self_join_matches_bruteforce(spark):
    df = _with_tokens(spark, ROWS)
    got = {
        (r.left_id, r.right_id): r.score
        for r in epsilon_join(df, None, threshold=0.4, sim="jaccard").collect()
    }
    want = {k: v for k, v in _brute_sims(ROWS, "jaccard").items() if v >= 0.4}
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-12


def test_epsilon_join_prefix_filter_identical_output(spark):
    df = _with_tokens(spark, ROWS)
    plain = {
        (r.left_id, r.right_id): r.score
        for r in epsilon_join(df, None, 0.4, "jaccard", prefix_filter=False).collect()
    }
    pref = {
        (r.left_id, r.right_id): r.score
        for r in epsilon_join(df, None, 0.4, "jaccard", prefix_filter=True).collect()
    }
    assert plain == pref


def test_epsilon_join_two_sided(spark):
    left = _with_tokens(spark, [("L1", "alpha beta gamma"), ("L2", "delta epsilon")])
    right = _with_tokens(spark, [("R1", "alpha beta zeta"), ("R2", "unrelated words")])
    got = {(r.left_id, r.right_id) for r in epsilon_join(left, right, 0.4).collect()}
    assert got == {("L1", "R1")}  # jaccard 2/4 = 0.5


def test_epsilon_join_ngram_multiset(spark):
    rows = [("1", "aabb"), ("2", "aab"), ("3", "zzzz")]
    df = _with_tokens(spark, rows, gram=2)
    got = {
        (r.left_id, r.right_id): r.score
        for r in epsilon_join(df, None, 0.3, "jaccard").collect()
    }
    want = {k: v for k, v in _brute_sims(rows, "jaccard", gram=2).items() if v >= 0.3}
    assert got.keys() == want.keys()


def test_topk_tie_inclusion(spark):
    # target T has candidates with sims: two tied at the k-th value -> both kept
    source = _with_tokens(
        spark,
        [
            ("S1", "a b c d"),   # vs T: common {a,b,c,d} -> high
            ("S2", "a b x y"),   # common {a,b} -> tie value
            ("S3", "a b p q"),   # common {a,b} -> same tie value
            ("S4", "a z1 z2 z3"),  # common {a} -> below
        ],
    )
    target = _with_tokens(spark, [("T", "a b c d")])
    got = topk_join(source, target, k=2, sim="cosine").toPandas()
    kept = set(got.left_id)
    # k=2: best is S1, 2nd-best value is shared by S2 and S3 -> ties included
    assert kept == {"S1", "S2", "S3"}


def test_topk_fewer_than_k(spark):
    source = _with_tokens(spark, [("S1", "a b")])
    target = _with_tokens(spark, [("T", "a c")])
    got = topk_join(source, target, k=5).toPandas()
    assert set(got.left_id) == {"S1"}


def test_topk_self_join_canonical_dedup(spark):
    df = _with_tokens(spark, ROWS)
    got = topk_join(df, None, k=2, sim="cosine").toPandas()
    assert (got.left_id < got.right_id).all()
    assert got.duplicated(subset=["left_id", "right_id"]).sum() == 0


def test_topk_join_directed_flips_roles_not_emission(spark):
    """reverse=True must swap which side gets the per-entity top-k window
    (TopKSchemaAgnosticJoin.java:49-56) while keeping (d1, d2) emission
    order (:164-170): with k=1, forward keeps one pair per d2 entity,
    reversed one pair per d1 entity — both emit left ids from d1."""
    from continuousfilteringbenchmark_spark.operators.joins import topk_join_directed

    d1 = spark.createDataFrame(
        [("a1", ["x", "y"]), ("a2", ["x", "z"])], "doc_id string, tokens array<string>"
    )
    d2 = spark.createDataFrame(
        [("b1", ["x"]), ("b2", ["y", "z"]), ("b3", ["q"])],
        "doc_id string, tokens array<string>",
    )
    fwd = topk_join_directed(d1, d2, 1, "jaccard", reverse=False).collect()
    rev = topk_join_directed(d1, d2, 1, "jaccard", reverse=True).collect()
    assert all(r.left_id.startswith("a") and r.right_id.startswith("b") for r in fwd + rev)
    # forward: per-d2 top-1 -> one winner per d2 entity with any overlap
    assert sorted({r.right_id for r in fwd}) == ["b1", "b2"]
    # reversed: per-d1 top-1 -> one winner per d1 entity
    assert sorted({r.left_id for r in rev}) == ["a1", "a2"]
