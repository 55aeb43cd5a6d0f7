"""Rarity-weighted epsilon join: integer idf-flavored weighting."""

import pytest

from continuousfilteringbenchmark_spark.operators.joins import (
    epsilon_join,
    weighted_epsilon_join,
)


def _toks(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, tokens array<string>")


def test_hand_computed_weights(spark):
    # N=3 docs; df: a=3 -> w=1, b=2 -> w=1, c=1 -> w=3, d=1 -> w=3
    df = _toks(
        spark,
        [("1", ["a", "b", "c"]), ("2", ["a", "b", "d"]), ("3", ["a"])],
    )
    got = {
        (r["left_id"], r["right_id"]): r["score"]
        for r in weighted_epsilon_join(df, None, threshold=0.0).collect()
    }
    # W(1)=1+1+3=5, W(2)=5, W(3)=1
    # (1,2): common {a,b} -> 2; score 2/(5+5-2)=0.25
    assert got[("1", "2")] == pytest.approx(2 / 8)
    # (1,3): common {a} -> 1; score 1/(5+1-1)=0.2
    assert got[("1", "3")] == pytest.approx(0.2)
    assert got[("2", "3")] == pytest.approx(0.2)


def test_uniform_df_equals_unweighted(spark):
    # every token appears in exactly 2 docs -> w constant -> weighted
    # Jaccard == plain Jaccard
    df = _toks(
        spark,
        [
            ("1", ["a", "b"]),
            ("2", ["a", "c"]),
            ("3", ["b", "c", "d"]),
            ("4", ["d"]),
        ],
    )
    w = {
        (r["left_id"], r["right_id"]): r["score"]
        for r in weighted_epsilon_join(df, None, threshold=0.0).collect()
    }
    u = {
        (r["left_id"], r["right_id"]): r["score"]
        for r in epsilon_join(df, None, 0.0, "jaccard").collect()
    }
    assert set(w) == set(u)
    for k in u:
        assert w[k] == pytest.approx(u[k])


def test_rare_token_dominates(spark):
    # docs 1,2 share a rare token among common noise; docs 1,3 share only
    # noise: weighted score must rank (1,2) far above (1,3)
    noise = [f"n{i}" for i in range(5)]
    rows = [
        ("1", noise + ["rare"]),
        ("2", noise + ["rare"]),
        ("3", noise + ["other"]),
        *[(f"x{j}", noise) for j in range(10)],
    ]
    df = _toks(spark, rows)
    got = {
        (r["left_id"], r["right_id"]): r["score"]
        for r in weighted_epsilon_join(df, None, threshold=0.0).collect()
    }
    assert got[("1", "2")] > got[("1", "3")] + 0.3


def test_two_sided_and_threshold(spark):
    left = _toks(spark, [("a1", ["x", "y"]), ("a2", ["z"])])
    right = _toks(spark, [("b1", ["x", "y"]), ("b2", ["q"])])
    out = weighted_epsilon_join(left, right, threshold=0.99)
    rows = out.collect()
    assert {(r["left_id"], r["right_id"]) for r in rows} == {("a1", "b1")}
    assert rows[0]["score"] == pytest.approx(1.0)


def test_partition_invariant(spark):
    rows = [(str(i), [f"t{(i * j) % 7}" for j in range(1, 5)]) for i in range(12)]
    df = _toks(spark, rows)
    a = sorted(map(tuple, weighted_epsilon_join(df.repartition(1), None, 0.2).collect()))
    b = sorted(map(tuple, weighted_epsilon_join(df.repartition(8), None, 0.2).collect()))
    assert a == b and len(a) > 0
