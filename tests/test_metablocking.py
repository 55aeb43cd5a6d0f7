"""Meta-blocking weights + pruners vs hand-computed values on toy blocks."""

import math

import pytest
from pyspark.sql import functions as F

from continuousfilteringbenchmark_spark.operators import metablocking as MB


def _blocks(spark, rows):
    return spark.createDataFrame(rows, "block_key string, side string, doc_id string")


@pytest.fixture(scope="module")
def toy(spark):
    # blocks: b1 = {A1, B1, B2}; b2 = {A1, B1}; b3 = {A2, B2}; b4 = {A1, A2, B1, B2}
    rows = [
        ("b1", "A", "A1"), ("b1", "B", "B1"), ("b1", "B", "B2"),
        ("b2", "A", "A1"), ("b2", "B", "B1"),
        ("b3", "A", "A2"), ("b3", "B", "B2"),
        ("b4", "A", "A1"), ("b4", "A", "A2"), ("b4", "B", "B1"), ("b4", "B", "B2"),
    ]
    df = _blocks(spark, rows)
    df.cache().count()
    return df


def _wmap(df):
    return {(r.left_id, r.right_id): r.weight for r in df.collect()}


def test_cbs(spark, toy):
    w = _wmap(MB.weighted_pairs(toy, "CBS"))
    # A1-B1 share b1,b2,b4 = 3; A1-B2 share b1,b4 = 2; A2-B2 share b3,b4 = 2; A2-B1 share b4 = 1
    assert w == {("A1", "B1"): 3.0, ("A1", "B2"): 2.0, ("A2", "B2"): 2.0, ("A2", "B1"): 1.0}


def test_js(spark, toy):
    w = _wmap(MB.weighted_pairs(toy, "JS"))
    # |B_A1|=3, |B_B1|=3 -> JS(A1,B1)=3/(3+3-3)=1.0 ; |B_A2|=2,|B_B2|=3 -> 2/(2+3-2)=2/3
    assert abs(w[("A1", "B1")] - 1.0) < 1e-12
    assert abs(w[("A2", "B2")] - 2 / 3) < 1e-12


def test_ecbs(spark, toy):
    w = _wmap(MB.weighted_pairs(toy, "ECBS"))
    # B=4 blocks; ECBS(A1,B1) = 3 * log10(4/3) * log10(4/3)
    want = 3 * math.log10(4 / 3) ** 2
    assert abs(w[("A1", "B1")] - want) < 1e-12


def test_arcs(spark, toy):
    w = _wmap(MB.weighted_pairs(toy, "ARCS"))
    # ||b1|| = 1*2 = 2, ||b2|| = 1, ||b4|| = 2*2 = 4 -> A1-B1: 1/2 + 1 + 1/4 = 1.75
    assert abs(w[("A1", "B1")] - 1.75) < 1e-12


def test_x2_nonnegative_and_orders_pairs(spark, toy):
    w = _wmap(MB.weighted_pairs(toy, "X2"))
    assert all(v >= 0 for v in w.values())
    assert w[("A1", "B1")] >= w[("A2", "B1")]


def test_wep_keeps_above_mean(spark, toy):
    weighted = MB.weighted_pairs(toy, "CBS")
    kept = _wmap(MB.wep(weighted))
    # mean of {3,2,2,1} = 2 -> keep weight >= 2
    assert set(kept) == {("A1", "B1"), ("A1", "B2"), ("A2", "B2")}


def test_cep_topk(spark, toy):
    weighted = MB.weighted_pairs(toy, "CBS")
    kept = _wmap(MB.cep(weighted, k=1))
    assert set(kept) == {("A1", "B1")}


def test_cnp_topk_per_node_union_vs_reciprocal(spark, toy):
    weighted = MB.weighted_pairs(toy, "CBS")
    union = set(_wmap(MB.cnp(weighted, k=1)))
    recip = set(_wmap(MB.cnp(weighted, k=1, reciprocal=True)))
    # k=1 per node: A1->B1(3), A2->B2(2), B1->A1(3), B2->A1(2)
    assert union == {("A1", "B1"), ("A2", "B2"), ("A1", "B2")}
    assert recip == {("A1", "B1")}
    assert recip <= union


def test_wnp_union_vs_reciprocal(spark, toy):
    weighted = MB.weighted_pairs(toy, "CBS")
    union = set(_wmap(MB.wnp(weighted)))
    recip = set(_wmap(MB.wnp(weighted, reciprocal=True)))
    assert recip <= union
    assert ("A1", "B1") in recip  # global best edge always survives


def test_blast_keeps_strong_edges(spark, toy):
    kept = set(_wmap(MB.blast(toy, ratio=0.35)))
    assert ("A1", "B1") in kept


def test_prune_dispatch(spark, toy):
    for alg in ["WEP", "CEP", "WNP", "CNP", "RWNP", "RCNP", "BLAST"]:
        out = MB.prune(toy, alg, scheme="CBS")
        assert out.columns == ["left_id", "right_id", "weight"]
        assert out.count() >= 1
