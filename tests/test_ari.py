"""Adjusted Rand Index: integer components + scalar."""

import pytest

from continuousfilteringbenchmark_spark.eval import adjusted_rand, rand_contingency


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id int, cluster_id int")


def test_components_hand_computed(spark):
    # system: {1,2,3}, {4,5}; gold: {1,2}, {3,4}, {5}
    sysc = _df(spark, [(1, 1), (2, 1), (3, 1), (4, 4), (5, 4)])
    gold = _df(spark, [(1, 1), (2, 1), (3, 3), (4, 3), (5, 5)])
    r = rand_contingency(sysc, gold).collect()[0]
    assert r["n_docs"] == 5
    # cells: (1,1)x2 -> 1 pair; (1,3)x1, (4,3)x1, (4,5)x1 -> 0
    assert r["sum_pairs_cells"] == 1
    # sys: C(3,2)+C(2,2)=3+1=4; gold: 1+1+0=2
    assert r["sum_pairs_sys"] == 4 and r["sum_pairs_gold"] == 2
    ari = adjusted_rand(sysc, gold)
    # hand: n2=10, exp=4*2/10=0.8, mx=3, ari=(1-0.8)/(3-0.8)
    assert ari == pytest.approx((1 - 0.8) / (3 - 0.8))


def test_identical_partition_is_one(spark):
    c = _df(spark, [(i, i % 4) for i in range(24)])
    assert adjusted_rand(c, c) == pytest.approx(1.0)


def test_orthogonal_partition(spark):
    # 36 docs in a 6x6 grid: rows vs columns — every contingency cell is a
    # single doc, so index=0; exp = 90*90/630, max = 90 -> ARI = -1/6
    sysc = _df(spark, [(i, i // 6) for i in range(36)])
    gold = _df(spark, [(i, i % 6) for i in range(36)])
    assert adjusted_rand(sysc, gold) == pytest.approx(-1 / 6)


def test_singletons_vs_anything(spark):
    sysc = _df(spark, [(i, i) for i in range(10)])
    gold = _df(spark, [(i, 0) for i in range(10)])
    # singletons share no pairs with the one-cluster gold: ARI = 0
    assert adjusted_rand(sysc, gold) == pytest.approx(0.0)
