"""Golden-record survivorship and B-cubed clustering metrics."""

import pytest
from pyspark.sql import functions as F

from continuousfilteringbenchmark_spark.eval import bcubed, bcubed_contingency
from continuousfilteringbenchmark_spark.operators.survivorship import golden_records


@pytest.fixture(scope="module")
def toy(spark):
    docs = spark.createDataFrame(
        [
            (1, "Alpha Beta Gamma", "en", "s1", 16),
            (2, "alpha beta", "en", "s2", 10),
            (3, "alpha beta gamma ", "fr", "s2", 17),  # longest after trim: 16 -> tie with 1
            (10, "solo doc", "de", "s9", 8),
        ],
        "doc_id int, text string, lang string, source string, n_chars int",
    )
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (10, 10)], "doc_id int, cluster_id int"
    )
    return docs, clusters


def test_golden_records_rules(toy):
    docs, clusters = toy
    got = {r["cluster_id"]: r for r in golden_records(docs, clusters).collect()}
    g = got[1]
    # normalized texts: "alpha beta gamma" (len 16, ids 1 and 3 tie) -> rep 1
    assert g["rep_id"] == 1 and g["rep_text"] == "alpha beta gamma"
    # lang mode: en x2 beats fr; source mode: s2 x2 beats s1
    assert g["canon_lang"] == "en" and g["canon_source"] == "s2"
    assert g["n_members"] == 3 and g["sum_chars"] == 43 and g["min_doc_id"] == 1
    s = got[10]
    assert s["rep_id"] == 10 and s["n_members"] == 1 and s["canon_lang"] == "de"


def test_golden_records_partition_invariant(toy):
    docs, clusters = toy
    a = sorted(map(tuple, golden_records(docs.repartition(1), clusters).collect()))
    b = sorted(map(tuple, golden_records(docs.repartition(7), clusters.repartition(3)).collect()))
    assert a == b


def test_bcubed_hand_computed(spark):
    # system: {1,2,3}, {4,5}; gold: {1,2}, {3,4}, {5}
    sysc = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4), (5, 4)], "doc_id int, cluster_id int"
    )
    gold = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 3), (4, 3), (5, 5)], "doc_id int, cluster_id int"
    )
    per = {r["doc_id"]: r for r in bcubed_contingency(sysc, gold).collect()}
    assert (per[1]["c_size"], per[1]["g_size"], per[1]["overlap"]) == (3, 2, 2)
    assert (per[3]["c_size"], per[3]["g_size"], per[3]["overlap"]) == (3, 2, 1)
    assert (per[5]["c_size"], per[5]["g_size"], per[5]["overlap"]) == (2, 1, 1)
    m = bcubed(sysc, gold)
    # precision = mean(2/3, 2/3, 1/3, 1/2, 1/2) = 16/30 + ... compute:
    assert m.precision == pytest.approx((2 / 3 + 2 / 3 + 1 / 3 + 1 / 2 + 1 / 2) / 5)
    assert m.recall == pytest.approx((2 / 2 + 2 / 2 + 1 / 2 + 1 / 2 + 1 / 1) / 5)
    assert 0 < m.f1 < 1 and m.n_docs == 5


def test_bcubed_perfect_clustering(spark):
    c = spark.createDataFrame(
        [(i, i % 7) for i in range(50)], "doc_id int, cluster_id int"
    )
    m = bcubed(c, c)
    assert m.precision == pytest.approx(1.0) and m.recall == pytest.approx(1.0)
    assert m.f1 == pytest.approx(1.0)
