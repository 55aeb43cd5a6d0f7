"""P9/P10 shingling vectorizers (functions/vectorize.py): hand-computed
vocabulary + count parity with the reference's ShinglingModel semantics
(``nnmethods/minhashLSH/src/minhash/ShinglingModel.java:18-105``) and
determinism of the sorted-vocabulary ids under repartitioning."""

from pyspark.sql import functions as F

from continuousfilteringbenchmark_spark.functions import tokenize as tk
from continuousfilteringbenchmark_spark.functions import vectorize as V


def _toks(spark, rows, n=2):
    df = spark.createDataFrame(rows, "doc_id string, text string")
    return df.select("doc_id", tk.char_ngrams("text", n).alias("tokens"))


def test_vocabulary_sorted_dense_ids(spark):
    toks = _toks(spark, [("d1", "abab"), ("d2", "ba")])
    vocab = {r.tok: r.vocab_id for r in V.shingle_vocabulary(toks).collect()}
    # grams: d1 -> ab,ba,ab ; d2 -> ba ; sorted distinct = [ab, ba]
    assert vocab == {"ab": 0, "ba": 1}


def test_count_vectors_occurrences(spark):
    toks = _toks(spark, [("d1", "abab"), ("d2", "ba")])
    rows = {
        (r.doc_id, r.vocab_id): r.cnt for r in V.count_vectors(toks).collect()
    }
    # d1: ab x2, ba x1 ; d2: ba x1
    assert rows == {("d1", 0): 2, ("d1", 1): 1, ("d2", 1): 1}


def test_bool_vectors_presence_only(spark):
    toks = _toks(spark, [("d1", "abab"), ("d2", "ba")])
    rows = {(r.doc_id, r.vocab_id) for r in V.bool_vectors(toks).collect()}
    assert rows == {("d1", 0), ("d1", 1), ("d2", 1)}


def test_short_string_fallback_single_gram(spark):
    # len < n keeps the whole string as one gram (RepresentationModel.java:26-29)
    toks = _toks(spark, [("d1", "x")], n=4)
    rows = [(r.doc_id, r.vocab_id, r.cnt) for r in V.count_vectors(toks).collect()]
    assert rows == [("d1", 0, 1)]


def test_vocab_ids_deterministic_under_partitioning(spark, dirty):
    from continuousfilteringbenchmark_spark.datamodel import agg_text

    toks = dirty.docs.select(
        "doc_id", tk.char_ngrams(agg_text("spans"), 3).alias("tokens")
    )
    a = V.count_vectors(toks)
    b = V.count_vectors(toks.repartition(7, "doc_id"))
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
