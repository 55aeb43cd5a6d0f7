"""Unit tests for tokenizers — hand-computed parity cases from the reference
(RepresentationModel.java edge cases listed in FIXTURES.md F5)."""

from pyspark.sql import functions as F

from continuousfilteringbenchmark_spark.functions import tokenize as tk


def _one(spark, col, value):
    return spark.createDataFrame([(value,)], "s string").select(col.alias("r")).collect()[0]["r"]


def test_word_token_set(spark):
    assert _one(spark, tk.word_token_set("s"), "The  quick, quick FOX_dog!") == [
        "the",
        "quick",
        "fox",
        "dog",
    ]


def test_word_token_set_empty(spark):
    assert _one(spark, tk.word_token_set("s"), "  ...  ") == []


def test_word_token_multiset_occurrence_counters(spark):
    # reference: "aa aa b" -> {aa0, aa1, b0}  (RepresentationModel.java:104-115)
    assert _one(spark, tk.word_token_multiset("s"), "aa aa b") == ["aa0", "aa1", "b0"]


def test_word_token_multiset_empty(spark):
    assert _one(spark, tk.word_token_multiset("s"), "") == []


def test_char_ngram_set_basic(spark):
    assert _one(spark, tk.char_ngram_set("s", 2), "abab") == ["ab", "ba"]


def test_char_ngram_short_string_fallback(spark):
    # len < n keeps the whole string (RepresentationModel.java:26-29)
    assert _one(spark, tk.char_ngram_set("s", 5), "abc") == ["abc"]


def test_char_ngram_multiset(spark):
    # "abab" bigrams: ab, ba, ab -> ab0, ba0, ab1
    assert _one(spark, tk.char_ngram_multiset("s", 2), "abab") == ["ab0", "ba0", "ab1"]


def test_char_ngram_multiset_short(spark):
    assert _one(spark, tk.char_ngram_multiset("s", 5), "ab") == ["ab0"]


def test_token_qgrams(spark):
    r = _one(spark, tk.token_qgrams(tk.word_token_set("s"), 3), "abcd ef")
    assert sorted(r) == ["abc", "bcd", "ef"]


def test_token_suffixes(spark):
    r = _one(spark, tk.token_suffixes(tk.word_token_set("s"), 3), "abcde xy")
    assert sorted(r) == ["abcde", "bcde", "cde", "xy"]


def test_token_substrings(spark):
    r = _one(spark, tk.token_substrings(tk.word_token_set("s"), 3), "abcd")
    assert sorted(r) == ["abc", "abcd", "bcd"]


def test_normalize(spark):
    assert _one(spark, tk.normalize("s"), "  MiXeD Case ") == "mixed case"
