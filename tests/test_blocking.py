"""Blocking operators vs brute-force pandas oracles (SURVEY.md §5.2 #2)."""

import pandas as pd
from pyspark.sql import functions as F

from continuousfilteringbenchmark_spark.operators import blocking as B


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, side string, text string")


def test_standard_blocking_cocitation(spark):
    docs = _docs(
        spark,
        [
            ("A:1", "A", "efficient entity resolution"),
            ("B:1", "B", "efficient ENTITY matching"),
            ("B:2", "B", "graph databases"),
        ],
    )
    bt = B.standard_blocking(docs).toPandas()
    keys = set(bt.block_key)
    assert keys == {"efficient", "entity", "resolution", "matching", "graph", "databases"}
    ent_blocks = bt[bt.block_key == "entity"]
    assert set(ent_blocks.doc_id) == {"A:1", "B:1"}


def test_pairs_from_blocks_clean_clean_dedup(spark):
    docs = _docs(
        spark,
        [
            ("A:1", "A", "x y z"),
            ("B:1", "B", "x y w"),
            ("B:2", "B", "z q"),
        ],
    )
    bt = B.standard_blocking(docs)
    pairs = B.pairs_from_blocks(bt, clean_clean=True).toPandas()
    got = set(map(tuple, pairs[["left_id", "right_id"]].values))
    # A:1-B:1 share x,y (deduped to one pair); A:1-B:2 share z
    assert got == {("A:1", "B:1"), ("A:1", "B:2")}


def test_pairs_from_blocks_dirty(spark):
    docs = _docs(
        spark,
        [("D:1", "A", "x y"), ("D:2", "A", "x z"), ("D:3", "A", "y z")],
    )
    bt = B.standard_blocking(docs)
    pairs = B.pairs_from_blocks(bt, clean_clean=False).toPandas()
    got = set(map(tuple, pairs[["left_id", "right_id"]].values))
    assert got == {("D:1", "D:2"), ("D:1", "D:3"), ("D:2", "D:3")}


def test_block_purging_drops_megablock(spark):
    # stop-word 'the' co-blocks everything; purging must remove it while
    # keeping the discriminative blocks
    rows = []
    for i in range(12):
        rows.append((f"A:{i}", "A", f"the unique{i} shared{i % 2}"))
        rows.append((f"B:{i}", "B", f"the unique{i} shared{i % 2}"))
    docs = _docs(spark, rows)
    bt = B.standard_blocking(docs)
    purged = B.block_purging(bt, clean_clean=True)
    keys = {r.block_key for r in purged.select("block_key").distinct().collect()}
    assert "the" not in keys
    assert "unique3" in keys


def test_block_purging_explicit_cutoff(spark):
    docs = _docs(
        spark,
        [
            ("A:1", "A", "a b"),
            ("A:2", "A", "a"),
            ("B:1", "B", "a b"),
            ("B:2", "B", "a"),
        ],
    )
    bt = B.standard_blocking(docs)
    # block 'a': 2x2=4 comparisons; block 'b': 1x1=1
    purged = B.block_purging(bt, clean_clean=True, max_comparisons=1)
    keys = {r.block_key for r in purged.select("block_key").distinct().collect()}
    assert keys == {"b"}


def test_block_filtering_keeps_smallest_half(spark):
    # doc A:1 sits in 4 blocks of different sizes; ratio 0.5 -> 2 smallest kept
    rows = [
        ("A:1", "A", "k1 k2 k3 k4"),
        ("B:1", "B", "k1"),
        ("B:2", "B", "k2 k1"),
        ("B:3", "B", "k3 k2 k1"),
        ("B:4", "B", "k4 k3 k2 k1"),
    ]
    docs = _docs(spark, rows)
    bt = B.standard_blocking(docs)
    filtered = B.block_filtering(bt, ratio=0.5, clean_clean=True)
    a1 = filtered.where(F.col("doc_id") == "A:1").toPandas()
    # block sizes: k4 -> 1 B-doc, k3 -> 2, k2 -> 3, k1 -> 4 (comparisons 1,2,3,4)
    assert set(a1.block_key) == {"k4", "k3"}


def test_suffix_blocking_frequency_cap(spark):
    rows = [(f"A:{i}", "A", "commonword") for i in range(5)] + [("A:9", "A", "rareword")]
    docs = _docs(spark, rows)
    bt = B.suffix_arrays_blocking(docs, min_len=6, max_frequency=3)
    keys = {r.block_key for r in bt.select("block_key").distinct().collect()}
    # all suffixes of 'commonword' appear 5x > 3 -> dropped; 'rareword' suffixes kept
    assert all("common" not in k for k in keys)
    assert "rareword" in keys and "areword" in keys


def test_qgrams_blocking(spark):
    docs = _docs(spark, [("A:1", "A", "abcdefg")])
    bt = B.qgrams_blocking(docs, q=6).toPandas()
    assert set(bt.block_key) == {"abcdef", "bcdefg"}


def test_extended_qgrams_blocking_combinations(spark):
    docs = _docs(spark, [("A:1", "A", "abcdefg")])
    # token 'abcdefg', q=6 -> grams [abcdef, bcdefg]; L=2, t=0.95 -> k=2 -> only full concat
    bt = B.extended_qgrams_blocking(docs, q=6, threshold=0.95).toPandas()
    assert set(bt.block_key) == {"abcdefbcdefg"}
    # t=0.4 -> k=1 -> singles + the pair
    bt2 = B.extended_qgrams_blocking(docs, q=6, threshold=0.4).toPandas()
    assert set(bt2.block_key) == {"abcdef", "bcdefg", "abcdefbcdefg"}


def test_purging_threshold_grouped_histogram_matches_per_block_median():
    """The grouped-histogram weighted median must equal the per-block
    pandas median (the DuckDB oracle computes median(comp) over per-block
    rows) — odd and even multiset sizes, interpolated midpoint."""
    import pandas as pd

    from continuousfilteringbenchmark_spark.operators.blocking import purging_threshold

    for per_block in ([1, 1, 3, 6, 10], [1, 3, 3, 28]):  # odd, even (interp 3.0 -> clamp 75)
        s = pd.Series(per_block, name="comparisons")
        hist = (
            s.value_counts().rename_axis("comparisons").rename("n_blocks").reset_index()
        )
        # block_size irrelevant to the median; use size 2 blocks for assignments
        hist["assignments"] = hist["n_blocks"] * 2
        t = purging_threshold(hist)
        # replay: scan threshold on the same data, clamp via pandas median
        import math

        g = hist.sort_values("comparisons").reset_index(drop=True)
        bc = g["assignments"].cumsum().astype(float).tolist()
        cc = (g["comparisons"] * g["n_blocks"]).cumsum().astype(float).tolist()
        cards = g["comparisons"].tolist()
        thr = cards[0]
        for i in range(1, len(cards)):
            if cc[i] * bc[i - 1] < 1.025 * cc[i - 1] * bc[i] or cc[i - 1] == 0:
                thr = cards[i]
        expected = max(thr, math.floor(25.0 * float(s.median())))
        assert t == expected, (per_block, t, expected)


def test_media_ref_blocking_crossmodal(spark):
    """Docs sharing a media_ref are co-blocked even with disjoint text; the
    media block table composes with pair emission unchanged."""
    span = "kind string, text string, media_ref string, offset int"
    docs = spark.createDataFrame(
        [
            ("1", "A", [("title", "alpha beta", None, 0), ("media", None, "ref://img/X", 1)]),
            ("2", "A", [("title", "gamma delta", None, 0), ("media", None, "ref://img/X", 1)]),
            ("3", "A", [("title", "epsilon zeta", None, 0), ("media", None, "ref://img/Y", 1)]),
            ("4", "A", [("title", "eta theta", None, 0)]),  # no media span
        ],
        f"doc_id string, side string, spans array<struct<{span}>>",
    )
    bt = B.media_ref_blocking(docs)
    got = {(r.block_key, r.doc_id) for r in bt.collect()}
    assert got == {("ref://img/X", "1"), ("ref://img/X", "2"), ("ref://img/Y", "3")}
    pairs = B.pairs_from_blocks(bt, clean_clean=False).collect()
    assert {(r.left_id, r.right_id) for r in pairs} == {("1", "2")}


def test_salted_pair_emission_equals_unsalted_dirty(spark):
    """salt_threshold splits oversized keys into salted sub-blocks (one side
    hashed, the other replicated) — output must equal the plain per-key
    self-join exactly; the trailing distinct absorbs the salt dimension."""
    from continuousfilteringbenchmark_spark.operators import blocking as B

    rows = (
        [("hot", "A", str(i)) for i in range(13)]          # 13 > threshold 4 -> s = 4
        + [("warm", "A", str(i)) for i in range(40, 45)]   # 5 > 4 -> s = 2
        + [("cold", "A", "90"), ("cold", "A", "91")]       # s = 1 path
    )
    blocks = spark.createDataFrame(rows, "block_key string, side string, doc_id string")
    base = {
        (r.left_id, r.right_id)
        for r in B.pairs_from_blocks(blocks, clean_clean=False, salt_cap=None).collect()
    }
    salted = {
        (r.left_id, r.right_id)
        for r in B.pairs_from_blocks(
            blocks, clean_clean=False, salt_cap=None, salt_threshold=4
        ).collect()
    }
    assert salted == base and len(base) == 13 * 12 // 2 + 5 * 4 // 2 + 1


def test_salted_pair_emission_equals_unsalted_clean_clean(spark):
    from continuousfilteringbenchmark_spark.operators import blocking as B

    rows = (
        [("hot", "A", f"A:{i}") for i in range(6)]
        + [("hot", "B", f"B:{i}") for i in range(7)]
        + [("tiny", "A", "A:9"), ("tiny", "B", "B:9")]
    )
    blocks = spark.createDataFrame(rows, "block_key string, side string, doc_id string")
    base = {
        (r.left_id, r.right_id)
        for r in B.pairs_from_blocks(blocks, clean_clean=True, salt_cap=None).collect()
    }
    salted = {
        (r.left_id, r.right_id)
        for r in B.pairs_from_blocks(
            blocks, clean_clean=True, salt_cap=None, salt_threshold=5
        ).collect()
    }
    assert salted == base and len(base) == 6 * 7 + 1


def test_salting_composes_with_block_key_and_cap(spark):
    """with_block_key + salt_cap + salt_threshold together: the cap drops the
    mega key first, salting splits the remaining fat key, block_key column
    survives the salted join."""
    from continuousfilteringbenchmark_spark.operators import blocking as B

    rows = [("mega", "A", str(i)) for i in range(30)] + [
        ("fat", "A", str(i)) for i in range(100, 106)
    ]
    blocks = spark.createDataFrame(rows, "block_key string, side string, doc_id string")
    got = B.pairs_from_blocks(
        blocks, clean_clean=False, salt_cap=20, salt_threshold=2, with_block_key=True
    ).collect()
    assert {r.block_key for r in got} == {"fat"}
    assert len(got) == 6 * 5 // 2


def test_sorted_neighborhood_pairs_window_semantics(spark):
    from continuousfilteringbenchmark_spark.operators import blocking as B
    from pyspark.sql import functions as F

    # keys sort as: a(1), b(2), c(3), d(4) -> window=3 pairs = rank dist < 3
    df = spark.createDataFrame(
        [("2", "b"), ("4", "d"), ("1", "a"), ("3", "c")],
        "doc_id string, text string",
    )
    got = {(r.id1, r.id2) for r in B.sorted_neighborhood_pairs(df, window=3).collect()}
    assert got == {("1", "2"), ("1", "3"), ("2", "3"), ("2", "4"), ("3", "4")}
    # ties on the key break by doc_id; count formula (w-1)*n - w(w-1)/2
    df2 = spark.createDataFrame(
        [(str(i), "same text") for i in range(6)], "doc_id string, text string"
    )
    pairs = B.sorted_neighborhood_pairs(df2, window=4).collect()
    assert len(pairs) == 3 * 6 - 6
    # deterministic under repartitioning
    got_a = sorted(map(tuple, B.sorted_neighborhood_pairs(df.repartition(7), window=3).collect()))
    assert got_a == sorted(got)


def test_phonetic_key_and_blocking(spark):
    from continuousfilteringbenchmark_spark.operators.blocking import (
        phonetic_blocking,
        phonetic_key,
    )
    from pyspark.sql import functions as F

    toks = spark.createDataFrame(
        [("smith",), ("smyth",), ("smithe",), ("robert",), ("rupert",), ("a",)],
        "t string",
    )
    got = {r["t"]: r["k"] for r in toks.select("t", phonetic_key(F.col("t")).alias("k")).collect()}
    # classic soundex family: smith/smyth/smithe -> s530
    assert got["smith"] == got["smyth"] == got["smithe"] == "s530"
    # robert -> r163; rupert -> r163 (classic pair)
    assert got["robert"] == got["rupert"] == "r163"
    assert got["a"] == "a000"

    docs = spark.createDataFrame(
        [(1, "John Smith"), (2, "Jon Smyth"), (3, "totally d1fferent x9")],
        "doc_id int, text string",
    ).withColumn("side", F.lit("A"))
    blocks = phonetic_blocking(docs, "text")
    by_key = {
        r["block_key"]: r["n"]
        for r in blocks.groupBy("block_key").agg(F.count("*").alias("n")).collect()
    }
    # smith+smyth co-block under s530; john/jon co-block under j500
    assert by_key["s530"] == 2 and by_key["j500"] == 2
    # digit-bearing tokens are skipped: doc 3 contributes only 'totally'
    assert sum(n for k, n in by_key.items() if k.startswith("t")) == 1
