"""Dedup family + text analysis + multimodal plumbing tests."""

import pytest
from pyspark.sql import functions as F

from continuousfilteringbenchmark_spark.functions import text as tx
from continuousfilteringbenchmark_spark.operators import dedup
from continuousfilteringbenchmark_spark.operators import multimodal as mm


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_exact_duplicates(spark):
    df = _docs(
        spark,
        [("1", "Hello World"), ("2", "  hello world "), ("3", "different text")],
    )
    got = {r.doc_id: (r.is_duplicate, r.keep_id) for r in dedup.exact_duplicates(df).collect()}
    assert got["1"] == (True, "1")
    assert got["2"] == (True, "1")
    assert got["3"] == (False, "3")


def test_ngram_jaccard_near_duplicates(spark):
    df = _docs(
        spark,
        [
            ("1", "the quick brown fox jumps over the lazy dog"),
            ("2", "the quick brown fox jumps over the lazy cat"),
            ("3", "entirely different words appear here instead"),
        ],
    )
    pairs = {(r.left_id, r.right_id) for r in dedup.ngram_jaccard_near_duplicates(df, 0.6).collect()}
    assert ("1", "2") in pairs
    assert all("3" not in p for p in pairs)


def test_minhash_near_duplicates_verified(spark):
    df = _docs(
        spark,
        [
            ("1", "large scale entity resolution with spark dataframes"),
            ("2", "large scale entity resolution with spark dataframe"),
            ("3", "zzz completely unrelated content qqq"),
        ],
    )
    pairs = dedup.minhash_near_duplicates(df, threshold=0.5).collect()
    got = {(r.left_id, r.right_id) for r in pairs}
    assert ("1", "2") in got
    for r in pairs:
        assert r.score >= 0.5


def test_dedup_assignments_keep_min(spark):
    df = _docs(spark, [("1", "a"), ("2", "a"), ("3", "a"), ("9", "b")])
    pairs = spark.createDataFrame([("1", "2"), ("2", "3")], "left_id string, right_id string")
    got = {r.doc_id: (r.group_id, r.keep) for r in dedup.dedup_assignments(df, pairs).collect()}
    assert got == {"1": ("1", True), "2": ("1", False), "3": ("1", False), "9": ("9", True)}


# ----------------------------------------------------------- text analysis


def test_language_id(spark):
    df = _docs(
        spark,
        [
            ("en", "the cat and the dog sat in the garden with a ball"),
            ("es", "el perro y la gata de la casa juegan por el parque con los amigos"),
            ("de", "der hund und die katze sind nicht mit dem ball im garten"),
            ("und", "zzz qqq www"),
        ],
    )
    got = {r.doc_id: r.lang for r in df.select("doc_id", tx.language_id("text").alias("lang")).collect()}
    assert got == {"en": "en", "es": "es", "de": "de", "und": "und"}


def test_token_counts(spark):
    df = _docs(spark, [("1", "one two three"), ("2", "")])
    got = {r.doc_id: r.n for r in df.select("doc_id", tx.token_count("text").alias("n")).collect()}
    assert got == {"1": 3, "2": 0}


def test_bpe_ish_token_count_longer_for_long_words(spark):
    df = _docs(spark, [("1", "internationalization"), ("2", "cat")])
    got = {r.doc_id: r.n for r in df.select("doc_id", tx.bpe_ish_token_count("text").alias("n")).collect()}
    assert got["1"] == 5  # ceil(20/4)
    assert got["2"] == 1


def test_quality_score_ranges(spark):
    good = "the quick brown fox jumps over the lazy dog and runs to the river bank"
    bad = "@@@ ### $$$ %%%"
    df = _docs(spark, [("good", good), ("bad", bad), ("empty", "")])
    got = {r.doc_id: r.q for r in df.select("doc_id", tx.quality_score("text").alias("q")).collect()}
    assert 0 <= got["empty"] <= got["bad"] < got["good"] <= 1.0


def test_fingerprint_normalization_invariance(spark):
    df = _docs(spark, [("1", "Hello,   World!"), ("2", "hello world"), ("3", "hello world!!")])
    got = {r.doc_id: r.f for r in df.select("doc_id", tx.fingerprint("text").alias("f")).collect()}
    assert got["1"] == got["2"] == got["3"]


# ------------------------------------------------------------- multimodal


def test_multimodal_plumbing(spark, cc_corpus):
    refs = mm.media_refs_from_docs(cc_corpus.docs)
    assert refs.count() > 0
    media = mm.synthesize_media_table(refs)
    feats = mm.extract_features(media, decode_backend="fake")
    rows = feats.limit(5).collect()
    assert all(len(r.feature) == mm.FEATURE_DIM for r in rows)
    # determinism: same ref -> same feature
    f2 = {r.media_ref: r.feature for r in mm.extract_features(media, "fake").limit(5).collect()}
    f1 = {r.media_ref: r.feature for r in rows}
    for k in f1:
        assert f1[k] == f2[k]


def test_multimodal_real_backend_raises_without_pil(spark, cc_corpus, monkeypatch):
    monkeypatch.setattr(mm, "_pil_image_module", lambda: None)
    media = mm.synthesize_media_table(mm.media_refs_from_docs(cc_corpus.docs))
    with pytest.raises(ModuleNotFoundError):
        mm.extract_features(media, decode_backend="real")


def test_multimodal_auto_falls_back_to_fake(spark, cc_corpus, monkeypatch):
    monkeypatch.setattr(mm, "_pil_image_module", lambda: None)
    media = mm.synthesize_media_table(mm.media_refs_from_docs(cc_corpus.docs))
    with pytest.warns(RuntimeWarning, match="falling back"):
        feats = mm.extract_features(media, decode_backend="auto")
    fake = mm.extract_features(media, decode_backend="fake")
    got = {r.media_ref: r.feature for r in feats.limit(3).collect()}
    want = {r.media_ref: r.feature for r in fake.limit(3).collect()}
    assert got == want


def _make_pil_stub():
    """Minimal PIL.Image stand-in: open() -> an object whose convert/resize
    chain produces a deterministic 8x8 'pixel' array. Defined INSIDE a
    function so cloudpickle serializes it by value — python workers can't
    import the test module."""

    class _Img:
        def __init__(self, payload: bytes):
            self._p = payload

        def convert(self, mode):
            return self

        def resize(self, wh):
            return self

        format = "PNG"

        def __array__(self, dtype=None, copy=None):
            import numpy as np

            seed = (sum(self._p) if self._p else 0) % 251
            arr = (np.arange(64, dtype=np.float64).reshape(8, 8) + seed) % 256
            return arr.astype(dtype or np.float64)

    class _StubPILImage:
        @staticmethod
        def open(buf):
            return _Img(buf.getvalue())

    return _StubPILImage


def test_multimodal_real_branch_with_pil_stub(spark, cc_corpus, monkeypatch):
    """The 'real' branch end-to-end through mapInPandas, with a PIL stub
    injected: decode -> grayscale 8x8 -> normalized pixels, padded to dim.
    The stub module is captured driver-side at plan construction and rides
    the task closure to the python workers."""
    stub = _make_pil_stub()
    monkeypatch.setattr(mm, "_pil_image_module", lambda: stub)
    media = mm.synthesize_media_table(mm.media_refs_from_docs(cc_corpus.docs))
    rows = mm.extract_features(media, decode_backend="real").limit(3).collect()
    assert rows and all(len(r.feature) == mm.FEATURE_DIM for r in rows)
    for r in rows:
        # first 64 entries are pixels/255 in [0,1], the rest zero padding
        assert all(0.0 <= v <= 1.0 for v in r.feature[:64])
        assert all(v == 0.0 for v in r.feature[64:])
    # auto now picks the real branch (no warning) and matches it exactly
    auto = {
        r.media_ref: r.feature
        for r in mm.extract_features(media, decode_backend="auto").limit(3).collect()
    }
    assert auto == {r.media_ref: r.feature for r in rows}


def _make_resize_pil_stub():
    """PIL stand-in that mimics the real library's format semantics: open()
    sets .format, resize() returns a NEW image with format=None (exactly the
    trap the operator must sidestep), save() records which format was used.
    Payloads starting with b'BAD' raise on open, like corrupt bytes."""

    class _Img:
        def __init__(self, payload: bytes, fmt):
            self._p = payload
            self.format = fmt

        def resize(self, wh):
            return _Img(self._p, None)

        def save(self, buf, format=None):
            buf.write((format or "NONE").encode() + b":" + self._p)

    class _StubPILImage:
        @staticmethod
        def open(buf):
            p = buf.getvalue()
            if p.startswith(b"BAD"):
                raise ValueError("cannot identify image file")
            return _Img(p, "JPEG")

    return _StubPILImage


def test_resize_real_keeps_source_format_and_skips_corrupt(spark, monkeypatch):
    stub = _make_resize_pil_stub()
    monkeypatch.setattr(mm, "_pil_image_module", lambda: stub)
    media = spark.createDataFrame(
        [
            ("ref://img/1", "image", bytearray(b"payload-one"), 32, 32, None),
            ("ref://img/2", "image", bytearray(b"BAD-payload"), 31, 30, None),
        ],
        mm.MEDIA_SCHEMA,
    )
    rows = {r.media_ref: r for r in mm.resize_images(media, 8, 8, decode_backend="real").collect()}
    good = rows["ref://img/1"]
    # re-encoded with the format captured from open(), not resize()'s None
    assert bytes(good.payload) == b"JPEG:payload-one"
    assert (good.width, good.height) == (8, 8)
    bad = rows["ref://img/2"]
    # corrupt payload passes through untouched with its original metadata
    assert bytes(bad.payload) == b"BAD-payload"
    assert (bad.width, bad.height) == (31, 30)


def test_extract_features_real_nulls_undecodable(spark, monkeypatch):
    stub = _make_resize_pil_stub()
    monkeypatch.setattr(mm, "_pil_image_module", lambda: stub)
    media = spark.createDataFrame(
        [("ref://img/bad", "image", bytearray(b"BAD-bytes"), 32, 32, None)],
        mm.MEDIA_SCHEMA,
    )
    rows = mm.extract_features(media, decode_backend="real").collect()
    assert len(rows) == 1 and rows[0].feature is None


def test_frame_sampling(spark):
    media = spark.createDataFrame(
        [("ref://vid/1", "video", None, None, None, 3500)],
        "media_ref string, media_type string, payload binary, width int, height int, duration_ms long",
    )
    frames = mm.sample_frames(media, every_ms=1000).collect()
    assert {r.frame_idx for r in frames} == {0, 1, 2}
    assert frames[0].frame_ref.startswith("ref://vid/1#f")


def test_corpus_curation_all_reasons(spark):
    from continuousfilteringbenchmark_spark.plans.curation import curate_corpus

    base = "the quick brown fox and the lazy dog ran to the park in the morning with friends"
    df = _docs(
        spark,
        [
            ("1", base),                                  # keeper -> ok
            ("2", "  " + base.upper() + " "),             # exact dup of 1
            ("3", base + " today"),                       # minhash near-dup of 1
            ("4", "el perro corre por la casa de la familia con los amigos por que una las"),  # lang
            # English-detected (one 'the') but junk: few tokens, digit-heavy,
            # mean word length out of band -> quality < 0.5
            ("5", "the 00000000000000000000 11111111111111111111 22222222222222222222 @@@@@@@@@@"),
        ],
    )
    rows = {
        r.doc_id: r
        for r in curate_corpus(df, allowed_langs=("en",), min_quality=0.5).collect()
    }
    assert len(rows) == 5
    assert (rows["1"].keep, rows["1"].reason, rows["1"].rep_id) == (True, "ok", "1")
    # exact dup collapses through its keeper's near-dup group rep
    assert (rows["2"].keep, rows["2"].reason, rows["2"].rep_id) == (False, "exact_dup", "1")
    assert (rows["3"].keep, rows["3"].reason, rows["3"].rep_id) == (False, "near_dup", "1")
    assert (rows["4"].keep, rows["4"].reason, rows["4"].rep_id) == (False, "lang", "4")
    assert rows["4"].lang_pred == "es"
    assert (rows["5"].keep, rows["5"].reason, rows["5"].rep_id) == (False, "low_quality", "5")
    assert rows["5"].quality < 0.5 <= rows["1"].quality


def test_word_ngram_windows_positions_and_short_docs(spark):
    df = _docs(spark, [("1", "A b, c d"), ("2", "x y")])
    wins = dedup.word_ngram_windows(df, n=3).collect()
    # doc 1 has 4 tokens -> windows at pos 0 and 1; doc 2 (2 tokens) none
    got = sorted((r.doc_id, r.pos) for r in wins)
    assert got == [("1", 0), ("1", 1)]
    # gram hashes of equal token windows are equal across docs
    df2 = _docs(spark, [("1", "a b c"), ("2", "A  b c!")])
    grams = [r.gram for r in dedup.word_ngram_windows(df2, n=3).collect()]
    assert len(grams) == 2 and grams[0] == grams[1]


def test_duplicated_ngram_spans_merges_contiguous_windows(spark):
    # docs 1+2 share the 6-token run "one two three four five six";
    # with n=3 that is 4 shared windows (pos 1..4 in doc 1) merging into
    # ONE span [1, 6]; doc 3 shares nothing
    df = _docs(
        spark,
        [
            ("1", "zzz one two three four five six qqq"),
            ("2", "one two three four five six"),
            ("3", "totally disjoint text content here now"),
        ],
    )
    spans = {r.doc_id: (r.start_tok, r.end_tok, r.n_windows)
             for r in dedup.duplicated_ngram_spans(df, n=3).collect()}
    assert spans["1"] == (1, 6, 4)
    assert spans["2"] == (0, 5, 4)
    assert "3" not in spans


def test_duplicated_ngram_spans_splits_far_apart_islands(spark):
    # the shared gram appears at pos 0 and pos 8 of doc 1 (gap > n) ->
    # two separate spans
    df = _docs(
        spark,
        [
            ("1", "a b c x1 x2 x3 x4 x5 a b c"),
            ("2", "a b c"),
        ],
    )
    spans = sorted(
        (r.start_tok, r.end_tok, r.n_windows)
        for r in dedup.duplicated_ngram_spans(df, n=3).collect()
        if r.doc_id == "1"
    )
    assert spans == [(0, 2, 1), (8, 10, 1)]


def test_contamination_flags_counts_distinct_hits(spark):
    corpus = _docs(
        spark,
        [
            ("c1", "the eval answer is forty two exactly"),
            ("c2", "clean document with original content only"),
        ],
    )
    bench = _docs(spark, [("b1", "the eval answer is forty two")])
    got = {r.doc_id: (r.n_hits, r.contaminated)
           for r in dedup.contamination_flags(corpus, bench, n=4).collect()}
    # shared 6-token run -> 3 distinct 4-gram windows hit
    assert got["c1"] == (3, True)
    assert got["c2"] == (0, False)
    # every corpus doc gets a row, contaminated or not
    assert set(got) == {"c1", "c2"}


def test_repetition_profile_signals(spark):
    df = _docs(
        spark,
        [
            ("1", "spam spam spam spam spam spam"),     # one token repeated
            ("2", "all words here are fully distinct"),  # no repetition
            ("3", "x"),                                   # too short for 2-grams
            ("4", ""),                                    # empty
        ],
    )
    got = {r.doc_id: r for r in dedup.repetition_profile(df, n=2).collect()}
    # doc 1: 6 tokens, 1 distinct -> dup frac 5/6; top 2-gram "spam spam"
    # appears 5x -> frac min(10/6, 1) = 1.0 -> repetitive
    r1 = got["1"]
    assert (r1.n_tokens, r1.top_ngram_count, r1.top_ngram_frac, r1.repetitive) == (6, 5, 1.0, True)
    assert abs(r1.dup_token_frac - round(5 / 6, 6)) < 1e-9
    r2 = got["2"]
    assert (r2.dup_token_frac, r2.top_ngram_count, r2.repetitive) == (0.0, 1, False)
    assert got["3"].top_ngram_count == 0 and not got["3"].repetitive
    r4 = got["4"]
    assert (r4.n_tokens, r4.dup_token_frac, r4.top_ngram_frac, r4.repetitive) == (0, 0.0, 0.0, False)
