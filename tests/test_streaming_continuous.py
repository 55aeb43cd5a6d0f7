"""Continuous ER (streaming/continuous.py): streaming ingest with
incremental cluster maintenance must equal the batch pipeline (standard
blocking -> exact Jaccard -> connected components with singletons) on the
corpus ingested so far.
"""

import glob
import os

from pyspark.sql import functions as F

from continuousfilteringbenchmark_spark.datamodel import agg_text, documents_to_docs
from continuousfilteringbenchmark_spark.functions import tokenize as tk
from continuousfilteringbenchmark_spark.streaming.continuous import (
    incremental_cc_merge,
    run_continuous_er,
)
from continuousfilteringbenchmark_spark.streaming.staging import stage_microbatch


def test_incremental_cc_merge_joins_components(spark):
    assignment = spark.createDataFrame(
        [(1, 1), (2, 1), (5, 5), (7, 7), (9, 9)], "doc_id long, cluster_id long"
    )
    edges = spark.createDataFrame([(2, 5), (7, 9)], "left_id long, right_id long")
    got = {
        (r.doc_id, r.cluster_id)
        for r in incremental_cc_merge(assignment, edges).collect()
    }
    # {1,2} merges with {5} (min rep 1); {7} with {9} (min rep 7)
    assert got == {(1, 1), (2, 1), (5, 1), (7, 7), (9, 7)}


def test_incremental_cc_merge_no_edges_is_identity(spark):
    assignment = spark.createDataFrame(
        [(3, 3), (4, 3), (8, 8)], "doc_id long, cluster_id long"
    )
    edges = spark.createDataFrame([], "left_id long, right_id long")
    got = {
        (r.doc_id, r.cluster_id)
        for r in incremental_cc_merge(assignment, edges).collect()
    }
    assert got == {(3, 3), (4, 3), (8, 8)}


# flat corpus: three near-dup groups whose members arrive in DIFFERENT
# micro-batches (so clusters must merge across epochs), plus singletons.
FLAT = [
    (1, "alpha beta gamma delta"),
    (2, "alpha beta gamma delta"),          # dup of 1, same epoch
    (3, "unique first text here"),
    (10, "red green blue yellow"),
    (11, "alpha beta gamma delta epsilon"), # near-dup of 1 (J=4/5), later epoch
    (12, "red green blue yellow purple"),   # near-dup of 10 (J=4/5)
    (20, "another lonely document"),
    (21, "red green blue yellow"),          # dup of 10, third epoch
    (22, "alpha beta gamma delta"),         # dup of 1, third epoch
]
EPOCHS = [[1, 2, 3], [10, 11, 12], [20, 21, 22]]


def _write_epochs(spark, docs, work, epochs):
    input_dir = os.path.join(work, "in")
    os.makedirs(input_dir, exist_ok=True)
    for i, ids in enumerate(epochs, start=1):
        stage_microbatch(
            docs.where(F.col("doc_id").cast("long").isin(ids)), input_dir, i
        )
    return input_dir


def _batch_expected(spark, flat_rows, threshold=0.5):
    """Trusted batch chain: all co-token pairs -> exact Jaccard >= t -> CC
    with singletons, min-id clusters (the er_clusters plan shape, unpurged)."""
    docs = documents_to_docs(
        spark.createDataFrame(flat_rows, "doc_id long, text string")
    )
    toks = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.explode(tk.word_token_set(agg_text("spans"))).alias("tok"),
    ).where(F.col("tok") != "")
    sizes = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    common = (
        toks.alias("l")
        .join(toks.alias("r"), "tok")
        .where(F.col("l.doc_id") < F.col("r.doc_id"))
        .groupBy(
            F.col("l.doc_id").alias("left_id"), F.col("r.doc_id").alias("right_id")
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    matches = (
        common.join(sizes.select(F.col("doc_id").alias("left_id"), F.col("sz").alias("lsz")), "left_id")
        .join(sizes.select(F.col("doc_id").alias("right_id"), F.col("sz").alias("rsz")), "right_id")
        .where(F.col("c") / (F.col("lsz") + F.col("rsz") - F.col("c")) >= threshold)
        .select("left_id", "right_id")
    )
    from continuousfilteringbenchmark_spark.operators.cluster import (
        clusters_with_singletons,
    )

    flat = spark.createDataFrame(flat_rows, "doc_id long, text string")
    return {
        (r.doc_id, r.cluster_id)
        for r in clusters_with_singletons(flat, matches, input_distinct=True).collect()
    }


def test_continuous_er_equals_batch_across_epochs(spark, tmp_path):
    docs = documents_to_docs(spark.createDataFrame(FLAT, "doc_id long, text string"))
    input_dir = _write_epochs(spark, docs, str(tmp_path), EPOCHS)
    got_df = run_continuous_er(spark, input_dir, str(tmp_path / "run"), threshold=0.5)
    got = {(r.doc_id, r.cluster_id) for r in got_df.collect()}
    assert got == _batch_expected(spark, FLAT)
    # the cross-epoch merges actually happened: 22 joined 1's cluster,
    # 21 joined 10's
    as_map = dict(got)
    assert as_map[22] == 1 and as_map[11] == 1 and as_map[21] == 10


def test_continuous_er_reingest_is_noop(spark, tmp_path):
    """Re-arriving doc_ids (duplicate file) must not perturb assignments or
    Jaccard sizes — idempotent ingest."""
    docs = documents_to_docs(spark.createDataFrame(FLAT, "doc_id long, text string"))
    # epoch 4 replays epoch 1's docs verbatim
    input_dir = _write_epochs(spark, docs, str(tmp_path), EPOCHS + [EPOCHS[0]])
    got_df = run_continuous_er(spark, input_dir, str(tmp_path / "run"), threshold=0.5)
    got = {(r.doc_id, r.cluster_id) for r in got_df.collect()}
    assert got == _batch_expected(spark, FLAT)


def test_continuous_er_empty_input(spark, tmp_path):
    input_dir = str(tmp_path / "in")
    os.makedirs(input_dir, exist_ok=True)
    got = run_continuous_er(spark, input_dir, str(tmp_path / "run"))
    assert got.count() == 0
    assert got.columns == ["doc_id", "cluster_id"]


# hot-block purge corpus: docs 1/2 share rare tokens (alpha beta gamma) AND
# the hot token; docs 5/6 are identical single-token docs whose ONLY token
# is the hot one ("common" appears in all four docs -> block size 4).
HOT = [
    (1, "common alpha beta gamma"),
    (5, "common"),
    (2, "common alpha beta gamma"),
    (6, "common"),
]
HOT_EPOCHS = [[1, 5], [2, 6]]


def test_continuous_er_max_block_size_purges_hot_token(spark, tmp_path):
    """With the cap, pairs reachable only through a hot token are skipped
    (5-6 stay singletons); pairs that also share rare tokens still match
    (1-2 merge), and their Jaccard uses the FULL token sets."""
    docs = documents_to_docs(spark.createDataFrame(HOT, "doc_id long, text string"))
    input_dir = _write_epochs(spark, docs, str(tmp_path), HOT_EPOCHS)
    got_df = run_continuous_er(
        spark, input_dir, str(tmp_path / "run"), threshold=0.5, max_block_size=3
    )
    got = {(r.doc_id, r.cluster_id) for r in got_df.collect()}
    # at epoch 2 the cumulative "common" block has 4 postings > cap 3, so
    # 2-6 and the 5-6 closure are never generated; 1-2 match via alpha/
    # beta/gamma with exact J=1 over full sets
    assert got == {(1, 1), (2, 1), (5, 5), (6, 6)}


def test_continuous_er_uncapped_equals_batch_on_hot_corpus(spark, tmp_path):
    """Without the cap the streaming == batch invariant holds on the same
    corpus (5-6 merge via the hot token, J=1)."""
    docs = documents_to_docs(spark.createDataFrame(HOT, "doc_id long, text string"))
    input_dir = _write_epochs(spark, docs, str(tmp_path), HOT_EPOCHS)
    got_df = run_continuous_er(spark, input_dir, str(tmp_path / "run"), threshold=0.5)
    got = {(r.doc_id, r.cluster_id) for r in got_df.collect()}
    assert got == _batch_expected(spark, HOT)
    assert dict(got)[6] == 5


def test_continuous_er_compaction_preserves_results(spark, tmp_path):
    """compact_every=2: epoch 2 folds the index into one cumulative dir and
    epoch 3 reads only (cumulative, its own increment) — results must equal
    the uncompacted batch chain exactly."""
    from continuousfilteringbenchmark_spark.streaming.continuous import (
        _CUMULATIVE_MARKER,
        _posting_dirs,
    )

    docs = documents_to_docs(spark.createDataFrame(FLAT, "doc_id long, text string"))
    input_dir = _write_epochs(spark, docs, str(tmp_path), EPOCHS)
    got_df = run_continuous_er(
        spark, input_dir, str(tmp_path / "run"), threshold=0.5, compact_every=2
    )
    got = {(r.doc_id, r.cluster_id) for r in got_df.collect()}
    assert got == _batch_expected(spark, FLAT)
    # a cumulative marker exists, and a hypothetical next epoch reads at
    # most compact_every dirs
    toks_base = str(tmp_path / "run" / "toks")
    markers = glob.glob(os.path.join(toks_base, "e*", _CUMULATIVE_MARKER))
    assert markers, "no cumulative epoch written"
    assert len(_posting_dirs(toks_base, 10**9)) <= 2


def test_continuous_er_compaction_with_reingest(spark, tmp_path):
    """Duplicate-file replay composed with compaction stays idempotent."""
    docs = documents_to_docs(spark.createDataFrame(FLAT, "doc_id long, text string"))
    input_dir = _write_epochs(spark, docs, str(tmp_path), EPOCHS + [EPOCHS[1]])
    got_df = run_continuous_er(
        spark, input_dir, str(tmp_path / "run"), threshold=0.5, compact_every=2
    )
    got = {(r.doc_id, r.cluster_id) for r in got_df.collect()}
    assert got == _batch_expected(spark, FLAT)


def test_continuous_er_within_batch_duplicates(spark, tmp_path):
    """The re-ingest guard must hold WITHIN one micro-batch too: with
    max_files_per_trigger=2, the same doc_id arriving in two files of one
    trigger must enter once. Doubled postings only ever RAISE Jaccard
    (2c/(2s_a+s_b-2c) > c/(s_a+s_b-c)), so the adversarial pair sits just
    under the threshold: J(1,2) = 2/6 = 0.33 < 0.5 honestly, but 0.5 with
    doc 1's rows doubled — a false merge."""
    dup_corpus = [(1, "aa bb cc dd"), (2, "aa bb xx yy")]
    docs = documents_to_docs(
        spark.createDataFrame(dup_corpus, "doc_id long, text string")
    )
    # files [1] and [1,2] land in ONE trigger -> doc 1 appears twice in it
    input_dir = _write_epochs(spark, docs, str(tmp_path), [[1], [1, 2]])
    got_df = run_continuous_er(
        spark,
        input_dir,
        str(tmp_path / "run"),
        threshold=0.5,
        max_files_per_trigger=2,
    )
    got = {(r.doc_id, r.cluster_id) for r in got_df.collect()}
    assert got == _batch_expected(spark, dup_corpus) == {(1, 1), (2, 2)}
