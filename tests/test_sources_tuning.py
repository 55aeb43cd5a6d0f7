"""S3/S4 reader round-trips (VERDICT gap: written but never tested) and the
N8 recall tuner."""

import os

import pytest
from pyspark.sql import functions as F

from continuousfilteringbenchmark_spark.sources import readers
from continuousfilteringbenchmark_spark.tuning import find_min_param


def test_embedding_csv_reader_parses_and_tracks_dropped(spark, tmp_path):
    # S3: %-delimited CSV with stringified vectors; one empty-vector row must
    # be dropped WITH id bookkeeping (reference faiss/D4sa.py:232-253 tracks
    # dropped ids manually for ground-truth remapping)
    p = tmp_path / "emb.csv"
    p.write_text(
        "Id%Title%Embedded\n"
        "1%alpha%[0.5, 1.0, -2.0]\n"
        "2%beta%[]\n"
        "3%gamma%[1.5 2.5 3.5]\n"
    )
    clean, dropped = readers.read_embedding_csv(spark, str(p))
    got = {r["Id"]: r["vec"] for r in clean.select("Id", "vec").collect()}
    assert got == {"1": [0.5, 1.0, -2.0], "3": [1.5, 2.5, 3.5]}
    assert [r.dropped_id for r in dropped.collect()] == ["2"]


def test_dirty_er_csv_reader(spark, tmp_path):
    # S4: |-delimited full.csv / duplicates.csv (MH_LSH.py:154-170)
    full = tmp_path / "10full.csv"
    full.write_text("Id|Clean Ag.Value\na|hello world\nb|hello there\n")
    dup = tmp_path / "10duplicates.csv"
    dup.write_text("Entity1|Entity2\nb|a\na|b\n")
    docs, gold = readers.read_dirty_er_csv(spark, str(full), str(dup))
    assert {(r.doc_id, r.text) for r in docs.collect()} == {
        ("a", "hello world"), ("b", "hello there"),
    }
    # canonical (min,max) ordering + dedup of the reversed pair
    assert [(r.left_id, r.right_id) for r in gold.collect()] == [("a", "b")]


def test_find_min_param_binary_search():
    # monotone recall curve; target between steps -> smallest satisfying param
    calls = []

    def ev(p):
        calls.append(p)
        return min(1.0, p / 10.0)

    p, r = find_min_param(ev, target=0.75, lo=1, hi=64)
    assert p == 8 and abs(r - 0.8) < 1e-12
    # expansion mode (hi=None) doubles then binary-searches
    calls.clear()
    p2, r2 = find_min_param(ev, target=0.75, lo=1)
    assert p2 == 8
    # deterministic: same call sequence every run
    c1 = list(calls)
    calls.clear()
    find_min_param(ev, target=0.75, lo=1)
    assert calls == c1


def test_find_min_param_unreachable():
    with pytest.raises(ValueError):
        find_min_param(lambda p: 0.1, target=0.9, lo=1, hi=8)


def test_tuner_reaches_pc_target_on_embeddings(spark):
    """N8 end-to-end: tune hyperplane-LSH table count until the candidate set
    reaches PC >= 0.9 against exact range-search gold (the reference's
    protocol: binary-search #probes until recall >= target,
    ``nnmethods/faiss/D4sa.py:174-209`` / ``falconn/hyperplaneLSH/D4.py:118-150``)."""
    from continuousfilteringbenchmark_spark.operators.dense import range_search
    from continuousfilteringbenchmark_spark.tuning import pc_of_pairs

    vecs = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("vec"))
        .cache()
    )
    gold = range_search(vecs, None, threshold=0.35, id_col="vec_id", method="exact")
    gold = gold.select("left_id", "right_id").cache()
    n_gold = gold.count()
    assert n_gold > 0

    def ev(n_tables: int) -> float:
        cand = range_search(
            vecs, None, threshold=0.35, id_col="vec_id",
            method="lsh", lsh_tables=n_tables, lsh_bits=4,
        ).select("left_id", "right_id")
        return pc_of_pairs(cand, gold)

    n_tables, pc = find_min_param(ev, target=0.9, lo=1, hi=64)
    assert pc >= 0.9
    assert 1 <= n_tables <= 64
    # LSH verify path yields a SUBSET of exact pairs (never invents)
    cand = range_search(
        vecs, None, threshold=0.35, id_col="vec_id",
        method="lsh", lsh_tables=n_tables, lsh_bits=4,
    ).select("left_id", "right_id")
    assert cand.join(gold, ["left_id", "right_id"], "left_anti").count() == 0


def test_tuner_probes_axis(spark):
    """N8 over the FALCONN multiprobe axis: smallest lsh_probes reaching the
    PC target at fixed (tables, bits) — and monotonicity of the axis."""
    from continuousfilteringbenchmark_spark.operators.dense import range_search
    from continuousfilteringbenchmark_spark.tuning import tune_range_search_probes

    vecs = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("vec"))
        .cache()
    )
    gold = range_search(vecs, None, threshold=0.35, id_col="vec_id", method="exact")
    gold = gold.select("left_id", "right_id").cache()
    assert gold.count() > 0

    # Feasibility measured on this fixture (deterministic, seeded hyperplanes):
    # tables=8/bits=6 gives PC 0.370 at 0 probes, 0.840 at 2, 0.899 at 4 —
    # the 0.8 target is reachable mid-axis, so the tuner has real work to do.
    # (tables=4/bits=6 tops out at 0.712: correctly raises ValueError.)
    probes, pc = tune_range_search_probes(
        vecs, gold, target_pc=0.8, lsh_tables=8, lsh_bits=6, id_col="vec_id"
    )
    assert pc >= 0.8
    assert 1 <= probes <= 2  # PC(0)=0.370 < 0.8 <= PC(2)=0.840
    # the tuned config still never invents pairs (verify step is exact)
    cand = range_search(
        vecs, None, threshold=0.35, id_col="vec_id",
        method="lsh", lsh_tables=8, lsh_bits=6, lsh_probes=probes,
    ).select("left_id", "right_id")
    assert cand.join(gold, ["left_id", "right_id"], "left_anti").count() == 0


def test_salt_cap_drops_are_logged(spark, tmp_path):
    from continuousfilteringbenchmark_spark.operators import blocking as B
    from continuousfilteringbenchmark_spark.plans.stages import StageStore

    rows = [("big", "A", str(i)) for i in range(8)] + [("ok", "A", "1"), ("ok", "A", "2")]
    blocks = spark.createDataFrame(rows, "block_key string, side string, doc_id string")
    store = StageStore(spark, str(tmp_path), "run1")
    log = []
    pairs = B.pairs_from_blocks(
        blocks, clean_clean=False, salt_cap=5, drop_log=log, store=store
    )
    assert {(r.left_id, r.right_id) for r in pairs.collect()} == {("1", "2")}
    assert log == [(1, 8)]  # one over-cap key carrying 8 rows
    m = store.metrics().where(F.col("stage").contains("salt_cap_dropped")).collect()
    assert len(m) == 1 and m[0]["rows"] == 8


def test_tune_ivf_nprobe_and_replay_roundtrip(spark, tmp_path):
    """Round-5 N8 wiring: the tuner derives an IVF operating point
    in-engine, persists it as a configs.TunedNNPoint, and apply_tuned_nn
    replays the EXACT candidate set the tuning run certified."""
    import numpy as np

    from continuousfilteringbenchmark_spark import configs as C
    from continuousfilteringbenchmark_spark import tuning as T

    rng = np.random.RandomState(7)
    centers = rng.randn(8, 16) * 3.0
    rows = [
        (f"v{i:03d}", [float(x) for x in centers[i % 8] + 0.3 * rng.randn(16)])
        for i in range(200)
    ]
    vecs = spark.createDataFrame(
        rows, "vec_id string, vec array<double>"
    ).repartition(4).persist()
    vecs.count()

    nprobe, recall = T.tune_ivf_nprobe(
        vecs, target_recall=0.8, k=3, n_cells=8, quantizer="sample"
    )
    assert 1 <= nprobe <= 8 and recall >= 0.8
    # minimality: one probe less (if any) must miss the target
    if nprobe > 1:
        gold = T.pc_of_pairs  # reuse below
        from pyspark.sql import functions as F

        from continuousfilteringbenchmark_spark.operators.dense import (
            knn_exact,
            knn_ivf,
        )

        exact = knn_exact(vecs, vecs, k=3, id_col="vec_id").select(
            F.col("query_id").alias("left_id"), F.col("corpus_id").alias("right_id")
        )
        below = knn_ivf(
            vecs, vecs, k=3, n_cells=8, nprobe=nprobe - 1, quantizer="sample",
            id_col="vec_id",
        ).select(
            F.col("query_id").alias("left_id"), F.col("corpus_id").alias("right_id")
        )
        assert gold(below, exact) < 0.8

    point = C.TunedNNPoint(
        method="knn_ivf", param="nprobe", value=nprobe,
        target_recall=0.8, achieved_recall=recall,
        fixed={"k": 3, "n_cells": 8, "seed": 42, "quantizer": "sample"},
    )
    path = str(tmp_path / "point.json")
    C.save_tuned_nn(point, path)
    loaded = C.load_tuned_nn(path)
    assert loaded == point
    replay = C.apply_tuned_nn(loaded, vecs)
    direct = __import__(
        "continuousfilteringbenchmark_spark.operators.dense", fromlist=["knn_ivf"]
    ).knn_ivf(
        vecs, vecs, k=3, n_cells=8, nprobe=nprobe, quantizer="sample",
        id_col="vec_id",
    )
    assert sorted(map(tuple, replay.collect())) == sorted(map(tuple, direct.collect()))
    vecs.unpersist()
