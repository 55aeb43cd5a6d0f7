"""N8 tuner CLI: derive a recall-targeted NN operating point IN-ENGINE and
persist it as a replayable config record (round-4 VERDICT item 8).

This is the reference's ``findNN`` protocol (``nnmethods/faiss/
D4sa.py:174-209``: smallest parameter whose recall reaches the target,
expanding + binary search) run as one command against an embeddings
parquet, ending in a ``configs.TunedNNPoint`` JSON that
``configs.apply_tuned_nn`` replays exactly — config as data, closing the
loop tuner -> registry -> replay that previously existed only in pytest.

Usage:
    python scripts/tune_nn.py --method ivf    --target 0.9 [--out point.json]
    python scripts/tune_nn.py --method range_lsh --target 0.9 --threshold 0.35

Prints ONE JSON line with the derived point and its achieved recall.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def derive_point(spark, args) -> "object":
    """Run the tuner against ``<sf_dir>/embeddings.parquet`` and return the
    TunedNNPoint (separated from main() so tests can drive it on a shared
    session)."""
    from pyspark.sql import functions as F

    from continuousfilteringbenchmark_spark import configs as C
    from continuousfilteringbenchmark_spark import tuning as T
    from continuousfilteringbenchmark_spark.operators.dense import range_search

    vecs = (
        spark.read.parquet(os.path.join(args.sf_dir, "embeddings.parquet"))
        .select("vec_id", F.col("embedding").cast("array<double>").alias("vec"))
        .limit(args.limit)
        .repartition(8)
        .persist()
    )
    vecs.count()
    try:
        if args.method == "ivf":
            value, recall = T.tune_ivf_nprobe(
                vecs,
                target_recall=args.target,
                k=args.k,
                n_cells=args.cells,
                quantizer="sample",
            )
            return C.TunedNNPoint(
                method="knn_ivf",
                param="nprobe",
                value=value,
                target_recall=args.target,
                achieved_recall=recall,
                fixed={
                    "k": args.k,
                    "n_cells": args.cells,
                    "seed": 42,
                    "quantizer": "sample",
                },
            )
        # range_lsh: gold = exact range search at the same threshold
        gold = (
            range_search(
                vecs, None, threshold=args.threshold, id_col="vec_id",
                method="exact",
            )
            .select("left_id", "right_id")
            .persist()
        )
        gold.count()
        value, recall = T.tune_range_search_probes(
            vecs,
            gold,
            target_pc=args.target,
            threshold=args.threshold,
            lsh_tables=args.tables,
            lsh_bits=args.bits,
            id_col="vec_id",
        )
        gold.unpersist()
        return C.TunedNNPoint(
            method="range_search_lsh",
            param="lsh_probes",
            value=value,
            target_recall=args.target,
            achieved_recall=recall,
            fixed={
                "threshold": args.threshold,
                "lsh_tables": args.tables,
                "lsh_bits": args.bits,
            },
        )
    finally:
        vecs.unpersist()


def main(argv=None) -> None:
    import dataclasses

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--method", choices=("ivf", "range_lsh"), required=True)
    ap.add_argument("--target", type=float, default=0.9)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"))
    ap.add_argument("--limit", type=int, default=2000,
                    help="tune on at most this many vectors")
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument("--cells", type=int, default=16)
    ap.add_argument("--threshold", type=float, default=0.35)
    ap.add_argument("--tables", type=int, default=8)
    ap.add_argument("--bits", type=int, default=8)
    ap.add_argument("--out", default=None, help="write the TunedNNPoint JSON here")
    args = ap.parse_args(argv)

    from continuousfilteringbenchmark_spark import configs as C
    from continuousfilteringbenchmark_spark.session import get_spark

    spark = get_spark("tune_nn", cpus=8, shuffle_partitions=8)
    point = derive_point(spark, args)
    if args.out:
        C.save_tuned_nn(point, args.out)
    print(json.dumps(dataclasses.asdict(point)))


if __name__ == "__main__":
    main()
