"""Production entry point: continuous ER as a spark-submit streaming job.

Deployment (same ``--py-files`` packaging as scripts/run_pipeline.py)::

    cd /root/repo && zip -qr /tmp/cfb_spark.zip continuousfilteringbenchmark_spark
    spark-submit --py-files /tmp/cfb_spark.zip scripts/run_continuous.py \
        --input  s3://bucket/docs-incoming/   \
        --work   s3://bucket/er-continuous/   \
        --threshold 0.5

Watches ``--input`` for new docs-parquet files (the canonical interleaved
shape: doc_id, spans array<struct<kind,text,media_ref,offset>>) and folds
each micro-batch through incremental blocking -> exact Jaccard scoring ->
incremental cluster maintenance (streaming/continuous.py). The running
(doc_id, cluster_id) assignment and the posting index live under ``--work``
in epoch-addressed directories; restarting the job with the same arguments
resumes from the streaming checkpoint and replays any half-finished epoch
idempotently. At all times the newest assignment epoch equals what the
batch pipeline would produce on the corpus ingested so far.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="continuous ER streaming job")
    p.add_argument("--input", required=True, help="directory of docs parquet files (streamed)")
    p.add_argument("--work", required=True, help="state root: postings, assignment epochs, checkpoint")
    p.add_argument("--threshold", type=float, default=0.5, help="exact Jaccard match threshold")
    p.add_argument("--max-files-per-trigger", type=int, default=1)
    p.add_argument("--max-block-size", type=int, default=None,
                   help="purge tokens whose cumulative posting count exceeds "
                        "this from candidate generation (streaming analogue "
                        "of B6 block purging; recall-affecting). Default: "
                        "uncapped, exact batch equivalence")
    p.add_argument("--compact-every", type=int, default=16,
                   help="compact the posting index into one cumulative epoch "
                        "dir whenever a batch would read this many dirs "
                        "(bounds read fan-in; results unchanged)")
    p.add_argument("--string-ids", action="store_true",
                   help="doc ids are arbitrary strings (min-id clusters use the "
                        "lexicographic order); default expects numeric ids")
    return p


def main(argv: list[str] | None = None, spark: SparkSession | None = None) -> dict:
    args = build_parser().parse_args(argv)
    if spark is None:
        from continuousfilteringbenchmark_spark.session import get_spark

        spark = get_spark("er-continuous")

    from continuousfilteringbenchmark_spark.streaming.continuous import run_continuous_er

    assign = run_continuous_er(
        spark,
        args.input,
        args.work,
        threshold=args.threshold,
        max_files_per_trigger=args.max_files_per_trigger,
        numeric_ids=not args.string_ids,
        max_block_size=args.max_block_size,
        compact_every=args.compact_every,
    )
    summary = {
        "docs": assign.count(),
        "clusters": assign.select("cluster_id").distinct().count(),
        "assignment": args.work,
    }
    print(summary)
    return summary


if __name__ == "__main__":
    main()
