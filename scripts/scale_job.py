"""One parallelism level of the scaling bench: run the full ER pipeline
(token blocking -> purging -> filtering -> candidate pairs -> Jaccard
scoring -> connected components) over a docs parquet and print one JSON line
with per-stage wall times and row counts.

Run as a subprocess per level (fresh JVM, no warm-cache bleed):
    SPARK_GRAFT_CPUS=8 python scripts/scale_job.py BENCH/data/docs.parquet
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    path = sys.argv[1]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from continuousfilteringbenchmark_spark.session import get_spark
    from continuousfilteringbenchmark_spark.operators import blocking as B
    from continuousfilteringbenchmark_spark.operators.cluster import clusters_with_singletons
    from continuousfilteringbenchmark_spark.plans.pipeline import docs_with_tokens, score_pairs

    spark = get_spark("scale_job", cpus=cpus, shuffle_partitions=cpus)
    docs = spark.read.parquet(path)
    n_docs = docs.count()  # warm parquet footers / JVM before the timers

    timings: dict[str, float] = {}
    counts: dict[str, int] = {}

    def stage(name: str, df):
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        timings[name] = round(time.perf_counter() - t0, 3)
        return df

    t_all = time.perf_counter()
    tokened = docs_with_tokens(docs, side_from_prefix=False).persist()
    counts["docs"] = tokened.count()

    blocks = B.standard_blocking(tokened.withColumn("side", F.lit("A")), "text")
    purged = B.block_purging(blocks, clean_clean=False)
    filtered = B.block_filtering(purged, 0.5, clean_clean=False).persist()
    stage("blocking", filtered)

    pairs = B.pairs_from_blocks(filtered, clean_clean=False).persist()
    t0 = time.perf_counter()
    counts["candidate_pairs"] = pairs.count()
    timings["candidate_pairs"] = round(time.perf_counter() - t0, 3)

    scored = score_pairs(pairs, tokened, "jaccard")
    matches = scored.where(F.col("score") >= 0.5).select("left_id", "right_id").persist()
    t0 = time.perf_counter()
    counts["matches"] = matches.count()
    timings["scoring"] = round(time.perf_counter() - t0, 3)

    clusters = clusters_with_singletons(tokened.select("doc_id"), matches)
    t0 = time.perf_counter()
    counts["clusters"] = clusters.select("cluster_id").distinct().count()
    timings["clustering"] = round(time.perf_counter() - t0, 3)

    total = round(time.perf_counter() - t_all, 3)
    print(
        json.dumps(
            {
                "cpus": cpus,
                "n_docs": n_docs,
                "total_sec": total,
                "stages": timings,
                "counts": counts,
                "pairs_per_sec": round(
                    counts["candidate_pairs"]
                    / max(total - timings["clustering"], 1e-9),
                    1,
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
