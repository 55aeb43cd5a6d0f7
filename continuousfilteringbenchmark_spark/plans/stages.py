"""Materialized, resumable pipeline stages with per-partition lineage +
metric rows (north rule).

Every stage of the ER pipeline commits to the stage store (Iceberg when the
runtime is present — sources/iceberg.py — else parquet under a run
directory) together with a ``metrics`` append::

    metrics(run_id, stage, partition_id, rows, wall_ms, committed_at_ms)

Resume: ``StageStore.run_stage`` short-circuits to the committed table when a
``_SUCCESS``-marked output for (run_id, stage) exists — re-running a failed
pipeline re-executes only the stages after the last committed snapshot.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

METRICS_SCHEMA = (
    "run_id string, stage string, partition_id int, rows long, wall_ms long, committed_at_ms long"
)


@dataclass
class StageStore:
    spark: SparkSession
    root: str
    run_id: str

    def _path(self, stage: str) -> str:
        return os.path.join(self.root, self.run_id, stage)

    def is_committed(self, stage: str) -> bool:
        return os.path.exists(os.path.join(self._path(stage), "_SUCCESS"))

    def read(self, stage: str) -> DataFrame:
        return self.spark.read.parquet(self._path(stage))

    def _append_metrics(self, stage: str, df_path: str, wall_ms: int) -> None:
        per_part = (
            self.spark.read.parquet(df_path)
            .groupBy(F.spark_partition_id().alias("partition_id"))
            .agg(F.count("*").alias("rows"))
            .select(
                F.lit(self.run_id).alias("run_id"),
                F.lit(stage).alias("stage"),
                "partition_id",
                "rows",
                F.lit(wall_ms).alias("wall_ms"),
                F.lit(int(time.time() * 1000)).alias("committed_at_ms"),
            )
        )
        per_part.write.mode("append").parquet(os.path.join(self.root, self.run_id, "_metrics"))

    def append_metric(self, stage: str, rows: int, wall_ms: int = 0) -> None:
        """Append one scalar metrics row (partition_id = -1) — used for
        operator-level observability such as salt-cap drops, where silence
        would hide an answer-changing event."""
        row = self.spark.createDataFrame(
            [(self.run_id, stage, -1, int(rows), int(wall_ms), int(time.time() * 1000))],
            METRICS_SCHEMA,
        )
        row.write.mode("append").parquet(os.path.join(self.root, self.run_id, "_metrics"))

    def run_stage(
        self, stage: str, build: Callable[[], DataFrame], partition_by: list[str] | None = None
    ) -> DataFrame:
        """Execute-or-resume one stage. ``build`` is only called on a cache
        miss; the committed parquet is the stage's source of truth either way
        (downstream stages read the materialized table, cutting lineage)."""
        path = self._path(stage)
        if self.is_committed(stage):
            return self.spark.read.parquet(path)
        t0 = time.time()
        df = build()
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(path)
        self._append_metrics(stage, path, int((time.time() - t0) * 1000))
        return self.spark.read.parquet(path)

    def run_token_bucket_stage(
        self, tokened: DataFrame, n_buckets: int = 32, stage: str = "token_buckets"
    ) -> str:
        """Commit the write-time bucketed hashed-token layout
        (``plans.bucketed.write_token_buckets``) as a resumable stage and
        return its path. This is the production co-location contract: the
        scoring stage reads token payloads straight from these buckets, so
        no shuffle ever carries a token array regardless of corpus size."""
        path = self._path(stage)
        if not self.is_committed(stage):
            from .bucketed import write_token_buckets

            t0 = time.time()
            write_token_buckets(tokened, path, n_buckets)
            self._append_metrics(stage, path, int((time.time() - t0) * 1000))
        return path

    def metrics(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.root, self.run_id, "_metrics"))


def materialized_er_pipeline(
    docs: DataFrame,
    store: StageStore,
    cfg=None,
    clean_clean: bool = True,
    reference_config=None,
    n_buckets: int = 32,
) -> dict[str, DataFrame]:
    """The M1 pipeline with every stage committed + resumable.

    Stage graph: tokened -> blocks -> candidate_pairs -> matches -> clusters.

    ``reference_config``: a ``configs.ReferenceBlockingConfig`` (one of the
    reference's published tuned operating points, e.g.
    ``configs.from_reference('token_blocking', 'L2', 'D9')``). When given,
    the blocks stage runs the decoded builder/purging/filtering chain and
    the candidate stage the decoded weighting + comparison-cleaning pruner,
    instead of ``cfg.blocking`` + plain comparison propagation.
    """
    from ..plans.pipeline import ERConfig, docs_with_tokens, score_pairs
    from ..operators import blocking as B
    from ..operators.cluster import clusters_with_singletons

    cfg = cfg or ERConfig()
    cfg.blocking.clean_clean = clean_clean

    tokened = store.run_stage(
        "tokened", lambda: docs_with_tokens(docs, side_from_prefix=clean_clean)
    )
    if reference_config is not None:
        from .. import configs as C

        blocks = store.run_stage(
            "blocks",
            lambda: C.build_blocks_from_reference(tokened, reference_config, clean_clean),
        )
        pairs = store.run_stage(
            "candidate_pairs",
            lambda: C.candidate_pairs_from_reference(
                blocks, reference_config, clean_clean
            ).select("left_id", "right_id"),
        )
    else:
        blocks = store.run_stage("blocks", lambda: B.build_blocks(tokened, cfg.blocking))
        pairs = store.run_stage(
            "candidate_pairs",
            lambda: B.pairs_from_blocks(
                blocks,
                clean_clean,
                store=store,
                salt_threshold=getattr(cfg, "salt_threshold", None),
            ),
        )
    # write-time doc_id bucketing: committed alongside the token stage so
    # the scoring stage can co-locate past the broadcast cap (score_pairs
    # auto flips to the bucketed engine exactly when the dictionary probe
    # proves the corpus over-cap — under it the arrow engine still wins)
    bucket_path = store.run_token_bucket_stage(tokened, n_buckets=n_buckets)
    matches = store.run_stage(
        "matches",
        lambda: score_pairs(
            pairs,
            tokened,
            cfg.sim,
            min_score=cfg.threshold,
            bucket_path=bucket_path,
        ),
    )
    clusters = store.run_stage(
        "clusters",
        lambda: clusters_with_singletons(docs, matches.select("left_id", "right_id")),
    )
    return {
        "tokened": tokened,
        "blocks": blocks,
        "candidate_pairs": pairs,
        "matches": matches,
        "clusters": clusters,
    }
