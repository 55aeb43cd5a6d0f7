"""Incremental candidate generation via Structured Streaming.

The reference has NO stream processing ("Continuous" in its name means the
benchmark is continuously updated, reference ``README.md:16``); its one
"streaming" ε-join (``joins/src/scalabilityAnalysis/SchemaAgnosticEJoin.java:
67-111``) is a sequential query-then-insert loop whose batch equivalent is
the dirty self-join (operators/joins.py). This module is therefore an
*extension*: micro-batch ingestion of new docs into the blocking stage for a
production pipeline where the corpus grows continuously.

Shape: readStream(docs) -> tokenize -> explode block keys -> foreachBatch:
join each new micro-batch against the accumulated block index (stream-static
join), append candidates + update the index. Exactly-once via the
idempotent parquet epoch sink.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..datamodel import DOCS_SCHEMA, agg_text
from ..functions import tokenize as tk


def streaming_block_keys(stream_docs: DataFrame) -> DataFrame:
    """Stateless stage: docs stream -> (block_key, doc_id) stream."""
    return (
        stream_docs.select(
            "doc_id", F.explode(tk.word_token_set(agg_text("spans"))).alias("block_key")
        )
        .where(F.col("block_key") != "")
    )


def run_incremental_blocking(
    spark: SparkSession,
    input_dir: str,
    work_dir: str,
    max_block_size: int = 1000,
) -> tuple[int, str]:
    """Drive a docs-parquet directory through a streaming blocking pass.

    For each micro-batch: new (block_key, doc_id) postings join the static
    accumulated index -> incremental candidate pairs (new x old + new x new),
    then the index is extended. Returns (n_candidate_pairs, pairs_dir).

    Local smoke path uses file source + ``processAllAvailable`` (synchronous);
    a production deployment swaps the source for Kafka and the sink/index for
    Iceberg MERGE — same logical plan.
    """
    index_dir = os.path.join(work_dir, "block_index")
    pairs_dir = os.path.join(work_dir, "pairs")
    ckpt_dir = os.path.join(work_dir, "ckpt")
    os.makedirs(index_dir, exist_ok=True)

    stream = spark.readStream.schema(DOCS_SCHEMA).parquet(input_dir)
    keys = streaming_block_keys(stream)

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df = batch_df.persist()
        try:
            have_index = any(
                f.endswith(".parquet") for _, _, fs in os.walk(index_dir) for f in fs
            )
            new_new = (
                batch_df.alias("l")
                .join(batch_df.alias("r"), "block_key")
                .where(F.col("l.doc_id") < F.col("r.doc_id"))
                .select(
                    F.col("l.doc_id").alias("left_id"), F.col("r.doc_id").alias("right_id")
                )
            )
            if have_index:
                index = spark.read.parquet(index_dir)
                sizes = index.groupBy("block_key").count().where(F.col("count") <= max_block_size)
                index = index.join(sizes.select("block_key"), "block_key", "left_semi")
                new_old = (
                    batch_df.join(index.withColumnRenamed("doc_id", "right_id"), "block_key")
                    .where(F.col("doc_id") != F.col("right_id"))
                    .select(
                        F.least("doc_id", "right_id").alias("left_id"),
                        F.greatest("doc_id", "right_id").alias("right_id"),
                    )
                )
                pairs = new_new.union(new_old).distinct()
            else:
                pairs = new_new.distinct()
            pairs.write.mode("append").parquet(pairs_dir)
            batch_df.select("block_key", "doc_id").write.mode("append").parquet(index_dir)
        finally:
            batch_df.unpersist()

    q = (
        keys.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", ckpt_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    n = spark.read.parquet(pairs_dir).distinct().count() if os.path.exists(pairs_dir) else 0
    return n, pairs_dir
