"""Watermarked tumbling-window ingest statistics (Structured Streaming
extension; brief checklist: "watermarks + windowed aggs for late data").

The reference has no stream processing (see incremental.py); a continuously
ingesting training-data pipeline still needs per-event-time-window ingest
observability — docs arrived, language mix, volume — emitted as IMMUTABLE
rows the moment a window can no longer change. That is exactly the
watermark + append-mode contract:

* ``withWatermark(event_time, delay)`` bounds how late a row may arrive;
  rows older than ``max(event_time seen) - delay`` are DROPPED (the state
  for their window is already finalized and emitted — a correctness
  guarantee, not a heuristic, tested in tests/test_streaming_stateful.py);
* append mode emits each window exactly once, when the watermark passes its
  end — so the sink (Iceberg append in production) only ever receives
  closed windows and never needs upserts.

Scale shape: one shuffle on the window bucket (uniform, time-derived keys);
state is one small row per open window — bounded by ``delay / window``
windows per key, evicted at emission. No Python anywhere.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as X


def windowed_ingest_stats(
    stream_docs: DataFrame,
    window_duration: str = "5 minutes",
    watermark_delay: str = "2 minutes",
    ts_col: str = "event_time",
    text_col: str = "text",
) -> DataFrame:
    """Per-window ingest stats over a (streaming or static) docs table with
    an event-time column.

    Output: (window_start, window_end — epoch seconds BIGINT, n_docs,
    n_en — docs language-identified as English, sum_chars). Epoch seconds
    rather than timestamps so downstream comparisons are timezone-proof.

    The same expression tree works in batch (``F.window`` is a plain
    grouping expression); only the watermark/append semantics are
    streaming-specific — which is what lets the unit test assert
    streaming == batch on the non-late rows.
    """
    prepared = stream_docs.select(
        F.col(ts_col).alias("event_time"),
        (X.language_id(text_col) == "en").cast("int").alias("is_en"),
        F.length(F.col(text_col)).alias("n_chars"),
    )
    if prepared.isStreaming:
        prepared = prepared.withWatermark("event_time", watermark_delay)
    return (
        prepared.groupBy(F.window("event_time", window_duration))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("is_en").alias("n_en"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .select(
            F.unix_timestamp(F.col("window.start")).alias("window_start"),
            F.unix_timestamp(F.col("window.end")).alias("window_end"),
            "n_docs",
            "n_en",
            "sum_chars",
        )
    )


def run_windowed_ingest(
    spark,
    input_dir: str,
    work_dir: str,
    schema,
    window_duration: str = "5 minutes",
    watermark_delay: str = "2 minutes",
) -> DataFrame:
    """Drive a parquet directory of (event_time, text) files through the
    watermarked window agg, ONE FILE PER MICRO-BATCH (file order = arrival
    order), and return the materialized closed windows.

    Append mode only emits a window after a LATER batch advances the
    watermark past its end — Spark computes batch N's watermark from batch
    N-1's event-time max. Callers that want every data window flushed append
    two far-future sentinel files (see ``q_windowed_ingest``): the first
    raises the event-time max, the second's batch then runs with that
    watermark and emits all earlier windows; the sentinel windows themselves
    stay open and never appear in the output.
    """
    out_dir = os.path.join(work_dir, "windows")
    ckpt_dir = os.path.join(work_dir, "ckpt")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(input_dir)
    )
    q = (
        windowed_ingest_stats(stream, window_duration, watermark_delay)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out_schema = (
        "window_start bigint, window_end bigint, n_docs bigint, "
        "n_en bigint, sum_chars bigint"
    )
    if not os.path.isdir(out_dir):
        return spark.createDataFrame([], out_schema)
    return spark.read.schema(out_schema).parquet(out_dir)
