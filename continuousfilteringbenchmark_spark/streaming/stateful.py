"""Stateful streaming dedup via ``applyInPandasWithState``.

The reference has no stream processing (see streaming/incremental.py); this
is the second streaming *extension* the north rule's production pipeline
needs: continuous exact dedup of an unbounded document stream. Where
incremental.py re-reads a growing on-disk index per micro-batch (fine for
blocking, whose index IS the output), dedup state is one tiny record per
distinct content hash — exactly the shape Structured Streaming's keyed state
store holds natively, sharded by the same hash partitioning the groupBy
shuffle already performs. State scales horizontally with executors (RocksDB
state store in production) and survives restarts via the checkpoint.

Contract (decide-at-arrival): every incoming doc is emitted with

    keep      — True iff no doc with the same content hash was seen before
                it (earlier micro-batch, or smaller doc_id within the same
                micro-batch — the intra-batch tie-break is deterministic);
    keep_id   — the id of the group's keeper (the first-seen doc).

This is the streaming refinement of ``operators/dedup.exact_duplicates``:
a batch job can retroactively mark the first copy ``is_duplicate`` once a
second arrives, while an append-mode stream cannot update emitted rows —
so the streaming operator emits the *drop decision at ingest*, which is the
decision a continuous training-data pipeline actually acts on. When the
whole corpus arrives as one micro-batch (or in ascending doc_id order), the
drop set equals the batch operator's ``doc_id != keep_id`` set exactly
(tested in tests/test_streaming_stateful.py).

Per-group work inside the UDF is vectorized pandas (group-wise min /
boolean compare) — no per-row python; groups are micro-batch slices of one
content hash, so each call touches a handful of rows.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..functions import tokenize as tk

OUT_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("content_hash", StringType()),
        StructField("keep", BooleanType()),
        StructField("keep_id", StringType()),
    ]
)
# (keeper id, docs seen so far) per content hash
STATE_SCHEMA = StructType(
    [StructField("keep_id", StringType()), StructField("n_seen", LongType())]
)


def _dedup_group(
    key: Tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """One content-hash group, one micro-batch: fold the batch slice into the
    (keep_id, n_seen) state and emit the per-doc decisions."""
    content_hash = key[0]
    keep_id, n_seen = state.get if state.exists else (None, 0)
    # concatenate the group's chunks: the min-id tie-break is over the WHOLE
    # micro-batch slice (groups are per-content-hash — a handful of rows).
    # The chunk iterator is EMPTY when Spark invokes the function for a
    # timed-out key (no data this batch) — unreachable under NoTimeout, but
    # the event-time-timeout deployment the module docstring recommends
    # hits it every batch, and pd.concat([]) raises
    chunks = list(pdfs)
    batch = (
        pd.concat(chunks, ignore_index=True)
        if chunks
        else pd.DataFrame({"doc_id": pd.Series([], dtype=object)})
    )
    if not batch.empty:
        ids = batch["doc_id"]
        first_batch = n_seen == 0
        if keep_id is None:
            keep_id = ids.min()  # deterministic intra-batch tie-break
        yield pd.DataFrame(
            {
                "doc_id": ids,
                "content_hash": content_hash,
                "keep": (ids == keep_id) & first_batch,
                "keep_id": keep_id,
            }
        )
        n_seen += len(ids)
    state.update((keep_id, n_seen))


def streaming_exact_dedup(
    stream_docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Continuous exact dedup of a streaming docs table.

    Input: a *streaming* DataFrame with (id_col, text_col). Output stream:
    (doc_id, content_hash, keep, keep_id) in append mode — one row per
    arriving doc, decided at arrival (see module contract).

    Plan shape: md5-normalize map-side (same expression as the batch
    operator, so batch and stream agree on hashes bit-for-bit) -> groupBy
    content_hash (the one shuffle; uniform keys) -> keyed state update.
    ``GroupStateTimeout.NoTimeout``: dedup state is append-only by design —
    a production deployment with a retention SLA swaps in event-time timeout
    to age out hashes not seen within the watermark.
    """
    hashed = stream_docs.select(
        F.col(id_col).cast("string").alias("doc_id"),
        F.md5(tk.normalize(text_col)).alias("content_hash"),
    )
    return hashed.groupBy("content_hash").applyInPandasWithState(
        _dedup_group,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_streaming_exact_dedup(
    spark, input_dir: str, work_dir: str, schema, text_expr=None
) -> DataFrame:
    """Drive a docs-parquet directory through the stateful dedup and return
    the materialized decisions (synchronous ``availableNow`` trigger — the
    local smoke path; production swaps the file source for Kafka and the
    parquet sink for Iceberg append, same logical plan).

    ``text_expr``: optional Column producing the text to hash (defaults to
    the ``text`` column; pass ``agg_text("spans")`` for span docs).
    """
    import os

    out_dir = os.path.join(work_dir, "decisions")
    ckpt_dir = os.path.join(work_dir, "ckpt")
    stream = spark.readStream.schema(schema).parquet(input_dir)
    if text_expr is not None:
        stream = stream.select("doc_id", text_expr.alias("text"))
    q = (
        streaming_exact_dedup(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if not os.path.isdir(out_dir):
        # zero micro-batches ran (empty input dir, or a re-run where every
        # file is already checkpointed): the parquet sink never created the
        # output path — return an empty decisions frame instead of letting
        # the read raise "Path does not exist"
        return spark.createDataFrame([], OUT_SCHEMA)
    # explicit schema: a zero-row run leaves out_dir holding only stream
    # metadata (no data files), where schema inference would raise
    return spark.read.schema(OUT_SCHEMA).parquet(out_dir)
