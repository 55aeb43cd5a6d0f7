"""Stateful streaming dedup (streaming/stateful.py — applyInPandasWithState).

Contract under test: decide-at-arrival exact dedup whose drop set matches
the batch operator when docs arrive in ascending doc_id order, with keyed
state carried across micro-batches.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from continuousfilteringbenchmark_spark.operators.dedup import exact_duplicates


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


ROWS = [
    ("d01", "The Quick brown fox  "),
    ("d02", "the quick BROWN fox"),  # dup of d01 after normalize (lower+trim)
    ("d03", "something else entirely"),
    ("d04", "THE QUICK BROWN FOX"),  # dup of d01
    ("d05", "something ELSE entirely"),  # dup of d03
    ("d06", "unique snowflake"),
]


def test_streaming_dedup_single_batch_equals_batch_operator(spark, tmp_path):
    from continuousfilteringbenchmark_spark.streaming.stateful import (
        run_streaming_exact_dedup,
    )

    input_dir = str(tmp_path / "in")
    _docs(spark, ROWS).coalesce(1).write.parquet(input_dir)
    got = run_streaming_exact_dedup(
        spark, input_dir, str(tmp_path / "run"), schema="doc_id string, text string"
    )
    want = exact_duplicates(_docs(spark, ROWS))
    g = {(r.doc_id, r.keep, r.keep_id) for r in got.collect()}
    # single micro-batch + ascending ids: keep == (doc_id == keep_id), and
    # content hashes / keeper choice agree with the batch operator exactly
    w = {(r.doc_id, r.doc_id == r.keep_id, r.keep_id) for r in want.collect()}
    assert g == w
    gh = {(r.doc_id, r.content_hash) for r in got.collect()}
    wh = {(r.doc_id, r.content_hash) for r in want.collect()}
    assert gh == wh


def test_streaming_dedup_empty_input_returns_empty_frame(spark, tmp_path):
    """Zero micro-batches (empty input dir) must yield an empty decisions
    frame with the contract schema, not a 'Path does not exist' read error."""
    from continuousfilteringbenchmark_spark.streaming.stateful import (
        OUT_SCHEMA,
        run_streaming_exact_dedup,
    )

    input_dir = str(tmp_path / "in")
    import os

    os.makedirs(input_dir)
    got = run_streaming_exact_dedup(
        spark, input_dir, str(tmp_path / "run"), schema="doc_id string, text string"
    )
    assert got.count() == 0
    assert got.schema == OUT_SCHEMA


def test_streaming_dedup_state_survives_across_batches(spark, tmp_path):
    """Second micro-batch sees the first batch's state: a re-arriving hash is
    dropped with keep_id pointing at the FIRST-SEEN keeper."""
    from continuousfilteringbenchmark_spark.streaming.stateful import (
        run_streaming_exact_dedup,
    )

    input_dir = str(tmp_path / "in")
    work_dir = str(tmp_path / "run")
    schema = "doc_id string, text string"
    _docs(spark, ROWS[:3]).coalesce(1).write.mode("append").parquet(input_dir)
    first = run_streaming_exact_dedup(spark, input_dir, work_dir, schema=schema)
    assert {(r.doc_id, r.keep) for r in first.collect()} == {
        ("d01", True),
        ("d02", False),
        ("d03", True),
    }
    # append the rest; availableNow resumes from the checkpoint -> only the
    # new file is processed, against the carried state
    _docs(spark, ROWS[3:]).coalesce(1).write.mode("append").parquet(input_dir)
    both = run_streaming_exact_dedup(spark, input_dir, work_dir, schema=schema)
    decisions = {r.doc_id: (r.keep, r.keep_id) for r in both.collect()}
    assert len(decisions) == 6
    assert decisions["d04"] == (False, "d01")
    assert decisions["d05"] == (False, "d03")
    assert decisions["d06"] == (True, "d06")


def test_dedup_group_udf_tiebreak_and_chunks():
    """The state-update function itself: chunked group input folds into ONE
    whole-slice min-id tie-break; a later batch never re-keeps."""
    from continuousfilteringbenchmark_spark.streaming.stateful import _dedup_group

    class FakeState:
        def __init__(self):
            self.exists = False
            self._v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v
            self.exists = True

    st = FakeState()
    chunks = [pd.DataFrame({"doc_id": ["b2"]}), pd.DataFrame({"doc_id": ["a1"]})]
    out = pd.concat(list(_dedup_group(("h",), chunks, st)), ignore_index=True)
    assert st._v == ("a1", 2)
    assert set(zip(out.doc_id, out.keep)) == {("a1", True), ("b2", False)}
    out2 = pd.concat(
        list(_dedup_group(("h",), [pd.DataFrame({"doc_id": ["a0"]})], st)),
        ignore_index=True,
    )
    # state keeper is sticky: an even-smaller later id is still a duplicate
    assert st._v == ("a1", 3)
    assert list(zip(out2.doc_id, out2.keep, out2.keep_id)) == [("a0", False, "a1")]


# ---------------------------------------------------------------- windows


def _write_stream_file(spark, rows, schema, input_dir, i):
    """One parquet FILE per micro-batch, mtime-ordered (the file source with
    maxFilesPerTrigger=1 + latestFirst=false replays oldest-mtime first)."""
    from continuousfilteringbenchmark_spark.streaming.staging import stage_microbatch

    stage_microbatch(spark.createDataFrame(rows, schema), str(input_dir), i)


def test_windowed_ingest_watermark_drops_late_rows(spark, tmp_path):
    """Watermark contract end-to-end: a row arriving after the watermark
    passed its window is DROPPED (the emitted window equals the batch agg
    over the on-time rows only), and every closed window is emitted exactly
    once in append mode."""
    import os
    from datetime import datetime, timedelta

    from continuousfilteringbenchmark_spark.streaming.windows import (
        run_windowed_ingest,
        windowed_ingest_stats,
    )

    base = datetime(2026, 1, 1, 10, 0, 0)
    t = lambda m: base + timedelta(minutes=m)  # noqa: E731
    schema = "event_time timestamp, text string"
    input_dir = tmp_path / "in"
    os.makedirs(input_dir)
    # batch 1: two docs in [10:00,10:05), one in [10:05,10:10); max 10:09
    _write_stream_file(spark, [(t(1), "the fox"), (t(2), "the dog"), (t(9), "the cat")],
                       schema, input_dir, 1)
    # batch 2 runs with watermark 10:09 - 2min = 10:07: it EVICTS+EMITS the
    # [10:00,10:05) window (end 10:05 <= 10:07) and advances max to 10:20
    _write_stream_file(spark, [(t(20), "flush one the")], schema, input_dir, 2)
    # batch 3: a 10:01 arrival AFTER its window was finalized in batch 2 —
    # the late-data contract requires it be DROPPED, not re-opened (a
    # re-open would append a second [10:00,10:05) output row in a later
    # batch, which the exactly-once assertion below would catch). Note the
    # finalize-then-drop order matters: a row late by the current watermark
    # whose window is evicted in the SAME batch still counts (state-eviction
    # semantics), which is why this file arrives one batch later.
    _write_stream_file(spark, [(t(1), "late the row")], schema, input_dir, 3)
    # two far-future sentinels: the first advances event-time max, the
    # second's batch runs with that watermark and flushes all data windows
    _write_stream_file(spark, [(t(60), "s1")], schema, input_dir, 4)
    _write_stream_file(spark, [(t(90), "s2")], schema, input_dir, 5)

    out = run_windowed_ingest(
        spark, str(input_dir), str(tmp_path / "work"), schema,
        window_duration="5 minutes", watermark_delay="2 minutes",
    )
    cutoff = int(t(30).timestamp())
    rows = out.where(F.col("window_start") < cutoff).collect()
    # exactly-once: one output row per closed window (a late-row re-open
    # would have appended a duplicate [10:00,10:05) row)
    assert len(rows) == len({r.window_start for r in rows})
    got = {r.window_start: (r.n_docs, r.n_en, r.sum_chars) for r in rows}
    w = lambda m: int(t(m).timestamp())  # noqa: E731
    # [10:00,10:05) has n_docs=2 — the late 10:01 row is NOT counted
    assert got == {
        w(0): (2, 2, 14),
        w(5): (1, 1, 7),
        w(20): (1, 1, 13),
    }
    # parity: streaming output == the batch agg over the on-time rows
    on_time = spark.createDataFrame(
        [(t(1), "the fox"), (t(2), "the dog"), (t(9), "the cat"), (t(20), "flush one the")],
        schema,
    )
    batch = {
        r.window_start: (r.n_docs, r.n_en, r.sum_chars)
        for r in windowed_ingest_stats(on_time).collect()
    }
    assert batch == got
