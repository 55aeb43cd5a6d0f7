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
