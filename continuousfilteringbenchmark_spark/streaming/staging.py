"""Micro-batch file staging for the parquet-directory streaming sources.

The streaming queries/tests replay a corpus as arrival-ordered micro-batch
files. Spark's file source orders same-trigger files by modification time,
so each batch file gets a DETERMINISTIC mtime (epoch 1e9 + batch index) —
arrival order is then the batch index, independent of how long each write
took. One file per batch (``coalesce(1)``) keeps one trigger == one batch
under ``maxFilesPerTrigger=1``.
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

from pyspark.sql import DataFrame

_MTIME_BASE = 1_000_000_000


def stage_microbatch(df: DataFrame, input_dir: str, i: int) -> str:
    """Write ``df`` as the single parquet file ``input_dir/b{i:03d}.parquet``
    with mtime ``1e9 + i``; returns the file path. ``i`` is the 1-based
    arrival index."""
    stage = tempfile.mkdtemp(prefix=f"_stage{i}_", dir=input_dir)
    try:
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        dst = os.path.join(input_dir, f"b{i:03d}.parquet")
        shutil.copy(part, dst)
        os.utime(dst, (_MTIME_BASE + i,) * 2)
    finally:
        shutil.rmtree(stage, ignore_errors=True)
    return dst
