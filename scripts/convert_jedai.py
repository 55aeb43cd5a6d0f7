"""Convert the reference's Java-serialized JedAI datasets to parquet.

The benchmark's real datasets ship as ``ObjectOutputStream`` files
(``List<EntityProfile>`` entities, ``Set<IdDuplicates>`` ground truth —
read by the drivers at ``blockingWorkflowsL1L2L3/src/l1/TokenBlocking.java:
52-62``). This CLI stages them to parquet with the engine's interleaved
span schema using the pure-Python stream parser in
``continuousfilteringbenchmark_spark/sources/javaser.py`` — no JVM, no
jedai jar needed.

Usage:
    python scripts/convert_jedai.py profiles <in.ser> <out.parquet>
    python scripts/convert_jedai.py gt       <in.ser> <out.parquet>

Profiles convert in one sequential pass (the stream format cannot be
split), batched through pyarrow so peak memory is one batch; everything
downstream reads the parquet distributed.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from continuousfilteringbenchmark_spark.sources import javaser


def main() -> None:
    if len(sys.argv) != 4 or sys.argv[1] not in ("profiles", "gt"):
        sys.stderr.write(__doc__ or "")
        raise SystemExit(2)
    kind, src, dst = sys.argv[1:4]
    if kind == "profiles":
        n = javaser.profiles_to_parquet(src, dst)
        print(f"wrote {n} profiles -> {dst}")
    else:
        import pyarrow as pa
        import pyarrow.parquet as pq

        rows = javaser.read_gt_file(src)
        t = pa.table(
            {
                "left_id": pa.array([a for a, _ in rows], pa.int32()),
                "right_id": pa.array([b for _, b in rows], pa.int32()),
            }
        )
        pq.write_table(t, dst)
        print(f"wrote {len(rows)} gt pairs -> {dst}")


if __name__ == "__main__":
    main()
