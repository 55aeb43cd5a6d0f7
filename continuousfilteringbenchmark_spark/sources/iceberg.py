"""Iceberg catalog integration (north rule: Iceberg materialization,
snapshot-based resumability).

The runtime jar is NOT in this container (SURVEY.md risk #7), so everything
is gated behind a capability probe; the parquet stage-store in
plans/stages.py is the tested fallback that preserves the same contract
(stage tables + metrics rows + resume-from-last-committed-stage).

Production config (spark-submit)::

    --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver>
    --conf spark.sql.catalog.er=org.apache.iceberg.spark.SparkCatalog
    --conf spark.sql.catalog.er.type=hadoop
    --conf spark.sql.catalog.er.warehouse=<path>

Layout decisions (SURVEY.md §4.3): ``docs`` partitioned by
``bucket(N, doc_id)``; blocking stages written partitioned by
``bucket(block_key)`` so stage resume aligns with the shuffle layout;
every stage commit appends per-partition metric rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

CATALOG = "er"


def iceberg_available(spark: SparkSession) -> bool:
    """Probe for the Iceberg runtime + a configured catalog."""
    try:
        jvm = spark.sparkContext._jvm
        jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
    except Exception:
        return False
    return spark.conf.get(f"spark.sql.catalog.{CATALOG}", None) is not None


def write_iceberg_stage(
    df: DataFrame, table: str, mode: str = "overwrite", partition_by: list[str] | None = None
) -> None:
    """Commit a stage as an Iceberg snapshot (caller must have probed
    ``iceberg_available``)."""
    writer = df.writeTo(f"{CATALOG}.{table}")
    if partition_by:
        from pyspark.sql import functions as F

        writer = writer.partitionedBy(*[F.bucket(32, c) for c in partition_by])
    if mode == "overwrite":
        writer.createOrReplace()
    else:
        writer.append()


def last_snapshot_id(spark: SparkSession, table: str) -> str | None:
    rows = spark.sql(
        f"SELECT snapshot_id FROM {CATALOG}.{table}.snapshots ORDER BY committed_at DESC LIMIT 1"
    ).collect()
    return str(rows[0][0]) if rows else None
