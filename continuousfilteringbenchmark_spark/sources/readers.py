"""Sources / sinks (SURVEY.md §2.1, S1-S6).

The reference's three physical input shapes re-expressed for Spark:

* S1/S2 Java-serialized EntityProfile/IdDuplicates lists -> parsed
  NATIVELY (no JVM) by ``sources/javaser.py``'s serialization-stream
  decoder into the canonical ``docs`` / ``gold_pairs`` tables, staged once
  to parquet (or Iceberg when the runtime jar is present — see
  sources/iceberg.py) for distributed reads.
* S3 ``%``-delimited embedding CSV (``nnmethods/faiss/D4sa.py:17-73``):
  stringified float vectors parsed natively, empty-vector rows dropped with
  id bookkeeping (the reference tracks dropped ids manually — here it's a
  filter + anti-join).
* S4 ``|``-delimited synthetic Dirty-ER CSV
  (``nnmethods/scalabilityAnalysis/MH_LSH.py:154-170``).
* S6 metrics sink: append-mode parquet/Iceberg table (plans/stages.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_parquet_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def read_embedding_csv(
    spark: SparkSession,
    path: str,
    sep: str = "%",
    id_col: str = "Id",
    vec_col: str = "Embedded",
) -> tuple[DataFrame, DataFrame]:
    """S3: parse stringified float vectors; returns (clean_rows, dropped_ids).

    Reference parity: ``faiss/D4sa.py:17-73`` drops rows with empty/invalid
    vectors and tracks their ids for ground-truth remapping.
    """
    raw = spark.read.csv(path, sep=sep, header=True)
    parsed = raw.withColumn(
        "vec",
        F.transform(
            F.split(F.regexp_replace(F.col(vec_col), r"[\[\]]", ""), r"[,\s]+"),
            lambda x: x.try_cast("double"),
        ),
    )
    parsed = parsed.withColumn(
        "vec", F.filter(F.col("vec"), lambda x: x.isNotNull())
    )
    clean = parsed.where(F.size("vec") > 0)
    dropped = parsed.where(F.size("vec") <= 0).select(F.col(id_col).alias("dropped_id"))
    return clean, dropped


def read_dirty_er_csv(
    spark: SparkSession, full_path: str, duplicates_path: str, sep: str = "|"
) -> tuple[DataFrame, DataFrame]:
    """S4: synthetic Dirty-ER pair of CSVs (``<N>full.csv`` with Id +
    aggregate value; ``<N>duplicates.csv`` with Entity1|Entity2)."""
    docs = (
        spark.read.csv(full_path, sep=sep, header=True)
        .select(F.col("Id").alias("doc_id"), F.col("`Clean Ag.Value`").alias("text"))
    )
    gold = (
        spark.read.csv(duplicates_path, sep=sep, header=True)
        .select(
            F.least("Entity1", "Entity2").alias("left_id"),
            F.greatest("Entity1", "Entity2").alias("right_id"),
        )
        .distinct()
    )
    return docs, gold


def write_stage(df: DataFrame, path: str, mode: str = "overwrite", partition_by: list[str] | None = None) -> None:
    """Materialize a pipeline stage as parquet (Iceberg commit when available)."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)
