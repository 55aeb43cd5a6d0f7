"""Multimodal column plumbing (brief requirement).

Image/audio/video payloads are opaque ``binary`` columns with typed metadata;
decode / feature-extract / resize / frame-sample run as Arrow-batched
pandas UDFs over ``mapInPandas``. The decode step is STUBBED — the container
has no image/audio libs — behind ``decode_backend='fake'`` which produces a
deterministic hash-derived feature vector; ``decode_backend='real'`` raises
``NotImplementedError`` where a PIL/ffmpeg call would go. The Spark-side
plumbing (schema, partitioning, UDF signature, Arrow batch shape) is real
and tested.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("media_type", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

FEATURE_DIM = 64


def media_refs_from_docs(docs: DataFrame) -> DataFrame:
    """Extract the media-span references from the canonical docs table."""
    return (
        docs.select(F.explode("spans").alias("s"))
        .where(F.col("s.kind") == "media")
        .select(F.col("s.media_ref").alias("media_ref"))
        .distinct()
    )


def synthesize_media_table(refs: DataFrame) -> DataFrame:
    """Deterministic fake media rows for plumbing tests: payload bytes derive
    from the ref string (pure function — no external data)."""
    return refs.select(
        "media_ref",
        F.lit("image").alias("media_type"),
        F.encode(F.repeat(F.md5(F.col("media_ref")), 4), "utf-8").alias("payload"),
        F.lit(32).alias("width"),
        F.lit(32).alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )


def _fake_features(payload: bytes, dim: int) -> list[float]:
    """Deterministic stand-in for a real encoder: feature[i] = (first 10 hex
    chars of md5(payload || ':' || i) as int) / 2^40, in [0, 1).

    One exact integer-to-double division per element — the DuckDB oracle
    recomputes the identical doubles from the same md5 formula, so the
    multimodal plumbing gets a real value-level correctness check instead of
    a rows-only count.
    """
    import hashlib

    p = payload or b""
    return [
        int(hashlib.md5(p + b":" + str(i).encode()).hexdigest()[:10], 16) / 2**40
        for i in range(dim)
    ]


def extract_features(
    media: DataFrame, decode_backend: str = "fake", dim: int = FEATURE_DIM
) -> DataFrame:
    """Decode + feature-extract as a mapInPandas operator.

    Output: (media_ref, media_type, feature array<double>).
    Batch shape: whole Arrow record batches stream through; payload bytes
    never materialize on the driver.
    """
    if decode_backend not in ("fake", "real"):
        raise ValueError("decode_backend must be 'fake' or 'real'")

    out_schema = T.StructType(
        [
            T.StructField("media_ref", T.StringType()),
            T.StructField("media_type", T.StringType()),
            T.StructField("feature", T.ArrayType(T.DoubleType())),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if decode_backend == "real":
                # real decoder (PIL.Image.open / soundfile / pyav) would go here
                raise NotImplementedError(
                    "real media decoding requires image/audio libs not present "
                    "in this environment; use decode_backend='fake'"
                )
            feats = [_fake_features(p, dim) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "media_type": pdf["media_type"],
                    "feature": feats,
                }
            )

    return media.mapInPandas(batches, out_schema)


def resize_images(media: DataFrame, width: int, height: int, decode_backend: str = "fake") -> DataFrame:
    """Resize plumbing: passes payloads through the same mapInPandas shape;
    fake backend rewrites the metadata only (a real backend would re-encode)."""
    if decode_backend == "real":
        raise NotImplementedError("real image resize requires PIL; use 'fake'")
    return media.withColumn("width", F.lit(width)).withColumn("height", F.lit(height))


def sample_frames(media: DataFrame, every_ms: int = 1000, decode_backend: str = "fake") -> DataFrame:
    """Frame-sampling plumbing for video rows: emits one row per sampled
    timestamp with a deterministic fake frame ref."""
    if decode_backend == "real":
        raise NotImplementedError("real frame sampling requires pyav/ffmpeg; use 'fake'")
    frames = media.where(F.col("media_type") == "video").select(
        "media_ref",
        F.explode(
            F.sequence(F.lit(0), F.greatest((F.col("duration_ms") / every_ms).cast("long") - 1, F.lit(0)))
        ).alias("frame_idx"),
    )
    return frames.select(
        "media_ref",
        "frame_idx",
        F.concat(F.col("media_ref"), F.lit("#f"), F.col("frame_idx")).alias("frame_ref"),
    )
