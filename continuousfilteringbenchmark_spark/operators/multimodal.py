"""Multimodal column plumbing (brief requirement).

Image/audio/video payloads are opaque ``binary`` columns with typed metadata;
decode / feature-extract / resize / frame-sample run as Arrow-batched
pandas UDFs over ``mapInPandas``.

Decode backends (graceful degradation — the engine ships the real branch,
the environment decides whether it runs):

* ``'fake'``  — deterministic md5-derived feature vector; pure function of
  the payload, replayed exactly by the DuckDB oracle (the value-level
  correctness check of the plumbing).
* ``'real'``  — PIL-based decode (``Image.open`` -> grayscale 8x8 ->
  normalized pixel vector). Raises ``ModuleNotFoundError`` with a clear
  message when PIL is absent (this container has no image libs).
  Undecodable payloads yield ``feature = NULL`` (extract) / pass through
  untouched (resize) instead of failing the task — one corrupt blob must
  not kill a corpus-scale decode job.
* ``'auto'``  — probe for PIL at call time: real when importable, else
  fall back to 'fake' with a one-time warning.

The Spark-side plumbing (schema, partitioning, UDF signature, Arrow batch
shape) is identical across backends and is what the tests certify; the
real branch is exercised by a unit test that injects a PIL stub
(``tests/test_new_ops.py``).
"""

from __future__ import annotations

import warnings
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


def _pil_image_module():
    """Import probe for the real decoder; returns the PIL.Image module or
    None. Isolated so tests can monkeypatch a stub in."""
    try:
        from PIL import Image  # type: ignore

        return Image
    except ImportError:
        return None


def _shippable_image_mod(backend: str):
    """The PIL.Image handle to capture in a task closure, or None when the
    workers must import it themselves. A real module pickles by NAME
    reference (workers re-import it — shipping it buys nothing and a
    missing worker-side pillow would fail at task DEserialization, before
    any of our code runs); a non-module stand-in (test stub) pickles by
    value and is shipped as-is so driver-side monkeypatching reaches the
    workers."""
    import types

    if backend != "real":
        return None
    mod = _pil_image_module()
    return None if isinstance(mod, types.ModuleType) else mod


def _worker_pil(what: str):
    """Worker-side PIL.Image import with an actionable error (called inside
    mapInPandas when the driver resolved backend='real' from a real module)."""
    try:
        from PIL import Image  # type: ignore

        return Image
    except ImportError as ex:
        raise RuntimeError(
            f"{what}: decode_backend='real' needs PIL (pillow) importable on "
            "every executor — install pillow cluster-wide or use "
            "decode_backend='fake'/'auto'"
        ) from ex


def _resolve_backend(decode_backend: str, what: str) -> str:
    """'auto' -> 'real' when PIL imports, else 'fake' (one warning)."""
    if decode_backend not in ("fake", "real", "auto"):
        raise ValueError("decode_backend must be 'fake', 'real' or 'auto'")
    if decode_backend == "auto":
        if _pil_image_module() is not None:
            return "real"
        warnings.warn(
            f"{what}: PIL not importable — falling back to the deterministic "
            "'fake' decode backend",
            RuntimeWarning,
            stacklevel=3,
        )
        return "fake"
    if decode_backend == "real" and _pil_image_module() is None:
        raise ModuleNotFoundError(
            f"{what}: decode_backend='real' needs PIL (pillow), which is not "
            "installed in this environment; use 'fake' or 'auto'"
        )
    return decode_backend


def _real_features(payload: bytes, dim: int, image_mod) -> list[float] | None:
    """PIL decode -> grayscale 8x8 thumbnail -> normalized pixel vector,
    zero-padded / truncated to ``dim``.

    Returns ``None`` for payloads PIL cannot decode (corrupt bytes,
    non-image blobs) instead of failing the task: at corpus scale a single
    bad payload must not kill a 10^9-row decode job — downstream filters
    on ``feature IS NULL`` pick up the rejects."""
    import io

    import numpy as np

    try:
        img = image_mod.open(io.BytesIO(payload or b""))
        px = (
            np.asarray(img.convert("L").resize((8, 8)), dtype=np.float64).ravel()
            / 255.0
        )
    except Exception:
        return None
    out = np.zeros(dim, dtype=np.float64)
    n = min(dim, px.size)
    out[:n] = px[:n]
    return out.tolist()


def extract_features(
    media: DataFrame, decode_backend: str = "auto", dim: int = FEATURE_DIM
) -> DataFrame:
    """Decode + feature-extract as a mapInPandas operator.

    Output: (media_ref, media_type, feature array<double>); with the real
    backend, feature is NULL for payloads PIL cannot decode.
    Batch shape: whole Arrow record batches stream through; payload bytes
    never materialize on the driver. Backend resolution (PIL probe /
    fallback warning) happens once, driver-side, at plan construction —
    but the real PIL MODULE cannot ride the task closure (cloudpickle
    serializes modules by import-name reference), so with backend='real'
    each python worker re-imports PIL locally; executors without pillow
    get a RuntimeError naming the fix rather than an opaque
    deserialization failure. Non-module stands-ins (test stubs) pickle by
    value and are shipped as-is.
    """
    backend = _resolve_backend(decode_backend, "extract_features")
    image_mod = _shippable_image_mod(backend)

    out_schema = T.StructType(
        [
            T.StructField("media_ref", T.StringType()),
            T.StructField("media_type", T.StringType()),
            T.StructField("feature", T.ArrayType(T.DoubleType())),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if backend == "real":
            mod = image_mod if image_mod is not None else _worker_pil("extract_features")
            decode = lambda p, d: _real_features(p, d, mod)  # noqa: E731
        else:
            decode = _fake_features
        for pdf in it:
            feats = [decode(p, dim) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "media_type": pdf["media_type"],
                    "feature": feats,
                }
            )

    return media.mapInPandas(batches, out_schema)


def resize_images(media: DataFrame, width: int, height: int, decode_backend: str = "auto") -> DataFrame:
    """Resize: the real backend re-encodes payloads through PIL inside a
    mapInPandas batch; the fake backend rewrites the metadata only."""
    backend = _resolve_backend(decode_backend, "resize_images")
    if backend == "real":
        shipped = _shippable_image_mod(backend)  # stub by value, module by worker import

        def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            import io

            image_mod = shipped if shipped is not None else _worker_pil("resize_images")
            for pdf in it:
                out, widths, heights = [], [], []
                for p, w0, h0 in zip(pdf["payload"], pdf["width"], pdf["height"]):
                    try:
                        src = image_mod.open(io.BytesIO(p or b""))
                        # .format is only set by open(); resize() returns a new
                        # Image with format=None, so capture it BEFORE resizing
                        # or every payload silently re-encodes as PNG
                        fmt = getattr(src, "format", None) or "PNG"
                        buf = io.BytesIO()
                        src.resize((width, height)).save(buf, format=fmt)
                        out.append(buf.getvalue())
                        widths.append(width)
                        heights.append(height)
                    except Exception:
                        # undecodable payload: pass through untouched with its
                        # original metadata rather than killing the task
                        out.append(p)
                        widths.append(w0)
                        heights.append(h0)
                pdf = pdf.copy()
                pdf["payload"] = out
                pdf["width"] = widths
                pdf["height"] = heights
                yield pdf

        return media.mapInPandas(batches, media.schema)
    return media.withColumn("width", F.lit(width)).withColumn("height", F.lit(height))


def sample_frames(media: DataFrame, every_ms: int = 1000, decode_backend: str = "fake") -> DataFrame:
    """Frame-sampling plumbing for video rows: emits one row per sampled
    timestamp with a deterministic fake frame ref. No 'auto' here: real
    frame extraction needs pyav/ffmpeg, which has no light fallback."""
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
