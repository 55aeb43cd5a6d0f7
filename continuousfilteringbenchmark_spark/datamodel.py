"""Canonical data model: interleaved text+media documents.

The engine's input shape (``BASELINE.json -> input_hint``)::

    docs(
      doc_id string,
      spans  array<struct<kind:string, text:string, media_ref:string, offset:int>>
    )

This mirrors the reference's schema-less EntityProfile attribute bag
(``/root/reference/blockingWorkflows/src/Utilities/ProfileProcessing.java:14-28``):
``kind`` plays the attribute *name*, ``text`` the *value*; ``media_ref`` spans
are opaque payload that must survive every shuffle untouched (the per-row
span-sequence invariant).

Also provides the schema-agnostic / schema-based projections
(reference: ``joins/src/utilities/RepresentationModel.java:16-22`` tab-joins
all values; ``ProfileProcessing.reduceProfilesToAttribute`` keeps one
attribute) and the span-invariant hash used by tests.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

SPAN_TYPE = T.StructType(
    [
        T.StructField("kind", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("offset", T.IntegerType()),
    ]
)

DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("spans", T.ArrayType(SPAN_TYPE), False),
    ]
)


def agg_text(spans: Column | str = "spans", sep: str = " ") -> Column:
    """Schema-agnostic "Ag.Value": concat of all text spans in offset order.

    Parity: ``RepresentationModel.getAttributeValue`` (tab-joined concat of all
    attribute values, reference ``joins/src/utilities/RepresentationModel.java:16-22``);
    we filter to text spans (media spans carry no text) and join in span order.
    """
    spans = F.col(spans) if isinstance(spans, str) else spans
    ordered = F.array_sort(
        spans, lambda a, b: F.when(a["offset"] < b["offset"], -1).when(a["offset"] > b["offset"], 1).otherwise(0)
    )
    texts = F.filter(ordered, lambda s: s["text"].isNotNull() & (s["text"] != F.lit("")))
    return F.array_join(F.transform(texts, lambda s: s["text"]), sep)


def project_kind(spans: Column | str, kind: str) -> Column:
    """Schema-based projection: concat only spans of one kind.

    Parity: ``ProfileProcessing.reduceProfilesToAttribute``
    (``blockingWorkflows/src/Utilities/ProfileProcessing.java:14-28``).
    """
    spans = F.col(spans) if isinstance(spans, str) else spans
    keep = F.filter(spans, lambda s: (s["kind"] == F.lit(kind)) & s["text"].isNotNull())
    return F.array_join(F.transform(keep, lambda s: s["text"]), " ")


def span_invariant_hash(spans: Column | str = "spans") -> Column:
    """Deterministic per-row hash of the ordered span sequence
    ``(kind, text, media_ref, order)`` — equality before/after a pipeline stage
    proves the shuffle preserved the interleaved structure (north-rule invariant).
    """
    spans = F.col(spans) if isinstance(spans, str) else spans
    ordered = F.array_sort(
        spans, lambda a, b: F.when(a["offset"] < b["offset"], -1).when(a["offset"] > b["offset"], 1).otherwise(0)
    )
    parts = F.transform(
        ordered,
        lambda s: F.concat_ws(
            "\x1f",
            F.coalesce(s["kind"], F.lit("\x01")),
            F.coalesce(s["text"], F.lit("\x01")),
            F.coalesce(s["media_ref"], F.lit("\x01")),
            F.coalesce(s["offset"].cast("string"), F.lit("\x01")),
        ),
    )
    return F.md5(F.array_join(parts, ""))


def documents_to_docs(documents: DataFrame, n_title_words: int = 6) -> DataFrame:
    """Deterministically lift the flat synthetic ``documents`` table
    (doc_id, text, lang, source, n_chars) into the canonical interleaved
    ``docs`` shape: a ``title`` span (first ``n_title_words`` words), a
    ``body`` span (rest), and a ``media`` span for every third doc.

    Pure function of the input — used so driver-provided parquet can feed the
    span-typed operators and the DuckDB oracle can re-derive the same table.
    """
    words = F.split(F.col("text"), " ")
    title = F.array_join(F.slice(words, 1, n_title_words), " ")
    body = F.when(
        F.size(words) > n_title_words,
        F.array_join(F.slice(words, n_title_words + 1, 1 << 20), " "),
    ).otherwise(F.lit(""))
    media = F.concat(F.lit("ref://img/"), F.col("doc_id").cast("string"))
    spans = F.when(
        F.col("doc_id") % 3 == 0,
        F.array(
            F.struct(
                F.lit("title").alias("kind"),
                title.alias("text"),
                F.lit(None).cast("string").alias("media_ref"),
                F.lit(0).alias("offset"),
            ),
            F.struct(
                F.lit("media").alias("kind"),
                F.lit(None).cast("string").alias("text"),
                media.alias("media_ref"),
                F.lit(1).alias("offset"),
            ),
            F.struct(
                F.lit("body").alias("kind"),
                body.alias("text"),
                F.lit(None).cast("string").alias("media_ref"),
                F.lit(2).alias("offset"),
            ),
        ),
    ).otherwise(
        F.array(
            F.struct(
                F.lit("title").alias("kind"),
                title.alias("text"),
                F.lit(None).cast("string").alias("media_ref"),
                F.lit(0).alias("offset"),
            ),
            F.struct(
                F.lit("body").alias("kind"),
                body.alias("text"),
                F.lit(None).cast("string").alias("media_ref"),
                F.lit(1).alias("offset"),
            ),
        )
    )
    return documents.select(F.col("doc_id").cast("string").alias("doc_id"), spans.alias("spans"))
