"""Composed training-data curation job: ONE keep/drop decision table over a
document corpus (brief requirement: the operations a large-scale
training-data pipeline needs, run as first-class jobs).

This is the canonical 100 TB pre-training curation chain, each stage an
already-oracle-verified engine operator:

1. **exact dedup**      — md5 of normalized text, keep min doc_id per hash
   (``operators/dedup.exact_duplicates``; one shuffle on a uniform key).
2. **near-dup dedup**   — MinHash-LSH banded candidates + exact-Jaccard
   verify over the exact-dedup survivors, transitive closure via
   large-star/small-star connected components, keep min doc_id per
   component (``minhash_near_duplicates`` + ``dedup_assignments``;
   sub-quadratic banding, O(log^2) CC rounds).
3. **language filter**  — marker-lexicon language id
   (``functions/text.language_id``; pure codegen, no Python).
4. **quality filter**   — composite quality score threshold
   (``functions/text.quality_score``; pure codegen).

Reason precedence (first failing stage wins): ``exact_dup`` > ``near_dup``
> ``lang`` > ``low_quality`` > ``ok``; ``keep`` is ``reason = 'ok'``.
``rep_id`` is the doc this row collapses to under the dedup chain: an exact
duplicate points at its hash-keeper's NEAR-DUP group representative (the
chain is transitive), a near-dup at its component minimum, everything else
at itself — so ``SELECT ... WHERE keep`` plus ``rep_id`` lineage is enough
to rebuild provenance of every dropped row.

Scale shape: stages 3-4 are embarrassingly parallel scans; stage 1 is one
hash shuffle; stage 2 is the banded-LSH plan (never all-pairs). The one
skew hazard is ``keep_id`` in the rep join — a mega-duplicate group makes
one key hot; AQE skew-join splitting (on in ``session.get_spark``) covers
it, the same guard the blocking stages rely on.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as X
from ..operators.dedup import (
    dedup_assignments,
    exact_duplicates,
    minhash_near_duplicates,
)


def curate_corpus(
    docs: DataFrame,
    allowed_langs: Sequence[str] = ("en",),
    min_quality: float = 0.0,
    minhash_threshold: float = 0.7,
    ngram: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Full curation decision table.

    Input:  any table with (id_col, text_col).
    Output: (doc_id, keep boolean, reason string, rep_id, lang_pred,
            quality) — exactly one row per input doc.
    """
    # ex feeds both the survivor semi-join and the final rep chain; surv
    # feeds minhash banding AND the assignment node set — persist both for
    # the session (freed by session.clear_session_caches, the same contract
    # as the other reused pipeline stages)
    ex = exact_duplicates(docs, text_col=text_col, id_col=id_col).persist()
    keepers = ex.where(F.col("doc_id") == F.col("keep_id")).select("doc_id")
    surv = (
        docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
        .join(keepers, "doc_id")
        .persist()
    )

    # near-dup stage over the exact survivors only. Banding is per-doc, so
    # restricting the input set only removes pairs with a dropped endpoint —
    # the oracle replays this by filtering the full-corpus pair set to
    # survivor endpoints (identical by construction).
    pairs = minhash_near_duplicates(
        surv, threshold=minhash_threshold, n=ngram
    )
    asg = dedup_assignments(surv.select("doc_id"), pairs)

    # rep chain: one join on keep_id resolves BOTH cases — a survivor's
    # keep_id is itself (its own group rep), an exact dup's keep_id is its
    # hash keeper (that keeper's group rep)
    rep_of_keeper = asg.select(
        F.col("doc_id").alias("keep_id"), F.col("group_id").alias("_rep")
    )
    combined = (
        ex.select("doc_id", "keep_id")
        .join(rep_of_keeper, "keep_id", "left")
        .select("doc_id", "keep_id", F.coalesce("_rep", "keep_id").alias("rep_id"))
    )

    prof = docs.select(
        F.col(id_col).alias("doc_id"),
        X.language_id(text_col).alias("lang_pred"),
        X.quality_score(text_col).alias("quality"),
    )

    reason = (
        F.when(F.col("doc_id") != F.col("keep_id"), F.lit("exact_dup"))
        .when(F.col("rep_id") != F.col("doc_id"), F.lit("near_dup"))
        .when(~F.col("lang_pred").isin(*allowed_langs), F.lit("lang"))
        .when(F.col("quality") < F.lit(float(min_quality)), F.lit("low_quality"))
        .otherwise(F.lit("ok"))
    )
    return (
        combined.join(prof, "doc_id")
        .withColumn("reason", reason)
        .select(
            "doc_id",
            (F.col("reason") == "ok").alias("keep"),
            "reason",
            "rep_id",
            "lang_pred",
            "quality",
        )
    )
