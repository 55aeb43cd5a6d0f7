"""End-to-end ER pipeline (SURVEY.md §7 M1 slice).

    docs -> agg_text -> tokens -> blocking -> purging -> (filtering) ->
    comparison propagation -> set-sim scoring -> threshold ->
    connected components -> clusters

This is the reference's Parameter-Free Workflow
(``blockingWorkflows/.../schemaAgnostic/ParameterFreeWorkflow.java:52-61``:
StandardBlocking + ComparisonsBasedBlockPurging + ComparisonPropagation)
extended with the north rule's scoring + transitive clustering.

Stage materialization for resumability lives in plans/stages.py; this module
is the pure logical composition.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..datamodel import agg_text
from ..functions import tokenize as tk
from ..functions.similarity import set_similarity
from ..operators import blocking as B
from ..operators.cluster import clusters_with_singletons


@dataclass
class ERConfig:
    blocking: B.BlockingConfig = field(default_factory=B.BlockingConfig)
    sim: str = "jaccard"
    threshold: float = 0.5


def docs_with_tokens(docs: DataFrame, side_from_prefix: bool = True) -> DataFrame:
    """docs(doc_id, spans) -> (doc_id, side, text, tokens).

    ``side`` is derived from the doc_id prefix ('A:'/'B:') for Clean-Clean
    corpora; Dirty corpora get a constant side.
    """
    side = (
        F.when(F.col("doc_id").startswith("A:"), F.lit("A")).otherwise(F.lit("B"))
        if side_from_prefix
        else F.lit("A")
    )
    return docs.select(
        "doc_id",
        side.alias("side"),
        agg_text("spans").alias("text"),
    ).withColumn("tokens", tk.word_token_set("text"))


def score_pairs(
    pairs: DataFrame,
    tokened: DataFrame,
    sim: str = "jaccard",
    broadcast_rows: int | None = 1_000_000,
) -> DataFrame:
    """Score candidate (left_id, right_id) pairs with exact set similarity.

    Joins the token arrays back to the pruned pair set (candidate count is
    << quadratic by construction) and computes |A∩B| natively. Tokens ride as
    hashed 64-bit ids (``tk.hash_token_set``): ``array_intersect`` on longs
    stays on the primitive fast path (~100x the string-array path) and the
    shuffled pair rows are several times narrower.

    Join strategy: when the token table has <= ``broadcast_rows`` rows it is
    broadcast, so the (pairs x wide-array) intermediate never crosses
    executors — shuffling 4.5M pair rows carrying two ~500B arrays through
    two shuffle joins costs more than shipping the whole doc-side table once
    (measured 3.5x on the scale bench at 4 executors). The cap (1M rows,
    ~0.5-1 GB of token arrays) keeps the forced broadcast inside small
    executor heaps; beyond it (the 10^12-doc regime, where the doc table
    can't broadcast) it falls back to plain shuffle joins, where production
    co-locates via doc_id bucketing.
    """
    hashed = tokened.select("doc_id", tk.hash_token_set(F.col("tokens")).alias("_h"))
    lt = hashed.select(
        F.col("doc_id").alias("left_id"),
        F.col("_h").alias("_ltok"),
        F.size("_h").alias("_lsz"),
    )
    rt = hashed.select(
        F.col("doc_id").alias("right_id"),
        F.col("_h").alias("_rtok"),
        F.size("_h").alias("_rsz"),
    )
    # bounded plausibility probe: limit(cap+1).count() stops scanning at the
    # cap instead of counting the whole table (which at corpus scale would be
    # a full-scan job run before every score_pairs call)
    if (
        broadcast_rows is not None
        and tokened.limit(broadcast_rows + 1).count() <= broadcast_rows
    ):
        lt, rt = F.broadcast(lt), F.broadcast(rt)
    scored = (
        pairs.join(lt, "left_id")
        .join(rt, "right_id")
        .withColumn("_common", F.size(F.array_intersect("_ltok", "_rtok")))
        .withColumn("score", set_similarity(F.col("_common"), F.col("_lsz"), F.col("_rsz"), sim))
    )
    return scored.select("left_id", "right_id", "score")


def er_pipeline(
    docs: DataFrame, cfg: ERConfig | None = None, clean_clean: bool = True
) -> dict[str, DataFrame]:
    """Run the full pipeline; returns every stage for materialization/tests.

    Keys: tokened, blocks, candidate_pairs, matches, clusters.
    """
    cfg = cfg or ERConfig()
    cfg.blocking.clean_clean = clean_clean
    tokened = docs_with_tokens(docs, side_from_prefix=clean_clean)
    blocks = B.build_blocks(tokened, cfg.blocking)
    pairs = B.pairs_from_blocks(blocks, clean_clean)
    scored = score_pairs(pairs, tokened, cfg.sim)
    matches = scored.where(F.col("score") >= cfg.threshold)
    clusters = clusters_with_singletons(docs, matches.select("left_id", "right_id"))
    return {
        "tokened": tokened,
        "blocks": blocks,
        "candidate_pairs": pairs,
        "matches": matches,
        "clusters": clusters,
    }
