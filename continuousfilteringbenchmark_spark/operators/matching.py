"""Unique-mapping (1:1) matching over scored candidate pairs.

Clean-Clean ER's decision step: each left entity matches at most one right
entity and vice versa (the JedAI default clean-clean clustering,
UniqueMappingClustering, is exactly this greedy matching; the reference
benchmark itself stops at scored pairs). Sequential spec: visit pairs in
(score DESC, left_id ASC, right_id ASC) order, accept a pair iff neither
endpoint is already matched.

Distributed formulation: iterated LOCAL DOMINANCE (Preis '99 / the
Manne-Bisseling parallel greedy matching) — per round, accept every pair
that is the best-ranked incident pair of BOTH its endpoints, then drop all
pairs touching an accepted endpoint. Because the rank order is TOTAL
(deterministic id tie-breaks), the fixpoint equals the sequential greedy
matching exactly — pinned by ``tests/test_matching.py`` against a driver-
side reference greedy.

Scale shape: each round is two window-min computations partitioned by an
endpoint id plus two hash anti-joins — all shuffles on endpoint keys, the
same key family the scoring join already used. Expected rounds are small
for ER score distributions (every locally dominant pair is removed each
round); the pathological O(n)-round case (strictly descending scores
along a path) is bounded by ``max_iter``. Lineage is cut with an eager
local checkpoint per round (swap for reliable checkpoints in production,
as in ``cluster.connected_components``); superseded checkpoint RDDs are
freed as soon as the final matching materializes, leaving only the
compact result checkpoint — the same storage-hygiene contract as the CC
loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .cluster import _own_checkpoint_ids, _persistent_ids, _unpersist_ids


def _rank_struct():
    """Total order on pairs: (score DESC, left_id ASC, right_id ASC),
    encoded as an ascending-comparable struct (min = best)."""
    return F.struct(
        (-F.col("score")).alias("ns"),
        F.col("left_id").alias("l"),
        F.col("right_id").alias("r"),
    )


def locally_dominant_pairs(scored: DataFrame) -> DataFrame:
    """One local-dominance round: pairs that are the best-ranked incident
    pair of both endpoints. Two window-mins on endpoint partitions; pure
    codegen. This is also round 1 of the greedy fixpoint (the
    ``best_match_pairs`` oracle query replays it in SQL)."""
    ranked = scored.withColumn("_rk", _rank_struct())
    wl = Window.partitionBy("left_id")
    wr = Window.partitionBy("right_id")
    return (
        ranked.withColumn("_bl", F.min("_rk").over(wl))
        .withColumn("_br", F.min("_rk").over(wr))
        .where((F.col("_rk") == F.col("_bl")) & (F.col("_rk") == F.col("_br")))
        .select("left_id", "right_id", "score")
    )


def unique_mapping_pairs(scored: DataFrame, max_iter: int = 100) -> DataFrame:
    """Greedy 1:1 matching fixpoint: (left_id, right_id, score), each id on
    each side appearing at most once — identical to the sequential greedy
    under the total rank order. Raises if ``max_iter`` rounds do not drain
    the pair table (pathological descending-chain input).

    PRECONDITION — bipartite (clean-clean) input: the left and right id
    spaces must be disjoint, as they are for cross-source linkage.  Both
    the dominance windows and the endpoint anti-joins treat the sides as
    separate vertex sets; on dirty/self-join input (one id universe) an id
    could match once as a left and once as a right endpoint, which is NOT
    the sequential "neither endpoint already matched" greedy.  For dirty
    input, run transitive clustering (``operators.cluster``) instead."""
    from pyspark.sql import Observation

    sc = scored.sparkSession.sparkContext
    remaining = scored.select("left_id", "right_id", "score")
    accepted: list[DataFrame] = []
    held: set[int] = set()  # all per-round checkpoints (freed at the end)
    prev_rem: set[int] = set()  # the superseded remaining checkpoint
    converged = False
    try:
        for _ in range(max_iter):
            dom = locally_dominant_pairs(remaining)
            # freeze this round's matches so the final union reads a
            # checkpoint instead of re-running the whole round chain
            pre = _persistent_ids(sc)
            dom_ck = dom.localCheckpoint(eager=True)
            held |= _own_checkpoint_ids(dom_ck, sc, pre)
            accepted.append(dom_ck)
            # a matched endpoint removes every incident pair
            nxt = remaining.join(
                dom_ck.select("left_id"), "left_id", "left_anti"
            ).join(dom_ck.select("right_id"), "right_id", "left_anti")
            obs = Observation()
            pre = _persistent_ids(sc)
            out = nxt.observe(obs, F.count(F.lit(1)).alias("n")).localCheckpoint(
                eager=True
            )
            own = _own_checkpoint_ids(out, sc, pre)
            held |= own
            _unpersist_ids(sc, prev_rem)
            held -= prev_rem
            prev_rem = own
            remaining = out
            if int(obs.get["n"]) == 0:
                converged = True
                break
        if not converged:
            raise RuntimeError(
                f"unique_mapping_pairs did not converge in {max_iter} rounds"
            )
        result = accepted[0]
        for d in accepted[1:]:
            result = result.unionByName(d)
        # compact the matching to its own checkpoint, then free every
        # per-round block — nothing outlives the call but the result
        result = result.localCheckpoint(eager=True)
        return result
    finally:
        _unpersist_ids(sc, held)
