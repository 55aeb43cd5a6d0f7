"""N8: recall-targeted parameter search (SURVEY.md §2.5).

The reference tunes every NN method by searching the smallest parameter
value (``#neighbors`` for FAISS/SCANN, ``#probes`` for FALCONN) whose Pair
Completeness reaches the target — ``findNN`` in
``nnmethods/faiss/D4sa.py:174-209`` (expanding/halving step search) and the
probe loop in ``nnmethods/falconn/hyperplaneLSH/D4.py:118-150``. This module
reproduces that protocol as a deterministic driver-level utility: PC(param)
is assumed monotone non-decreasing (more neighbors / probes / tables can
only add candidates), so an exponential-expand + binary-search finds the
minimal satisfying parameter with O(log hi) evaluations.

It is driver-level on purpose (matches the reference, which tunes outside
the engine): each probe runs a full distributed job; the search loop itself
touches only scalar PC values.
"""

from __future__ import annotations

from typing import Callable


def find_min_param(
    evaluate: Callable[[int], float],
    target: float,
    lo: int = 1,
    hi: int | None = None,
    start: int | None = None,
) -> tuple[int, float]:
    """Smallest integer param in [lo, hi] with evaluate(param) >= target.

    ``evaluate`` returns a recall/PC in [0, 1] and must be monotone
    non-decreasing in its argument (the reference's assumption too —
    ``findNN`` walks #neighbors the same way). When ``hi`` is None the upper
    bound is found by doubling from ``start`` (default ``lo``), mirroring the
    reference's expanding ``startstep`` phase.

    Returns (param, recall_at_param). Raises ValueError if even ``hi``
    misses the target (the reference loops forever instead — D4sa.py:195).
    """
    if hi is None:
        p = max(start or lo, lo)
        r = evaluate(p)
        while r < target:
            if p > 1 << 30:
                raise ValueError(f"recall target {target} unreachable (PC={r} at {p})")
            p *= 2
            r = evaluate(p)
        hi = p
        hi_recall = r
    else:
        hi_recall = evaluate(hi)
        if hi_recall < target:
            raise ValueError(
                f"recall target {target} unreachable: PC={hi_recall} at hi={hi}"
            )
    best, best_r = hi, hi_recall
    lo_b, hi_b = lo, hi
    while lo_b < hi_b:
        mid = (lo_b + hi_b) // 2
        r = evaluate(mid)
        if r >= target:
            best, best_r = mid, r
            hi_b = mid
        else:
            lo_b = mid + 1
    return best, best_r


def pc_of_pairs(candidates, gold) -> float:
    """PC of a candidate-pair DataFrame vs a gold-pair DataFrame (both
    canonicalized) — the scalar the tuner drives on."""
    from .eval import evaluate_pairs

    return evaluate_pairs(candidates, gold).pc


def tune_range_search_probes(
    vecs,
    gold,
    target_pc: float,
    threshold: float = 0.35,
    lsh_tables: int = 8,
    lsh_bits: int = 8,
    id_col: str = "doc_id",
) -> tuple[int, float]:
    """The reference's FALCONN probe loop (``hyperplaneLSH/D4.py:118-150``:
    raise ``set_num_probes`` until recall suffices) over the multiprobe
    range search: smallest ``lsh_probes`` in [0, lsh_bits] whose candidate
    PC against ``gold`` reaches ``target_pc`` at FIXED tables/bits.

    Cheaper axis than more tables: probes add query-side bucket lookups
    only — the indexed table does not grow.
    """
    from .operators.dense import range_search

    def evaluate(p: int) -> float:
        cand = range_search(
            vecs, None, threshold=threshold, id_col=id_col,
            method="lsh", lsh_tables=lsh_tables, lsh_bits=lsh_bits, lsh_probes=p,
        ).select("left_id", "right_id")
        return pc_of_pairs(cand, gold)

    return find_min_param(evaluate, target_pc, lo=0, hi=lsh_bits)


def tune_ivf_nprobe(
    vecs,
    target_recall: float,
    k: int = 5,
    n_cells: int = 16,
    seed: int = 42,
    quantizer: str = "sample",
    id_col: str = "vec_id",
) -> tuple[int, float]:
    """The reference's ``findNN`` protocol on the IVF probe axis: smallest
    ``nprobe`` in [1, n_cells] whose recall@k against the exact cosine
    top-k reaches ``target_recall`` (``nnmethods/faiss/D4sa.py:174-209``
    walks #neighbors the same expanding way; probes are IVF's equivalent
    knob). Recall is measured pairwise: candidate (query, neighbor) pairs
    vs the exact top-k pair set."""
    from pyspark.sql import functions as F

    from .operators.dense import knn_exact, knn_ivf

    gold = (
        knn_exact(vecs, vecs, k=k, id_col=id_col)
        .select(
            F.col("query_id").alias("left_id"), F.col("corpus_id").alias("right_id")
        )
        .persist()
    )
    gold.count()

    def evaluate(p: int) -> float:
        cand = knn_ivf(
            vecs, vecs, k=k, n_cells=n_cells, nprobe=min(p, n_cells),
            seed=seed, quantizer=quantizer, id_col=id_col,
        ).select(
            F.col("query_id").alias("left_id"), F.col("corpus_id").alias("right_id")
        )
        return pc_of_pairs(cand, gold)

    try:
        return find_min_param(evaluate, target_recall, lo=1, hi=n_cells)
    finally:
        gold.unpersist()
