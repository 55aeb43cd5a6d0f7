"""Repo-wide plan-shape sweep: EVERY ``__spark_entry__.queries()`` entry must
compile to a sub-quadratic physical plan — no ``CartesianProduct`` — except
the three declared exact brute-force baselines (quadratic BY DESIGN, kept as
oracle-checked correctness references; their scale paths headline the bench):

* ``knn_embeddings``      — exact cosine top-k (``operators/dense.py:54``);
  scale path = ``knn_ivf_approx``.
* ``range_search_embeddings`` — exact cosine ε-search (``dense.py:77``);
  scale path = ``range_search_lsh`` / ``range_search_multiprobe``.
* ``deepblocker_pairs``   — ExactTopKVectorPairing parity with the
  reference's own brute-force pairing (``nnmethods/deepblocker/d4SA.py``);
  scale path = ``deepblocker_topk(method='ivf')``.

``BroadcastNestedLoopJoin`` is tolerated ONLY when it broadcasts a bounded
side: the engine's deliberate scalar cross-joins (EJS's 1-row |V|,
WEP's 1-row global mean — ``operators/metablocking.py:239,276``) and small
dimension tables AQE chooses to broadcast. A broadcast of an UNBOUNDED
per-document table through a nested-loop join would be a scale bug, so the
sweep also rejects BNLJ in every query that has no documented scalar join.

The sweep runs at sf0.001 (construction may execute eager work: the CC loop,
IVF quantizer fits, the streaming oracles) and inspects the PHYSICAL plan.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry

SF_DIR = os.environ.get("SPARK_GRAFT_SWEEP_SF", "/root/testdata/sf0.001")

# quadratic by documented design (exact correctness baselines), plus the
# SQ8 scan: scalar quantization COMPRESSES the exhaustive scan (4x
# bandwidth) rather than pruning it — FAISS SQ8 is likewise exhaustive
# unless composed with IVF cells (operators/dense.py knn_sq8 docstring)
EXACT_BASELINES = {
    "knn_embeddings",
    "range_search_embeddings",
    "deepblocker_pairs",
    "knn_sq8",
    "knn_pq",  # PQ compresses the exhaustive ADC scan; IVF cells prune
}

# queries whose plan contains a deliberate cross join against a CONFIG-
# BOUNDED broadcast table (the IVF coarse-quantizer assignment: every vector
# scores against the n_cells centroid rows — FAISS's own IVF assignment
# shape, O(n x n_cells) with n_cells a constant, never O(n^2))
BOUNDED_DIM_BROADCAST_OK = {"knn_ivf_approx", "knn_ivf_embeddings", "knn_ivfpq"}

# queries whose plan contains a deliberate broadcast-scalar cross join
# (1-row aggregate side) — BNLJ is the correct physical operator for those
SCALAR_JOIN_OK = {
    "metablocking_ejs_cep",  # |V| scalar (metablocking.py:239)
    "metablocking_js_wep",  # global mean weight (metablocking.py:276)
    "metablocking_dice_wep",
    "qgrams_workflow",  # WEP inside the composed workflow
    "blocking_quality",  # PC/PQ scalars joined into one row
    "tuned_workflow",  # registry-decoded pruner may be WEP
    "tuned_dirty_workflow",  # WEP global mean + tp/n_cand/n_gold scalar row joins
    "clean_clean_er",  # composed pipeline: purging cutoff scalar
    "er_clusters",
    "jedai_workflow",
    "topk_join",  # k-th-value threshold scalar per partition-less corpus
    "topk_join_multiset",
    "topk_join_fivegram",
    "schema_based_topk",
    "fs_scores",  # ONE-ROW m/u weight table broadcast (linkage.py)
    "fs_gamma_scores",  # same one-row weight broadcast, graded model
    "weighted_epsilon_join",  # ONE-ROW corpus-count broadcast (joins.py)
    "ari_components",  # four ONE-ROW component aggregates cross-joined
    "best_match_pairs",  # over clean_clean_er (purging cutoff scalar)
    "unique_mapping_pairs",  # same upstream scalar join
}


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize("name", sorted(entry.queries().keys()))
def test_query_plan_is_subquadratic(spark, name):
    q = entry.queries()[name]
    df = q(spark, SF_DIR)
    plan = _physical(df)
    if name in EXACT_BASELINES:
        return  # quadratic by design — documented correctness baseline
    assert "CartesianProduct" not in plan, f"{name}: quadratic join\n{plan}"
    if name not in SCALAR_JOIN_OK | BOUNDED_DIM_BROADCAST_OK:
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name}: nested-loop join outside the documented scalar set\n{plan}"
        )
