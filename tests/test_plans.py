"""Plan-shape assertions for the round-1 scale hazards (VERDICT.md):

* CEP must be a distributed top-K (TakeOrderedAndProject), never a
  partition-less row_number window that funnels the whole pair graph into
  one task;
* meta-blocking weight joins must not FORCE broadcasts of per-entity /
  per-node tables (one row per entity — multi-GB at 10^9 entities); AQE
  picks broadcast when they are genuinely small;
* EJS must not run a separate driver-side count of the pair graph.
"""

import pytest
from pyspark.sql import functions as F

from continuousfilteringbenchmark_spark.operators import metablocking as MB


@pytest.fixture(scope="module")
def toy(spark):
    rows = [
        ("b1", "A", "A1"), ("b1", "B", "B1"), ("b1", "B", "B2"),
        ("b2", "A", "A1"), ("b2", "B", "B1"),
        ("b3", "A", "A2"), ("b3", "B", "B2"),
        ("b4", "A", "A1"), ("b4", "A", "A2"), ("b4", "B", "B1"), ("b4", "B", "B2"),
    ]
    df = spark.createDataFrame(rows, "block_key string, side string, doc_id string")
    df.cache().count()
    return df


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def _analyzed(df) -> str:
    return df._jdf.queryExecution().analyzed().toString()


def test_cep_has_no_global_window(spark, toy):
    weighted = MB.weighted_pairs(toy, "CBS")
    out = MB.cep(weighted, k=2)
    plan = _optimized(out)
    assert "Window" not in plan  # row_number over an unpartitioned window
    assert "GlobalLimit" in plan  # orderBy().limit() -> TakeOrderedAndProject
    # semantics unchanged vs the window formulation: deterministic top-k
    rows = [(r.left_id, r.right_id) for r in out.collect()]
    assert rows[0] == ("A1", "B1") and len(rows) == 2


@pytest.mark.parametrize("scheme", ["CBS", "JS", "ECBS", "EJS", "ARCS", "X2"])
def test_weighted_pairs_no_forced_broadcast(spark, toy, scheme):
    df = MB.weighted_pairs(toy, scheme, clean_clean=True)
    analyzed = _analyzed(df)
    # the only legitimate hint is the 1-row |V| scalar in EJS
    n_hints = analyzed.count("ResolvedHint")
    assert n_hints <= (1 if scheme == "EJS" else 0), analyzed


def test_blast_prune_no_forced_broadcast(spark, toy):
    df = MB.blast(toy, ratio=0.35)
    assert "ResolvedHint" not in _analyzed(df)


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def tiny_vecs(spark):
    import math

    rows = [
        (f"v{i}", [math.sin(i * 0.7 + d) for d in range(8)]) for i in range(40)
    ]
    return spark.createDataFrame(rows, "vec_id string, vec array<double>")


def test_range_search_lsh_has_no_quadratic_join(spark, tiny_vecs):
    """The scale path must never fall back to a cross join: candidates come
    from the band-bucket equi-join, verification from hash equi-joins."""
    from continuousfilteringbenchmark_spark.operators.dense import range_search

    out = range_search(tiny_vecs, None, threshold=0.35, id_col="vec_id",
                       method="lsh", lsh_tables=4, lsh_bits=4)
    plan = _physical(out)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_embedding_dedup_has_no_quadratic_join(spark, tiny_vecs):
    """End-to-end embedding dedup (LSH candidates -> verify -> CC -> keep/
    drop): every join in the final assignment plan is an equi-join."""
    from continuousfilteringbenchmark_spark.operators.dedup import dedup_assignments
    from continuousfilteringbenchmark_spark.operators.dense import range_search

    pairs = range_search(tiny_vecs, None, threshold=0.35, id_col="vec_id",
                         method="lsh", lsh_tables=4, lsh_bits=4)
    out = dedup_assignments(tiny_vecs.select(F.col("vec_id").alias("doc_id")), pairs)
    plan = _physical(out)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_knn_ivf_has_no_quadratic_candidate_join(spark, tiny_vecs):
    """IVF in the approximate regime: the query-corpus join is the cell
    equi-join; the only cross join in the plan is against the BROADCAST
    centroid table (n_cells rows — a constant, not a relation)."""
    from continuousfilteringbenchmark_spark.operators.dense import knn_ivf

    out = knn_ivf(tiny_vecs, tiny_vecs, k=3, n_cells=4, nprobe=2, id_col="vec_id")
    plan = _physical(out)
    assert "CartesianProduct" not in plan, plan
    # centroid fan-out is an explicit broadcast of an n_cells-row table;
    # any OTHER nested-loop join would pair two real relations
    n_bnlj = plan.count("BroadcastNestedLoopJoin")
    assert n_bnlj <= 2, plan  # one per _assign_cells call (corpus + queries)


def test_ejs_dirty_degree_is_node_centric(spark):
    # dirty-ER triangle 1-2-3 plus pendant 4: node 2 has edges (1,2) and
    # (2,3) — one in each ROLE. Node-centric deg(2)=2; a per-role count
    # would see deg_left(2)=1 / deg_right(2)=1.
    rows = [
        ("x", "A", "1"), ("x", "A", "2"),
        ("y", "A", "2"), ("y", "A", "3"),
        ("z", "A", "3"), ("z", "A", "4"),
    ]
    blocks = spark.createDataFrame(rows, "block_key string, side string, doc_id string")
    w = {
        (r.left_id, r.right_id): r.weight
        for r in MB.weighted_pairs(blocks, "EJS", clean_clean=False).collect()
    }
    import math

    # pairs: (1,2) (2,3) (3,4); V=3; deg(1)=1 deg(2)=2 deg(3)=2 deg(4)=1
    # JS(1,2) = 1/(1+2-1) = 0.5
    want_12 = 0.5 * math.log10(3.0 / 1) * math.log10(3.0 / 2)
    assert abs(w[("1", "2")] - want_12) < 1e-12
    # JS(2,3) = 1/(2+2-1) = 1/3 ; both degrees 2
    want_23 = (1 / 3) * math.log10(3.0 / 2) ** 2
    assert abs(w[("2", "3")] - want_23) < 1e-12
