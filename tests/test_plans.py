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
