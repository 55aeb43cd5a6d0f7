"""Unique-mapping 1:1 matching: fixpoint == sequential greedy."""

import pytest

from continuousfilteringbenchmark_spark.operators.matching import (
    locally_dominant_pairs,
    unique_mapping_pairs,
)


def _greedy(pairs):
    """Driver-side sequential greedy reference: (score DESC, l, r) order."""
    out, tl, tr = [], set(), set()
    for l, r, s in sorted(pairs, key=lambda t: (-t[2], t[0], t[1])):
        if l not in tl and r not in tr:
            tl.add(l)
            tr.add(r)
            out.append((l, r, s))
    return sorted(out)


def _df(spark, pairs):
    return spark.createDataFrame(pairs, "left_id string, right_id string, score double")


def test_matches_sequential_greedy(spark):
    # deterministic pseudo-random bipartite graph, distinct scores
    pairs = [
        (f"a{i}", f"b{(i * 7 + j) % 15}", ((i * 31 + j * 17) % 97) + j / 10.0)
        for i in range(12)
        for j in range(4)
    ]
    # dedup (l, r) keeping max score to keep the spec unambiguous
    best = {}
    for l, r, s in pairs:
        best[(l, r)] = max(best.get((l, r), -1.0), s)
    pairs = [(l, r, s) for (l, r), s in best.items()]
    got = sorted(map(tuple, unique_mapping_pairs(_df(spark, pairs)).collect()))
    assert got == _greedy(pairs)


def test_descending_chain_needs_rounds(spark):
    # path a0-b0-a1-b1-... with strictly descending scores: sequential greedy
    # takes every other edge; local dominance needs one round per edge
    pairs = []
    for i in range(6):
        pairs.append((f"a{i}", f"b{i}", 100.0 - 2 * i))
        pairs.append((f"a{i + 1}", f"b{i}", 99.0 - 2 * i))
    got = sorted(map(tuple, unique_mapping_pairs(_df(spark, pairs)).collect()))
    assert got == _greedy(pairs)
    # chain: only the (a_i, b_i) edges survive
    assert got == sorted((f"a{i}", f"b{i}", 100.0 - 2 * i) for i in range(6))


def test_one_to_one_property(spark):
    pairs = [
        (f"a{i % 5}", f"b{j % 4}", float((i * j) % 11) + i / 7.0)
        for i in range(10)
        for j in range(6)
    ]
    best = {}
    for l, r, s in pairs:
        best[(l, r)] = max(best.get((l, r), -1.0), s)
    pairs = [(l, r, s) for (l, r), s in best.items()]
    rows = unique_mapping_pairs(_df(spark, pairs)).collect()
    ls = [r["left_id"] for r in rows]
    rs = [r["right_id"] for r in rows]
    assert len(ls) == len(set(ls)) and len(rs) == len(set(rs))
    assert sorted(map(tuple, rows)) == _greedy(pairs)


def test_dominant_is_subset_and_round_one(spark):
    pairs = [("a1", "b1", 5.0), ("a1", "b2", 4.0), ("a2", "b1", 3.0), ("a2", "b2", 2.0)]
    dom = sorted(map(tuple, locally_dominant_pairs(_df(spark, pairs)).collect()))
    assert dom == [("a1", "b1", 5.0)]
    full = sorted(map(tuple, unique_mapping_pairs(_df(spark, pairs)).collect()))
    assert full == [("a1", "b1", 5.0), ("a2", "b2", 2.0)]


def test_partition_invariant_and_empty(spark):
    pairs = [(f"a{i}", f"b{i % 3}", float(i % 7)) for i in range(20)]
    best = {}
    for l, r, s in pairs:
        best[(l, r)] = max(best.get((l, r), -1.0), s)
    pairs = [(l, r, s) for (l, r), s in best.items()]
    a = sorted(map(tuple, unique_mapping_pairs(_df(spark, pairs).repartition(1)).collect()))
    b = sorted(map(tuple, unique_mapping_pairs(_df(spark, pairs).repartition(8)).collect()))
    assert a == b == _greedy(pairs)
    assert unique_mapping_pairs(_df(spark, [])).count() == 0


def test_max_iter_raises(spark):
    pairs = []
    for i in range(5):
        pairs.append((f"a{i}", f"b{i}", 100.0 - 2 * i))
        pairs.append((f"a{i + 1}", f"b{i}", 99.0 - 2 * i))
    with pytest.raises(RuntimeError, match="converge"):
        unique_mapping_pairs(_df(spark, pairs), max_iter=2)


def test_unrolled_oracle_budget_and_poison():
    """The driver oracle for unique_mapping_pairs is a FIXED unroll
    (__spark_entry__._unique_mapping_sql); exactness holds iff the fixture
    drains within the budget. Pin both halves: (a) the sf0.01 fixture's
    greedy converges with >= 8 rounds of headroom under the shipped
    budget, (b) an under-budgeted unroll surfaces the NOT_CONVERGED poison
    row on a descending chain instead of silently truncating."""
    import inspect
    import os
    import re

    import duckdb
    import pytest

    import __spark_entry__ as E

    budget = inspect.signature(E._unique_mapping_sql).parameters["rounds"].default

    sf = "/root/testdata/sf0.01"
    if os.path.isdir(sf):  # ADVICE r4: skip (not error) without the fixture
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf}/documents.parquet')"
        )
        sql = E._unique_mapping_sql(1)
        cte = sql[: sql.index("SELECT left_id, right_id, score FROM dom1\n")].rstrip()
        rem = con.execute(cte + "\nSELECT left_id, right_id, score FROM rem0").fetchall()
        rounds = 0
        while rem:
            rounds += 1
            best = {}
            for l, r, s in rem:
                k = (-s, l, r)
                if l not in best or k < best[l]:
                    best[l] = k
                if ("r", r) not in best or k < best[("r", r)]:
                    best[("r", r)] = k
            dom = [
                (l, r, s)
                for l, r, s in rem
                if best[l] == (-s, l, r) == best[("r", r)]
            ]
            ml = {l for l, _, _ in dom}
            mr = {r for _, r, _ in dom}
            rem = [(l, r, s) for l, r, s in rem if l not in ml and r not in mr]
        assert rounds + 8 <= budget, (
            f"fixture needs {rounds} rounds; oracle budget {budget} leaves "
            "<8 rounds of headroom — raise _unique_mapping_sql's default"
        )
    else:
        pytest.skip("sf0.01 fixture absent")

    # poison half: a strictly-descending chain accepts ONE pair per round,
    # so 3 unrolled rounds over a 6-pair chain cannot drain -> poison row
    con = duckdb.connect()
    rows = []
    for i in range(6):
        rows.append(f"({i}, 'a{i}', 'b{i}', {100.0 - 2 * i})")
        rows.append(f"({i}, 'a{i + 1}', 'b{i}', {99.0 - 2 * i})")
    con.execute(
        "CREATE TABLE documents (doc_id INT, text VARCHAR, lang VARCHAR)"
    )  # unused by the probe below
    sql3 = E._unique_mapping_sql(3)
    # swap the corpus-derived rem0 for the synthetic chain
    head = sql3[: sql3.index("WITH ")] + "WITH rem0 AS MATERIALIZED (SELECT * FROM (VALUES "
    chain = ", ".join(
        f"('a{i}', 'b{i}', CAST({100.0 - 2 * i} AS DOUBLE)), "
        f"('a{i + 1}', 'b{i}', CAST({99.0 - 2 * i} AS DOUBLE))"
        for i in range(6)
    )
    tail = sql3[sql3.index(",\n            rk1 AS") :]
    probe = head + chain + ") t(left_id, right_id, score))" + tail
    out = con.execute(probe).fetchall()
    assert ("NOT_CONVERGED", "NOT_CONVERGED") in {(r[0], r[1]) for r in out}
