"""Round-5 registry families: the Dirty-ER (der/) and schema-based tuned
grids must reproduce the cited driver sources verbatim (comment-stripped —
the der files keep superseded 5-dataset arrays commented above the active
ones), and their decode must honor each family's sentinel quirks."""

import os
import re

import pytest
from pyspark.sql import functions as F

from continuousfilteringbenchmark_spark import configs as C

REF = "/root/reference/blockingWorkflowsL1L2L3/src"

_DRIVER_FILE = {
    "token_blocking": "TokenBlocking.java",
    "qgrams_blocking": "QGramsBlocks.java",
    "suffix_arrays_blocking": "SuffixArrays.java",
    "extended_qgrams_blocking": "ExtendedQGramsBlocks.java",
    "extended_suffix_arrays_blocking": "ExtendedSuffixArrays.java",
}
_BB_NAME = {
    "qgrams_blocking": "q",
    "extended_qgrams_blocking": "q",
    "suffix_arrays_blocking": "bbConf",
    "extended_suffix_arrays_blocking": "bbConf",
}


def _source(level: str, sub: str, method: str) -> str:
    path = os.path.join(REF, level.lower(), sub, _DRIVER_FILE[method])
    with open(path) as f:
        return re.sub(r"//.*", "", f.read())  # strip commented-out arrays


def _ints(src: str, name: str) -> tuple[int, ...]:
    m = re.search(rf"int\[\]\s+{name}\s*=\s*\{{([^}}]*)\}}", src)
    assert m, f"array {name} not found"
    return tuple(int(x) for x in m.group(1).split(","))


def _mb(src: str) -> tuple:
    m = re.search(
        r"ComparisonCleaningMethod\[\]\s+mbAlgorithm\s*=\s*\{(.*?)\};", src, re.S
    )
    assert m
    out = []
    for item in m.group(1).split(","):
        item = item.strip()
        if not item:
            continue
        if item == "null":
            out.append(None)
        else:
            out.append(item.split(".")[-1])
    return tuple(out)


@pytest.mark.parametrize(
    "registry,sub",
    [(C.DER_BLOCKING_TUNED, "der"), (C.SCHEMA_BLOCKING_TUNED, "schemaBased")],
    ids=["der", "schemaBased"],
)
@pytest.mark.parametrize("method,level", sorted(C.DER_BLOCKING_TUNED))
def test_registry_matches_reference_sources(registry, sub, method, level):
    src = _source(level, sub, method)
    grids = registry[(method, level)]
    assert grids["ws"] == _ints(src, "wScheme")
    assert grids["mb"] == _mb(src)
    if "bp" in grids:
        assert grids["bp"] == _ints(src, "blockPurging")
    if "bf" in grids:
        assert grids["bf"] == _ints(src, "bfRatio")
    if "bb" in grids:
        assert grids["bb"] == _ints(src, _BB_NAME[method])


def test_bf_sentinel_quirks_in_sources():
    """der drivers test `0 <` everywhere; schemaBased (Extended)QGrams test
    `0 <=` in the quality pass, TokenBlocking `0 <` — the registries encode
    exactly this split."""
    for level in ("l1", "l2", "l3"):
        for method in ("token_blocking", "qgrams_blocking", "extended_qgrams_blocking"):
            der = _source(level, "der", method)
            assert "0 <= bfRatio" not in der
            sb = _source(level, "schemaBased", method)
            if method == "token_blocking":
                assert "0 <= bfRatio" not in sb
            else:
                assert "0 <= bfRatio" in sb


def test_der_decode_spotcells():
    cfg = C.from_reference_der("token_blocking", "L2", "cddb")
    assert cfg.block_purging is True
    assert abs(cfg.bf_ratio - 0.125) < 1e-12
    assert cfg.weight_scheme == "CBS"
    assert cfg.mb_algorithm == "WEIGHTED_EDGE_PRUNING"
    assert cfg.gold_counting == "unilateral"
    # exclusive sentinel: grid -1 -> BlockFiltering skipped
    assert C.from_reference_der("token_blocking", "L2", "coratitle").bf_ratio is None
    # the driver-skips-cleaning cell decodes to mb None
    assert (
        C.from_reference_der("extended_qgrams_blocking", "L2", "cddbtitle").mb_algorithm
        is None
    )


def test_schema_decode_spotcells():
    cfg = C.from_reference_schema("token_blocking", "L1", "D1")
    assert cfg.attribute == "Name" and cfg.gold_counting == "bilateral"
    assert cfg.block_purging is False
    assert abs(cfg.bf_ratio - 0.9) < 1e-12
    assert cfg.weight_scheme == "CBS"
    assert cfg.mb_algorithm == "RECIPROCAL_CARDINALITY_NODE_PRUNING"
    # inclusive sentinel: ExtendedQGrams grid id 0 APPLIES at ratio 0.025
    c2 = C.from_reference_schema("extended_qgrams_blocking", "L3", "D4")
    assert abs(c2.bf_ratio - 0.025) < 1e-12
    # TokenBlocking keeps the exclusive sentinel: -1 -> skipped
    assert C.from_reference_schema("token_blocking", "L3", "D3").bf_ratio is None


def test_null_cleaning_cell_yields_plain_propagation(spark):
    """mb None = the driver runs no comparison cleaning: candidate
    generation degrades to plain ComparisonPropagation (every distinct
    block pair), not a crash."""
    cfg = C.from_reference_der("extended_qgrams_blocking", "L2", "cddbtitle")
    blocks = spark.createDataFrame(
        [("k1", "A", "1"), ("k1", "A", "2"), ("k2", "A", "2"), ("k2", "A", "3")],
        "block_key string, side string, doc_id string",
    )
    got = sorted(
        map(
            tuple,
            C.candidate_pairs_from_reference(blocks, cfg, clean_clean=False)
            .select("left_id", "right_id")
            .collect(),
        )
    )
    assert got == [("1", "2"), ("2", "3")]


def test_der_schema_cell_counts():
    """15 (method x level) cells per family, 4 der / 6 schema datasets per
    cell — the full re-tuned surface of both driver families."""
    assert len(C.DER_BLOCKING_TUNED) == 15
    assert len(C.SCHEMA_BLOCKING_TUNED) == 15
    for grids in C.DER_BLOCKING_TUNED.values():
        assert {len(v) for v in grids.values()} == {4}
    for grids in C.SCHEMA_BLOCKING_TUNED.values():
        assert {len(v) for v in grids.values()} == {6}
