"""The tuned-config registry must reproduce the reference's per-dataset
grids verbatim (parsed straight out of the cited Java sources), and the
new weighting schemes must match hand-computed JedAI-3.01 semantics."""

import math
import os
import re

import pytest

from continuousfilteringbenchmark_spark import configs as C

REF = "/root/reference/blockingWorkflowsL1L2L3/src"

_DRIVER_FILE = {
    "token_blocking": "TokenBlocking.java",
    "qgrams_blocking": "QGramsBlocks.java",
    "suffix_arrays_blocking": "SuffixArrays.java",
    "extended_qgrams_blocking": "ExtendedQGramsBlocks.java",
    "extended_suffix_arrays_blocking": "ExtendedSuffixArrays.java",
}
_ARRAY_KEY = {"bp": "blockPurging", "bf": "bfRatio", "ws": "wScheme", "bb": None}
_BB_NAME = {
    "qgrams_blocking": "q",
    "extended_qgrams_blocking": "q",
    "suffix_arrays_blocking": "bbConf",
    "extended_suffix_arrays_blocking": "bbConf",
}


def _parse_int_array(src: str, name: str) -> tuple[int, ...]:
    m = re.search(rf"int\[\]\s+{name}\s*=\s*\{{([^}}]*)\}}", src)
    assert m, f"array {name} not found"
    return tuple(int(x) for x in m.group(1).split(","))


def _parse_mb_array(src: str) -> tuple[str, ...]:
    m = re.search(
        r"ComparisonCleaningMethod\[\]\s+mbAlgorithm\s*=\s*\{(.*?)\};", src, re.S
    )
    assert m
    return tuple(re.findall(r"ComparisonCleaningMethod\.([A-Z_]+)", m.group(1)))


@pytest.mark.parametrize("method,level", sorted(C.BLOCKING_TUNED))
def test_registry_matches_reference_sources(method, level):
    path = os.path.join(REF, level.lower(), _DRIVER_FILE[method])
    with open(path) as f:
        src = f.read()
    grids = C.BLOCKING_TUNED[(method, level)]
    assert grids["ws"] == _parse_int_array(src, "wScheme")
    assert grids["mb"] == _parse_mb_array(src)
    if "bp" in grids:
        assert grids["bp"] == _parse_int_array(src, "blockPurging")
    if "bf" in grids:
        assert grids["bf"] == _parse_int_array(src, "bfRatio")
    if "bb" in grids:
        assert grids["bb"] == _parse_int_array(src, _BB_NAME[method])


def test_join_registry_matches_reference_sources():
    with open("/root/reference/joins/src/joins/TopKSchemaAgnosticJoin.java") as f:
        src = f.read()
    assert C.JOIN_TUNED["topk_schema_agnostic"]["k"] == _parse_int_array(src, "K")
    with open("/root/reference/joins/src/joins/SchemaAgnosticEJoin.java") as f:
        src = f.read()
    m = re.search(r"float\[\]\s+threshold\s*=\s*\{([^}]*)\}", src)
    want = tuple(float(x.strip().rstrip("f")) for x in m.group(1).split(","))
    assert C.JOIN_TUNED["epsilon_schema_agnostic"]["threshold"] == want


def test_grid_decoding():
    # BlockFiltering DblGrid(1.0, 0.025, 0.025): id 8 -> 0.225, 39 -> 1.0
    assert abs(C.bf_ratio_from_grid(8) - 0.225) < 1e-12
    assert abs(C.bf_ratio_from_grid(39) - 1.0) < 1e-12
    # weighting grid order = the 3.01 enum declaration order
    assert C.weight_scheme_from_grid(0) == "CBS"
    assert C.weight_scheme_from_grid(5) == "EJS"
    assert C.weight_scheme_from_grid(11) == "SIZE_NORM_CBS"
    assert C.weight_scheme_from_grid(14) == "SIZE_NORM_JS"
    # SuffixArrays id = 5*(max_freq-1) + (min_len-2)
    assert C.suffix_conf_from_grid(209) == (42, 6)
    assert C.suffix_conf_from_grid(5) == (2, 2)
    # ExtendedQGrams id = 3*(q-2) + threshold step
    q, t = C.extended_qgrams_conf_from_grid(14)
    assert q == 6 and abs(t - 0.9) < 1e-9


def test_from_reference_token_blocking_l1_d4():
    cfg = C.from_reference("token_blocking", "L1", "D4")
    assert cfg.block_purging is True
    assert abs(cfg.bf_ratio - 0.225) < 1e-12
    assert cfg.weight_scheme == "EJS"
    assert cfg.mb_algorithm == "RECIPROCAL_CARDINALITY_NODE_PRUNING"


def test_from_reference_suffix_l2_d10():
    cfg = C.from_reference("suffix_arrays_blocking", "L2", "D10")
    assert cfg.bf_ratio is None  # suffix drivers run no BlockFiltering
    assert (cfg.max_suffix_frequency, cfg.min_suffix_length) == C.suffix_conf_from_grid(474)
    assert cfg.weight_scheme == "SIZE_NORM_COSINE"
    assert cfg.mb_algorithm == "WEIGHTED_EDGE_PRUNING"


# ------------------------- new weighting schemes: hand-computed semantics


@pytest.fixture(scope="module")
def toy_blocks(spark):
    # dirty blocks: b1={1,2,3}, b2={1,2}, b3={2,3,4}
    rows = [
        ("b1", "A", "1"), ("b1", "A", "2"), ("b1", "A", "3"),
        ("b2", "A", "1"), ("b2", "A", "2"),
        ("b3", "A", "2"), ("b3", "A", "3"), ("b3", "A", "4"),
    ]
    df = spark.createDataFrame(rows, "block_key string, side string, doc_id string")
    df.cache().count()
    return df


def _weights(blocks, scheme):
    from continuousfilteringbenchmark_spark.operators import metablocking as MB

    return {
        (r.left_id, r.right_id): r.weight
        for r in MB.weighted_pairs(blocks, scheme, clean_clean=False).collect()
    }


def test_cosine_dice_weights(toy_blocks):
    # nb: 1->2 blocks, 2->3, 3->2, 4->1 ; cbs(1,2)=2, cbs(2,3)=2, cbs(3,4)=1
    w = _weights(toy_blocks, "COSINE")
    assert abs(w[("1", "2")] - 2 / math.sqrt(2 * 3)) < 1e-12
    assert abs(w[("3", "4")] - 1 / math.sqrt(2 * 1)) < 1e-12
    w = _weights(toy_blocks, "DICE")
    assert abs(w[("2", "3")] - 2 * 2 / (3 + 2)) < 1e-12


def test_cardinality_norm_weights(toy_blocks):
    # comparisons: b1=3, b2=1, b3=3 -> norm 1/3, 1, 1/3
    # cn per entity: 1 -> 1/3+1=4/3 ; 2 -> 1/3+1+1/3=5/3 ; 3 -> 2/3 ; 4 -> 1/3
    # cn(1,2) = 1/3 + 1 = 4/3 (common blocks b1,b2)
    w = _weights(toy_blocks, "CARDINALITY_NORM_CBS")  # == ARCS
    assert abs(w[("1", "2")] - 4 / 3) < 1e-12
    w = _weights(toy_blocks, "CARDINALITY_NORM_COSINE")
    assert abs(w[("1", "2")] - (4 / 3) / math.sqrt((4 / 3) * (5 / 3))) < 1e-12
    w = _weights(toy_blocks, "CARDINALITY_NORM_JS")
    assert abs(w[("1", "2")] - (4 / 3) / (4 / 3 + 5 / 3 - 4 / 3)) < 1e-12


def test_size_norm_weights(toy_blocks):
    # sizes: b1=3, b2=2, b3=3 -> norm 1/3, 1/2, 1/3
    # sn(1,2) = 1/3 + 1/2 = 5/6 ; sn_1 = 5/6 ; sn_2 = 1/3+1/2+1/3 = 7/6
    w = _weights(toy_blocks, "SIZE_NORM_CBS")
    assert abs(w[("1", "2")] - 5 / 6) < 1e-12
    w = _weights(toy_blocks, "SIZE_NORM_DICE")
    assert abs(w[("1", "2")] - 2 * (5 / 6) / (5 / 6 + 7 / 6)) < 1e-12
    w = _weights(toy_blocks, "SIZE_NORM_JS")
    assert abs(w[("1", "2")] - (5 / 6) / (5 / 6 + 7 / 6 - 5 / 6)) < 1e-12


def test_scheme_aliases(toy_blocks):
    assert _weights(toy_blocks, "ARCS") == _weights(toy_blocks, "CARDINALITY_NORM_CBS")
    assert _weights(toy_blocks, "X2") == _weights(toy_blocks, "PEARSON_X2")


def test_prune_dispatch(spark, toy_blocks):
    from continuousfilteringbenchmark_spark.operators import metablocking as MB

    weighted = MB.weighted_pairs(toy_blocks, "JS", clean_clean=False)
    for method, level in sorted(C.BLOCKING_TUNED):
        for d in ("D1", "D4", "D10"):
            cfg = C.from_reference(method, level, d)
            out = C.prune(weighted, cfg, blocks=toy_blocks)
            assert set(out.columns) == {"left_id", "right_id", "weight"}
    # every algorithm name in the registry is dispatchable
    algs = {a for g in C.BLOCKING_TUNED.values() for a in g["mb"]}
    assert algs <= {
        "WEIGHTED_EDGE_PRUNING", "WEIGHTED_NODE_PRUNING", "CARDINALITY_EDGE_PRUNING",
        "CARDINALITY_NODE_PRUNING", "RECIPROCAL_CARDINALITY_NODE_PRUNING",
        "RECIPROCAL_WEIGHTING_NODE_PRUNING", "BLAST",
    }
    # and every weighting-scheme id decodes to an implemented scheme
    from continuousfilteringbenchmark_spark.operators.metablocking import WEIGHT_SCHEMES

    for g in C.BLOCKING_TUNED.values():
        for i in g["ws"]:
            assert C.weight_scheme_from_grid(i) in WEIGHT_SCHEMES


def test_tuned_workflow_query_decodes_documented_cell():
    """__spark_entry__.q_tuned_workflow replays 'D9 at L2' through the
    registry; pin the decoded operating point it documents (purging on,
    BlockFiltering 0.625, JS, reciprocal CNP — l2/TokenBlocking.java:34-47
    index 8) so a registry edit can't silently change the query."""
    import continuousfilteringbenchmark_spark.configs as C

    cfg = C.from_reference("token_blocking", "L2", "D9")
    assert cfg.block_purging is True
    assert cfg.bf_ratio == 0.625
    assert cfg.weight_scheme == "JS"
    assert cfg.mb_algorithm == "RECIPROCAL_CARDINALITY_NODE_PRUNING"


def test_bf_grid0_follows_each_drivers_quality_pass():
    """Grid id 0: the quality-defining pass of l1/QGramsBlocks.java:78 and
    ExtendedQGramsBlocks.java:78 (all levels) tests `0 <= bfRatio` — id 0
    applies BlockFiltering at ratio 0.025; TokenBlocking (off-sentinel -1,
    `0 <` at :76) and l2/l3 QGramsBlocks skip at 0."""
    # (qgrams, L1, D1): bf id 0 -> applies at 0.025
    assert abs(C.from_reference("qgrams_blocking", "L1", "D1").bf_ratio - 0.025) < 1e-12
    # extended qgrams: id 0 applies at every level
    for level, ds in [("L1", ["D1", "D4", "D8"]), ("L2", ["D1"]), ("L3", ["D1"])]:
        for d in ds:
            cfg = C.from_reference("extended_qgrams_blocking", level, d)
            assert abs(cfg.bf_ratio - 0.025) < 1e-12, (level, d)
    # token blocking: -1 sentinel means off (l1 D6)
    assert C.from_reference("token_blocking", "L1", "D6").bf_ratio is None


def test_join_config_decodes_reversed_cells():
    """from_reference_join carries the kNN drivers' direction flag
    (TopKSchemaAgnosticJoin.java:29 / TopKSchemaBasedJoin.java) plus the
    per-dataset K / similarity / tokenizer as data, so replaying a tuned
    run is turnkey — reversal is no longer a call-site convention."""
    cfg = C.from_reference_join("topk", "D1")
    assert (cfg.k, cfg.reversed) == (1, True)
    assert cfg.similarity == "dice"
    assert cfg.tokenizer == "CHARACTER_FOURGRAMS_MULTISET"
    assert C.from_reference_join("topk", "D2").reversed is False
    sb = C.from_reference_join("topk", "D8", schema_based=True)
    assert (sb.k, sb.reversed, sb.attribute) == (6, True, "Title")
    eps = C.from_reference_join("epsilon", "D4")
    assert eps.threshold == 0.58 and eps.similarity == "jaccard"
    assert eps.reversed is False  # epsilon drivers have no direction flag


def test_tokenizer_column_names_round_trip():
    import pytest

    for name in (
        "WHITESPACE", "WHITESPACE_MULTISET",
        "CHARACTER_BIGRAMS", "CHARACTER_TRIGRAMS_MULTISET",
        "CHARACTER_FOURGRAMS", "CHARACTER_FIVEGRAMS_MULTISET",
    ):
        C.tokenizer_column(name, __import__("pyspark").sql.functions.lit("abcdef"))
    with pytest.raises(ValueError):
        C.tokenizer_column("CHARACTER_SIXGRAMS", None)
