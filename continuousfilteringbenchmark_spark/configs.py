"""The reference's tuned per-dataset configuration registry.

The benchmark's actual operating points are the per-dataset "magic number"
arrays in each driver of ``blockingWorkflowsL1L2L3`` (one array entry per
dataset D1..D10, one driver per blocking method x recall level L1/L2/L3)
and the joins drivers. They are GRID IDS into JedAI's numbered parameter
grids, not raw parameter values; this module ships both the verbatim
arrays (asserted against the cited sources by ``tests/test_configs.py``)
and the decoded engine-level parameters.

Grid-id decoding (read from the bundled ``jedai-core-3.01-SNAPSHOT.jar``
bytecode, the exact build the L1L2L3 drivers link against):

* ``BlockFiltering.setNumberedGridConfiguration(i)`` -> ratio
  ``0.025 * (i + 1)`` (DblGrid max=1.0 min=0.025 step=0.025;
  ``BlockFiltering.<init>``).
* comparison-cleaning ``setNumberedGridConfiguration(i)`` ->
  ``WeightingScheme.values()[i]`` over the 15-value enum (declaration
  order below; ``WeightedEdgePruning.setNumberedGridConfiguration``).
* ``QGramsBlocking`` -> ``q = 2 + i`` (IntGrid max=6 min=2 step=1 — the
  drivers pass ids past the nominal grid end unchecked, so id 6 -> q=8).
* ``SuffixArraysBlocking`` / ``ExtendedSuffixArraysBlocking`` ->
  ``max_frequency = 1 + i // 5``, ``min_length = 2 + i % 5``
  (gridMBSize = IntGrid(100,1,1), gridMSLength = IntGrid(6,2,1);
  ``SuffixArraysBlocking.setNumberedGridConfiguration``).
* ``ExtendedQGramsBlocking`` -> ``q = 2 + i // 3``,
  ``threshold = 0.8 + 0.05 * (i % 3)`` (gridThreshold =
  DblGrid(0.95,0.8,0.05) whose float32 config count is 3).

Blocking-driver sources (all ``/root/reference/blockingWorkflowsL1L2L3/
src/{l1,l2,l3}/``): ``TokenBlocking.java:34-47``, ``QGramsBlocks.java:
34-48``, ``SuffixArrays.java:31-44``, ``ExtendedQGramsBlocks.java:34-48``,
``ExtendedSuffixArrays.java:31-44``. Join sources: ``joins/src/joins/
SchemaAgnosticEJoin.java:31-41``, ``TopKSchemaAgnosticJoin.java:28-47``,
``SchemaBasedEJoin.java:31-40``, ``TopKSchemaBasedJoin.java:28-45``.
"""

from __future__ import annotations

from dataclasses import dataclass

# the 10 Clean-Clean dataset pairs, driver order (TokenBlocking.java:30-33)
DATASETS = tuple(f"D{i}" for i in range(1, 11))
DATASET_SOURCES = (
    ("restaurant1Profiles", "restaurant2Profiles"),
    ("abtProfiles", "buyProfiles"),
    ("amazonProfiles", "gpProfiles"),
    ("dblpProfiles", "acmProfiles"),
    ("imdbProfilesNEW", "tmdbProfiles"),
    ("imdbProfilesNEW", "tvdbProfiles"),
    ("tmdbProfiles", "tvdbProfiles"),
    ("walmartProfiles", "amazonProfiles2"),
    ("dblpProfiles2", "scholarProfiles"),
    ("imdbProfiles", "dbpediaProfiles"),
)

# WeightingScheme enum of jedai-core-3.01-SNAPSHOT, declaration order =
# grid-id order (decompiled enum static initializer)
WEIGHTING_SCHEME_GRID = (
    "CBS",
    "COSINE",
    "DICE",
    "ECBS",
    "JS",
    "EJS",
    "PEARSON_X2",
    "CARDINALITY_NORM_CBS",
    "CARDINALITY_NORM_COSINE",
    "CARDINALITY_NORM_DICE",
    "CARDINALITY_NORM_JS",
    "SIZE_NORM_CBS",
    "SIZE_NORM_COSINE",
    "SIZE_NORM_DICE",
    "SIZE_NORM_JS",
)


def weight_scheme_from_grid(i: int) -> str:
    return WEIGHTING_SCHEME_GRID[i]


def bf_ratio_from_grid(i: int) -> float:
    return 0.025 * (i + 1)


def qgrams_q_from_grid(i: int) -> int:
    return 2 + i


def suffix_conf_from_grid(i: int) -> tuple[int, int]:
    """(max_frequency, min_length)."""
    return 1 + i // 5, 2 + i % 5


def extended_qgrams_conf_from_grid(i: int) -> tuple[int, float]:
    """(q, combination_threshold)."""
    return 2 + i // 3, 0.8 + 0.05 * (i % 3)


# ---------------------------------------------------------------- blocking
# verbatim grid-id arrays per (method, level); index = dataset D1..D10.
# bp: block purging on iff > 0. bf: BlockFiltering grid id; whether grid id
# 0 means "apply at ratio 0.025" or "skip" follows the QUALITY-DEFINING
# pass of each driver (the one feeding BlocksPerformance), and the drivers
# are not uniform: the l1 QGramsBlocks and all three ExtendedQGramsBlocks
# drivers test `0 <= bfRatio[datasetId]` (QGramsBlocks.java:78,
# ExtendedQGramsBlocks.java:78 at every level), while TokenBlocking
# (l{1,2,3}/TokenBlocking.java:76, off-sentinel -1) and the l2/l3
# QGramsBlocks drivers test `0 <`. _BF_GRID0_APPLIES records the inclusive
# (method, level) cells. Suffix drivers run no BlockFiltering at all ->
# None. bb: block-building grid id (q for qgrams, combined id for
# suffix/extended). ws: weighting-scheme grid id.
# mb: comparison-cleaning algorithm enum name, verbatim.

_BF_GRID0_APPLIES = {
    ("qgrams_blocking", "L1"),
    ("extended_qgrams_blocking", "L1"),
    ("extended_qgrams_blocking", "L2"),
    ("extended_qgrams_blocking", "L3"),
}

_WEP = "WEIGHTED_EDGE_PRUNING"
_WNP = "WEIGHTED_NODE_PRUNING"
_CEP = "CARDINALITY_EDGE_PRUNING"
_CNP = "CARDINALITY_NODE_PRUNING"
_RCNP = "RECIPROCAL_CARDINALITY_NODE_PRUNING"
_RWNP = "RECIPROCAL_WEIGHTING_NODE_PRUNING"
_BLAST = "BLAST"

BLOCKING_TUNED: dict[tuple[str, str], dict[str, tuple]] = {
    ("token_blocking", "L1"): {
        "bp": (1, 1, 1, 1, 1, -1, -1, 1, 1, 1),
        "bf": (39, 24, 32, 8, 29, -1, 8, 15, 24, 39),
        "ws": (11, 14, 12, 5, 0, 0, 4, 7, 0, 6),
        "mb": (_WEP, _BLAST, _RCNP, _RCNP, _WEP, _RCNP, _RCNP, _RCNP, _RCNP, _BLAST),
    },
    ("token_blocking", "L2"): {
        "bp": (-1, -1, -1, 1, 1, -1, -1, 1, 1, -1),
        "bf": (1, 30, 21, 8, 39, 38, 13, 19, 24, 32),
        "ws": (11, 14, 12, 5, 0, 0, 0, 12, 4, 6),
        "mb": (_WEP, _BLAST, _RCNP, _RCNP, _RCNP, _RCNP, _RCNP, _RCNP, _RCNP, _BLAST),
    },
    ("token_blocking", "L3"): {
        "bp": (-1, -1, -1, 1, 1, -1, -1, 1, 1, 1),
        "bf": (1, 30, 28, 10, 39, 39, 34, 34, 30, 29),
        "ws": (11, 5, 12, 3, 3, 3, 0, 14, 0, 3),
        "mb": (_WEP, _BLAST, _CEP, _RWNP, _RCNP, _RCNP, _RCNP, _RCNP, _RCNP, _BLAST),
    },
    ("qgrams_blocking", "L1"): {
        "bb": (4, 2, 4, 4, 4, 4, 4, 4, 1, 6),
        "bp": (-1, 1, 1, 1, 1, -1, -1, 1, -1, -1),
        "bf": (0, 2, 27, 2, 16, 26, 6, 10, 20, 23),
        "ws": (7, 7, 12, 6, 10, 0, 0, 11, 6, 3),
        "mb": (_WEP, _RWNP, _RCNP, _RCNP, _WEP, _RCNP, _RCNP, _RCNP, _BLAST, _BLAST),
    },
    ("qgrams_blocking", "L2"): {
        "bb": (2, 2, 4, 4, 4, 4, 4, 3, 1, 2),
        "bp": (-1, -1, 1, 1, -1, -1, -1, 1, -1, 1),
        "bf": (1, 3, 37, 3, 16, 34, 8, 11, 20, 37),
        "ws": (0, 10, 12, 5, 7, 3, 11, 11, 6, 6),
        "mb": (_WEP, _RWNP, _RCNP, _WEP, _RCNP, _RCNP, _RCNP, _RCNP, _BLAST, _BLAST),
    },
    ("qgrams_blocking", "L3"): {
        "bb": (2, 2, 4, 4, 4, 4, 3, 4, 1, 2),
        "bp": (1, 1, -1, 1, -1, -1, 1, 1, -1, 1),
        "bf": (17, 8, 35, 4, 23, 35, 15, 23, 20, 37),
        "ws": (0, 14, 12, 10, 11, 11, 14, 11, 6, 1),
        "mb": (_RCNP, _BLAST, _RCNP, _WEP, _RCNP, _RCNP, _BLAST, _RCNP, _BLAST, _BLAST),
    },
    ("suffix_arrays_blocking", "L1"): {
        "bb": (5, 60, 209, 29, 144, 489, 49, 38, 494, 467),
        "ws": (6, 14, 12, 10, 3, 11, 10, 10, 0, 1),
        "mb": (_RWNP, _BLAST, _RCNP, _RWNP, _RCNP, _RCNP, _BLAST, _RWNP, _RCNP, _BLAST),
    },
    ("suffix_arrays_blocking", "L2"): {
        "bb": (5, 155, 404, 39, 164, 394, 79, 304, 499, 474),
        "ws": (6, 14, 12, 10, 10, 7, 14, 14, 1, 12),
        "mb": (_RWNP, _BLAST, _RCNP, _BLAST, _RWNP, _RWNP, _BLAST, _RCNP, _RCNP, _WEP),
    },
    ("suffix_arrays_blocking", "L3"): {
        "bb": (5, 496, 389, 59, 479, 494, 308, 472, 490, 499),
        "ws": (6, 12, 12, 10, 7, 11, 14, 11, 6, 12),
        "mb": (_RWNP, _BLAST, _CNP, _BLAST, _RWNP, _CNP, _BLAST, _RCNP, _BLAST, _WNP),
    },
    ("extended_qgrams_blocking", "L1"): {
        "bb": (6, 0, 14, 7, 8, 14, 2, 0, 14, 5),
        "bp": (-1, -1, 1, 1, 1, -1, -1, -1, -1, -1),
        "bf": (0, 1, 29, 0, 18, 38, 1, 0, 9, 23),
        "ws": (3, 12, 8, 6, 10, 0, 3, 7, 0, 6),
        "mb": (_WEP, _BLAST, _WEP, _RCNP, _BLAST, _RCNP, _RCNP, _WEP, _RCNP, _BLAST),
    },
    ("extended_qgrams_blocking", "L2"): {
        "bb": (6, 8, 14, 10, 2, 12, 8, 14, 14, 5),
        "bp": (-1, -1, 1, 1, 1, -1, 1, 1, -1, -1),
        "bf": (0, 31, 36, 2, 18, 38, 17, 13, 12, 29),
        "ws": (3, 13, 8, 5, 14, 0, 10, 7, 0, 6),
        "mb": (_WEP, _BLAST, _WEP, _WEP, _BLAST, _RCNP, _BLAST, _RCNP, _RCNP, _BLAST),
    },
    ("extended_qgrams_blocking", "L3"): {
        "bb": (2, 0, 14, 4, 14, 14, 8, 14, 14, 5),
        "bp": (-1, 1, -1, 1, -1, -1, 1, 1, -1, 1),
        "bf": (0, 33, 34, 2, 23, 32, 28, 26, 15, 33),
        "ws": (3, 10, 12, 10, 7, 11, 9, 11, 14, 1),
        "mb": (_WEP, _WNP, _RCNP, _WEP, _RCNP, _RCNP, _BLAST, _RCNP, _RCNP, _BLAST),
    },
    ("extended_suffix_arrays_blocking", "L1"): {
        "bb": (29, 20, 269, 29, 89, 124, 54, 39, 304, 394),
        "ws": (7, 10, 8, 10, 10, 12, 10, 9, 14, 12),
        "mb": (_WEP, _BLAST, _WEP, _RWNP, _RWNP, _RWNP, _BLAST, _RWNP, _RCNP, _RCNP),
    },
    ("extended_suffix_arrays_blocking", "L2"): {
        "bb": (10, 36, 414, 37, 199, 429, 104, 103, 419, 469),
        "ws": (14, 10, 8, 10, 10, 7, 10, 10, 6, 12),
        "mb": (_WEP, _BLAST, _WEP, _BLAST, _RWNP, _RWNP, _BLAST, _BLAST, _RCNP, _CNP),
    },
    ("extended_suffix_arrays_blocking", "L3"): {
        "bb": (29, 110, 454, 72, 399, 349, 419, 404, 469, 498),
        "ws": (3, 12, 12, 10, 8, 8, 12, 7, 12, 12),
        "mb": (_WEP, _BLAST, _WNP, _BLAST, _RWNP, _WNP, _BLAST, _RCNP, _BLAST, _CNP),
    },
}

# ------------------------------------------------------- dirty-ER (der/)
# The reference re-tunes every blocking driver for its 4 real Dirty-ER
# datasets (one entity collection, self-join blocks, Dirty block purging,
# UnilateralDuplicatePropagation gold counting). Verbatim grid-id arrays
# from ``blockingWorkflowsL1L2L3/src/{l1,l2,l3}/der/`` — dataset order
# (``l1/der/TokenBlocking.java:29``): cddbProfiles, coraProfiles,
# cddbtitle, coratitle. Every der driver tests ``0 <`` for BlockFiltering
# (exclusive sentinel at all levels, unlike the clean-clean drivers'
# non-uniform quirk) and constructs ``ComparisonsBasedBlockPurging(false)``.
# ``None`` in mb = the driver skips comparison cleaning entirely for that
# dataset (``l2/der/ExtendedQGramsBlocks.java:43-48``).

DER_DATASETS = ("cddb", "cora", "cddbtitle", "coratitle")
DER_DATASET_SOURCES = ("cddbProfiles", "coraProfiles", "cddbtitle", "coratitle")

DER_BLOCKING_TUNED: dict[tuple[str, str], dict[str, tuple]] = {
    # l1/der/TokenBlocking.java:43-50
    ("token_blocking", "L1"): {
        "bp": (-1, 1, 1, -1),
        "bf": (3, 37, 29, 37),
        "ws": (0, 2, 5, 6),
        "mb": (_WEP, _BLAST, _CEP, _BLAST),
    },
    # l2/der/TokenBlocking.java:43-50
    ("token_blocking", "L2"): {
        "bp": (1, 1, 1, -1),
        "bf": (4, 26, 33, -1),
        "ws": (0, 6, 0, 6),
        "mb": (_WEP, _WEP, _BLAST, _BLAST),
    },
    # l3/der/TokenBlocking.java:34-41
    ("token_blocking", "L3"): {
        "bp": (1, 1, -1, -1),
        "bf": (7, 26, 36, 35),
        "ws": (0, 0, 5, 5),
        "mb": (_WEP, _WEP, _WNP, _WNP),
    },
    # l1/der/QGramsBlocks.java:44-52
    ("qgrams_blocking", "L1"): {
        "bb": (3, 0, 0, 2),
        "bp": (-1, -1, 1, -1),
        "bf": (1, 13, 36, 39),
        "ws": (4, 5, 0, 5),
        "mb": (_WEP, _CEP, _RCNP, _CEP),
    },
    # l2/der/QGramsBlocks.java:35-43
    ("qgrams_blocking", "L2"): {
        "bb": (4, 1, 1, 2),
        "bp": (-1, -1, -1, -1),
        "bf": (2, 25, 27, 27),
        "ws": (6, 1, 6, 6),
        "mb": (_WEP, _BLAST, _RCNP, _BLAST),
    },
    # l3/der/QGramsBlocks.java:45-52
    ("qgrams_blocking", "L3"): {
        "bb": (4, 1, 0, 0),
        "bp": (-1, -1, -1, -1),
        "bf": (4, 27, 37, 21),
        "ws": (6, 1, 5, 6),
        "mb": (_WEP, _RCNP, _WEP, _WNP),
    },
    # l1/der/SuffixArrays.java:40-46
    ("suffix_arrays_blocking", "L1"): {
        "bb": (349, 450, 282, 369),
        "ws": (7, 3, 10, 5),
        "mb": (_BLAST, _BLAST, _BLAST, _WEP),
    },
    # l2/der/SuffixArrays.java:32-38
    ("suffix_arrays_blocking", "L2"): {
        "bb": (39, 345, 427, 491),
        "ws": (6, 6, 8, 6),
        "mb": (_BLAST, _WEP, _WEP, _BLAST),
    },
    # l3/der/SuffixArrays.java:32-38
    ("suffix_arrays_blocking", "L3"): {
        "bb": (59, 485, 425, 490),
        "ws": (6, 6, 5, 1),
        "mb": (_BLAST, _WEP, _WEP, _WEP),
    },
    # l1/der/ExtendedQGramsBlocks.java:35-48
    ("extended_qgrams_blocking", "L1"): {
        "bb": (11, 14, 14, 12),
        "bp": (1, -1, -1, -1),
        "bf": (1, 21, 38, 26),
        "ws": (6, 1, 1, 5),
        "mb": (_WEP, _BLAST, _RCNP, _CEP),
    },
    # l2/der/ExtendedQGramsBlocks.java:39-48 (third cell: cleaning skipped)
    ("extended_qgrams_blocking", "L2"): {
        "bb": (10, 11, 8, 11),
        "bp": (1, 1, -1, -1),
        "bf": (3, 19, 21, 37),
        "ws": (6, 5, 1, 6),
        "mb": (_WEP, _CEP, None, _BLAST),
    },
    # l3/der/ExtendedQGramsBlocks.java:39-47
    ("extended_qgrams_blocking", "L3"): {
        "bb": (8, 11, 0, 0),
        "bp": (-1, -1, 1, -1),
        "bf": (4, 30, 38, 39),
        "ws": (6, 11, 1, 1),
        "mb": (_WEP, _CEP, _WEP, _CNP),
    },
    # l1/der/ExtendedSuffixArrays.java:40-46
    ("extended_suffix_arrays_blocking", "L1"): {
        "bb": (168, 486, 227, 495),
        "ws": (7, 2, 10, 14),
        "mb": (_BLAST, _BLAST, _BLAST, _BLAST),
    },
    # l2/der/ExtendedSuffixArrays.java:40-46
    ("extended_suffix_arrays_blocking", "L2"): {
        "bb": (39, 330, 428, 473),
        "ws": (6, 6, 12, 5),
        "mb": (_BLAST, _WEP, _CEP, _WEP),
    },
    # l3/der/ExtendedSuffixArrays.java:40-46
    ("extended_suffix_arrays_blocking", "L3"): {
        "bb": (73, 448, 452, 496),
        "ws": (6, 6, 12, 12),
        "mb": (_BLAST, _RCNP, _WNP, _CNP),
    },
}

# -------------------------------------------------- schema-based blocking
# ``blockingWorkflowsL1L2L3/src/{l1,l2,l3}/schemaBased/``: profiles are
# pre-reduced to ONE attribute (P3 reduceProfilesToAttribute — the drivers
# read ``<dataset>_<attribute>`` files, ``l1/schemaBased/TokenBlocking.java:
# 27-29,44``) over 6 of the 10 clean-clean pairs; BilateralDuplicate-
# Propagation, ``ComparisonsBasedBlockPurging(true)``. BF sentinel quirk:
# the schemaBased QGramsBlocks and ExtendedQGramsBlocks quality passes test
# ``0 <=`` at every level (grid id 0 applies at ratio 0.025,
# ``l1/schemaBased/QGramsBlocks.java:75``), TokenBlocking tests ``0 <``;
# suffix drivers run no BlockFiltering.

SCHEMA_DATASETS = ("D1", "D2", "D3", "D4", "D8", "D9")
SCHEMA_ATTRIBUTES = ("Name", "Name", "Title", "Title", "Title", "Title")

_SCHEMA_BF_GRID0_APPLIES = {"qgrams_blocking", "extended_qgrams_blocking"}

SCHEMA_BLOCKING_TUNED: dict[tuple[str, str], dict[str, tuple]] = {
    # l1/schemaBased/TokenBlocking.java:32-41
    ("token_blocking", "L1"): {
        "bp": (-1, -1, -1, -1, 1, -1),
        "bf": (35, 21, 24, 8, -1, 14),
        "ws": (0, 14, 12, 6, 6, 0),
        "mb": (_RCNP, _BLAST, _RCNP, _RCNP, _RCNP, _RCNP),
    },
    # l2/schemaBased/TokenBlocking.java:32-40
    ("token_blocking", "L2"): {
        "bp": (-1, -1, -1, -1, -1, -1),
        "bf": (35, 31, 37, 9, 25, 20),
        "ws": (0, 13, 14, 3, 6, 0),
        "mb": (_RCNP, _BLAST, _BLAST, _RWNP, _BLAST, _RCNP),
    },
    # l3/schemaBased/TokenBlocking.java:32-40
    ("token_blocking", "L3"): {
        "bp": (-1, -1, -1, -1, 1, -1),
        "bf": (35, 36, -1, 9, 37, 23),
        "ws": (11, 5, 13, 3, 5, 6),
        "mb": (_RCNP, _BLAST, _BLAST, _RWNP, _BLAST, _RCNP),
    },
    # l1/schemaBased/QGramsBlocks.java:32-41
    ("qgrams_blocking", "L1"): {
        "bb": (4, 2, 3, 4, 4, 4),
        "bp": (-1, 1, 1, -1, -1, -1),
        "bf": (37, 24, 24, 3, 24, 9),
        "ws": (0, 10, 14, 3, 7, 4),
        "mb": (_RCNP, _WEP, _BLAST, _RCNP, _RCNP, _RCNP),
    },
    # l2/schemaBased/QGramsBlocks.java:32-41
    ("qgrams_blocking", "L2"): {
        "bb": (4, 2, 1, 4, 1, 4),
        "bp": (-1, 1, -1, -1, 1, -1),
        "bf": (37, 35, 18, 3, 26, 12),
        "ws": (0, 10, 6, 5, 6, 3),
        "mb": (_RCNP, _BLAST, _BLAST, _WEP, _RCNP, _RCNP),
    },
    # l3/schemaBased/QGramsBlocks.java:32-41
    ("qgrams_blocking", "L3"): {
        "bb": (2, 2, 1, 4, 1, 1),
        "bp": (-1, -1, -1, -1, -1, -1),
        "bf": (32, 18, 30, 3, 36, 21),
        "ws": (3, 8, 6, 5, 6, 6),
        "mb": (_RCNP, _BLAST, _BLAST, _WEP, _BLAST, _BLAST),
    },
    # l1/schemaBased/SuffixArrays.java:30-37
    ("suffix_arrays_blocking", "L1"): {
        "bb": (49, 91, 240, 480, 494, 497),
        "ws": (0, 14, 10, 6, 13, 14),
        "mb": (_RCNP, _BLAST, _BLAST, _BLAST, _BLAST, _BLAST),
    },
    # l2/schemaBased/SuffixArrays.java:30-37
    ("suffix_arrays_blocking", "L2"): {
        "bb": (49, 170, 340, 480, 474, 499),
        "ws": (0, 14, 14, 6, 12, 0),
        "mb": (_RCNP, _BLAST, _BLAST, _BLAST, _WEP, _WNP),
    },
    # l3/schemaBased/SuffixArrays.java:30-37
    ("suffix_arrays_blocking", "L3"): {
        "bb": (99, 290, 480, 480, 496, 499),
        "ws": (14, 5, 5, 6, 1, 0),
        "mb": (_RCNP, _BLAST, _BLAST, _BLAST, _CNP, _WNP),
    },
    # l1/schemaBased/ExtendedQGramsBlocks.java:32-41
    ("extended_qgrams_blocking", "L1"): {
        "bb": (5, 0, 8, 9, 14, 14),
        "bp": (-1, -1, 1, -1, -1, -1),
        "bf": (38, 5, 21, 1, 22, 12),
        "ws": (0, 10, 14, 5, 7, 3),
        "mb": (_RCNP, _BLAST, _BLAST, _WEP, _RCNP, _RCNP),
    },
    # l2/schemaBased/ExtendedQGramsBlocks.java:32-41
    ("extended_qgrams_blocking", "L2"): {
        "bb": (5, 0, 5, 9, 14, 14),
        "bp": (-1, -1, -1, -1, -1, -1),
        "bf": (38, 9, 36, 1, 39, 15),
        "ws": (0, 10, 14, 5, 11, 14),
        "mb": (_RCNP, _WNP, _BLAST, _WEP, _RCNP, _RCNP),
    },
    # l3/schemaBased/ExtendedQGramsBlocks.java:32-41
    ("extended_qgrams_blocking", "L3"): {
        "bb": (2, 0, 5, 1, 5, 14),
        "bp": (-1, -1, -1, -1, -1, -1),
        "bf": (31, 25, 30, 0, 35, 28),
        "ws": (0, 8, 12, 5, 5, 0),
        "mb": (_RCNP, _WEP, _BLAST, _RWNP, _BLAST, _RCNP),
    },
    # l1/schemaBased/ExtendedSuffixArrays.java:30-37
    ("extended_suffix_arrays_blocking", "L1"): {
        "bb": (54, 21, 217, 68, 477, 499),
        "ws": (0, 10, 10, 10, 12, 12),
        "mb": (_RCNP, _BLAST, _BLAST, _BLAST, _RCNP, _BLAST),
    },
    # l2/schemaBased/ExtendedSuffixArrays.java:30-37
    ("extended_suffix_arrays_blocking", "L2"): {
        "bb": (54, 41, 301, 102, 454, 499),
        "ws": (0, 10, 8, 10, 7, 1),
        "mb": (_RCNP, _BLAST, _BLAST, _BLAST, _WNP, _CEP),
    },
    # l3/schemaBased/ExtendedSuffixArrays.java:30-37
    ("extended_suffix_arrays_blocking", "L3"): {
        "bb": (99, 160, 352, 496, 496, 499),
        "ws": (14, 8, 10, 10, 1, 1),
        "mb": (_RCNP, _BLAST, _WEP, _BLAST, _CNP, _CEP),
    },
}

# ------------------------------------------------------------------- joins
# SchemaAgnosticEJoin.java:31-41 / TopKSchemaAgnosticJoin.java:28-47 /
# SchemaBasedEJoin.java:31-40 / TopKSchemaBasedJoin.java:28-45.
# Values are VERBATIM driver literals (thresholds are the floats printed
# in the source; tokenizer/similarity are the enum names).

JOIN_TUNED: dict[str, dict[str, tuple]] = {
    "epsilon_schema_agnostic": {
        "threshold": (0.82, 0.26, 0.08, 0.58, 0.16, 0.34, 0.49, 0.28, 0.35, 0.15),
        "similarity": ("COSINE", "COSINE", "COSINE", "JACCARD", "COSINE",
                       "COSINE", "COSINE", "JACCARD", "JACCARD", "COSINE"),
        "tokenizer": ("WHITESPACE", "CHARACTER_TRIGRAMS", "CHARACTER_FIVEGRAMS",
                      "WHITESPACE", "CHARACTER_FIVEGRAMS_MULTISET",
                      "CHARACTER_BIGRAMS", "WHITESPACE_MULTISET",
                      "CHARACTER_TRIGRAMS_MULTISET", "CHARACTER_TRIGRAMS_MULTISET",
                      "WHITESPACE"),
    },
    "topk_schema_agnostic": {
        "k": (1, 4, 26, 1, 1, 1, 1, 2, 1, 5),
        "reversed": (True, False, True, False, False, False, False, True, True, True),
        "similarity": ("DICE", "COSINE", "COSINE", "COSINE", "COSINE",
                       "COSINE", "COSINE", "COSINE", "COSINE", "COSINE"),
        "tokenizer": ("CHARACTER_FOURGRAMS_MULTISET", "CHARACTER_TRIGRAMS_MULTISET",
                      "CHARACTER_FIVEGRAMS_MULTISET", "CHARACTER_BIGRAMS_MULTISET",
                      "CHARACTER_FIVEGRAMS", "CHARACTER_FIVEGRAMS",
                      "CHARACTER_FIVEGRAMS", "CHARACTER_FOURGRAMS_MULTISET",
                      "CHARACTER_FOURGRAMS", "CHARACTER_FOURGRAMS"),
    },
    # the schema-based drivers cover 6 of the 10 datasets (D1-D4, D8, D9)
    "epsilon_schema_based": {
        "datasets": ("D1", "D2", "D3", "D4", "D8", "D9"),
        "threshold": (0.63, 0.38, 0.39, 1.00, 0.15, 0.74),
        "attribute": ("Name", "Name", "Title", "Title", "Title", "Title"),
        "similarity": ("COSINE",) * 6,
        "tokenizer": ("CHARACTER_FOURGRAMS", "CHARACTER_TRIGRAMS_MULTISET",
                      "CHARACTER_TRIGRAMS", "WHITESPACE", "CHARACTER_TRIGRAMS",
                      "CHARACTER_TRIGRAMS_MULTISET"),
    },
    "topk_schema_based": {
        "datasets": ("D1", "D2", "D3", "D4", "D8", "D9"),
        "k": (1, 3, 3, 1, 6, 1),
        "reversed": (True, False, True, False, True, True),
        "attribute": ("Name", "Name", "Title", "Title", "Title", "Title"),
        "similarity": ("COSINE",) * 6,
        "tokenizer": ("CHARACTER_FIVEGRAMS", "CHARACTER_BIGRAMS", "CHARACTER_TRIGRAMS",
                      "CHARACTER_TRIGRAMS", "CHARACTER_BIGRAMS", "CHARACTER_BIGRAMS_MULTISET"),
    },
}


@dataclass(frozen=True)
class ReferenceJoinConfig:
    """Decoded operating point of one tuned similarity-join driver cell.

    ``reversed`` is the kNN drivers' direction flag
    (``TopKSchemaAgnosticJoin.java:29,49-56`` / ``TopKSchemaBasedJoin.java``):
    when set, dataset-2 is read as the indexed SOURCE and dataset-1 as the
    queried TARGET (per-d1-entity top-k), with emission flipped back to
    (d1_id, d2_id) order (``TopKSchemaAgnosticJoin.java:164-170``).
    """

    dataset: str
    kind: str                       # "epsilon" | "topk"
    schema_based: bool
    similarity: str                 # engine name: cosine | dice | jaccard
    tokenizer: str                  # reference Tokenizer enum name
    threshold: float | None = None  # epsilon joins
    k: int | None = None            # top-k joins
    reversed: bool = False          # top-k joins only
    attribute: str | None = None    # schema-based joins


_SIM_ENUM = {"COSINE": "cosine", "DICE": "dice", "JACCARD": "jaccard"}
_NGRAM_SIZES = {"BIGRAMS": 2, "TRIGRAMS": 3, "FOURGRAMS": 4, "FIVEGRAMS": 5}


def from_reference_join(
    kind: str, dataset: str, schema_based: bool = False
) -> ReferenceJoinConfig:
    """Decode the tuned operating point of one join driver cell.

    ``kind``: epsilon | topk; ``dataset``: D1..D10 (schema-based drivers
    cover only their 6 published datasets).
    """
    key = f"{kind}_schema_{'based' if schema_based else 'agnostic'}"
    grid = JOIN_TUNED[key]
    d = grid.get("datasets", DATASETS).index(dataset)
    return ReferenceJoinConfig(
        dataset=dataset,
        kind=kind,
        schema_based=schema_based,
        similarity=_SIM_ENUM[grid["similarity"][d]],
        tokenizer=grid["tokenizer"][d],
        threshold=grid["threshold"][d] if "threshold" in grid else None,
        k=grid["k"][d] if "k" in grid else None,
        reversed=bool(grid["reversed"][d]) if "reversed" in grid else False,
        attribute=grid["attribute"][d] if "attribute" in grid else None,
    )


def tokenizer_column(name: str, col):
    """Reference ``Tokenizer`` enum name -> engine token Column over a text
    column (functions/tokenize.py implementations)."""
    from .functions import tokenize as tk

    if name == "WHITESPACE":
        return tk.word_token_set(col)
    if name == "WHITESPACE_MULTISET":
        return tk.word_token_multiset(col)
    parts = name.split("_")
    if parts[0] == "CHARACTER" and parts[1] in _NGRAM_SIZES:
        n = _NGRAM_SIZES[parts[1]]
        if name.endswith("_MULTISET"):
            return tk.char_ngram_multiset(col, n)
        return tk.char_ngram_set(col, n)
    raise ValueError(f"unknown tokenizer {name!r}")


@dataclass(frozen=True)
class ReferenceBlockingConfig:
    """Decoded engine parameters for one (method, level, dataset) cell.

    ``gold_counting``: the driver family's DuplicatePropagation semantics —
    ``"bilateral"`` (clean-clean: a gold pair counts in its one (d1, d2)
    orientation) or ``"unilateral"`` (Dirty: one id universe, a gold pair
    counts when found in EITHER order). ``attribute`` is set only by the
    schema-based cells (P3 projection target). ``mb_algorithm`` is ``None``
    when the driver skips comparison cleaning for the cell."""

    dataset: str
    level: str
    method: str
    block_purging: bool
    bf_ratio: float | None          # None = BlockFiltering skipped
    weight_scheme: str              # engine weighting-scheme name
    mb_algorithm: str | None        # reference ComparisonCleaningMethod name
    qgram: int | None = None        # q for (extended) q-grams methods
    min_suffix_length: int | None = None
    max_suffix_frequency: int | None = None
    combination_threshold: float | None = None  # extended q-grams
    attribute: str | None = None    # schema-based cells only
    gold_counting: str = "bilateral"


def _decode_cell(
    grids: dict[str, tuple],
    d: int,
    method: str,
    level: str,
    dataset: str,
    bf_grid0_applies: bool,
    **extra,
) -> ReferenceBlockingConfig:
    """Shared grid-id decode for the clean-clean, der and schema-based
    driver families — the families differ only in their verbatim arrays,
    their BF-grid-0 sentinel quirk and their gold-counting semantics."""
    kwargs: dict = {}
    if method in ("qgrams_blocking",):
        kwargs["qgram"] = qgrams_q_from_grid(grids["bb"][d])
    elif method == "extended_qgrams_blocking":
        q, t = extended_qgrams_conf_from_grid(grids["bb"][d])
        kwargs["qgram"], kwargs["combination_threshold"] = q, t
    elif method in ("suffix_arrays_blocking", "extended_suffix_arrays_blocking"):
        mf, ml = suffix_conf_from_grid(grids["bb"][d])
        kwargs["max_suffix_frequency"], kwargs["min_suffix_length"] = mf, ml
    bf = grids.get("bf")
    bf_ratio = None
    if bf is not None:
        cutoff = 0 if bf_grid0_applies else 1
        if bf[d] >= cutoff:
            bf_ratio = bf_ratio_from_grid(bf[d])
    bp = grids.get("bp")
    return ReferenceBlockingConfig(
        dataset=dataset,
        level=level,
        method=method,
        block_purging=bool(bp and bp[d] > 0),
        bf_ratio=bf_ratio,
        weight_scheme=weight_scheme_from_grid(grids["ws"][d]),
        mb_algorithm=grids["mb"][d],
        **kwargs,
        **extra,
    )


def from_reference(method: str, level: str, dataset: str) -> ReferenceBlockingConfig:
    """Decode the tuned operating point of (method, level, dataset).

    ``method``: token_blocking | qgrams_blocking | suffix_arrays_blocking |
    extended_qgrams_blocking | extended_suffix_arrays_blocking;
    ``level``: L1 | L2 | L3 (the paper's three recall targets);
    ``dataset``: D1..D10.
    """
    return _decode_cell(
        BLOCKING_TUNED[(method, level)],
        DATASETS.index(dataset),
        method,
        level,
        dataset,
        bf_grid0_applies=(method, level) in _BF_GRID0_APPLIES,
    )


def from_reference_der(method: str, level: str, dataset: str) -> ReferenceBlockingConfig:
    """Decode one Dirty-ER (der) tuned cell. ``dataset``: cddb | cora |
    cddbtitle | coratitle. Dirty semantics ride in the config: Dirty block
    purging/filtering (``clean_clean=False`` throughout) and
    ``gold_counting='unilateral'`` for the BlocksPerformance pass
    (``l1/der/TokenBlocking.java:60``)."""
    return _decode_cell(
        DER_BLOCKING_TUNED[(method, level)],
        DER_DATASETS.index(dataset),
        method,
        level,
        dataset,
        bf_grid0_applies=False,  # every der driver tests `0 <`
        gold_counting="unilateral",
    )


def from_reference_schema(
    method: str, level: str, dataset: str
) -> ReferenceBlockingConfig:
    """Decode one schema-based blocking tuned cell. ``dataset``: D1, D2,
    D3, D4, D8 or D9 (the 6 published pairs); the returned config carries
    the P3 projection ``attribute`` the driver's input files are reduced to
    (``l1/schemaBased/TokenBlocking.java:27,44``)."""
    return _decode_cell(
        SCHEMA_BLOCKING_TUNED[(method, level)],
        SCHEMA_DATASETS.index(dataset),
        method,
        level,
        dataset,
        bf_grid0_applies=method in _SCHEMA_BF_GRID0_APPLIES,
        attribute=SCHEMA_ATTRIBUTES[SCHEMA_DATASETS.index(dataset)],
    )


def prune(weighted, cfg: ReferenceBlockingConfig, blocks=None):
    """Apply the config's comparison-cleaning algorithm to a weighted pair
    table (operators/metablocking.py implementations)."""
    from .operators import metablocking as MB

    alg = cfg.mb_algorithm
    if alg == _WEP:
        return MB.wep(weighted)
    if alg == _WNP:
        return MB.wnp(weighted)
    if alg == _RWNP:
        return MB.wnp(weighted, reciprocal=True)
    if alg == _CEP:
        return MB.cep(weighted, blocks=blocks)
    if alg == _CNP:
        return MB.cnp(weighted, blocks=blocks)
    if alg == _RCNP:
        return MB.cnp(weighted, blocks=blocks, reciprocal=True)
    if alg == _BLAST:
        return MB.blast_prune(weighted)
    raise ValueError(f"unknown comparison-cleaning algorithm {alg!r}")


def build_blocks_from_reference(
    docs, cfg: ReferenceBlockingConfig, clean_clean: bool, text_col: str = "text"
):
    """Run the decoded blocking chain of one tuned operating point:
    builder (with its decoded q / threshold / suffix params) -> optional
    ComparisonsBasedBlockPurging -> optional BlockFiltering at the decoded
    ratio. ``docs`` is any table with (doc_id, <text_col>[, side])."""
    from .operators import blocking as B

    m = cfg.method
    if m == "token_blocking":
        blocks = B.standard_blocking(docs, text_col)
    elif m == "qgrams_blocking":
        blocks = B.qgrams_blocking(docs, cfg.qgram, text_col)
    elif m == "extended_qgrams_blocking":
        blocks = B.extended_qgrams_blocking(
            docs, cfg.qgram, cfg.combination_threshold, text_col
        )
    elif m == "suffix_arrays_blocking":
        blocks = B.suffix_arrays_blocking(
            docs, cfg.min_suffix_length, cfg.max_suffix_frequency, text_col
        )
    elif m == "extended_suffix_arrays_blocking":
        blocks = B.extended_suffix_arrays_blocking(
            docs, cfg.min_suffix_length, cfg.max_suffix_frequency, text_col
        )
    else:
        raise ValueError(f"unknown blocking method {m!r}")
    if cfg.block_purging:
        blocks = B.block_purging(blocks, clean_clean)
    if cfg.bf_ratio is not None:
        blocks = B.block_filtering(blocks, cfg.bf_ratio, clean_clean)
    return blocks


def candidate_pairs_from_reference(blocks, cfg: ReferenceBlockingConfig, clean_clean: bool):
    """The operating point's candidate generation: weight the block pairs
    with the decoded scheme, prune with the decoded comparison-cleaning
    algorithm. Output: (left_id, right_id[, weight]). A ``None``
    mb_algorithm (the der cells where the driver skips cleaning) yields
    plain comparison propagation — every distinct block pair."""
    from .operators import blocking as B
    from .operators import metablocking as MB

    if cfg.mb_algorithm is None:
        return B.pairs_from_blocks(blocks, clean_clean)
    weighted = MB.weighted_pairs(blocks, cfg.weight_scheme, clean_clean=clean_clean)
    return prune(weighted, cfg, blocks=blocks)


# -------------------------------------------------- derived NN operating points
# The N8 tuner (tuning.py) derives these IN-ENGINE the way the reference's
# ``findNN`` derives its #neighbors/#probes (``nnmethods/faiss/D4sa.py:
# 174-209``); the record below is the persisted handshake between a tuning
# run (scripts/tune_nn.py) and a replay — config as data, exactly like the
# verbatim grid registries above, but produced by the engine itself.


@dataclass(frozen=True)
class TunedNNPoint:
    """One tuner-derived NN operating point.

    ``method``: ``range_search_lsh`` (param = lsh_probes) or ``knn_ivf``
    (param = nprobe). ``fixed`` holds the frozen axes the search did not
    move (tables/bits/threshold or k/cells/seed/quantizer), so a replay is
    fully determined by this record alone."""

    method: str
    param: str
    value: int
    target_recall: float
    achieved_recall: float
    fixed: dict


def save_tuned_nn(point: TunedNNPoint, path: str) -> None:
    import dataclasses
    import json

    with open(path, "w") as f:
        json.dump(dataclasses.asdict(point), f, indent=2, sort_keys=True)


def load_tuned_nn(path: str) -> TunedNNPoint:
    import json

    with open(path) as f:
        d = json.load(f)
    return TunedNNPoint(**d)


def apply_tuned_nn(point: TunedNNPoint, vecs, id_col: str = "vec_id"):
    """Replay a tuner-derived operating point in-engine: build the exact
    candidate DataFrame the tuning run certified (same frozen axes, the
    tuned knob at its derived value)."""
    from .operators import dense as D

    if point.method == "range_search_lsh":
        return D.range_search(
            vecs,
            None,
            threshold=point.fixed["threshold"],
            id_col=id_col,
            method="lsh",
            lsh_tables=point.fixed["lsh_tables"],
            lsh_bits=point.fixed["lsh_bits"],
            lsh_probes=point.value,
        )
    if point.method == "knn_ivf":
        return D.knn_ivf(
            vecs,
            vecs,
            k=point.fixed["k"],
            n_cells=point.fixed["n_cells"],
            nprobe=point.value,
            seed=point.fixed.get("seed", 42),
            quantizer=point.fixed.get("quantizer", "sample"),
            id_col=id_col,
        )
    raise ValueError(f"unknown tuned-NN method {point.method!r}")
