"""Blocking workflow operators (SURVEY.md §2.3, B1-B8).

Pipeline shape (reference wiring:
``blockingWorkflows/src/blockingWorkflows/schemaAgnostic/TokenBlocking.java:64-83``)::

    block building -> block purging -> block filtering -> comparison cleaning

Internal representation: the exploded **block table**
``DataFrame(block_key string, side string, doc_id string)`` — one row per
(block, member). The reference's ``List<AbstractBlock>`` becomes this posting
table; Spark's shuffle on ``block_key`` *is* the inverted index
(SURVEY.md §1.4). ``side`` is 'A'/'B' for Clean-Clean ER, a single constant
for Dirty ER.

Scale notes: block-size stats are tiny aggregates (one row per distinct
block key / per distinct cardinality) — they broadcast. The only quadratic
danger is the pair-emission self-join, which purging/filtering bound, plus
an explicit salted-cap guard in ``pairs_from_blocks`` for residual skew.
"""

from __future__ import annotations

import itertools
import math
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import tokenize as tk

# ---------------------------------------------------------------- builders


def block_table(docs: DataFrame, keys: Column, side: Column | str = "side") -> DataFrame:
    """Generic block builder: explode a per-doc key array into the block table."""
    side_col = F.col(side) if isinstance(side, str) else side
    return (
        docs.select(
            F.col("doc_id"), side_col.alias("side"), F.explode(keys).alias("block_key")
        )
        .where(F.col("block_key").isNotNull() & (F.col("block_key") != ""))
        .select("block_key", "side", "doc_id")
        .distinct()
    )


def standard_blocking(docs: DataFrame, text_col: str = "text", side: str = "side") -> DataFrame:
    """B1 StandardBlocking / Token Blocking: one block per distinct
    schema-agnostic token (reference driver
    ``blockingWorkflows/.../schemaAgnostic/TokenBlocking.java:64-65``)."""
    return block_table(docs, tk.word_token_set(text_col), side)


def media_ref_blocking(docs: DataFrame, side: str = "side") -> DataFrame:
    """Media-axis blocking for interleaved text+media documents (north-rule
    extension — the reference's blocking is text-only): one block per
    ``media_ref``, so documents embedding the same media object are
    co-blocked (the web-scale signal: scraped mirrors and reposts reuse the
    identical image). Reads the media spans of the canonical docs shape
    (input_hint: spans array<struct<kind,text,media_ref,offset>>).

    Same block-table contract as B1 (``block_key, side, doc_id``), so
    purging / filtering / meta-blocking / pair emission compose unchanged —
    and a cross-modal workflow is just ``standard_blocking(...).unionByName(
    media_ref_blocking(...))`` fed to the same pipeline.
    """
    keys = F.transform(
        F.filter(F.col("spans"), lambda s: s["kind"] == F.lit("media")),
        lambda s: s["media_ref"],
    )
    return block_table(docs, keys, side)


# Soundex-style letter -> digit map (a..z): vowels+h,w,y -> 0, b,f,p,v -> 1,
# c,g,j,k,q,s,x,z -> 2, d,t -> 3, l -> 4, m,n -> 5, r -> 6
_PHONETIC_DIGITS = "01230120022455012623010202"


def phonetic_key(tok: Column) -> Column:
    """Soundex-FLAVORED phonetic key of one lowercase alphabetic token:
    first letter + first 3 digits of the (adjacent-duplicate-collapsed,
    zero-dropped) digit translation, right-padded with '0' to 4 chars.
    Deliberately defined by these exact string expressions — translate /
    regexp_replace / rpad exist identically in any SQL engine, so the
    DuckDB oracle replays the key byte-for-byte (ANSI Soundex's extra
    h/w-bridge rule is dropped: it changes <0.5% of keys and has no
    portable single-expression form)."""
    first = F.substring(tok, 1, 1)
    digits = F.translate(
        F.substring(tok, 2, 1_000_000), "abcdefghijklmnopqrstuvwxyz", _PHONETIC_DIGITS
    )
    # collapse runs per digit WITHOUT backreferences: RE2 engines (DuckDB)
    # reject (.)\1+, so the portable form is one disjoint replace per digit
    collapsed = digits
    for c in "0123456":
        collapsed = F.regexp_replace(collapsed, f"{c}{{2,}}", c)
    sig = F.regexp_replace(collapsed, "0", "")
    return F.rpad(F.concat(first, F.substring(sig, 1, 3)), 4, "0")


def phonetic_blocking(docs: DataFrame, text_col: str = "text", side: str = "side") -> DataFrame:
    """Phonetic blocking (Soundex-family — the classic dirty-name blocker:
    'smith'/'smyth'/'smithe' share a block that token blocking never
    builds). One block per distinct phonetic key of the doc's ALPHABETIC
    word tokens (digit-bearing tokens are skipped — the digit map is
    undefined for them). Emits the standard block-table contract
    (block_key, side, doc_id), so purging / filtering / meta-blocking /
    pair emission compose unchanged. Scale shape: identical to B1 (one
    explode + distinct); phonetic keys are COARSER than tokens, so hot-key
    skew is strictly worse than token blocking's — the same purging /
    salting guards apply and matter more."""
    toks = tk.word_token_set(text_col)
    keys = F.array_distinct(
        F.transform(
            F.filter(toks, lambda t: t.rlike("^[a-z]+$")), lambda t: phonetic_key(t)
        )
    )
    return block_table(docs, keys, side)


def qgrams_blocking(docs: DataFrame, q: int = 6, text_col: str = "text", side: str = "side") -> DataFrame:
    """B2 QGramsBlocking: keys = char q-grams of each token (default q=6,
    reference ``.../DefaultQGramsBlocks.java:54``)."""
    return block_table(docs, tk.token_qgrams(tk.word_token_set(text_col), q), side)


def suffix_arrays_blocking(
    docs: DataFrame,
    min_len: int = 6,
    max_frequency: int = 53,
    text_col: str = "text",
    side: str = "side",
) -> DataFrame:
    """B4 SuffixArraysBlocking: keys = suffixes (>= min_len) of tokens; keys
    occurring in more than ``max_frequency`` docs are dropped (reference
    ``.../SuffixArrays.java:29-35``; defaults are JedAI's)."""
    bt = block_table(docs, tk.token_suffixes(tk.word_token_set(text_col), min_len), side)
    freq = bt.groupBy("block_key").agg(F.count("*").alias("_freq"))
    keep = freq.where(F.col("_freq") <= max_frequency).select("block_key")
    return bt.join(F.broadcast(keep), "block_key", "left_semi")


def extended_suffix_arrays_blocking(
    docs: DataFrame,
    min_len: int = 6,
    max_frequency: int = 39,
    text_col: str = "text",
    side: str = "side",
) -> DataFrame:
    """B5 ExtendedSuffixArraysBlocking: all substrings >= min_len
    (reference ``.../ExtendedSuffixArrays.java:29-35``)."""
    bt = block_table(docs, tk.token_substrings(tk.word_token_set(text_col), min_len), side)
    freq = bt.groupBy("block_key").agg(F.count("*").alias("_freq"))
    keep = freq.where(F.col("_freq") <= max_frequency).select("block_key")
    return bt.join(F.broadcast(keep), "block_key", "left_semi")


def extended_qgrams_blocking(
    docs: DataFrame,
    q: int = 6,
    threshold: float = 0.95,
    text_col: str = "text",
    side: str = "side",
) -> DataFrame:
    """B3 ExtendedQGramsBlocking: for each token with L q-grams, keys are all
    concatenations of at least ceil(L * threshold) of its q-grams, in gram
    order (reference driver ``.../ExtendedQGramsBlocks.java:28-41``; semantics
    from the published JedAI operator). Combinatorial — generated in a
    vectorized pandas UDF (SURVEY.md §2.7 allows UDFs exactly here).
    """
    max_combo = 5  # JedAI caps combination depth (MAX_Q_GRAMS=6 area); bound the blowup

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def combo_keys(tokens: pd.Series) -> pd.Series:
        out = []
        for toks in tokens:
            keys: set[str] = set()
            for t in toks if toks is not None else []:
                grams = [t[i : i + q] for i in range(len(t) - q + 1)] or [t]
                L = len(grams)
                k = max(1, math.ceil(L * threshold))
                if L == 1 or k >= L:
                    keys.add("".join(grams))
                    continue
                if L - k > max_combo:
                    k = L - max_combo
                for r in range(k, L + 1):
                    for combo in itertools.combinations(range(L), r):
                        keys.add("".join(grams[i] for i in combo))
            out.append(sorted(keys))
        return pd.Series(out)

    with_keys = docs.select(
        "doc_id",
        F.col(side).alias("side"),
        combo_keys(tk.word_token_set(text_col)).alias("_keys"),
    )
    return (
        with_keys.select("doc_id", "side", F.explode("_keys").alias("block_key"))
        .where(F.col("block_key") != "")
        .select("block_key", "side", "doc_id")
        .distinct()
    )


def sorted_neighborhood_pairs(
    docs: DataFrame,
    window: int = 4,
    key: Column | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sorted Neighborhood blocking (Hernandez & Stolfo, SIGMOD '95) — a
    classic blocking family the reference suite omits, added to round out
    the blocking toolbox: sort all docs by a blocking key, slide a window
    of ``window`` docs over the sorted sequence, and emit every pair that
    co-occurs in some window, i.e. all pairs at sorted-rank distance
    < ``window``. Unlike key-equality blocking it catches near-miss keys
    (typos sort adjacently) and its candidate count is exactly
    ``(window-1) * n - window*(window-1)/2`` — linear, never skewed.

    ``key`` defaults to the normalized token sequence (schema-agnostic
    aggregate value). The total order is (key, doc_id), so ranks — and the
    output — are deterministic under any partitioning.

    Output: (id1, id2) canonical (least/greatest of the id column).

    Scale shape: the global rank is a range-partitioned sort +
    ``zipWithIndex`` (per-partition offsets, the same no-global-window
    idiom as ``vectorize.shingle_vocabulary``); pair emission explodes
    rank offsets 1..window-1 and equi-joins ``rank + off == rank'`` — a
    plain shuffle join on uniform keys (each rank value occurs once per
    side; no block-size skew by construction).
    """
    if key is None:
        key = F.array_join(tk.word_tokens(text_col), " ")
    keyed = docs.select(F.col(id_col).alias("doc_id"), key.alias("_k"))
    indexed = (
        keyed.orderBy("_k", "doc_id")
        .rdd.map(lambda r: r[0])
        .zipWithIndex()
    )
    schema = T.StructType(
        [
            T.StructField("doc_id", docs.schema[id_col].dataType, False),
            T.StructField("rnk", T.LongType(), False),
        ]
    )
    ranked = docs.sparkSession.createDataFrame(indexed, schema)
    offs = F.explode(F.array([F.lit(i) for i in range(1, window)]))
    left = ranked.withColumn("_off", offs)
    right = ranked.select(
        F.col("doc_id").alias("_rid"), F.col("rnk").alias("_rrnk")
    )
    return (
        left.join(right, F.col("rnk") + F.col("_off") == F.col("_rrnk"))
        .select(
            F.least("doc_id", "_rid").alias("id1"),
            F.greatest("doc_id", "_rid").alias("id2"),
        )
    )


# ------------------------------------------------------- block cleaning


def _block_stats(blocks: DataFrame, clean_clean: bool) -> DataFrame:
    """Per-block membership counts and comparison cardinality.

    Clean-Clean: ||b|| = |bA| * |bB|;  Dirty: ||b|| = n(n-1)/2.
    """
    if clean_clean:
        stats = blocks.groupBy("block_key").agg(
            F.sum(F.when(F.col("side") == "A", 1).otherwise(0)).alias("n_a"),
            F.sum(F.when(F.col("side") == "B", 1).otherwise(0)).alias("n_b"),
        )
        return stats.select(
            "block_key",
            (F.col("n_a") + F.col("n_b")).alias("block_size"),
            (F.col("n_a") * F.col("n_b")).cast("long").alias("comparisons"),
        )
    stats = blocks.groupBy("block_key").agg(F.count("*").alias("block_size"))
    return stats.select(
        "block_key",
        "block_size",
        (F.col("block_size") * (F.col("block_size") - 1) / 2).cast("long").alias("comparisons"),
    )


def purging_threshold(
    hist_pdf, smoothing: float = 1.025, clamp_factor: float = 25.0
) -> int:
    """Parameter-free comparison-cardinality cutoff for Block Purging.

    Derived from the published Block Purging heuristic (Papadakis et al.,
    "Comparison-based Block Purging"; invoked by the reference at
    ``blockingWorkflows/.../TokenBlocking.java:67-70`` — the exact scan lives
    inside the JedAI jar, so SURVEY.md risk #4 licenses re-deriving it from
    the published description and oracle-testing it). Scan distinct
    comparison cardinalities ascending with cumulative block assignments
    BC(h) and cumulative comparisons CC(h) (comparisons summed over EVERY
    block at each level, not once per distinct level); the cutoff is the
    LARGEST cardinality h where raising the cutoff to h still grows total
    comparisons by less than ``smoothing`` x the growth in assignments:

        CC(h) * BC(h-1) < smoothing * CC(h-1) * BC(h)

    Two robustness completions (both answer-changing degeneracies of the
    bare scan, both deterministic and replayed by the SQL oracle):

    * zero guard — a level is always justified when everything below it has
      CC = 0 (purging exists to cut comparisons; a cutoff below the first
      comparing level would keep only singleton blocks and return no pairs);
    * typicality clamp — the cutoff never drops below ``clamp_factor`` x the
      MEDIAN per-block comparison cardinality. Purging's published contract
      is "drop only the oversized stop-word blocks, negligible PC loss"; on
      smooth small-corpus histograms (no stop-word knee) the consecutive-
      ratio test otherwise walks to the bottom and purges nearly every
      block. A block within 25x the typical block is not a mega-block; one
      beyond it still falls to the scan exactly as before.

    ``hist_pdf``: pandas DF with one row per DISTINCT comparison cardinality,
    columns (comparisons, n_blocks, assignments). Only this grouped
    histogram ever reaches the driver — ~10^3-10^4 rows at any corpus size
    (one row per distinct block cardinality, never one per block).
    """
    import numpy as np

    g = hist_pdf.sort_values("comparisons").reset_index(drop=True)
    if g.empty:
        return 0
    cards = g["comparisons"].to_numpy()
    n_blocks = g["n_blocks"].to_numpy()
    bc = g["assignments"].cumsum().astype(float).tolist()
    cc = (g["comparisons"] * g["n_blocks"]).cumsum().astype(float).tolist()
    threshold = cards[0]
    for i in range(1, len(cards)):
        if cc[i] * bc[i - 1] < smoothing * cc[i - 1] * bc[i] or cc[i - 1] == 0:
            threshold = cards[i]
    # weighted median of the per-block cardinality multiset, interpolated
    # exactly as pandas Series.median()/DuckDB median() would be on the
    # expanded per-block rows (the oracle replays it as median(comp))
    total = int(n_blocks.sum())
    cum = np.cumsum(n_blocks)
    lo = cards[np.searchsorted(cum, (total - 1) // 2 + 1)]
    hi = cards[np.searchsorted(cum, total // 2 + 1)]
    clamp = math.floor(clamp_factor * ((float(lo) + float(hi)) / 2.0))
    return int(max(threshold, clamp))


def block_purging(
    blocks: DataFrame,
    clean_clean: bool,
    smoothing: float = 1.025,
    max_comparisons: int | None = None,
) -> DataFrame:
    """B6 ComparisonsBasedBlockPurging: drop blocks whose comparison
    cardinality exceeds the (parameter-free) cutoff. Reference invocation:
    ``.../TokenBlocking.java:67-70`` (Clean-Clean ``true``; Dirty variant
    ``blockingWorkflows/src/scalabilityAnalysis/TokenBlocking.java:59-60``).

    The histogram scan runs driver-side on the distinct-cardinality summary
    (one row per distinct block cardinality — tiny at any scale); the filter
    itself is a broadcast semi-join. This doubles as the primary skew guard:
    a stop-word token never becomes a 10^10-row join key.
    """
    stats = _block_stats(blocks, clean_clean)
    if max_comparisons is None:
        # group to the distinct-cardinality histogram IN SPARK: only
        # ~10^3-10^4 rows (one per distinct cardinality) reach the driver,
        # never one per block
        hist = (
            stats.groupBy("comparisons")
            .agg(F.count("*").alias("n_blocks"), F.sum("block_size").alias("assignments"))
            .toPandas()
        )
        max_comparisons = purging_threshold(hist, smoothing)
    keep = stats.where(F.col("comparisons") <= F.lit(max_comparisons)).select("block_key")
    return blocks.join(F.broadcast(keep), "block_key", "left_semi")


def block_filtering(blocks: DataFrame, ratio: float = 0.5, clean_clean: bool = True) -> DataFrame:
    """B7 BlockFiltering: keep each entity only in the ``round(ratio * n)``
    smallest of its n blocks (reference invocation
    ``.../TokenBlocking.java:72-76``; default ratio 0.5
    ``.../DefaultQGramsBlocks.java:59``).

    Ordering is by block comparison-cardinality ascending with block_key as
    the deterministic tie-break (the reference's tie order is list order —
    unstable across JVMs — so we pin a total order; tests cover ties).
    """
    stats = _block_stats(blocks, clean_clean).select("block_key", "comparisons")
    ranked = blocks.join(stats, "block_key")
    w = Window.partitionBy("side", "doc_id").orderBy(F.col("comparisons").asc(), F.col("block_key").asc())
    per_doc = Window.partitionBy("side", "doc_id")
    return (
        ranked.withColumn("_rank", F.row_number().over(w))
        .withColumn("_n", F.count("*").over(per_doc))
        .where(F.col("_rank") <= F.round(F.col("_n") * ratio).cast("int"))
        .select("block_key", "side", "doc_id")
    )


# ------------------------------------------------ pair emission (B8)


def pairs_from_blocks(
    blocks: DataFrame,
    clean_clean: bool,
    salt_cap: int | None = 10_000,
    with_block_key: bool = False,
    drop_log: list | None = None,
    store=None,
    stage: str = "pairs_from_blocks",
    salt_threshold: int | None = None,
) -> DataFrame:
    """B8 ComparisonPropagation: candidate pairs compared once regardless of
    how many blocks they co-occur in (reference
    ``blockingWorkflows/.../ParameterFreeWorkflow.java`` usage of
    ``ComparisonPropagation.refineBlocks``).

    Clean-Clean: A-side x B-side join per block; Dirty: self-join with
    ``left_id < right_id``. ``distinct`` de-duplicates across blocks.

    Scale note (north rule): purging bounds per-key postings and AQE
    skew-join splits the residue. Two explicit guards stack on top:

    * ``salt_threshold`` — **salted-key skew splitting** (SURVEY.md §4.2).
      Keys whose posting count exceeds the threshold are split into
      ``s = ceil(n / salt_threshold)`` salted sub-blocks: one join side
      carries ``pmod(xxhash64(doc_id), s)``, the other is replicated over
      all ``s`` salts (``explode(sequence(...))``), so each pair is still
      emitted and the per-task group shrinks from n x n to (n/s) x n — s
      tasks of linear input instead of one quadratic straggler that AQE
      cannot split further (AQE splits by partition, and a single mega-key
      is one partition). Output is IDENTICAL to the unsalted join (the
      trailing distinct absorbs the salt dimension). Normal keys get s = 1:
      no replication, one extra tiny column. The salt factors ride a
      broadcast of the (tiny) oversized-key list.
    * ``salt_cap`` — an assertion-style hard cap that *drops* keys even
      salting shouldn't attempt (a stop-word block at web scale is purging's
      job, not emission's). A dropped mega-block changes the answer, so
      drops must never be silent: pass ``store`` (a
      ``plans.stages.StageStore``) to append a ``{stage}__salt_cap_dropped``
      metrics row, and/or ``drop_log`` (a list) to receive
      ``(n_dropped_keys, n_dropped_rows)`` — both run one tiny aggregate
      over the block-size table only when a cap is set.
    """
    sizes = None
    if salt_cap is not None:
        sizes = blocks.groupBy("block_key").agg(F.count("*").alias("_n"))
        if drop_log is not None or store is not None:
            over = sizes.where(F.col("_n") > salt_cap).agg(
                F.count("*").alias("keys"), F.coalesce(F.sum("_n"), F.lit(0)).alias("rows")
            ).collect()[0]
            dropped = (int(over["keys"]), int(over["rows"]))
            if drop_log is not None:
                drop_log.append(dropped)
            if store is not None and dropped[0] > 0:
                store.append_metric(f"{stage}__salt_cap_dropped", rows=dropped[1])
        keep = sizes.where(F.col("_n") <= salt_cap).select("block_key")
        blocks = blocks.join(F.broadcast(keep), "block_key", "left_semi")

    join_keys = ["block_key"]
    lcols: list = []
    rcols: list = []
    if salt_threshold is not None:
        if sizes is None:
            sizes = blocks.groupBy("block_key").agg(F.count("*").alias("_n"))
        fat = sizes.where(F.col("_n") > salt_threshold).select(
            "block_key",
            F.ceil(F.col("_n") / F.lit(salt_threshold)).cast("int").alias("_s"),
        )
        blocks = blocks.join(F.broadcast(fat), "block_key", "left").withColumn(
            "_s", F.coalesce("_s", F.lit(1))
        )
        join_keys = ["block_key", "_g"]
        # one side hashes into its salt slot, the other replicates across
        # all of its key's slots — every pair still meets in exactly one
        # (block_key, _g) cell; s = 1 keys replicate into a single row
        lcols = [F.pmod(F.xxhash64("doc_id"), F.col("_s")).cast("int").alias("_g")]
        rcols = [F.explode(F.sequence(F.lit(0), F.col("_s") - 1)).alias("_g")]

    if clean_clean:
        left = blocks.where(F.col("side") == "A").select(
            F.col("block_key"), F.col("doc_id").alias("left_id"), *lcols
        )
        right = blocks.where(F.col("side") == "B").select(
            F.col("block_key"), F.col("doc_id").alias("right_id"), *rcols
        )
        pairs = left.join(right, join_keys)
    else:
        # salted self-join: each unordered pair is found from the salted row
        # of EACH endpoint (the other side replicated) — twice total,
        # absorbed by left<right + distinct exactly like multi-block
        # co-occurrence
        l = blocks.select("block_key", F.col("doc_id").alias("left_id"), *lcols)
        r = blocks.select("block_key", F.col("doc_id").alias("right_id"), *rcols)
        pairs = l.join(r, join_keys).where(F.col("left_id") < F.col("right_id"))
    cols = ["left_id", "right_id"] + (["block_key"] if with_block_key else [])
    return pairs.select(*cols).distinct()


# ------------------------------------------------ convenience container


@dataclass
class BlockingConfig:
    """One knob set instead of the reference's 30 driver copies
    (SURVEY.md §2.3: L1/L2/L3 differ only in config arrays)."""

    builder: str = "standard"  # standard | qgrams | extended_qgrams | suffix | extended_suffix
    q: int = 6
    suffix_min_len: int = 6
    suffix_max_freq: int = 53
    purge: bool = True
    purge_smoothing: float = 1.025
    filter_ratio: float | None = 0.5
    clean_clean: bool = True


def build_blocks(docs: DataFrame, cfg: BlockingConfig, text_col: str = "text") -> DataFrame:
    builders = {
        "standard": lambda: standard_blocking(docs, text_col),
        "qgrams": lambda: qgrams_blocking(docs, cfg.q, text_col),
        "extended_qgrams": lambda: extended_qgrams_blocking(docs, cfg.q, text_col=text_col),
        "suffix": lambda: suffix_arrays_blocking(
            docs, cfg.suffix_min_len, cfg.suffix_max_freq, text_col
        ),
        "extended_suffix": lambda: extended_suffix_arrays_blocking(
            docs, cfg.suffix_min_len, cfg.suffix_max_freq, text_col
        ),
    }
    blocks = builders[cfg.builder]()
    if cfg.purge:
        blocks = block_purging(blocks, cfg.clean_clean, cfg.purge_smoothing)
    if cfg.filter_ratio is not None:
        blocks = block_filtering(blocks, cfg.filter_ratio, cfg.clean_clean)
    return blocks
