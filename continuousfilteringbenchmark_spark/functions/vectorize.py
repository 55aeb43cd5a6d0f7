"""Shingling vectorizers (SURVEY.md §2 P9/P10): global n-gram vocabulary +
per-entity count / boolean vectors.

Parity targets (reference, read-only at /root/reference):

* P9  ``nnmethods/minhashLSH/src/minhash/ShinglingModel.java:18-105`` —
  build a global shingle vocabulary over the corpus, then represent each
  entity as an int vector of per-shingle occurrence counts;
* P10 ``nnmethods/scalabilityAnalysis/MH_LSH.py:17-55`` — the same idea
  with a boolean vector over a global ``ngrams_index`` list.

Round 1 skipped both by design (the dense vector is only an artifact of the
java-lsh API — our minhash consumes token sets directly). They are still
part of the reference's public surface, so they exist here as first-class
operators with the one representation that survives 100 TB: the SPARSE COO
table ``(doc_id, vocab_id, cnt)``. A dense ``array<int>`` of |vocabulary|
entries per row would be |docs| x |vocab| cells — dead at corpus scale —
while the COO form is exactly the non-zero entries and feeds any downstream
consumer (LSH, cosine, a CountVectorizer-style ML stage) via joins.

Scale notes:

* the vocabulary index must be DENSE [0, D) and DETERMINISTIC (sorted token
  order, the contract ShinglingModel's HashMap insertion loop only gives
  per-run). A ``row_number()`` over a global window would funnel every
  distinct token through one task; ``sortBy + zipWithIndex`` is the
  distributed equivalent (range-partitioned sort, then per-partition offsets
  from partition sizes) — the one RDD use SURVEY.md §2.7 licenses;
* vector assembly is explode -> hash-agg -> join on ``tok`` (uniform keys,
  map-side combine); nothing is collected to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def shingle_vocabulary(
    toks: DataFrame, tokens_col: str = "tokens"
) -> DataFrame:
    """Global vocabulary: distinct tokens -> dense ids [0, D) in sorted order.

    Output: DataFrame(tok string, vocab_id long). Deterministic under any
    partitioning (ids follow the total sort order, not arrival order —
    unlike the reference's insertion-ordered HashMap which varies with scan
    order; sorted ids are the canonical choice and what the SQL oracle
    replays with ``row_number() OVER (ORDER BY tok)``).
    """
    vocab = toks.select(F.explode(F.col(tokens_col)).alias("tok")).distinct()
    indexed = (
        vocab.orderBy("tok")
        .rdd.map(lambda r: r[0])
        .zipWithIndex()
    )
    schema = T.StructType(
        [
            T.StructField("tok", T.StringType(), False),
            T.StructField("vocab_id", T.LongType(), False),
        ]
    )
    return toks.sparkSession.createDataFrame(indexed, schema)


def count_vectors(
    toks: DataFrame,
    vocab: DataFrame | None = None,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """P9 shingling count vectors, sparse COO form.

    ``tokens_col`` is the raw BAG (duplicates kept — ``tk.char_ngrams``);
    output (doc_id, vocab_id, cnt) = per-doc occurrence count of each
    vocabulary shingle, exactly ShinglingModel.java:18-105's
    ``vector[index]++`` loop re-expressed as explode -> count -> join.
    """
    if vocab is None:
        vocab = shingle_vocabulary(toks, tokens_col)
    ex = toks.select(F.col(id_col).alias("doc_id"), F.explode(F.col(tokens_col)).alias("tok"))
    counts = ex.groupBy("doc_id", "tok").agg(F.count("*").alias("cnt"))
    return counts.join(vocab, "tok").select("doc_id", "vocab_id", "cnt")


_TE_OFFSET = 1 << 39  # centers the 40-bit md5 draw on zero


def tuple_embedding(
    toks: DataFrame,
    dim: int = 16,
    tag: str = "te",
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic tuple embedding (the N7 DeepBlocker stand-in's encoder).

    The reference's DeepBlocker (``nnmethods/deepblocker/d4SA.py:17-27``)
    embeds each entity's aggregate value with a LEARNED AutoEncoder over
    pretrained fastText word vectors, then pairs with exact top-K cosine.
    The learned model is an external dependency with no deterministic spec,
    so this engine substitutes the classic feature-hashing embedding: every
    token maps to a pseudo-random vector whose j-th coordinate is an
    md5-derived integer in ``[-2^39, 2^39)`` (same construction as the LSH
    planes, ``operators/lsh.py hash_uniforms``), and the document embedding
    is the coordinate-wise SUM over its token set. Cosine is scale
    invariant, so sum-pooling equals the fastText-style mean-pooling — and
    keeping the coordinates as exact BIGINTs makes the aggregation
    order-independent at the bit level (a double mean would vary with
    shuffle order), which is what lets the DuckDB oracle replay the
    embedding exactly.

    Pure codegen: explode the token set, evaluate ``dim`` md5 expressions
    per token row, one hash aggregation on doc_id. At corpus scale this is
    one shuffle keyed by doc_id (uniform) with map-side partial sums.

    Output: (doc_id, vec array<bigint>), one row per doc with >= 1 token.
    """
    ex = toks.select(
        F.col(id_col).alias("doc_id"), F.explode(F.col(tokens_col)).alias("tok")
    )

    def coord(j: int):
        key = F.concat_ws(":", F.lit(tag), F.col("tok"), F.lit(str(j)))
        raw = F.conv(F.substring(F.md5(key), 1, 10), 16, 10).cast("long")
        return raw - F.lit(_TE_OFFSET)

    sums = [F.sum(coord(j)).alias(f"_e{j}") for j in range(dim)]
    agg = ex.groupBy("doc_id").agg(*sums)
    return agg.select(
        "doc_id", F.array(*[F.col(f"_e{j}") for j in range(dim)]).alias("vec")
    )


def bool_vectors(
    toks: DataFrame,
    vocab: DataFrame | None = None,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """P10 boolean n-gram vectors, sparse COO form.

    Output (doc_id, vocab_id): the set of vocabulary shingles present in the
    doc (``MH_LSH.py:17-55``'s 0/1 vector, non-zero coordinates only).
    """
    if vocab is None:
        vocab = shingle_vocabulary(toks, tokens_col)
    ex = (
        toks.select(F.col(id_col).alias("doc_id"), F.explode(F.col(tokens_col)).alias("tok"))
        .distinct()
    )
    return ex.join(vocab, "tok").select("doc_id", "vocab_id")
