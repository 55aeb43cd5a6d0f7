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
