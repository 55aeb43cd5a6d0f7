"""Tokenizers / representation models — native Spark SQL expressions only.

Parity targets (reference, read-only at /root/reference):

* normalize:      ``value.toLowerCase().trim()``
                  (``joins/src/utilities/RepresentationModel.java:70``)
* word set:       split on non-word chars, drop blanks, SET semantics
                  (``RepresentationModel.java:96-103``)
* word multiset:  duplicates reified as ``tok + occurrenceIndex`` (0-based)
                  (``RepresentationModel.java:104-115``)
* char n-grams:   sliding substrings; strings shorter than n keep the whole
                  string as the single gram (``RepresentationModel.java:24-42``)
* n-gram multiset: grams suffixed with per-gram occurrence counter
                  (``RepresentationModel.java:44-66``)

The occurrence-counter suffixing turns bag semantics into set semantics so
downstream Jaccard/cosine denominators match the reference exactly
(SURVEY.md risk #1). Everything here stays inside whole-stage codegen — no
Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize(c: Column | str) -> Column:
    """lower + trim (reference RepresentationModel.java:70)."""
    c = F.col(c) if isinstance(c, str) else c
    return F.lower(F.trim(c))


def word_tokens(c: Column | str) -> Column:
    """Whitespace/punct tokens, blanks dropped, duplicates KEPT, input order.

    Base bag used by both set and multiset variants.
    """
    c = F.col(c) if isinstance(c, str) else c
    return F.filter(F.split(normalize(c), r"[\W_]+"), lambda x: x != F.lit(""))


def word_token_set(c: Column | str) -> Column:
    """SET-semantics whitespace tokenizer (RepresentationModel.java:96-103).

    ``array_distinct`` keeps first-occurrence order, matching insertion order
    of the reference's LinkedHashSet-like behavior; ordering never matters
    downstream (sets feed explode/join).
    """
    return F.array_distinct(word_tokens(c))


def with_occurrence_suffix(arr: Column) -> Column:
    """Reify a bag as a set: each element becomes ``elem || occurrence_index``
    (0-based count of equal elements strictly before it).

    Parity: RepresentationModel.java:104-115 (words) / :44-66 (n-grams).
    O(n^2) per row but n is tokens-per-doc (small); stays codegen'd.
    """
    suffixed = F.zip_with(
        arr,
        F.sequence(F.lit(0), F.greatest(F.size(arr) - 1, F.lit(0))),
        lambda x, i: F.concat(
            x, F.size(F.filter(F.slice(arr, 1, i), lambda y: y == x)).cast("string")
        ),
    )
    return F.when(F.size(arr) == 0, arr).otherwise(suffixed)


def word_token_multiset(c: Column | str) -> Column:
    """Multiset whitespace tokenizer: ``tok+occurrenceIndex``."""
    return with_occurrence_suffix(word_tokens(c))


def char_ngrams(c: Column | str, n: int) -> Column:
    """Char n-gram BAG of a whole (normalized) string, in order.

    Short-string fallback: ``len < n`` keeps the whole string as one gram
    (RepresentationModel.java:26-29).
    """
    c = F.col(c) if isinstance(c, str) else c
    s = normalize(c)
    grams = F.transform(
        F.sequence(F.lit(1), F.length(s) - n + 1),
        lambda i: s.substr(i, F.lit(n)),
    )
    return F.when(F.length(s) < n, F.array(s)).otherwise(grams)


def char_ngram_set(c: Column | str, n: int) -> Column:
    """Char n-gram SET (RepresentationModel.java:24-42)."""
    return F.array_distinct(char_ngrams(c, n))


def char_ngram_multiset(c: Column | str, n: int) -> Column:
    """Char n-gram MULTISET with occurrence suffixes (RepresentationModel.java:44-66)."""
    return with_occurrence_suffix(char_ngrams(c, n))


def hash_token_set(arr: Column) -> Column:
    """Dictionary-free token encoding: token set -> sorted array<long> of
    xxhash64 ids.

    Scale rationale: ``array_intersect`` on string arrays hashes and compares
    full strings per element and the pair rows carry every token's bytes
    through the join; hashed longs keep the arrays primitive and ~5-10x
    narrower. (An earlier claim of "242s -> 2.5s" here was a measurement
    artifact: the timed ``count()`` let Catalyst prune the intersect column
    entirely. Honest numbers at 12.5M pairs / local[32]: jvm intersect
    ~220s, Arrow dictionary scorer ~111s before batching/prefilter tuning —
    see ``plans.pipeline.score_pairs``.) 64-bit ids make
    an in-pair collision (the only kind that could shift a score) ~n^2/2^64
    per pair — negligible even at 10^12 docs.
    """
    return F.array_sort(F.array_distinct(F.transform(arr, lambda t: F.xxhash64(t))))


def token_qgrams(tokens: Column, q: int) -> Column:
    """Distinct char q-grams over an array of tokens (QGramsBlocking keys,
    reference driver ``blockingWorkflows/.../QGramsBlocks.java:69-72``).
    Tokens shorter than q contribute themselves (JedAI behavior)."""
    grams = F.transform(
        tokens,
        lambda t: F.when(F.length(t) < q, F.array(t)).otherwise(
            F.transform(F.sequence(F.lit(1), F.length(t) - q + 1), lambda i: t.substr(i, F.lit(q)))
        ),
    )
    return F.array_distinct(F.flatten(grams))


def token_suffixes(tokens: Column, min_len: int) -> Column:
    """Distinct suffixes (length >= min_len) of each token; short tokens kept
    whole (SuffixArraysBlocking keys, ``blockingWorkflows/.../SuffixArrays.java:29-35``)."""
    sufs = F.transform(
        tokens,
        lambda t: F.when(F.length(t) < min_len, F.array(t)).otherwise(
            F.transform(
                F.sequence(F.lit(1), F.length(t) - min_len + 1),
                lambda i: t.substr(i, F.length(t)),
            )
        ),
    )
    return F.array_distinct(F.flatten(sufs))


def token_substrings(tokens: Column, min_len: int) -> Column:
    """Distinct substrings (length >= min_len) of each token; short tokens kept
    whole (ExtendedSuffixArraysBlocking keys, ``.../ExtendedSuffixArrays.java:29-35``).

    Substring count is O(len^2) per token — still a pure SQL expression via a
    flattened double sequence (lengths x start positions).
    """
    subs = F.transform(
        tokens,
        lambda t: F.when(F.length(t) < min_len, F.array(t)).otherwise(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(min_len), F.length(t)),
                    lambda ln: F.transform(
                        F.sequence(F.lit(1), F.length(t) - ln + 1),
                        lambda i: t.substr(i, ln),
                    ),
                )
            )
        ),
    )
    return F.array_distinct(F.flatten(subs))
