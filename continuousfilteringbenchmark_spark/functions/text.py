"""Text-analysis functions for training-data pipelines (brief requirement):
language-ID, quality scoring, token counting, document fingerprinting.

All native ``pyspark.sql.functions`` expressions — these run over every doc
in the corpus, so they must stay inside whole-stage codegen (no Python).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from . import tokenize as tk

# tiny per-language marker lexicons (n-gram/stopword heuristic; deterministic,
# no external model — the container has no langid libs)
_LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "with", "for", "was"],
    "es": ["el", "la", "de", "que", "los", "las", "una", "por", "con", "para"],
    "fr": ["le", "la", "les", "des", "est", "une", "dans", "pour", "qui", "sur"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "von", "zu"],
}


def language_id(text: Column | str) -> Column:
    """Heuristic language id: argmax of marker-stopword hit counts; 'und'
    (undetermined) when nothing matches. Pure SQL: one pass over the token
    array per language (tiny constant)."""
    toks = tk.word_tokens(text)
    scores = [
        (lang, F.size(F.filter(toks, lambda t: t.isin(markers))))
        for lang, markers in _LANG_MARKERS.items()
    ]
    best_score = F.greatest(*[s for _, s in scores])
    label = F.lit("und")
    # last-wins chain ordered so earlier languages win ties deterministically
    for lang, s in reversed(scores):
        label = F.when((s == best_score) & (best_score > 0), F.lit(lang)).otherwise(label)
    return label


def token_count(text: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(tk.word_tokens(text))


def bpe_ish_token_count(text: Column | str) -> Column:
    """BPE-ish token estimate: word-piece style regex split (words, digits,
    punctuation runs) — a deterministic proxy for subword tokenizers."""
    c = F.col(text) if isinstance(text, str) else text
    pieces = F.filter(
        F.split(F.lower(c), r"(?<=[a-z0-9])(?=[^a-z0-9])|(?<=[^a-z0-9])(?=[a-z0-9])|\s+"),
        lambda x: F.trim(x) != "",
    )
    # long words count as ~1 token per 4 chars (subword pieces)
    return F.aggregate(
        pieces,
        F.lit(0),
        lambda acc, p: acc + F.greatest(F.ceil(F.length(p) / 4).cast("int"), F.lit(1)),
    )


def quality_score(text: Column | str) -> Column:
    """Composite quality score in [0,1]: length band + alpha ratio +
    stopword presence + mean word length band. Deterministic arithmetic."""
    c = F.col(text) if isinstance(text, str) else text
    toks = tk.word_tokens(c)
    n_toks = F.size(toks)
    n_chars = F.length(c)
    alpha_ratio = F.when(
        n_chars > 0,
        F.length(F.regexp_replace(F.lower(c), r"[^a-z ]", "")) / n_chars.cast("double"),
    ).otherwise(F.lit(0.0))
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(_LANG_MARKERS["en"])))
    stop_ratio = F.when(n_toks > 0, stop_hits / n_toks.cast("double")).otherwise(F.lit(0.0))
    mean_wlen = F.when(
        n_toks > 0,
        F.aggregate(toks, F.lit(0), lambda a, t: a + F.length(t)) / n_toks.cast("double"),
    ).otherwise(F.lit(0.0))
    len_band = F.when((n_toks >= 10) & (n_toks <= 10_000), F.lit(1.0)).otherwise(
        F.when(n_toks > 0, F.lit(0.5)).otherwise(F.lit(0.0))
    )
    wlen_band = F.when((mean_wlen >= 3.0) & (mean_wlen <= 10.0), F.lit(1.0)).otherwise(F.lit(0.5))
    score = (
        F.lit(0.3) * len_band
        + F.lit(0.3) * alpha_ratio
        + F.lit(0.2) * F.least(stop_ratio * 4, F.lit(1.0))
        + F.lit(0.2) * wlen_band
    )
    return F.round(score, 6)


def fingerprint(text: Column | str) -> Column:
    """Stable 128-bit document fingerprint of the normalized token sequence
    (token-order sensitive; whitespace/punct/case insensitive)."""
    return F.md5(F.array_join(tk.word_tokens(text), " "))
