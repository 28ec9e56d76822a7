"""Text analysis operators: language ID, quality scoring, token counting,
document fingerprinting.  Pure Catalyst expressions (no Python per row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "token_count",
    "bpe_ish_token_count",
    "quality_features",
    "quality_score",
    "language_id",
    "fingerprint",
]

# Tiny per-language stopword lists for the n-gram/stopword-hit heuristic.
# Deliberately small: the operator pattern (array_intersect against a
# literal array, argmax across languages) is the point; lists are easily
# extended.
_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "was"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"],
    "fr": ["le", "la", "les", "et", "est", "pas", "une", "pour", "que", "dans"],
    "es": ["el", "la", "los", "de", "que", "es", "en", "un", "por", "con"],
}


def token_count(text_col: str = "content"):
    """Whitespace token count (matches the oracle-checked query)."""
    return F.size(F.split(F.col(text_col), r"\s+"))


def fast_token_count(text_col: str = "content"):
    """Single-space token count: ``len - len(remove ' ') + 1``.

    3.4x cheaper than the regex split at 16M rows (no token-array
    allocation, no regex machinery) and identical on single-space-
    normalized corpora; under-counts runs of mixed whitespace.  Used
    where the count feeds a scale-invariant FEATURE (drift vectors)
    rather than a reported statistic."""
    c = F.col(text_col)
    return F.length(c) - F.length(F.replace(c, F.lit(" "), F.lit(""))) + F.lit(1)


def bpe_ish_token_count(text_col: str = "content"):
    """BPE-flavored proxy: word pieces + digits + punctuation runs.

    A real tokenizer is model-specific; pipelines use this regex count as
    a cheap, monotone-correlated stand-in for budget accounting.
    """
    return F.size(
        F.regexp_extract_all(
            F.col(text_col), F.lit(r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"), F.lit(0)
        )
    )


def quality_features(text_col: str = "content"):
    """Struct of the standard quality signals (all JVM expressions)."""
    c = F.col(text_col)
    n_chars = F.length(c).cast("double")
    safe_chars = F.greatest(n_chars, F.lit(1.0))
    toks = F.split(c, r"\s+")
    n_toks = F.size(toks).cast("double")
    safe_toks = F.greatest(n_toks, F.lit(1.0))
    punct = F.length(F.regexp_replace(c, r"[^.!?,;:]", "")).cast("double")
    digits = F.length(F.regexp_replace(c, r"[^0-9]", "")).cast("double")
    upper = F.length(F.regexp_replace(c, r"[^A-Z]", "")).cast("double")
    uniq_ratio = (
        F.size(F.array_distinct(toks)).cast("double") / safe_toks
    )
    return F.struct(
        n_chars.alias("n_chars"),
        n_toks.alias("n_tokens"),
        (n_chars / safe_toks).alias("mean_token_len"),
        (punct / safe_chars).alias("punct_ratio"),
        (digits / safe_chars).alias("digit_ratio"),
        (upper / safe_chars).alias("upper_ratio"),
        uniq_ratio.alias("unique_token_ratio"),
    )


def quality_score(text_col: str = "content"):
    """[0,1] composite: length in a sane band, not punct/digit soup, and
    lexically diverse.  Thresholds follow common corpus-filtering folklore
    (Gopher-style rules); each term is a soft [0,1] gate."""
    qf = quality_features(text_col)
    len_ok = F.when(
        (qf["n_tokens"] >= 5) & (qf["n_tokens"] <= 100000), F.lit(1.0)
    ).otherwise(F.lit(0.0))
    tok_ok = F.when(
        (qf["mean_token_len"] >= 2) & (qf["mean_token_len"] <= 12), F.lit(1.0)
    ).otherwise(F.lit(0.0))
    punct_ok = F.lit(1.0) - F.least(
        F.lit(1.0), qf["punct_ratio"] * 4.0
    )
    digit_ok = F.lit(1.0) - F.least(F.lit(1.0), qf["digit_ratio"] * 3.0)
    diversity = F.least(F.lit(1.0), qf["unique_token_ratio"] * 1.25)
    return (
        (len_ok + tok_ok + punct_ok + digit_ok + diversity) / F.lit(5.0)
    ).alias("quality_score")


def language_id(text_col: str = "content"):
    """Stopword-hit argmax across languages; 'und' (undetermined) when no
    list scores at least 2 hits.  One array_intersect per language against
    a literal array — no shuffle, no UDF."""
    toks = F.array_distinct(
        F.split(F.lower(F.col(text_col)), r"[^a-záéíóúüäöñç]+")
    )
    scores = [
        (
            lang,
            F.size(
                F.array_intersect(
                    toks, F.array(*[F.lit(w) for w in words])
                )
            ),
        )
        for lang, words in _STOPWORDS.items()
    ]
    best_score = F.greatest(*[s for _, s in scores])
    guess = F.lit("und")
    for lang, s in scores:
        guess = F.when(s == best_score, F.lit(lang)).otherwise(guess)
    return F.when(best_score >= 2, guess).otherwise(F.lit("und"))


def fingerprint(text_col: str = "content", normalize: bool = True):
    """64-bit content fingerprint: xxhash64 over normalized text
    (lowercase, collapsed whitespace).  Matches across trivially
    reformatted duplicates; for fuzzier matching use dedup.simhash64 or
    the minhash signature."""
    c = F.col(text_col)
    if normalize:
        c = F.regexp_replace(F.lower(c), r"\s+", " ")
        c = F.trim(c)
    return F.xxhash64(c)


def add_text_analysis(
    df: DataFrame, text_col: str = "content"
) -> DataFrame:
    """Convenience: attach all text-analysis columns in one projection."""
    return df.select(
        "*",
        token_count(text_col).alias("n_tokens_ws"),
        bpe_ish_token_count(text_col).alias("n_tokens_bpe"),
        quality_score(text_col),
        language_id(text_col).alias("lang_guess"),
        fingerprint(text_col).alias("fingerprint64"),
    )
