"""Text-analysis operators for training-data pipelines: tokenization
stats, quality scoring, language ID, fingerprinting.

Everything is built-in string/array expressions — per-row, embarrassingly
parallel, no shuffle, no UDFs — which is exactly what you want when the
documents table is 100 TB: the whole stage is a single codegen'd scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword profiles for the n-gram/stopword heuristic
# language detector. Deliberately small and explicit: language ID here
# demonstrates the *mechanics* (vectorized scoring + argmax) — swap in
# real profiles (e.g. trigram tables) for production corpora.
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "et", "les", "des"),
    "es": ("el", "la", "los", "y", "de"),
}
_PROFILE_ORDER = tuple(sorted(LANG_PROFILES))  # deterministic tie-break order


def tokens(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def token_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document token statistics: whitespace token count, char
    count, average token length, distinct-token ratio."""
    toks = tokens(text_col)
    n_tokens = F.size(toks)
    n_chars = F.length(text_col)
    sum_tok_len = F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda a, v: a + v
    )
    return df.select(
        F.col(id_col),
        n_tokens.cast("int").alias("n_tokens"),
        n_chars.cast("int").alias("n_chars"),
        (sum_tok_len.cast("double") / n_tokens.cast("double")).alias("avg_token_len"),
        (
            F.size(F.array_distinct(toks)).cast("double") / n_tokens.cast("double")
        ).alias("distinct_ratio"),
    )


def lang_scores(text_col: str) -> list[Column]:
    """One stopword-hit-count column per language profile."""
    toks = tokens(text_col)
    cols = []
    for lang in _PROFILE_ORDER:
        words = LANG_PROFILES[lang]
        cols.append(
            F.size(F.filter(toks, lambda t: t.isin(*words)))
            .cast("int")
            .alias(f"score_{lang}")
        )
    return cols


def lang_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Heuristic language ID: stopword-profile scoring + deterministic
    argmax (ties break by language-code order; all-zero -> 'und')."""
    scored = df.select(F.col(id_col), *lang_scores(text_col))
    best = F.greatest(*[F.col(f"score_{lang}") for lang in _PROFILE_ORDER])
    pred = F.when(best == 0, F.lit("und"))
    for lang in _PROFILE_ORDER:
        pred = pred.when(F.col(f"score_{lang}") == best, F.lit(lang))
    return scored.select(
        id_col,
        *[f"score_{lang}" for lang in _PROFILE_ORDER],
        pred.alias("pred_lang"),
    )


def quality_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document quality signals + a composite score in [0,1]:
    length band, mean token length band, uppercase ratio, digit ratio.
    Integer-ratio arithmetic only, so the doubles are deterministic."""
    toks = tokens(text_col)
    n_tokens = F.size(toks).cast("double")
    n_chars = F.length(text_col).cast("double")
    n_upper = (
        F.length(text_col)
        - F.length(F.regexp_replace(F.col(text_col), "[A-Z]", ""))
    ).cast("double")
    n_digit = (
        F.length(text_col)
        - F.length(F.regexp_replace(F.col(text_col), "[0-9]", ""))
    ).cast("double")
    avg_tok = n_chars / n_tokens
    len_ok = (F.length(text_col) >= 80) & (F.length(text_col) <= 2000)
    tok_ok = (avg_tok >= 3.0) & (avg_tok <= 12.0)
    upper_ratio = n_upper / n_chars
    digit_ratio = n_digit / n_chars
    score = (
        len_ok.cast("int") * 0.4
        + tok_ok.cast("int") * 0.3
        + (upper_ratio <= 0.3).cast("int") * 0.15
        + (digit_ratio <= 0.2).cast("int") * 0.15
    )
    return df.select(
        F.col(id_col),
        F.length(text_col).cast("int").alias("n_chars"),
        upper_ratio.alias("upper_ratio"),
        digit_ratio.alias("digit_ratio"),
        score.alias("quality"),
    )


def fingerprint(df: DataFrame, id_col: str, text_col: str, n_buckets: int = 1024) -> DataFrame:
    """Content fingerprint: md5 of the whitespace-normalized lowercase
    text, plus a stable small bucket id (first 8 hex digits -> int ->
    mod buckets) for grouping/partitioning near-identical content."""
    normalized = F.lower(F.regexp_replace(F.col(text_col), r"\s+", " "))
    fp = F.md5(normalized)
    bucket = (F.conv(F.substring(fp, 1, 8), 16, 10).cast("bigint") % n_buckets).cast(
        "int"
    )
    return df.select(
        F.col(id_col), fp.alias("fingerprint"), bucket.alias("bucket")
    )
