"""Text-quality scoring for training-data filtering — pure JVM expressions.

Heuristics in the spirit of public web-corpus pipelines (C4/Gopher-style
rules): length, word stats, punctuation/digit/uppercase ratios, stopword
fraction, repetition.  All whole-stage-codegen'd; thresholds are the
caller's business (this module only computes features + a composite flag).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..oracle.tokenizer import STOPWORDS
from .text import tokenize_simple_expr

_STOP_LIST = sorted(STOPWORDS)


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds: n_chars_q, n_words, mean_word_len, punct_ratio, digit_ratio,
    upper_ratio, stopword_ratio, max_word_ratio (top-term repetition)."""
    t = F.col(text_col)
    toks = tokenize_simple_expr(t)
    n_chars = F.length(t)
    n_words = F.size(toks)
    nz = F.greatest(n_chars, F.lit(1)).cast("double")
    nzw = F.greatest(n_words, F.lit(0)).cast("double")
    stop_hits = F.size(F.filter(toks, lambda x: x.isin(_STOP_LIST)))
    # top-term repetition: max tf / n_words via aggregate over distinct terms
    dedup = F.array_distinct(toks)
    max_tf = F.aggregate(
        dedup,
        F.lit(0),
        lambda acc, d: F.greatest(acc, F.size(F.filter(toks, lambda x: x == d))),
    )
    return df.select(
        "*",
        n_chars.alias("n_chars_q"),
        n_words.alias("n_words"),
        (
            F.aggregate(toks, F.lit(0), lambda a, x: a + F.length(x)).cast("double")
            / F.greatest(nzw, F.lit(1.0))
        ).alias("mean_word_len"),
        (F.length(F.regexp_replace(t, "[a-zA-Z0-9\\s]", "")) / nz).alias("punct_ratio"),
        (F.length(F.regexp_replace(t, "[^0-9]", "")) / nz).alias("digit_ratio"),
        (F.length(F.regexp_replace(t, "[^A-Z]", "")) / nz).alias("upper_ratio"),
        (stop_hits / F.greatest(nzw, F.lit(1.0))).alias("stopword_ratio"),
        (max_tf / F.greatest(nzw, F.lit(1.0))).alias("max_word_ratio"),
    )


def quality_flag(
    df: DataFrame,
    min_words: int = 10,
    max_mean_word_len: float = 12.0,
    max_punct_ratio: float = 0.25,
    max_digit_ratio: float = 0.3,
    max_word_ratio: float = 0.3,
) -> Column:
    """Composite keep/drop flag over quality_features columns."""
    return (
        (F.col("n_words") >= min_words)
        & (F.col("mean_word_len") <= max_mean_word_len)
        & (F.col("punct_ratio") <= max_punct_ratio)
        & (F.col("digit_ratio") <= max_digit_ratio)
        & (F.col("max_word_ratio") <= max_word_ratio)
    ).alias("quality_keep")


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds n_tokens_ws (whitespace) and n_tokens_bpe (BPE-ish regex:
    letter runs / digit runs / punct runs, leading-space attached — a
    portable simplification of the GPT-2 pre-tokenizer)."""
    t = F.col(text_col)
    bpe_pattern = " ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\\s]+"
    return df.select(
        "*",
        F.size(F.filter(F.split(t, "\\s+"), lambda x: x != F.lit(""))).alias(
            "n_tokens_ws"
        ),
        F.size(F.regexp_extract_all(t, F.lit(bpe_pattern), 0)).alias("n_tokens_bpe"),
    )
