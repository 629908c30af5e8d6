"""Intra-document repetition features (Gopher/MassiveText-style quality
rules).

Not in the reference (its TREC corpora are edited prose) but standard in
web-scale training-data pipelines: documents dominated by repeated lines or
n-grams are generation/boilerplate artifacts and get filtered before
training.  Implemented as ONE exploded long-form aggregation per corpus
pass — per doc, items are its lines plus its word 2/3/4-grams, tagged; a
single groupBy((doc, tag, item)) then conditional per-(doc, tag)
aggregation yields every feature.  All features are integer-count ratios
floor-quantized at 1e6 with the multiply-then-divide shape, so the DuckDB
parity oracle reproduces them bit-exactly.

Features (per doc):
- n_tokens, n_distinct_tokens, dup_word_frac_e6 = 1e6*(n-distinct)/n
- n_lines, dup_line_frac_e6      (fraction of lines occurring >= 2 times)
- dup_line_char_frac_e6          (fraction of line characters in such lines)
- top{2,3,4}gram_char_frac_e6    (chars covered by the most frequent n-gram
                                  = max(count*len(gram)) / len(text))

The token array is materialized in its own projection before the gram
lambdas (Catalyst does not CSE inside higher-order-function lambdas — see
operators/dedup.doc_shingles), and grams are built from element_at lookups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokenize_simple_expr


def _grams(toks, n: int):
    """Word n-grams of a materialized token-array column (space-joined)."""
    def kgram(i):
        parts = []
        for j in range(n):
            if j:
                parts.append(F.lit(" "))
            parts.append(F.element_at(toks, i + F.lit(j)))
        return F.concat(*parts)

    return F.when(
        F.size(toks) >= n,
        F.transform(F.sequence(F.lit(1), F.size(toks) - (n - 1)), kgram),
    ).otherwise(F.array().cast("array<string>"))


def repetition_features(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """One row per doc with the repetition feature set (see module doc)."""
    toks = F.col("_toks")
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("_text"),
        tokenize_simple_expr(F.col(text_col)).alias("_toks"),
    ).select(
        "doc_id",
        F.length("_text").alias("text_chars"),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.filter(F.split("_text", "\n"), lambda x: x != F.lit(""))
        .alias("_lines"),
        _grams(toks, 2).alias("_g2"),
        _grams(toks, 3).alias("_g3"),
        _grams(toks, 4).alias("_g4"),
    )
    tagged = base.select(
        "doc_id",
        F.explode(
            F.concat(
                F.transform(F.col("_lines"),
                            lambda x: F.struct(F.lit("line").alias("tag"),
                                               x.alias("item"))),
                F.transform(F.col("_g2"),
                            lambda x: F.struct(F.lit("g2").alias("tag"),
                                               x.alias("item"))),
                F.transform(F.col("_g3"),
                            lambda x: F.struct(F.lit("g3").alias("tag"),
                                               x.alias("item"))),
                F.transform(F.col("_g4"),
                            lambda x: F.struct(F.lit("g4").alias("tag"),
                                               x.alias("item"))),
            )
        ).alias("ti"),
    ).select("doc_id", F.col("ti.tag").alias("tag"), F.col("ti.item").alias("item"))

    counted = tagged.groupBy("doc_id", "tag", "item").agg(
        F.count("*").alias("cnt")
    ).withColumn("chars", F.length("item"))
    per_tag = counted.groupBy("doc_id", "tag").agg(
        F.sum("cnt").alias("n_items"),
        F.sum(F.when(F.col("cnt") >= 2, F.col("cnt"))).alias("dup_items"),
        F.sum(F.col("cnt") * F.col("chars")).alias("item_chars"),
        F.sum(F.when(F.col("cnt") >= 2, F.col("cnt") * F.col("chars")))
        .alias("dup_item_chars"),
        F.max(F.col("cnt") * F.col("chars")).alias("top_item_chars"),
    )

    def tagval(tag: str, col: str):
        return F.max(F.when(F.col("tag") == tag, F.col(col)))

    pivoted = per_tag.groupBy("doc_id").agg(
        F.coalesce(tagval("line", "n_items"), F.lit(0)).alias("n_lines"),
        F.coalesce(tagval("line", "dup_items"), F.lit(0)).alias("_dl"),
        F.coalesce(tagval("line", "item_chars"), F.lit(0)).alias("_lc"),
        F.coalesce(tagval("line", "dup_item_chars"), F.lit(0)).alias("_dlc"),
        F.coalesce(tagval("g2", "top_item_chars"), F.lit(0)).alias("_t2"),
        F.coalesce(tagval("g3", "top_item_chars"), F.lit(0)).alias("_t3"),
        F.coalesce(tagval("g4", "top_item_chars"), F.lit(0)).alias("_t4"),
    )

    def e6(num, den):
        # the 1e6 factor and operands promote to long BEFORE multiplying —
        # int32 * 1e6 overflows (ANSI throw) at ~2.1e3 of anything
        return F.when(
            den > 0,
            F.floor(F.lit(1000000).cast("long") * num.cast("long") / den)
            .cast("long"),
        ).otherwise(F.lit(0)).cast("long")

    out = base.select(
        "doc_id", "text_chars", "n_tokens", "n_distinct_tokens"
    ).join(pivoted, "doc_id", "left").na.fill(0)
    return out.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_distinct_tokens").cast("long").alias("n_distinct_tokens"),
        e6(F.col("n_tokens") - F.col("n_distinct_tokens"), F.col("n_tokens"))
        .alias("dup_word_frac_e6"),
        F.col("n_lines").cast("long").alias("n_lines"),
        e6(F.col("_dl"), F.col("n_lines")).alias("dup_line_frac_e6"),
        e6(F.col("_dlc"), F.col("_lc")).alias("dup_line_char_frac_e6"),
        e6(F.col("_t2"), F.col("text_chars")).alias("top2gram_char_frac_e6"),
        e6(F.col("_t3"), F.col("text_chars")).alias("top3gram_char_frac_e6"),
        e6(F.col("_t4"), F.col("text_chars")).alias("top4gram_char_frac_e6"),
    )
