"""Heuristic language identification — marker-word profiles, pure DataFrame.

A deterministic n-gram/stopword-profile classifier (fastText-style models are
out of scope per environment constraints): each language has a frozen set of
high-frequency marker words; the doc's language = argmax of marker hits per
token, tie/zero -> 'und'.  Long-form join implementation so the same logic is
SQL-expressible for the DuckDB parity check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import tokenize_simple_expr

# frozen marker profiles (top function words per language)
LANG_MARKERS: dict[str, list[str]] = {
    "en": "the of and to in is that it for on with as was at by this be are".split(),
    "de": "der die und das ist nicht ein mit sich auf von den im zu werden".split(),
    "es": "de la que el en los del las por con una para es al como m s".split(),
    "fr": "le de la et les des en du que une dans est pour qui sur pas".split(),
    "it": "di che la il un per una sono con non del alla nel pi".split(),
    "pt": "de que do da em um uma para com os no dos mais".split(),
    "nl": "de het van een en in is dat op te zijn met voor niet".split(),
}


def marker_table(spark) -> DataFrame:
    rows = [(lang, w) for lang, ws in LANG_MARKERS.items() for w in sorted(set(ws))]
    return spark.createDataFrame(rows, "m_lang string, term string")


def detect_language(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, pred_lang, marker_hits, n_tokens) — argmax marker hits,
    tie-break lang asc, no hits -> 'und'."""
    spark = docs.sparkSession
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokenize_simple_expr(F.col(text_col))).alias("term"),
    )
    totals = toks.groupBy("doc_id").agg(F.count("*").alias("n_tokens"))
    hits = (
        toks.join(F.broadcast(marker_table(spark)), "term")
        .groupBy("doc_id", "m_lang")
        .agg(F.count("*").alias("hits"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(
        F.col("hits").desc(), F.col("m_lang").asc()
    )
    best = (
        hits.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") == 1)
        .select("doc_id", F.col("m_lang").alias("pred_lang"), F.col("hits").alias("marker_hits"))
    )
    return (
        totals.join(best, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("pred_lang", F.lit("und")).alias("pred_lang"),
            F.coalesce("marker_hits", F.lit(0)).alias("marker_hits"),
            "n_tokens",
        )
    )
