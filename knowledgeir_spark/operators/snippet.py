"""Snippet extraction (result highlighting) for serving output.

The reference emits bare (qid, doc_id, rank) TREC rankings; a user-facing
engine also returns a query-biased snippet per hit.  Spec (deterministic,
oracle-replayable): over the simple-tokenized document, consider every
window of ``window`` tokens that STARTS at a query-term occurrence; the
best snippet maximizes the number of query-term occurrences inside the
window, ties broken by earliest start.  Returned as the token slice
joined with single spaces, plus (start_pos, n_matches) so callers can
highlight.

Scale shape: everything is restricted to the candidate (qid, doc_id)
pairs first — at serving time that is top-k per query, so the positional
explode touches k * |queries| documents, not the corpus.  Query terms are
a broadcast join; the window count is a self-join of each candidate
document's match-position list with itself (bounded by per-doc query-term
occurrences, a handful of rows per candidate), never a corpus-wide range
join.  Token arrays are materialized once per distinct doc_id and reused
for both the position explode and the final slice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import tokenize_simple_expr


def best_snippets(
    docs: DataFrame,
    q_terms: DataFrame,
    candidates: DataFrame,
    window: int = 12,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(qid, doc_id, start_pos, n_matches, snippet) — one row per candidate
    pair that has at least one query-term match (BM25 candidates always
    do).  ``q_terms`` is (qid, term); ``candidates`` is (qid, doc_id).
    Positions are 1-based over the non-empty simple tokens, matching the
    proximity operators' convention.
    """
    cand = candidates.select("qid", F.col(id_col).alias("doc_id"))
    toks = (
        cand.select("doc_id").distinct()
        .join(docs.withColumnRenamed(id_col, "doc_id"), "doc_id")
        .select("doc_id", tokenize_simple_expr(F.col(text_col)).alias("toks"))
    )
    tp = toks.select(
        "doc_id", F.posexplode("toks").alias("i0", "term")
    ).select("doc_id", (F.col("i0") + 1).alias("pos"), "term")
    m = (
        F.broadcast(q_terms.select("qid", "term").distinct())
        .join(tp, "term")
        .join(cand, ["qid", "doc_id"], "left_semi")
        .select("qid", "doc_id", "pos")
    )
    m1 = m.select("qid", "doc_id", F.col("pos").alias("start"))
    m2 = m.select("qid", "doc_id", F.col("pos").alias("p2"))
    wnd = (
        m1.join(m2, ["qid", "doc_id"])
        .where(
            (F.col("p2") >= F.col("start"))
            & (F.col("p2") < F.col("start") + window)
        )
        .groupBy("qid", "doc_id", "start")
        .agg(F.count("*").alias("n_matches"))
    )
    w = Window.partitionBy("qid", "doc_id").orderBy(
        F.col("n_matches").desc(), F.col("start").asc()
    )
    best = wnd.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return best.join(toks, "doc_id").select(
        "qid",
        "doc_id",
        F.col("start").alias("start_pos"),
        "n_matches",
        F.concat_ws(
            " ", F.slice(F.col("toks"), F.col("start"), F.lit(window))
        ).alias("snippet"),
    )
