"""Full-scan retrieval: the reference's scoring pipeline as a 4-operator
DataFrame plan (SURVEY.md §3.2):

    broadcast(q_terms) ⋈term doc_terms ⋈term term_stats
        → groupBy(qid, doc_id) score → window top-k

This is the J9 join of SURVEY.md §2.5 — the engine's core equi-join on term.
The query side is tiny (50 queries x ≤9 terms) and always broadcast; the doc
side streams, so the only exchange is the (qid, doc_id) aggregation.  The
posting-list index path (knowledgeir_spark/index/query.py) must produce
rank-identical output to this plan; both must match the pure-Python oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scoring import score_full_vector, score_matched
from ..functions.text import query_terms_expr
from .topk import topk_per_query


def query_terms(queries_df: DataFrame) -> DataFrame:
    """(qid, term, term_idx, q_tf, sum_q_tf, n_q_terms) from (qid, query).

    Query side uses the raw whitespace tokenizer (ir_fusion.py:52 asymmetry);
    q_tf counts repeats, n_q_terms is the DISTINCT term count (the dimension
    of the reference's aligned vectors, set_from_raw:127-129).  term_idx is
    the term's first-occurrence position — the oracle's dict insertion order —
    used to fix the engine's summation order (scoring.ordered_sum).
    """
    exploded = queries_df.select(
        "qid", F.posexplode(query_terms_expr(F.col("query"))).alias("pos", "term")
    )
    per_term = exploded.groupBy("qid", "term").agg(
        F.count("*").alias("q_tf"), F.min("pos").alias("term_idx")
    )
    totals = per_term.groupBy("qid").agg(
        F.sum("q_tf").alias("sum_q_tf"), F.count("*").alias("n_q_terms")
    )
    return per_term.join(totals, "qid")


def matched_frame(
    q_terms: DataFrame, doc_terms_df: DataFrame, term_stats_df: DataFrame
) -> DataFrame:
    """qid, doc_id, term, q_tf, tf, doc_len, df — one row per matched
    (query-term, doc) pair.  q_terms and the q-term slice of term_stats are
    broadcast; the scan side never shuffles before aggregation."""
    q_stats = term_stats_df.join(
        F.broadcast(q_terms.select("term").distinct()), "term", "left_semi"
    )
    return (
        doc_terms_df.join(F.broadcast(q_terms), "term")
        .join(F.broadcast(q_stats), "term")
        .select("qid", "doc_id", "term", "term_idx", "q_tf", "sum_q_tf",
                "n_q_terms", "tf", "doc_len", "df")
    )


def completed_frame(matched: DataFrame, q_terms: DataFrame,
                    term_stats_df: DataFrame,
                    candidates: DataFrame | None = None) -> DataFrame:
    """Candidate x q-term completion for the full-vector (LM-family) scores:
    every (qid, doc_id) candidate gets ALL the query's terms, absent tf -> 0,
    unseen-term df -> 0 (set_from_raw:139-148 defaults).

    candidates: optional explicit (qid, doc_id, doc_len) frame.  Default
    derives candidates from the matched rows — correct for retrieval (a
    zero-overlap doc can never enter the top-k), but feature extraction must
    pass ALL its candidates so zero-overlap docs get the reference's tf=0
    smoothed scores (set_from_raw builds the full vector for every candidate
    regardless of overlap)."""
    if candidates is None:
        candidates = matched.select("qid", "doc_id", "doc_len").distinct()
    q_stats = term_stats_df.join(
        F.broadcast(q_terms.select("term").distinct()), "term", "left_semi"
    )
    q_full = q_terms.join(F.broadcast(q_stats), "term", "left").select(
        "qid", "term", "term_idx", "q_tf", "sum_q_tf", "n_q_terms",
        F.coalesce("df", F.lit(0.0)).cast("double").alias("df"),
    )
    grid = candidates.join(F.broadcast(q_full), "qid")
    return grid.join(
        matched.select("qid", "doc_id", "term", "tf"), ["qid", "doc_id", "term"], "left"
    ).select(
        "qid", "doc_id", "term", "term_idx", "q_tf", "sum_q_tf", "n_q_terms",
        F.coalesce("tf", F.lit(0)).cast("double").alias("tf"),
        "doc_len", "df",
    )


def search(
    queries_df: DataFrame,
    doc_terms_df: DataFrame,
    term_stats_df: DataFrame,
    total_df: float,
    avg_doc_len: float,
    k: int = 20,
    model: str = "bm25",
) -> DataFrame:
    """Top-k retrieval -> (qid, doc_id, score, rank), TREC-shaped (W1).

    Deterministic tie-break: (score desc, doc_id asc) — SURVEY.md §2.6.
    """
    q = query_terms(queries_df)
    m = matched_frame(q, doc_terms_df, term_stats_df)
    if model in ("bm25", "tf_idf", "coordinate", "bool_or"):
        scored = score_matched(m, total_df, avg_doc_len, models=(model,))
    elif model == "cosine":
        comp = completed_frame(m, q, term_stats_df)
        scored = score_full_vector(comp, total_df, models=(model,))
    else:
        comp = completed_frame(m, q, term_stats_df)
        scored = score_full_vector(comp, total_df, models=(model,))
    scored = scored.select("qid", "doc_id", F.col(model).cast("double").alias("score"))
    return topk_per_query(scored, k=k)
