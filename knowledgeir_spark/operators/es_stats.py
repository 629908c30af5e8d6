"""ES-term-vector TermStat variant (SURVEY §2.8 note; reference
/root/reference/knowledge4ir/duet_feature/base.py:241-313).

The reference's alternate stats source: instead of the engine-owned corpus
stats, each (query, doc) pair is scored from PRE-FETCHED Elasticsearch
term-vector payloads.  Three semantic differences from the main path,
preserved verbatim (calc_term_stat, base.py:272-313):

- v_q_tf = 1 for EVERY query term (presence, not counts — base.py:300);
- per-term df comes from the prefetch table, not the engine's term_stats
  (and may legitimately differ per qid: ES df is shard-approximate);
- doc_len = the sum of ALL tfs in the doc's term vector (the engine's
  doc_terms long form carries exactly that as doc_len);
- total_df / avg_doc_len come from the prefetched (total_df, total_len)
  pair: avg_doc_len = total_len / total_df (fetch_corpus_stat, :265-270).

Inputs are long-form tables, so the "prefetch" is just another DataFrame —
at scale it is a broadcast of the (few) query terms' stats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scoring import score_full_vector, score_matched
from ..functions.text import query_terms_expr

ALL_MODELS = (
    "lm", "lm_dir", "lm_jm", "lm_twoway", "bm25", "coordinate", "tf_idf",
    "bool_and", "bool_or",
)
_MATCHED = ("bm25", "tf_idf", "coordinate", "bool_or")


def es_query_terms(queries_df: DataFrame) -> DataFrame:
    """(qid, term, term_idx, q_tf=1, sum_q_tf, n_q_terms) — the ES variant's
    presence-valued query vector over DISTINCT terms."""
    exploded = queries_df.select(
        "qid", F.posexplode(query_terms_expr(F.col("query"))).alias("pos", "term")
    )
    per_term = exploded.groupBy("qid", "term").agg(
        F.min("pos").alias("term_idx")
    ).withColumn("q_tf", F.lit(1).cast("long"))
    totals = per_term.groupBy("qid").agg(
        F.count("*").alias("n_q_terms")
    ).withColumn("sum_q_tf", F.col("n_q_terms"))
    return per_term.join(totals, "qid")


def es_all_scores(
    queries_df: DataFrame,
    doc_terms_df: DataFrame,
    q_term_df: DataFrame,
    total_df: float,
    avg_doc_len: float,
    candidates: DataFrame | None = None,
    models: tuple[str, ...] = ALL_MODELS,
) -> DataFrame:
    """All retrieval scores per (qid, doc_id) under ES-term-vector
    semantics.  q_term_df: (qid, term, df) — the prefetched per-query df
    (unseen terms default 0, calc_term_stat:295-299).  candidates:
    optional (qid, doc_id) frame; when given, every candidate is scored
    (zero-overlap -> smoothed tf=0 vectors), else candidates = docs sharing
    >= 1 term.  Returns (qid, doc_id, <model columns>)."""
    q = es_query_terms(queries_df)
    qd = q.join(
        F.broadcast(q_term_df.select("qid", "term", F.col("df").alias("_df"))),
        ["qid", "term"], "left",
    ).select(
        "qid", "term", "term_idx", "q_tf", "sum_q_tf", "n_q_terms",
        F.coalesce("_df", F.lit(0.0)).cast("double").alias("df"),
    )
    # matched frame with the PREFETCHED df (not the corpus term_stats)
    m = doc_terms_df.join(F.broadcast(qd), "term").select(
        "qid", "doc_id", "term", "term_idx", "q_tf", "sum_q_tf",
        "n_q_terms", "tf", "doc_len", "df",
    )
    matched_models = tuple(mm for mm in models if mm in _MATCHED)
    full_models = tuple(mm for mm in models if mm not in _MATCHED)
    if candidates is None:
        base = m.select("qid", "doc_id").distinct()
    else:
        doc_lens = doc_terms_df.select("doc_id", "doc_len").distinct()
        base = candidates.select("qid", "doc_id").join(
            doc_lens, "doc_id", "left"
        ).select(
            "qid", "doc_id",
            F.coalesce("doc_len", F.lit(0)).cast("long").alias("doc_len"),
        )
    out = base.select("qid", "doc_id")
    if matched_models:
        ms = score_matched(m, total_df, avg_doc_len, models=matched_models)
        out = out.join(ms, ["qid", "doc_id"], "left").select(
            "qid", "doc_id",
            *[F.coalesce(F.col(mm), F.lit(0.0)).alias(mm)
              for mm in matched_models],
        )
    if full_models:
        # the completion needs (qid, term, df) with the prefetched df — pass
        # a stats table keyed only by the query's terms via the qd frame
        cand = base if candidates is not None else (
            m.select("qid", "doc_id", "doc_len").distinct()
        )
        grid = cand.join(F.broadcast(qd), "qid")
        comp = grid.join(
            m.select("qid", "doc_id", "term", "tf"),
            ["qid", "doc_id", "term"], "left",
        ).select(
            "qid", "doc_id", "term", "term_idx", "q_tf", "sum_q_tf",
            "n_q_terms",
            F.coalesce("tf", F.lit(0)).cast("double").alias("tf"),
            "doc_len", "df",
        )
        fs = score_full_vector(comp, total_df, models=full_models)
        out = out.join(fs, ["qid", "doc_id"], "left")
    return out


def es_corpus_stat(total_df: int, total_len: int) -> tuple[float, float]:
    """fetch_corpus_stat (base.py:265-270): (total_df, avg = len/df)."""
    return float(total_df), float(total_len) / float(total_df)
