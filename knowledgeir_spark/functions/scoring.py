"""Retrieval scoring as Catalyst column expressions (SURVEY.md §2.8 F1-F9).

Faithful re-expression of the reference scorer
(/root/reference/knowledge4ir/utils/retrieval_model.py:205-291) over the
long-form join

    q_terms(qid, term, q_tf)  ⋈term  doc_terms(doc_id, term, tf, doc_len)
                              ⋈term  term_stats(term, df)

followed by groupBy(qid, doc_id).  All quirks preserved (see
knowledgeir_spark/oracle/retrieval.py docstring for the list); scores are
whole-stage-codegen'd JVM expressions — no Python in the hot path.

Two tiers:
- matched-only scores (bm25, tf_idf, coordinate, bool_or): absent query
  terms contribute exactly 0, so the matched join suffices.
- full-vector scores (lm, lm_dir, lm_jm, lm_twoway, bool_and): absent terms
  contribute a non-zero smoothing mass; computed via the candidate x q-term
  completion join (``score_full_vector``).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BM25_K1 = 1.2
BM25_B = 0.75
LM_DIR_MU = 2500
LM_MIN_TF = 0.1
LM_JM_LAMBDA = 0.4
MIN_LM_SCORE = 1e-10
LOG_MIN_LM_SCORE = math.log(MIN_LM_SCORE)


def bm25_contrib(
    tf: Column, df: Column, doc_len: Column, total_df: float, avg_doc_len: float,
    k1: float = BM25_K1, b: float = BM25_B,
) -> Column:
    """Per-(q-term, doc) BM25 contribution BEFORE the final log clamp.

    ratio * tf_part * max(log(ratio), 0) — note the raw-ratio re-weighting
    quirk of retrieval_model.py:263 (idf^2 flavor) kept verbatim.
    """
    tf_part = tf * (k1 + 1) / (tf + k1 * (1 - b + b * doc_len / F.lit(avg_doc_len)))
    ratio = F.greatest(
        (F.lit(total_df) - df + 0.5) / (df + 0.5), F.lit(1.0)
    )
    idf = F.greatest(F.log(ratio), F.lit(0.0))
    return ratio * tf_part * idf


def bm25_finalize(sum_contrib: Column) -> Column:
    """log(max(sum, 1.0)) — retrieval_model.py:264-265."""
    return F.log(F.greatest(sum_contrib, F.lit(1.0)))


def tf_idf_contrib(tf: Column, df: Column, doc_len: Column, total_df: float) -> Column:
    """log(1 + N/max(df,1)) * tf/dl — retrieval_model.py:279-285."""
    return F.log(F.lit(1.0) + F.lit(total_df) / F.greatest(df, F.lit(1.0))) * (
        tf / doc_len
    )


def lm_contrib(tf: Column, q_tf: Column, doc_len: Column) -> Column:
    """q_tf * log(max(max(tf,0.1)/dl, 1e-10)) — retrieval_model.py:205-217.
    Valid for tf>=0 rows of the completed vector."""
    return q_tf * F.log(
        F.greatest(F.greatest(tf, F.lit(LM_MIN_TF)) / doc_len, F.lit(MIN_LM_SCORE))
    )


def lm_dir_contrib(
    tf: Column, df: Column, doc_len: Column, total_df: float,
    mu: float = LM_DIR_MU,
) -> Column:
    """Dirichlet term (un-normalized by q; multiply by v_q outside) —
    retrieval_model.py:219-227.  Note the reference smooths with DF/N (not
    collection-TF), quirk preserved."""
    return F.log(
        F.greatest(
            (tf + F.lit(float(mu)) * (df / F.lit(total_df))) / (doc_len + F.lit(float(mu))),
            F.lit(MIN_LM_SCORE),
        )
    )


def lm_jm_contrib(
    tf: Column, df: Column, doc_len: Column, total_df: float,
    lam: float = LM_JM_LAMBDA,
) -> Column:
    """retrieval_model.py:229-237 (multiply by q_tf outside)."""
    return F.log(
        F.greatest(
            tf / doc_len * (1 - lam) + F.lit(lam) * df / F.lit(total_df),
            F.lit(MIN_LM_SCORE),
        )
    )


def lm_twoway_contrib(
    tf: Column, df: Column, doc_len: Column, total_df: float,
    mu: float = LM_DIR_MU, lam: float = LM_JM_LAMBDA,
) -> Column:
    """retrieval_model.py:239-249 (multiply by q_tf outside)."""
    dir_part = (tf + F.lit(float(mu)) * (df / F.lit(total_df))) / (
        doc_len + F.lit(float(mu))
    )
    return F.log(
        F.greatest(
            dir_part * (1 - lam) + F.lit(lam) * df / F.lit(total_df),
            F.lit(MIN_LM_SCORE),
        )
    )


def ordered_sum(idx: Column, contrib: Column) -> Column:
    """Deterministic aggregate: fold contributions in ascending ``idx`` order
    (query-term first-occurrence position), sequential left-to-right — the
    same summation order as the oracle.  Makes grouped float sums independent
    of partitioning/row order, so exact score ties stay exact across runs.
    Cost: a bounded collect_list (<= |query terms| <= ~10 structs/group)."""
    return F.aggregate(
        F.array_sort(F.collect_list(F.struct(idx.alias("i"), contrib.alias("c")))),
        F.lit(0.0),
        lambda acc, x: acc + x["c"],
    )


def score_matched(
    matched: DataFrame,
    total_df: float,
    avg_doc_len: float,
    models: tuple[str, ...] = ("bm25", "tf_idf", "coordinate", "bool_or"),
) -> DataFrame:
    """Aggregate matched-only scores.

    matched columns: qid, doc_id, term_idx, q_tf, tf, doc_len, df.
    Returns (qid, doc_id, <model columns>).
    """
    tf, df, dl, idx = F.col("tf"), F.col("df"), F.col("doc_len"), F.col("term_idx")
    aggs = []
    if "bm25" in models:
        aggs.append(
            bm25_finalize(
                ordered_sum(idx, bm25_contrib(tf, df, dl, total_df, avg_doc_len))
            ).alias("bm25")
        )
    if "tf_idf" in models:
        aggs.append(ordered_sum(idx, tf_idf_contrib(tf, df, dl, total_df)).alias("tf_idf"))
    if "coordinate" in models:
        aggs.append(F.sum((tf > 0).cast("long")).alias("coordinate"))
    if "bool_or" in models:
        aggs.append(F.max((tf > 0).cast("long")).alias("bool_or"))
    return matched.groupBy("qid", "doc_id").agg(*aggs)


def score_full_vector(
    completed: DataFrame,
    total_df: float,
    models: tuple[str, ...] = ("lm", "lm_dir", "lm_jm", "lm_twoway", "bool_and"),
) -> DataFrame:
    """Aggregate full-vector scores over the completed (candidate x q-term)
    frame.

    completed columns: qid, doc_id, term_idx, q_tf, sum_q_tf, n_q_terms, tf
    (0 when absent), doc_len, df (0 when term unseen in corpus).
    """
    tf, df, dl, idx = F.col("tf"), F.col("df"), F.col("doc_len"), F.col("term_idx")
    q_tf = F.col("q_tf")
    v_q = q_tf / F.col("sum_q_tf")
    # retrieval_model.py:209-250 — every lm* scorer early-returns
    # log(MIN_LM_SCORE) when doc_len == 0 (note: WITHOUT the +20 shift).
    # Per-row contributions for dl=0 groups are discarded by the guard, but
    # ANSI mode still evaluates them, so they divide by a safe denominator.
    empty_doc = F.max(dl) == 0
    dls = F.greatest(dl, F.lit(1))

    def lm_guard(agg: Column) -> Column:
        return F.when(empty_doc, F.lit(LOG_MIN_LM_SCORE)).otherwise(agg)

    aggs = []
    if "lm" in models:
        aggs.append(lm_guard(ordered_sum(idx, lm_contrib(tf, q_tf, dls))).alias("lm"))
    if "lm_dir" in models:
        aggs.append(
            lm_guard(
                ordered_sum(idx, lm_dir_contrib(tf, df, dls, total_df) * v_q)
                + F.lit(20.0)
            ).alias("lm_dir")
        )
    if "lm_jm" in models:
        aggs.append(
            lm_guard(
                ordered_sum(idx, lm_jm_contrib(tf, df, dls, total_df) * q_tf)
                + F.lit(20.0)
            ).alias("lm_jm")
        )
    if "lm_twoway" in models:
        aggs.append(
            lm_guard(
                ordered_sum(idx, lm_twoway_contrib(tf, df, dls, total_df) * q_tf)
                + F.lit(20.0)
            ).alias("lm_twoway")
        )
    if "bool_and" in models:
        aggs.append(
            (F.sum((tf > 0).cast("long")) == F.max("n_q_terms"))
            .cast("long")
            .alias("bool_and")
        )
    if "cosine" in models:
        # duet_feature/base.py:215-226 — cosine DISTANCE quirk; zero-tf -> 0
        vq = q_tf / F.col("sum_q_tf")
        vd = tf / dls  # safe denominator; dl=0 groups fall into the 0.0 arm
        dot = ordered_sum(idx, vq * vd)
        nq = F.sqrt(ordered_sum(idx, vq * vq))
        nd = F.sqrt(ordered_sum(idx, vd * vd))
        aggs.append(
            F.when(
                (F.sum(tf) == 0) | (nq * nd == 0), F.lit(0.0)
            ).otherwise(F.lit(1.0) - dot / (nq * nd)).alias("cosine")
        )
    return completed.groupBy("qid", "doc_id").agg(*aggs)
