"""RM3 pseudo-relevance-feedback expansion (SURVEY.md §2.8 F12).

Faithful to /root/reference/knowledge4ir/utils/base.py:460-504 (``rm3``):
per (query, top-doc): exp_score(term) = tf/Σtf(doc) * doc_score, optionally
* log(idf) where idf = total_df/df if the term has a df entry else 0.5
(quirk: log(0.5) is NEGATIVE — preserved); summed per term over the top docs,
sorted desc, truncated to n_terms.

DataFrame shape: ranking(qid, doc_id, score) x doc_terms(doc_id, term, tf,
doc_len) — join on doc_id (the ranking side is top-k per query, i.e. tiny,
so it broadcasts), weight, groupBy(qid, term) ordered-sum, window top-m.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.scoring import ordered_sum
from .topk import RANK_QUANTUM


def rm3_expansion(
    ranking: DataFrame,
    doc_terms_df: DataFrame,
    term_stats_df: DataFrame | None = None,
    total_df: float | None = None,
    n_docs: int = 10,
    n_terms: int = 20,
    normalize: bool = True,
) -> DataFrame:
    """ranking: (qid, doc_id, score, rank) — rank<=n_docs rows are used.
    Returns (qid, term, exp_score, exp_rank)."""
    top = ranking.filter(F.col("rank") <= n_docs).select(
        "qid", "doc_id", "score", "rank"
    )
    joined = doc_terms_df.join(F.broadcast(top), "doc_id")
    # tf_z = doc_len (doc_terms carries the total post-clean term count)
    w = F.col("tf") / F.col("doc_len") if normalize else F.col("tf").cast("double")
    exp = w * F.col("score")
    if term_stats_df is not None:
        assert total_df is not None
        joined = joined.join(term_stats_df.withColumnRenamed("df", "_df"), "term", "left")
        idf = F.when(
            F.col("_df").isNotNull(), F.lit(float(total_df)) / F.col("_df")
        ).otherwise(F.lit(0.5))
        exp = exp * F.log(idf)  # log(0.5) < 0 for df-less terms — quirk kept
    scored = joined.groupBy("qid", "term").agg(
        # deterministic fold in (rank, term) order — reference sums in
        # ranking order (base.py:479)
        ordered_sum(F.col("rank"), exp).alias("exp_score")
    )
    win = Window.partitionBy("qid").orderBy(
        F.floor(F.col("exp_score") * RANK_QUANTUM).desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("exp_rank", F.row_number().over(win))
        .filter(F.col("exp_rank") <= n_terms)
        .orderBy("qid", "exp_rank")
    )
