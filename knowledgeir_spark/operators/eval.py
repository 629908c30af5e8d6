"""NDCG@k / ERR@k ranking evaluation as DataFrame ops (SURVEY.md §2.12 L3).

Semantics match the reference's gdeval.pl
(/root/reference/knowledge4ir/utils/gdeval.pl) exactly:

- run order: (topic asc, score desc, docno DESC) — note the reference's
  runOrder comparator breaks score ties by LARGER docno first (lines 173-192),
  a quirk preserved here;
- gain = 2^judgment - 1, missing judgment -> 0 (line 311);
- DCG@k = sum_{i=1..k} gain_i / log2(i+1)   (lines 195-203);
- ideal DCG from ALL the topic's qrels sorted by judgment desc (lines 122-141);
- NDCG = DCG/idealDCG for topics present in qrels with ideal > 0;
- ERR@k = sum r_i * decay_i / i,  r = (2^g - 1)/2^4 (MAX_JUDGMENT=4),
  decay_i = prod_{j<i}(1 - r_j)  (lines 206-218) — the sequential decay
  product is expressed as exp(cumsum(log1p(-r))) over a window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MAX_JUDGMENT = 4


def ndcg_err_at_k(
    ranking: DataFrame,
    qrels: DataFrame,
    k: int = 20,
    qid_col: str = "qid",
    doc_col: str = "docno",
    score_col: str = "score",
    label_col: str = "label",
) -> DataFrame:
    """Returns (qid, ndcg, err) per query (only qids present in qrels,
    gdeval behavior)."""
    # gdeval.pl keeps only qrels with judgment > 0 (negative judgments, e.g.
    # TREC Web spam -2, are treated as unjudged -> gain 0).  Filter BOTH the
    # run-side join and the ideal DCG; label-0 rows contribute gain 0 either
    # way, negative labels would otherwise produce gain < 0 and decay > 1.
    qrels = qrels.filter(F.col(label_col) > 0)
    run_w = Window.partitionBy(qid_col).orderBy(
        F.col(score_col).desc(), F.col(doc_col).desc()
    )
    run = (
        ranking.withColumn("pos", F.row_number().over(run_w))
        .filter(F.col("pos") <= k)
        .join(qrels.select(qid_col, doc_col, label_col), [qid_col, doc_col], "left")
        .withColumn("g", F.coalesce(F.col(label_col), F.lit(0)).cast("double"))
        .withColumn("gain", F.pow(F.lit(2.0), F.col("g")) - 1)
        .withColumn("r", F.col("gain") / F.lit(float(2 ** MAX_JUDGMENT)))
    )
    decay_w = (
        Window.partitionBy(qid_col)
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    run = run.withColumn(
        "decay", F.exp(F.coalesce(F.sum(F.log(1 - F.col("r"))).over(decay_w), F.lit(0.0)))
    )
    per_q = run.groupBy(qid_col).agg(
        F.sum(F.col("gain") / F.log2(F.col("pos") + 1)).alias("dcg"),
        F.sum(F.col("r") * F.col("decay") / F.col("pos")).alias("err"),
    )
    ideal_w = Window.partitionBy(qid_col).orderBy(F.col(label_col).desc())
    ideal = (
        qrels.withColumn("pos", F.row_number().over(ideal_w))
        .filter(F.col("pos") <= k)
        .groupBy(qid_col)
        .agg(
            F.sum(
                (F.pow(F.lit(2.0), F.col(label_col).cast("double")) - 1)
                / F.log2(F.col("pos") + 1)
            ).alias("idcg")
        )
    )
    return (
        ideal.join(per_q, qid_col, "left")
        .select(
            qid_col,
            F.when(
                F.col("idcg") > 0, F.coalesce(F.col("dcg"), F.lit(0.0)) / F.col("idcg")
            ).otherwise(F.lit(0.0)).alias("ndcg"),
            F.coalesce(F.col("err"), F.lit(0.0)).alias("err"),
        )
    )


def mean_ndcg_err(per_query: DataFrame) -> DataFrame:
    """gdeval's trailing 'amean' row (average over evaluated topics)."""
    return per_query.agg(
        F.avg("ndcg").alias("mean_ndcg"), F.avg("err").alias("mean_err")
    )
