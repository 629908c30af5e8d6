"""Reciprocal-rank fusion of heterogeneous ranked lists (hybrid retrieval).

The modern serving idiom the reference never had but its users need: fuse a
lexical BM25 ranking with an embedding-ANN ranking (or any N rankings) into
one list via RRF (Cormack, Clarke & Buettcher, SIGIR'09):

    score(d) = sum over lists L of 1 / (k_rrf + rank_L(d))

RRF is rank-only — it needs no score calibration across engines, which is
exactly why it is the default hybrid fuser in production search stacks
(Elasticsearch/OpenSearch/Vespa all ship it).

Determinism / oracle contract: the fused score is built as a FIXED
left-to-right expression tree over the input lists (list_0 + list_1 + ...),
never a row-order-dependent SUM over a union, so a SQL oracle that writes
the same coalesce-chain reproduces it bit-for-bit (IEEE addition of the
same doubles in the same order).  Final order key is the engine-wide
(floor(score*1e9) DESC, doc_id ASC) quantized rank key.

Plan shape / 100 TB notes:
- Each input list is already a per-query top-k (k rows per qid), so every
  join here is on (qid, doc_id) over k-bounded frames — broadcastable for
  serving-sized query batches, shuffle-on-(qid) for offline fan-outs; the
  fused frame never exceeds sum of the input depths per qid.
- No driver-side collection; the fuse is a pure DataFrame program.

No reference counterpart (KnowledgeIR delegates retrieval to Indri/ES and
has no embedding index); engine addition for hybrid lexical+vector serving.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

RANK_QUANTUM = 1e9


def rrf_fuse(
    lists: list[DataFrame],
    k_rrf: int = 60,
    topk: int = 20,
    qid_col: str = "qid",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Fuse N ranked lists [(qid, doc_id, rank), ...] by reciprocal-rank.

    Returns (qid, doc_id, rrf_score, rank) with rank 1..topk per qid under
    the quantized key (floor(score*1e9) DESC, doc_id ASC).  A document
    absent from a list contributes 0 from that list (standard RRF).
    """
    if not lists:
        raise ValueError("rrf_fuse needs at least one ranked list")
    legs = [
        df.select(
            F.col(qid_col).alias("qid"),
            F.col(doc_col).alias("doc_id"),
            F.col(rank_col).cast("double").alias(f"_r{i}"),
        )
        for i, df in enumerate(lists)
    ]
    # full-outer chain on (qid, doc_id): keeps docs present in ANY list
    joined = reduce(lambda a, b: a.join(b, ["qid", "doc_id"], "full_outer"), legs)
    # fixed left-to-right addition chain -> deterministic float result
    score = reduce(
        lambda acc, i: acc
        + F.coalesce(F.lit(1.0) / (F.lit(float(k_rrf)) + F.col(f"_r{i}")), F.lit(0.0)),
        range(1, len(legs)),
        F.coalesce(F.lit(1.0) / (F.lit(float(k_rrf)) + F.col("_r0")), F.lit(0.0)),
    )
    scored = joined.select("qid", "doc_id", score.alias("rrf_score"))
    w = Window.partitionBy("qid").orderBy(
        F.floor(F.col("rrf_score") * RANK_QUANTUM).desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
    )
