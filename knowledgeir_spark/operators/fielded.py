"""BM25F: field-weighted fulltext scoring (title/body web pages).

The reference scores fields separately and leaves the combination to the
LeToR stage (knowledge4ir/duet_feature/extractor.py builds one feature per
(field, model)); a standalone serving engine also needs the classic single
-score fielded ranker, so this module adds textbook BM25F (Robertson &
Zaragoza, "The Probabilistic Relevance Framework: BM25 and Beyond", §6):

    ntf(t, d)  = sum_f  w_f * tf_f(t, d) / (1 - b_f + b_f * len_f(d) / avglen_f)
    score(q,d) = sum_{t in q} ln(1 + (N - df_t + 0.5) / (df_t + 0.5))
                              * ntf / (k1 + ntf)

with doc-level df (a term counts once no matter which field it appears
in).  Field text comes from ``functions.html.with_extracted_text`` on real
web pages; the parity row derives title = first-6-tokens deterministically
so DuckDB can replay it.

Plan shape (one scoring run, F fields):
- ONE shuffle builds (doc_id, field, term, tf): the per-field token
  explodes are unioned map-side first, then grouped once;
- field lengths are a partial re-aggregation of that frame (no rescan of
  the text), per-field average lengths a 1-row-per-field broadcast, and
  doc-level df a distinct+count on (doc_id, term);
- the field pivot is conditional aggregation (sum(when(field=f, ...))),
  NOT a join per field, so wtf costs one more groupBy on (doc_id, term);
- query terms are a broadcast join; the final per-(qid, doc) sum uses
  ``ordered_sum`` for run-deterministic float addition, and ranking uses
  the quantized floor(score*1e9) key shared by the whole suite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.scoring import BM25_K1, ordered_sum
from ..functions.text import tokenize_simple_expr
from ..operators.topk import RANK_QUANTUM

# field -> (weight, b); the classic web default boosts title hits
DEFAULT_FIELDS: dict[str, tuple[float, float]] = {
    "title": (2.0, 0.75),
    "body": (1.0, 0.75),
}


def field_terms(docs: DataFrame, field_cols: list[str],
                id_col: str = "doc_id") -> DataFrame:
    """(doc_id, field, term, tf) long form from one string column per field.

    The per-field explodes are unioned BEFORE the groupBy so the whole
    frame is built with a single shuffle.
    """
    parts = []
    for f in field_cols:
        parts.append(
            docs.select(
                F.col(id_col).alias("doc_id"),
                F.lit(f).alias("field"),
                F.explode(tokenize_simple_expr(F.col(f))).alias("term"),
            )
        )
    unioned = parts[0]
    for p in parts[1:]:
        unioned = unioned.unionByName(p)
    return unioned.groupBy("doc_id", "field", "term").agg(
        F.count("*").cast("long").alias("tf")
    )


def bm25f_topk(
    docs: DataFrame,
    q_terms: DataFrame,
    fields: dict[str, tuple[float, float]] | None = None,
    k1: float = BM25_K1,
    k: int = 20,
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k BM25F per query: (qid, doc_id, rank, score).

    ``docs`` carries ``id_col`` plus one string column per field in
    ``fields``; ``q_terms`` is (qid, term, term_idx) with distinct terms
    per query.  ``n_docs`` is computed with a count() action (same
    convention as the rest of the suite's scalar stats).
    """
    fields = fields or DEFAULT_FIELDS
    fcols = list(fields)
    n_docs = docs.count()

    ftf = field_terms(docs, fcols, id_col=id_col)
    flen = ftf.groupBy("doc_id", "field").agg(F.sum("tf").alias("flen"))
    avgl = (
        flen.groupBy("field")
        .agg((F.sum("flen").cast("double") / F.lit(n_docs)).alias("avglen"))
    )
    dfs = (
        ftf.select("doc_id", "term").distinct()
        .groupBy("term").agg(F.count("*").cast("double").alias("df"))
    )

    # normalized per-field tf, pivoted by conditional aggregation
    with_len = ftf.join(flen, ["doc_id", "field"]).join(
        F.broadcast(avgl), "field"
    )
    norm = F.col("tf") / (
        1 - F.col("b") + F.col("b") * F.col("flen") / F.col("avglen")
    )
    with_len = with_len.join(
        F.broadcast(
            docs.sparkSession.createDataFrame(
                [(f, w, b) for f, (w, b) in fields.items()],
                "field string, w double, b double",
            )
        ),
        "field",
    )
    wtf = with_len.groupBy("doc_id", "term").agg(
        F.sum(F.col("w") * norm).alias("wtf")
    )

    matched = (
        F.broadcast(q_terms.select("qid", "term", "term_idx"))
        .join(wtf, "term")
        .join(dfs, "term")
    )
    idf = F.log(
        1.0 + (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    contrib = idf * F.col("wtf") / (F.lit(k1) + F.col("wtf"))
    scored = (
        matched.select("qid", "doc_id", "term_idx", contrib.alias("contrib"))
        .groupBy("qid", "doc_id")
        .agg(ordered_sum(F.col("term_idx"), F.col("contrib")).alias("score"))
    )
    w = Window.partitionBy("qid").orderBy(
        F.floor(F.col("score") * RANK_QUANTUM).desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
