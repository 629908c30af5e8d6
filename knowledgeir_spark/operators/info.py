"""Doc-info assembly / alignment operators (SURVEY.md §2.2 P2/P3, §2.5 J7,
§2.6 W7, §2.9 E5, §2.12 L1).

- combine_info: right-wins per-column merge of two keyed tables
  (scripts/combine_json_info.py:19-31 — dict.update semantics).
- align_to_trec: attach doc-info as a JSON comment to ranking rows
  (prepare/align_doc_info_to_trec.py:21-38), rank-depth predicate included.
- shuffle_stable_sort: random within-query order, stable by int(qid)
  (utils/base.py:370-377) with an EXPLICIT seed for determinism.
- hash_corpus: token/entity -> int-id arrays via broadcast vocab join with
  UNK->0 and per-doc cap (salience/prepare/corpus_hashing.py:74-76,105-109,
  220-240).
- kfold_partition: fold = qid %% k split into train/test/dev
  (letor/kfold_partition.py:40-45).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def combine_info(left: DataFrame, right: DataFrame, key: str) -> DataFrame:
    """All rows of `left`, columns updated from `right` where present
    (right wins per column, like dict.update per docno)."""
    r = right
    for c in right.columns:
        if c != key:
            r = r.withColumnRenamed(c, f"_r_{c}")
    joined = left.join(r, key, "left")
    cols = [F.col(key)]
    for c in left.columns:
        if c == key:
            continue
        if f"_r_{c}" in joined.columns:
            cols.append(F.coalesce(F.col(f"_r_{c}"), F.col(c)).alias(c))
        else:
            cols.append(F.col(c))
    for c in right.columns:
        if c != key and c not in left.columns:
            cols.append(F.col(f"_r_{c}").alias(c))
    return joined.select(*cols)


def align_to_trec(
    ranking: DataFrame, doc_info: DataFrame, max_rank: int = 100,
    doc_col: str = "docno",
) -> DataFrame:
    """ranking (qid, docno, rank, score) x doc_info -> + info_json comment;
    rows beyond max_rank dropped (P5 rank-depth predicate)."""
    info_cols = [c for c in doc_info.columns if c != doc_col]
    info_json = F.to_json(F.struct(*[F.col(c) for c in info_cols]))
    return (
        ranking.filter(F.col("rank") <= max_rank)
        .join(doc_info, doc_col, "left")
        .select(
            "qid", doc_col, "rank", "score",
            F.coalesce(info_json, F.lit("{}")).alias("info_json"),
        )
    )


def shuffle_stable_sort(df: DataFrame, seed: int, qid_col: str = "qid") -> DataFrame:
    """W7: randomized within-query row order, queries ordered by int(qid).
    The reference used random.shuffle + stable sort (base.py:370-377); the
    engine keys the randomness on an explicit seed."""
    return df.orderBy(F.col(qid_col).cast("long"), F.rand(seed))


def hash_corpus(
    doc_tokens: DataFrame,
    vocab: DataFrame,
    max_per_doc: int = 200,
    id_col: str = "doc_id",
    token_col: str = "token",
    pos_col: str = "pos",
) -> DataFrame:
    """E5/J6: (doc_id, token_ids array<int>) — tokens mapped via vocab
    (token -> vid), UNK -> 0, order preserved, capped at max_per_doc."""
    joined = doc_tokens.join(F.broadcast(vocab), token_col, "left").select(
        id_col, pos_col, F.coalesce(F.col("vid"), F.lit(0)).alias("vid")
    )
    agg = joined.groupBy(id_col).agg(
        F.array_sort(F.collect_list(F.struct(pos_col, "vid"))).alias("_pv")
    )
    return agg.select(
        id_col,
        F.slice(
            F.transform(F.col("_pv"), lambda s: s["vid"].cast("int")), 1, max_per_doc
        ).alias("token_ids"),
    )


def kfold_partition(
    df: DataFrame, k: int = 10, qid_col: str = "qid"
) -> DataFrame:
    """L1: fold = int(qid) %% k; dev = (fold+1) %% k convention."""
    fold = (F.col(qid_col).cast("long") % k).cast("int")
    return df.withColumn("fold", fold)
