"""TREC ranking + qrel text formats (SURVEY.md §2.1 S6/S7).

Reference readers/writers: /root/reference/knowledge4ir/utils/base.py
- rankings: ``qid Q0 docno rank score # comment`` read at :24-80 (cols 0/2/4,
  optional '#'-prefixed JSON comment), written at :99-145 sorted by
  (int(qid) asc, rank asc);
- qrels: ``qid 0 docno label`` at :162-197.

Engine versions parse with JVM split expressions (no Python), tolerate the
optional trailing comment, and write through a single text column so the
byte format round-trips.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_trec(spark: SparkSession, path: str) -> DataFrame:
    """-> (qid, docno, rank, score)."""
    lines = spark.read.text(path)
    parts = F.split(F.trim(F.col("value")), "\\s+")
    return lines.select(
        parts.getItem(0).alias("qid"),
        parts.getItem(2).alias("docno"),
        parts.getItem(3).cast("int").alias("rank"),
        parts.getItem(4).cast("double").alias("score"),
    )


def write_trec(ranked: DataFrame, path: str, run_name: str = "knowledgeir_spark") -> None:
    """ranked: (qid, docno, rank, score).  Sorted (int(qid), rank) like the
    reference writer; single output file for the text format."""
    (
        ranked.orderBy(F.col("qid").cast("long"), F.col("rank"))
        .select(
            F.concat_ws(
                " ",
                F.col("qid"),
                F.lit("Q0"),
                F.col("docno").cast("string"),
                F.col("rank").cast("string"),
                F.col("score").cast("string"),
                F.lit("# " + run_name),
            ).alias("value")
        )
        .coalesce(1)
        .write.mode("overwrite")
        .text(path)
    )


def read_qrel(spark: SparkSession, path: str) -> DataFrame:
    """-> (qid, docno, label)."""
    lines = spark.read.text(path)
    parts = F.split(F.trim(F.col("value")), "\\s+")
    return lines.select(
        parts.getItem(0).alias("qid"),
        parts.getItem(2).alias("docno"),
        parts.getItem(3).cast("int").alias("label"),
    )


def write_qrel(qrels: DataFrame, path: str) -> None:
    (
        qrels.orderBy(F.col("qid").cast("long"), F.col("docno"))
        .select(
            F.concat_ws(
                " ", F.col("qid"), F.lit("0"), F.col("docno").cast("string"),
                F.col("label").cast("string"),
            ).alias("value")
        )
        .coalesce(1)
        .write.mode("overwrite")
        .text(path)
    )
