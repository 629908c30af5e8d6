"""SVM-rank feature file format (SURVEY.md §2.1 S8, §2.4 A11/A12).

Reference: /root/reference/knowledge4ir/utils/base.py:273-367
(``load_svm_feature`` / ``dump_svm_feature`` / ``_dumps_svm_line``) and
feature-id densification ``feature_hash`` at :393-417 (sorted feature names
-> ids 1..N, with any name containing 'base' forced first — quirk kept).

Engine representation: (qid, docno, label, features map<string,double>);
files are parsed/emitted via JVM string expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_svm(spark: SparkSession, path: str) -> DataFrame:
    """Parse ``label qid:<q> 1:v 2:v ... # docno`` -> (qid, docno, label,
    features map<int-as-string,double>)."""
    lines = spark.read.text(path)
    body = F.split(F.col("value"), "\\s*#\\s*")
    toks = F.split(F.trim(body.getItem(0)), "\\s+")
    feat_pairs = F.filter(toks, lambda t: t.contains(":") & ~t.startswith("qid"))
    return lines.select(
        F.regexp_extract(F.col("value"), r"qid:(\S+)", 1).alias("qid"),
        F.trim(body.getItem(1)).alias("docno"),
        toks.getItem(0).cast("int").alias("label"),
        F.map_from_arrays(
            F.transform(feat_pairs, lambda t: F.split(t, ":").getItem(0)),
            F.transform(feat_pairs, lambda t: F.split(t, ":").getItem(1).cast("double")),
        ).alias("features"),
    )


def feature_name_ids(df: DataFrame, features_col: str = "features") -> DataFrame:
    """A11: global sorted name -> id (1..N), names containing 'base' first
    (reference feature_hash quirk, base.py:400-407).  Returns (name, fid)."""
    names = df.select(
        F.explode(F.map_keys(F.col(features_col))).alias("name")
    ).distinct()
    from pyspark.sql import Window

    w = Window.orderBy(
        (~F.col("name").contains("base")).cast("int"), F.col("name").asc()
    )
    return names.withColumn("fid", F.row_number().over(w))


def write_svm(df: DataFrame, path: str, name_ids: DataFrame | None = None) -> None:
    """df: (qid, docno, label, features map<string,double>) -> svm-rank lines.
    Features are densified via name_ids (or feature_name_ids(df)) and emitted
    sorted by id; rows sorted by (int(qid), docno) for determinism."""
    if name_ids is None:
        name_ids = feature_name_ids(df)
    exploded = df.select(
        "qid", "docno", "label", F.explode(F.col("features")).alias("name", "v")
    ).join(F.broadcast(name_ids), "name")
    lines = (
        exploded.groupBy("qid", "docno", "label")
        .agg(
            F.array_sort(F.collect_list(F.struct("fid", "v"))).alias("fv")
        )
        .select(
            F.concat_ws(
                " ",
                F.col("label").cast("string"),
                F.concat(F.lit("qid:"), F.col("qid")),
                F.concat_ws(
                    " ",
                    F.transform(
                        F.col("fv"),
                        lambda s: F.concat(
                            s["fid"].cast("string"), F.lit(":"), s["v"].cast("string")
                        ),
                    ),
                ),
                F.lit("#"),
                F.col("docno"),
            ).alias("value"),
            F.col("qid").cast("long").alias("_q"),
            F.col("docno").alias("_d"),
        )
        .orderBy("_q", "_d")
        .select("value")
    )
    lines.coalesce(1).write.mode("overwrite").text(path)
