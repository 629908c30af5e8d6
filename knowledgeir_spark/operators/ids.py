"""Deterministic dense doc_id assignment for url-keyed corpora.

The reference keys docs by string docno; the engine's posting lists need
dense int64 ids (SURVEY.md §1.2 "Keys").  Spark's monotonically_increasing_id
is neither dense nor run-deterministic, so we sort by the natural key and use
RDD zipWithIndex — a two-pass scheme (per-partition counts -> offsets) that
yields ids equal to the global sort rank.  Deterministic across runs and
partitionings; the total sort is a one-time build cost and is the standard
way to mint ids at 10^12-row scale without a single-partition window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def assign_doc_ids(df: DataFrame, key_col: str = "url",
                   id_col: str = "doc_id") -> DataFrame:
    spark = df.sparkSession
    schema = T.StructType(
        [T.StructField(id_col, T.LongType(), False)] + list(df.schema.fields)
    )
    rdd = (
        df.orderBy(F.col(key_col).asc())
        .rdd.zipWithIndex()
        .map(lambda pair: (pair[1], *pair[0]))
    )
    return spark.createDataFrame(rdd, schema)
