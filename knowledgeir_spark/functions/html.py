"""HTML -> (title, body) extraction as an Arrow-vectorized pandas UDF.

Reference behavior: knowledge4ir/prepare/bow/parse_html.py:23-60 (boilerpipe
extract + pre-'<html' trim + whitespace squash).  The engine's frozen spec
lives in knowledgeir_spark/oracle/html.py; this UDF calls that EXACT code so
the per-url byte-identity invariant (BASELINE.json input_hint) holds by
construction and is asserted in tests/test_html.py.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..oracle.html import extract_html

_SCHEMA = T.StructType(
    [
        T.StructField("title", T.StringType()),
        T.StructField("body", T.StringType()),
    ]
)


@F.pandas_udf(_SCHEMA)
def extract_html_udf(html: pd.Series) -> pd.DataFrame:
    out = html.map(extract_html)
    return pd.DataFrame(
        {"title": out.map(lambda x: x[0]), "body": out.map(lambda x: x[1])}
    )


def with_extracted_text(df: DataFrame, html_col: str = "html") -> DataFrame:
    """Adds ``title`` and ``body`` string columns extracted from html."""
    ext = extract_html_udf(F.col(html_col))
    return df.withColumn("_ext", ext).select(
        "*", F.col("_ext.title").alias("title"), F.col("_ext.body").alias("body")
    ).drop("_ext")
