"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   -> flagship BM25 top-k query on /root/testdata/sf0.001
queries()      -> implemented operators from SURVEY.md §2 (knowledgeir_spark.parity)
oracle_sql()   -> matching DuckDB SQL for each query (value-identical output)
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from knowledgeir_spark import parity, parity_ext, parity_web  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: reference-quirk BM25 top-20 over documents (sf0.001)."""
    return parity.q_bm25_topk(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {**parity.queries(), **parity_ext.queries(), **parity_web.queries()}


def oracle_sql() -> dict[str, str]:
    return {
        **parity.oracle_sql(),
        **parity_ext.oracle_sql(),
        **parity_web.oracle_sql(),
    }
