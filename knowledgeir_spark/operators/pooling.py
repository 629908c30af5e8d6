"""Feature pooling operators (SURVEY.md §2.4 A7/A8).

Reference: /root/reference/knowledge4ir/utils/base.py:633-681
(``mean_pool_feature`` etc.): fold a group of per-item feature values into
_Mean/_Max/_Sum/_LogSum columns; the log pool clamps each value at e^-30
before log (line ~669).  And q_de_text.py:290-306: per-feature top-k scores
sorted desc, padded to k with -20.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

LOG_CLAMP = math.exp(-30)
PAD_SCORE = -20.0


def pool_features(
    df: DataFrame, group_cols: list[str], value_col: str, name: str
) -> DataFrame:
    """-> group_cols + {name}_Mean/_Max/_Sum/_LogSum."""
    v = F.col(value_col)
    return df.groupBy(*group_cols).agg(
        F.avg(v).alias(f"{name}_Mean"),
        F.max(v).alias(f"{name}_Max"),
        F.sum(v).alias(f"{name}_Sum"),
        F.sum(F.log(F.greatest(v, F.lit(LOG_CLAMP)))).alias(f"{name}_LogSum"),
    )


def topk_padded(
    df: DataFrame, group_cols: list[str], value_col: str, k: int, name: str
) -> DataFrame:
    """A8: per group, the k largest values desc, padded with -20 to exactly k
    columns {name}_Top1..{name}_Topk."""
    w = Window.partitionBy(*group_cols).orderBy(F.col(value_col).desc())
    ranked = df.withColumn("_r", F.row_number().over(w)).filter(F.col("_r") <= k)
    agg = ranked.groupBy(*group_cols).agg(
        F.array_sort(F.collect_list(F.struct("_r", F.col(value_col).alias("v")))).alias("_tv")
    )
    cols = [F.col(c) for c in group_cols]
    for i in range(k):
        cols.append(
            F.coalesce(
                F.try_element_at("_tv", F.lit(i + 1))["v"], F.lit(PAD_SCORE)
            ).alias(f"{name}_Top{i + 1}")
        )
    return agg.select(*cols)
