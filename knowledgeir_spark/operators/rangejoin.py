"""Non-equi (range/interval) join operators (SURVEY.md §2.5 J11-J12).

- align_mentions: the coref-mention x entity-location θ-join of
  /root/reference/knowledge4ir/boe_exact/boe_feature.py:297-323
  (_mention_aligned): a mention matches an entity annotation when they share
  (field, st) — an equi part — AND the annotation's ed exceeds the mention's
  head position — the range part.  Expressed as equi-join on (doc, field,
  st) + post-filter, which is exactly how Spark executes a θ-join with an
  equi prefix efficiently (no cross product).
- interval_assign: generic "point/span into covering interval" join via
  bucketized equi-join + filter — the scalable pattern for J12-style
  sentence bucketing when it is not done doc-locally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def align_mentions(
    mentions: DataFrame,
    annotations: DataFrame,
) -> DataFrame:
    """mentions: (doc_id, cluster_id, field, st, head_pos)
    annotations: (doc_id, field, st, ed, entity_id)
    -> clusters aligned to entities: one row per (doc_id, cluster_id,
    entity_id) where ANY mention of the cluster matches the reference rule
    (shared field+st, annotation ed > mention head)."""
    joined = mentions.join(annotations, ["doc_id", "field", "st"]).filter(
        F.col("ed") > F.col("head_pos")
    )
    return joined.select("doc_id", "cluster_id", "entity_id").distinct()


def interval_assign(
    points: DataFrame,
    intervals: DataFrame,
    bucket_width: int = 64,
    point_col: str = "pos",
    lo_col: str = "lo",
    hi_col: str = "hi",
    keys: list[str] | None = None,
) -> DataFrame:
    """Assign each point to intervals with lo <= pos < hi.  Both sides are
    bucketized on pos/bucket (intervals explode to the buckets they span) so
    the join is an equi-join on (keys..., bucket) + filter — no broadcast
    cross product, skew bounded by interval span / bucket_width."""
    keys = keys or ["doc_id"]
    p = points.withColumn("_b", (F.col(point_col) / bucket_width).cast("long"))
    iv = intervals.withColumn(
        "_bs",
        F.sequence(
            (F.col(lo_col) / bucket_width).cast("long"),
            ((F.col(hi_col) - 1) / bucket_width).cast("long"),
        ),
    ).withColumn("_b", F.explode("_bs")).drop("_bs")
    return (
        p.join(iv, [*keys, "_b"])
        .filter((F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) < F.col(hi_col)))
        .drop("_b")
    )
