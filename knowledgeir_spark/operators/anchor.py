"""Anchor-text aggregation: the classic web-ranking field.

The reference consumes pre-built corpus fields (title/bodyText in its
hashed JSON docs); a web-scale indexer has to BUILD the anchor field from
the link graph: every (src -> dst, anchor_text) edge contributes the
anchor's tokens to the DESTINATION page's searchable text, so a page is
findable by what others call it (the "miserable failure" effect).

``aggregate_anchor_text`` turns an edge table into one anchor string per
destination doc, deterministically ordered by (src, link_id) so repeated
runs and the DuckDB oracle agree byte-for-byte; the result plugs into
BM25F (operators/fielded.py) as just another weighted field — the parity
row scores (title, body, anchor) three ways.

Scale shape: one groupBy on dst — the same shuffle any inlink aggregation
needs.  Popular pages (Zipf in-degree) make hot groups; ``max_inlinks``
caps the collected list per dst (rank by (src, link_id), keep the first
``max_inlinks``) so a 10^8-inlink homepage cannot OOM an executor — the
cap is a documented relevance choice (first-N anchors), not silent loss:
``n_inlinks`` reports the TRUE count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def aggregate_anchor_text(
    links: DataFrame,
    max_inlinks: int = 1000,
) -> DataFrame:
    """(doc_id, anchor, n_inlinks) from (src, dst, link_id, anchor_text).

    ``anchor`` is the space-joined concatenation of each in-link's
    anchor_text in (src, link_id) order, truncated to the first
    ``max_inlinks`` edges; ``n_inlinks`` is the uncapped in-degree.
    """
    w = Window.partitionBy("dst").orderBy("src", "link_id")
    ranked = links.withColumn("_r", F.row_number().over(w))
    kept = (
        ranked.filter(F.col("_r") <= max_inlinks)
        .groupBy("dst")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct("src", "link_id", "anchor_text")
                        )
                    ),
                    lambda x: x["anchor_text"],
                ),
            ).alias("anchor")
        )
    )
    degrees = links.groupBy("dst").agg(F.count("*").alias("n_inlinks"))
    return (
        kept.join(degrees, "dst")
        .select(F.col("dst").alias("doc_id"), "anchor", "n_inlinks")
    )
