"""Faceted result aggregation: per-query counts over document attributes.

The search-UI staple (Elasticsearch `aggs`, Solr facets): alongside the
ranked top-k, report for each query how the FULL match set distributes over
a categorical document attribute (language, source, host, ...).  The
reference has no serving layer at all; this is part of the engine-addition
serving surface (snippets, spell, autocomplete, facets).

Plan shape / 100 TB notes:
- `matched` is (qid, doc_id) — one row per (query, matching doc), typically
  produced by the same semi-join that feeds the scorer, so the facet pass
  reuses the retrieval match set rather than re-scanning the corpus.
- The docs-side join ships only (doc_id, facet) — column pruning reaches
  the parquet scan; the aggregate is one shuffle on (qid, facet) with
  map-side partial counts.  Facet cardinality is bounded by the attribute
  (languages, hosts), so the result is small regardless of corpus size.
- distinct() before counting guards against a matched frame that carries
  one row per (qid, doc_id, term) — facets count DOCUMENTS, not term hits.

No reference counterpart; engine addition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def facet_counts(
    matched: DataFrame,
    docs: DataFrame,
    facet_col: str,
    qid_col: str = "qid",
    doc_col: str = "doc_id",
) -> DataFrame:
    """Count matched docs per (query, facet value).

    matched: (qid, doc_id[, ...]) match set (duplicates collapsed here).
    docs:    document table carrying `facet_col` keyed by doc_id.
    Returns (qid, facet, n_docs).  Docs with a NULL facet value are not
    counted (a missing attribute is not a facet bucket) — the same rule the
    serving sidecar (index/facetstore.write_facet_store) applies, so the
    distributed and serving paths agree.
    """
    m = matched.select(
        F.col(qid_col).alias("qid"), F.col(doc_col).alias("doc_id")
    ).distinct()
    d = docs.select(
        F.col(doc_col).alias("doc_id"), F.col(facet_col).alias("facet")
    ).where(F.col("facet").isNotNull())
    return (
        m.join(d, "doc_id")
        .groupBy("qid", "facet")
        .agg(F.count("*").alias("n_docs"))
    )
