"""Corpus statistics tables (reference: prepare/bow/prepare_corpus_stat.py:28-53,
CorpusStat pickle retrieval_model.py:46-74 — re-expressed as three DataFrames,
SURVEY.md §2.4 A4/A5 and FIXTURES.md §6).

- term_stats(term, df): df = # DISTINCT docs containing term.  (The
  reference's producers are buggy — prepare_corpus_stat.py:40 never
  increments, collect_corpus_stat.py:34-38 counts occurrences; the engine
  implements the documented DF semantics, divergence recorded in SURVEY §2.4.)
- doc_stats(doc_id, doc_len)
- field_stats: scalars (total_df = doc count incl. empty docs,
  avg_doc_len = mean doc_len over all docs).

All derivable from the long-form (doc_id, term, tf, doc_len) produced
map-only by functions/text.doc_terms; term_stats costs ONE term-keyed shuffle
with map-side partial aggregation (safe for Zipf head terms: partial counts
are combined per-partition before the exchange, so skew at this stage is
bounded by #partitions, not df).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class FieldStats:
    total_df: float  # number of docs
    avg_doc_len: float


def term_stats(doc_terms_df: DataFrame) -> DataFrame:
    """(term, df) — doc_terms rows are unique per (doc_id, term) so a plain
    count is the distinct-doc count; no count_distinct shuffle needed."""
    return doc_terms_df.groupBy("term").agg(F.count("*").alias("df"))


def doc_stats(doc_terms_df: DataFrame, docs_df: DataFrame | None = None,
              id_col: str = "doc_id") -> DataFrame:
    """(doc_id, doc_len).  If docs_df is given, empty docs (no terms) are
    included with doc_len=0 so avg_doc_len matches the oracle (mean over ALL
    docs)."""
    present = doc_terms_df.groupBy(id_col).agg(F.first("doc_len").alias("doc_len"))
    if docs_df is None:
        return present
    return (
        docs_df.select(id_col)
        .join(present, id_col, "left")
        .select(id_col, F.coalesce("doc_len", F.lit(0)).alias("doc_len"))
    )


def field_stats(doc_stats_df: DataFrame) -> FieldStats:
    row = doc_stats_df.agg(
        F.count("*").alias("n"), F.avg("doc_len").alias("avg_len")
    ).collect()[0]
    return FieldStats(total_df=float(row["n"]), avg_doc_len=float(row["avg_len"] or 0.0))
