"""URL normalization + host analytics for web-scale corpora.

Engine additions for the Common-Crawl-style input table (`url` column, see
BASELINE.json input_hint): canonical-URL normalization, host extraction,
canonical-URL dedup, and per-host corpus statistics — the front door of any
training-data pipeline over crawl data (dedup-by-URL runs before any
content-level dedup because it is a cheap exact groupBy).

Everything here is pure native column expressions (JVM-side, whole-stage
codegen, no UDFs), so Catalyst can push filters through and prune columns
around these at 10^12-row scale, and the per-host aggregation is an
ordinary partial-agg shuffle on the host key.

Normalization spec (mirrored exactly by the DuckDB parity oracle in
parity_web.py):

  1. lowercase the whole URL,
  2. strip the fragment and query string (first ``[?#]`` to end),
  3. strip the scheme (``^[a-z][a-z0-9+.-]*://``),
  4. strip one leading ``www.``,
  5. strip one trailing ``/``,
  6. re-prefix the canonical scheme ``https://``.

Reference context: KnowledgeIR consumes pre-extracted web corpora
(ClueWeb09/12 — /root/reference/knowledge4ir/utils/base.py:14-30 hard-codes
corpus paths) and never re-crawls, so URL canonicalization has no reference
counterpart; this module is part of the engine's web-ingest surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["strip_url", "canonical_url", "host_of", "url_dedup", "host_stats"]


def strip_url(url: Column) -> Column:
    """scheme/www/query/fragment/trailing-slash-stripped lowercase URL."""
    u = F.lower(url)
    u = F.regexp_replace(u, r"[?#].*$", "")
    u = F.regexp_replace(u, r"^[a-z][a-z0-9+.-]*://", "")
    u = F.regexp_replace(u, r"^www\.", "")
    return F.regexp_replace(u, r"/$", "")


def canonical_url(url: Column) -> Column:
    """Canonical form used as the dedup key."""
    return F.concat(F.lit("https://"), strip_url(url))


def host_of(url: Column) -> Column:
    """Registered host (lowercase, no www., no port)."""
    return F.regexp_replace(strip_url(url), r"[/:].*$", "")


def url_dedup(df: DataFrame, url_col: str = "url", id_col: str = "doc_id") -> DataFrame:
    """One row per canonical URL: the kept (minimum-id) doc + duplicate count.

    A single partial-agg shuffle on the canonical-URL key; at crawl scale the
    key space is ~unique so combiners collapse most groups map-side.
    """
    return (
        df.select(canonical_url(F.col(url_col)).alias("canonical"), F.col(id_col))
        .groupBy("canonical")
        .agg(
            F.min(id_col).alias("keep_doc_id"),
            (F.count("*") - F.lit(1)).cast("long").alias("n_dups"),
        )
    )


def host_stats(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Per-host corpus profile: doc count, distinct canonical URLs, chars,
    distinct languages.  One shuffle on host; distinct counts are exact
    (use approx_count_distinct variants at extreme cardinality)."""
    return (
        df.select(
            host_of(F.col(url_col)).alias("host"),
            canonical_url(F.col(url_col)).alias("canonical"),
            "lang",
            "n_chars",
        )
        .groupBy("host")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("canonical").alias("n_canonical"),
            F.sum("n_chars").alias("total_chars"),
            F.countDistinct("lang").alias("n_langs"),
        )
    )
