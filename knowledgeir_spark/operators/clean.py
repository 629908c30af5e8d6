"""C4-style corpus cleaning: line-level quality filtering.

The public C4 recipe (Raffel et al. 2020, "Exploring the Limits of
Transfer Learning", appendix C) keeps a line only if it ends in terminal
punctuation, has at least 5 words, and contains neither boilerplate
markers ("javascript", "lorem ipsum") nor code debris ("{"); a document
survives only if at least 3 lines remain.  This module implements that
rule set as pure Catalyst array expressions — the whole filter runs
inside whole-stage codegen with no shuffle and no Python, so it composes
map-side with any downstream tokenize/dedup stage at 10^12-doc scale.

The thresholds are parameters (C4's 5/3 are the defaults); the bad-marker
list is case-insensitive substring containment, as in the original.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

C4_BAD_MARKERS = ("javascript", "lorem ipsum", "{")
C4_TERMINAL_RE = '[.!?"]$'


def _line_ok(line: Column, min_words: int, markers: tuple[str, ...]) -> Column:
    t = F.trim(line)
    words = F.size(F.filter(F.split(t, r"\s+"), lambda w: w != F.lit("")))
    ok = t.rlike(C4_TERMINAL_RE) & (words >= F.lit(min_words))
    low = F.lower(t)
    for m in markers:
        ok = ok & ~low.contains(m)
    return ok


def c4_line_filter(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 5,
    min_lines: int = 3,
    markers: tuple[str, ...] = C4_BAD_MARKERS,
) -> DataFrame:
    """(doc_id, clean_text, n_kept, n_dropped) for docs that keep at least
    ``min_lines`` lines; everything else is filtered out entirely."""
    lines = F.split(F.col(text_col), "\n")
    kept = F.filter(lines, lambda l: _line_ok(l, min_words, markers))
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.size(lines).alias("n_lines"),
            F.size(kept).alias("n_kept"),
            F.array_join(kept, "\n").alias("clean_text"),
        )
        .filter(F.col("n_kept") >= min_lines)
        .select(
            "doc_id",
            "clean_text",
            "n_kept",
            (F.col("n_lines") - F.col("n_kept")).alias("n_dropped"),
        )
    )
