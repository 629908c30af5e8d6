"""Tokenization / text normalization as Spark expressions + the TF pandas UDF.

Implements the frozen tokenizer spec of knowledgeir_spark/oracle/tokenizer.py
(reference semantics: knowledge4ir/utils/nlp.py:24-54, T1-T6 in SURVEY.md §2.3).

Two implementations, used for different things:

1. ``doc_tf_map`` — Arrow-vectorized pandas UDF computing the per-doc
   term->tf map doc-locally.  This is the ENGINE HOT PATH for index builds:
   per-doc TF needs no shuffle (the reference's term2lm, nlp.py:47-54, is a
   doc-local fold), so the whole tokenize+count stage is map-only; the first
   shuffle in the index pipeline is the term-keyed exchange.

2. ``tokenize_expr`` / ``doc_terms_builtin`` — pure built-in expressions
   (split/explode/groupBy).  Whole-stage-codegen'd, used for SQL-parity
   checks and wherever an array column is wanted.  Cross-validated against
   (1) in tests.
"""

from __future__ import annotations

import re
from collections import Counter

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..oracle.tokenizer import STOPWORDS, TOKEN_RE

# Java regex equivalent of the spec's token definition ([a-z0-9/]+ runs kept,
# i.e. split on anything else).
SPLIT_PATTERN = "[^a-z0-9/]+"
SIMPLE_SPLIT_PATTERN = "[^a-z0-9]+"

_STOP_LIST = sorted(STOPWORDS)


def tokenize_expr(col: Column, remove_stopwords: bool = True) -> Column:
    """array<string> of doc-side terms (spec v1), pure built-in expressions."""
    toks = F.split(F.lower(col), SPLIT_PATTERN)
    if remove_stopwords:
        return F.filter(toks, lambda t: (t != F.lit("")) & ~t.isin(_STOP_LIST))
    return F.filter(toks, lambda t: t != F.lit(""))


def tokenize_simple_expr(col: Column) -> Column:
    """Symmetric simple tokenizer ([a-z0-9]+, no stopwords) — used by the
    DuckDB-parity suite; mirror SQL: string_split_regex(lower(x),'[^a-z0-9]+')."""
    toks = F.split(F.lower(col), SIMPLE_SPLIT_PATTERN)
    return F.filter(toks, lambda t: t != F.lit(""))


def query_terms_expr(col: Column) -> Column:
    """Query-side terms: lowercase whitespace split ONLY (ir_fusion.py:52)."""
    return F.filter(F.split(F.lower(col), "\\s+"), lambda t: t != F.lit(""))


@F.pandas_udf(T.MapType(T.StringType(), T.IntegerType()))
def doc_tf_map(text: pd.Series) -> pd.Series:
    """term -> tf per doc, exact oracle spec (Arrow-batched).  Kept for
    map-column consumers; the hot path is ``doc_terms`` below (long-form via
    mapInPandas — MapType Arrow serde is ~5x slower than flat columns)."""
    token_re: re.Pattern = TOKEN_RE
    stop = STOPWORDS

    def one(t):
        if t is None:
            return {}
        return dict(Counter(x for x in token_re.findall(t.lower()) if x not in stop))

    return text.map(one)


def doc_terms(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
              simple: bool = False) -> DataFrame:
    """(id, term, tf, doc_len) long-form — map-only (NO shuffle).

    doc_len = total post-clean term count, the reference's
    ``doc_len = sum(h_doc_terms.values())`` (retrieval_model.py:131).
    Rows for empty docs are absent (doc_len==0 docs produce no terms).
    ``simple=True`` switches to the symmetric simple tokenizer (no stopwords,
    [a-z0-9]+ — the SQL-parity spec).

    Implementation: mapInPandas emitting flat Arrow columns; tokenization is
    pandas .str vectorized C paths + one pandas groupby per batch — no
    per-row Python and no MapType serde.
    """
    from ..oracle.tokenizer import SIMPLE_TOKEN_RE

    stop = frozenset() if simple else STOPWORDS
    pattern = (SIMPLE_TOKEN_RE if simple else TOKEN_RE).pattern
    out_schema = f"{id_col} long, term string, tf long, doc_len long"

    def tokenize_batches(batches):
        import re as _re

        token_re = _re.compile(pattern)
        for pdf in batches:
            toks = pdf[text_col].fillna("").str.lower().str.findall(token_re)
            lens = toks.map(len).to_numpy()
            if lens.sum() == 0:
                continue
            doc_ids = np.repeat(pdf[id_col].to_numpy(), lens)
            terms = np.concatenate(
                [np.asarray(t, dtype=object) for t in toks if len(t)]
            )
            # factorize once (each string hashed once), then count on int
            # codes — far less memory traffic than a string groupby
            codes, uniques = pd.factorize(terms, sort=False)
            if stop:
                stop_code = np.isin(np.asarray(uniques, dtype=object), list(stop))
                keep = ~stop_code[codes]
                doc_ids, codes = doc_ids[keep], codes[keep]
                if not len(codes):
                    continue
            # combined (doc, code) key: doc ids within a batch span a small
            # range, so (doc_idx * n_uniques + code) fits int64 comfortably
            d_codes, d_uniques = pd.factorize(doc_ids, sort=False)
            n_u = len(uniques)
            key = d_codes.astype(np.int64) * n_u + codes
            uk, counts = np.unique(key, return_counts=True)
            out_doc = d_uniques[(uk // n_u).astype(np.int64)]
            out_term = np.asarray(uniques, dtype=object)[(uk % n_u).astype(np.int64)]
            dl_per_doc = np.zeros(len(d_uniques), dtype=np.int64)
            np.add.at(dl_per_doc, (uk // n_u).astype(np.int64), counts)
            out_dl = dl_per_doc[(uk // n_u).astype(np.int64)]
            yield pd.DataFrame(
                {
                    id_col: out_doc,
                    "term": out_term,
                    "tf": counts.astype(np.int64),
                    "doc_len": out_dl,
                }
            )

    return df.select(id_col, text_col).mapInPandas(tokenize_batches, out_schema)


def doc_terms_builtin(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    simple: bool = False,
) -> DataFrame:
    """Same output as ``doc_terms`` via pure built-ins (one extra shuffle on
    (id, term)); kept for cross-validation and as a UDF-free fallback.
    ``simple=True`` switches to the symmetric simple tokenizer (the
    DuckDB-parity suite's SQL-expressible spec)."""
    toks = tokenize_simple_expr(F.col(text_col)) if simple else tokenize_expr(F.col(text_col))
    base = df.select(id_col, F.size(toks).alias("doc_len"), F.explode(toks).alias("term"))
    return (
        base.groupBy(id_col, "doc_len", "term")
        .agg(F.count("*").alias("tf"))
        .select(id_col, "term", F.col("tf").cast("long"), F.col("doc_len").cast("long"))
    )
