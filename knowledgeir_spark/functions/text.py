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


# byte-level tokenizer tables: token bytes kept, every other byte mapped to
# space.  Tokens are ASCII-only by spec ([a-z0-9/]+ after lowercasing), and
# every byte of a UTF-8 multi-byte sequence is >= 0x80, so translating at
# the byte level after str.lower() yields exactly re.findall's token runs
# (property-tested against the oracle tokenizer).
_SPEC_KEEP = frozenset(b"abcdefghijklmnopqrstuvwxyz0123456789/")
_SPEC_TABLE = bytes(b if b in _SPEC_KEEP else 0x20 for b in range(256))
_SIMPLE_TABLE = bytes(
    b if b in frozenset(b"abcdefghijklmnopqrstuvwxyz0123456789") else 0x20
    for b in range(256)
)


def doc_terms(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
              simple: bool = False) -> DataFrame:
    """(id, term, tf, doc_len) long-form — map-only (NO shuffle).

    doc_len = total post-clean term count, the reference's
    ``doc_len = sum(h_doc_terms.values())`` (retrieval_model.py:131).
    Rows for empty docs are absent (doc_len==0 docs produce no terms).
    ``simple=True`` switches to the symmetric simple tokenizer (no stopwords,
    [a-z0-9]+ — the SQL-parity spec).

    Implementation (round-6 rewrite, guide §4.2 — no per-token Python
    objects anywhere): mapInArrow; per batch the lowered texts are
    byte-translated (token bytes kept, all else -> space) into ONE buffer,
    token boundaries come from vectorized numpy run detection, the token
    column is an Arrow string array whose offsets re-slice the compacted
    buffer (zero string-object creation), term ids come from Arrow
    dictionary_encode, and tf/doc_len are the same combined-key counting as
    before.  Output columns are built as Arrow arrays directly
    (dictionary take for the term strings)."""
    stop = frozenset() if simple else STOPWORDS
    table = _SIMPLE_TABLE if simple else _SPEC_TABLE
    out_schema = f"{id_col} long, term string, tf long, doc_len long"

    def tokenize_batches(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        stop_arr = pa.array(sorted(stop)) if stop else None
        for batch in batches:
            ids_in = batch.column(
                batch.schema.get_field_index(id_col)
            ).to_numpy(zero_copy_only=False)
            texts = batch.column(
                batch.schema.get_field_index(text_col)
            ).to_pandas()
            parts = [
                t.lower().encode("utf-8").translate(table) if t else b""
                for t in texts.fillna("")
            ]
            big = b" ".join(parts)
            if not big.strip():
                continue
            buf = np.frombuffer(big, np.uint8)
            nonspace = buf != 0x20
            tok_starts = np.flatnonzero(nonspace & np.r_[True, ~nonspace[:-1]])
            tok_ends = np.flatnonzero(nonspace & np.r_[~nonspace[1:], True]) + 1
            # doc i owns byte range [doc_off[i], doc_off[i+1])
            doc_off = np.zeros(len(parts) + 1, dtype=np.int64)
            np.cumsum(
                np.fromiter((len(p) + 1 for p in parts), np.int64, len(parts)),
                out=doc_off[1:],
            )
            doc_idx = np.searchsorted(doc_off, tok_starts, side="right") - 1
            # Arrow string array over the COMPACTED token bytes: offsets =
            # cumulative token lengths, values = all non-space bytes (token
            # bytes are contiguous and in order) — no per-token objects
            offsets = np.zeros(len(tok_starts) + 1, dtype=np.int32)
            np.cumsum(tok_ends - tok_starts, out=offsets[1:])
            tok_arr = pa.Array.from_buffers(
                pa.utf8(), len(tok_starts),
                [None, pa.py_buffer(offsets.tobytes()),
                 pa.py_buffer(buf[nonspace].tobytes())],
            )
            enc = pc.dictionary_encode(tok_arr)
            codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            uniques = enc.dictionary
            if stop_arr is not None:
                stop_mask = pc.is_in(
                    uniques, value_set=stop_arr
                ).to_numpy(zero_copy_only=False)
                keep = ~stop_mask[codes]
                doc_idx, codes = doc_idx[keep], codes[keep]
                if not len(codes):
                    continue
            n_u = len(uniques)
            key = doc_idx * n_u + codes
            uk, counts = np.unique(key, return_counts=True)
            out_d = (uk // n_u).astype(np.int64)
            dl_per_doc = np.zeros(len(parts), dtype=np.int64)
            np.add.at(dl_per_doc, out_d, counts)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids_in[out_d].astype(np.int64)),
                    pc.take(uniques, pa.array((uk % n_u).astype(np.int64))),
                    pa.array(counts.astype(np.int64)),
                    pa.array(dl_per_doc[out_d]),
                ],
                names=[id_col, "term", "tf", "doc_len"],
            )

    return df.select(id_col, text_col).mapInArrow(tokenize_batches, out_schema)


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
