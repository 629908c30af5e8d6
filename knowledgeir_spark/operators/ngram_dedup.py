"""Repeated n-gram span detection — exact-substring dedup for training data.

The Lee et al. (ACL'22, "Deduplicating Training Data Makes Language Models
Better") observation: beyond whole-document near-dups, web corpora carry
VERBATIM repeated spans (boilerplate, licenses, quoted chunks) that inflate
memorization.  Their suffix-array pass marks every substring of >= L tokens
occurring more than once in the corpus.  The distributed re-expression:
every duplicated substring of length >= n is a chain of duplicated token
n-grams, so marking all n-gram starts whose n-gram occurs >= min_count
times corpus-wide — then taking the union of their [start, start+n-1]
windows — yields exactly the tokens inside duplicated spans of length >= n
(the standard MapReduce approximation of the suffix-array method; no
suffix array needed).

Pipeline (all built-in expressions, one shuffle on the n-gram key):
  1. tokenize -> tokens array per doc (whole-stage codegen)
  2. explode n-gram start positions; key = md5 of the \\x01-joined window
     (fixed-width 32-char key instead of shuffling variable-width text)
  3. groupBy key -> occurrence count; duplicated = count >= min_count
  4. semi-join starts to duplicated keys; per-doc stats:
     n_dup_ngrams (duplicated starts) and n_dup_tokens (size of the union
     of covered positions, via explode(sequence(s, s+n-1)).distinct)

Plan shape / 100 TB notes:
- One wide shuffle (groupBy ngram key) — the same shape and volume as the
  index build's postings shuffle, so the proven salted/volume-sized
  partitioning story applies; the key is fixed 32 bytes regardless of span
  text.  The duplicated-key set is Zipf-concentrated; the semi-join back
  is key-partitioned, no broadcast assumption.
- Coverage union explodes n rows per duplicated start (bounded blowup
  n x dup_starts), then a distinct on (doc_id, pos) — for interval-sparse
  regimes a sort+lag sweep per doc would replace the distinct; at dedup
  density typical of web corpora the explode is the simpler plan and is
  map-local until the final per-doc count.
- min_count=2 marks ANY repetition (incl. within-doc); raise it to only
  strip high-multiplicity boilerplate.

No reference counterpart (KnowledgeIR has no dedup at all); engine
addition for the training-data pipeline, sibling of operators/dedup.py
(document-level MinHash/SimHash) — this one is SPAN-level.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokenize_simple_expr

SEP = ""


def repeated_ngram_stats(
    docs: DataFrame,
    n: int = 8,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc duplicated-span statistics.

    Returns (doc_id, n_tokens, n_dup_ngrams, n_dup_tokens):
      n_tokens     — tokenized length,
      n_dup_ngrams — n-gram start positions whose n-gram occurs >= min_count
                     times corpus-wide (all occurrences count, incl. same-doc),
      n_dup_tokens — tokens covered by the union of those [s, s+n-1] windows.
    Docs shorter than n tokens have zero in both dup columns.
    """
    toks = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            tokenize_simple_expr(F.col(text_col)).alias("toks"),
        )
        .withColumn("n_tokens", F.size("toks").cast("long"))
    )
    # n-gram keys per start position; empty array when the doc is too short
    # (sequence() would count DOWN for start > stop, so guard explicitly)
    keys = F.when(
        F.col("n_tokens") >= n,
        F.transform(
            F.sequence(F.lit(0), (F.col("n_tokens") - n).cast("int")),
            lambda i: F.md5(F.concat_ws(SEP, F.slice("toks", i + 1, n))),
        ),
    ).otherwise(F.array().cast("array<string>"))
    starts = toks.select(
        "doc_id", F.posexplode(keys).alias("start", "key")
    )
    # the exploded frame feeds three consumers (dup-key agg, semi-join,
    # coverage); Catalyst does not share subplans across them, so persist
    # once — spillable, since at corpus scale this is ~|tokens| rows
    from pyspark import StorageLevel

    starts.persist(StorageLevel.MEMORY_AND_DISK)
    dup_keys = (
        starts.groupBy("key")
        .agg(F.count("*").alias("n_occ"))
        .filter(F.col("n_occ") >= min_count)
        .select("key")
    )
    dup_starts = starts.join(dup_keys, "key", "left_semi")
    # single aggregation over the exploded coverage frame: dup-start count
    # and covered-token count in one pass (distinct starts / distinct
    # positions per doc)
    agg = (
        dup_starts.select(
            "doc_id",
            "start",
            F.explode(
                F.sequence(F.col("start"), F.col("start") + (n - 1))
            ).alias("pos"),
        )
        .groupBy("doc_id")
        .agg(
            F.count_distinct("start").alias("n_dup_ngrams"),
            F.count_distinct("pos").alias("n_dup_tokens"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # materialize the doc-sized aggregate through the cached token-sized
    # frame, then free the big cache immediately — long-lived sessions must
    # not accumulate ~|corpus tokens| of cached rows per call.  The returned
    # frame reads the (|docs|-row) agg cache, which Spark evicts under
    # memory pressure; callers holding many results may agg.unpersist() via
    # the returned plan if they need to reclaim it sooner.
    agg.count()
    starts.unpersist()
    return (
        toks.select("doc_id", "n_tokens")
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("n_dup_ngrams", F.lit(0)).cast("long").alias("n_dup_ngrams"),
            F.coalesce("n_dup_tokens", F.lit(0)).cast("long").alias("n_dup_tokens"),
        )
    )
