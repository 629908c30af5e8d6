"""Deduplication operators for web-scale training-data pipelines.

Not present in the reference (it assumes a pre-deduped TREC corpus) but a
first-class requirement for the 10^12-doc target workload.  All variants are
pure DataFrame/Catalyst programs over portable hash primitives (md5), so each
one has an exact DuckDB oracle in the parity suite:

- exact_dedup: hash-groupBy on the full text (one shuffle on the 16-byte
  digest, never on the text itself).
- minhash_lsh: word-shingle MinHash signatures -> banded LSH buckets ->
  candidate pairs -> exact Jaccard verification.  Portable trick: the i-th
  "permutation" is min(md5(i || ':' || shingle)) — md5 hex strings order
  uniformly, so the lexicographic min is a valid minwise hash in ANY engine.
- simhash: 32-bit sign-of-weighted-sum fingerprint from per-term md5 bits;
  near-dup candidates from 8-bit band equality, verified by bit_count(xor).
- ngram_jaccard_pairs: exact shingle-set Jaccard for pairs sharing >=1
  shingle (the verification join exposed as its own operator).
- embedding near-dups live in operators/similarity.py (cosine threshold).

Scale notes: every self-join here is bucketed FIRST (band signature / band
value), so the shuffle key is the bucket, and pair explosion is bounded by
bucket size; Zipf-head shingles are excluded from candidate generation via a
max-df cut (stop-shingle filter), the standard MinHash-at-scale guard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokenize_simple_expr


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(text_hash, keep_doc_id, n_copies) — keeper = min id per hash group."""
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("text_hash"))
        .agg(F.min(id_col).alias("keep_doc_id"), F.count("*").alias("n_copies"))
    )


def doc_shingles(
    docs: DataFrame, k: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Distinct word k-gram shingles per doc: (doc_id, shingle)."""
    toks = tokenize_simple_expr(F.col(text_col))
    # guard: F.sequence(1, 0) would produce a DESCENDING [1, 0] sequence
    sh = F.when(
        F.size(toks) >= k,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (k - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return docs.select(
        F.col(id_col).alias("doc_id"), F.explode(F.array_distinct(sh)).alias("shingle")
    )


def minhash_signatures(shingles: DataFrame, n_hashes: int = 16) -> DataFrame:
    """(doc_id, mh_0..mh_{n-1}) — mh_i = min(md5(i':'shingle)) (hex string)."""
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("shingle")))).alias(f"mh_{i}")
        for i in range(n_hashes)
    ]
    return shingles.groupBy("doc_id").agg(*aggs)


def lsh_candidate_pairs(
    signatures: DataFrame, n_hashes: int = 16, n_bands: int = 4
) -> DataFrame:
    """Banded LSH: docs agreeing on ALL rows of any band become a candidate
    pair (doc_a < doc_b, distinct)."""
    rows = n_hashes // n_bands
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat_ws(
                        "|", *[F.col(f"mh_{b * rows + r}") for r in range(rows)]
                    )
                ).alias("sig"),
            )
            for b in range(n_bands)
        ]
    )
    exploded = signatures.select("doc_id", F.explode(bands).alias("bs")).select(
        "doc_id", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig")
    )
    a = exploded.alias("a")
    b = exploded.alias("b")
    return (
        a.join(b, ["band", "sig"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


def jaccard_verify(
    pairs: DataFrame, shingles: DataFrame, threshold: float = 0.0
) -> DataFrame:
    """Exact |A∩B|/|A∪B| over shingle sets for the candidate pairs."""
    sizes = shingles.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = shingles.withColumnRenamed("doc_id", "doc_a")
    b = shingles.withColumnRenamed("doc_id", "doc_b")
    inter = (
        pairs.join(a, "doc_a")
        .join(b, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("n_sh", "n_a").withColumnRenamed("doc_id", "doc_a"), "doc_a")
        .join(sizes.withColumnRenamed("n_sh", "n_b").withColumnRenamed("doc_id", "doc_b"), "doc_b")
        .select(
            "doc_a", "doc_b", "n_inter", "n_a", "n_b",
            (F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_lsh_dedup(
    docs: DataFrame,
    k: int = 3,
    n_hashes: int = 16,
    n_bands: int = 4,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Full pipeline: near-dup pairs (doc_a, doc_b, jaccard>=threshold)."""
    sh = doc_shingles(docs, k=k, text_col=text_col, id_col=id_col)
    sig = minhash_signatures(sh, n_hashes=n_hashes)
    pairs = lsh_candidate_pairs(sig, n_hashes=n_hashes, n_bands=n_bands)
    return jaccard_verify(pairs, sh, threshold=threshold)


# ---------------------------------------------------------------------------
# SimHash

SIMHASH_BITS = 32


def _term_hash32(term) -> "F.Column":
    """Portable 32-bit term hash: first 8 hex chars of md5, base-16 parsed."""
    return F.conv(F.substring(F.md5(term.cast("binary")), 1, 8), 16, 10).cast("long")


def simhash(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, simhash) — 32-bit tf-weighted sign fingerprint."""
    toks = tokenize_simple_expr(F.col(text_col))
    tf = (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(toks).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
        .withColumn("h", _term_hash32(F.col("term")))
    )
    bit_aggs = [
        F.sum(
            F.col("tf")
            * (F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) * 2 - 1)
        ).alias(f"b{j}")
        for j in range(SIMHASH_BITS)
    ]
    sums = tf.groupBy("doc_id").agg(*bit_aggs)
    sig = None
    for j in range(SIMHASH_BITS):
        bit = F.when(F.col(f"b{j}") > 0, F.lit(2 ** j)).otherwise(F.lit(0))
        sig = bit if sig is None else (sig + bit)
    return sums.select("doc_id", sig.cast("long").alias("simhash"))


def simhash_near_pairs(sig: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Candidate pairs from 8-bit band equality (a pair within hamming<=3 of
    a 32-bit hash must agree on >=1 of 4 bands), verified by bit_count(xor)."""
    n_bands = 4
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright(F.col("simhash"), b * 8).bitwiseAND(F.lit(0xFF)).alias("v"),
            )
            for b in range(n_bands)
        ]
    )
    ex = sig.select("doc_id", "simhash", F.explode(bands).alias("bs")).select(
        "doc_id", "simhash", F.col("bs.band").alias("band"), F.col("bs.v").alias("v")
    )
    a, b = ex.alias("a"), ex.alias("b")
    return (
        a.join(b, ["band", "v"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
