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
- simhash: 64-bit sign-of-weighted-sum fingerprint from per-term md5 bits;
  near-dup candidates from 16-bit band equality, verified by bit_count(xor).
- ngram_jaccard_pairs: exact shingle-set Jaccard for pairs sharing >=1
  shingle (the verification join exposed as its own operator).
- embedding near-dups live in operators/similarity.py (cosine threshold).

Scale notes: every self-join here is bucketed FIRST (band signature / band
value), so the shuffle key is the bucket, and pair explosion is bounded by
bucket size.  Two explicit guards keep candidate generation sub-quadratic on
web corpora: (1) Zipf-head shingles are excluded before MinHash via a max-df
cut (stop_shingle_cut — boilerplate shared by 10^7 docs must not seed
buckets), and (2) band buckets larger than max_bucket are dropped from the
candidate join (cap_bucket_size) — a bucket of B docs contributes B^2/2
pairs, so uncapped head buckets degenerate to a cartesian product.  Docs
dropped this way are by construction near-identical boilerplate clusters;
exact_dedup (which has no such cap: groupBy, not self-join) still collapses
the fully-identical ones.  Oversized buckets are observable via
oversized_lsh_buckets for monitoring.
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
    """Distinct word k-gram shingles per doc: (doc_id, shingle).

    Two measured plan facts at corpus scale (2.8M shingles, 20k docs):
    the token array is materialized in its OWN projection before the
    shingle lambda, because Catalyst does not common-subexpression-
    eliminate inside higher-order-function lambdas — referencing
    tokenize(text) directly in the transform() body re-ran the regex
    tokenizer once per shingle (~3x); and the k-gram is built from k
    element_at lookups instead of concat_ws(slice(...)), which allocated a
    sub-array per shingle (another ~10x).  18s -> 0.6s combined."""
    toks = F.col("_toks")

    def kgram(i):
        parts = []
        for j in range(k):
            if j:
                parts.append(F.lit(" "))
            parts.append(F.element_at(toks, i + F.lit(j)))
        return F.concat(*parts)

    # guard: F.sequence(1, 0) would produce a DESCENDING [1, 0] sequence
    sh = F.when(
        F.size(toks) >= k,
        F.transform(F.sequence(F.lit(1), F.size(toks) - (k - 1)), kgram),
    ).otherwise(F.array().cast("array<string>"))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        tokenize_simple_expr(F.col(text_col)).alias("_toks"),
    ).select("doc_id", F.explode(F.array_distinct(sh)).alias("shingle"))


def stop_shingle_cut(shingles: DataFrame, max_df) -> DataFrame:
    """Drop shingles whose document frequency exceeds max_df (stop-shingle /
    boilerplate guard).  One groupBy on the shingle (the same key the
    signature agg shuffles on) + a left_semi join — no data is widened.

    max_df: an int, or a 1-row DataFrame with a `_max_df` column — the
    latter is cross-joined as a broadcast scalar so a corpus-derived cut
    stays INSIDE the job instead of needing a driver-side count() action."""
    dfc = shingles.groupBy("shingle").agg(F.count("*").alias("df"))
    if isinstance(max_df, DataFrame):
        ok = dfc.crossJoin(F.broadcast(max_df)).filter(
            F.col("df") <= F.col("_max_df")
        )
    else:
        ok = dfc.filter(F.col("df") <= max_df)
    return shingles.join(ok.select("shingle"), "shingle", "left_semi")


def minhash_signatures(
    shingles: DataFrame, n_hashes: int = 16, hash_fn: str = "md5"
) -> DataFrame:
    """(doc_id, mh_0..mh_{n-1}).

    hash_fn="md5" (default): mh_i = min(md5(i':'shingle)) hex string —
    portable to any engine (the DuckDB parity oracle replays it exactly).
    hash_fn="xxhash64": mh_i = min(xxhash64(i, shingle)) as a long — the
    production fast path (no hex-string materialization, pure JVM long
    ops; ~10x cheaper per row at corpus scale).  Both are valid minwise
    hashes; signatures are NOT comparable across hash_fns."""
    if hash_fn == "md5":
        aggs = [
            F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("shingle")))).alias(f"mh_{i}")
            for i in range(n_hashes)
        ]
    elif hash_fn == "xxhash64":
        aggs = [
            F.min(F.xxhash64(F.lit(i), F.col("shingle"))).alias(f"mh_{i}")
            for i in range(n_hashes)
        ]
    else:
        raise ValueError(f"unknown hash_fn {hash_fn!r}")
    return shingles.groupBy("doc_id").agg(*aggs)


def _band_rows(
    signatures: DataFrame, n_hashes: int, n_bands: int, hash_fn: str = "md5"
) -> DataFrame:
    """(doc_id, band, sig) — one row per signature band; sig is a hex
    string (md5) or a long (xxhash64), either is a fine join key."""
    rows = n_hashes // n_bands

    def band_sig(b: int):
        cols = [F.col(f"mh_{b * rows + r}") for r in range(rows)]
        if hash_fn == "md5":
            return F.md5(F.concat_ws("|", *cols))
        return F.xxhash64(*cols)

    bands = F.array(
        *[
            F.struct(F.lit(b).alias("band"), band_sig(b).alias("sig"))
            for b in range(n_bands)
        ]
    )
    return signatures.select("doc_id", F.explode(bands).alias("bs")).select(
        "doc_id", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig")
    )


def cap_bucket_size(
    bucketed: DataFrame, max_bucket: int, keys: list[str]
) -> DataFrame:
    """Drop rows in buckets larger than max_bucket before a bucketed
    self-join (a B-row bucket yields B^2/2 pairs).  Aggregate-then-semi-join
    rather than a window so the filter is a partial-agg shuffle, not a full
    sort of the bucket table."""
    ok = (
        bucketed.groupBy(*keys)
        .agg(F.count("*").alias("_bsz"))
        .filter(F.col("_bsz") <= max_bucket)
        .select(*keys)
    )
    return bucketed.join(ok, keys, "left_semi")


def oversized_lsh_buckets(
    signatures: DataFrame, n_hashes: int = 16, n_bands: int = 4,
    max_bucket: int = 500, hash_fn: str = "md5",
) -> DataFrame:
    """Monitoring view: (band, sig, n_docs) for buckets the candidate join
    would drop — the warn-metric companion to lsh_candidate_pairs."""
    return (
        _band_rows(signatures, n_hashes, n_bands, hash_fn)
        .groupBy("band", "sig")
        .agg(F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") > max_bucket)
    )


def lsh_candidate_pairs(
    signatures: DataFrame, n_hashes: int = 16, n_bands: int = 4,
    max_bucket: int | None = 500, hash_fn: str = "md5",
) -> DataFrame:
    """Banded LSH: docs agreeing on ALL rows of any band become a candidate
    pair (doc_a < doc_b, distinct).  Buckets larger than max_bucket are
    excluded (see module docstring; None disables the cap)."""
    exploded = _band_rows(signatures, n_hashes, n_bands, hash_fn)
    if max_bucket is not None:
        exploded = cap_bucket_size(exploded, max_bucket, ["band", "sig"])
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
    max_shingle_df: int | None = None,
    max_bucket: int | None = 500,
    hash_fn: str = "md5",
) -> DataFrame:
    """Full pipeline: near-dup pairs (doc_a, doc_b, jaccard>=threshold).

    max_shingle_df: absolute stop-shingle document-frequency cut (None = a
    default of half the corpus size, floored at 3 so toy corpora keep their
    shingles).  Signatures AND the exact-Jaccard verification both run on
    the cut shingle set — boilerplate is excluded from the similarity
    definition, the standard web-dedup convention."""
    sh = doc_shingles(docs, k=k, text_col=text_col, id_col=id_col)
    if max_shingle_df is None:
        # half the corpus size (floored at 3), computed lazily as a 1-row
        # broadcast inside the pipeline — a library default must not launch
        # a separate docs.count() Spark job on the driver
        max_shingle_df = docs.agg(
            F.greatest(F.floor(F.count("*") / 2), F.lit(3))
            .cast("long")
            .alias("_max_df")
        )
    sh = stop_shingle_cut(sh, max_shingle_df)
    sig = minhash_signatures(sh, n_hashes=n_hashes, hash_fn=hash_fn)
    pairs = lsh_candidate_pairs(
        sig, n_hashes=n_hashes, n_bands=n_bands, max_bucket=max_bucket,
        hash_fn=hash_fn,
    )
    return jaccard_verify(pairs, sh, threshold=threshold)


# ---------------------------------------------------------------------------
# SimHash
#
# 64-bit (the standard Charikar/Manku width).  Round-1 shipped 32-bit hashes
# with 8-bit bands: 256 distinct values per band means ~N^2/256 candidate
# pairs at corpus scale — a cartesian in disguise.  64 bits with 4 x 16-bit
# bands gives 65,536 values/band, and the band join is additionally capped.

SIMHASH_BITS = 64


def _term_hash_half(term, hex_offset: int) -> "F.Column":
    """32-bit term-hash half: 8 hex chars of md5 at hex_offset, base-16."""
    return F.conv(
        F.substring(F.md5(term.cast("binary")), hex_offset, 8), 16, 10
    ).cast("long")


def simhash(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    hash_fn: str = "md5",
) -> DataFrame:
    """(doc_id, simhash) — 64-bit tf-weighted sign fingerprint.

    hash_fn="md5" (default, DuckDB-replayable): the 64-bit term hash is md5
    hex chars 1-16 big-endian, handled as two 32-bit halves (hi = chars
    1-8, lo = chars 9-16) because base-16 conv of 16 chars can exceed
    signed-long range; the final signature packs hi<<32 | lo, so bit 63
    lands in the sign bit (negative longs are valid signatures).
    hash_fn="xxhash64": the term hash is one xxhash64 long — the production
    fast path (no hex/conv); signatures are NOT comparable across
    hash_fns."""
    toks = tokenize_simple_expr(F.col(text_col))
    tf = (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(toks).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    if hash_fn == "md5":
        tf = tf.withColumn("h_hi", _term_hash_half(F.col("term"), 1)) \
               .withColumn("h_lo", _term_hash_half(F.col("term"), 9))

        def bit(j: int) -> "F.Column":
            src, off = ("h_lo", j) if j < 32 else ("h_hi", j - 32)
            return F.shiftright(F.col(src), off).bitwiseAND(F.lit(1))
    elif hash_fn == "xxhash64":
        tf = tf.withColumn("h64", F.xxhash64(F.col("term")))

        def bit(j: int) -> "F.Column":
            return F.shiftright(F.col("h64"), j).bitwiseAND(F.lit(1))
    else:
        raise ValueError(f"unknown hash_fn {hash_fn!r}")

    bit_aggs = [
        F.sum(F.col("tf") * (bit(j) * 2 - 1)).alias(f"b{j}")
        for j in range(SIMHASH_BITS)
    ]
    sums = tf.groupBy("doc_id").agg(*bit_aggs)
    lo, hi = None, None
    for j in range(32):
        bl = F.when(F.col(f"b{j}") > 0, F.lit(2 ** j)).otherwise(F.lit(0))
        bh = F.when(F.col(f"b{j + 32}") > 0, F.lit(2 ** j)).otherwise(F.lit(0))
        lo = bl if lo is None else (lo + bl)
        hi = bh if hi is None else (hi + bh)
    packed = F.shiftleft(hi.cast("long"), 32).bitwiseOR(lo.cast("long"))
    return sums.select("doc_id", packed.alias("simhash"))


def simhash_near_pairs(
    sig: DataFrame, max_hamming: int = 3, max_bucket: int | None = 500
) -> DataFrame:
    """Candidate pairs from 16-bit band equality (a pair within hamming<=3 of
    a 64-bit hash must agree on >=1 of 4 bands), verified by bit_count(xor).
    Band buckets larger than max_bucket are dropped (cap_bucket_size)."""
    n_bands = 4
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftrightunsigned(F.col("simhash"), b * 16)
                .bitwiseAND(F.lit(0xFFFF)).alias("v"),
            )
            for b in range(n_bands)
        ]
    )
    ex = sig.select("doc_id", "simhash", F.explode(bands).alias("bs")).select(
        "doc_id", "simhash", F.col("bs.band").alias("band"), F.col("bs.v").alias("v")
    )
    if max_bucket is not None:
        ex = cap_bucket_size(ex, max_bucket, ["band", "v"])
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
