"""Similarity search over an embedding column (array<float>).

Engine analog of the reference's kNN usage (SURVEY.md §2.6 W5 —
scripts/get_embedding_neighbors.py used gensim most_similar; here it's a
DataFrame program):

- brute_force_topk: exact cosine top-k per query vector.  The dot product is
  a JVM expression (zip_with + aggregate, sequential fold -> deterministic);
  norms are precomputed once per side.  Query side broadcasts.
- rp_lsh_topk: random-hyperplane LSH bucketing as the scale path — each
  vector gets a sign-bit signature from D pseudo-random Rademacher planes
  (plane p, dim d -> ±1 from a bit of md5(p:d), so signatures are portable
  and deterministic, no stored plane matrix); candidates = same bucket in
  >=1 band table, where the QUERY side probes its exact band buckets PLUS
  the buckets reached by flipping its `n_probes` lowest-|margin| signature
  bits (true multi-probe LSH, Lv et al. VLDB'07: a bit whose hyperplane dot
  product is near zero is the one most likely to differ on a true
  neighbor).  Exact cosine re-rank on candidates, then top-k.  Recall < 1
  by construction — measured, not guessed: scripts/rp_lsh_recall.py writes
  the (planes, bands, probes) -> recall@10 grid to BENCH/rp_lsh_recall.json
  and tests/test_dedup_similarity.py asserts a floor at the shipped
  defaults.  Exactness tests use brute force.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .topk import RANK_QUANTUM


def _norm_expr(vec) -> "F.Column":
    return F.sqrt(
        F.aggregate(vec, F.lit(0.0), lambda a, x: a + x.cast("double") * x.cast("double"))
    )


def _dot_expr(a, b) -> "F.Column":
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine_expr(a, b) -> "F.Column":
    return _dot_expr(a, b) / (_norm_expr(a) * _norm_expr(b))


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
) -> DataFrame:
    """Exact cosine top-k of `vectors` for each row of `queries`
    (self-matches by id are excluded when ids collide).
    Returns (q_id, vec_id, cos, rank)."""
    q = queries.select(
        F.col(q_id_col).alias("q_id"), F.col(q_vec_col).alias("q_vec")
    )
    joined = vectors.crossJoin(F.broadcast(q)).filter(
        F.col(id_col) != F.col("q_id")
    )
    scored = joined.select(
        "q_id",
        F.col(id_col).alias("vec_id"),
        cosine_expr(F.col(vec_col), F.col("q_vec")).alias("cos"),
    )
    w = Window.partitionBy("q_id").orderBy(
        F.floor(F.col("cos") * RANK_QUANTUM).desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("q_id", "rank")
    )


def _plane_signs(n_planes: int, dim: int) -> np.ndarray:
    """Deterministic Rademacher planes: sign from bit 0 of md5(f'{p}:{d}')."""
    signs = np.empty((n_planes, dim), dtype=np.float64)
    for p in range(n_planes):
        for d in range(dim):
            h = hashlib.md5(f"{p}:{d}".encode()).digest()
            signs[p, d] = 1.0 if (h[0] & 1) else -1.0
    return signs


def rp_signature_udf(n_planes: int, dim: int):
    """Arrow-vectorized signature kernel: bit p = 1 iff dot(vec, plane_p) > 0,
    packed into a long.  The (n_planes x dim) Rademacher plane matrix is
    materialized ONCE on the driver and shipped inside the serialized UDF
    (16 planes x 1024 dims x 8B = 128 KB — broadcast-sized), so the Catalyst
    plan holds a single UDF node regardless of dim.  This replaces the
    rp_signature_expr literal tree (n_planes x dim literal nodes) which blew
    up analysis/codegen at real embedding dims; the expr path is kept for
    small-dim cross-testing only."""
    planes_t = _plane_signs(n_planes, dim).T  # (dim, n_planes)
    weights = (1 << np.arange(n_planes, dtype=np.int64))

    @F.pandas_udf("long")
    def sig(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype=np.int64)
        m = np.array([np.asarray(v, dtype=np.float64) for v in vs])
        bits = (m @ planes_t) > 0  # (batch, n_planes)
        return pd.Series(bits.astype(np.int64) @ weights)

    return sig


def rp_probe_bands_udf(n_planes: int, dim: int, n_bands: int, n_probes: int):
    """Query-side multi-probe band generator: per vector, emit its exact
    (band, value) entries plus up to `n_probes` perturbed entries, each made
    by flipping ONE signature bit — chosen globally by ascending |dot(vec,
    plane)| (the flip margin).  A near-zero margin means the neighbor we are
    looking for plausibly landed on the other side of that hyperplane, so
    probing that adjacent bucket recovers exactly the near-miss collisions
    that banded OR loses.  Only the (broadcast-sized) query side pays the
    extra probes; the vector side keeps one bucket entry per band."""
    planes_t = _plane_signs(n_planes, dim).T  # (dim, n_planes)
    rows = n_planes // n_bands
    row_weights = (1 << np.arange(rows, dtype=np.int64))

    @F.pandas_udf("array<struct<band:int,v:long>>")
    def probes(vs: pd.Series) -> pd.Series:
        out = []
        for v in vs:
            vec = np.asarray(v, dtype=np.float64)
            dots = vec @ planes_t
            bits = (dots > 0).astype(np.int64)
            band_vals = [
                int(bits[b * rows:(b + 1) * rows] @ row_weights)
                for b in range(n_bands)
            ]
            entries = [
                {"band": b, "v": band_vals[b]} for b in range(n_bands)
            ]
            if n_probes > 0:
                for p in np.argsort(np.abs(dots), kind="stable")[:n_probes]:
                    b = int(p) // rows
                    entries.append(
                        {"band": b, "v": band_vals[b] ^ (1 << (int(p) - b * rows))}
                    )
            out.append(entries)
        return pd.Series(out)

    return probes


def rp_signature_expr(vec, planes: np.ndarray) -> "F.Column":
    """Bit p = 1 iff dot(vec, plane_p) > 0; packed into a long.
    TEST-ONLY reference path: builds n_planes x dim literal expression nodes,
    which is fine at toy dims but not at 768+ — production paths use
    rp_signature_udf."""
    sig = None
    for p in range(planes.shape[0]):
        plane = planes[p]
        dot = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(float(x)) for x in plane]),
                lambda x, y: x.cast("double") * y,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bit = F.when(dot > 0, F.lit(2 ** p)).otherwise(F.lit(0))
        sig = bit if sig is None else (sig + bit)
    return sig.cast("long")


def rp_lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 64,
    n_bands: int = 16,
    n_probes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
    dim: int | None = None,
) -> DataFrame:
    """Approximate cosine top-k: candidates share >=1 signature band with the
    query's exact OR multi-probed buckets; exact cosine re-rank on
    candidates.  Defaults (64 planes, 16 bands, 16 probes) are the measured
    operating point — recall@10 >= 0.9 on the driver's uniform-random
    embeddings (LSH's hardest case; see BENCH/rp_lsh_recall.json) with a
    candidate set still far below the corpus.  Pass `dim` explicitly at
    scale — the `.first()` fallback exists only for interactive convenience
    and costs one Spark job."""
    if dim is None:
        dim = len(vectors.select(vec_col).first()[0])
    sig_udf = rp_signature_udf(n_planes, dim)
    rows = n_planes // n_bands
    mask = (1 << rows) - 1

    def bands_of(sig_col):
        return F.array(
            *[
                F.struct(
                    F.lit(b).alias("band"),
                    F.shiftright(sig_col, b * rows).bitwiseAND(F.lit(mask)).alias("v"),
                )
                for b in range(n_bands)
            ]
        )

    v = vectors.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec"),
        sig_udf(F.col(vec_col)).alias("sig"),
    ).select("vec_id", "vec", F.explode(bands_of(F.col("sig"))).alias("bs")).select(
        "vec_id", "vec", F.col("bs.band").alias("band"), F.col("bs.v").alias("v")
    )
    probe_udf = rp_probe_bands_udf(n_planes, dim, n_bands, n_probes)
    q = queries.select(
        F.col(q_id_col).alias("q_id"), F.col(q_vec_col).alias("q_vec"),
        F.explode(probe_udf(F.col(q_vec_col))).alias("bs"),
    ).select(
        "q_id", "q_vec", F.col("bs.band").alias("band"), F.col("bs.v").alias("v")
    )
    cand = (
        v.join(F.broadcast(q), ["band", "v"])
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "q_vec", "vec_id", "vec")
        .distinct()
    )
    scored = cand.select(
        "q_id", "vec_id", cosine_expr(F.col("vec"), F.col("q_vec")).alias("cos")
    )
    w = Window.partitionBy("q_id").orderBy(
        F.floor(F.col("cos") * RANK_QUANTUM).desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("q_id", "rank")
    )


def embedding_near_dup_pairs(
    vectors: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 16,
    n_bands: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs by cosine >= threshold, LSH-bucketed self-join.
    Pass `dim` explicitly at scale (`.first()` fallback costs a Spark job).

    Exact cosine is verified after bucketing, so precision is exact; only
    recall can be lost (a pair whose signatures never share a band).  The
    16/4 defaults are tuned for the NEAR-DUP regime, not top-k ANN (where
    the same setting measured recall 0.46 and rp_lsh_topk ships 64/16/16):
    a pair at cosine s collides per bit with p = 1 - arccos(s)/pi, so at
    the 0.95 threshold p ~= 0.899, band (4 rows) ~= 0.653, any-of-4-bands
    ~= 0.986 — and higher-cosine pairs (the ones dedup must not miss)
    collide strictly more often.  Measured on planted pairs:
    tests/test_dedup_similarity.py::test_near_dup_recall_at_defaults
    asserts recall >= 0.95 against brute-force ground truth."""
    if dim is None:
        dim = len(vectors.select(vec_col).first()[0])
    sig_udf = rp_signature_udf(n_planes, dim)
    rows = n_planes // n_bands
    mask = (1 << rows) - 1
    sig = vectors.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec"),
        sig_udf(F.col(vec_col)).alias("sig"),
    )
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright(F.col("sig"), b * rows).bitwiseAND(F.lit(mask)).alias("v"),
            )
            for b in range(n_bands)
        ]
    )
    ex = sig.select("vec_id", "vec", F.explode(bands).alias("bs")).select(
        "vec_id", "vec", F.col("bs.band").alias("band"), F.col("bs.v").alias("v")
    )
    a, b = ex.alias("a"), ex.alias("b")
    pairs = (
        a.join(b, ["band", "v"])
        .filter(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("id_a"), F.col("a.vec").alias("vec_a"),
            F.col("b.vec_id").alias("id_b"), F.col("b.vec").alias("vec_b"),
        )
        .distinct()
    )
    return pairs.select(
        "id_a", "id_b", cosine_expr(F.col("vec_a"), F.col("vec_b")).alias("cos")
    ).filter(F.col("cos") >= threshold)
