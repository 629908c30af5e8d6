"""Dedup + similarity operators: exactness, LSH recall on planted dups."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def dup_docs(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base.replace("today", "tomorrow")  # 1-word edit
    other = "completely different content about spark indexes and postings lists"
    rows = [
        (0, base), (1, base),          # exact dup pair
        (2, near),                     # near dup of 0/1
        (3, other), (4, other + " x"),  # near dup pair
        (5, "tiny"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(spark, dup_docs):
    from knowledgeir_spark.operators.dedup import exact_dedup

    got = exact_dedup(dup_docs).collect()
    groups = {r["keep_doc_id"]: r["n_copies"] for r in got}
    assert groups[0] == 2  # docs 0,1 collapse
    assert sum(groups.values()) == 6
    assert len(groups) == 5


def test_shingles_and_jaccard(spark, dup_docs):
    from knowledgeir_spark.operators.dedup import doc_shingles, jaccard_verify

    sh = doc_shingles(dup_docs, k=3)
    pairs = spark.createDataFrame([(0, 1), (0, 2), (0, 3)], "doc_a long, doc_b long")
    j = {(r["doc_a"], r["doc_b"]): r["jaccard"]
         for r in jaccard_verify(pairs, sh).collect()}
    assert j[(0, 1)] == pytest.approx(1.0)
    assert 0.5 < j[(0, 2)] < 1.0
    assert (0, 3) not in j  # no shared shingles -> no row


def test_minhash_lsh_finds_planted_dups(spark, dup_docs):
    from knowledgeir_spark.operators.dedup import minhash_lsh_dedup

    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in minhash_lsh_dedup(dup_docs, threshold=0.5).collect()
    }
    assert got[(0, 1)] == pytest.approx(1.0)
    assert (3, 4) in got
    assert all(a < b for a, b in got)


def test_simhash_near_pairs(spark, dup_docs):
    from knowledgeir_spark.operators.dedup import simhash, simhash_near_pairs

    sig = simhash(dup_docs)
    rows = {r["doc_id"]: r["simhash"] for r in sig.collect()}
    assert rows[0] == rows[1]  # identical docs -> identical fingerprint
    assert 0 <= rows[0] < 2 ** 32
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in simhash_near_pairs(sig, max_hamming=6).collect()
    }
    assert pairs[(0, 1)] == 0
    assert (0, 2) in pairs  # near dup within hamming 6


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.default_rng(3)
    base = rng.normal(size=(20, 8)).astype(np.float32)
    base[7] = base[3] + 0.01 * rng.normal(size=8).astype(np.float32)  # planted near-dup
    rows = [(i, [float(x) for x in base[i]]) for i in range(20)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>"), base


def _np_topk(base, qi, k):
    q = base[qi].astype(np.float64)
    sims = []
    for i in range(len(base)):
        if i == qi:
            continue
        v = base[i].astype(np.float64)
        sims.append((i, float(v @ q / (np.linalg.norm(v) * np.linalg.norm(q)))))
    sims.sort(key=lambda x: (-np.floor(x[1] * 1e9), x[0]))
    return sims[:k]


def test_brute_force_topk_matches_numpy(spark, vectors):
    from knowledgeir_spark.operators.similarity import brute_force_topk

    df, base = vectors
    q = df.select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    ).filter(F.col("q_id").isin([3, 5]))
    got: dict[int, list] = {}
    for r in brute_force_topk(df, q, k=5).collect():
        got.setdefault(r["q_id"], []).append((r["rank"], r["vec_id"], r["cos"]))
    for qi in (3, 5):
        expected = _np_topk(base, qi, 5)
        have = sorted(got[qi])
        for (rank, vid, cos), (evid, ecos) in zip(have, expected):
            assert vid == evid, f"q={qi} rank={rank}"
            assert cos == pytest.approx(ecos, abs=1e-9)
    # planted near-dup is the #1 neighbor of 3
    assert got[3][0][1] == 7 or sorted(got[3])[0][1] == 7


def test_rp_lsh_finds_near_dup(spark, vectors):
    from knowledgeir_spark.operators.similarity import (
        embedding_near_dup_pairs,
        rp_lsh_topk,
    )

    df, base = vectors
    q = df.select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    ).filter(F.col("q_id") == 3)
    rows = rp_lsh_topk(df, q, k=5).collect()
    assert rows and rows[0]["vec_id"] == 7  # near-identical vector found
    assert rows[0]["cos"] > 0.99
    pairs = {(r["id_a"], r["id_b"]): r["cos"]
             for r in embedding_near_dup_pairs(df, threshold=0.99).collect()}
    assert (3, 7) in pairs
