#!/usr/bin/env python
"""Measure RP-LSH ANN recall vs brute-force cosine ground truth.

The engine's rp_lsh_topk is approximate by construction (sign-bit
hyperplane signatures, banded candidate generation).  This script gives the
user the tuning datapoint the operator's docstring promises: for a grid of
(n_planes, n_bands) it reports recall@k against brute_force_topk on the
same vectors/queries, plus the mean candidate-set size per query (the cost
of that recall — candidates get an exact cosine re-rank, so candidate count
IS the compute knob).

Usage:
  python scripts/rp_lsh_recall.py [sf_dir] [k]
defaults: $SPARK_GRAFT_SF_DIR or /root/testdata/sf0.01, k=10.

Writes BENCH/rp_lsh_recall.json and prints one JSON line.  Deterministic:
planes are md5-derived (no RNG state), so a given (data, grid) always
produces the same numbers — tests/test_dedup_similarity.py asserts the
fixture floor.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

GRID = [
    (16, 4, 0), (32, 4, 0), (32, 8, 0), (64, 8, 0), (64, 16, 0),
    (64, 16, 8), (64, 16, 16), (64, 16, 32), (64, 8, 16), (64, 8, 32),
]
N_QUERIES = 50


def measure(spark, sf_dir: str, k: int = 10) -> dict:
    from pyspark.sql import functions as F

    from knowledgeir_spark.operators.similarity import (
        brute_force_topk,
        rp_lsh_topk,
    )

    vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
    dim = len(vecs.select("embedding").first()[0])
    queries = (
        vecs.orderBy("vec_id")
        .limit(N_QUERIES)
        .select(
            F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
        )
        .cache()
    )
    exact = {
        (r["q_id"], r["vec_id"])
        for r in brute_force_topk(vecs, queries, k=k).collect()
    }

    results = []
    for n_planes, n_bands, n_probes in GRID:
        ann = rp_lsh_topk(
            vecs, queries, k=k, n_planes=n_planes, n_bands=n_bands,
            n_probes=n_probes, dim=dim,
        ).collect()
        hits = sum(1 for r in ann if (r["q_id"], r["vec_id"]) in exact)
        # candidate count per query = rows surviving the band join (the
        # re-rank cost); read it from the same plan one level down
        n_cand = (
            rp_lsh_topk(
                vecs, queries, k=len(exact) + 10 ** 6, n_planes=n_planes,
                n_bands=n_bands, n_probes=n_probes, dim=dim,
            )
            .groupBy("q_id")
            .count()
            .agg(F.avg("count"))
            .collect()[0][0]
        )
        results.append(
            {
                "n_planes": n_planes,
                "n_bands": n_bands,
                "n_probes": n_probes,
                "recall_at_k": round(hits / len(exact), 4),
                "mean_candidates_per_query": round(float(n_cand or 0.0), 1),
            }
        )
    n_vecs = vecs.count()
    vecs.unpersist()
    queries.unpersist()
    return {
        "metric": "rp_lsh_recall",
        "k": k,
        "n_vectors": n_vecs,
        "n_queries": N_QUERIES,
        "dim": dim,
        "sf_dir": sf_dir,
        "grid": results,
    }


def main() -> None:
    from knowledgeir_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"
    )
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark(cpus=8, app_name="rp-lsh-recall")
    out = measure(spark, sf_dir, k=k)
    spark.stop()
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "rp_lsh_recall.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
