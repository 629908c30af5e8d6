#!/usr/bin/env python
"""Headline benchmark for the knowledgeir_spark engine.

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...per-step sec...}, "sf": <sf>, ...extras}

Env:
  SPARK_GRAFT_SF_DIR   testdata dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     local[] parallelism (default 32)
  KIR_BENCH_SCALING=1  also run the index build at cpus/4 to measure the
                       two-parallelism scaling efficiency (north_rule's
                       N -> 4N executor criterion, sandbox proxy) and update
                       BENCH/BASELINE.md.
  KIR_BENCH_DOCS       override webtext corpus size.

Workloads:
  index_build    full inverted-index build over the synthetic webtext corpus
                 (Zipf head-term skew; docs scaled by sf) -> docs/sec
  query_*        50 reference-shaped keyword queries, top-20 BM25 via the
                 posting index (per-query latency p50/p95 + one batch run)
  fullscan_bm25  the driver-contract flagship at sf (documents.parquet)
  relational     pricing_summary + top_customers parity queries at sf
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SF = SF_DIR.rstrip("/").split("sf")[-1]
N_DOCS = int(
    os.environ.get("KIR_BENCH_DOCS", max(2000, int(float(SF) * 1_000_000)))
)
CACHE = os.path.join(REPO, ".bench_cache")
N_QUERIES = 50
K = 20


def ensure_webtext(spark, n_docs: int) -> str:
    path = os.path.join(CACHE, f"webtext_{n_docs}.parquet")
    if os.path.isdir(path):
        return path
    from knowledgeir_spark.fixtures.webpages import gen_webpages

    os.makedirs(CACHE, exist_ok=True)
    pdf = gen_webpages(n_docs=n_docs)
    pdf = pdf.reset_index().rename(columns={"index": "doc_id"})
    spark.createDataFrame(pdf[["doc_id", "url", "text", "lang"]]).repartition(
        max(CPUS, 8)
    ).write.mode("overwrite").parquet(path)
    return path


def run_index_build(spark, webtext_path: str, tag: str) -> tuple[float, dict]:
    from knowledgeir_spark.index.build import IndexConfig, build_index

    idx_dir = os.path.join(CACHE, f"index_{tag}_{N_DOCS}")
    shutil.rmtree(idx_dir, ignore_errors=True)
    docs = spark.read.parquet(webtext_path)
    cfg = IndexConfig(salt_range=1 << 16, n_buckets=32)
    t0 = time.time()
    build_index(spark, docs, idx_dir, cfg, input_token=f"bench_{N_DOCS}")
    dt = time.time() - t0
    return dt, {"idx_dir": idx_dir}


def main() -> None:
    from knowledgeir_spark import parity
    from knowledgeir_spark.fixtures.webpages import gen_queries
    from knowledgeir_spark.index.query import IndexReader
    from knowledgeir_spark.session import get_spark

    results: dict[str, float] = {}
    extras: dict = {}

    spark = get_spark(cpus=CPUS, app_name="kir-bench")
    webtext = ensure_webtext(spark, N_DOCS)

    # 1. index build throughput
    t_build, info = run_index_build(spark, webtext, f"c{CPUS}")
    results["index_build"] = round(t_build, 3)
    extras["index_docs_per_sec"] = round(N_DOCS / t_build, 1)
    extras["n_docs"] = N_DOCS

    # 2. query latency over the reference-shaped query set
    reader = IndexReader(spark, info["idx_dir"])
    queries = [(r.qid, r.query) for r in gen_queries(N_QUERIES).itertuples()]
    reader.search(queries[:1], k=K).collect()  # warm up
    lat = []
    t0 = time.time()
    for q in queries:
        tq = time.time()
        reader.search([q], k=K).collect()
        lat.append(time.time() - tq)
    results["query_serial_50"] = round(time.time() - t0, 3)
    lat.sort()
    extras["query_p50_sec"] = round(statistics.median(lat), 4)
    extras["query_p95_sec"] = round(lat[int(len(lat) * 0.95) - 1], 4)
    tq = time.time()
    reader.search(queries, k=K).collect()
    results["query_batch_50"] = round(time.time() - tq, 3)

    # 3. driver-contract flagship + relational parity queries at sf
    for name in ("bm25_topk", "pricing_summary", "top_customers"):
        t0 = time.time()
        parity.queries()[name](spark, SF_DIR).collect()
        results[name] = round(time.time() - t0, 3)

    spark.stop()

    # 4. optional two-parallelism scaling evidence
    if os.environ.get("KIR_BENCH_SCALING") == "1":
        low = max(CPUS // 4, 1)
        spark_low = get_spark(cpus=low, app_name="kir-bench-low")
        t_low, _ = run_index_build(spark_low, webtext, f"c{low}")
        spark_low.stop()
        thr_hi = N_DOCS / t_build
        thr_lo = N_DOCS / t_low
        eff = thr_hi / (thr_lo * (CPUS / low))
        extras["scaling"] = {
            "cpus_low": low, "cpus_high": CPUS,
            "build_sec_low": round(t_low, 3), "build_sec_high": round(t_build, 3),
            "docs_per_sec_low": round(thr_lo, 1), "docs_per_sec_high": round(thr_hi, 1),
            "efficiency": round(eff, 3),
        }

    out = {
        "metric": "kir_spark_headline_suite",
        "value": round(sum(results.values()), 3),
        "unit": "sec",
        "queries": results,
        "sf": float(SF),
        **extras,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
