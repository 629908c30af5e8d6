#!/usr/bin/env python
"""Round-6 measurement harness (guide §1: measure first; bench.py is frozen
so extra breakdowns live here).

Modes (first arg):
  build     index_build stage breakdown at bench scale (fresh subprocess
            semantics: rm the index dir first)
  query     distributed search-path breakdown (single query + batch50)
  parity    bm25_topk / pricing_summary / top_customers best-of-3 collect()
  serving   search_local 50-query pass
"""

from __future__ import annotations

import os
import shutil
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CACHE = os.path.join(REPO, ".bench_cache")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_DOCS = int(os.environ.get("KIR_MEASURE_DOCS", "100000"))


def best_of(fn, n=3, label=""):
    runs = []
    for _ in range(n):
        t0 = time.time()
        fn()
        runs.append(round(time.time() - t0, 3))
    print(f"{label}: min={min(runs)} runs={runs}")
    return min(runs)


def mode_build():
    from knowledgeir_spark.index.build import (
        IndexConfig, build_index, choose_salt_range,
    )
    from knowledgeir_spark.session import get_spark
    from pyspark.sql import functions as F

    idx = os.path.join(CACHE, f"r06_measure_idx_{N_DOCS}")
    shutil.rmtree(idx, ignore_errors=True)
    spark = get_spark(cpus=CPUS, app_name="r06-measure-build")
    docs = spark.read.parquet(os.path.join(CACHE, f"webtext_{N_DOCS}.parquet"))
    docs.select(F.sum(F.length("text"))).collect()  # warm page cache
    cfg = IndexConfig(
        salt_range=choose_salt_range(N_DOCS, 16), n_buckets=32,
        build_partitions=max(16, N_DOCS // 18_000),
    )
    t0 = time.time()
    res = build_index(spark, docs, idx, cfg, input_token="r06_measure")
    total = time.time() - t0
    for name, r in res.items():
        print(f"  stage {name}: {r.wall_ms/1000:.2f}s skipped={r.skipped}")
    print(f"build total: {total:.2f}s  ({N_DOCS/total:.0f} docs/s)")
    spark.stop()


def mode_query():
    from knowledgeir_spark.fixtures.webpages import gen_queries
    from knowledgeir_spark.index.query import IndexReader
    from knowledgeir_spark.session import get_spark

    spark = get_spark(cpus=CPUS, app_name="r06-measure-query")
    idx = os.path.join(CACHE, "index_c32_100000")
    reader = IndexReader(spark, idx)
    queries = [(r.qid, r.query) for r in gen_queries(50).itertuples()]
    reader.search(queries[:1], k=20).collect()  # warm

    def serial10():
        lat = []
        for q in queries[:10]:
            tq = time.time()
            reader.search([q], k=20).collect()
            lat.append(time.time() - tq)
        lat.sort()
        print(f"  p50={statistics.median(lat):.3f} lat={[round(x,3) for x in lat]}")

    best_of(serial10, 3, "query_serial_spark_10")
    best_of(lambda: reader.search(queries, k=20).collect(), 3, "query_batch_50")
    spark.stop()


def mode_parity():
    from knowledgeir_spark import parity
    from knowledgeir_spark.session import get_spark

    spark = get_spark(cpus=CPUS, app_name="r06-measure-parity")
    for name in ("bm25_topk", "pricing_summary", "top_customers"):
        fn = parity.queries()[name]
        fn(spark, SF_DIR).collect()  # warm (catalog/files)
        best_of(lambda: fn(spark, SF_DIR).collect(), 3, name)
    spark.stop()


def mode_serving():
    from knowledgeir_spark.fixtures.webpages import gen_queries
    from knowledgeir_spark.index.query import IndexReader
    from knowledgeir_spark.session import get_spark

    spark = get_spark(cpus=CPUS, app_name="r06-measure-serving")
    idx = os.path.join(CACHE, "index_c32_100000")
    reader = IndexReader(spark, idx)
    queries = [(r.qid, r.query) for r in gen_queries(50).itertuples()]
    reader.search_local(queries[:1], k=20)

    def serving():
        for q in queries:
            reader.search_local([q], k=20)

    best_of(serving, 3, "query_serving_50")
    spark.stop()


if __name__ == "__main__":
    {
        "build": mode_build,
        "query": mode_query,
        "parity": mode_parity,
        "serving": mode_serving,
    }[sys.argv[1]]()
