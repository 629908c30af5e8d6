#!/usr/bin/env python
"""spark-submit entry: answer top-k BM25 queries from a built index.

  spark-submit --py-files kir.zip scripts/query_index.py \
      --index /path/to/idx --queries queries.tsv --k 20 --out run.trec

queries.tsv: ``qid<TAB>query text`` per line (the reference's
data/s2/s2.query shape).  Output: TREC run file.
"""

from __future__ import annotations

import argparse
import sys


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--index", required=True)
    p.add_argument("--queries", required=True)
    p.add_argument("--k", type=int, default=20)
    p.add_argument("--model", default="bm25")
    p.add_argument("--out", required=True, help="TREC output dir")
    p.add_argument("--mode", choices=["distributed", "serving"],
                   default="distributed")
    args = p.parse_args()

    from pyspark.sql import SparkSession

    from knowledgeir_spark.index.query import IndexReader
    from knowledgeir_spark.operators.topk import to_trec
    from knowledgeir_spark.sources.trec import write_trec

    spark = SparkSession.builder.appName("kir-query-index").getOrCreate()
    queries = []
    with open(args.queries) as f:
        for line in f:
            line = line.rstrip("\n")
            if line:
                qid, qtext = line.split("\t", 1)
                queries.append((qid, qtext))
    reader = IndexReader(spark, args.index)
    if args.mode == "serving":
        rows = reader.search_local(queries, k=args.k, model=args.model)
        ranked = spark.createDataFrame(
            rows, "qid string, doc_id long, score double, rank int"
        )
    else:
        ranked = reader.search(queries, k=args.k, model=args.model)
    write_trec(
        to_trec(ranked).select("qid", "docno", "rank", "score"), args.out,
        run_name=f"kir_{args.model}",
    )
    print(f"wrote {args.out}")
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
