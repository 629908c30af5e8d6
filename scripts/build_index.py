#!/usr/bin/env python
"""spark-submit entry: build (or resume) the inverted index.

Cluster:
  zip -r kir.zip knowledgeir_spark
  spark-submit --py-files kir.zip scripts/build_index.py \
      --input s3://corpus/webpages --output s3://index/v1 \
      --salt-range 1048576 --n-buckets 4096

Local smoke:
  spark-submit --master 'local[8]' --py-files kir.zip scripts/build_index.py \
      --input /tmp/docs.parquet --output /tmp/idx

The session comes from spark-submit (master/memory/executors are cluster
conf); this script only sets engine-semantics confs.  Resume is automatic:
committed stages (matching fingerprint) are skipped.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# allow `python scripts/...` without spark-submit --py-files
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="parquet/Iceberg path of docs")
    p.add_argument("--output", required=True, help="index directory")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--text-col", default="text")
    p.add_argument("--url-col", default=None,
                   help="assign dense doc ids from this key column instead of --id-col")
    p.add_argument("--salt-range", type=int, default=None)
    p.add_argument("--n-buckets", type=int, default=32)
    p.add_argument("--block-size", type=int, default=128)
    p.add_argument("--tokenizer", choices=["spec", "simple"], default="spec")
    p.add_argument("--input-token", default=None,
                   help="fingerprint token (default: the input path)")
    args = p.parse_args()

    from pyspark.sql import SparkSession

    from knowledgeir_spark.index.build import (
        IndexConfig,
        build_index,
        choose_salt_range,
    )

    spark = SparkSession.builder.appName("kir-build-index").getOrCreate()
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    docs = spark.read.parquet(args.input)
    id_col = args.id_col
    if args.url_col:
        from knowledgeir_spark.operators.ids import assign_doc_ids

        docs = assign_doc_ids(docs, key_col=args.url_col)
        id_col = "doc_id"
    salt_range = args.salt_range or choose_salt_range(
        docs.count(), spark.sparkContext.defaultParallelism
    )
    cfg = IndexConfig(
        block_size=args.block_size, salt_range=salt_range,
        n_buckets=args.n_buckets, tokenizer=args.tokenizer,
    )
    results = build_index(
        spark, docs, args.output, cfg,
        input_token=args.input_token or args.input,
        text_col=args.text_col, id_col=id_col,
    )
    print(json.dumps({
        s: {"skipped": r.skipped, "rows": r.rows, "bytes": r.bytes,
            "wall_ms": round(r.wall_ms, 1)}
        for s, r in results.items()
    }))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
