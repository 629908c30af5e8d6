#!/usr/bin/env python
"""spark-submit entry: answer top-k BM25 queries from a built index.

  spark-submit --py-files kir.zip scripts/query_index.py \
      --index /path/to/idx --queries queries.tsv --k 20 --out run.trec

queries.tsv: ``qid<TAB>query text`` per line (the reference's
data/s2/s2.query shape).  Output: TREC run file.

Serving extras (``--mode serving``):
  --index a,b,c         scatter-gather over multiple shards with global
                        statistics (rank-identical to the merged index)
  --spell-correct       rewrite out-of-vocabulary query terms to their
                        best edit-distance-1 suggestion before searching
  --snippets FILE       render a query-biased snippet per hit from the
                        index docstore (build one with
                        index.docstore.write_docstore) into a TSV
  --facets COL:FILE     per-query match-set facet counts over COL into a
                        TSV (build the sidecar with
                        index.facetstore.write_facet_store)
"""

from __future__ import annotations

import argparse
import os
import re
import sys

# allow `python scripts/...` without spark-submit --py-files
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--index", required=True,
                   help="index dir, or comma-separated shard dirs")
    p.add_argument("--queries", required=True)
    p.add_argument("--k", type=int, default=20)
    p.add_argument("--model", default="bm25")
    p.add_argument("--out", required=True, help="TREC output dir")
    p.add_argument("--mode", choices=["distributed", "serving"],
                   default="distributed")
    p.add_argument("--spell-correct", action="store_true",
                   help="serving mode: correct OOV query terms first")
    p.add_argument("--snippets", default=None,
                   help="serving mode: also write snippets TSV from the docstore")
    p.add_argument("--facets", default=None, metavar="COL:FILE",
                   help="serving mode: write per-query match-set facet "
                        "counts over COL to FILE (facet sidecar required)")
    p.add_argument("--facets-mode", choices=["or", "and"], default="or",
                   help="facet match set: any query term (or) / every "
                        "query term (and, drill-down)")
    args = p.parse_args()

    from pyspark.sql import SparkSession

    from knowledgeir_spark.index.query import IndexReader, ShardedReader
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

    dirs = args.index.split(",")
    sharded = len(dirs) > 1
    if sharded:
        if args.mode != "serving":
            p.error("--index with multiple shards requires --mode serving")
        reader = ShardedReader(spark, dirs)
    else:
        reader = IndexReader(spark, dirs[0])

    if args.spell_correct:
        if args.mode != "serving":
            p.error("--spell-correct requires --mode serving")
        vocab_df = (
            reader.global_stats_for if sharded else reader.term_stats_for
        )
        corrected = []
        for qid, qtext in queries:
            terms = re.findall(r"\S+", qtext.lower())
            oov = [t for t in terms if not vocab_df([t])]
            fixes = reader.suggest(oov) if oov else {}
            new = [fixes.get(t, (t,))[0] for t in terms]
            if new != terms:
                print(f"spell: {qid}: {' '.join(terms)} -> {' '.join(new)}")
            corrected.append((qid, " ".join(new)))
        queries = corrected

    if args.mode == "serving":
        rows = reader.search_local(queries, k=args.k, model=args.model)
        ranked = spark.createDataFrame(
            rows, "qid string, doc_id long, score double, rank int"
        )
    else:
        rows = None
        ranked = reader.search(queries, k=args.k, model=args.model)
    write_trec(
        to_trec(ranked).select("qid", "docno", "rank", "score"), args.out,
        run_name=f"kir_{args.model}",
    )
    print(f"wrote {args.out}")

    if args.snippets:
        if rows is None:
            p.error("--snippets requires --mode serving")
        from knowledgeir_spark.index.docstore import DocStore

        store_dirs = [d for d in dirs if os.path.isdir(os.path.join(d, "docstore"))]
        if not store_dirs:
            p.error("no docstore found beside the index "
                    "(run index.docstore.write_docstore first)")
        snips = []
        for d in store_dirs:
            snips.extend(DocStore(d).snippets(queries, rows))
        with open(args.snippets, "w") as f:
            for qid, doc_id, start, n, snippet in sorted(snips):
                f.write(f"{qid}\t{doc_id}\t{start}\t{n}\t{snippet}\n")
        print(f"wrote {args.snippets} ({len(snips)} snippets)")

    if args.facets:
        if args.mode != "serving":
            p.error("--facets requires --mode serving")
        if ":" not in args.facets:
            p.error("--facets expects COL:FILE")
        col, path = args.facets.split(":", 1)
        counts = reader.facet_counts_local(queries, col, mode=args.facets_mode)
        with open(path, "w") as f:
            for qid, value, n in sorted(counts):
                f.write(f"{qid}\t{value}\t{n}\n")
        print(f"wrote {path} ({len(counts)} facet rows)")

    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
