"""Index lifecycle: base build -> streaming deltas -> compaction -> queries
rank-identical to a from-scratch oracle over the UNION corpus."""

from __future__ import annotations

import pytest

from knowledgeir_spark.index.build import IndexConfig, build_index
from knowledgeir_spark.index.compact import compact, decode_postings_df
from knowledgeir_spark.index.query import IndexReader
from knowledgeir_spark.oracle.index import OracleIndex
from knowledgeir_spark.streaming.incremental import incremental_index

CFG = IndexConfig(block_size=16, salt_range=64, n_buckets=4, build_partitions=4)


def test_compacted_index_equals_fresh_oracle(spark, webpages_pdf, tmp_path):
    idx_dir = str(tmp_path / "idx")
    pdf = webpages_pdf.reset_index().rename(columns={"index": "doc_id"})
    base_pdf = pdf.iloc[:200]
    delta1 = pdf.iloc[200:250]
    delta2 = pdf.iloc[250:300]

    docs = spark.createDataFrame(base_pdf[["doc_id", "text"]])
    build_index(spark, docs, idx_dir, CFG, input_token="base200")

    inp = str(tmp_path / "arrivals")
    schema = "doc_id long, text string"
    spark.createDataFrame(delta1[["doc_id", "text"]]).write.mode("append").parquet(inp)
    incremental_index(spark, inp, idx_dir, schema, CFG)
    spark.createDataFrame(delta2[["doc_id", "text"]]).write.mode("append").parquet(inp)
    incremental_index(spark, inp, idx_dir, schema, CFG)

    res = compact(spark, idx_dir, CFG)
    assert res and not any(r.skipped for r in res.values())

    # postings now cover all 300 docs; equality vs full oracle
    oracle = OracleIndex(list(zip(pdf["doc_id"], pdf["text"])))
    reader = IndexReader(spark, idx_dir)
    assert reader.field_stats["n_docs"] == 300
    assert reader.field_stats["avg_doc_len"] == pytest.approx(oracle.avg_doc_len, abs=1e-9)

    long_form = decode_postings_df(
        spark.read.parquet(f"{idx_dir}/postings")
    ).collect()
    got: dict[str, list] = {}
    for r in long_form:
        got.setdefault(r["term"], []).append((r["doc_id"], r["tf"]))
    assert set(got) == set(oracle.postings)
    for t in got:
        assert sorted(got[t]) == sorted(oracle.postings[t]), t

    queries = [("1", "the data spark w0005"), ("2", "w0100 w0200"), ("3", "index")]
    for qid, qtext in queries:
        ranked = reader.search([(qid, qtext)], k=15).collect()
        expected = oracle.topk(qtext, k=15)
        assert [(r["doc_id"]) for r in sorted(ranked, key=lambda r: r["rank"])] == [
            d for d, _ in expected
        ], qtext
        for r in ranked:
            assert r["score"] == pytest.approx(dict(expected)[r["doc_id"]], abs=1e-6)


def test_compact_noop_without_deltas(spark, webpages_pdf, tmp_path):
    idx_dir = str(tmp_path / "idx2")
    pdf = webpages_pdf.reset_index().rename(columns={"index": "doc_id"}).iloc[:50]
    docs = spark.createDataFrame(pdf[["doc_id", "text"]])
    build_index(spark, docs, idx_dir, CFG, input_token="t50")
    assert compact(spark, idx_dir, CFG) == {}
