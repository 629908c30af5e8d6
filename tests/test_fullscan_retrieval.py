"""Milestone-1 gate: Spark full-scan retrieval is RANK-IDENTICAL to the
pure-Python oracle (same top-k doc_ids, scores within 1e-6) for every model,
on the synthetic webtext corpus with Zipf skew, empty docs, OOV and
repeated-term queries."""

from __future__ import annotations

import pytest

from knowledgeir_spark.operators.corpus_stats import (
    doc_stats,
    field_stats,
    term_stats,
)
from knowledgeir_spark.operators.retrieval import search
from knowledgeir_spark.functions.text import doc_terms
from knowledgeir_spark.oracle.index import OracleIndex


@pytest.fixture(scope="module")
def engine(spark, webpages_pdf, queries_pdf):
    pdf = webpages_pdf.reset_index().rename(columns={"index": "doc_id"})
    docs = spark.createDataFrame(pdf[["doc_id", "text"]])
    dt = doc_terms(docs).cache()
    ts = term_stats(dt).cache()
    ds = doc_stats(dt, docs_df=docs)
    fs = field_stats(ds)
    queries = spark.createDataFrame(queries_pdf)
    oracle = OracleIndex(list(zip(pdf["doc_id"], pdf["text"])))
    return dict(dt=dt, ts=ts, fs=fs, queries=queries, oracle=oracle, spark=spark)


def test_stats_match_oracle(engine):
    o = engine["oracle"]
    fs = engine["fs"]
    assert fs.total_df == o.total_df
    assert fs.avg_doc_len == pytest.approx(o.avg_doc_len, abs=1e-9)
    got_df = {r["term"]: r["df"] for r in engine["ts"].collect()}
    assert got_df == {t: int(v) for t, v in o.df.items()}


@pytest.mark.parametrize(
    "model", ["bm25", "tf_idf", "coordinate", "bool_or", "lm", "lm_dir", "lm_jm",
              "lm_twoway", "bool_and", "cosine"]
)
def test_rank_identical_to_oracle(engine, queries_pdf, model):
    k = 20
    ranked = search(
        engine["queries"], engine["dt"], engine["ts"],
        engine["fs"].total_df, engine["fs"].avg_doc_len, k=k, model=model,
    ).collect()
    got: dict[str, list] = {}
    for r in ranked:
        got.setdefault(r["qid"], []).append((r["rank"], r["doc_id"], r["score"]))
    o = engine["oracle"]
    for q in queries_pdf.itertuples():
        expected = o.topk(q.query, k=k, model=model)
        have = sorted(got.get(q.qid, []))
        assert len(have) == len(expected), f"qid={q.qid}"
        for (rank, doc_id, score), (edoc, escore) in zip(have, expected):
            assert doc_id == edoc, f"qid={q.qid} rank={rank} model={model}"
            assert score == pytest.approx(escore, abs=1e-6), f"qid={q.qid} doc={doc_id}"
