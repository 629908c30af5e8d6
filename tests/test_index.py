"""Milestone-2 gate: the real inverted index.

- decoded posting shards == oracle's {term: [(doc_id, tf)]} exactly
- term_stats/field_stats == oracle
- index search (pruned and unpruned) rank-identical to oracle and to the
  full-scan DataFrame path
- lineage: rebuild skips all committed stages; config change or crashed
  (manifest-less) stage recomputes exactly that stage
"""

from __future__ import annotations

import pytest

from knowledgeir_spark.index.build import IndexConfig, build_index, term_bucket_py
from knowledgeir_spark.index.codec import decode_block
from knowledgeir_spark.index.query import IndexReader
from knowledgeir_spark.oracle.index import OracleIndex

CFG = IndexConfig(block_size=16, salt_range=64, n_buckets=8, build_partitions=8)


@pytest.fixture(scope="module")
def built(spark, webpages_pdf, tmp_path_factory):
    idx_dir = str(tmp_path_factory.mktemp("index"))
    pdf = webpages_pdf.reset_index().rename(columns={"index": "doc_id"})
    docs = spark.createDataFrame(pdf[["doc_id", "text"]])
    results = build_index(spark, docs, idx_dir, CFG, input_token="webpages300")
    oracle = OracleIndex(list(zip(pdf["doc_id"], pdf["text"])))
    return dict(idx_dir=idx_dir, docs=docs, results=results, oracle=oracle, pdf=pdf)


def test_stages_committed(built):
    assert set(built["results"]) == {"doc_terms", "postings", "term_stats"}
    for r in built["results"].values():
        assert not r.skipped
        assert r.rows > 0
        assert r.files, r.stage


def test_postings_decode_to_oracle(spark, built):
    rows = spark.read.parquet(f"{built['idx_dir']}/postings").collect()
    got: dict[str, list] = {}
    for r in rows:
        assert r["bucket"] == term_bucket_py(r["term"], CFG.n_buckets)
        ids, tfs, dls = decode_block(r)
        assert r["n_docs"] == len(ids) <= CFG.block_size
        assert r["max_tf"] == int(tfs.max())
        assert r["min_doc_len"] == int(dls.min())
        assert list(ids) == sorted(ids)
        for i, tf, dl in zip(ids, tfs, dls):
            assert i // CFG.salt_range == r["salt"]
            got.setdefault(r["term"], []).append((int(i), int(tf), int(dl)))
    o = built["oracle"]
    expected = {
        t: [(d, tf, o.doc_len[d]) for d, tf in p] for t, p in o.postings.items()
    }
    assert set(got) == set(expected)
    for t in expected:
        assert sorted(got[t]) == expected[t], t


def test_term_stats_match_oracle(spark, built):
    rows = spark.read.parquet(f"{built['idx_dir']}/term_stats").collect()
    o = built["oracle"]
    assert {r["term"]: r["df"] for r in rows} == {t: int(v) for t, v in o.df.items()}
    cf = {r["term"]: r["cf"] for r in rows}
    for t, plist in o.postings.items():
        assert cf[t] == sum(tf for _, tf in plist)


def test_field_stats(built, spark):
    rd = IndexReader(spark, built["idx_dir"])
    o = built["oracle"]
    assert rd.field_stats["n_docs"] == o.total_df
    assert rd.field_stats["avg_doc_len"] == pytest.approx(o.avg_doc_len, abs=1e-12)


@pytest.mark.parametrize("model", ["bm25", "lm", "lm_dir", "tf_idf", "coordinate", "cosine"])
@pytest.mark.parametrize("prune", [False, True])
def test_index_search_rank_identical(spark, built, queries_pdf, model, prune):
    rd = IndexReader(spark, built["idx_dir"])
    queries = [(r.qid, r.query) for r in queries_pdf.itertuples()]
    ranked = rd.search(queries, k=20, model=model, prune=prune).collect()
    got: dict[str, list] = {}
    for r in ranked:
        got.setdefault(r["qid"], []).append((r["rank"], r["doc_id"], r["score"]))
    o = built["oracle"]
    for qid, qtext in queries:
        expected = o.topk(qtext, k=20, model=model)
        have = sorted(got.get(qid, []))
        assert len(have) == len(expected), f"qid={qid}"
        for (rank, doc_id, score), (edoc, escore) in zip(have, expected):
            assert doc_id == edoc, f"qid={qid} rank={rank} model={model} prune={prune}"
            assert score == pytest.approx(escore, abs=1e-6)


def test_resume_skips_committed_stages(spark, built):
    res2 = build_index(
        spark, built["docs"], built["idx_dir"], CFG, input_token="webpages300"
    )
    assert all(r.skipped for r in res2.values())


def test_crashed_stage_recomputed(spark, built):
    import os

    # simulate crash between data rename and manifest write for term_stats
    os.remove(f"{built['idx_dir']}/_lineage/term_stats.json")
    res = build_index(
        spark, built["docs"], built["idx_dir"], CFG, input_token="webpages300"
    )
    assert res["doc_terms"].skipped and res["postings"].skipped
    assert not res["term_stats"].skipped
    assert res["term_stats"].rows > 0


def test_config_change_recomputes(spark, built, tmp_path_factory):
    # changed fingerprint (different input token) must not reuse snapshots
    res = build_index(
        spark, built["docs"], built["idx_dir"], CFG, input_token="OTHER"
    )
    assert not any(r.skipped for r in res.values())
