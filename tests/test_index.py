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


def test_bmw_serving_rank_identical(spark, built, queries_pdf):
    """Decode-level block-max WAND (serving path) == oracle == the
    decode-everything scorer, including exact quantized-score ties, and it
    actually skips decode work on head-term queries."""
    from knowledgeir_spark.index.query import _score_group_bmw

    rd = IndexReader(spark, built["idx_dir"])
    o = built["oracle"]
    queries = [(r.qid, r.query) for r in queries_pdf.itertuples()]
    # block_size=16 over 300 docs -> head terms span many blocks, so the
    # _BMW_MIN_BLOCKS gate engages for every multi-term query here
    rows = rd.search_local(queries, k=20, model="bm25", prune=True)
    got: dict[str, list] = {}
    for qid, doc_id, score, rank in rows:
        got.setdefault(qid, []).append((rank, doc_id, score))
    for qid, qtext in queries:
        expected = o.topk(qtext, k=20, model="bm25")
        have = sorted(got.get(str(qid), []))
        assert len(have) == len(expected), f"qid={qid}"
        for (rank, doc_id, score), (edoc, escore) in zip(have, expected):
            assert doc_id == edoc, f"qid={qid} rank={rank}"
            assert score == pytest.approx(escore, abs=1e-6)


def test_bmw_skips_block_decodes():
    """The WAND path must decode only a small fraction of a head term's
    blocks once a selective term sets the threshold — and still return
    exactly what the decode-everything scorer returns."""
    import numpy as np
    import pandas as pd

    from knowledgeir_spark.index import query as Q
    from knowledgeir_spark.index.codec import encode_block

    rows = []
    # head term "mid": 20k postings (tf=1, dl=20) in 128-posting blocks
    mid_docs = np.arange(0, 40000, 2, dtype=np.uint64)
    for bi, s in enumerate(range(0, len(mid_docs), 128)):
        ids = mid_docs[s:s + 128]
        blk = encode_block(ids, np.ones(len(ids)), np.full(len(ids), 20))
        blk.update(term="mid", qid="1")
        rows.append(blk)
    # selective term "rare": 10 high-tf short docs (rare-only, no overlap)
    rare_docs = np.arange(1, 20001, 2000, dtype=np.uint64)
    blk = encode_block(rare_docs, np.full(10, 5), np.full(10, 10))
    blk.update(term="rare", qid="1")
    rows.append(blk)
    pdf = pd.DataFrame(rows)

    q_terms = {"1": [
        {"term": "rare", "term_idx": 0, "q_tf": 1, "df": 10.0},
        {"term": "mid", "term_idx": 1, "q_tf": 1, "df": 20000.0},
    ]}
    n, avgdl, k = 100000.0, 20.0, 5

    n_decoded = {"n": 0}
    orig = Q.decode_payload

    def counting(*a, **kw):
        n_decoded["n"] += 1
        return orig(*a, **kw)

    Q.decode_payload = counting
    try:
        res = Q._score_group_bmw(pdf, q_terms, n, avgdl, k, "varint",
                                 init_batch=16)
    finally:
        Q.decode_payload = orig
    decoded_blocks = n_decoded["n"] / 3  # 3 payloads per block
    assert decoded_blocks < len(pdf) * 0.2, (decoded_blocks, len(pdf))

    brute = Q._score_group(pdf, q_terms, n, avgdl, "bm25", k, prune=False)
    assert list(res["doc_id"]) == list(brute["doc_id"])
    assert np.allclose(res["score"], brute["score"])


def test_dense_scorer_matches_union_scorer():
    """Dense-accumulator serving scorer == decode-everything scorer on a
    synthetic corpus, including (a) zero-idf head terms (df > N/2: skipped
    for scoring, lazily decoded for candidacy) and (b) the all-ties case
    where k exceeds the positive-score docs so zero-score candidates fill
    the tail in doc_id order."""
    import numpy as np
    import pandas as pd

    from knowledgeir_spark.index import query as Q
    from knowledgeir_spark.index.codec import encode_block

    rows = []
    # "head": df 700 of N=1000 -> idf clamps to 0
    head_docs = np.arange(0, 700, dtype=np.uint64)
    for s in range(0, 700, 128):
        ids = head_docs[s:s + 128]
        blk = encode_block(ids, np.ones(len(ids)), np.full(len(ids), 15))
        blk.update(term="head", qid="1")
        rows.append(blk)
    # "rare": 7 docs, positive idf
    rare_docs = np.array([5, 100, 333, 334, 500, 650, 800], dtype=np.uint64)
    blk = encode_block(rare_docs, np.array([2, 1, 3, 1, 1, 2, 1]),
                       np.array([10, 20, 15, 15, 30, 10, 25]))
    blk.update(term="rare", qid="1")
    rows.append(blk)
    pdf = pd.DataFrame(rows)
    q_terms = {"1": [
        {"term": "head", "term_idx": 0, "q_tf": 1, "df": 700.0},
        {"term": "rare", "term_idx": 1, "q_tf": 1, "df": 7.0},
    ]}
    n, avgdl = 1000.0, 18.0
    for k in (5, 7, 50):  # 50 > positive-score docs -> zero-tie fallback
        dense = Q._score_group_dense(pdf, q_terms, n, avgdl, k, "varint", 1000)
        brute = Q._score_group(pdf, q_terms, n, avgdl, "bm25", k, prune=False)
        assert list(dense["doc_id"]) == list(brute["doc_id"]), k
        assert np.allclose(dense["score"], brute["score"]), k


def test_dense_scorer_maxscore_skips_blocks():
    """The dense scorer's MaxScore phase must decode only the mid-idf head
    term's blocks that contain a candidate (most of its blocks drop once
    the selective term fixes the threshold) — and stay BIT-identical to
    the decode-everything scorer, doc_id ties included."""
    import numpy as np
    import pandas as pd

    from knowledgeir_spark.index import query as Q
    from knowledgeir_spark.index.codec import encode_block

    rows = []
    # mid-idf head term: df 30k of N=100k -> idf ~ log(2.33) > 0, 235 blocks
    mid_docs = np.arange(0, 60000, 2, dtype=np.uint64)
    for s in range(0, len(mid_docs), 128):
        ids = mid_docs[s:s + 128]
        blk = encode_block(ids, np.ones(len(ids)), np.full(len(ids), 20))
        blk.update(term="mid", qid="1")
        rows.append(blk)
    # selective term: 10 docs, high tf, spread across the id space
    rare_docs = np.arange(1, 100001, 10000, dtype=np.uint64)
    blk = encode_block(rare_docs, np.full(10, 5), np.full(10, 10))
    blk.update(term="rare", qid="1")
    rows.append(blk)
    pdf = pd.DataFrame(rows)

    q_terms = {"1": [
        {"term": "mid", "term_idx": 0, "q_tf": 1, "df": 30000.0},
        {"term": "rare", "term_idx": 1, "q_tf": 1, "df": 10.0},
    ]}
    n, avgdl, k = 100000.0, 20.0, 5

    dense = Q._score_group_dense(pdf, q_terms, n, avgdl, k, "varint", 100001)
    stats = dict(Q._LAST_DENSE_STATS)
    assert stats["n_essential"] == 1, stats
    assert stats["blocks_decoded"] < stats["blocks_total"] * 0.2, stats

    brute = Q._score_group(pdf, q_terms, n, avgdl, "bm25", k, prune=False)
    assert list(dense["doc_id"]) == list(brute["doc_id"])
    assert list(dense["score"]) == list(brute["score"])  # bit-identical


def test_dense_scorer_maxscore_no_skip_when_unsafe():
    """When every term has a comparable bound (no selective anchor), the
    MaxScore loop must decode everything — identical output, zero skips."""
    import numpy as np
    import pandas as pd

    from knowledgeir_spark.index import query as Q
    from knowledgeir_spark.index.codec import encode_block

    rows = []
    for t, start in (("alpha", 0), ("beta", 1), ("gamma", 2)):
        docs = np.arange(start, 3000, 3, dtype=np.uint64)
        for s in range(0, len(docs), 128):
            ids = docs[s:s + 128]
            blk = encode_block(ids, np.ones(len(ids)), np.full(len(ids), 12))
            blk.update(term=t, qid="1")
            rows.append(blk)
    pdf = pd.DataFrame(rows)
    q_terms = {"1": [
        {"term": "alpha", "term_idx": 0, "q_tf": 1, "df": 1000.0},
        {"term": "beta", "term_idx": 1, "q_tf": 1, "df": 1000.0},
        {"term": "gamma", "term_idx": 2, "q_tf": 1, "df": 1000.0},
    ]}
    n, avgdl, k = 10000.0, 12.0, 10
    dense = Q._score_group_dense(pdf, q_terms, n, avgdl, k, "varint", 3000)
    stats = dict(Q._LAST_DENSE_STATS)
    assert stats["blocks_decoded"] == stats["blocks_total"], stats
    brute = Q._score_group(pdf, q_terms, n, avgdl, "bm25", k, prune=False)
    assert list(dense["doc_id"]) == list(brute["doc_id"])
    assert list(dense["score"]) == list(brute["score"])


def test_dense_scorer_single_term_block_cut():
    """Single scored-term queries (the 2M-doc serving tail: one mid-idf
    head term) must decode blocks in bound order and stop once the next
    block bound quantizes below the k-th best — identical output to the
    decode-everything scorer."""
    import numpy as np
    import pandas as pd

    from knowledgeir_spark.index import query as Q
    from knowledgeir_spark.index.codec import encode_block

    rows = []
    docs = np.arange(0, 40000, 2, dtype=np.uint64)
    for bi, s in enumerate(range(0, len(docs), 128)):
        ids = docs[s:s + 128]
        tfs = np.ones(len(ids))
        dls = np.full(len(ids), 20)
        if bi == 37:  # one hot block: short docs with high tf
            tfs[:8] = 8
            dls[:8] = 10
        blk = encode_block(ids, tfs, dls)
        blk.update(term="solo", qid="1")
        rows.append(blk)
    pdf = pd.DataFrame(rows)
    q_terms = {"1": [{"term": "solo", "term_idx": 0, "q_tf": 1, "df": 20000.0}]}
    n, avgdl, k = 100000.0, 20.0, 5

    dense = Q._score_group_dense(pdf, q_terms, n, avgdl, k, "varint", 40000)
    stats = dict(Q._LAST_DENSE_STATS)
    assert stats["blocks_decoded"] < stats["blocks_total"] * 0.5, stats

    brute = Q._score_group(pdf, q_terms, n, avgdl, "bm25", k, prune=False)
    assert list(dense["doc_id"]) == list(brute["doc_id"])
    assert list(dense["score"]) == list(brute["score"])


def test_serving_decode_cache_identical_results(spark, built, queries_pdf):
    """The hot-term decoded-postings cache must be result-invisible: a
    repeated query (and a different query sharing terms) returns exactly
    the same rows as the cold run, and the cache actually gets hits."""
    from knowledgeir_spark.index.query import IndexReader

    rd = IndexReader(spark, built["idx_dir"])
    queries = [(str(r.qid), r.query) for r in queries_pdf.itertuples()][:10]
    cold = [rd.search_local([q], k=20) for q in queries]
    assert rd.decode_cache.misses > 0
    warm = [rd.search_local([q], k=20) for q in queries]
    assert rd.decode_cache.hits > 0
    assert cold == warm
    # a fresh reader (empty cache) agrees too
    rd2 = IndexReader(spark, built["idx_dir"])
    assert [rd2.search_local([q], k=20) for q in queries] == cold


def test_prewarm_cache_and_identical_results(spark, built, queries_pdf):
    """prewarm() pre-decodes positive-idf head terms into the cache
    (result-invisible), so first-touch queries hit instead of decoding."""
    from knowledgeir_spark.index.query import IndexReader

    queries = [(str(r.qid), r.query) for r in queries_pdf.itertuples()][:10]
    rd_cold = IndexReader(spark, built["idx_dir"])
    cold = [rd_cold.search_local([q], k=20) for q in queries]

    rd = IndexReader(spark, built["idx_dir"])
    stats = rd.prewarm(n_terms=64)
    assert stats["terms_warmed"] > 0
    assert stats["postings_cached"] > 0
    pre_hits, pre_misses = rd.decode_cache.hits, rd.decode_cache.misses
    warm = [rd.search_local([q], k=20) for q in queries]
    assert warm == cold
    assert rd.decode_cache.hits > pre_hits  # prewarmed terms were reused
    # prewarm is idempotent and never evicts what it just decoded
    again = rd.prewarm(n_terms=64)
    assert again["terms_warmed"] == 0


def test_impact_layout_rank_identical_and_discriminative(
    spark, built, queries_pdf, tmp_path_factory
):
    """block_order='impact' must return EXACTLY the docid layout's results
    (both paths, all queries) while making block score bounds strictly
    decline within each (term, salt) group — the property that lets the
    serving bound-cut skip blocks on Zipf corpora."""
    import numpy as np

    from knowledgeir_spark.index.build import IndexConfig
    from knowledgeir_spark.index.query import IndexReader

    idx_dir = str(tmp_path_factory.mktemp("index_impact"))
    pdf = built["pdf"]
    docs = spark.createDataFrame(pdf[["doc_id", "text"]])
    cfg = IndexConfig(**{**CFG.fingerprint_dict(), "block_order": "impact"})
    build_index(spark, docs, idx_dir, cfg, input_token="webpages300")

    rd_i = IndexReader(spark, idx_dir)
    assert rd_i.block_order == "impact"
    rd_d = IndexReader(spark, built["idx_dir"])
    queries = [(str(r.qid), r.query) for r in queries_pdf.itertuples()]
    for q in queries:
        assert rd_i.search_local([q], k=15) == rd_d.search_local([q], k=15), q
    a = rd_i.search(queries[:5], k=15).collect()
    b = rd_d.search(queries[:5], k=15).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    # bound discrimination: for the head term, per-(salt) max_tf declines
    # with block_id under impact order but not under docid order
    from pyspark.sql import functions as F

    post = spark.read.parquet(f"{idx_dir}/postings")
    head_term = (
        post.groupBy("term").count().orderBy(F.desc("count"), "term")
        .first()["term"]
    )
    head = (
        post.filter(F.col("term") == head_term)
        .select("salt", "block_id", "max_tf")
        .orderBy("salt", "block_id")
        .toPandas()
    )
    assert len(head) > 3
    declines = 0
    for _, g in head.groupby("salt"):
        mt = g["max_tf"].to_numpy()
        assert all(mt[i] >= mt[i + 1] for i in range(len(mt) - 1)), mt
        declines += int(len(mt) > 1 and mt[0] > mt[-1])
    assert declines > 0  # bounds actually discriminate, not just equal


def test_dense_scorer_candidate_filter_narrows_fillin():
    """MaxScore step 2 (candidate filter): candidates whose upper bound
    (exact essential partial + remaining term bounds) quantizes strictly
    below the running k-th partial are dropped BEFORE fill-in, so the
    fill-in decodes only blocks holding surviving candidates — fewer
    blocks at smaller k — while staying bit-identical to the
    decode-everything scorer."""
    import numpy as np
    import pandas as pd

    from knowledgeir_spark.index import query as Q
    from knowledgeir_spark.index.codec import encode_block

    rows = []
    # selective anchor: 10 docs, strongly spread tfs, spread across id space
    a_docs = np.arange(1, 100001, 10000, dtype=np.uint64)
    blk = encode_block(a_docs, np.arange(5, 15), np.full(10, 20))
    blk.update(term="anchor", qid="1")
    rows.append(blk)
    # two mid terms covering only the low half of the id space
    for t, start in (("mid1", 0), ("mid2", 1)):
        docs = np.arange(start, 60000, 2, dtype=np.uint64)
        for s in range(0, len(docs), 128):
            ids = docs[s:s + 128]
            b = encode_block(ids, np.ones(len(ids)), np.full(len(ids), 20))
            b.update(term=t, qid="1")
            rows.append(b)
    pdf = pd.DataFrame(rows)
    q_terms = {"1": [
        {"term": "anchor", "term_idx": 0, "q_tf": 1, "df": 10.0},
        {"term": "mid1", "term_idx": 1, "q_tf": 1, "df": 30000.0},
        {"term": "mid2", "term_idx": 2, "q_tf": 1, "df": 30000.0},
    ]}
    n, avgdl = 100000.0, 20.0

    decoded = {}
    for k in (3, 10):
        dense = Q._score_group_dense(pdf, q_terms, n, avgdl, k, "varint",
                                     100001)
        decoded[k] = dict(Q._LAST_DENSE_STATS)["blocks_decoded"]
        brute = Q._score_group(pdf, q_terms, n, avgdl, "bm25", k, prune=False)
        assert list(dense["doc_id"]) == list(brute["doc_id"]), k
        assert list(dense["score"]) == list(brute["score"]), k
    total = dict(Q._LAST_DENSE_STATS)["blocks_total"]
    # k=3 keeps only the top-tf anchor docs (all in the mid-free id half):
    # the fill-in decodes nothing beyond the anchor block
    assert decoded[3] < decoded[10] <= total * 0.1, (decoded, total)


def test_reader_suggest_matches_spark_operator(spark, built):
    """IndexReader.suggest (driver-side delete-key index) and the
    distributed spell_correct operator must implement the same spec over
    the same vocabulary — including the oversized-vocab fallback path."""
    from pyspark.sql import functions as F

    from knowledgeir_spark.operators.spell import spell_correct

    rd = IndexReader(spark, built["idx_dir"])
    vocab = spark.read.parquet(f"{built['idx_dir']}/term_stats").select("term", "df")
    # derive typo inputs from real vocab terms (drop 3rd char) + controls
    terms = [r["term"] for r in vocab.orderBy(F.col("df").desc()).limit(8).collect()]
    inputs = [t[:2] + t[3:] for t in terms if len(t) >= 5] + ["zzzzqq", terms[0]]
    want_rows = spell_correct(
        spark.createDataFrame([(t,) for t in inputs], "input string"), vocab
    ).collect()
    want = {r["input"]: (r["suggestion"], r["ed"], float(r["sugg_df"]))
            for r in want_rows}
    got = rd.suggest(inputs)
    assert got == want
    assert want[terms[0]][1] == 0  # in-vocab passes through at ed 0

    # force the oversized-vocabulary fallback (no driver df cache)
    rd2 = IndexReader(spark, built["idx_dir"])
    rd2._TERM_STATS_CACHE_MAX = 0
    got2 = rd2.suggest(inputs)
    assert rd2._df_cache is None
    assert got2 == want


def test_sharded_reader_rank_identical_to_monolith(spark, built, tmp_path_factory):
    """Two shards (doc_id split) searched via ShardedReader with global
    stats must return EXACTLY the monolithic index's top-k — ids, scores,
    ranks — for every query in the suite."""
    from knowledgeir_spark.index.query import ShardedReader

    base = tmp_path_factory.mktemp("shards")
    docs = built["docs"]
    cut = 150
    dirs = []
    for i, part in enumerate(
        [docs.filter(f"doc_id < {cut}"), docs.filter(f"doc_id >= {cut}")]
    ):
        d = str(base / f"shard{i}")
        build_index(spark, part, d, CFG, input_token=f"shard{i}")
        dirs.append(d)

    mono = IndexReader(spark, built["idx_dir"])
    sharded = ShardedReader(spark, dirs)
    assert sharded.n_docs == float(mono.field_stats["n_docs"])
    assert abs(sharded.avg_doc_len - float(mono.field_stats["avg_doc_len"])) < 1e-9

    queries = [("1", "spark data"), ("2", "the with for"), ("3", "zzznope"),
               ("4", "a of and to in")]
    for prune in (True, False):
        want = mono.search_local(queries, k=10, prune=prune)
        got = sharded.search_local(queries, k=10, prune=prune)
        # identical ranking (ids + ranks); scores equal to 1e-9 (the two
        # sides may route different scorer kernels per shard)
        assert [(q, d, r) for q, d, _s, r in got] == [
            (q, d, r) for q, d, _s, r in want
        ]
        for (_, _, sg, _), (_, _, sw, _) in zip(got, want):
            assert abs(sg - sw) < 1e-9


def test_docstore_snippets_match_operator(spark, built):
    """Serving-side snippet rendering from the bucket-pruned docstore must
    equal the distributed best_snippets operator row-for-row (same spec,
    two implementations)."""
    import re

    from knowledgeir_spark.index.docstore import DocStore, write_docstore
    from knowledgeir_spark.operators.snippet import best_snippets

    d = built["idx_dir"]
    write_docstore(built["docs"], d, n_buckets=8)
    rd = IndexReader(spark, d)
    queries = [("1", "spark data table"), ("2", "the with for"), ("3", "zzznope")]
    res = rd.search_local(queries, k=5)
    got = sorted(DocStore(d, n_buckets=8).snippets(queries, res))

    spark_rows = [(int(q), int(doc)) for q, doc, _s, _r in res]
    cand = spark.createDataFrame(spark_rows, "qid long, doc_id long")
    qt = spark.createDataFrame(
        [(int(q), t) for q, qtext in queries
         for t in re.findall(r"[a-z0-9]+", qtext.lower())],
        "qid long, term string",
    )
    want = sorted(
        (str(r["qid"]), r["doc_id"], r["start_pos"], r["n_matches"], r["snippet"])
        for r in best_snippets(built["docs"], qt, cand).collect()
    )
    assert got == want
    assert len(got) > 0


def test_sharded_suggest_sums_global_df(spark, built, tmp_path_factory):
    """ShardedReader.suggest ranks by the UNION df: a term split across
    shards must carry the summed prior."""
    from knowledgeir_spark.index.query import ShardedReader

    base = tmp_path_factory.mktemp("sshards")
    docs = built["docs"]
    dirs = []
    for i, part in enumerate(
        [docs.filter("doc_id % 2 = 0"), docs.filter("doc_id % 2 = 1")]
    ):
        d = str(base / f"s{i}")
        build_index(spark, part, d, CFG, input_token=f"sg{i}")
        dirs.append(d)
    sh = ShardedReader(spark, dirs)
    mono = IndexReader(spark, built["idx_dir"])
    # pick a real vocab term, misspell it, and require the same correction
    # with the same (global) df the monolith reports
    stats = spark.read.parquet(f"{built['idx_dir']}/term_stats").orderBy(
        "df", ascending=False).limit(1).collect()[0]
    term, df = stats["term"], float(stats["df"])
    typo = term[:2] + term[3:] if len(term) >= 5 else term + "x"
    got = sh.suggest([typo, term])
    want = mono.suggest([typo, term])
    assert got == want
    assert got[term] == (term, 0, df)


def test_last_query_stats_surface(spark, built, queries_pdf):
    rd = IndexReader(spark, built["idx_dir"])
    queries = [(r.qid, r.query) for r in queries_pdf.itertuples()][:3]
    rd.search_local(queries, k=5)
    st = rd.last_query_stats()
    assert st["cache_budget"] > 0
    assert st["cache_hits"] + st["cache_misses"] >= 0
    assert {"cache_postings", "cache_terms"} <= set(st)
