"""LeToR feature extraction: all scores per candidate pair == oracle
all_scores; label/base-score defaults; svm round-trip of the full pipeline."""

from __future__ import annotations

import pytest

from knowledgeir_spark.functions.text import doc_terms
from knowledgeir_spark.operators.corpus_stats import doc_stats, field_stats, term_stats
from knowledgeir_spark.operators.extract import extract_features
from knowledgeir_spark.oracle.index import OracleIndex
from knowledgeir_spark.oracle.retrieval import OracleScorer
from knowledgeir_spark.oracle.tokenizer import query_lm


@pytest.fixture(scope="module")
def setup(spark, webpages_pdf, queries_pdf):
    pdf = webpages_pdf.reset_index().rename(columns={"index": "doc_id"}).iloc[:150]
    docs = spark.createDataFrame(pdf[["doc_id", "text"]])
    dt = doc_terms(docs).cache()
    ts = term_stats(dt)
    fs = field_stats(doc_stats(dt, docs_df=docs))
    queries = spark.createDataFrame(queries_pdf.iloc[:6])
    oracle = OracleIndex(list(zip(pdf["doc_id"], pdf["text"])))
    return dict(docs=docs, dt=dt, ts=ts, fs=fs, queries=queries, oracle=oracle,
                queries_pdf=queries_pdf.iloc[:6])


def test_features_match_oracle_all_scores(spark, setup):
    o = setup["oracle"]
    # candidates: oracle bm25 top-5 per query + one zero-overlap doc per
    # query (shares NO term -> reference still smooths lm* over the tf=0
    # vector) + one doc absent from the corpus entirely (doc_len=0 ->
    # log(1e-10) early return)
    cand_rows = []
    for q in setup["queries_pdf"].itertuples():
        for d, _ in o.topk(q.query, k=5):
            cand_rows.append((q.qid, d, float(len(cand_rows))))
        q_terms = set(query_lm(q.query))
        no_overlap = next(
            d for d, lm in sorted(o.doc_lms.items())
            if lm and not q_terms & set(lm)
        )
        cand_rows.append((q.qid, no_overlap, float(len(cand_rows))))
        cand_rows.append((q.qid, 10_000_000 + int(q.qid), float(len(cand_rows))))
    cands = spark.createDataFrame(cand_rows, "qid string, doc_id long, base_score double")
    qrels = spark.createDataFrame(
        [(cand_rows[0][0], str(cand_rows[0][1]), 3)], "qid string, docno string, label int"
    )
    out = extract_features(
        setup["queries"], cands, setup["dt"], setup["ts"],
        setup["fs"].total_df, setup["fs"].avg_doc_len, qrels_df=qrels,
    ).collect()
    assert len(out) == len(cand_rows)
    by_pair = {(r["qid"], r["docno"]): r for r in out}
    for qid, doc_id, base in cand_rows:
        r = by_pair[(qid, str(doc_id))]
        qtext = setup["queries_pdf"].set_index("qid").loc[qid, "query"]
        scorer = OracleScorer(
            query_lm(qtext), o.doc_lms.get(doc_id, {}), o.df, o.total_df,
            o.avg_doc_len,
        )
        expected = scorer.all_scores()
        expected["cosine"] = scorer.cosine()
        f = r["features"]
        for name, val in expected.items():
            assert f[f"ir_{name}"] == pytest.approx(val, abs=1e-6), (qid, doc_id, name)
        assert f["0_basescore"] == base
    # qrel label default 0 / provided label honored (J3)
    assert by_pair[(cand_rows[0][0], str(cand_rows[0][1]))]["label"] == 3
    assert by_pair[(cand_rows[1][0], str(cand_rows[1][1]))]["label"] == 0


def test_base_score_default(spark, setup):
    cands = spark.createDataFrame(
        [( "1", 0 )], "qid string, doc_id long"
    )
    out = extract_features(
        setup["queries"], cands, setup["dt"], setup["ts"],
        setup["fs"].total_df, setup["fs"].avg_doc_len,
    ).collect()[0]
    assert out["features"]["0_basescore"] == -25.0  # J4 default quirk


def test_full_pipeline_to_svm(spark, setup, tmp_path):
    from knowledgeir_spark.sources.svm import read_svm, write_svm

    o = setup["oracle"]
    cand_rows = []
    for q in setup["queries_pdf"].itertuples():
        for d, s in o.topk(q.query, k=3):
            cand_rows.append((q.qid, d, s))
    cands = spark.createDataFrame(cand_rows, "qid string, doc_id long, base_score double")
    feats = extract_features(
        setup["queries"], cands, setup["dt"], setup["ts"],
        setup["fs"].total_df, setup["fs"].avg_doc_len,
    )
    out = str(tmp_path / "svm")
    write_svm(feats, out)
    back = read_svm(spark, out)
    assert back.count() == len(cand_rows)
    # '0_basescore' densifies to feature id 1 ('base' first quirk, A11)
    row = back.collect()[0]
    assert "1" in row["features"]


def test_es_term_stat_scores_match_oracle(spark, setup):
    """ES-term-vector TermStat variant (base.py:272-313): q_tf forced to 1,
    df from the prefetch table (per-qid, may disagree with corpus df),
    zero-overlap candidates smoothed — vs OracleScorer with the same
    inputs."""
    from knowledgeir_spark.operators.es_stats import es_all_scores

    o = setup["oracle"]
    q_pdf = setup["queries_pdf"]
    # prefetched per-query df: corpus df PERTURBED per qid (ES shard
    # approximation), unseen terms absent -> 0
    q_df_rows = []
    df_py: dict[tuple[str, str], float] = {}
    for i, q in enumerate(q_pdf.itertuples()):
        for t in set(query_lm(q.query)):
            if t in o.df:
                v = float(o.df[t] + (i % 3))
                q_df_rows.append((q.qid, t, v))
                df_py[(q.qid, t)] = v
    q_df = spark.createDataFrame(q_df_rows, "qid string, term string, df double")
    cands = spark.createDataFrame(
        [(q.qid, d) for q in q_pdf.itertuples() for d in (0, 3, 7, 10_000_000)],
        "qid string, doc_id long",
    )
    out = es_all_scores(
        setup["queries"], setup["dt"], q_df,
        setup["fs"].total_df, setup["fs"].avg_doc_len, candidates=cands,
    ).collect()
    by_pair = {(r["qid"], r["doc_id"]): r for r in out}
    models = ("lm", "lm_dir", "lm_jm", "lm_twoway", "bm25", "coordinate",
              "tf_idf", "bool_and", "bool_or")
    n = 0
    for q in q_pdf.itertuples():
        h_q = {t: 1 for t in query_lm(q.query)}  # presence vector
        h_df = {t: df_py.get((q.qid, t), 0.0) for t in h_q}
        for d in (0, 3, 7, 10_000_000):
            scorer = OracleScorer(
                h_q, o.doc_lms.get(d, {}), h_df,
                setup["fs"].total_df, setup["fs"].avg_doc_len,
            )
            expected = scorer.all_scores()
            r = by_pair[(q.qid, d)]
            for m in models:
                assert r[m] == pytest.approx(expected[m], abs=1e-9), (q.qid, d, m)
                n += 1
    assert n > 150


def test_add_family_features_composes(spark, setup):
    """IRFusion map + a family's long-form features merge into one map
    (the extractor-center shape); pairs without family rows keep the base
    map unchanged."""
    from knowledgeir_spark.operators.extract import add_family_features

    cands = spark.createDataFrame(
        [("1", 0), ("1", 3)], "qid string, doc_id long"
    )
    base = extract_features(
        setup["queries"], cands, setup["dt"], setup["ts"],
        setup["fs"].total_df, setup["fs"].avg_doc_len,
    )
    fam_long = spark.createDataFrame(
        [("1", "0", "BoeEmb_Bodytext_MaxBin_0", -23.02),
         ("1", "0", "PageRank_bodyText_S1_mean", 0.5)],
        "qid string, docno string, feature string, value double",
    )
    rows = {r["docno"]: r["features"]
            for r in add_family_features(base, fam_long).collect()}
    assert rows["0"]["BoeEmb_Bodytext_MaxBin_0"] == -23.02
    assert rows["0"]["PageRank_bodyText_S1_mean"] == 0.5
    assert "ir_bm25" in rows["0"] and "0_basescore" in rows["0"]
    assert "BoeEmb_Bodytext_MaxBin_0" not in rows["3"]
    assert "ir_bm25" in rows["3"]
