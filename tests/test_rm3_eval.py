"""RM3 expansion + gdeval-semantics NDCG/ERR vs hand-computed oracles."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def test_rm3_matches_reference_formula(spark):
    from knowledgeir_spark.operators.rm3 import rm3_expansion

    # 2 docs for one query; doc terms with tf; scores 2.0 / 1.0
    ranking = spark.createDataFrame(
        [("1", 10, 2.0, 1), ("1", 11, 1.0, 2)],
        "qid string, doc_id long, score double, rank int",
    )
    doc_terms = spark.createDataFrame(
        [
            (10, "a", 2, 4), (10, "b", 2, 4),
            (11, "b", 1, 3), (11, "c", 2, 3),
        ],
        "doc_id long, term string, tf long, doc_len long",
    )
    got = {
        r["term"]: r["exp_score"]
        for r in rm3_expansion(ranking, doc_terms, n_docs=10, n_terms=10).collect()
    }
    # reference: exp(term) = sum_docs tf/doc_len * score (base.py:489-492)
    assert got["a"] == pytest.approx(2 / 4 * 2.0)
    assert got["b"] == pytest.approx(2 / 4 * 2.0 + 1 / 3 * 1.0)
    assert got["c"] == pytest.approx(2 / 3 * 1.0)

    # idf variant: exp *= log(total_df/df), df-missing -> log(0.5) (quirk)
    ts = spark.createDataFrame([("a", 2), ("b", 10)], "term string, df long")
    got2 = {
        r["term"]: r["exp_score"]
        for r in rm3_expansion(
            ranking, doc_terms, term_stats_df=ts, total_df=10.0, n_terms=10
        ).collect()
    }
    assert got2["a"] == pytest.approx(2 / 4 * 2.0 * math.log(10 / 2))
    assert got2["b"] == pytest.approx((2 / 4 * 2.0 + 1 / 3 * 1.0) * math.log(10 / 10))
    assert got2["c"] == pytest.approx(2 / 3 * 1.0 * math.log(0.5))  # negative!


def _gdeval_oracle(run, qrels, k=20):
    """run: [(qid, docno, score)], qrels: {(qid, docno): label}"""
    import collections

    by_q = collections.defaultdict(list)
    for qid, docno, score in run:
        by_q[qid].append((docno, score))
    out = {}
    ideal_by_q = collections.defaultdict(list)
    for (qid, docno), lab in qrels.items():
        ideal_by_q[qid].append(lab)
    for qid, labs in ideal_by_q.items():
        labs.sort(reverse=True)
        idcg = sum((2 ** g - 1) / math.log2(i + 2) for i, g in enumerate(labs[:k]))
        docs = sorted(by_q.get(qid, []), key=lambda x: (-x[1], [-ord(c) for c in x[0]]))
        gains = [qrels.get((qid, d), 0) for d, _ in docs[:k]]
        dcg = sum((2 ** g - 1) / math.log2(i + 2) for i, g in enumerate(gains))
        err, decay = 0.0, 1.0
        for i, g in enumerate(gains):
            r = (2 ** g - 1) / 16.0
            err += r * decay / (i + 1)
            decay *= 1 - r
        out[qid] = (dcg / idcg if idcg > 0 else 0.0, err)
    return out


def test_ndcg_err_matches_gdeval_semantics(spark):
    from knowledgeir_spark.operators.eval import ndcg_err_at_k

    run = [
        ("1", "d1", 3.0), ("1", "d2", 2.0), ("1", "d3", 2.0), ("1", "d4", 1.0),
        ("2", "d1", 5.0), ("2", "d9", 4.0),
    ]
    qrels = {
        ("1", "d1"): 4, ("1", "d2"): 0, ("1", "d3"): 2, ("1", "d5"): 3,
        ("2", "d9"): 1,
    }
    ranking = spark.createDataFrame(run, "qid string, docno string, score double")
    qrels_df = spark.createDataFrame(
        [(q, d, l) for (q, d), l in qrels.items()], "qid string, docno string, label int"
    )
    got = {
        r["qid"]: (r["ndcg"], r["err"])
        for r in ndcg_err_at_k(ranking, qrels_df, k=20).collect()
    }
    expected = _gdeval_oracle(run, qrels)
    assert set(got) == set(expected)
    for qid in expected:
        assert got[qid][0] == pytest.approx(expected[qid][0], abs=1e-9), qid
        assert got[qid][1] == pytest.approx(expected[qid][1], abs=1e-9), qid


def test_score_tie_docno_desc_quirk(spark):
    """gdeval runOrder breaks score ties by docno DESC (gdeval.pl:186-190)."""
    from knowledgeir_spark.operators.eval import ndcg_err_at_k

    run = [("1", "a", 1.0), ("1", "b", 1.0)]
    qrels = {("1", "b"): 4}
    ranking = spark.createDataFrame(run, "qid string, docno string, score double")
    qrels_df = spark.createDataFrame([("1", "b", 4)], "qid string, docno string, label int")
    got = ndcg_err_at_k(ranking, qrels_df, k=1).collect()[0]
    # docno desc -> 'b' ranked first -> perfect ndcg at k=1
    assert got["ndcg"] == pytest.approx(1.0)
