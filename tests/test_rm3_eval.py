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


def test_randomization_test_matches_oracle(spark):
    """Engine randomization test == pure-Python replay of
    result_collect/base.py:7-38 with the same md5-derived flips."""
    import hashlib

    from knowledgeir_spark.operators.eval import randomization_test

    rows = [(str(q), float((q * 7) % 13) / 13 + (0.3 if q % 4 == 0 else 0.0),
             float((q * 5) % 11) / 11) for q in range(1, 31)]
    df = spark.createDataFrame(rows, "qid string, target double, base double")
    got = randomization_test(df, n_trials=500, seed=7).collect()[0]

    deltas = {qid: t - b for qid, t, b in rows}
    diff = sum(deltas.values()) / len(deltas)
    cnt = 0
    for trial in range(500):
        s = 0.0
        for qid, d in deltas.items():
            h = hashlib.md5(f"7:{trial}:{qid}".encode()).hexdigest()
            flip = int(h[0], 16) % 2
            s += -d if flip else d
        if s / len(deltas) > diff:
            cnt += 1
    win = sum(1 for _, t, b in rows if round(t, 3) > round(b, 3))
    tie = sum(1 for _, t, b in rows if round(t, 3) == round(b, 3))
    loss = sum(1 for _, t, b in rows if round(t, 3) < round(b, 3))
    assert got["p_value"] == pytest.approx(cnt / 500)
    assert (got["win"], got["tie"], got["loss"]) == (win, tie, loss)
    assert got["mean_target"] == pytest.approx(
        sum(t for _, t, _ in rows) / len(rows))


def test_randomization_test_detects_signal(spark):
    """A target uniformly above base must be significant; identical lists
    must not (p ~= fraction of permutations strictly above 0 ~= large)."""
    from knowledgeir_spark.operators.eval import randomization_test

    strong = spark.createDataFrame(
        [(str(q), 0.8 + (q % 3) * 0.01, 0.2 + (q % 5) * 0.01)
         for q in range(40)],
        "qid string, target double, base double",
    )
    r = randomization_test(strong, n_trials=400, seed=1).collect()[0]
    assert r["p_value"] < 0.05 and r["win"] == 40
    same = spark.createDataFrame(
        [(str(q), 0.5, 0.5) for q in range(10)],
        "qid string, target double, base double",
    )
    r2 = randomization_test(same, n_trials=200, seed=1).collect()[0]
    assert r2["p_value"] == 0.0 and r2["tie"] == 10  # all diffs 0, never >
