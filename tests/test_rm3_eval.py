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


# ---------------------------------------------------------------------------
# salience metric suite (p@k / r@k / precision / recall / accuracy / auc)


def _ref_salience_eva(scores, labels, depths=(1, 5, 10, 20)):
    """Literal transcription of the reference SalienceEva
    (salience/utils/evaluation.py:34-116); AUC via an INDEPENDENT numeric
    trapezoid over the ROC curve (what sklearn.roc_auc_score computes) —
    not the rank formula the engine uses."""
    from itertools import groupby

    out = {}
    l_d = sorted(zip(scores, labels), key=lambda it: -it[0])  # stable ties
    correct = 0
    total_z = max(1, sum(max(0, min(lab, 1)) for lab in labels))
    for p in range(max(depths)):
        label = l_d[p][1] if p < len(l_d) else 0
        if label > 0:
            correct += 1
        if p + 1 in depths:
            out[f"p_at_{p + 1:02d}"] = correct / (p + 1)
            out[f"r_at_{p + 1:02d}"] = correct / total_z
    z = sum(1 for s in scores if s > 0)
    c = sum(1 for s, lab in zip(scores, labels) if s > 0 and lab > 0)
    out["precision"] = c / max(z, 1.0)
    out["recall"] = c / max(sum(1 for lab in labels if lab > 0), 1.0)
    out["accuracy"] = c / max(len(scores), 1.0)
    lab_bin = [min(1, max(0, lab)) for lab in labels]
    if min(lab_bin) == 1:
        out["auc"] = 1.0
    elif max(lab_bin) == 0:
        out["auc"] = 0.0
    else:
        pairs = sorted(zip(scores, lab_bin), key=lambda t: -t[0])
        pos = sum(lab_bin)
        neg = len(lab_bin) - pos
        pts = [(0.0, 0.0)]
        tp = fp = 0
        for _s, grp in groupby(pairs, key=lambda t: t[0]):
            g = list(grp)
            tp += sum(lab for _, lab in g)
            fp += sum(1 - lab for _, lab in g)
            pts.append((fp / neg, tp / pos))
        out["auc"] = sum(
            (x2 - x1) * (y1 + y2) / 2
            for (x1, y1), (x2, y2) in zip(pts, pts[1:])
        )
    return out


def test_salience_metrics_vs_reference_oracle(spark):
    import random

    from knowledgeir_spark.operators.eval import salience_metrics

    rng = random.Random(17)
    docs = {}
    rows = []
    for doc_id in range(12):
        n = rng.randint(1, 30)
        # coarse score grid -> many exact ties; labels mixed, with doc 0
        # all-positive and doc 1 all-negative (the AUC special cases)
        scores = [rng.choice([0.0, 0.5, 1.0, 1.5, 2.0]) for _ in range(n)]
        if doc_id == 0:
            labels = [1] * n
        elif doc_id == 1:
            labels = [0] * n
        else:
            labels = [rng.choice([-1, 0, 1, 2]) for _ in range(n)]
        docs[doc_id] = (scores, labels)
        rows += [
            (doc_id, i, s, lab)
            for i, (s, lab) in enumerate(zip(scores, labels))
        ]

    df = spark.createDataFrame(
        rows, "doc_id long, ent_idx long, score double, label long"
    )
    got = {
        r["doc_id"]: r.asDict()
        for r in salience_metrics(df, order_col="ent_idx").collect()
    }
    assert set(got) == set(docs)
    for doc_id, (scores, labels) in docs.items():
        exp = _ref_salience_eva(scores, labels)
        for metric, val in exp.items():
            assert got[doc_id][metric] == pytest.approx(val, abs=1e-9), (
                doc_id, metric,
            )
