"""TREC / qrel / SVM-rank format round-trips (SURVEY.md §2.1 S6-S8)."""

from __future__ import annotations

import glob

import pytest


def test_trec_roundtrip(spark, tmp_path):
    from knowledgeir_spark.sources.trec import read_trec, write_trec

    rows = [("1", "docA", 1, 5.5), ("1", "docB", 2, 4.0), ("10", "docC", 1, 9.0)]
    df = spark.createDataFrame(rows, "qid string, docno string, rank int, score double")
    out = str(tmp_path / "run")
    write_trec(df, out, run_name="test_run")
    back = {(r["qid"], r["docno"]): (r["rank"], r["score"])
            for r in read_trec(spark, out).collect()}
    assert back == {(q, d): (r, s) for q, d, r, s in rows}
    # file format: qid Q0 docno rank score # run, sorted by int(qid)
    lines = []
    for f in sorted(glob.glob(out + "/part-*")):
        lines += open(f).read().splitlines()
    assert lines[0].startswith("1 Q0 doc")
    assert lines[-1].startswith("10 Q0 docC 1 9.0 # test_run")


def test_qrel_roundtrip(spark, tmp_path):
    from knowledgeir_spark.sources.trec import read_qrel, write_qrel

    rows = [("1", "docA", 2), ("2", "docB", 0)]
    df = spark.createDataFrame(rows, "qid string, docno string, label int")
    out = str(tmp_path / "qrel")
    write_qrel(df, out)
    back = {(r["qid"], r["docno"]): r["label"] for r in read_qrel(spark, out).collect()}
    assert back == {(q, d): l for q, d, l in rows}


def test_svm_roundtrip(spark, tmp_path):
    from knowledgeir_spark.sources.svm import feature_name_ids, read_svm, write_svm

    rows = [
        ("1", "docA", 1, {"0_basescore": -2.5, "bm25": 1.25}),
        ("1", "docB", 0, {"0_basescore": -3.0, "lm": 0.5}),
        ("2", "docC", 2, {"bm25": 2.0, "lm": 1.0}),
    ]
    df = spark.createDataFrame(
        rows, "qid string, docno string, label int, features map<string,double>"
    )
    ids = {r["name"]: r["fid"] for r in feature_name_ids(df).collect()}
    # reference quirk (base.py:400-407): names containing 'base' get id 1
    assert ids["0_basescore"] == 1
    assert set(ids.values()) == {1, 2, 3}
    out = str(tmp_path / "svm")
    write_svm(df, out)
    back = read_svm(spark, out).collect()
    by_doc = {r["docno"]: r for r in back}
    assert by_doc["docA"]["label"] == 1 and by_doc["docA"]["qid"] == "1"
    assert by_doc["docA"]["features"][str(ids["bm25"])] == pytest.approx(1.25)
    assert by_doc["docB"]["features"][str(ids["0_basescore"])] == pytest.approx(-3.0)
    assert by_doc["docC"]["features"][str(ids["lm"])] == pytest.approx(1.0)


def test_pooling(spark):
    import math

    from knowledgeir_spark.operators.pooling import pool_features, topk_padded

    df = spark.createDataFrame(
        [("q1", 1.0), ("q1", 3.0), ("q1", 2.0), ("q2", 5.0)],
        "qid string, v double",
    )
    p = {r["qid"]: r for r in pool_features(df, ["qid"], "v", "f").collect()}
    assert p["q1"]["f_Mean"] == pytest.approx(2.0)
    assert p["q1"]["f_Max"] == 3.0
    assert p["q1"]["f_Sum"] == 6.0
    assert p["q1"]["f_LogSum"] == pytest.approx(math.log(1) + math.log(3) + math.log(2))
    t = {r["qid"]: r for r in topk_padded(df, ["qid"], "v", 3, "f").collect()}
    assert (t["q1"]["f_Top1"], t["q1"]["f_Top2"], t["q1"]["f_Top3"]) == (3.0, 2.0, 1.0)
    # -20 padding quirk (q_de_text.py:290-306)
    assert (t["q2"]["f_Top1"], t["q2"]["f_Top2"], t["q2"]["f_Top3"]) == (5.0, -20.0, -20.0)
