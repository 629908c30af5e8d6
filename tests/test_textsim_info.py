"""lm_cosine / avg_embedding / bin_similarity + info-assembly operators."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def test_lm_cosine(spark):
    from knowledgeir_spark.functions.textsim import lm_cosine

    df = spark.createDataFrame(
        [
            (0, {"a": 2, "b": 1}, {"a": 1, "c": 1}),
            (1, {"a": 1}, {}),
            (2, {"a": 1}, {"b": 1}),
        ],
        "i long, a map<string,int>, b map<string,int>",
    )
    got = {r["i"]: r["cos"] for r in df.select("i", lm_cosine(F.col("a"), F.col("b")).alias("cos")).collect()}
    expected0 = 2 / (math.sqrt(5) * math.sqrt(2))
    assert got[0] == pytest.approx(expected0, abs=1e-12)
    assert got[1] == 0.0  # empty side -> 0 (nlp.py:85-86)
    assert got[2] == 0.0  # no overlap


def test_avg_embedding(spark):
    from knowledgeir_spark.functions.textsim import avg_embedding

    docs = spark.createDataFrame(
        [(0, "alpha beta zzz"), (1, "zzz qqq")], "doc_id long, text string"
    )
    emb = spark.createDataFrame(
        [("alpha", [1.0, 3.0]), ("beta", [3.0, 5.0])],
        "token string, vector array<double>",
    )
    rows = avg_embedding(docs, emb).collect()
    got = {r["doc_id"]: r["avg_vec"] for r in rows}
    assert got[0] == [2.0, 4.0]
    assert 1 not in got  # no in-vocab tokens -> absent (reference: None)


def test_bin_similarity_reference_quirks(spark):
    from knowledgeir_spark.functions.textsim import bin_similarity, form_bins

    assert form_bins(5) == [1.0, 0.75, 0.5, 0.25, 0.0]
    sims = spark.createDataFrame(
        [("q1", 1.0), ("q1", 0.8), ("q1", 0.8), ("q1", 0.1), ("q1", -0.5)],
        "qid string, sim double",
    )
    # -0.5 < 0.0 -> dropped (base.py:510-514); log quirk: log(max(c,1e-10))
    r = bin_similarity(sims, ["qid"], "sim", nb_bin=5, bin_func="log").collect()[0]
    assert r["bin_0"] == pytest.approx(math.log(1))
    assert r["bin_1"] == pytest.approx(math.log(2))
    assert r["bin_2"] == pytest.approx(math.log(1e-10))  # empty bin quirk
    assert r["bin_3"] == pytest.approx(math.log(1e-10))  # 0.1 < 0.25 -> not here
    assert r["bin_4"] == pytest.approx(math.log(1))      # 0.1 >= 0.0 -> bin_4
    r2 = bin_similarity(sims, ["qid"], "sim", nb_bin=5, bin_func="norm_tf").collect()[0]
    assert r2["bin_1"] == pytest.approx(0.5)


def test_combine_info_right_wins(spark):
    from knowledgeir_spark.operators.info import combine_info

    left = spark.createDataFrame(
        [("d1", "t1", "b1"), ("d2", "t2", "b2")], "docno string, title string, body string"
    )
    right = spark.createDataFrame(
        [("d1", "T1*", "extra1"), ("d3", "T3", "extra3")],
        "docno string, title string, note string",
    )
    got = {r["docno"]: r for r in combine_info(left, right, "docno").collect()}
    assert set(got) == {"d1", "d2"}  # left's key set (update semantics)
    assert got["d1"]["title"] == "T1*"      # right wins
    assert got["d1"]["body"] == "b1"        # left-only col kept
    assert got["d1"]["note"] == "extra1"    # right-only col added
    assert got["d2"]["title"] == "t2" and got["d2"]["note"] is None


def test_align_to_trec(spark):
    from knowledgeir_spark.operators.info import align_to_trec

    ranking = spark.createDataFrame(
        [("1", "d1", 1, 2.0), ("1", "d2", 101, 0.5)],
        "qid string, docno string, rank int, score double",
    )
    info = spark.createDataFrame([("d1", "Title1")], "docno string, title string")
    rows = align_to_trec(ranking, info, max_rank=100).collect()
    assert len(rows) == 1  # rank-depth predicate (P5)
    assert rows[0]["info_json"] == '{"title":"Title1"}'


def test_hash_corpus(spark):
    from knowledgeir_spark.operators.info import hash_corpus

    toks = spark.createDataFrame(
        [(0, 0, "a"), (0, 1, "zzz"), (0, 2, "b"), (1, 0, "b")],
        "doc_id long, pos int, token string",
    )
    vocab = spark.createDataFrame([("a", 7), ("b", 9)], "token string, vid int")
    got = {r["doc_id"]: r["token_ids"] for r in hash_corpus(toks, vocab, max_per_doc=2).collect()}
    assert got[0] == [7, 0]  # UNK->0, order kept, capped at 2
    assert got[1] == [9]


def test_kfold_and_shuffle(spark):
    from knowledgeir_spark.operators.info import kfold_partition, shuffle_stable_sort

    df = spark.createDataFrame([(str(i),) for i in range(20)], "qid string")
    folds = {r["qid"]: r["fold"] for r in kfold_partition(df, k=5).collect()}
    assert folds["7"] == 2 and folds["10"] == 0
    rows = [(str(i // 3), i) for i in range(12)]
    d2 = spark.createDataFrame(rows, "qid string, v int")
    a = [tuple(r) for r in shuffle_stable_sort(d2, seed=1).collect()]
    b = [tuple(r) for r in shuffle_stable_sort(d2, seed=1).collect()]
    assert a == b  # deterministic given seed
    assert [r[0] for r in a] == sorted([r[0] for r in rows], key=int)


def test_surface_stat_features_match_boe_oracle(spark):
    """F17 completion vs boe.py:77-136 semantics: cmns prior (first
    candidate), coverage ((ed-st)/len(text.split())), surface length, and
    tf>=10-gated wiki link probability."""
    from knowledgeir_spark.operators.duet_features import surface_stat_features

    anns = spark.createDataFrame(
        [
            (0, "bodyText", "barack obama", [3, 5],
             [("e1", 0.9), ("e2", 0.1)]),
            (0, "bodyText", "senate", [9, 10], [("e3", 1.0)]),
            (1, "bodyText", "rare phrase", [0, 2], []),
        ],
        "doc_id long, field string, surface string, loc array<int>, "
        "entities array<struct<id:string, cmns:double>>",
    )
    texts = spark.createDataFrame(
        [(0, "bodyText", "w1 w2 w3 barack obama w6 w7 w8 w9 in w11 w12"),
         (1, "bodyText", "   ")],
        "doc_id long, field string, text string",
    )
    stats = spark.createDataFrame(
        [("barack obama", 120, 0.43), ("senate", 4, 0.9)],
        "surface string, tf long, lp double",
    )
    got = {(r["doc_id"], r["surface"]): r
           for r in surface_stat_features(anns, texts, stats).collect()}
    r = got[(0, "barack obama")]
    assert r["cmns_prior"] == pytest.approx(0.9)
    assert r["sf_len"] == 12
    assert r["sf_coverage"] == pytest.approx((5 - 3) / 12)
    assert r["sf_lp"] == pytest.approx(0.43)  # tf 120 >= 10
    r = got[(0, "senate")]
    assert r["cmns_prior"] == pytest.approx(1.0)
    assert r["sf_lp"] == 0.0  # tf 4 < 10 gate (boe.py:131)
    r = got[(1, "rare phrase")]
    assert r["cmns_prior"] == 0.0  # empty candidate list
    assert r["sf_coverage"] is None  # empty field text (ref would crash)
    assert r["sf_lp"] == 0.0  # surface absent from stats
