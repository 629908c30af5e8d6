"""Duet features (F15-F17) + range joins (J11-J12)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def test_translation_sims_and_histogram(spark):
    from knowledgeir_spark.operators.duet_features import (
        translation_sims,
        word2vec_histogram,
    )

    emb = spark.createDataFrame(
        [("a", [1.0, 0.0]), ("b", [0.0, 1.0]), ("c", [1.0, 1.0])],
        "token string, vector array<float>",
    )
    pairs = spark.createDataFrame(
        [
            ("1", 10, "a", "a"), ("1", 10, "a", "b"), ("1", 10, "a", "c"),
            ("1", 10, "oov", "a"),
        ],
        "qid string, doc_id long, q_term string, d_term string",
    )
    sims = translation_sims(pairs, emb)
    got = {(r["q_term"], r["d_term"]): r["sim"] for r in sims.collect()}
    assert got[("a", "a")] == pytest.approx(1.0)
    assert got[("a", "b")] == pytest.approx(0.0)
    assert got[("a", "c")] == pytest.approx(1 / math.sqrt(2))
    assert ("oov", "a") not in got  # OOV dropped
    h = word2vec_histogram(sims, nb_bin=3).collect()[0]
    assert h["sim_MaxPool"] == pytest.approx(1.0)
    assert h["sim_MeanAll"] == pytest.approx((1 + 0 + 1 / math.sqrt(2)) / 3)


def test_pool_sim_bins_reference_quirks(spark):
    from knowledgeir_spark.operators.duet_features import pool_sim_bins

    sims = spark.createDataFrame(
        [("g", 1.0), ("g", 0.8), ("g", 0.6), ("g", 0.3), ("g", 0.1)],
        "grp string, sim double",
    )
    r = pool_sim_bins(sims, ["grp"]).collect()[0]
    assert r["max_sim"] == 1.0
    assert r["mean_sim"] == pytest.approx((1.0 + 0.8 + 0.6 + 0.3 + 0.1) / 5)
    # quirks: ==1 only in bin_0; <0.25 nowhere (boe.py:57-64)
    assert (r["bin_0"], r["bin_1"], r["bin_2"], r["bin_3"]) == (1.0, 1.0, 1.0, 1.0)


def test_surface_ambiguity(spark):
    from knowledgeir_spark.operators.duet_features import surface_ambiguity

    anns = spark.createDataFrame(
        [
            (0, [{"id": "E1", "cmns": 0.8}, {"id": "E2", "cmns": 0.2}]),
            (1, [{"id": "E1", "cmns": 1.0}]),
        ],
        "ann_id long, entities array<struct<id string, cmns double>>",
    )
    got = {r["ann_id"]: r for r in surface_ambiguity(anns).collect()}
    expected_entropy = -(0.8 * math.log(0.8) + 0.2 * math.log(0.2))
    assert got[0]["cmns_entropy"] == pytest.approx(expected_entropy, abs=1e-12)
    assert got[0]["cmns_topdiff"] == pytest.approx(0.6)
    assert got[1]["cmns_entropy"] == pytest.approx(0.0)  # single entity
    assert got[1]["cmns_topdiff"] == pytest.approx(1.0)  # top - 0 (pad quirk)


def test_align_mentions(spark):
    from knowledgeir_spark.operators.rangejoin import align_mentions

    mentions = spark.createDataFrame(
        [
            (1, "c1", "bodyText", 5, 6),   # matches: ann (5,8), 8 > 6
            (1, "c2", "bodyText", 5, 9),   # no: 8 <= 9
            (1, "c3", "title", 5, 6),      # no: wrong field
            (1, "c4", "bodyText", 7, 7),   # no: no ann at st=7
        ],
        "doc_id long, cluster_id string, field string, st int, head_pos int",
    )
    anns = spark.createDataFrame(
        [(1, "bodyText", 5, 8, "E1")],
        "doc_id long, field string, st int, ed int, entity_id string",
    )
    got = {(r["cluster_id"], r["entity_id"]) for r in align_mentions(mentions, anns).collect()}
    assert got == {("c1", "E1")}


def test_interval_assign(spark):
    from knowledgeir_spark.operators.rangejoin import interval_assign

    points = spark.createDataFrame(
        [(1, 0), (1, 63), (1, 64), (1, 200), (2, 10)], "doc_id long, pos int"
    )
    intervals = spark.createDataFrame(
        [(1, 0, 64, "s0"), (1, 64, 128, "s1"), (2, 0, 5, "s0")],
        "doc_id long, lo int, hi int, name string",
    )
    got = {(r["doc_id"], r["pos"]): r["name"]
           for r in interval_assign(points, intervals).collect()}
    assert got[(1, 0)] == "s0"
    assert got[(1, 63)] == "s0"
    assert got[(1, 64)] == "s1"
    assert (1, 200) not in got
    assert (2, 10) not in got  # outside the interval despite same bucket
