"""Oracle scorer sanity: hand-computed values + quirk behaviors.

The quirks are from /root/reference/knowledge4ir/utils/retrieval_model.py —
these tests pin them so neither oracle nor engine drifts.
"""

from __future__ import annotations

import math

import pytest

from knowledgeir_spark.oracle.retrieval import OracleScorer


def test_bm25_hand_computed():
    # q = {a:1}, doc = {a:2, b:3} -> dl=5; df(a)=4, N=10, avgdl=5
    s = OracleScorer({"a": 1}, {"a": 2, "b": 3}, {"a": 4.0}, 10.0, 5.0)
    tf_part = 2 * 2.2 / (2 + 1.2 * (1 - 0.75 + 0.75 * 5 / 5))
    ratio = max((10 - 4 + 0.5) / (4 + 0.5), 1.0)
    idf = max(math.log(ratio), 0.0)
    expected = math.log(max(ratio * tf_part * idf, 1.0))
    assert s.bm25() == pytest.approx(expected, abs=1e-12)


def test_bm25_quirks():
    # doc_len == 0 -> 0 (line 252)
    assert OracleScorer({"a": 1}, {}, {"a": 1.0}, 10.0, 5.0).bm25() == 0.0
    # low-idf match clamps to log(1.0)=0 (line 264): df=N -> ratio clamps to 1
    s = OracleScorer({"a": 1}, {"a": 1, "b": 9}, {"a": 10.0}, 10.0, 10.0)
    assert s.bm25() == 0.0
    # repeated query term does NOT change bm25 (unused v_q quirk, line 254)
    s1 = OracleScorer({"a": 1}, {"a": 2, "b": 3}, {"a": 4.0}, 10.0, 5.0)
    s2 = OracleScorer({"a": 5}, {"a": 2, "b": 3}, {"a": 4.0}, 10.0, 5.0)
    assert s1.bm25() == s2.bm25()
    # OOV term df -> 0 (set_from_raw:139-144) raises the ratio, still finite
    s3 = OracleScorer({"zzz": 1}, {"a": 2}, {}, 10.0, 5.0)
    assert s3.bm25() == 0.0  # tf=0 -> tf_part=0 -> sum=0 -> log(max(0,1))=0


def test_lm_hand_computed():
    s = OracleScorer({"a": 2}, {"a": 3, "b": 2}, {}, 10.0, 5.0)
    assert s.lm() == pytest.approx(2 * math.log(3 / 5), abs=1e-12)
    # absent term floored at min_tf=0.1
    s = OracleScorer({"c": 1}, {"a": 3, "b": 2}, {}, 10.0, 5.0)
    assert s.lm() == pytest.approx(math.log(0.1 / 5), abs=1e-12)
    # empty doc -> log(1e-10)
    assert OracleScorer({"a": 1}, {}).lm() == pytest.approx(math.log(1e-10))


def test_lm_dir_offset_and_df_smoothing():
    # +20 offset (retrieval_model.py:227) and DF-based smoothing quirk
    s = OracleScorer({"a": 1}, {"a": 1}, {"a": 5.0}, 10.0, 1.0)
    expected = math.log((1 + 2500 * 0.5) / (1 + 2500)) + 20
    assert s.lm_dir() == pytest.approx(expected, abs=1e-12)


def test_coordinate_bools():
    s = OracleScorer({"a": 1, "b": 1, "c": 1}, {"a": 2, "b": 1}, {}, 10.0, 5.0)
    assert s.coordinate() == 2
    assert s.bool_and() == 0
    assert s.bool_or() == 1
    s2 = OracleScorer({"a": 1, "b": 1}, {"a": 2, "b": 1}, {}, 10.0, 5.0)
    assert s2.bool_and() == 1


def test_tf_idf():
    s = OracleScorer({"a": 1}, {"a": 2, "b": 8}, {"a": 4.0}, 10.0, 5.0)
    assert s.tf_idf() == pytest.approx(math.log(1 + 10 / 4) * 2 / 10, abs=1e-12)
