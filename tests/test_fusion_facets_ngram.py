"""Unit tests: RRF fusion, facet counts, repeated-ngram span dedup.

Each operator is checked against a hand-computed / pure-Python oracle,
independent of the DuckDB parity gate (which covers the same operators at
sf0.01 via parity_web).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from knowledgeir_spark.operators.facets import facet_counts
from knowledgeir_spark.operators.fusion import rrf_fuse
from knowledgeir_spark.operators.ngram_dedup import repeated_ngram_stats


def test_rrf_fuse_hand_example(spark):
    # list A: docs 1,2,3 ; list B: docs 3,4 — doc 3 appears in both
    a = spark.createDataFrame(
        [(1, 1, 1), (1, 2, 2), (1, 3, 3)], "qid int, doc_id int, rank int"
    )
    b = spark.createDataFrame(
        [(1, 3, 1), (1, 4, 2)], "qid int, doc_id int, rank int"
    )
    out = {
        r["doc_id"]: (r["rank"], r["rrf_score"])
        for r in rrf_fuse([a, b], k_rrf=60, topk=10).collect()
    }
    exp = {
        1: 1 / 61.0,
        2: 1 / 62.0,
        3: 1 / 63.0 + 1 / 61.0,
        4: 1 / 62.0,
    }
    assert set(out) == set(exp)
    for d, s in exp.items():
        assert out[d][1] == pytest.approx(s, abs=1e-12)
    # doc 3 (in both lists) outranks everything; 2 vs 4 tie on score ->
    # doc_id ascending breaks it
    order = [d for d, (rk, _) in sorted(out.items(), key=lambda kv: kv[1][0])]
    assert order == [3, 1, 2, 4]


def test_rrf_fuse_three_lists_deterministic_order(spark):
    ls = [
        spark.createDataFrame([(1, 10, 1), (1, 11, 2)], "qid int, doc_id int, rank int"),
        spark.createDataFrame([(1, 11, 1)], "qid int, doc_id int, rank int"),
        spark.createDataFrame([(1, 12, 1), (1, 10, 3)], "qid int, doc_id int, rank int"),
    ]
    rows = rrf_fuse(ls, k_rrf=60, topk=10).collect()
    got = {r["doc_id"]: r["rrf_score"] for r in rows}
    # fixed left-to-right addition: (l0 + l1) + l2
    assert got[10] == ((1 / 61.0) + 0.0) + (1 / 63.0)
    assert got[11] == ((1 / 62.0) + (1 / 61.0)) + 0.0
    assert got[12] == (0.0 + 0.0) + (1 / 61.0)


def test_facet_counts_collapses_term_hits(spark):
    # matched carries one row per (qid, doc, term) — facets count DOCS
    matched = spark.createDataFrame(
        [(1, 100, "a"), (1, 100, "b"), (1, 101, "a"), (2, 100, "c")],
        "qid int, doc_id int, term string",
    )
    docs = spark.createDataFrame(
        [(100, "en"), (101, "de")], "doc_id int, lang string"
    )
    got = {
        (r["qid"], r["facet"]): r["n_docs"]
        for r in facet_counts(matched, docs, "lang").collect()
    }
    assert got == {(1, "en"): 1, (1, "de"): 1, (2, "en"): 1}


def test_repeated_ngram_stats_planted_span(spark):
    boiler = " ".join(f"w{i}" for i in range(8))  # an exact 8-token span
    docs = spark.createDataFrame(
        [
            (0, f"alpha beta {boiler} gamma"),
            (1, f"delta {boiler} epsilon zeta"),
            (2, "unique tokens only here nothing repeats at all"),
            (3, "short doc"),  # < 8 tokens -> no ngrams
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["n_tokens"], r["n_dup_ngrams"], r["n_dup_tokens"])
        for r in repeated_ngram_stats(docs, n=8, min_count=2).collect()
    }
    # only the planted span's exact window repeats across docs 0 and 1:
    # one duplicated start each, covering exactly its 8 tokens
    assert out[0] == (11, 1, 8)
    assert out[1] == (11, 1, 8)
    assert out[2] == (8, 0, 0)
    assert out[3] == (2, 0, 0)


def test_repeated_ngram_stats_overlapping_spans_union(spark):
    # a 10-token span shared by two docs -> 3 duplicated 8-gram starts per
    # doc whose windows overlap; covered tokens = union = 10, not 3*8
    span = " ".join(f"s{i}" for i in range(10))
    docs = spark.createDataFrame(
        [(0, f"{span} tailzero"), (1, f"headone {span}")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["n_tokens"], r["n_dup_ngrams"], r["n_dup_tokens"])
        for r in repeated_ngram_stats(docs, n=8, min_count=2).collect()
    }
    assert out[0] == (11, 3, 10)
    assert out[1] == (11, 3, 10)


def test_repeated_ngram_stats_within_doc_repetition(spark):
    # min_count counts ALL occurrences: a doc repeating its own 8-gram is
    # flagged even with no cross-doc duplicate
    span = " ".join(f"r{i}" for i in range(8))
    docs = spark.createDataFrame(
        [(0, f"{span} mid {span}")], "doc_id long, text string"
    )
    (row,) = repeated_ngram_stats(docs, n=8, min_count=2).collect()
    assert row["n_tokens"] == 17
    assert row["n_dup_ngrams"] == 2
    assert row["n_dup_tokens"] == 16


def test_ngram_separator_prevents_boundary_aliasing(spark):
    # "ab c" vs "a bc" must NOT collide: the \x01 joiner keeps token
    # boundaries in the hashed window
    docs = spark.createDataFrame(
        [
            (0, "ab c x1 x2 x3 x4 x5 x6"),
            (1, "a bc x1 x2 x3 x4 x5 x6"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["n_dup_ngrams"]
        for r in repeated_ngram_stats(docs, n=8, min_count=2).collect()
    }
    assert out == {0: 0, 1: 0}
