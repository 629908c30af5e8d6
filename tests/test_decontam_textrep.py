"""Decontamination + repetition-feature operators: planted-structure tests
with hand-computable expectations (the DuckDB parity rows cover the
full-corpus exact oracle; these pin the semantics)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def corpora(spark):
    train = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "one two three four five six seven eight nine"),
            (3, "totally unrelated training content about engines"),
        ],
        "doc_id long, text string",
    )
    evals = spark.createDataFrame(
        [
            # full copy of train doc 1 -> 100% overlap
            (101, "alpha beta gamma delta epsilon zeta eta theta"),
            # half-leaked: first 5 tokens shared (one 5-gram window of 5)
            (102, "one two three four five completely novel ending here"),
            # clean
            (103, "nothing here appears in the training corpus at all"),
        ],
        "doc_id long, text string",
    )
    return train, evals


def test_eval_overlap_fractions(spark, corpora):
    from knowledgeir_spark.operators.decontam import eval_overlap_fractions

    train, evals = corpora
    got = {
        r["doc_id"]: r
        for r in eval_overlap_fractions(train, evals, k=5).collect()
    }
    # doc 101: 8 tokens -> 4 distinct 5-grams, all in train
    assert got[101]["n_shingles"] == 4
    assert got[101]["n_overlap"] == 4
    assert got[101]["overlap_frac_e6"] == 1_000_000
    # doc 102: 9 tokens -> 5 5-grams, exactly one ("one..five") leaked
    assert got[102]["n_shingles"] == 5
    assert got[102]["n_overlap"] == 1
    assert got[102]["overlap_frac_e6"] == 200_000
    # doc 103: zero overlap
    assert got[103]["n_overlap"] == 0 and got[103]["overlap_frac_e6"] == 0


def test_contamination_pairs_and_df_guard(spark, corpora):
    from knowledgeir_spark.operators.decontam import contamination_pairs

    train, evals = corpora
    pairs = {
        (r["train_id"], r["eval_id"]): r["n_shared"]
        for r in contamination_pairs(train, evals, k=5).collect()
    }
    assert pairs == {(1, 101): 4, (2, 102): 1}
    # boilerplate guard: a shingle in every train doc is excluded
    boiler = "legal footer text all rights reserved"
    train_b = train.withColumn(
        "text", F.concat(F.col("text"), F.lit(" " + boiler))
    )
    evals_b = spark.createDataFrame(
        [(201, boiler + " plus unique trailer")], "doc_id long, text string"
    )
    assert contamination_pairs(
        train_b, evals_b, k=5, max_train_df=2
    ).count() == 0  # df=3 > 2 for every boiler shingle
    assert contamination_pairs(train_b, evals_b, k=5).count() == 3


def test_repetition_features_planted(spark):
    from knowledgeir_spark.operators.textrep import repetition_features

    docs = spark.createDataFrame(
        [
            # 8 tokens, "spam ham" repeated 4x: top 2-gram "spam ham" cnt 4
            (1, "spam ham spam ham spam ham spam ham"),
            (2, "all tokens here are fully distinct words"),
            (3, "line one\nline one\nline two"),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in repetition_features(docs).collect()}

    r1 = got[1]
    assert r1["n_tokens"] == 8 and r1["n_distinct_tokens"] == 2
    assert r1["dup_word_frac_e6"] == 750_000
    # text 35 chars; top 2-gram "spam ham" (8 chars) cnt 4 -> 32/35
    assert r1["top2gram_char_frac_e6"] == 914_285
    assert r1["top3gram_char_frac_e6"] > 0

    r2 = got[2]
    assert r2["dup_word_frac_e6"] == 0
    # every 2-gram unique: top covers exactly one 2-gram's chars
    assert 0 < r2["top2gram_char_frac_e6"] < 500_000

    r3 = got[3]
    assert r3["n_lines"] == 3
    # "line one" appears twice: 2/3 of lines, 16/24 of line chars
    assert r3["dup_line_frac_e6"] == 666_666
    assert r3["dup_line_char_frac_e6"] == 666_666

    r4 = got[4]
    assert r4["n_tokens"] == 0 and r4["dup_word_frac_e6"] == 0
    assert r4["n_lines"] == 0 and r4["top2gram_char_frac_e6"] == 0
