"""Quality features, language-ID, token counting, fingerprinting."""

from __future__ import annotations

import pytest


def test_quality_features(spark):
    from knowledgeir_spark.functions.quality import quality_features, quality_flag

    rows = [
        (0, "The quick brown fox jumps over the lazy dog near the river bank today"),
        (1, "!!! ??? ### $$$ %%%"),
        (2, "aaa aaa aaa aaa aaa aaa aaa aaa aaa aaa aaa aaa"),
        (3, "1234 5678 9012 3456 7890 1234 5678 9012 3456 7890 111 222"),
    ]
    df = quality_features(spark.createDataFrame(rows, "doc_id long, text string"))
    out = {r["doc_id"]: r for r in df.withColumn("keep", quality_flag(df)).collect()}
    assert out[0]["keep"] is True
    assert out[1]["keep"] is False       # all punctuation
    assert out[1]["punct_ratio"] > 0.5
    assert out[2]["keep"] is False       # max_word_ratio = 1
    assert out[2]["max_word_ratio"] == pytest.approx(1.0)
    assert out[3]["keep"] is False       # digits
    assert out[3]["digit_ratio"] > 0.5
    assert out[0]["stopword_ratio"] == pytest.approx(4 / 14)


def test_token_counts(spark):
    from knowledgeir_spark.functions.quality import token_counts

    df = spark.createDataFrame(
        [(0, "hello world, it's 42 degrees!")], "doc_id long, text string"
    )
    r = token_counts(df).collect()[0]
    assert r["n_tokens_ws"] == 5
    # BPE-ish: "hello"," world",","," it","'","s"," 42"," degrees","!"
    assert r["n_tokens_bpe"] == 9


def test_langid(spark):
    from knowledgeir_spark.functions.langid import detect_language

    rows = [
        (0, "the cat is on the mat and it is happy"),
        (1, "der hund ist nicht auf der matte und das ist gut"),
        (2, "le chat est dans la maison et les enfants sont la"),
        (3, "zzz qqq xxx"),
    ]
    got = {
        r["doc_id"]: r["pred_lang"]
        for r in detect_language(spark.createDataFrame(rows, "doc_id long, text string")).collect()
    }
    assert got[0] == "en"
    assert got[1] == "de"
    assert got[2] == "fr"
    assert got[3] == "und"


def test_fingerprint_winnowing_guarantee(spark):
    from knowledgeir_spark.functions.fingerprint import (
        K_GRAM,
        WINDOW,
        doc_fingerprints,
        fingerprints,
        shared_fingerprint_pairs,
    )

    shared_span = "a very distinctive shared passage of text"
    assert len(shared_span) >= WINDOW + K_GRAM - 1
    rows = [
        (0, "prefix one " + shared_span + " suffix alpha"),
        (1, "totally other beginning " + shared_span + " and another end"),
        (2, "no overlap here at all with anything else whatsoever"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fp = doc_fingerprints(df)
    pairs = {(r["doc_a"], r["doc_b"]): r["n_shared"]
             for r in shared_fingerprint_pairs(fp, min_shared=1).collect()}
    assert (0, 1) in pairs  # winnowing guarantee: long shared span detected
    assert (0, 2) not in pairs and (1, 2) not in pairs
    # determinism + local impl agreement
    local = fingerprints(rows[0][1])
    spark_fps = sorted(
        r["fingerprint"] for r in fp.filter("doc_id = 0").collect()
    )
    assert sorted(x.astype("int64") for x in local.astype("int64")) == spark_fps
