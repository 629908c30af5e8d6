"""Tokenizer spec: oracle (pure python) == Spark built-in exprs == pandas UDF."""

from __future__ import annotations

from pyspark.sql import functions as F

from knowledgeir_spark.functions.text import (
    doc_terms,
    doc_terms_builtin,
    tokenize_expr,
    query_terms_expr,
)
from knowledgeir_spark.oracle.tokenizer import (
    doc_lm,
    tokenize_doc,
    tokenize_query,
)

CASES = [
    "The quick brown fox, jumped over the lazy dog!",
    "a/b testing is THE thing -- really?  yes/no",
    "",
    "   ",
    "123 456 the a an of",
    "hyphen-ated under_scored dotted.words",
    "UPPER lower MiXeD",
]


def test_oracle_tokenizer_basics():
    assert tokenize_doc("The quick fox!") == ["quick", "fox"]
    assert tokenize_doc("a/b c") == ["a/b", "c"]  # '/' kept (nlp.py:11)
    assert tokenize_doc("") == []
    assert tokenize_query("The Quick fox!") == ["the", "quick", "fox!"]  # raw split
    assert doc_lm("fox fox dog") == {"fox": 2, "dog": 1}


def test_spark_expr_matches_oracle(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(CASES)], "id int, text string")
    got = {
        r["id"]: r["toks"]
        for r in df.select("id", tokenize_expr(F.col("text")).alias("toks")).collect()
    }
    for i, t in enumerate(CASES):
        assert got[i] == tokenize_doc(t), f"case {i}: {t!r}"


def test_query_expr_matches_oracle(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(CASES)], "id int, q string")
    got = {
        r["id"]: r["toks"]
        for r in df.select("id", query_terms_expr(F.col("q")).alias("toks")).collect()
    }
    for i, t in enumerate(CASES):
        assert got[i] == tokenize_query(t), f"case {i}: {t!r}"


def test_doc_terms_udf_equals_builtin_and_oracle(spark, webpages_pdf):
    df = spark.createDataFrame(webpages_pdf[["text"]].reset_index().rename(
        columns={"index": "doc_id"}))
    a = {(r["doc_id"], r["term"]): (r["tf"], r["doc_len"])
         for r in doc_terms(df).collect()}
    b = {(r["doc_id"], r["term"]): (r["tf"], r["doc_len"])
         for r in doc_terms_builtin(df).collect()}
    assert a == b
    # spot-check against oracle on 20 docs
    for i in range(20):
        lm = doc_lm(webpages_pdf["text"].iloc[i])
        dl = sum(lm.values())
        for term, tf in lm.items():
            assert a[(i, term)] == (tf, dl)
