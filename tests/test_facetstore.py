"""Facet sidecar (index/facetstore) + serving facet counts.

The serving path (dense code array + id-only posting decode) must equal
the distributed operator (operators/facets.facet_counts) on the same
corpus — the same spec-equality discipline as docstore snippets and the
positional phrase path.  The DuckDB gate covers the same equality at
sf0.01 (parity:facet_counts_serving reuses facet_counts' oracle).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


def _mini_index(spark, tmp_path, docs):
    from knowledgeir_spark.index.build import IndexConfig, build_index

    idx = str(tmp_path / "idx")
    cfg = IndexConfig(block_size=8, salt_range=64, n_buckets=4, tokenizer="simple")
    build_index(spark, docs, idx, cfg, input_token="facet-test")
    return idx


def test_facet_store_roundtrip(spark, tmp_path):
    from knowledgeir_spark.index.facetstore import FacetStore, write_facet_store

    docs = spark.createDataFrame(
        [(0, "x", "en"), (1, "y", "de"), (2, "z", "en"), (3, "w", "fr")],
        "doc_id long, text string, lang string",
    )
    write_facet_store(docs, str(tmp_path), ["lang"])
    fs = FacetStore(str(tmp_path))
    assert fs.available() == ["lang"]
    arr, values = fs.facet("lang")
    assert values == ["de", "en", "fr"]
    assert [values[c] for c in arr] == ["en", "de", "en", "fr"]
    assert fs.counts("lang", np.array([0, 1, 2])) == [("de", 1), ("en", 2)]


def test_facet_store_cardinality_guard(spark, tmp_path):
    from knowledgeir_spark.index.facetstore import write_facet_store

    docs = spark.range(50).select(
        F.col("id").alias("doc_id"), F.col("id").cast("string").alias("attr")
    )
    with pytest.raises(ValueError, match="max_cardinality"):
        write_facet_store(docs, str(tmp_path), ["attr"], max_cardinality=10)


def test_serving_facets_equal_operator(spark, tmp_path):
    """facet_counts_local == operators/facets.facet_counts over the OR
    match set, on a corpus with multi-term matches and absent terms."""
    from knowledgeir_spark.functions.text import tokenize_simple_expr
    from knowledgeir_spark.index.facetstore import write_facet_store
    from knowledgeir_spark.index.query import IndexReader
    from knowledgeir_spark.operators.facets import facet_counts

    rows = [
        (i, f"alpha w{i} " + ("beta shared " if i % 3 == 0 else "gamma "),
         ["en", "de", "fr"][i % 3])
        for i in range(40)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    idx = _mini_index(spark, tmp_path, docs.select("doc_id", "text"))
    write_facet_store(docs, idx, ["lang"])
    reader = IndexReader(spark, idx)

    queries = [("1", "alpha"), ("2", "beta shared"), ("3", "zzmissing"),
               ("4", "gamma beta")]
    got = sorted(reader.facet_counts_local(queries, "lang"))

    qdf = spark.createDataFrame(
        [(q, t) for q, text in queries for t in text.split()],
        "qid string, term string",
    )
    matched = (
        docs.select("doc_id", F.explode(tokenize_simple_expr(F.col("text"))).alias("term"))
        .join(qdf, "term")
        .select("qid", "doc_id")
    )
    want = sorted(
        (r["qid"], r["facet"], r["n_docs"])
        for r in facet_counts(matched, docs, "lang").collect()
    )
    assert got == want
    assert any(q == "2" for q, _, _ in got)  # multi-term union actually fires
    assert not any(q == "3" for q, _, _ in got)  # absent term -> no rows


def test_sharded_facets_equal_monolith(spark, tmp_path):
    """ShardedReader.facet_counts_local (per-shard histograms, additive
    merge) must equal the monolithic reader's counts — each doc lives in
    exactly one shard, so the sum is exact, not approximate."""
    from knowledgeir_spark.index.facetstore import write_facet_store
    from knowledgeir_spark.index.query import IndexReader, ShardedReader

    rows = [
        (i, f"alpha w{i} " + ("beta " if i % 2 == 0 else "gamma "),
         ["en", "de", "fr"][i % 3])
        for i in range(30)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")

    mono_idx = _mini_index(spark, tmp_path / "mono", docs.select("doc_id", "text"))
    write_facet_store(docs, mono_idx, ["lang"])

    dirs = []
    for i, part in enumerate(
        [docs.filter("doc_id < 15"), docs.filter("doc_id >= 15")]
    ):
        d = _mini_index(spark, tmp_path / f"s{i}", part.select("doc_id", "text"))
        write_facet_store(part, d, ["lang"])
        dirs.append(d)

    queries = [("1", "alpha"), ("2", "beta gamma"), ("3", "zzmissing")]
    mono = sorted(IndexReader(spark, mono_idx).facet_counts_local(queries, "lang"))
    shard = sorted(ShardedReader(spark, dirs).facet_counts_local(queries, "lang"))
    assert shard == mono
    assert any(q == "1" for q, _, _ in mono)  # non-trivial match sets


def test_serving_and_facets_equal_operator(spark, tmp_path):
    """mode='and' == facet_counts over the CONJUNCTIVE match set, with an
    OOV-term query (empty conjunction) and a single-term query (AND==OR)."""
    from knowledgeir_spark.functions.text import tokenize_simple_expr
    from knowledgeir_spark.index.facetstore import write_facet_store
    from knowledgeir_spark.index.query import IndexReader
    from knowledgeir_spark.operators.facets import facet_counts

    rows = [
        (i, f"alpha w{i} " + ("beta shared " if i % 3 == 0 else "gamma "),
         ["en", "de", "fr"][i % 3])
        for i in range(40)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    idx = _mini_index(spark, tmp_path, docs.select("doc_id", "text"))
    write_facet_store(docs, idx, ["lang"])
    reader = IndexReader(spark, idx)

    queries = [("1", "alpha beta"), ("2", "beta shared"), ("3", "alpha zzmissing"),
               ("4", "gamma"), ("5", "beta gamma")]
    got = sorted(reader.facet_counts_local(queries, "lang", mode="and"))

    qdf = spark.createDataFrame(
        [(q, t) for q, text in queries for t in set(text.split())],
        "qid string, term string",
    )
    qn = qdf.groupBy("qid").count().withColumnRenamed("count", "n_terms")
    tok = docs.select(
        "doc_id", F.explode(tokenize_simple_expr(F.col("text"))).alias("term")
    ).distinct()
    matched = (
        tok.join(qdf, "term")
        .groupBy("qid", "doc_id")
        .agg(F.countDistinct("term").alias("k"))
        .join(qn, "qid")
        .filter(F.col("k") == F.col("n_terms"))
        .select("qid", "doc_id")
    )
    want = sorted(
        (r["qid"], r["facet"], r["n_docs"])
        for r in facet_counts(matched, docs, "lang").collect()
    )
    assert got == want
    assert not any(q == "3" for q, _, _ in got)   # OOV term -> empty AND set
    assert any(q == "1" for q, _, _ in got)       # true conjunction fires
    # AND of disjoint terms (beta docs are i%3==0, gamma docs the rest)
    assert not any(q == "5" for q, _, _ in got)

    # single-term query: AND == OR by definition
    one = [("9", "gamma")]
    assert reader.facet_counts_local(one, "lang", mode="and") == \
        reader.facet_counts_local(one, "lang", mode="or")


def test_sharded_and_facets_equal_monolith(spark, tmp_path):
    from knowledgeir_spark.index.facetstore import write_facet_store
    from knowledgeir_spark.index.query import IndexReader, ShardedReader

    rows = [
        (i, f"alpha w{i} " + ("beta " if i % 2 == 0 else "gamma "),
         ["en", "de", "fr"][i % 3])
        for i in range(30)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    mono_idx = _mini_index(spark, tmp_path / "mono", docs.select("doc_id", "text"))
    write_facet_store(docs, mono_idx, ["lang"])
    dirs = []
    for i, part in enumerate(
        [docs.filter("doc_id < 15"), docs.filter("doc_id >= 15")]
    ):
        d = _mini_index(spark, tmp_path / f"s{i}", part.select("doc_id", "text"))
        write_facet_store(part, d, ["lang"])
        dirs.append(d)
    queries = [("1", "alpha beta"), ("2", "gamma alpha"), ("3", "alpha zz")]
    mono = sorted(
        IndexReader(spark, mono_idx).facet_counts_local(queries, "lang", "and")
    )
    shard = sorted(
        ShardedReader(spark, dirs).facet_counts_local(queries, "lang", "and")
    )
    assert shard == mono and mono


def test_null_facet_values_agree(spark, tmp_path):
    """Docs with a NULL facet value are counted by NEITHER path: the
    sidecar excludes them from the value list and code join, and the
    distributed operator filters them before aggregation — so the two
    facet paths agree on corpora with missing attributes."""
    from knowledgeir_spark.functions.text import tokenize_simple_expr
    from knowledgeir_spark.index.facetstore import FacetStore, write_facet_store
    from knowledgeir_spark.index.query import IndexReader
    from knowledgeir_spark.operators.facets import facet_counts

    rows = [
        (i, f"alpha w{i}", ["en", None, "fr"][i % 3]) for i in range(30)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    idx = _mini_index(spark, tmp_path, docs.select("doc_id", "text"))
    write_facet_store(docs, idx, ["lang"])
    fs = FacetStore(idx)
    _, values = fs.facet("lang")
    assert values == ["en", "fr"]  # NULL consumed no code slot

    queries = [("1", "alpha")]
    got = sorted(IndexReader(spark, idx).facet_counts_local(queries, "lang"))
    matched = (
        docs.select(
            "doc_id", F.explode(tokenize_simple_expr(F.col("text"))).alias("term")
        )
        .filter(F.col("term") == "alpha")
        .select(F.lit("1").alias("qid"), "doc_id")
    )
    want = sorted(
        (r["qid"], r["facet"], r["n_docs"])
        for r in facet_counts(matched, docs, "lang").collect()
    )
    assert got == want
    assert {v for _, v, _ in got} == {"en", "fr"}
