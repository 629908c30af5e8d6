"""Web-ingest operators: URL normalization/dedup, connected-components dup
clustering, and sequential-dependence proximity counts — each checked
against an independent pure-Python oracle (no DuckDB here; the DuckDB gate
runs in test_parity.py via parity_web)."""

from __future__ import annotations

import random
import re

import pytest
from pyspark.sql import functions as F

from knowledgeir_spark.functions.url import (
    canonical_url,
    host_of,
    host_stats,
    url_dedup,
)
from knowledgeir_spark.operators.graph import connected_components, dup_clusters
from knowledgeir_spark.operators.proximity import sdm_bigram_counts


# ---------------------------------------------------------------------------
# URL normalization


MESSY = [
    # (raw, canonical, host)
    ("HTTP://WWW.Example.COM/A/B?q=1#frag", "https://example.com/a/b", "example.com"),
    ("https://example.com/a/b/", "https://example.com/a/b", "example.com"),
    ("http://example.com:8080/x", "https://example.com:8080/x", "example.com"),
    ("ftp://www.foo.org/", "https://foo.org", "foo.org"),
    ("https://www.www.foo.org/p", "https://www.foo.org/p", "www.foo.org"),
    ("example.com/path?utm=1", "https://example.com/path", "example.com"),
    ("https://host.net", "https://host.net", "host.net"),
    ("https://host.net/#", "https://host.net", "host.net"),
]


def test_url_normalization_spec(spark):
    df = spark.createDataFrame([(u,) for u, _, _ in MESSY], "url string")
    got = df.select(
        canonical_url(F.col("url")).alias("c"), host_of(F.col("url")).alias("h")
    ).collect()
    for (raw, want_c, want_h), row in zip(MESSY, got):
        assert row["c"] == want_c, raw
        assert row["h"] == want_h, raw


def test_url_dedup_and_host_stats(spark):
    rows = [
        (1, "http://www.a.com/x", "en", 10),
        (2, "https://a.com/x/", "en", 20),
        (3, "https://A.COM/x#top", "de", 30),
        (4, "https://a.com/y", "en", 5),
        (5, "http://b.org/x?s=1", "en", 7),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, lang string, n_chars long")
    dd = {r["canonical"]: r for r in url_dedup(df).collect()}
    assert dd["https://a.com/x"]["keep_doc_id"] == 1
    assert dd["https://a.com/x"]["n_dups"] == 2
    assert dd["https://a.com/y"]["n_dups"] == 0
    hs = {r["host"]: r for r in host_stats(df).collect()}
    assert hs["a.com"]["n_docs"] == 4
    assert hs["a.com"]["n_canonical"] == 2
    assert hs["a.com"]["n_langs"] == 2
    assert hs["a.com"]["total_chars"] == 65
    assert hs["b.org"]["n_docs"] == 1


# ---------------------------------------------------------------------------
# connected components vs union-find oracle


def _uf_components(edges):
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent[find(a)] = find(b)
    return {n: min(m for m in parent if find(m) == find(n)) for n in parent}


@pytest.mark.parametrize("seed,n_nodes,n_edges", [(7, 40, 25), (11, 60, 80)])
def test_connected_components_matches_union_find(spark, seed, n_nodes, n_edges):
    rng = random.Random(seed)
    edges = [
        (rng.randrange(n_nodes), rng.randrange(n_nodes)) for _ in range(n_edges)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    want = _uf_components(edges)
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["cluster_id"] for r in connected_components(df).collect()}
    assert got == want


def test_dup_clusters_chain_transitivity(spark):
    # A-B, B-C, D-E: {A,B,C} one cluster even though A-C never paired
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "doc_a long, doc_b long"
    )
    got = {r["doc_id"]: (r["cluster_id"], r["cluster_size"]) for r in dup_clusters(pairs).collect()}
    assert got == {
        1: (1, 3), 2: (1, 3), 3: (1, 3),
        10: (10, 2), 11: (10, 2),
    }


# ---------------------------------------------------------------------------
# SDM proximity vs a brute-force python oracle


def _sdm_oracle(doc_tokens, bigrams, window=8):
    n_ordered = n_uw = 0
    for a, b in bigrams:
        pa = [i for i, t in enumerate(doc_tokens) if t == a]
        pb = [i for i, t in enumerate(doc_tokens) if t == b]
        for i in pa:
            for j in pb:
                if i != j and abs(j - i) <= window - 1:
                    n_uw += 1
                    if j == i + 1:
                        n_ordered += 1
    return n_ordered, n_uw


def test_sdm_bigram_counts_hand_and_oracle(spark):
    texts = {
        100: "spark query engine, spark  query! nothing here spark end query",
        101: "query spark",  # reversed order: unordered hit, no ordered hit
        102: "spark alone",
        103: "spark a b c d e f g query",  # gap 8 > window-1 -> no hit
    }
    docs = spark.createDataFrame(
        [(k, v) for k, v in texts.items()], "doc_id long, text string"
    )
    queries = spark.createDataFrame(
        [(1, "spark", 0), (1, "query", 1)], "qid int, term string, pos int"
    )
    got = {
        r["doc_id"]: (r["n_ordered"], r["n_uw"])
        for r in sdm_bigram_counts(docs, queries, window=8).collect()
    }
    for doc_id, text in texts.items():
        toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
        want = _sdm_oracle(toks, [("spark", "query")])
        if want[1] == 0:
            assert doc_id not in got
        else:
            assert got[doc_id] == want, (doc_id, got.get(doc_id), want)
    # hand-checked: doc 100 has ordered pairs at (0,1) and (3,4)
    assert got[100][0] == 2
    assert got[101] == (0, 1)
    assert 103 not in got


def test_sdm_duplicate_term_bigram_is_directional(spark):
    # a == b: each unordered pair counts twice by spec
    docs = spark.createDataFrame([(1, "join join join")], "doc_id long, text string")
    queries = spark.createDataFrame(
        [(9, "join", 0), (9, "join", 1)], "qid int, term string, pos int"
    )
    row = sdm_bigram_counts(docs, queries, window=8).collect()[0]
    # positions {1,2,3}: directional pairs (i,j) i!=j -> 6; ordered j=i+1 -> 2
    assert (row["n_ordered"], row["n_uw"]) == (2, 6)
