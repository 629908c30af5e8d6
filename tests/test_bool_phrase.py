"""Boolean (AND / AND-NOT) and exact-phrase retrieval on the serving index.

Gate: conjunctive results == a pure-Python brute-force oracle (membership,
scores, and rank order under the engine key); AND of a single term is
rank-identical to the OR path; the block-skip intersection actually skips
head-term blocks when the rarest term bounds the candidate set; phrase
results == a tokenize-and-scan oracle; the distributed path equals the
serving path.  Reference scope: conjunctive/phrase retrieval is an engine
addition (the reference delegates retrieval to Indri/ES — setup.py:23);
scoring reuses the reference bm25 quirks (retrieval_model.py:205-291).
"""

from __future__ import annotations

import math

import pytest

from knowledgeir_spark.fixtures.webpages import gen_webpages
from knowledgeir_spark.index.build import IndexConfig, build_index
from knowledgeir_spark.index.docstore import write_docstore
from knowledgeir_spark.index.query import IndexReader
from knowledgeir_spark.oracle.tokenizer import tokenize_query, tokenize_simple

RARE = "xylophonezebra"


@pytest.fixture(scope="module")
def bool_index(spark, tmp_path_factory):
    idx_dir = str(tmp_path_factory.mktemp("bool_index"))
    pdf = (
        gen_webpages(n_docs=500, with_html=False)
        .reset_index()
        .rename(columns={"index": "doc_id"})
    )
    # plant a RARE term in 3 docs far apart so conjunctive queries with it
    # bound the candidate set to 3 ids (the block-skip lever)
    for d in (7, 251, 493):
        pdf.loc[d, "text"] = pdf.loc[d, "text"] + f" {RARE}"
    docs = spark.createDataFrame(pdf[["doc_id", "text"]])
    cfg = IndexConfig(
        block_size=16, salt_range=64, n_buckets=8, tokenizer="simple"
    )
    build_index(spark, docs, idx_dir, cfg, input_token="bool500")
    write_docstore(spark.createDataFrame(pdf[["doc_id", "text"]]), idx_dir)
    toks = {
        int(r.doc_id): tokenize_simple(r.text) for r in pdf.itertuples()
    }
    return dict(idx_dir=idx_dir, toks=toks)


def _brute_bm25(toks: dict[int, list[str]], terms: list[str], doc: int):
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    from collections import Counter

    df = Counter(t for ts in toks.values() for t in set(ts))
    tl = toks[doc]
    dl = len(tl)
    s = 0.0
    for t in set(terms):
        tf = tl.count(t)
        ratio = max((n - df[t] + 0.5) / (df[t] + 0.5), 1.0)
        idf = max(math.log(ratio), 0.0)
        s += ratio * (tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))) * idf
    return math.log(max(s, 1.0))


def _brute_and(toks, terms, k=10, exclude=()):
    pos = [t for t in terms if t not in exclude]
    match = [
        d
        for d, ts in toks.items()
        if all(t in ts for t in pos) and not any(x in ts for x in exclude)
    ]
    scored = sorted(
        ((d, _brute_bm25(toks, pos, d)) for d in match),
        key=lambda x: (-math.floor(x[1] * 1e9), x[0]),
    )
    return scored[:k]


def test_and_matches_brute_force(spark, bool_index):
    r = IndexReader(spark, bool_index["idx_dir"])
    toks = bool_index["toks"]
    queries = [("1", "the data spark"), ("2", f"{RARE} the"), ("3", "nosuchterm the")]
    res = r.search_local(queries, k=10, mode="and")
    for qid, qtext in queries:
        exp = _brute_and(toks, tokenize_query(qtext))
        got = [(d, s) for (q, d, s, _rk) in res if q == qid]
        assert [d for d, _ in exp] == [d for d, _ in got], qid
        for (_, a), (_, b) in zip(exp, got):
            assert abs(a - b) < 1e-9


def test_and_of_single_term_equals_or(spark, bool_index):
    r = IndexReader(spark, bool_index["idx_dir"])
    q = [("1", "the")]
    a = r.search_local(q, k=10, mode="and")
    o = r.search_local(q, k=10, mode="or")
    assert [(d, rk) for (_, d, _, rk) in a] == [(d, rk) for (_, d, _, rk) in o]
    for (_, _, sa, _), (_, _, so, _) in zip(a, o):
        assert abs(sa - so) < 1e-9


def test_exclusion(spark, bool_index):
    r = IndexReader(spark, bool_index["idx_dir"])
    toks = bool_index["toks"]
    # exclude a mid-frequency term; positive terms common
    res = r.search_local(
        [("1", "the data")], k=10, mode="and", exclude={"1": [RARE]}
    )
    exp = _brute_and(toks, ["the", "data"], exclude=(RARE,))
    got = [(d, s) for (_, d, s, _rk) in res]
    assert [d for d, _ in exp] == [d for d, _ in got]
    with pytest.raises(ValueError):
        r.search_local([("1", "the")], k=5, mode="or", exclude={"1": ["x"]})


def test_block_skip_engages_on_rare_term(spark, bool_index):
    """With the rarest term bounding candidates to 3 docs, the head terms'
    blocks outside those 3 doc-id ranges must not be decoded."""
    r = IndexReader(spark, bool_index["idx_dir"])
    r.search_local([("1", f"{RARE} the data spark")], k=10, mode="and")
    st = r.last_query_stats()
    assert st["bool_candidates"] >= 1
    assert st["bool_blocks_decoded"] < st["bool_blocks_total"] * 0.5, st


def test_phrase_matches_scan_oracle(spark, bool_index):
    r = IndexReader(spark, bool_index["idx_dir"])
    toks = bool_index["toks"]
    queries = [("1", "the data"), ("2", "data the"), ("3", f"{RARE} nomatch")]
    res = r.search_phrase(queries, k=10)
    for qid, qtext in queries:
        pt = tokenize_simple(qtext)
        needle = " " + " ".join(pt) + " "
        match = [
            d for d, ts in toks.items() if needle in " " + " ".join(ts) + " "
        ]
        exp = sorted(
            ((d, _brute_bm25(toks, pt, d)) for d in match),
            key=lambda x: (-math.floor(x[1] * 1e9), x[0]),
        )[:10]
        got = [(d, s) for (q, d, s, _rk) in res if q == qid]
        assert [d for d, _ in exp] == [d for d, _ in got], qid
        for (_, a), (_, b) in zip(exp, got):
            assert abs(a - b) < 1e-9


def test_distributed_and_equals_local(spark, bool_index):
    r = IndexReader(spark, bool_index["idx_dir"])
    queries = [("1", "the data spark"), ("2", f"{RARE} the")]
    excl = {"2": ["data"]}
    local = r.search_local(queries, k=10, mode="and", exclude=excl)
    dist = r.search(queries, k=10, mode="and", exclude=excl).collect()
    d = sorted((row["qid"], row["doc_id"], round(row["score"], 9), row["rank"])
               for row in dist)
    l_ = sorted((q, d_, round(s, 9), rk) for q, d_, s, rk in local)
    assert d == l_


def test_phrase_positions_store(spark, bool_index):
    """The positional store path implements the same adjacency spec as the
    docstore path: identical results, and the store's arrays match a
    direct enumerate of the tokenized docs."""
    from knowledgeir_spark.index.positions import (
        PositionsStore,
        write_positions_store,
    )

    idx_dir = bool_index["idx_dir"]
    toks = bool_index["toks"]
    import pandas as pd

    docs = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": list(toks), "text": [" ".join(v) for v in toks.values()]}
        )
    )
    write_positions_store(docs, idx_dir)  # tokenizer/buckets from field_stats
    store = PositionsStore(idx_dir)
    assert store.tokenizer == "simple"
    # spot-check stored positions against enumerate()
    some = [d for d in (7, 251, 493) if d in toks]
    pos = store.positions_for(["the", RARE], some)
    for d in some:
        exp = [i for i, t in enumerate(toks[d]) if t == "the"]
        assert list(pos.get(("the", d), [])) == exp
        assert list(pos[(RARE, d)]) == [len(toks[d]) - 1]

    r = IndexReader(spark, idx_dir)
    queries = [("1", "the data"), ("2", "data the"), ("3", "the data spark")]
    via_pos = r.search_phrase(queries, k=10, verify="positions")
    via_doc = r.search_phrase(queries, k=10, verify="docstore")
    assert via_pos == via_doc
    # auto prefers the store once it exists
    assert r.search_phrase(queries, k=10) == via_pos


def test_phrase_repeated_term_adjacency(spark, bool_index):
    """'data data' must require two CONSECUTIVE occurrences, not just tf>=2
    — both verify paths against a direct scan."""
    r = IndexReader(spark, bool_index["idx_dir"])
    toks = bool_index["toks"]
    for verify in ("positions", "docstore"):
        got = {
            d
            for (_, d, _s, _rk) in r.search_phrase(
                [("1", "data data")], k=10_000, verify=verify
            )
        }
        exp_all = {
            d
            for d, ts in toks.items()
            if " data data " in " " + " ".join(ts) + " "
        }
        assert got == exp_all, verify


def test_phrase_spec_tokenizer_stopwords(spark, tmp_path):
    """A phrase with stopwords/punctuation on a 'spec'-tokenizer index must
    build its phase-1 conjunction from the DOC-TOKENIZED phrase: the raw
    whitespace tokens ('of', 'the') are not indexed (df=0) and would
    silently empty the result even though docs match the indexed stream."""
    idx_dir = str(tmp_path / "spec_idx")
    texts = {
        0: "The state of the art, method works",   # -> state art method works
        1: "state art is adjacent here",            # -> state art adjacent
        2: "state and also art",                    # -> state also art (no match)
        3: "method works without either term",
    }
    docs = spark.createDataFrame(
        [(d, t) for d, t in texts.items()], "doc_id long, text string"
    )
    cfg = IndexConfig(block_size=16, salt_range=16, n_buckets=2, tokenizer="spec")
    build_index(spark, docs, idx_dir, cfg, input_token="spec4")
    write_docstore(docs, idx_dir)
    r = IndexReader(spark, idx_dir)
    res = r.search_phrase([("1", "State of the art.")], k=10)
    assert {d for (_, d, _s, _rk) in res} == {0, 1}
    # positional store path agrees on the same spec
    from knowledgeir_spark.index.positions import write_positions_store

    write_positions_store(docs, idx_dir)
    via_pos = r.search_phrase(
        [("1", "State of the art.")], k=10, verify="positions"
    )
    assert via_pos == res


def test_last_query_stats_reset_between_modes(spark, bool_index):
    """An OR query after an AND query must not report stale bool_*
    counters: both stat dicts are cleared at the start of each
    search_local call."""
    r = IndexReader(spark, bool_index["idx_dir"])
    r.search_local([("1", f"the {RARE}")], k=5, mode="and")
    assert any(k.startswith("bool_") for k in r.last_query_stats())
    r.search_local([("1", "the data")], k=5)
    st = r.last_query_stats()
    assert not any(k.startswith("bool_") for k in st)


def test_phrase_nextword_store(spark, bool_index, tmp_path):
    """The partial nextword (head-head bigram) store must leave
    search_phrase results value-identical: a covered 2-token phrase is
    answered from the store without verification, longer phrases use the
    store only as a candidate restriction (round-6 optimization)."""
    import shutil

    import pandas as pd

    from knowledgeir_spark.index.docstore import DocStore
    from knowledgeir_spark.index.nextword import (
        NextwordStore,
        write_nextword_store,
    )

    idx = str(tmp_path / "nw_idx")
    shutil.copytree(bool_index["idx_dir"], idx)
    toks = bool_index["toks"]
    queries = [
        ("1", "the data"), ("2", "data the"), ("3", "the the"),
        ("4", "the data value"), ("5", f"{RARE} nomatch"),
    ]
    base = IndexReader(spark, idx).search_phrase(queries, k=10)

    texts = DocStore(idx).texts_for(sorted(toks.keys()))
    docs = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": sorted(texts), "text": [texts[d] for d in sorted(texts)]}
        )
    )
    write_nextword_store(docs, idx, head_min_df=5)
    r = IndexReader(spark, idx)
    nw = r._nextword_store()
    assert nw is not None and nw.covers("the", "data")
    assert not nw.covers(RARE, "the")  # rare term is below the head floor
    got = r.search_phrase(queries, k=10)
    assert got == base
    # the store's doc set is the exact adjacency set for a covered pair
    needle = " the data "
    want = sorted(
        d for d, ts in toks.items() if needle in " " + " ".join(ts) + " "
    )
    assert list(nw.doc_ids("the", "data")) == want


def test_phrase_nextword_chain_is_not_adjacency(spark, tmp_path):
    """Pairwise-adjacent pairs do NOT imply a consecutive phrase: the
    nextword restriction for 3+ token phrases must still verify. Doc 0 has
    'alpha beta' and 'beta gamma' adjacent but never 'alpha beta gamma'."""
    import pandas as pd

    from knowledgeir_spark.index.docstore import write_docstore
    from knowledgeir_spark.index.nextword import write_nextword_store

    idx = str(tmp_path / "chain_idx")
    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": [
                "alpha beta x beta gamma y alpha",
                "z alpha beta gamma z",
                "gamma beta alpha",
            ],
        }
    )
    docs = spark.createDataFrame(pdf)
    cfg = IndexConfig(block_size=16, salt_range=64, n_buckets=4,
                      tokenizer="simple")
    build_index(spark, docs, idx, cfg, input_token="chain3")
    write_docstore(docs, idx)
    write_nextword_store(docs, idx, head_min_df=1)
    r = IndexReader(spark, idx)
    nw = r._nextword_store()
    assert nw.covers("alpha", "beta") and nw.covers("beta", "gamma")
    res = r.search_phrase([("1", "alpha beta gamma"), ("2", "alpha beta")], k=5)
    assert [d for q, d, _s, _r in res if q == "1"] == [1]
    assert sorted(d for q, d, _s, _r in res if q == "2") == [0, 1]
