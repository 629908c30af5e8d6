"""PForDelta codec: round-trips, size advantage, and a pfor-coded index that
stays rank-identical to the oracle."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from knowledgeir_spark.index.codec import (
    pfor_decode,
    pfor_encode,
    varint_encode,
)


@settings(max_examples=150, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**50), max_size=200))
def test_pfor_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert pfor_decode(pfor_encode(arr), len(vals)).tolist() == vals


def test_pfor_beats_varint_on_dense_gaps():
    rng = np.random.default_rng(0)
    gaps = rng.integers(1, 4, 128).astype(np.uint64)  # head-term delta stream
    assert len(pfor_encode(gaps)) < len(varint_encode(gaps)) / 2


def test_pfor_index_rank_identical(spark, webpages_pdf, queries_pdf, tmp_path):
    from knowledgeir_spark.index.build import IndexConfig, build_index
    from knowledgeir_spark.index.query import IndexReader
    from knowledgeir_spark.oracle.index import OracleIndex

    pdf = webpages_pdf.reset_index().rename(columns={"index": "doc_id"}).iloc[:200]
    docs = spark.createDataFrame(pdf[["doc_id", "text"]])
    idx = str(tmp_path / "idx_pfor")
    cfg = IndexConfig(block_size=16, salt_range=64, n_buckets=4, codec="pfor")
    build_index(spark, docs, idx, cfg, input_token="pfor200")
    reader = IndexReader(spark, idx)
    assert reader.codec == "pfor"
    oracle = OracleIndex(list(zip(pdf["doc_id"], pdf["text"])))
    queries = [(r.qid, r.query) for r in queries_pdf.iloc[:8].itertuples()]
    for merge_fn in (
        lambda qs: [(r["qid"], r["doc_id"], r["rank"])
                    for r in reader.search(qs, k=15).collect()],
        lambda qs: [(q, d, r) for q, d, s, r in reader.search_local(qs, k=15)],
    ):
        got: dict[str, list] = {}
        for qid, doc_id, rank in merge_fn(queries):
            got.setdefault(qid, []).append((rank, doc_id))
        for qid, qtext in queries:
            expected = [d for d, _ in oracle.topk(qtext, k=15)]
            assert [d for _, d in sorted(got.get(qid, []))] == expected, qid
