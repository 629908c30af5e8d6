"""Codec: varint/delta round-trip, incl. hypothesis property tests."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from knowledgeir_spark.index.codec import (
    decode_block,
    delta_decode,
    delta_encode,
    encode_block,
    varint_decode,
    varint_encode,
)


def test_varint_known_values():
    assert varint_encode(np.array([0], dtype=np.uint64)) == b"\x00"
    assert varint_encode(np.array([127], dtype=np.uint64)) == b"\x7f"
    assert varint_encode(np.array([128], dtype=np.uint64)) == b"\x80\x01"
    assert varint_encode(np.array([300], dtype=np.uint64)) == b"\xac\x02"
    assert varint_encode(np.array([], dtype=np.uint64)) == b""


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=500))
def test_varint_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert varint_decode(varint_encode(arr), len(vals)).tolist() == vals


@settings(max_examples=100, deadline=None)
@given(st.sets(st.integers(min_value=0, max_value=2**40), max_size=300))
def test_delta_roundtrip(ids):
    arr = np.array(sorted(ids), dtype=np.uint64)
    assert delta_decode(delta_encode(arr)).tolist() == sorted(ids)


def test_block_roundtrip():
    rng = np.random.default_rng(7)
    ids = np.sort(rng.choice(10**9, size=128, replace=False)).astype(np.uint64)
    tfs = rng.integers(1, 500, size=128).astype(np.uint64)
    dls = rng.integers(1, 3000, size=128).astype(np.uint64)
    row = encode_block(ids, tfs, dls)
    assert row["n_docs"] == 128
    assert row["first_doc_id"] == int(ids[0])
    assert row["max_doc_id"] == int(ids[-1])
    assert row["max_tf"] == int(tfs.max())
    assert row["min_doc_len"] == int(dls.min())
    d_ids, d_tfs, d_dls = decode_block(row)
    assert d_ids.tolist() == ids.tolist()
    assert d_tfs.tolist() == tfs.tolist()
    assert d_dls.tolist() == dls.tolist()


def test_truncated_stream_raises():
    import pytest

    data = varint_encode(np.array([1, 2, 3], dtype=np.uint64))
    with pytest.raises(ValueError):
        varint_decode(data, 4)
