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


def test_vectorized_builder_byte_identical_to_per_block(spark, webpages_pdf):
    """The whole-partition vectorized varint encoder must produce
    byte-identical block rows to the per-block reference path (same order,
    same payloads, same stats) — it is a pure hot-loop rewrite."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from knowledgeir_spark.functions.text import doc_terms
    from knowledgeir_spark.index.build import _make_block_builder
    from knowledgeir_spark.index.codec import encode_block

    pdf_src = webpages_pdf.reset_index().rename(columns={"index": "doc_id"})
    docs = spark.createDataFrame(pdf_src[["doc_id", "text"]])
    pdf = (
        doc_terms(docs)
        .withColumn("salt", (F.col("doc_id") / 64).cast("long"))
        .withColumn("bucket", F.lit(3))
        .orderBy("term", "salt", "doc_id")
        .toPandas()
    )
    fast = pd.concat(list(_make_block_builder(16, "varint")(iter([pdf]))))
    rows = []
    for (term, salt, bucket), g in pdf.groupby(
        ["term", "salt", "bucket"], sort=False
    ):
        ids = g["doc_id"].to_numpy(np.int64).astype(np.uint64)
        tfs = g["tf"].to_numpy(np.int64).astype(np.uint64)
        dls = g["doc_len"].to_numpy(np.int64).astype(np.uint64)
        for bi, start in enumerate(range(0, len(ids), 16)):
            blk = encode_block(
                ids[start:start + 16], tfs[start:start + 16],
                dls[start:start + 16],
            )
            blk.update(term=term, salt=int(salt), bucket=3, block_id=bi,
                       sum_tf=int(tfs[start:start + 16].sum()))
            rows.append(blk)
    slow = pd.DataFrame(rows)[list(fast.columns)]
    assert len(fast) == len(slow) > 50
    for c in fast.columns:
        a, b = fast[c].tolist(), slow[c].tolist()
        if c in ("doc_id_deltas", "tfs", "doc_lens"):
            a, b = [bytes(x) for x in a], [bytes(x) for x in b]
        assert a == b, c


def test_vectorized_builder_byte_identical_under_impact_order(spark, webpages_pdf):
    """Impact reorder feeds BOTH encoder paths the same permuted rows, so
    the vectorized varint path must stay byte-identical to the per-block
    reference path under block_order='impact' too."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from knowledgeir_spark.functions.text import doc_terms
    from knowledgeir_spark.index.build import _impact_reorder, _make_block_builder
    from knowledgeir_spark.index.codec import encode_block

    pdf_src = webpages_pdf.reset_index().rename(columns={"index": "doc_id"})
    docs = spark.createDataFrame(pdf_src[["doc_id", "text"]])
    pdf = (
        doc_terms(docs)
        .withColumn("salt", (F.col("doc_id") / 64).cast("long"))
        .withColumn("bucket", F.lit(3))
        .orderBy("term", "salt", "doc_id")
        .toPandas()
    )
    fast = pd.concat(
        list(_make_block_builder(16, "varint", "impact")(iter([pdf])))
    )
    ref = _impact_reorder(pdf, 16)
    rows = []
    for (term, salt, bucket), g in ref.groupby(
        ["term", "salt", "bucket"], sort=False
    ):
        ids = g["doc_id"].to_numpy(np.int64).astype(np.uint64)
        tfs = g["tf"].to_numpy(np.int64).astype(np.uint64)
        dls = g["doc_len"].to_numpy(np.int64).astype(np.uint64)
        for bi, start in enumerate(range(0, len(ids), 16)):
            blk = encode_block(
                ids[start:start + 16], tfs[start:start + 16],
                dls[start:start + 16],
            )
            blk.update(term=term, salt=int(salt), bucket=int(bucket),
                       block_id=bi, sum_tf=int(tfs[start:start + 16].sum()))
            rows.append(blk)
    slow = pd.DataFrame(rows)[list(fast.columns)]
    assert len(fast) == len(slow)
    for c in fast.columns:
        assert list(fast[c]) == list(slow[c]), c
    # every block's ids ascend (delta-codable) and per-group max_tf declines
    grp = slow.groupby(["term", "salt"])["max_tf"]
    assert (grp.apply(lambda s: (s.to_numpy()[:-1] >= s.to_numpy()[1:]).all())).all()


def test_arrow_builder_byte_identical_to_pandas(spark, webpages_pdf):
    """The mapInArrow block builder (round-6 hot-path rewrite for the
    default varint/docid layout) must produce byte-identical block rows to
    the pandas builder, including across carry-spanning batch boundaries."""
    import numpy as np
    import pyarrow as pa
    from pyspark.sql import functions as F

    from knowledgeir_spark.functions.text import doc_terms
    from knowledgeir_spark.index.build import (
        _make_block_builder,
        _make_block_builder_arrow,
    )

    pdf_src = webpages_pdf.reset_index().rename(columns={"index": "doc_id"})
    docs = spark.createDataFrame(pdf_src[["doc_id", "text"]])
    pdf = (
        doc_terms(docs)
        .withColumn("salt", (F.col("doc_id") / 64).cast("long"))
        .withColumn("bucket", F.lit(3).cast("int"))
        .orderBy("term", "salt", "doc_id")
        .toPandas()
    )
    import pandas as pd

    ref = pd.concat(list(_make_block_builder(16, "varint")(iter([pdf]))))
    # feed the arrow builder the same rows split into small batches so the
    # carry path (group spanning a batch boundary) is exercised
    tbl = pa.Table.from_pandas(pdf, preserve_index=False)
    batches = tbl.to_batches(max_chunksize=257)
    got_batches = list(_make_block_builder_arrow(16)(iter(batches)))
    got = pa.Table.from_batches(got_batches).to_pandas()
    assert list(got.columns) == list(ref.columns)
    assert len(got) == len(ref) > 50
    for c in ref.columns:
        a, b = got[c].tolist(), ref[c].tolist()
        if c in ("doc_id_deltas", "tfs", "doc_lens"):
            a, b = [bytes(x) for x in a], [bytes(x) for x in b]
        assert a == b, c
