"""Facet store: dense doc→attribute sidecar for serving-time aggregations.

The serving analogue of operators/facets.facet_counts (ES `aggs`): count
how a query's FULL match set distributes over a categorical document
attribute, alongside the ranked top-k.  The inverted index keeps no doc
attributes, so — like the docstore and positions store — this is an
independent optional sidecar beside the posting stages (does not touch the
build fingerprint or lineage):

    <index_dir>/facets/<col>/part-*.parquet     (doc_id, code)
    <index_dir>/facets/<col>/_facet.json        {"values": [...]}

Values are dictionary-encoded at write time (code = index into the sorted
distinct value list); the reader materializes ONE dense int32 array
indexed by doc_id (engine doc_ids are dense by construction), so per-query
faceting is `np.bincount(codes[matched_ids])` — a vectorized pass whose
cost is |match set|, independent of corpus size, over an array costing
4 bytes/doc (8 MB at 2M docs; at 10^12 docs the array shards with the
index: each serving shard holds its own doc range's slice).

Scope: CATEGORICAL facets (language, source, TLD, crawl label) — the
distinct-value list is collected and must stay driver-bounded
(max_cardinality guard).  High-cardinality attributes (full host, URL)
belong to the distributed operator path (operators/facets.facet_counts),
which never collects values.

No reference counterpart; engine addition for the serving surface.
"""

from __future__ import annotations

import json
import os

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_facet_store(
    docs: DataFrame,
    index_dir: str,
    facet_cols: list[str],
    id_col: str = "doc_id",
    max_cardinality: int = 100_000,
) -> str:
    """Write the per-column (doc_id, code) stores; returns the facets root.

    The distinct-value collect is bounded by `max_cardinality` — exceeding
    it raises instead of silently shipping an unbounded list through the
    driver (use the distributed facet operator for such attributes).
    """
    root = os.path.join(index_dir, "facets")
    for col in facet_cols:
        # NULL facet values are excluded everywhere (value list, code join,
        # counts) — a missing attribute is not a facet bucket, and the
        # distributed operator (operators/facets.facet_counts) applies the
        # same rule so the two facet paths agree.
        vals = [
            r["v"]
            for r in docs.select(F.col(col).cast("string").alias("v"))
            .where(F.col("v").isNotNull())
            .distinct()
            .orderBy("v")
            .limit(max_cardinality + 1)
            .collect()
        ]
        if len(vals) > max_cardinality:
            raise ValueError(
                f"facet '{col}' exceeds max_cardinality={max_cardinality}; "
                "use operators.facets.facet_counts for high-cardinality "
                "attributes"
            )
        codes = docs.sparkSession.createDataFrame(
            [(v, i) for i, v in enumerate(vals)], f"{col}_v string, code int"
        )
        path = os.path.join(root, col)
        (
            docs.select(
                F.col(id_col).cast("long").alias("doc_id"),
                F.col(col).cast("string").alias(f"{col}_v"),
            )
            .join(F.broadcast(codes), f"{col}_v")
            .select("doc_id", "code")
            .write.mode("overwrite")
            .parquet(path)
        )
        with open(os.path.join(path, "_facet.json"), "w") as f:
            json.dump({"values": vals}, f)
    return root


class FacetStore:
    """Reader side: dense code arrays, loaded once per (store, column)."""

    def __init__(self, index_dir: str):
        self.root = os.path.join(index_dir, "facets")
        self._arrays: dict[str, tuple[np.ndarray, list[str]]] = {}

    def available(self) -> list[str]:
        if not os.path.isdir(self.root):
            return []
        return sorted(
            d for d in os.listdir(self.root)
            if os.path.isdir(os.path.join(self.root, d))
        )

    def facet(self, col: str) -> tuple[np.ndarray, list[str]]:
        """(codes array indexed by doc_id — -1 where absent, value list)."""
        if col in self._arrays:
            return self._arrays[col]
        import pyarrow.dataset as ds

        path = os.path.join(self.root, col)
        with open(os.path.join(path, "_facet.json")) as f:
            values = json.load(f)["values"]
        tbl = ds.dataset(path, format="parquet").to_table(
            columns=["doc_id", "code"]
        )
        ids = tbl["doc_id"].to_numpy()
        codes = tbl["code"].to_numpy()
        arr = np.full(int(ids.max()) + 1 if len(ids) else 0, -1, dtype=np.int32)
        arr[ids] = codes
        self._arrays[col] = (arr, values)
        return arr, values

    def counts(self, col: str, doc_ids: np.ndarray) -> list[tuple[str, int]]:
        """[(value, n_docs)] over the given UNIQUE doc ids, zero rows omitted."""
        arr, values = self.facet(col)
        in_range = doc_ids[doc_ids < len(arr)]
        codes = arr[in_range]
        codes = codes[codes >= 0]
        binc = np.bincount(codes, minlength=len(values))
        return [(values[i], int(c)) for i, c in enumerate(binc) if c > 0]
