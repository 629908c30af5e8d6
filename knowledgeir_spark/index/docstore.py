"""Docstore: bucket-partitioned forward index for serving-time snippets.

The inverted index alone cannot render result snippets (postings keep no
positions or text); real engines pair it with a forward store.  This is
an independent, optional stage beside the index layout — it does NOT
touch the build fingerprint or lineage of the posting stages:

    <index_dir>/docstore/bucket=<b>/*.parquet   (doc_id, text)

with bucket = doc_id % n_buckets, so a candidate list of k docs per
query touches at most k bucket directories (partition pruning at the
pyarrow scan, the same trick the postings reader uses for term buckets).

``DocStore.snippets`` then applies EXACTLY the operator spec
(operators/snippet.best_snippets: 1-based positions over non-empty
simple tokens, window starts at a query-term match, maximize match
count, earliest tie, space-joined token slice) on the driver for the
bounded candidate set — asserted equal to the distributed operator in
tests.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_TOKEN_RE = re.compile(r"[a-z0-9]+")


def write_docstore(
    docs: DataFrame,
    index_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 64,
) -> str:
    """Writes the bucket-partitioned (doc_id, text) store; returns its path."""
    path = os.path.join(index_dir, "docstore")
    (
        docs.select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.col(text_col).alias("text"),
            (F.col(id_col).cast("long") % n_buckets).alias("bucket"),
        )
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(path)
    )
    import json

    with open(os.path.join(path, "_docstore.json"), "w") as f:
        json.dump({"n_buckets": n_buckets}, f)
    return path


def best_window(tokens: list[str], terms: set[str], window: int):
    """(start_pos, n_matches, snippet) per the operator spec, or None if no
    query term occurs.  Positions are 1-based."""
    matches = [i + 1 for i, t in enumerate(tokens) if t in terms]
    if not matches:
        return None
    best = None
    import bisect

    for p in matches:
        hi = bisect.bisect_left(matches, p + window)
        lo = bisect.bisect_left(matches, p)
        n = hi - lo
        if best is None or n > best[1]:
            best = (p, n)
    p, n = best
    return p, n, " ".join(tokens[p - 1 : p - 1 + window])


class DocStore:
    """Pruned reader over the docstore partition layout."""

    def __init__(self, index_dir: str, n_buckets: int | None = None):
        self.path = os.path.join(index_dir, "docstore")
        if n_buckets is None:
            # the store is self-describing: pruning with a mismatched
            # bucket count would silently read the wrong partitions
            import json

            with open(os.path.join(self.path, "_docstore.json")) as f:
                n_buckets = int(json.load(f)["n_buckets"])
        self.n_buckets = n_buckets
        self._ds = None

    def _dataset(self):
        import pyarrow.dataset as ds

        if self._ds is None:
            self._ds = ds.dataset(self.path, partitioning="hive")
        return self._ds

    def texts_for(self, doc_ids: list[int]) -> dict[int, str]:
        import pyarrow.dataset as ds

        ids = sorted(set(int(d) for d in doc_ids))
        if not ids:
            return {}
        buckets = sorted({d % self.n_buckets for d in ids})
        filt = ds.field("bucket").isin(buckets) & ds.field("doc_id").isin(ids)
        tbl = self._dataset().to_table(filter=filt, columns=["doc_id", "text"])
        return dict(zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist()))

    def snippets(
        self,
        queries: list[tuple[str, str]],
        results: list[tuple[str, int, float, int]],
        window: int = 12,
    ) -> list[tuple[str, int, int, int, str]]:
        """(qid, doc_id, start_pos, n_matches, snippet) for each result row
        whose doc contains at least one query term — the serving-side
        companion to IndexReader.search_local output."""
        terms_by_qid = {
            str(qid): set(_TOKEN_RE.findall(qtext.lower()))
            for qid, qtext in queries
        }
        texts = self.texts_for([doc_id for _, doc_id, _, _ in results])
        out: list[tuple[str, int, int, int, str]] = []
        for qid, doc_id, _score, _rank in results:
            text = texts.get(int(doc_id))
            if text is None:
                continue
            hit = best_window(
                _TOKEN_RE.findall(text.lower()),
                terms_by_qid.get(str(qid), set()),
                window,
            )
            if hit is not None:
                out.append((str(qid), int(doc_id), hit[0], hit[1], hit[2]))
        return out
