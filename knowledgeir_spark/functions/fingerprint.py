"""Document fingerprinting: rolling-hash k-grams + winnowing (MOSS-style).

Arrow-vectorized mapInPandas op: per doc, compute polynomial rolling hashes
of char k-grams over uint64 (natural 2^64 wraparound), then winnowing — the
min hash of each sliding window of w consecutive k-gram hashes (rightmost
min), deduplicated.  Two docs sharing text spans >= w+k-1 chars are
guaranteed to share a fingerprint (the winnowing guarantee), which makes the
fingerprint table joinable for plagiarism/near-dup span detection at corpus
scale: explode -> groupBy(fingerprint) -> docs sharing fingerprints.

All numpy sliding-window ops; no per-char Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

K_GRAM = 8
WINDOW = 4
_BASE = np.uint64(1000003)


def _rolling_hashes(data: bytes, k: int) -> np.ndarray:
    """uint64 polynomial hashes of all k-grams (vectorized)."""
    arr = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
    if len(arr) < k:
        return np.zeros(0, dtype=np.uint64)
    with np.errstate(over="ignore"):
        windows = np.lib.stride_tricks.sliding_window_view(arr, k)
        powers = np.empty(k, dtype=np.uint64)
        powers[k - 1] = np.uint64(1)
        for i in range(k - 2, -1, -1):
            powers[i] = powers[i + 1] * _BASE
        return (windows * powers).sum(axis=1, dtype=np.uint64)


def winnow(hashes: np.ndarray, w: int) -> np.ndarray:
    """Winnowing fingerprint selection: rightmost min per window of w."""
    if len(hashes) == 0:
        return hashes
    if len(hashes) <= w:
        return np.unique(hashes.min(keepdims=True))
    wins = np.lib.stride_tricks.sliding_window_view(hashes, w)
    # rightmost min: reverse window, argmin picks first occurrence of min
    rev = wins[:, ::-1]
    idx = (w - 1) - rev.argmin(axis=1)
    mins = wins[np.arange(len(wins)), idx]
    return np.unique(mins)


def fingerprints(text: str, k: int = K_GRAM, w: int = WINDOW) -> np.ndarray:
    return winnow(_rolling_hashes(text.encode("utf-8"), k), w)


def doc_fingerprints(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    k: int = K_GRAM, w: int = WINDOW,
) -> DataFrame:
    """(doc_id, fingerprint long) — long-form winnowed fingerprints."""

    def batches(it):
        for pdf in it:
            ids, fps = [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                f = fingerprints(text or "", k, w)
                if len(f):
                    ids.append(np.full(len(f), doc_id, dtype=np.int64))
                    fps.append(f.astype(np.int64))  # reinterpret for spark long
            if ids:
                yield pd.DataFrame(
                    {"doc_id": np.concatenate(ids), "fingerprint": np.concatenate(fps)}
                )

    return docs.select(F.col(id_col), F.col(text_col)).mapInPandas(
        batches, "doc_id long, fingerprint long"
    )


def shared_fingerprint_pairs(fp: DataFrame, min_shared: int = 2) -> DataFrame:
    """Doc pairs sharing >= min_shared fingerprints (span-overlap signal)."""
    a = fp.withColumnRenamed("doc_id", "doc_a")
    b = fp.withColumnRenamed("doc_id", "doc_b")
    return (
        a.join(b, "fingerprint")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
