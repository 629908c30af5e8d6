"""Index compaction: fold streaming deltas back into the base index.

Deltas produced by streaming/incremental.incremental_index share the base's
block layout, so queries COULD read base+deltas directly; compaction exists
to (a) restore the one-dir-per-bucket file layout, (b) merge fragmented
small blocks (a tail term touched by many deltas), and (c) refresh
term_stats / field_stats to cover the delta docs.

Implementation: decode base+delta blocks back to long form (the inverse
mapInPandas of the builder), then re-run the standard salted block build and
stats stages through the StageManager — the 'postings' and 'term_stats'
stage fingerprints include the delta list, so compaction itself is an
idempotent, resumable commit.  field_stats scalars are updated EXACTLY from
the per-delta stats JSONs (no re-tokenization).

Idempotency protocol: field_stats.json carries "folded_deltas" (the list of
delta basenames already folded AND stats-committed) and is rewritten
atomically (tmp + rename) as the LAST step — it is the commit point.  Delta
dirs themselves are left in place (an external janitor may remove folded
ones); re-running compact() only processes deltas not in folded_deltas.
The crash window between the postings swap and the stats commit is covered
by the swapped postings manifest: its conf records which deltas the
snapshot contains ("compact_of"), so a re-run detects base-already-contains
deltas and completes the stats commit without re-folding.  The swap itself
goes rename(old -> old.bak), rename(new -> old), remove backup — there is
never a moment without a readable postings dir, and an interrupted swap is
healed at the start of the next run.

Append-only doc_id assumption (new crawl docs get new ids); re-crawled urls
should be deduped upstream before indexing.
"""

from __future__ import annotations

import glob
import json
import os
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.lineage import StageManager
from .build import IndexConfig, POSTINGS_SCHEMA, _make_block_builder, term_bucket_expr
from .codec import decode_payload, delta_decode

_LONG_FORM = "doc_id long, term string, tf long, doc_len long"


def decode_postings_df(blocks: DataFrame, codec: str = "varint") -> DataFrame:
    """Inverse of the block builder: block rows -> (doc_id, term, tf, doc_len)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids_l, terms_l, tfs_l, dls_l = [], [], [], []
            for row in pdf.itertuples():
                n = int(row.n_docs)
                ids = delta_decode(decode_payload(bytes(row.doc_id_deltas), n, codec))
                tfs = decode_payload(bytes(row.tfs), n, codec)
                dls = decode_payload(bytes(row.doc_lens), n, codec)
                ids_l.append(ids.astype(np.int64))
                tfs_l.append(tfs.astype(np.int64))
                dls_l.append(dls.astype(np.int64))
                terms_l.extend([row.term] * n)
            if ids_l:
                yield pd.DataFrame(
                    {
                        "doc_id": np.concatenate(ids_l),
                        "term": terms_l,
                        "tf": np.concatenate(tfs_l),
                        "doc_len": np.concatenate(dls_l),
                    }
                )

    return blocks.select(
        "term", "n_docs", "doc_id_deltas", "tfs", "doc_lens"
    ).mapInPandas(run, _LONG_FORM)


def _heal_interrupted_swap(mgr: StageManager) -> None:
    """Recover from a crash inside the swap: for each stage, if the live dir
    is missing, restore it from the compacted snapshot (finish the swap) or
    from the .bak backup (roll back)."""
    for stage in ("postings", "term_stats"):
        old = mgr.stage_path(stage)
        new = mgr.stage_path(stage + "_compacted")
        bak = old + ".bak"
        if not os.path.isdir(old):
            if os.path.isdir(new):
                os.rename(new, old)
                if os.path.exists(mgr._manifest_path(stage + "_compacted")):
                    os.replace(
                        mgr._manifest_path(stage + "_compacted"),
                        mgr._manifest_path(stage),
                    )
            elif os.path.isdir(bak):
                os.rename(bak, old)


def _atomic_write_json(path: str, obj: dict) -> None:
    tmp = path + ".__tmp__"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=2)
    os.replace(tmp, path)  # same-directory rename: atomic commit


def compact(
    spark: SparkSession, index_dir: str, config: IndexConfig = IndexConfig()
) -> dict:
    """Merge unfolded deltas/batch_* into the base index (postings + stats
    stages).  Idempotent and crash-safe — see module docstring protocol."""
    import shutil

    mgr = StageManager(index_dir)
    _heal_interrupted_swap(mgr)

    fs_path = os.path.join(index_dir, "field_stats.json")
    with open(fs_path) as f:
        fs = json.load(f)
    folded = set(fs.get("folded_deltas", []))

    all_deltas = sorted(glob.glob(os.path.join(index_dir, "deltas", "batch_*")))
    pending = [d for d in all_deltas if os.path.basename(d) not in folded]
    if not pending:
        return {}

    # deltas already inside the live postings snapshot (swap happened, stats
    # commit did not — the crash window) are folded into stats only
    post_manifest = mgr.manifest("postings") or {}
    in_base = [
        b for b in post_manifest.get("config", {}).get("compact_of", [])
        if b not in folded
    ]
    to_compact = [d for d in pending if os.path.basename(d) not in in_base]
    results: dict = {}

    if to_compact:
        # this snapshot will contain every not-yet-stats-committed delta
        snapshot_of = sorted(in_base + [os.path.basename(d) for d in to_compact])
        conf = {"compact_of": snapshot_of, **config.fingerprint_dict()}

        base = spark.read.parquet(mgr.stage_path("postings"))
        parts = [decode_postings_df(base, config.codec)]
        for d in to_compact:
            parts.append(decode_postings_df(spark.read.parquet(d), config.codec))
        long_form = parts[0]
        for p in parts[1:]:
            long_form = long_form.unionByName(p)

        def write_postings(tmp: str):
            salted = long_form.select(
                "doc_id", "term", "tf", "doc_len",
                (F.col("doc_id") / config.salt_range).cast("long").alias("salt"),
                term_bucket_expr(F.col("term"), config.n_buckets).alias("bucket"),
            )
            (
                salted.repartition(config.n_buckets, "term", "salt")
                .sortWithinPartitions("term", "salt", "doc_id")
                .mapInPandas(_make_block_builder(config.block_size, config.codec), POSTINGS_SCHEMA)
                .repartition(config.n_buckets, "bucket")
                .write.partitionBy("bucket").parquet(tmp)
            )

        # write to a new stage name, then swap: the old postings stay
        # readable until the compacted snapshot is committed (crash-safe)
        results["postings_compacted"] = mgr.run("postings_compacted", conf, write_postings)

        def write_term_stats(tmp: str):
            (
                long_form.groupBy("term")
                .agg(F.count("*").alias("df"), F.sum("tf").alias("cf"))
                .write.parquet(tmp)
            )

        results["term_stats_compacted"] = mgr.run("term_stats_compacted", conf, write_term_stats)

        # swap compacted stages into place; never a moment without a live dir
        for stage in ("postings", "term_stats"):
            old, new = mgr.stage_path(stage), mgr.stage_path(stage + "_compacted")
            if os.path.isdir(new):
                bak = old + ".bak"
                if os.path.isdir(bak):
                    shutil.rmtree(bak)
                if os.path.isdir(old):
                    os.rename(old, bak)
                os.rename(new, old)
                if os.path.exists(mgr._manifest_path(stage + "_compacted")):
                    os.replace(
                        mgr._manifest_path(stage + "_compacted"),
                        mgr._manifest_path(stage),
                    )
                shutil.rmtree(bak, ignore_errors=True)

    # exact field_stats refresh from per-delta scalars, for every delta now
    # inside the live snapshot but not yet committed; the folded_deltas list
    # and the scalars commit together (atomic rename) so a re-run can never
    # double-count
    for d in pending:
        sp = os.path.join(d, "delta_stats.json")
        if os.path.exists(sp):
            with open(sp) as f:
                ds = json.load(f)
            fs["n_docs"] += ds["n_docs"]
            fs["total_len"] += ds["total_len"]
        folded.add(os.path.basename(d))
    fs["avg_doc_len"] = fs["total_len"] / fs["n_docs"] if fs["n_docs"] else 0.0
    fs["folded_deltas"] = sorted(folded)
    _atomic_write_json(fs_path, fs)
    return results
