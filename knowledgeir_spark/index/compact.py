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
goes rename(old -> old.bak), rename(new -> old), replace manifest, remove
backup — there is never a moment without a readable postings dir, and an
interrupted swap is healed at the start of the next run, including the two
narrow windows: (a) data rename done but manifest replace lost (heal
finishes the manifest commit so the delta cannot be re-unioned), and (b)
postings swapped but term_stats_compacted never installed (the swap pass
runs on every compact() call, not only after a fresh compute, so the
orphaned snapshot is installed on recovery).

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
    """Recover from a crash inside the swap.  For each stage:

    - live dir missing: restore it from the compacted snapshot (finish the
      swap) or from the .bak backup (roll back) — never a run start without
      a readable dir.
    - compacted MANIFEST present but its data dir gone while the live dir
      exists: the swap's data rename completed and only the manifest replace
      was lost.  The live data already IS the compacted snapshot, so finish
      the manifest commit here — otherwise the live manifest lacks
      ``compact_of`` and a recovery run would re-union the delta into the
      already-compacted base, duplicating every delta posting (doubled
      df/cf).
    """
    import shutil

    for stage in ("postings", "term_stats"):
        old = mgr.stage_path(stage)
        new = mgr.stage_path(stage + "_compacted")
        bak = old + ".bak"
        new_mp = mgr._manifest_path(stage + "_compacted")
        if not os.path.isdir(old):
            if os.path.isdir(new):
                os.rename(new, old)
                if os.path.exists(new_mp):
                    os.replace(new_mp, mgr._manifest_path(stage))
                shutil.rmtree(bak, ignore_errors=True)
            elif os.path.isdir(bak):
                os.rename(bak, old)
        elif os.path.exists(new_mp) and not os.path.isdir(new):
            os.replace(new_mp, mgr._manifest_path(stage))


def _swap_one(mgr: StageManager, stage: str) -> None:
    """Install the committed ``<stage>_compacted`` snapshot (data dir AND
    manifest both present) as the live stage.  Order: backup old, rename new
    into place, replace the manifest, drop the backup — every intermediate
    state is recoverable by _heal_interrupted_swap."""
    import shutil

    old, new = mgr.stage_path(stage), mgr.stage_path(stage + "_compacted")
    new_mp = mgr._manifest_path(stage + "_compacted")
    if not (os.path.isdir(new) and os.path.exists(new_mp)):
        return  # nothing committed to install (a dir without a manifest is
        # an uncommitted partial — StageManager.run cleans those)
    bak = old + ".bak"
    if os.path.isdir(bak):
        shutil.rmtree(bak)
    if os.path.isdir(old):
        os.rename(old, bak)
    os.rename(new, old)
    os.replace(new_mp, mgr._manifest_path(stage))
    shutil.rmtree(bak, ignore_errors=True)


def _swap_compacted_stages(mgr: StageManager) -> None:
    for stage in ("postings", "term_stats"):
        _swap_one(mgr, stage)


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

    # swap committed compacted stages into place; never a moment without a
    # live dir.  Runs UNCONDITIONALLY (not only when this run computed a
    # snapshot): a crash after the postings swap but before the term_stats
    # swap leaves to_compact empty on recovery — the live postings manifest
    # already records the delta — with term_stats_compacted still waiting to
    # be installed.  By the time control reaches here, any lingering
    # postings_compacted has a matching term_stats_compacted (the compute
    # branch above commits term_stats before any swap happens).
    _swap_compacted_stages(mgr)

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
