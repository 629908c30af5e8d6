"""Index lifecycle: base build -> streaming deltas -> compaction -> queries
rank-identical to a from-scratch oracle over the UNION corpus."""

from __future__ import annotations

import pytest

from knowledgeir_spark.index.build import IndexConfig, build_index
from knowledgeir_spark.index.compact import compact, decode_postings_df
from knowledgeir_spark.index.query import IndexReader
from knowledgeir_spark.oracle.index import OracleIndex
from knowledgeir_spark.streaming.incremental import incremental_index

CFG = IndexConfig(block_size=16, salt_range=64, n_buckets=4, build_partitions=4)


def test_compacted_index_equals_fresh_oracle(spark, webpages_pdf, tmp_path):
    idx_dir = str(tmp_path / "idx")
    pdf = webpages_pdf.reset_index().rename(columns={"index": "doc_id"})
    base_pdf = pdf.iloc[:200]
    delta1 = pdf.iloc[200:250]
    delta2 = pdf.iloc[250:300]

    docs = spark.createDataFrame(base_pdf[["doc_id", "text"]])
    build_index(spark, docs, idx_dir, CFG, input_token="base200")

    inp = str(tmp_path / "arrivals")
    schema = "doc_id long, text string"
    spark.createDataFrame(delta1[["doc_id", "text"]]).write.mode("append").parquet(inp)
    incremental_index(spark, inp, idx_dir, schema, CFG)
    spark.createDataFrame(delta2[["doc_id", "text"]]).write.mode("append").parquet(inp)
    incremental_index(spark, inp, idx_dir, schema, CFG)

    res = compact(spark, idx_dir, CFG)
    assert res and not any(r.skipped for r in res.values())

    # postings now cover all 300 docs; equality vs full oracle
    oracle = OracleIndex(list(zip(pdf["doc_id"], pdf["text"])))
    reader = IndexReader(spark, idx_dir)
    assert reader.field_stats["n_docs"] == 300
    assert reader.field_stats["avg_doc_len"] == pytest.approx(oracle.avg_doc_len, abs=1e-9)

    long_form = decode_postings_df(
        spark.read.parquet(f"{idx_dir}/postings")
    ).collect()
    got: dict[str, list] = {}
    for r in long_form:
        got.setdefault(r["term"], []).append((r["doc_id"], r["tf"]))
    assert set(got) == set(oracle.postings)
    for t in got:
        assert sorted(got[t]) == sorted(oracle.postings[t]), t

    queries = [("1", "the data spark w0005"), ("2", "w0100 w0200"), ("3", "index")]
    for qid, qtext in queries:
        ranked = reader.search([(qid, qtext)], k=15).collect()
        expected = oracle.topk(qtext, k=15)
        assert [(r["doc_id"]) for r in sorted(ranked, key=lambda r: r["rank"])] == [
            d for d, _ in expected
        ], qtext
        for r in ranked:
            assert r["score"] == pytest.approx(dict(expected)[r["doc_id"]], abs=1e-6)


def test_compact_noop_without_deltas(spark, webpages_pdf, tmp_path):
    idx_dir = str(tmp_path / "idx2")
    pdf = webpages_pdf.reset_index().rename(columns={"index": "doc_id"}).iloc[:50]
    docs = spark.createDataFrame(pdf[["doc_id", "text"]])
    build_index(spark, docs, idx_dir, CFG, input_token="t50")
    assert compact(spark, idx_dir, CFG) == {}


def test_compact_rerun_and_new_delta(spark, webpages_pdf, tmp_path):
    """Idempotency: a re-run after compaction is a no-op; a later delta folds
    only ITSELF (no re-union of already-folded deltas, no double-counted
    stats)."""
    import json
    import os

    idx_dir = str(tmp_path / "idx3")
    pdf = webpages_pdf.reset_index().rename(columns={"index": "doc_id"})
    docs = spark.createDataFrame(pdf.iloc[:100][["doc_id", "text"]])
    build_index(spark, docs, idx_dir, CFG, input_token="base100")

    inp = str(tmp_path / "arr3")
    schema = "doc_id long, text string"
    spark.createDataFrame(pdf.iloc[100:140][["doc_id", "text"]]).write.mode(
        "append").parquet(inp)
    incremental_index(spark, inp, idx_dir, schema, CFG)
    assert compact(spark, idx_dir, CFG)

    with open(os.path.join(idx_dir, "field_stats.json")) as f:
        fs1 = json.load(f)
    assert fs1["n_docs"] == 140 and len(fs1["folded_deltas"]) == 1
    # consumed deltas are recorded -> immediate re-run is a no-op
    assert compact(spark, idx_dir, CFG) == {}
    with open(os.path.join(idx_dir, "field_stats.json")) as f:
        assert json.load(f) == fs1

    # a later delta folds alone on top of the compacted base
    spark.createDataFrame(pdf.iloc[140:170][["doc_id", "text"]]).write.mode(
        "append").parquet(inp)
    incremental_index(spark, inp, idx_dir, schema, CFG)
    assert compact(spark, idx_dir, CFG)
    with open(os.path.join(idx_dir, "field_stats.json")) as f:
        fs2 = json.load(f)
    assert fs2["n_docs"] == 170 and len(fs2["folded_deltas"]) == 2

    oracle = OracleIndex(list(zip(pdf.iloc[:170]["doc_id"], pdf.iloc[:170]["text"])))
    long_form = decode_postings_df(spark.read.parquet(f"{idx_dir}/postings")).collect()
    got: dict[str, list] = {}
    for r in long_form:
        got.setdefault(r["term"], []).append((r["doc_id"], r["tf"]))
    assert set(got) == set(oracle.postings)
    for t in got:
        assert sorted(got[t]) == sorted(oracle.postings[t]), t


def test_compact_recovers_stats_commit_crash(spark, webpages_pdf, tmp_path):
    """Crash window between the postings swap and the stats commit: the
    postings manifest already records the folded delta, so a re-run must
    complete the stats commit WITHOUT unioning the delta into the (already
    compacted) base again."""
    import json
    import os

    idx_dir = str(tmp_path / "idx4")
    pdf = webpages_pdf.reset_index().rename(columns={"index": "doc_id"})
    docs = spark.createDataFrame(pdf.iloc[:100][["doc_id", "text"]])
    build_index(spark, docs, idx_dir, CFG, input_token="base100")
    inp = str(tmp_path / "arr4")
    spark.createDataFrame(pdf.iloc[100:130][["doc_id", "text"]]).write.mode(
        "append").parquet(inp)
    incremental_index(spark, inp, idx_dir, "doc_id long, text string", CFG)
    assert compact(spark, idx_dir, CFG)

    n_rows = spark.read.parquet(f"{idx_dir}/postings").count()
    fs_path = os.path.join(idx_dir, "field_stats.json")
    with open(fs_path) as f:
        fs_good = json.load(f)
    # simulate the crash: stats commit rolled back to pre-compact state
    batch = fs_good["folded_deltas"][0]
    with open(os.path.join(idx_dir, "deltas", batch, "delta_stats.json")) as f:
        ds = json.load(f)
    fs_crash = dict(fs_good)
    fs_crash["folded_deltas"] = []
    fs_crash["n_docs"] -= ds["n_docs"]
    fs_crash["total_len"] -= ds["total_len"]
    with open(fs_path, "w") as f:
        json.dump(fs_crash, f)

    compact(spark, idx_dir, CFG)  # recovery run
    with open(fs_path) as f:
        fs_after = json.load(f)
    assert fs_after["n_docs"] == fs_good["n_docs"]
    assert fs_after["total_len"] == fs_good["total_len"]
    assert fs_after["folded_deltas"] == fs_good["folded_deltas"]
    # postings were NOT re-unioned: same physical row count
    assert spark.read.parquet(f"{idx_dir}/postings").count() == n_rows


def _build_with_one_delta(spark, webpages_pdf, tmp_path, tag):
    """base 100 docs + one 30-doc streaming delta, NOT yet compacted."""
    idx_dir = str(tmp_path / f"idx_{tag}")
    pdf = webpages_pdf.reset_index().rename(columns={"index": "doc_id"})
    docs = spark.createDataFrame(pdf.iloc[:100][["doc_id", "text"]])
    build_index(spark, docs, idx_dir, CFG, input_token="base100")
    inp = str(tmp_path / f"arr_{tag}")
    spark.createDataFrame(pdf.iloc[100:130][["doc_id", "text"]]).write.mode(
        "append").parquet(inp)
    incremental_index(spark, inp, idx_dir, "doc_id long, text string", CFG)
    return idx_dir, pdf.iloc[:130]


def _assert_matches_oracle(spark, idx_dir, corpus_pdf):
    """Postings AND term_stats exactly match a from-scratch oracle over the
    union corpus (catches both duplicated postings and stale df/cf)."""
    oracle = OracleIndex(list(zip(corpus_pdf["doc_id"], corpus_pdf["text"])))
    long_form = decode_postings_df(spark.read.parquet(f"{idx_dir}/postings")).collect()
    got: dict[str, list] = {}
    for r in long_form:
        got.setdefault(r["term"], []).append((r["doc_id"], r["tf"]))
    assert set(got) == set(oracle.postings)
    for t in got:
        assert sorted(got[t]) == sorted(oracle.postings[t]), t
    stats = {
        r["term"]: (r["df"], r["cf"])
        for r in spark.read.parquet(f"{idx_dir}/term_stats").collect()
    }
    for t, plist in oracle.postings.items():
        assert stats[t] == (len(plist), sum(tf for _, tf in plist)), t


def test_compact_recovers_crash_between_stage_swaps(
    spark, webpages_pdf, tmp_path, monkeypatch
):
    """Crash AFTER the postings swap but BEFORE the term_stats swap: on
    recovery the live postings manifest already records the delta (so
    to_compact is empty) — the orphaned term_stats_compacted snapshot must
    still be installed, or df/cf stay permanently stale."""
    import knowledgeir_spark.index.compact as cm

    idx_dir, corpus = _build_with_one_delta(spark, webpages_pdf, tmp_path, "c1")

    def swap_postings_then_crash(mgr):
        cm._swap_one(mgr, "postings")
        raise RuntimeError("simulated crash between stage swaps")

    monkeypatch.setattr(cm, "_swap_compacted_stages", swap_postings_then_crash)
    with pytest.raises(RuntimeError, match="simulated crash"):
        compact(spark, idx_dir, CFG)
    monkeypatch.undo()

    # stale state is real: term_stats_compacted exists, live term_stats old
    import os

    assert os.path.isdir(f"{idx_dir}/term_stats_compacted")
    res = compact(spark, idx_dir, CFG)  # recovery run
    assert not os.path.isdir(f"{idx_dir}/term_stats_compacted")
    _assert_matches_oracle(spark, idx_dir, corpus)
    # and the recovery did NOT recompute/union anything (no new stage runs)
    assert not any(not r.skipped for r in res.values())


def test_compact_recovers_crash_before_manifest_replace(
    spark, webpages_pdf, tmp_path, monkeypatch
):
    """Crash between the swap's data rename and its manifest replace: live
    postings already contain the delta but the live manifest does not record
    it.  Recovery must finish the manifest commit — NOT re-union the delta
    into the already-compacted base (which would double df/cf)."""
    import os

    import knowledgeir_spark.index.compact as cm

    idx_dir, corpus = _build_with_one_delta(spark, webpages_pdf, tmp_path, "c2")

    def swap_without_manifest_then_crash(mgr, stage):
        import shutil

        old, new = mgr.stage_path(stage), mgr.stage_path(stage + "_compacted")
        bak = old + ".bak"
        os.rename(old, bak)
        os.rename(new, old)
        shutil.rmtree(bak, ignore_errors=True)
        raise RuntimeError("simulated crash before manifest replace")

    monkeypatch.setattr(cm, "_swap_one", swap_without_manifest_then_crash)
    with pytest.raises(RuntimeError, match="simulated crash"):
        compact(spark, idx_dir, CFG)
    monkeypatch.undo()

    # the dangerous state: compacted manifest present, its dir gone, live
    # manifest still pre-compact
    assert os.path.exists(f"{idx_dir}/_lineage/postings_compacted.json")
    assert not os.path.isdir(f"{idx_dir}/postings_compacted")

    compact(spark, idx_dir, CFG)  # recovery run
    assert not os.path.exists(f"{idx_dir}/_lineage/postings_compacted.json")
    _assert_matches_oracle(spark, idx_dir, corpus)

    import json

    with open(f"{idx_dir}/field_stats.json") as f:
        fs = json.load(f)
    assert fs["n_docs"] == 130 and len(fs["folded_deltas"]) == 1
    # idempotent afterwards
    assert compact(spark, idx_dir, CFG) == {}


def test_compact_rewrites_only_touched_buckets(spark, webpages_pdf, tmp_path):
    """Per-bucket incremental merge: a delta touching one term-hash bucket
    must leave every other bucket's parquet files physically intact (same
    inodes, carried as hardlinks) while the merged index still matches a
    from-scratch oracle."""
    import os

    from knowledgeir_spark.index.build import term_bucket_py
    from knowledgeir_spark.plans.lineage import StageManager

    idx_dir = str(tmp_path / "idx_pb")
    pdf = webpages_pdf.reset_index().rename(columns={"index": "doc_id"})
    docs = spark.createDataFrame(pdf.iloc[:100][["doc_id", "text"]])
    build_index(spark, docs, idx_dir, CFG, input_token="base100")

    # one new doc with a single novel term -> exactly one touched bucket
    term = "zqxjkvbn"
    tb = term_bucket_py(term, CFG.n_buckets)
    inp = str(tmp_path / "arr_pb")
    spark.createDataFrame(
        [(500, term)], "doc_id long, text string"
    ).write.mode("append").parquet(inp)
    incremental_index(spark, inp, idx_dir, "doc_id long, text string", CFG)

    def bucket_inodes(bucket: int) -> set[int]:
        d = os.path.join(idx_dir, "postings", f"bucket={bucket}")
        return {
            os.stat(os.path.join(d, f)).st_ino
            for f in os.listdir(d)
            if f.endswith(".parquet")
        }

    pre = {b: bucket_inodes(b) for b in range(CFG.n_buckets) if b != tb}
    assert all(pre.values())  # every untouched bucket has base data

    assert compact(spark, idx_dir, CFG)

    m = StageManager(idx_dir).manifest("postings")
    assert m["config"]["touched_buckets"] == [tb]
    for b, inodes in pre.items():
        assert bucket_inodes(b) == inodes, f"bucket {b} was rewritten"

    corpus = list(zip(pdf.iloc[:100]["doc_id"], pdf.iloc[:100]["text"])) + [
        (500, term)
    ]
    import pandas as pd

    _assert_matches_oracle(
        spark, idx_dir, pd.DataFrame(corpus, columns=["doc_id", "text"])
    )


def test_append_compaction_equals_fresh_oracle(spark, webpages_pdf, tmp_path):
    """mode='append': O(delta) compaction — base files carry over by inode
    (nothing decoded or rewritten), delta blocks land in their bucket dirs,
    term_stats sum exactly — and the result matches a from-scratch oracle
    and answers queries rank-identically."""
    import os

    from knowledgeir_spark.index.query import IndexReader

    idx_dir = str(tmp_path / "idx_app")
    pdf = webpages_pdf.reset_index().rename(columns={"index": "doc_id"})
    docs = spark.createDataFrame(pdf.iloc[:200][["doc_id", "text"]])
    build_index(spark, docs, idx_dir, CFG, input_token="base200")

    inp = str(tmp_path / "arr_app")
    schema = "doc_id long, text string"
    spark.createDataFrame(pdf.iloc[200:250][["doc_id", "text"]]).write.mode(
        "append").parquet(inp)
    incremental_index(spark, inp, idx_dir, schema, CFG)
    spark.createDataFrame(pdf.iloc[250:300][["doc_id", "text"]]).write.mode(
        "append").parquet(inp)
    incremental_index(spark, inp, idx_dir, schema, CFG)

    def inodes(root):
        out = set()
        for dp, _dn, fns in os.walk(root):
            for fn in fns:
                if fn.endswith(".parquet"):
                    out.add(os.stat(os.path.join(dp, fn)).st_ino)
        return out

    base_inodes = inodes(os.path.join(idx_dir, "postings"))
    res = compact(spark, idx_dir, CFG, mode="append")
    assert res and not any(r.skipped for r in res.values())
    after = inodes(os.path.join(idx_dir, "postings"))
    assert base_inodes <= after  # every base file carried over untouched

    _assert_matches_oracle(spark, idx_dir, pdf.iloc[:300])

    # idempotent re-run; queries rank-identical to the from-scratch oracle
    assert compact(spark, idx_dir, CFG, mode="append") == {}
    oracle = OracleIndex(list(zip(pdf.iloc[:300]["doc_id"],
                                  pdf.iloc[:300]["text"])))
    reader = IndexReader(spark, idx_dir)
    assert reader.field_stats["n_docs"] == 300
    for qid, qtext in [("1", "the data spark w0005"), ("2", "w0100 w0200")]:
        ranked = reader.search([(qid, qtext)], k=15).collect()
        expected = oracle.topk(qtext, k=15)
        assert [r["doc_id"] for r in sorted(ranked, key=lambda r: r["rank"])] \
            == [d for d, _ in expected], qtext
        for r in ranked:
            assert r["score"] == pytest.approx(dict(expected)[r["doc_id"]],
                                               abs=1e-6)

    # a later delta can be folded by the MERGE mode on top of the appended
    # snapshot (defragmentation path composes with the fast path)
    extra = pdf.iloc[:50].copy()
    extra["doc_id"] = extra["doc_id"] + 1000
    spark.createDataFrame(extra[["doc_id", "text"]]).write.mode(
        "append").parquet(inp)
    incremental_index(spark, inp, idx_dir, schema, CFG)
    assert compact(spark, idx_dir, CFG, mode="merge")
    full = list(zip(pdf.iloc[:300]["doc_id"], pdf.iloc[:300]["text"])) + list(
        zip(extra["doc_id"], extra["text"])
    )
    import pandas as pd

    _assert_matches_oracle(
        spark, idx_dir, pd.DataFrame(full, columns=["doc_id", "text"])
    )


def test_append_auto_defrag_rewrites_only_fragmented_buckets(
    spark, webpages_pdf, tmp_path
):
    """Tiering policy: repeated append folds fragment a bucket's dir; once
    its file count crosses auto_defrag_files, compact(mode='append')
    re-blocks THAT bucket automatically while buckets under the threshold
    keep their files byte-identical (same inodes), and the defragged index
    still matches the from-scratch oracle."""
    import os

    from knowledgeir_spark.index.build import term_bucket_py
    from knowledgeir_spark.index.compact import fragmented_buckets
    from knowledgeir_spark.plans.lineage import StageManager

    idx_dir = str(tmp_path / "idx_defrag")
    pdf = webpages_pdf.reset_index().rename(columns={"index": "doc_id"})
    docs = spark.createDataFrame(pdf.iloc[:120][["doc_id", "text"]])
    build_index(spark, docs, idx_dir, CFG, input_token="base120")

    inp = str(tmp_path / "arr_defrag")
    schema = "doc_id long, text string"
    term = "zqxjkvbn"  # single novel term -> deltas touch exactly one bucket
    tb = term_bucket_py(term, CFG.n_buckets)

    def bucket_files(b):
        d = os.path.join(idx_dir, "postings", f"bucket={b}")
        return {f: os.stat(os.path.join(d, f)).st_ino
                for f in os.listdir(d) if f.endswith(".parquet")}

    for i in range(5):
        spark.createDataFrame(
            [(500 + i, term)], schema
        ).write.mode("append").parquet(inp)
        incremental_index(spark, inp, idx_dir, schema, CFG)
        assert compact(spark, idx_dir, CFG, mode="append",
                       auto_defrag_files=None)  # fast path only, no defrag

    counts = {b: len(bucket_files(b)) for b in range(CFG.n_buckets)}
    others_max = max(c for b, c in counts.items() if b != tb)
    assert counts[tb] > others_max  # only the delta bucket fragmented
    assert fragmented_buckets(idx_dir, others_max) == [tb]
    keep = {b: bucket_files(b) for b in range(CFG.n_buckets) if b != tb}

    # one more delta; this fold defrags the fragmented bucket automatically
    spark.createDataFrame(
        [(600, term)], schema
    ).write.mode("append").parquet(inp)
    incremental_index(spark, inp, idx_dir, schema, CFG)
    res = compact(spark, idx_dir, CFG, mode="append",
                  auto_defrag_files=others_max)
    assert "defrag" in res, res
    assert res["defrag"]["defragged_buckets"] == [tb]
    m = StageManager(idx_dir).manifest("postings")
    assert m["config"]["mode"] == "defrag"
    assert len(bucket_files(tb)) <= others_max  # re-blocked, fewer files
    for b, files in keep.items():
        now = bucket_files(b)
        for f, ino in files.items():
            assert now.get(f) == ino, f"bucket {b} file {f} rewritten"

    corpus = list(zip(pdf.iloc[:120]["doc_id"], pdf.iloc[:120]["text"])) + [
        (500 + i, term) for i in range(5)
    ] + [(600, term)]
    import pandas as pd

    _assert_matches_oracle(
        spark, idx_dir, pd.DataFrame(corpus, columns=["doc_id", "text"])
    )
    # idempotent: nothing pending, nothing fragmented at the new layout
    assert compact(spark, idx_dir, CFG, mode="append",
                   auto_defrag_files=others_max) == {}


def test_impact_layout_through_delta_lifecycle(spark, webpages_pdf, tmp_path):
    """block_order='impact' composes with the whole lifecycle: base build ->
    streaming delta -> append fold -> merge defrag, and the result still
    matches the from-scratch oracle (the re-block paths all thread
    config.block_order)."""
    from knowledgeir_spark.index.build import IndexConfig

    cfg = IndexConfig(**{**CFG.fingerprint_dict(), "block_order": "impact"})
    idx_dir = str(tmp_path / "idx_imp_life")
    pdf = webpages_pdf.reset_index().rename(columns={"index": "doc_id"})
    docs = spark.createDataFrame(pdf.iloc[:150][["doc_id", "text"]])
    build_index(spark, docs, idx_dir, cfg, input_token="base150i")

    inp = str(tmp_path / "arr_imp_life")
    schema = "doc_id long, text string"
    spark.createDataFrame(pdf.iloc[150:180][["doc_id", "text"]]).write.mode(
        "append").parquet(inp)
    incremental_index(spark, inp, idx_dir, schema, cfg)
    assert compact(spark, idx_dir, cfg, mode="append")
    _assert_matches_oracle(spark, idx_dir, pdf.iloc[:180])

    spark.createDataFrame(pdf.iloc[180:200][["doc_id", "text"]]).write.mode(
        "append").parquet(inp)
    incremental_index(spark, inp, idx_dir, schema, cfg)
    assert compact(spark, idx_dir, cfg, mode="merge")
    _assert_matches_oracle(spark, idx_dir, pdf.iloc[:200])
    reader = IndexReader(spark, idx_dir)
    assert reader.block_order == "impact"


def test_append_fold_batching_policy(spark, webpages_pdf, tmp_path):
    """min_pending_deltas defers the fold until enough deltas accumulate
    (round-6 freshness-throughput knob); the deferred fold then lands all
    pending deltas in ONE pass and the result matches the from-scratch
    oracle.  Crash-window deltas always fold regardless of the policy."""
    idx_dir = str(tmp_path / "idx_batch")
    pdf = webpages_pdf.reset_index().rename(columns={"index": "doc_id"})
    docs = spark.createDataFrame(pdf.iloc[:200][["doc_id", "text"]])
    build_index(spark, docs, idx_dir, CFG, input_token="base200b")

    inp = str(tmp_path / "arr_batch")
    schema = "doc_id long, text string"
    for lo, hi in ((200, 230), (230, 260)):
        spark.createDataFrame(pdf.iloc[lo:hi][["doc_id", "text"]]).write.mode(
            "append").parquet(inp)
        incremental_index(spark, inp, idx_dir, schema, CFG)
        res = compact(spark, idx_dir, CFG, mode="append",
                      min_pending_deltas=3)
        assert res.get("deferred") is True
    # third delta crosses the threshold -> one fold of all three
    spark.createDataFrame(pdf.iloc[260:300][["doc_id", "text"]]).write.mode(
        "append").parquet(inp)
    incremental_index(spark, inp, idx_dir, schema, CFG)
    res = compact(spark, idx_dir, CFG, mode="append", min_pending_deltas=3)
    assert res and "deferred" not in res
    _assert_matches_oracle(spark, idx_dir, pdf.iloc[:300])
    # idempotent + policy no-op afterwards
    assert compact(spark, idx_dir, CFG, mode="append",
                   min_pending_deltas=3) == {}
