"""Multimodal binary plumbing + streaming incremental indexing."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def media(spark):
    from knowledgeir_spark.multimodal.binaryops import make_fake_image, make_fake_video

    rows = [
        (0, "image", make_fake_image(640, 480, seed=1)),
        (1, "image", make_fake_image(640, 480, seed=1)),  # dup content
        (2, "image", make_fake_image(1920, 1080, seed=2)),
        (3, "video", make_fake_video(100, 25, seed=3)),
    ]
    return spark.createDataFrame(rows, "media_id long, kind string, data binary")


def test_decode(spark, media):
    from knowledgeir_spark.multimodal.binaryops import decode_media

    got = {r["media_id"]: r for r in decode_media(media).collect()}
    assert got[0]["kind"] == "FAKEIMG" and (got[0]["dim_a"], got[0]["dim_b"]) == (640, 480)
    assert got[2]["dim_a"] == 1920
    assert got[3]["kind"] == "FAKEVID" and got[3]["dim_a"] == 100
    assert got[0]["content_hash"] == got[1]["content_hash"]  # exact-dup detectable
    assert got[0]["content_hash"] != got[2]["content_hash"]


def test_features_resize_frames(spark, media):
    from knowledgeir_spark.multimodal.binaryops import (
        EMBED_DIM,
        media_features,
        resize_images,
        sample_frames,
    )

    feats = {r["media_id"]: r["features"] for r in media_features(media).collect()}
    assert len(feats[0]) == EMBED_DIM
    assert feats[0] == feats[1]  # deterministic
    assert feats[0] != feats[2]
    resized = resize_images(media, 224, 224).collect()
    assert {r["media_id"] for r in resized} == {0, 1, 2}  # video rows dropped
    from knowledgeir_spark.multimodal.binaryops import _parse_fake

    assert _parse_fake(bytes(resized[0]["data"]))[1:] == (224, 224)
    frames = sample_frames(media, every_k=25).collect()
    assert [r["frame_idx"] for r in frames] == [0, 25, 50, 75]


def test_unknown_format_raises(spark):
    from knowledgeir_spark.multimodal.binaryops import _decode_one

    with pytest.raises(NotImplementedError):
        _decode_one(b"\x89PNG\r\n\x1a\n" + b"0" * 100)  # real PNG -> stub boundary


def test_incremental_index(spark, tmp_path):
    import glob

    from knowledgeir_spark.index.build import IndexConfig
    from knowledgeir_spark.index.codec import decode_block
    from knowledgeir_spark.streaming.incremental import incremental_index

    cfg = IndexConfig(block_size=8, salt_range=16, n_buckets=4)
    inp = str(tmp_path / "input")
    root = str(tmp_path / "idx")
    schema = "doc_id long, text string"
    spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "alpha delta")], schema
    ).write.mode("append").parquet(inp)
    incremental_index(spark, inp, root, schema, cfg)
    deltas1 = glob.glob(root + "/deltas/batch_*")
    assert len(deltas1) == 1

    # new crawl files arrive -> only they are processed on the next run
    spark.createDataFrame([(2, "alpha omega")], schema).write.mode("append").parquet(inp)
    incremental_index(spark, inp, root, schema, cfg)
    deltas2 = sorted(glob.glob(root + "/deltas/batch_*"))
    assert len(deltas2) == 2

    rows = []
    for d in deltas2:
        rows.extend(spark.read.parquet(d).collect())
    postings: dict[str, list] = {}
    for r in rows:
        ids, tfs, _ = decode_block(r)
        postings.setdefault(r["term"], []).extend(int(i) for i in ids)
    assert sorted(postings["alpha"]) == [0, 1, 2]
    assert postings["omega"] == [2]


def test_windowed_event_counts(spark, tmp_path):
    from knowledgeir_spark.streaming.incremental import windowed_event_counts

    src = str(tmp_path / "events")
    schema = "ts timestamp, event_type string, value double"
    spark.createDataFrame(
        [
            ("2024-01-01 00:01:00", "click", 1.0),
            ("2024-01-01 00:02:00", "click", 2.0),
            ("2024-01-01 00:07:00", "view", 5.0),
        ],
        "ts string, event_type string, value double",
    ).selectExpr("cast(ts as timestamp) ts", "event_type", "value").write.parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    agg = windowed_event_counts(stream, window="5 minutes")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory").queryName("wincounts").start()
    )
    q.processAllAvailable()
    q.stop()
    rows = {(str(r["win_start"]), r["event_type"]): (r["n"], r["total_value"])
            for r in spark.sql("select * from wincounts").collect()}
    assert rows[("2024-01-01 00:00:00", "click")] == (2, 3.0)
    assert rows[("2024-01-01 00:05:00", "view")] == (1, 5.0)


def test_pil_decode_and_resize(spark):
    """Real-image decode/resize through Pillow — runs wherever PIL is
    installed, skipped in containers without it (the FAKE-format tests
    above cover the Spark plumbing either way)."""
    PIL = pytest.importorskip("PIL")
    import io

    from PIL import Image

    from knowledgeir_spark.multimodal.binaryops import decode_media, resize_images

    def png_bytes(w, h, color):
        img = Image.new("RGB", (w, h), color)
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        return buf.getvalue()

    media = spark.createDataFrame(
        [(1, "image", png_bytes(32, 20, (255, 0, 0)), {}),
         (2, "image", png_bytes(8, 8, (0, 255, 0)), {})],
        "media_id long, kind string, data binary, meta map<string,string>",
    )
    decoded = {r["media_id"]: r for r in decode_media(media).collect()}
    assert decoded[1]["kind"] == "IMAGE"
    assert (decoded[1]["dim_a"], decoded[1]["dim_b"]) == (32, 20)
    assert (decoded[2]["dim_a"], decoded[2]["dim_b"]) == (8, 8)

    resized = {r["media_id"]: bytes(r["data"])
               for r in resize_images(media, 16, 16).collect()}
    for mid, data in resized.items():
        with Image.open(io.BytesIO(data)) as img:
            assert img.size == (16, 16), mid


def test_stateful_sessionization_matches_batch(spark, tmp_path):
    """applyInPandasWithState sessionization over the real events table ==
    the batch lag/cumsum user_sessions parity query, exactly, and state
    carries correctly across micro-batches (two-part arrival)."""
    from knowledgeir_spark.parity_ext import q_user_sessions
    from knowledgeir_spark.streaming.sessions import sessionize_stream

    sf_dir = "/root/testdata/sf0.001"
    expected = {
        r["user_id"]: (r["n_sessions"], r["n_events"])
        for r in q_user_sessions(spark, sf_dir).collect()
    }

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    src = str(tmp_path / "evstream")
    # two files = at least two input splits; per-user event-time order is
    # preserved by splitting on time, the monotone-source assumption
    from pyspark.sql import functions as F

    from knowledgeir_spark.parity import _pin_utc

    _pin_utc(spark)
    us = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    cut = ev.agg(F.expr(
        "percentile(unix_micros(cast(ts as timestamp_ltz)), 0.5)"
    )).first()[0]
    ev.filter(us <= cut).coalesce(1).write.parquet(src + "/p1")
    ev.filter(us > cut).coalesce(1).write.parquet(src + "/p2")
    schema = ev.schema
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1).parquet(src + "/p*")
    out = sessionize_stream(stream)
    q = (
        out.writeStream.outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .format("memory").queryName("sessions").start()
    )
    q.processAllAvailable()
    q.stop()
    # update mode appends one row per (user, batch); the LAST one is final
    rows = spark.sql(
        "select user_id, n_sessions, n_events from sessions"
    ).collect()
    final: dict = {}
    for r in rows:  # memory sink preserves batch order; later wins
        final[r["user_id"]] = (r["n_sessions"], r["n_events"])
    assert final == expected


def _make_wav(freq_hz: float, seconds: float, rate: int = 8000,
              channels: int = 1, width: int = 2, amp: float = 0.5) -> bytes:
    """Stdlib-only sine-wave WAV (the test needs no audio library either)."""
    import io
    import wave

    import numpy as np

    t = np.arange(int(seconds * rate)) / rate
    x = amp * np.sin(2 * np.pi * freq_hz * t)
    if width == 2:
        pcm = (x * 32767).astype("<i2")
    elif width == 1:
        pcm = ((x * 127) + 128).astype(np.uint8)
    else:
        raise ValueError(width)
    frames = np.repeat(pcm, channels).tobytes()
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(width)
        w.setframerate(rate)
        w.writeframes(frames)
    return buf.getvalue()


def test_audio_decode_and_features_real_wav(spark):
    """WAV decode is REAL (stdlib wave + numpy): duration, rate, rms and
    zero-crossing rate of synthesized sine waves must match theory."""
    import math

    import pytest

    from knowledgeir_spark.multimodal.binaryops import (
        audio_features,
        decode_media,
    )

    rows = [
        (1, _make_wav(440.0, 1.0, rate=8000)),           # A4, 16-bit mono
        (2, _make_wav(100.0, 2.0, rate=8000, amp=0.25)),  # quieter, longer
        (3, _make_wav(440.0, 0.5, rate=8000, channels=2)),  # stereo
        (4, _make_wav(440.0, 0.25, rate=8000, width=1)),  # 8-bit
    ]
    media = spark.createDataFrame(rows, "media_id long, data binary")

    dec = {r["media_id"]: r for r in decode_media(media).collect()}
    assert dec[1]["kind"] == "AUDIO"
    assert dec[1]["dim_a"] == 8000 and dec[1]["dim_b"] == 8000
    assert dec[2]["dim_a"] == 16000

    feats = {r["media_id"]: r for r in audio_features(media).collect()}
    f1 = feats[1]
    assert f1["duration_sec"] == pytest.approx(1.0)
    assert f1["sample_rate"] == 8000 and f1["n_channels"] == 1
    # sine RMS = amp/sqrt(2); quantized 16-bit -> loose tolerance
    assert f1["rms"] == pytest.approx(0.5 / math.sqrt(2), rel=0.01)
    # zero crossings of a 440 Hz sine at 8 kHz: 2*440 per second
    assert f1["zero_crossing_rate"] == pytest.approx(880 / 8000, rel=0.02)
    assert f1["peak"] == pytest.approx(0.5, rel=0.01)

    f2 = feats[2]
    assert f2["duration_sec"] == pytest.approx(2.0)
    assert f2["rms"] == pytest.approx(0.25 / math.sqrt(2), rel=0.01)

    assert feats[3]["n_channels"] == 2
    assert feats[3]["rms"] == pytest.approx(0.5 / math.sqrt(2), rel=0.01)
    assert feats[4]["rms"] == pytest.approx(0.5 / math.sqrt(2), rel=0.02)


def test_audio_features_stub_boundary(spark):
    """Compressed audio stays an explicit stub: NotImplementedError, not
    silent garbage; FAKEAUD rows keep deterministic pseudo-features."""
    import pytest

    from knowledgeir_spark.multimodal.binaryops import audio_features

    fake = b"FAKEAUD" + __import__("struct").pack("<II", 16000, 8000) + b"x" * 16
    media = spark.createDataFrame(
        [(1, fake)], "media_id long, data binary"
    )
    r = audio_features(media).collect()[0]
    assert r["duration_sec"] == pytest.approx(2.0)

    bad = spark.createDataFrame(
        [(2, b"ID3\x04\x00" + b"\x00" * 64)], "media_id long, data binary"
    )
    with pytest.raises(Exception, match="NotImplementedError|stubbed"):
        audio_features(bad).collect()


def test_streaming_clean_scrub_matches_batch(spark, tmp_path):
    """The C4 line filter and PII scrub are stateless column programs, so
    they run unchanged on a stream; streaming output must equal batch."""
    from knowledgeir_spark.functions.pii import scrub_pii
    from knowledgeir_spark.operators.clean import c4_line_filter

    src = str(tmp_path / "docs")
    rows = [
        (1, "good line with words here one.\nbad {\n"
            "another fine long line here two.\nthird good line is long too."),
        (2, "mail me at a.b@c.io right now.\nonly one good line here though."),
    ]
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(src)

    def pipeline(df):
        cleaned = c4_line_filter(df, min_lines=1)
        return scrub_pii(cleaned, text_col="clean_text").select(
            "doc_id", "n_kept", "n_email", "scrubbed"
        )

    batch = {r["doc_id"]: (r["n_kept"], r["n_email"], r["scrubbed"])
             for r in pipeline(spark.read.parquet(src)).collect()}
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = (
        pipeline(stream).writeStream.outputMode("append")
        .format("memory").queryName("cleanscrub").start()
    )
    q.processAllAvailable()
    q.stop()
    got = {r["doc_id"]: (r["n_kept"], r["n_email"], r["scrubbed"])
           for r in spark.sql("select * from cleanscrub").collect()}
    assert got == batch
    assert got[2][1] == 1 and "<EMAIL>" in got[2][2]


def test_ffmpeg_gated_video_and_compressed_audio(spark, tmp_path):
    """Real video probe + compressed-audio decode through the ffmpeg gate —
    runs wherever ffmpeg/ffprobe are on PATH (absent in this container ->
    skipped, same discipline as the PIL gate).  Media is synthesized by
    ffmpeg itself (lavfi testsrc / sine), so the test is self-contained."""
    import shutil
    import subprocess

    if not (shutil.which("ffprobe") and shutil.which("ffmpeg")):
        pytest.skip("ffmpeg/ffprobe not on PATH")
    from knowledgeir_spark.multimodal.binaryops import audio_features, decode_media

    vid_path = str(tmp_path / "clip.mp4")
    subprocess.run(
        ["ffmpeg", "-v", "error", "-f", "lavfi", "-i",
         "testsrc=duration=1:size=64x64:rate=10", "-pix_fmt", "yuv420p",
         vid_path],
        check=True,
    )
    mp3_path = str(tmp_path / "tone.mp3")
    subprocess.run(
        ["ffmpeg", "-v", "error", "-f", "lavfi", "-i",
         "sine=frequency=440:duration=1", mp3_path],
        check=True,
    )
    with open(vid_path, "rb") as f:
        vid = f.read()
    with open(mp3_path, "rb") as f:
        mp3 = f.read()

    media = spark.createDataFrame(
        [(1, vid), (2, mp3)], "media_id long, data binary"
    )
    dec = {r["media_id"]: r for r in decode_media(media).collect()}
    assert dec[1]["kind"] == "VIDEO"
    assert dec[1]["dim_a"] >= 8 and dec[1]["dim_b"] >= 1  # ~10 frames @ 10fps
    assert dec[2]["kind"] == "AUDIO"
    assert dec[2]["dim_b"] > 0  # sample rate

    feats = audio_features(
        spark.createDataFrame([(2, mp3)], "media_id long, data binary")
    ).collect()[0]
    assert feats["duration_sec"] == pytest.approx(1.0, abs=0.2)
    assert feats["rms"] > 0.1  # a sine tone, not silence
