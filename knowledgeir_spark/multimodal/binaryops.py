"""Multimodal column operators: decode / feature-extract / resize /
frame-sample over opaque `binary` media columns.

The Spark-side plumbing (schemas, Arrow batch shapes, mapInPandas
signatures, partitioning) is REAL and tested; the actual codec work is
STUBBED because image/audio libraries are not in this container:

- when Pillow is importable, real IMAGE decode (width/height) and bilinear
  resize are wired (import-try gate; tested where PIL exists, skipped
  otherwise); audio/video codecs (librosa/ffmpeg) remain stubbed;
- otherwise media in the engine's deterministic FAKE container format
  (``FAKEIMG``/``FAKEVID``/``FAKEAUD`` headers, see _parse_fake) is decoded
  for real, and anything else raises NotImplementedError — a clearly marked
  stub boundary, NOT silent garbage.

Media table schema (the 100TB layout: media bytes stay opaque, metadata is
columnar so pruning/filtering never touches the blobs):
  media(media_id long, kind string, data binary,
        meta map<string,string>)
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # real decoders, absent in this container
    from PIL import Image  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False

FAKE_MAGICS = (b"FAKEIMG", b"FAKEVID", b"FAKEAUD")


def make_fake_image(width: int, height: int, seed: int = 0) -> bytes:
    payload = hashlib.md5(f"img:{width}x{height}:{seed}".encode()).digest()
    return b"FAKEIMG" + struct.pack("<II", width, height) + payload


def make_fake_video(n_frames: int, fps: int = 25, seed: int = 0) -> bytes:
    payload = hashlib.md5(f"vid:{n_frames}@{fps}:{seed}".encode()).digest()
    return b"FAKEVID" + struct.pack("<II", n_frames, fps) + payload


def _parse_fake(data: bytes) -> tuple[str, int, int]:
    magic, a, b = data[:7], *struct.unpack("<II", data[7:15])
    return magic.decode(), a, b


def _decode_one(data: bytes) -> dict:
    """-> {kind, width/height | frames/fps, content_hash}.  Real image
    formats decode through Pillow when importable (kind = 'IMAGE'); the
    FAKE container formats always decode; anything else is the explicit
    stub boundary (NotImplementedError — video/audio codecs are not in
    this container)."""
    if data is None or len(data) < 15:
        raise NotImplementedError("real media decode requires PIL/ffmpeg (stubbed)")
    head = bytes(data[:7])
    if head not in FAKE_MAGICS:
        if _HAVE_PIL:
            import io

            try:
                with Image.open(io.BytesIO(bytes(data))) as img:
                    w, h = img.size
            except Exception as exc:  # not an image PIL knows
                raise NotImplementedError(
                    f"undecodable media (PIL: {exc}); video/audio stubbed"
                ) from exc
            return {
                "kind": "IMAGE",
                "dim_a": int(w),
                "dim_b": int(h),
                "content_hash": hashlib.md5(bytes(data)).hexdigest(),
            }
        raise NotImplementedError("real media decode requires PIL/ffmpeg (stubbed)")
    magic, a, b = _parse_fake(bytes(data))
    return {
        "kind": magic,
        "dim_a": a,
        "dim_b": b,
        "content_hash": hashlib.md5(bytes(data)).hexdigest(),
    }


DECODE_SCHEMA = (
    "media_id long, kind string, dim_a int, dim_b int, content_hash string"
)


def decode_media(media: DataFrame) -> DataFrame:
    """mapInPandas decode: (media_id, kind, dim_a, dim_b, content_hash).
    dim_a/dim_b = width/height for images, frames/fps for video."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                d = _decode_one(data)
                rows.append(
                    {
                        "media_id": mid, "kind": d["kind"],
                        "dim_a": d["dim_a"], "dim_b": d["dim_b"],
                        "content_hash": d["content_hash"],
                    }
                )
            yield pd.DataFrame(rows)

    return media.select("media_id", "data").mapInPandas(run, DECODE_SCHEMA)


EMBED_DIM = 16


def media_features(media: DataFrame, dim: int = EMBED_DIM) -> DataFrame:
    """(media_id, features array<float>) — deterministic feature vector from
    the content hash (REAL model inference is the stub: the batching, schema
    and Arrow shape are exactly what an ONNX/torch scorer would use)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_vecs = [], []
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                h = hashlib.sha256(bytes(data)).digest()
                raw = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4], dtype=np.uint32)
                vec = (raw.astype(np.float64) / 2**32 - 0.5).astype(np.float32)
                out_ids.append(mid)
                out_vecs.append(vec.tolist())
            yield pd.DataFrame({"media_id": out_ids, "features": out_vecs})

    return media.select("media_id", "data").mapInPandas(
        run, "media_id long, features array<float>"
    )


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """(media_id, data binary) resized to width x height.  Real images
    (kind IMAGE, requires Pillow) are resampled bilinearly and re-encoded
    PNG; FAKEIMG payloads are re-targeted (their pixels are virtual).
    Non-image rows are dropped."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        for pdf in batches:
            ids, datas = [], []
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                d = _decode_one(data)
                if d["kind"] == "FAKEIMG":
                    ids.append(mid)
                    datas.append(make_fake_image(width, height, seed=0))
                elif d["kind"] == "IMAGE":
                    with Image.open(io.BytesIO(bytes(data))) as img:
                        resized = img.resize(
                            (width, height), resample=Image.BILINEAR
                        )
                        buf = io.BytesIO()
                        resized.save(buf, format="PNG")
                    ids.append(mid)
                    datas.append(buf.getvalue())
            yield pd.DataFrame({"media_id": ids, "data": datas})

    return media.select("media_id", "data").mapInPandas(
        run, "media_id long, data binary"
    )


def sample_frames(media: DataFrame, every_k: int = 5) -> DataFrame:
    """(media_id, frame_idx) — every k-th frame index of FAKEVID rows."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs = [], []
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                d = _decode_one(data)
                if d["kind"] != "FAKEVID":
                    continue
                frames = np.arange(0, d["dim_a"], every_k, dtype=np.int64)
                ids.extend([mid] * len(frames))
                idxs.extend(frames.tolist())
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs})

    return media.select("media_id", "data").mapInPandas(
        run, "media_id long, frame_idx long"
    )
