"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed in Arrow-batched mapInPandas stages.

The container has no image/audio codecs (no cv2/PIL/ffmpeg — the reference
needs cv2+PaddleOCR, certificate_ocr.py:3,:6), so the DECODE step is
pluggable: the default backend raises NotImplementedError; a deterministic
FAKE backend (a tiny self-describing byte format) makes the Spark-side
plumbing — schema, batch shape, partitioning, error contract — fully real
and testable. On a real cluster, swapping `register_backend("image", ...)`
to a cv2/PIL implementation changes nothing else.

Media payload convention (fake backend):
    b"FAKEIMG:<width>:<height>:" + pixel bytes (1 byte/px, row-major)
    b"FAKEVID:<n_frames>:<frame_len>:" + frame bytes, concatenated
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType, IntegerType, LongType, StringType, StructField, StructType,
)

FEATURE_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("kind", StringType()),
    StructField("status", StringType()),
    StructField("message", StringType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("n_frames", IntegerType()),
    StructField("n_bytes", LongType()),
    StructField("mean_intensity", DoubleType()),
])

_BACKENDS: dict[str, Callable[[bytes], dict]] = {}


def register_backend(kind: str, fn: Callable[[bytes], dict]) -> None:
    _BACKENDS[kind] = fn


def _decode_fake_image(payload: bytes) -> dict:
    head, _, rest = payload.partition(b":")
    if head != b"FAKEIMG":
        raise ValueError("not a FAKEIMG payload")
    w_b, _, rest = rest.partition(b":")
    h_b, _, pixels = rest.partition(b":")
    w, h = int(w_b), int(h_b)
    px = np.frombuffer(pixels, dtype=np.uint8)
    if px.size != w * h:
        raise ValueError(f"truncated image: {px.size} != {w}*{h}")
    return {"width": w, "height": h, "n_frames": 1,
            "mean_intensity": float(px.mean()) if px.size else 0.0}


def _decode_fake_video(payload: bytes) -> dict:
    head, _, rest = payload.partition(b":")
    if head != b"FAKEVID":
        raise ValueError("not a FAKEVID payload")
    n_b, _, rest = rest.partition(b":")
    l_b, _, frames = rest.partition(b":")
    n, flen = int(n_b), int(l_b)
    fx = np.frombuffer(frames, dtype=np.uint8)
    if fx.size != n * flen:
        raise ValueError("truncated video")
    # frame-sample every 2nd frame — the realistic access pattern
    sampled = fx.reshape(n, flen)[::2] if n else fx.reshape(0, max(flen, 1))
    return {"width": flen, "height": 1, "n_frames": n,
            "mean_intensity": float(sampled.mean()) if sampled.size else 0.0}


def _real_decode_stub(payload: bytes) -> dict:
    raise NotImplementedError(
        "real image/audio decode needs cv2/PIL/ffmpeg — not in this "
        "container; register a backend on the cluster"
    )


register_backend("fake_image", _decode_fake_image)
register_backend("fake_video", _decode_fake_video)
register_backend("image", _real_decode_stub)
register_backend("audio", _real_decode_stub)
register_backend("video", _real_decode_stub)


def _feature_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = []
        for row in pdf.itertuples(index=False):
            payload = row.payload
            rec = {"url": row.url, "kind": row.kind,
                   "status": "success", "message": None,
                   "width": None, "height": None, "n_frames": None,
                   "n_bytes": len(payload) if payload is not None else 0,
                   "mean_intensity": None}
            try:
                backend = _BACKENDS[row.kind]
                rec.update(backend(payload))
            except NotImplementedError as e:
                rec.update(status="error", message=str(e))
            except Exception as e:  # decode failure → error ROW (cert:100-105)
                rec.update(status="error", message=f"decode failed: {e}")
            out.append(rec)
        yield pd.DataFrame(out, columns=[f.name for f in FEATURE_SCHEMA.fields])


def extract_media_features(media: DataFrame) -> DataFrame:
    """media(url, kind, payload:binary) → typed feature rows. Same error
    contract and batch discipline as the HTML pipeline; the fat `payload`
    column is pruned before and dropped after this stage."""
    from ocr_award_extractor_spark.config import ensure_package_on_workers

    ensure_package_on_workers(media.sparkSession)
    return media.select("url", "kind", "payload").mapInPandas(
        _feature_batch, FEATURE_SCHEMA
    )


def make_fake_image(width: int, height: int, seed: int) -> bytes:
    rng = np.random.RandomState(seed)
    px = rng.randint(0, 256, size=width * height, dtype=np.int64).astype(np.uint8)
    return b"FAKEIMG:%d:%d:" % (width, height) + px.tobytes()


def make_fake_video(n_frames: int, frame_len: int, seed: int) -> bytes:
    rng = np.random.RandomState(seed)
    fx = rng.randint(0, 256, size=n_frames * frame_len, dtype=np.int64).astype(np.uint8)
    return b"FAKEVID:%d:%d:" % (n_frames, frame_len) + fx.tobytes()
