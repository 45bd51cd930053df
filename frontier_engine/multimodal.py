"""Multimodal columns: image/audio/video as opaque ``binary`` with typed
metadata; decode / feature-extract / resize / frame-sample as Arrow-batched
``mapInPandas`` operators.

The Spark-side plumbing (schemas, batch iteration, partitioning-neutral
signatures) is REAL and tested; the codec step is STUBBED because no
image/audio library ships in this container: ``decode`` parses a
deterministic fake header (magic 'FEIM'/'FEAU'/'FEVI' + dims, as written by
``fake_media_bytes``) and raises ``NotImplementedError`` on real codecs.
Swap ``_decode_stub`` for PIL/ffmpeg bindings on a real cluster — nothing
else changes.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                ]
            ),
        ),
    ]
)

_MAGIC = {b"FEIM": "image", b"FEAU": "audio", b"FEVI": "video"}


def fake_media_bytes(kind: str, width: int, height: int, seed: int, n: int = 256) -> bytes:
    """Deterministic fake media payload with a parseable header.

    Body byte i = ``(seed*31 + i*7) % 256`` — a closed form rather than a
    PRNG so downstream features (mean, histogram) are recomputable in plain
    SQL by an independent oracle."""
    magic = {v: k for k, v in _MAGIC.items()}[kind]
    i = np.arange(n, dtype=np.int64)
    body = ((seed * 31 + i * 7) % 256).astype(np.uint8).tobytes()
    return magic + struct.pack("<HH", width, height) + body


def _decode_stub(payload: bytes) -> tuple[str, int, int, np.ndarray]:
    """Parse the fake header; real codecs are intentionally unimplemented."""
    if payload is None or len(payload) < 8:
        raise ValueError("truncated payload")
    magic, rest = payload[:4], payload[4:]
    if magic not in _MAGIC:
        raise NotImplementedError(
            "real media codecs unavailable in this container — plug a "
            "PIL/ffmpeg decoder in here on a real cluster"
        )
    w, h = struct.unpack("<HH", rest[:4])
    body = np.frombuffer(rest[4:], dtype=np.uint8)
    return _MAGIC[magic], w, h, body


DECODED_SCHEMA = (
    "media_id long, kind string, width int, height int, n_bytes int, "
    "mean_byte double, byte_hist array<int>"
)


def decode_features(df: DataFrame) -> DataFrame:
    """mapInPandas: binary payload → decoded dims + byte-level features.

    The feature math (mean, 16-bin histogram) is real numpy over the whole
    Arrow batch; only the codec itself is the stub.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "kind": [], "width": [], "height": [],
                   "n_bytes": [], "mean_byte": [], "byte_hist": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                try:
                    kind, w, h, body = _decode_stub(bytes(payload))
                except (NotImplementedError, ValueError):
                    continue  # undecodable → dropped (dead-letter upstream)
                hist = np.bincount(body >> 4, minlength=16).astype("int32")
                out["media_id"].append(mid)
                out["kind"].append(kind)
                out["width"].append(w)
                out["height"].append(h)
                out["n_bytes"].append(len(body))
                out["mean_byte"].append(float(body.mean()) if len(body) else 0.0)
                out["byte_hist"].append(hist.tolist())
            if out["media_id"]:
                yield pd.DataFrame(out)

    return df.select("media_id", "payload").mapInPandas(run, schema=DECODED_SCHEMA)


RESIZED_SCHEMA = "media_id long, width int, height int, payload binary"


def resize(df: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """mapInPandas resize: real plumbing, nearest-neighbor byte resample on
    the fake body (a real impl would decode→interpolate→encode)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "width": [], "height": [], "payload": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                try:
                    kind, w, h, body = _decode_stub(bytes(payload))
                except (NotImplementedError, ValueError):
                    continue
                n_out = max(1, int(len(body) * (target_w * target_h) / max(1, w * h)))
                idx = np.linspace(0, len(body) - 1, n_out).astype(np.int64)
                rows["media_id"].append(mid)
                rows["width"].append(target_w)
                rows["height"].append(target_h)
                rows["payload"].append(fake_media_bytes(kind, target_w, target_h, 0, 0)[:8] + body[idx].tobytes())
            if rows["media_id"]:
                yield pd.DataFrame(rows)

    return df.select("media_id", "payload").mapInPandas(run, schema=RESIZED_SCHEMA)


FRAMES_SCHEMA = "media_id long, frame_no int, frame binary"


def sample_frames(df: DataFrame, n_frames: int = 4) -> DataFrame:
    """mapInPandas frame sampling for video payloads: deterministic equal
    strides over the body (a real impl would seek keyframes)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "frame_no": [], "frame": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                try:
                    kind, w, h, body = _decode_stub(bytes(payload))
                except (NotImplementedError, ValueError):
                    continue
                if kind != "video" or len(body) == 0:
                    continue
                chunks = np.array_split(body, n_frames)
                for i, ch in enumerate(chunks):
                    rows["media_id"].append(mid)
                    rows["frame_no"].append(i)
                    rows["frame"].append(ch.tobytes())
            if rows["media_id"]:
                yield pd.DataFrame(rows)

    return df.select("media_id", "payload").mapInPandas(run, schema=FRAMES_SCHEMA)
