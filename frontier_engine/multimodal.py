"""Multimodal columns: image/audio/video as opaque ``binary`` with typed
metadata; decode / feature-extract / resize / frame-sample as Arrow-batched
``mapInPandas`` operators.

The Spark-side plumbing (schemas, batch iteration, partitioning-neutral
signatures) is REAL and tested, and so are the codecs — both uncompressed
containers AND (since round 3) the three compressed formats, implemented in
:mod:`frontier_engine.codecs` with stdlib+numpy alone:

- BMP  (24-bit uncompressed, ``BI_RGB``) → pixel bytes, row padding stripped
- WAV  (RIFF/WAVE PCM)                   → raw sample bytes + channel/width
- PPM  (binary ``P6``)                   → RGB bytes
- PNG  (8-bit gray/RGB/RGBA, all 5 scanline filters, chunk CRCs verified)
- JPEG (baseline SOF0; DQT/DHT read from the stream, 4:2:0 upsample,
  restart markers)
- GIF  (87a/89a LZW, global/local palettes, interlace; first frame)
- MP4  (ISO-BMFF demux: stsz×stsc×stco sample ranges, stss keyframes;
  frame *sampling* slices real samples out of mdat — decoding the H.26x
  payload inside a sample stays a plug-point for a real cluster decoder)
- FEIM/FEAU/FEVI                         → the deterministic fixture format
  (closed-form body so an independent SQL oracle can recompute features)

Genuinely-unsupported variants (progressive JPEG, Adam7 PNG, 16-bit depth)
raise ``NotImplementedError`` and are dropped per-row, same as malformed
payloads (``ValueError``) — one bad byte string in untrusted crawl data
never fails a Spark task.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from frontier_engine import codecs

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


def encode_bmp(pixels: np.ndarray) -> bytes:
    """Minimal 24-bit uncompressed BMP encoder (tests + round-trips).

    ``pixels``: uint8 array of shape (height, width, 3) in RGB order.
    Rows are written bottom-up in BGR with 4-byte padding, per the spec.
    """
    h, w, _ = pixels.shape
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    body = bytearray()
    for y in range(h - 1, -1, -1):
        body += pixels[y, :, ::-1].tobytes()  # BGR
        body += b"\x00" * pad
    data_offset = 14 + 40
    file_size = data_offset + len(body)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, data_offset)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return header + info + bytes(body)


def encode_wav(samples: np.ndarray, sample_rate: int = 8000, channels: int = 1) -> bytes:
    """Minimal RIFF/WAVE PCM-16 encoder. ``samples``: int16 array
    (interleaved when ``channels > 1``)."""
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, channels, sample_rate,
                      sample_rate * channels * 2, channels * 2, 16)
    hdr = struct.pack("<4sI4s", b"RIFF", 4 + len(fmt) + 8 + len(data), b"WAVE")
    return hdr + fmt + struct.pack("<4sI", b"data", len(data)) + data


def encode_ppm(pixels: np.ndarray) -> bytes:
    """Binary P6 PPM encoder. ``pixels``: uint8 (height, width, 3) RGB."""
    h, w, _ = pixels.shape
    return f"P6\n{w} {h}\n255\n".encode() + pixels.tobytes()


def _decode_bmp(payload: bytes) -> tuple[str, int, int, np.ndarray]:
    if len(payload) < 54:
        raise ValueError("truncated BMP")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    w, h = struct.unpack_from("<ii", payload, 18)
    bitcount = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bitcount != 24 or compression != 0:
        raise NotImplementedError(f"BMP bitcount={bitcount} compression={compression}")
    h_abs = abs(h)
    row_bytes = w * 3
    stride = row_bytes + ((-row_bytes) % 4)
    raw = np.frombuffer(payload, dtype=np.uint8, count=stride * h_abs, offset=data_offset)
    rows = raw.reshape(h_abs, stride)[:, :row_bytes]
    if h > 0:  # bottom-up storage → flip to top-down
        rows = rows[::-1]
    # BGR → RGB
    body = np.ascontiguousarray(rows.reshape(h_abs, w, 3)[:, :, ::-1]).reshape(-1)
    return "image", w, h_abs, body


def _decode_wav(payload: bytes) -> tuple[str, int, int, np.ndarray]:
    if len(payload) < 12 or payload[8:12] != b"WAVE":
        raise ValueError("not a WAVE file")
    pos, channels, bits, data = 12, 0, 0, None
    while pos + 8 <= len(payload):
        cid, size = struct.unpack_from("<4sI", payload, pos)
        chunk = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_format, channels = struct.unpack_from("<HH", chunk, 0)
            bits = struct.unpack_from("<H", chunk, 14)[0]
            if audio_format != 1:
                raise NotImplementedError(f"WAV audio_format={audio_format} (non-PCM)")
        elif cid == b"data":
            data = chunk
        pos += 8 + size + (size & 1)
    if data is None or channels == 0:
        raise ValueError("WAV missing fmt/data chunk")
    # width = channels, height = bits/sample; body = raw sample bytes
    return "audio", channels, bits, np.frombuffer(data, dtype=np.uint8)


def _decode_ppm(payload: bytes) -> tuple[str, int, int, np.ndarray]:
    # header: P6, whitespace/comment-separated width height maxval, 1 ws byte
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise NotImplementedError("16-bit PPM")
    body = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
    return "image", w, h, body


def _decode(payload: bytes) -> tuple[str, int, int, np.ndarray]:
    """Dispatch on magic bytes: real codecs for BMP/WAV/PPM/PNG/JPEG/MP4,
    fixture parse for FEIM/FEAU/FEVI.

    Any malformed container (truncated chunk headers → struct.error /
    IndexError inside a codec) re-raises as ValueError so the operators'
    per-row dead-letter handling drops the ROW instead of one bad byte
    string in untrusted crawl data failing the whole Spark task."""
    try:
        return _decode_dispatch(payload)
    except (struct.error, IndexError) as e:
        raise ValueError(f"malformed media payload: {e}") from e


def _decode_dispatch(payload: bytes) -> tuple[str, int, int, np.ndarray]:
    if payload is None or len(payload) < 8:
        raise ValueError("truncated payload")
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    if payload[:4] == b"RIFF":
        return _decode_wav(payload)
    if payload[:2] == b"P6":
        return _decode_ppm(payload)
    if payload[:8] == codecs.PNG_MAGIC:
        w, h, _channels, body = codecs.decode_png(payload)
        return "image", w, h, body
    if payload[:2] == b"\xff\xd8":
        w, h, body = codecs.decode_jpeg(payload)
        return "image", w, h, body
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        w, h, body = codecs.decode_gif(payload)
        return "image", w, h, body
    if payload[4:8] == b"ftyp":
        info = codecs.parse_mp4(payload)
        # body = the track's sample bytes, concatenated in sample order
        body = np.frombuffer(
            b"".join(payload[o : o + s] for o, s in info["samples"]), dtype=np.uint8
        )
        return "video", info["width"], info["height"], body
    magic, rest = payload[:4], payload[4:]
    if magic not in _MAGIC:
        raise NotImplementedError(
            "unrecognized media container — extend frontier_engine.codecs or "
            "plug a PIL/ffmpeg decoder in here on a real cluster"
        )
    w, h = struct.unpack("<HH", rest[:4])
    body = np.frombuffer(rest[4:], dtype=np.uint8)
    return _MAGIC[magic], w, h, body


# back-compat alias (the stub grew into a real dispatcher)
_decode_stub = _decode


DECODED_SCHEMA = (
    "media_id long, kind string, width int, height int, n_bytes int, "
    "mean_byte double, byte_hist array<int>"
)


def decode_features(df: DataFrame) -> DataFrame:
    """mapInPandas: binary payload → decoded dims + byte-level features.

    The feature math (mean, 16-bin histogram) is real numpy over the whole
    Arrow batch; the codec handles uncompressed BMP/WAV/PPM plus the
    deterministic fixture format (compressed codecs raise → dropped here).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "kind": [], "width": [], "height": [],
                   "n_bytes": [], "mean_byte": [], "byte_hist": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                try:
                    kind, w, h, body = _decode(bytes(payload))
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
                    kind, w, h, body = _decode(bytes(payload))
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


def sample_frames(df: DataFrame, n_frames: int = 4,
                  keyframes_only: bool = False) -> DataFrame:
    """mapInPandas frame sampling for video payloads.

    MP4 payloads are demuxed for real: frames are the container's own
    samples (evenly spaced; ``keyframes_only`` restricts to stss sync
    samples, since only keyframes decode standalone) with ``frame_no`` =
    the 1-based sample number.  Fixture-format payloads fall back to
    deterministic equal strides over the body with 0-based ``frame_no``.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "frame_no": [], "frame": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                raw = bytes(payload)
                if len(raw) >= 8 and raw[4:8] == b"ftyp":
                    try:
                        frames = codecs.mp4_sample_frames(raw, n_frames, keyframes_only)
                    except (NotImplementedError, ValueError, struct.error):
                        continue
                    for sn, fb in frames:
                        rows["media_id"].append(mid)
                        rows["frame_no"].append(sn)
                        rows["frame"].append(fb)
                    continue
                try:
                    kind, w, h, body = _decode(raw)
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


# --------------------------------------------------------------- MIME sniff

# (hex-of-prefix, hex-at-offset-or-None, mime) — first match wins, ordered
# so container formats with a shared outer magic (RIFF) check their inner
# tag before the generic fallthrough
_MAGIC_TABLE: list[tuple[int, str, str]] = [
    # (1-based byte offset, uppercase hex to match at that offset, mime)
    (1, "89504E470D0A1A0A", "image/png"),
    (1, "FFD8FF", "image/jpeg"),
    (1, "474946383761", "image/gif"),
    (1, "474946383961", "image/gif"),
    (9, "57415645", "audio/x-wav"),      # RIFF....WAVE
    (9, "41564920", "video/x-msvideo"),  # RIFF....AVI<sp>
    (5, "66747970", "video/mp4"),        # ....ftyp (ISO-BMFF)
    (1, "424D", "image/bmp"),
    (1, "25504446", "application/pdf"),  # %PDF
    (1, "1F8B", "application/gzip"),
    (1, "504B0304", "application/zip"),
    (1, "3C21444F43545950", "text/html"),  # <!DOCTYP
    (1, "3C68746D6C", "text/html"),        # <html
    (1, "3C48544D4C", "text/html"),        # <HTML
]

_RIFF_HEX = "52494646"


def sniff_mime_col(payload: F.Column) -> F.Column:
    """Magic-byte MIME detection over an opaque ``binary`` column — the
    content-type triage a crawler runs on every fetched body BEFORE
    routing it to the right decode path (HTML → extract, image/audio →
    :func:`decode_features`, archives → dead-letter or unpack). Server
    ``Content-Type`` headers lie; the bytes don't (this is the
    WHATWG-MIME-sniffing core, restricted to unambiguous signatures).

    Expression-only: each probe hex-encodes a ≤ 8-byte ``substring`` of
    the payload (binary slicing is a codegen'd JVM op; the full payload is
    never hex-expanded), so the whole CASE stays inside whole-stage
    codegen — no UDF, no Python, safe to run on 100 TB of fetched bodies.
    RIFF containers (WAV/AVI) additionally match their inner fourcc; MP4
    matches ``ftyp`` at offset 5 regardless of the leading box length."""
    def probe(off: int, hexs: str) -> F.Column:
        return F.hex(F.substring(payload, off, len(hexs) // 2)) == F.lit(hexs)

    expr = F.lit("application/octet-stream")
    for off, hexs, mime in reversed(_MAGIC_TABLE):
        cond = probe(off, hexs)
        if off == 9:  # RIFF inner tags only count inside a RIFF outer box
            cond = cond & probe(1, _RIFF_HEX)
        expr = F.when(cond, F.lit(mime)).otherwise(expr)
    return expr


def sniff_mime_py(payload: bytes) -> str:
    """Byte-identical Python twin of :func:`sniff_mime_col` (oracle/tests)."""
    if payload is None:
        return "application/octet-stream"
    hx = payload.hex().upper()
    for off, hexs, mime in _MAGIC_TABLE:
        start = (off - 1) * 2
        if hx[start : start + len(hexs)] == hexs:
            if off == 9 and hx[:8] != _RIFF_HEX:
                continue
            return mime
    return "application/octet-stream"


def _wav_samples(payload: bytes) -> tuple[int, np.ndarray]:
    """(sample_rate, mono int32 samples) from a PCM RIFF/WAVE payload.
    8-bit unsigned is centered to signed by −128; 16-bit is little-endian
    signed; multi-channel audio is mixed down by integer-floor channel
    mean, so every returned value is integer-exact and SQL-replayable.
    Malformed chunk structure raises ``ValueError`` (struct.error is
    converted, like the ``_decode`` dispatcher) so callers' dead-letter
    handlers see one exception family."""
    if len(payload) < 12 or payload[8:12] != b"WAVE":
        raise ValueError("not a WAVE file")
    pos, channels, bits, rate, data = 12, 0, 0, 0, None
    try:
        while pos + 8 <= len(payload):
            cid, size = struct.unpack_from("<4sI", payload, pos)
            chunk = payload[pos + 8 : pos + 8 + size]
            if cid == b"fmt ":
                audio_format, channels, rate = struct.unpack_from("<HHI", chunk, 0)
                bits = struct.unpack_from("<H", chunk, 14)[0]
                if audio_format != 1:
                    raise NotImplementedError(
                        f"WAV audio_format={audio_format} (non-PCM)"
                    )
            elif cid == b"data":
                data = chunk
            pos += 8 + size + (size & 1)
    except struct.error as e:  # truncated fmt chunk etc.
        raise ValueError(f"malformed WAV chunk: {e}") from e
    if data is None or channels == 0 or rate == 0:
        raise ValueError("WAV missing fmt/data chunk")
    if bits == 16:
        s = np.frombuffer(data, dtype="<i2", count=len(data) // 2).astype(np.int32)
    elif bits == 8:
        s = np.frombuffer(data, dtype=np.uint8).astype(np.int32) - 128
    else:
        raise NotImplementedError(f"WAV bits={bits}")
    if channels > 1:
        usable = (len(s) // channels) * channels
        s = s[:usable].reshape(-1, channels).sum(axis=1) // channels
    return rate, s


AUDIO_SCHEMA = (
    "media_id long, sample_rate int, n_samples long, duration_ms long, "
    "peak int, zero_crossings long, rms double, spectral_centroid_hz double"
)


def audio_features(
    df: DataFrame, payload_col: str = "payload", id_col: str = "media_id"
) -> DataFrame:
    """Arrow-batched audio feature extraction over PCM WAV binary columns —
    the audio leg of the multimodal decode story (the gates an audio-text
    curation pipeline filters on: silence/clipping via ``peak``/``rms``,
    tone-vs-noise via ``zero_crossings`` and ``spectral_centroid_hz``,
    duration buckets via ``duration_ms``).

    Everything except the two float features is integer-exact
    (``duration_ms`` is integer math: ``n_samples * 1000 // rate``), so a
    SQL oracle replays them from a closed-form fixture; ``rms`` is one
    float64 sqrt-of-integer-mean and ``spectral_centroid_hz`` the
    rFFT-magnitude-weighted mean frequency (numpy per batch, module-tested
    against a direct numpy oracle). Undecodable payloads are dropped —
    same dead-letter semantics as :func:`decode_features`."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "media_id", "sample_rate", "n_samples", "duration_ms",
                "peak", "zero_crossings", "rms", "spectral_centroid_hz",
            )}
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue
                try:
                    rate, s = _wav_samples(bytes(payload))
                except (NotImplementedError, ValueError):
                    continue
                n = int(s.size)
                if n == 0:
                    continue
                neg = s < 0
                zc = int(np.count_nonzero(neg[1:] != neg[:-1]))
                sq = s.astype(np.float64)
                rms = float(np.sqrt((sq * sq).sum() / n))
                mag = np.abs(np.fft.rfft(sq))
                freqs = np.fft.rfftfreq(n, d=1.0 / rate)
                msum = float(mag.sum())
                centroid = float((mag * freqs).sum() / msum) if msum > 0 else 0.0
                out["media_id"].append(mid)
                out["sample_rate"].append(rate)
                out["n_samples"].append(n)
                out["duration_ms"].append(n * 1000 // rate)
                out["peak"].append(int(np.abs(s).max()))
                out["zero_crossings"].append(zc)
                out["rms"].append(rms)
                out["spectral_centroid_hz"].append(centroid)
            if out["media_id"]:
                yield pd.DataFrame(out)

    return df.select(
        F.col(id_col).alias(id_col), F.col(payload_col).alias(payload_col)
    ).mapInPandas(run, schema=AUDIO_SCHEMA)


RESAMPLED_SCHEMA = "media_id long, sample_rate int, n_samples long, payload binary"


def audio_resample(
    df: DataFrame,
    target_rate: int,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """The audio analogue of :func:`resize`: re-encode each PCM WAV at
    ``target_rate`` by linear interpolation over the mono mixdown
    (``np.interp`` on the exact sample grid — deterministic float64,
    rounded half-away-from-zero back to int16). Output length is
    ``n * target_rate // rate``; payloads are re-encoded WAV so the
    result feeds straight back into :func:`audio_features` /
    :func:`spectrogram_frames`. Undecodable rows drop, as everywhere in
    this module."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "sample_rate": [], "n_samples": [], "payload": []}
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue
                try:
                    rate, s = _wav_samples(bytes(payload))
                except (NotImplementedError, ValueError):
                    continue
                n_out = max(1, int(len(s)) * target_rate // rate)
                src = np.arange(len(s), dtype=np.float64)
                dst = np.arange(n_out, dtype=np.float64) * (rate / target_rate)
                vals = np.interp(dst, src, s.astype(np.float64))
                # half-away-from-zero: trunc, not floor (floor would shift
                # every negative sample down by 1, a DC bias)
                res = np.clip(
                    np.trunc(vals + np.where(vals >= 0, 0.5, -0.5)),
                    -32768,
                    32767,
                ).astype(np.int16)
                out["media_id"].append(mid)
                out["sample_rate"].append(target_rate)
                out["n_samples"].append(n_out)
                out["payload"].append(encode_wav(res, sample_rate=target_rate))
            if out["media_id"]:
                yield pd.DataFrame(out)

    return df.select(
        F.col(id_col).alias(id_col), F.col(payload_col).alias(payload_col)
    ).mapInPandas(run, schema=RESAMPLED_SCHEMA)


SPECTROGRAM_SCHEMA = "media_id long, frame_no int, band_energy array<double>"


def spectrogram_frames(
    df: DataFrame,
    n_fft: int = 64,
    n_frames: int = 4,
    n_bands: int = 8,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """The audio analogue of :func:`sample_frames`: ``n_frames`` evenly
    spaced windows of ``n_fft`` samples per clip, each reduced to an
    ``n_bands``-band magnitude spectrum (rFFT magnitudes, contiguous-bin
    mean — the log-mel-style feature grid audio curation pipelines
    cluster/filter on, minus the mel warp, which keeps it exactly
    reproducible from first principles). Frames starting past the end are
    zero-padded; clips shorter than one window still emit frame 0. All
    float64 numpy over the Arrow batch, no per-sample Python."""
    if n_fft // 2 % n_bands:
        raise ValueError(
            f"n_bands={n_bands} must divide n_fft//2={n_fft // 2}"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_no": [], "band_energy": []}
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue
                try:
                    _, s = _wav_samples(bytes(payload))
                except (NotImplementedError, ValueError):
                    continue
                sf_ = s.astype(np.float64)
                starts = [
                    (k * max(0, len(s) - n_fft)) // max(1, n_frames - 1)
                    if n_frames > 1
                    else 0
                    for k in range(n_frames)
                ]
                for k, st in enumerate(starts):
                    win = sf_[st : st + n_fft]
                    if len(win) < n_fft:
                        win = np.pad(win, (0, n_fft - len(win)))
                    mag = np.abs(np.fft.rfft(win))[: (n_fft // 2)]
                    bands = mag.reshape(n_bands, -1).mean(axis=1)
                    out["media_id"].append(mid)
                    out["frame_no"].append(k)
                    out["band_energy"].append(bands.tolist())
            if out["media_id"]:
                yield pd.DataFrame(out)

    return df.select(
        F.col(id_col).alias(id_col), F.col(payload_col).alias(payload_col)
    ).mapInPandas(run, schema=SPECTROGRAM_SCHEMA)


DHASH_SCHEMA = "media_id long, width int, height int, dhash string"


def dhash_features(
    df: DataFrame,
    grid_w: int = 9,
    grid_h: int = 8,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """Perceptual image hash (dHash) over DECODED pixels — the visual
    near-dup key an image-dedup pass groups on (identical renderings hash
    equal regardless of container/byte-level differences; the gradient
    structure survives re-encoding). Per image: decode via the real codec
    dispatcher → grayscale (channel mean) → block-mean downscale to a
    ``grid_w × grid_h`` grid → 1 bit per horizontal neighbor pair
    (``g[y,x] > g[y,x+1]``), emitted as a 16-hex-char string built from
    two 32-bit halves (no signed-64 overflow, engine/SQL-safe).

    Determinism: when block edges divide the image (``w % grid_w == 0``,
    ``h % grid_h == 0`` — enforced; non-conforming or undecodable rows are
    dropped per-row like every decode op here) and blocks are
    power-of-two sized, the block mean is an exact float64 (integer sum /
    power of two), so the bit pattern is reproducible bit-for-bit by an
    independent engine. mapInPandas, one Arrow batch at a time; pixels
    never shuffle — only (id, 16-char hash) rows leave the scan."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, out = [], [], [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue
                try:
                    kind, w, h, body = _decode(bytes(payload))
                    if kind != "image" or w % grid_w or h % grid_h:
                        continue
                    px = body.reshape(h, w, -1).astype(np.float64)
                    gray = px.mean(axis=2)
                    bw, bh = w // grid_w, h // grid_h
                    g = gray.reshape(grid_h, bh, grid_w, bw).mean(axis=(1, 3))
                    bits = g[:, :-1] > g[:, 1:]
                    flat = bits.reshape(-1)
                    lo = hi = 0
                    for k in range(min(64, flat.size)):
                        if flat[k]:
                            if k < 32:
                                lo |= 1 << k
                            else:
                                hi |= 1 << (k - 32)
                    ids.append(int(mid))
                    ws.append(int(w))
                    hs.append(int(h))
                    out.append(f"{hi:08x}{lo:08x}")
                except (ValueError, NotImplementedError):
                    continue
            yield pd.DataFrame(
                {"media_id": ids, "width": ws, "height": hs, "dhash": out}
            )

    return df.select(
        F.col(id_col).alias(id_col), F.col(payload_col).alias(payload_col)
    ).mapInPandas(run, schema=DHASH_SCHEMA)
