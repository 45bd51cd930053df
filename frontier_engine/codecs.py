"""Pure-Python/numpy compressed-media codecs: PNG, baseline JPEG, MP4.

Round 2 shipped real codecs only for UNCOMPRESSED containers (BMP/WAV/PPM)
and documented JPEG/PNG/MP4 as environment-blocked ("no PIL/ffmpeg in this
container").  That was too pessimistic: everything these three formats need
is in the stdlib + numpy —

- **PNG**   : DEFLATE is stdlib ``zlib``; the five scanline filters
  (None/Sub/Up/Average/Paeth) are numpy arithmetic.  Full decode for 8-bit
  greyscale / RGB / RGBA / indexed-PLTE, interlace 0 and Adam7 (each pass
  unfiltered as a sub-image, strided-scattered into place), with chunk-CRC
  verification on untrusted input.
- **JPEG**  : baseline sequential DCT (SOF0) *and* progressive (SOF2) with
  the full Annex-G repertoire — spectral selection, successive approximation
  (DC + AC refinement scans), EOB runs.  Huffman tables are read from the
  file's own DHT segments (canonical bits/values form), dequantization from
  DQT, IDCT is an orthonormal 8×8 DCT matrix product over all blocks at
  once (numpy einsum), chroma subsampling up to 2×2 handled by pixel
  replication.  Arithmetic coding / lossless / 12-bit raise
  ``NotImplementedError``.
- **MP4**   : ISO-BMFF container demux — walk ``moov/trak/mdia/minf/stbl``,
  resolve the sample tables (stsz × stsc × stco/co64, stss sync samples,
  stts durations) into per-sample byte ranges, and slice frames straight
  out of ``mdat``.  This is container-level frame *sampling* (what a
  training-data pipeline needs to shard video); decoding the H.26x payload
  inside each sample is a genuine plug-point for a real decoder.

Encoders (``encode_png`` / ``encode_jpeg`` / ``mux_mp4``) exist so tests can
synthesise deterministic media offline and round-trip it; they write
spec-conformant output (PNG filter types selectable per row to exercise
every unfilter path; JPEG 4:4:4 or 4:2:0 with restart intervals).

These are deliberately *baseline-speed* implementations: entropy decode is a
Python bit loop, fine for test corpora and correct on real files, and the
natural place to swap in PIL/ffmpeg on a cluster where those exist.  The
reference scraper shells media handling out entirely (it stores URLs only,
``/root/reference/crawler/stores/bhx.py`` keeps ``image`` as a string
column), so this whole module is additive capability.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# Untrusted-input allocation guard: header-declared dimensions/counts are
# bounded BEFORE any pixel/sample buffer is allocated.  Without this, a
# ~100-byte crafted payload (SOF claiming 65535×65535, or an stsz count of
# 2^32) makes the decoder allocate tens of GB and OOM the executor — and
# because the OOM kills the task rather than raising, Spark retries the same
# row and fails the job, defeating the per-row dead-letter posture the
# multimodal operators promise.  A ``ValueError`` here dead-letters the row.
MAX_PIXELS = 1 << 26  # 67.1 Mpx (≈ 8192×8192) → ≤ 192 MiB as RGB uint8


def _check_pixels(w: int, h: int, fmt: str, max_pixels: int | None = None) -> None:
    cap = MAX_PIXELS if max_pixels is None else max_pixels
    if w * h > cap:
        raise ValueError(f"{fmt} dimensions {w}x{h} exceed pixel cap {cap}")

# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

# color type → samples per pixel (8-bit depth only)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _png_chunks(payload: bytes):
    """Yield (type, data) for each chunk, verifying CRCs (untrusted input)."""
    pos = 8
    while pos + 8 <= len(payload):
        (length,), ctype = struct.unpack_from(">I", payload, pos), payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) < length or pos + 12 + length > len(payload):
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        yield ctype, data
        pos += 12 + length
        if ctype == b"IEND":
            return
    raise ValueError("PNG missing IEND")


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    p = a.astype(np.int32) + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


# Adam7 pass geometry: (xstart, ystart, xstep, ystep) per pass
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _adam7_dims(w: int, h: int) -> list[tuple[int, int]]:
    """(pass_width, pass_height) for each Adam7 pass over a w×h image."""
    return [
        (
            (w - xs + xstep - 1) // xstep if w > xs else 0,
            (h - ys + ystep - 1) // ystep if h > ys else 0,
        )
        for xs, ys, xstep, ystep in _ADAM7
    ]


def _png_unfilter(raw: np.ndarray, w: int, h: int, channels: int) -> np.ndarray:
    """Reverse PNG row filters over one (sub-)image: ``raw`` is the
    ``h*(w*channels+1)`` filtered byte stream (filter byte + row data),
    returns the reconstructed uint8 pixel bytes, shape ``(h, w*channels)``."""
    stride = w * channels
    rows = raw.reshape(h, stride + 1)
    filters, data = rows[:, 0], rows[:, 1:].astype(np.int32)
    out = np.zeros((h, stride), dtype=np.int32)
    prev = np.zeros(stride, dtype=np.int32)
    bpp = channels
    for y in range(h):
        f, cur = int(filters[y]), data[y]
        if f == 0:
            rec = cur
        elif f == 1:  # Sub: prefix sum along the pixel axis, per byte lane
            rec = np.cumsum(cur.reshape(w, bpp), axis=0).reshape(stride)
        elif f == 2:  # Up
            rec = cur + prev
        elif f in (3, 4):  # Average / Paeth: sequential in x, vector over lanes
            rec2 = np.zeros((w, bpp), dtype=np.int32)
            cur2, prev2 = cur.reshape(w, bpp), (prev % 256).reshape(w, bpp)
            left = np.zeros(bpp, dtype=np.int32)
            upleft = np.zeros(bpp, dtype=np.int32)
            for x in range(w):
                up = prev2[x]
                if f == 3:
                    pred = (left + up) >> 1
                else:
                    pred = _paeth(left, up, upleft)
                left = (cur2[x] + pred) % 256
                rec2[x] = left
                upleft = up
            rec = rec2.reshape(stride)
        else:
            raise ValueError(f"PNG filter type {f}")
        rec = rec % 256
        out[y] = rec
        prev = rec
    return out.astype(np.uint8)


def decode_png(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """Decode a PNG → ``(width, height, channels, uint8 body)``.

    body is the reconstructed pixel bytes, row-major, ``h*w*channels`` long.
    8-bit depth, color types 0/2/3/4/6 (indexed images come back as RGB via
    PLTE), interlace 0 or 1 (Adam7: each pass unfiltered as its own
    sub-image, then scattered into place with strided assignment).  Raises
    ``ValueError`` on malformed input, ``NotImplementedError`` on
    valid-but-unsupported.
    """
    if payload[:8] != PNG_MAGIC:
        raise ValueError("not a PNG")
    w = h = channels = None
    color = -1
    interlace = 0
    palette = None
    idat = bytearray()
    for ctype, data in _png_chunks(payload):
        if ctype == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(">IIBBBBB", data)
            if depth != 8:
                raise NotImplementedError(f"PNG bit depth {depth}")
            if color != 3 and color not in _PNG_CHANNELS:
                raise ValueError(f"PNG color type {color}")
            if comp != 0 or filt != 0:
                raise ValueError("PNG bad compression/filter method")
            if interlace not in (0, 1):
                raise ValueError(f"PNG interlace method {interlace}")
            _check_pixels(w, h, "PNG")
            channels = 1 if color == 3 else _PNG_CHANNELS[color]
        elif ctype == b"PLTE":
            if len(data) % 3 or not data:
                raise ValueError("PNG PLTE size not a multiple of 3")
            palette = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += data
    if w is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    if color == 3 and palette is None:
        raise ValueError("PNG palette image missing PLTE")
    if w == 0 or h == 0:
        raise ValueError("PNG zero dimension")
    stride = w * channels
    if interlace == 0:
        expected = h * (stride + 1)
    else:
        expected = sum(
            ph * (pw * channels + 1) for pw, ph in _adam7_dims(w, h) if pw and ph
        )
    try:
        # bounded inflate: ask for at most expected+1 bytes so a DEFLATE
        # bomb inside a small-dimension header can't allocate past the cap
        # (an overlong stream yields expected+1 bytes → size mismatch below)
        raw = np.frombuffer(
            zlib.decompressobj().decompress(bytes(idat), expected + 1),
            dtype=np.uint8,
        )
    except zlib.error as e:
        raise ValueError(f"PNG IDAT inflate failed: {e}") from e
    if len(raw) != expected:
        raise ValueError("PNG decompressed size mismatch")
    if interlace == 0:
        body = _png_unfilter(raw, w, h, channels).reshape(-1)
    else:
        full = np.zeros((h, w, channels), dtype=np.uint8)
        pos = 0
        for (xs, ys, xstep, ystep), (pw, ph) in zip(_ADAM7, _adam7_dims(w, h)):
            if not pw or not ph:
                continue
            size = ph * (pw * channels + 1)
            sub = _png_unfilter(raw[pos : pos + size], pw, ph, channels)
            full[ys::ystep, xs::xstep] = sub.reshape(ph, pw, channels)
            pos += size
        body = full.reshape(-1)
    if color == 3:  # indexed: map through PLTE → RGB (tRNS rendered opaque)
        if int(body.max(initial=0)) >= len(palette):
            raise ValueError("PNG palette index out of range")
        return w, h, 3, palette[body].reshape(-1)
    return w, h, channels, body


def _png_filter_rows(sub: np.ndarray, filters) -> bytearray:
    """Apply PNG row filters to one (sub-)image ``(h, w, channels)`` →
    the filtered byte stream (filter byte + row data per row)."""
    h, w, bpp = sub.shape
    if isinstance(filters, int):
        filters = [filters] * h
    px = sub.astype(np.int32).reshape(h, w * bpp)
    lines = bytearray()
    prev = np.zeros(w * bpp, dtype=np.int32)
    for y in range(h):
        f, cur = filters[y], px[y]
        cur2 = cur.reshape(w, bpp)
        left = np.zeros((w, bpp), dtype=np.int32)
        left[1:] = cur2[:-1]
        up = prev.reshape(w, bpp)
        upleft = np.zeros((w, bpp), dtype=np.int32)
        upleft[1:] = up[:-1]
        if f == 0:
            filt = cur
        elif f == 1:
            filt = (cur2 - left).reshape(-1)
        elif f == 2:
            filt = cur - prev
        elif f == 3:
            filt = (cur2 - ((left + up) >> 1)).reshape(-1)
        elif f == 4:
            filt = (cur2 - _paeth(left, up, upleft)).reshape(-1)
        else:
            raise ValueError(f"filter {f}")
        lines.append(f)
        lines += (filt % 256).astype(np.uint8).tobytes()
        prev = cur
    return lines


def encode_png(pixels: np.ndarray, filters=0, interlace: bool = False) -> bytes:
    """Encode uint8 pixels of shape (h, w) or (h, w, channels) as PNG.

    ``filters``: a single filter type (0-4) or a per-row list — selectable
    so tests can exercise every unfilter path in :func:`decode_png`.
    ``interlace``: write Adam7 interlaced (each pass extracted by strided
    slicing and filtered as its own sub-image), exercising the decoder's
    deinterlace path; per-row ``filters`` lists apply per pass row stream.
    """
    if pixels.ndim == 2:
        pixels = pixels[:, :, None]
    h, w, channels = pixels.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    if not interlace:
        lines = _png_filter_rows(pixels, filters)
    else:
        lines = bytearray()
        for (xs, ys, xstep, ystep), (pw, ph) in zip(_ADAM7, _adam7_dims(w, h)):
            if not pw or not ph:
                continue
            sub = pixels[ys::ystep, xs::xstep]
            # per-row filter lists map by ORIGINAL image row (a row spans
            # several passes), so pass rows inherit their source row's filter
            fs = filters if isinstance(filters, int) else filters[ys::ystep]
            lines += _png_filter_rows(np.ascontiguousarray(sub), fs)
    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 1 if interlace else 0)
    return (PNG_MAGIC + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(lines), 6)) + chunk(b"IEND", b""))


# ---------------------------------------------------------------------------
# JPEG (baseline sequential, SOF0)
# ---------------------------------------------------------------------------

def _zigzag_order() -> np.ndarray:
    """The 8×8 zigzag scan as flat indices, generated (not hardcoded):
    anti-diagonals in order, odd diagonals top-down, even bottom-up."""
    order = []
    for s in range(15):
        ij = [(i, s - i) for i in range(max(0, s - 7), min(8, s + 1))]
        order += ij if s % 2 == 1 else ij[::-1]
    return np.array([i * 8 + j for i, j in order], dtype=np.int64)


_ZIGZAG = _zigzag_order()          # natural ← zigzag position k
_UNZIGZAG = np.argsort(_ZIGZAG)    # zigzag position ← natural

# orthonormal 8-point DCT-II matrix (matches JPEG Annex A's FDCT scaling)
_DCT = np.array([
    [(np.sqrt(1 / 8) if u == 0 else 0.5) * np.cos((2 * x + 1) * u * np.pi / 16)
     for x in range(8)] for u in range(8)])


class _BitReader:
    """MSB-first bit reader over the unstuffed entropy-coded segment."""

    def __init__(self, data: bytes):
        self.data, self.pos, self.bit = data, 0, 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise ValueError("JPEG entropy data exhausted")
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit, self.pos = 0, self.pos + 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _huff_decode_table(bits: list[int], vals: bytes) -> dict[tuple[int, int], int]:
    """Canonical Huffman (DHT bits/values form) → {(length, code): symbol}."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_encode_table(bits: list[int], vals: bytes) -> dict[int, tuple[int, int]]:
    return {sym: (ln, code) for (ln, code), sym in _huff_decode_table(bits, vals).items()}


def _read_huff_symbol(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, t: int) -> int:
    """DECODE_EXTEND: map t raw bits to a signed coefficient."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Baseline *or progressive* JFIF/JPEG → ``(width, height, RGB uint8 body)``.

    Quant + Huffman tables come from the stream's own DQT/DHT segments;
    restart markers reset DC predictors; chroma h/v sampling factors up to
    2 are upsampled by replication.  Progressive (SOF2) decodes the full
    T.81 Annex-G repertoire: spectral selection, successive approximation
    (DC and AC refinement scans, EOB runs), interleaved DC scans, and
    per-scan DHT redefinition.  ``ValueError`` on malformed input,
    ``NotImplementedError`` on arithmetic-coded/lossless/12-bit variants.
    """
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class 0=DC/1=AC, id) → table
    frame = None
    restart_interval = 0
    grids = None  # progressive: comp id → zigzag coefficient grid
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("JPEG marker expected")
        marker = payload[pos + 1]
        if marker == 0xFF:  # fill byte
            pos += 1
            continue
        if marker == 0xD8:
            pos += 2
            continue
        if marker == 0xD9:  # EOI — no length field
            break
        (seglen,) = struct.unpack_from(">H", payload, pos + 2)
        seg = payload[pos + 4 : pos + 2 + seglen]
        if len(seg) != seglen - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                tbl = np.frombuffer(seg[p + 1 : p + 65], dtype=np.uint8)
                if len(tbl) != 64:
                    raise ValueError("short DQT")
                nat = np.zeros(64, dtype=np.int32)
                nat[_ZIGZAG] = tbl  # DQT is in zigzag order
                qt[tq] = nat
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                vals = seg[p + 17 : p + 17 + n]
                if len(bits) != 16 or len(vals) != n:
                    raise ValueError("short DHT")
                huff[(tc, th)] = _huff_decode_table(bits, vals)
                p += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            prec, h, w, nc = seg[0], *struct.unpack_from(">HH", seg, 1), seg[5]
            if prec != 8:
                raise NotImplementedError("12-bit JPEG")
            _check_pixels(w, h, "JPEG")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i], seg[7 + 3 * i], seg[8 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {"w": w, "h": h, "comps": comps,
                     "progressive": marker == 0xC2}
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError("non-baseline JPEG (lossless/arithmetic)")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                comp = next(c for c in frame["comps"] if c["id"] == cs)
                scan.append({**comp, "dc": tt >> 4, "ac": tt & 0xF})
            data_start = pos + 2 + seglen
            if not frame["progressive"]:
                return _decode_scan(payload, data_start, frame, scan, qt, huff,
                                    restart_interval)
            if len(seg) < 1 + 2 * ns + 3:
                raise ValueError("short progressive SOS header")
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            if grids is None:
                grids = _alloc_coef_grids(frame)
            data, pos = _entropy_data(payload, data_start)
            _progressive_scan(data, frame, scan, huff, grids,
                              ss, se, ahal >> 4, ahal & 0xF, restart_interval)
            continue
        pos += 2 + seglen
    if grids is not None:
        return _finish_jpeg(frame, qt, grids)
    raise ValueError("JPEG missing SOS")


def _entropy_data(payload: bytes, start: int) -> tuple[bytes, int]:
    """Unstuff one scan's entropy bytes: FF00→FF; drop RSTn markers (the
    encoder pads to a byte boundary before each, so the decoder realigns);
    stop at any other marker.  Returns (data, position of the terminator)."""
    data = bytearray()
    p = start
    while p < len(payload):
        b = payload[p]
        if b == 0xFF:
            nxt = payload[p + 1] if p + 1 < len(payload) else 0xD9
            if nxt == 0x00:
                data.append(0xFF)
                p += 2
                continue
            if 0xD0 <= nxt <= 0xD7:  # RSTn
                p += 2
                continue
            break
        data.append(b)
        p += 1
    return bytes(data), min(p, len(payload))


def _frame_geometry(frame):
    """(hmax, vmax, mcux, mcuy) for a validated frame header."""
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    if w == 0 or h == 0:
        raise ValueError("JPEG zero dimension")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax > 2 or vmax > 2 or any(c["h"] == 0 or c["v"] == 0 for c in comps):
        raise NotImplementedError("sampling factors beyond 2×2")
    return hmax, vmax, -(-w // (8 * hmax)), -(-h // (8 * vmax))


def _alloc_coef_grids(frame):
    """Per-component zigzag-order coefficient grids, MCU-padded."""
    _, _, mcux, mcuy = _frame_geometry(frame)
    return {c["id"]: np.zeros((mcuy * c["v"], mcux * c["h"], 64), dtype=np.int32)
            for c in frame["comps"]}


def _decode_scan(payload, start, frame, scan, qt, huff, restart_interval):
    data, _ = _entropy_data(payload, start)
    comps = scan
    hmax, vmax, mcux, mcuy = _frame_geometry({**frame, "comps": scan})
    # per-component coefficient block grids
    blocks = {c["id"]: np.zeros((mcuy * c["v"], mcux * c["h"], 64), dtype=np.int32)
              for c in comps}
    br = _BitReader(data)
    pred = {c["id"]: 0 for c in comps}
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                # realign to the byte boundary recorded at the RST marker
                if br.bit:
                    br.pos += 1
                    br.bit = 0
                pred = {c["id"]: 0 for c in comps}
            for c in comps:
                dc_tbl = huff.get((0, c["dc"]))
                ac_tbl = huff.get((1, c["ac"]))
                if dc_tbl is None or ac_tbl is None:
                    raise ValueError("JPEG scan references missing DHT")
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coef = np.zeros(64, dtype=np.int32)
                        t = _read_huff_symbol(br, dc_tbl)
                        diff = _extend(br.read_bits(t), t) if t else 0
                        pred[c["id"]] += diff
                        coef[0] = pred[c["id"]]
                        k = 1
                        while k < 64:
                            rs = _read_huff_symbol(br, ac_tbl)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC run past block end")
                            coef[k] = _extend(br.read_bits(s), s)
                            k += 1
                        blocks[c["id"]][my * c["v"] + by, mx * c["h"] + bx] = coef
            mcu_count += 1

    return _finish_jpeg(frame, qt, blocks)


def _finish_jpeg(frame, qt, blocks):
    """Dequantize → IDCT → upsample → color-convert the coefficient grids."""
    w, h = frame["w"], frame["h"]
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    planes = []
    for c in comps:
        q = qt.get(c["tq"])
        if q is None:
            raise ValueError("JPEG scan references missing DQT")
        grid = blocks[c["id"]]
        ny, nx = grid.shape[:2]
        # reorder coefficients zigzag → natural, THEN dequantize (q is stored
        # in natural order), then IDCT every block at once.  Orthonormal DCT
        # matrix: inverse is C^T·A·C, computed as Σ_k Σ_l C[k,i]·A[k,l]·C[l,j].
        nat = (grid[:, :, _UNZIGZAG] * q[None, None, :]).astype(np.float64)
        nat = nat.reshape(ny, nx, 8, 8)
        spat = np.einsum("ki,yxkl,lj->yxij", _DCT, nat, _DCT, optimize=True)
        plane = (spat.transpose(0, 2, 1, 3).reshape(ny * 8, nx * 8) + 128.0)
        # upsample by replication to full-res grid
        plane = np.repeat(np.repeat(plane, vmax // c["v"], axis=0),
                          hmax // c["h"], axis=1)
        planes.append(plane[:h, :w])
    if len(planes) == 3:
        y, cb, cr = planes
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        rgb = np.stack([r, g, b], axis=-1)
    elif len(planes) == 1:
        rgb = np.repeat(planes[0][:, :, None], 3, axis=2)
    else:
        raise NotImplementedError(f"{len(planes)}-component JPEG")
    body = np.clip(np.round(rgb), 0, 255).astype(np.uint8).reshape(-1)
    return w, h, body


def _comp_block_dims(frame, c) -> tuple[int, int]:
    """(rows, cols) of *actual* (non-MCU-padded) blocks for one component —
    the traversal extent of a non-interleaved progressive scan (T.81 A.2.2)."""
    hmax = max(x["h"] for x in frame["comps"])
    vmax = max(x["v"] for x in frame["comps"])
    cw = -(-frame["w"] * c["h"] // hmax)
    ch = -(-frame["h"] * c["v"] // vmax)
    return -(-ch // 8), -(-cw // 8)


def _progressive_scan(data, frame, scan, huff, grids, ss, se, ah, al,
                      restart_interval):
    """Decode one progressive scan (T.81 Annex G.2) into the zigzag-order
    coefficient ``grids``: spectral selection ``Ss..Se``, successive
    approximation ``Ah/Al`` (first pass when Ah=0, refinement otherwise),
    EOB runs, interleaved DC scans, restart realignment.  The refinement
    control flow follows the spec's figures G.7/G.8 (the same structure as
    libjpeg's jdphuff.c, which is the canonical public reading of them)."""
    br = _BitReader(data)
    _, _, mcux, mcuy = _frame_geometry(frame)
    if se > 63 or ss > se:
        raise ValueError("JPEG bad spectral selection")
    is_dc = ss == 0
    if is_dc and se != 0:
        raise ValueError("JPEG progressive DC scan must have Se=0")
    if not is_dc and len(scan) != 1:
        raise ValueError("JPEG progressive AC scan must be non-interleaved")

    state = {"eobrun": 0, "pred": {c["id"]: 0 for c in scan}}

    def restart():
        if br.bit:  # realign to the byte boundary at the RST marker
            br.pos += 1
            br.bit = 0
        state["eobrun"] = 0
        state["pred"] = {c["id"]: 0 for c in scan}

    dc_tbls = {}
    if is_dc and ah == 0:
        for c in scan:
            tbl = huff.get((0, c["dc"]))
            if tbl is None:
                raise ValueError("JPEG scan references missing DHT")
            dc_tbls[c["id"]] = tbl

    def dc_block(c, row, col):
        coef = grids[c["id"]][row, col]
        if ah == 0:
            t = _read_huff_symbol(br, dc_tbls[c["id"]])
            diff = _extend(br.read_bits(t), t) if t else 0
            state["pred"][c["id"]] += diff
            coef[0] = state["pred"][c["id"]] << al
        elif br.read_bit():
            coef[0] = int(coef[0]) | (1 << al)

    def ac_first(coef, ac_tbl):
        if state["eobrun"] > 0:
            state["eobrun"] -= 1
            return
        k = ss
        while k <= se:
            rs = _read_huff_symbol(br, ac_tbl)
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r == 15:  # ZRL
                    k += 16
                    continue
                state["eobrun"] = (1 << r) - 1
                if r:
                    state["eobrun"] += br.read_bits(r)
                break
            k += r
            if k > se:
                raise ValueError("JPEG AC run past band end")
            coef[k] = _extend(br.read_bits(s), s) << al
            k += 1

    def ac_refine(coef, ac_tbl):
        p1, m1 = 1 << al, -1 << al
        k = ss
        if state["eobrun"] == 0:
            while k <= se:
                rs = _read_huff_symbol(br, ac_tbl)
                r, s = rs >> 4, rs & 0xF
                val = 0
                if s:
                    if s != 1:
                        raise ValueError("JPEG AC refinement size must be 1")
                    val = p1 if br.read_bit() else m1
                elif r != 15:
                    state["eobrun"] = 1 << r
                    if r:
                        state["eobrun"] += br.read_bits(r)
                    break  # remainder of the band handled by EOB-run logic
                # advance over nonzero-history coefficients (each gets a
                # correction bit) and r still-zero ones, stopping AT the
                # (r+1)-th zero-history slot where val (if any) lands
                while k <= se:
                    cv = int(coef[k])
                    if cv != 0:
                        if br.read_bit() and (cv & p1) == 0:
                            coef[k] = cv + (p1 if cv >= 0 else m1)
                    else:
                        r -= 1
                        if r < 0:
                            break
                    k += 1
                if val:
                    if k > se:
                        raise ValueError("JPEG AC refinement run past band end")
                    coef[k] = val
                k += 1
        if state["eobrun"] > 0:
            while k <= se:  # correction bits for the rest of the band
                cv = int(coef[k])
                if cv != 0:
                    if br.read_bit() and (cv & p1) == 0:
                        coef[k] = cv + (p1 if cv >= 0 else m1)
                k += 1
            state["eobrun"] -= 1

    unit = 0
    if len(scan) > 1:  # interleaved DC scan: MCU traversal
        for my in range(mcuy):
            for mx in range(mcux):
                if restart_interval and unit and unit % restart_interval == 0:
                    restart()
                for c in scan:
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            dc_block(c, my * c["v"] + by, mx * c["h"] + bx)
                unit += 1
    else:  # non-interleaved: the component's own block grid
        c = scan[0]
        hb, wb = _comp_block_dims(frame, c)
        ac_tbl = None
        if not is_dc:
            ac_tbl = huff.get((1, c["ac"]))
            if ac_tbl is None:
                raise ValueError("JPEG scan references missing DHT")
        grid = grids[c["id"]]
        for row in range(hb):
            for col in range(wb):
                if restart_interval and unit and unit % restart_interval == 0:
                    restart()
                if is_dc:
                    dc_block(c, row, col)
                elif ah == 0:
                    ac_first(grid[row, col], ac_tbl)
                else:
                    ac_refine(grid[row, col], ac_tbl)
                unit += 1


# ----- encoder (tests / deterministic corpora) -----------------------------

# libjpeg-compatible quality scaling over the Annex-K-style base tables; the
# exact base values matter less than being written verbatim into DQT (the
# decoder always reads tables from the stream).
_QBASE_Y = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int32)
_QBASE_C = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int32)

# Simple VALID canonical Huffman tables for the encoder (written into DHT;
# the decoder reads whatever the stream declares, so these need only be
# well-formed): 12 DC categories at 4 bits, the 162 baseline AC symbols at
# 8 bits + the remainder spillover at 9 — generated, not transcribed.
_DC_BITS = [0, 0, 0, 12] + [0] * 12
_DC_VALS = bytes(range(12))
_AC_SYMBOLS = bytes(
    [0x00, 0xF0] + [(r << 4) | s for r in range(16) for s in range(1, 11)])
_AC_BITS = [0] * 7 + [162] + [0] * 8
assert sum(_AC_BITS) == len(_AC_SYMBOLS)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            self.write(0x7F >> (7 - ((8 - self.nbits) % 8)), (8 - self.nbits) % 8)


def _quant_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    qy = np.clip((_QBASE_Y * scale + 50) // 100, 1, 255)
    qc = np.clip((_QBASE_C * scale + 50) // 100, 1, 255)
    return qy.astype(np.int32), qc.astype(np.int32)


def _encode_block(bw: _BitWriter, block: np.ndarray, q: np.ndarray, pred: int,
                  dc_tab, ac_tab) -> int:
    coef = _DCT @ (block.astype(np.float64) - 128.0) @ _DCT.T
    qz = np.round(coef.reshape(-1) / q).astype(np.int32)[_ZIGZAG]
    # baseline AC magnitudes cap at 1023 (size category ≤ 10); reachable
    # only with q=1 + a full-amplitude single-frequency block
    qz[1:] = np.clip(qz[1:], -1023, 1023)
    dc = int(qz[0])
    diff = dc - pred
    t = int(abs(diff)).bit_length()
    ln, code = dc_tab[t]
    bw.write(code, ln)
    if t:
        bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = max(np.nonzero(qz)[0]) if np.any(qz) else 0
    for k in range(1, 64):
        v = int(qz[k])
        if v == 0:
            if k > last_nz:
                ln, code = ac_tab[0x00]  # EOB
                bw.write(code, ln)
                break
            run += 1
            if run == 16:
                ln, code = ac_tab[0xF0]  # ZRL
                bw.write(code, ln)
                run = 0
            continue
        s = int(abs(v)).bit_length()
        ln, code = ac_tab[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    return dc


def encode_jpeg(pixels: np.ndarray, quality: int = 90, subsample: bool = False,
                restart_interval: int = 0) -> bytes:
    """Baseline JPEG encoder for tests: uint8 (h, w, 3) RGB → JFIF bytes.

    ``subsample=True`` writes 4:2:0 (2×2 luma sampling); ``restart_interval``
    emits DRI + RSTn markers so the decoder's restart path is testable.
    """
    h, w, _ = pixels.shape
    px = pixels.astype(np.float64)
    r, g, b = px[:, :, 0], px[:, :, 1], px[:, :, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    qy, qc = _quant_tables(quality)
    qy_nat, qc_nat = qy.reshape(8, 8), qc.reshape(8, 8)
    dc_tab = _huff_encode_table(_DC_BITS, _DC_VALS)
    ac_tab = _huff_encode_table(_AC_BITS, _AC_SYMBOLS)

    hs, vs = (2, 2) if subsample else (1, 1)
    mcux, mcuy = -(-w // (8 * hs)), -(-h // (8 * vs))

    def pad_to(plane: np.ndarray, ph: int, pw: int) -> np.ndarray:
        return np.pad(plane, ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])),
                      mode="edge")

    ypl = pad_to(y, mcuy * 8 * vs, mcux * 8 * hs)
    if subsample:  # 2×2 box average
        cbs = pad_to(cb, mcuy * 16, mcux * 16).reshape(mcuy * 8, 2, mcux * 8, 2).mean(axis=(1, 3))
        crs = pad_to(cr, mcuy * 16, mcux * 16).reshape(mcuy * 8, 2, mcux * 8, 2).mean(axis=(1, 3))
    else:
        cbs, crs = pad_to(cb, mcuy * 8, mcux * 8), pad_to(cr, mcuy * 8, mcux * 8)

    bw = _BitWriter()
    preds = {"y": 0, "cb": 0, "cr": 0}
    out = bytearray()
    mcu_count = 0
    next_rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw.flush()
                out += bw.out + bytes([0xFF, 0xD0 + (next_rst & 7)])
                bw = _BitWriter()
                next_rst += 1
                preds = {"y": 0, "cb": 0, "cr": 0}
            for by in range(vs):
                for bx in range(hs):
                    blk = ypl[(my * vs + by) * 8:(my * vs + by) * 8 + 8,
                              (mx * hs + bx) * 8:(mx * hs + bx) * 8 + 8]
                    preds["y"] = _encode_block(bw, blk, qy_nat.reshape(-1), preds["y"], dc_tab, ac_tab)
            for name, plane in (("cb", cbs), ("cr", crs)):
                blk = plane[my * 8:my * 8 + 8, mx * 8:mx * 8 + 8]
                preds[name] = _encode_block(bw, blk, qc_nat.reshape(-1), preds[name], dc_tab, ac_tab)
            mcu_count += 1
    bw.flush()
    out += bw.out

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    head = bytearray(b"\xff\xd8")
    head += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    head += seg(0xDB, bytes([0x00]) + qy[_ZIGZAG].astype(np.uint8).tobytes())
    head += seg(0xDB, bytes([0x01]) + qc[_ZIGZAG].astype(np.uint8).tobytes())
    sof = struct.pack(">BHHB", 8, h, w, 3)
    sof += bytes([1, (hs << 4) | vs, 0])  # Y
    sof += bytes([2, 0x11, 1])            # Cb
    sof += bytes([3, 0x11, 1])            # Cr
    head += seg(0xC0, sof)
    head += seg(0xC4, bytes([0x00]) + bytes(_DC_BITS) + _DC_VALS)
    head += seg(0xC4, bytes([0x10]) + bytes(_AC_BITS) + _AC_SYMBOLS)
    head += seg(0xC4, bytes([0x01]) + bytes(_DC_BITS) + _DC_VALS)
    head += seg(0xC4, bytes([0x11]) + bytes(_AC_BITS) + _AC_SYMBOLS)
    if restart_interval:
        head += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    head += seg(0xDA, sos)
    return bytes(head) + bytes(out) + b"\xff\xd9"


# ----- progressive encoder (tests / deterministic corpora) ------------------

# Progressive AC tables must also cover the EOBn symbols ((r<<4)|0, r ≤ 14)
# that T.81 Annex G adds on top of the baseline alphabet; one generated
# canonical table, every code 9 bits (Kraft sum 176/512 < 1 → well-formed).
_PAC_SYMBOLS = bytes([(r << 4) | s for r in range(16) for s in range(11)])
_PAC_BITS = [0] * 8 + [len(_PAC_SYMBOLS)] + [0] * 7

# libjpeg's default 10-scan YCbCr script: interleaved DC first at Al=1, luma
# AC split into two spectral bands at Al=2, chroma AC at Al=1, then DC and
# AC refinement passes down to Al=0.  Entries: (comp indices, Ss, Se, Ah, Al).
DEFAULT_PROGRESSIVE_SCANS = (
    ((0, 1, 2), 0, 0, 0, 1),
    ((0,), 1, 5, 0, 2),
    ((2,), 1, 63, 0, 1),
    ((1,), 1, 63, 0, 1),
    ((0,), 6, 63, 0, 2),
    ((0,), 1, 63, 2, 1),
    ((0, 1, 2), 0, 0, 1, 0),
    ((2,), 1, 63, 1, 0),
    ((1,), 1, 63, 1, 0),
    ((0,), 1, 63, 1, 0),
)

# Spectral-selection-only script (no successive approximation) — the other
# commonly seen shape in the wild.
SPECTRAL_ONLY_SCANS = (
    ((0, 1, 2), 0, 0, 0, 0),
    ((0,), 1, 63, 0, 0),
    ((1,), 1, 63, 0, 0),
    ((2,), 1, 63, 0, 0),
)


def _rgb_to_coef_grids(pixels: np.ndarray, quality: int, subsample: bool):
    """Quantized zigzag-order coefficient grids per component, computed with
    the *identical per-block arithmetic* as the baseline encoder so that a
    progressive and a baseline encode of the same image carry bit-identical
    coefficients (the round-trip tests rely on exact pixel equality)."""
    h, w, _ = pixels.shape
    px = pixels.astype(np.float64)
    r, g, b = px[:, :, 0], px[:, :, 1], px[:, :, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    qy, qc = _quant_tables(quality)
    hs, vs = (2, 2) if subsample else (1, 1)
    mcux, mcuy = -(-w // (8 * hs)), -(-h // (8 * vs))

    def pad_to(plane, ph, pw):
        return np.pad(plane, ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])),
                      mode="edge")

    ypl = pad_to(y, mcuy * 8 * vs, mcux * 8 * hs)
    if subsample:
        cbs = pad_to(cb, mcuy * 16, mcux * 16).reshape(mcuy * 8, 2, mcux * 8, 2).mean(axis=(1, 3))
        crs = pad_to(cr, mcuy * 16, mcux * 16).reshape(mcuy * 8, 2, mcux * 8, 2).mean(axis=(1, 3))
    else:
        cbs, crs = pad_to(cb, mcuy * 8, mcux * 8), pad_to(cr, mcuy * 8, mcux * 8)

    def grid_of(plane, q):
        ny, nx = plane.shape[0] // 8, plane.shape[1] // 8
        out = np.zeros((ny, nx, 64), dtype=np.int32)
        for by in range(ny):
            for bx in range(nx):
                blk = plane[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8]
                coef = _DCT @ (blk - 128.0) @ _DCT.T
                qz = np.round(coef.reshape(-1) / q).astype(np.int32)[_ZIGZAG]
                qz[1:] = np.clip(qz[1:], -1023, 1023)
                out[by, bx] = qz
        return out

    comps = [
        {"id": 1, "h": hs, "v": vs, "tq": 0, "grid": grid_of(ypl, qy.astype(np.float64))},
        {"id": 2, "h": 1, "v": 1, "tq": 1, "grid": grid_of(cbs, qc.astype(np.float64))},
        {"id": 3, "h": 1, "v": 1, "tq": 1, "grid": grid_of(crs, qc.astype(np.float64))},
    ]
    return comps, qy, qc, mcux, mcuy


def _emit_eobrun(bw: _BitWriter, ac_tab, st: dict) -> None:
    """Flush a pending EOB run plus any buffered refinement correction bits."""
    if st["eobrun"] > 0:
        r = st["eobrun"].bit_length() - 1
        ln, code = ac_tab[r << 4]
        bw.write(code, ln)
        if r:
            bw.write(st["eobrun"] - (1 << r), r)
        st["eobrun"] = 0
    for bit in st["bits"]:
        bw.write(bit, 1)
    st["bits"] = []


def _enc_ac_first(bw, ac_tab, st, coef, ss, se, al):
    r = 0
    for k in range(ss, se + 1):
        v = int(coef[k])
        mag = (v if v >= 0 else -v) >> al
        if mag == 0:
            r += 1
            continue
        _emit_eobrun(bw, ac_tab, st)
        while r > 15:
            ln, code = ac_tab[0xF0]  # ZRL
            bw.write(code, ln)
            r -= 16
        nbits = mag.bit_length()
        ln, code = ac_tab[(r << 4) | nbits]
        bw.write(code, ln)
        bw.write(mag if v >= 0 else ~mag, nbits)  # low bits; ~mag = 1's compl
        r = 0
    if r > 0:
        st["eobrun"] += 1
        if st["eobrun"] == 0x7FFF:
            _emit_eobrun(bw, ac_tab, st)


def _enc_ac_refine(bw, ac_tab, st, coef, ss, se, al):
    # pre-pass: point-transformed magnitudes + position of the last NEWLY
    # significant coefficient (the band's effective EOB for this pass)
    absvals = []
    eob = ss - 1
    for k in range(ss, se + 1):
        v = int(coef[k])
        t = (v if v >= 0 else -v) >> al
        absvals.append(t)
        if t == 1:
            eob = k
    r = 0
    pend: list[int] = []  # correction bits awaiting the next emitted symbol
    for k in range(ss, se + 1):
        t = absvals[k - ss]
        if t == 0:
            r += 1
            continue
        while r > 15 and k <= eob:  # ZRLs not foldable into the EOB run
            _emit_eobrun(bw, ac_tab, st)
            ln, code = ac_tab[0xF0]
            bw.write(code, ln)
            r -= 16
            for bit in pend:
                bw.write(bit, 1)
            pend = []
        if t > 1:  # already significant: just a correction bit
            pend.append(t & 1)
            continue
        _emit_eobrun(bw, ac_tab, st)
        ln, code = ac_tab[(r << 4) | 1]
        bw.write(code, ln)
        bw.write(1 if int(coef[k]) >= 0 else 0, 1)
        for bit in pend:
            bw.write(bit, 1)
        pend = []
        r = 0
    if r > 0 or pend:
        st["eobrun"] += 1
        st["bits"].extend(pend)
        if st["eobrun"] == 0x7FFF or len(st["bits"]) > 937:
            _emit_eobrun(bw, ac_tab, st)


def encode_jpeg_progressive(pixels: np.ndarray, quality: int = 90,
                            subsample: bool = False, scans=None) -> bytes:
    """Progressive (SOF2) JPEG encoder for tests: uint8 (h, w, 3) RGB → bytes.

    ``scans`` is a T.81 Annex-G scan script of (comp indices, Ss, Se, Ah, Al)
    tuples; the default is libjpeg's 10-scan successive-approximation script,
    which exercises every decoder path (interleaved DC, DC/AC refinement,
    EOB runs, multi-band spectral selection)."""
    scans = DEFAULT_PROGRESSIVE_SCANS if scans is None else scans
    h, w, _ = pixels.shape
    comps, qy, qc, mcux, mcuy = _rgb_to_coef_grids(pixels, quality, subsample)
    dc_tab = _huff_encode_table(_DC_BITS, _DC_VALS)
    ac_tab = _huff_encode_table(_PAC_BITS, _PAC_SYMBOLS)
    frame = {"w": w, "h": h,
             "comps": [{k: c[k] for k in ("id", "h", "v", "tq")} for c in comps]}

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0x00]) + qy[_ZIGZAG].astype(np.uint8).tobytes())
    out += seg(0xDB, bytes([0x01]) + qc[_ZIGZAG].astype(np.uint8).tobytes())
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for c in comps:
        sof += bytes([c["id"], (c["h"] << 4) | c["v"], c["tq"]])
    out += seg(0xC2, sof)
    out += seg(0xC4, bytes([0x00]) + bytes(_DC_BITS) + _DC_VALS)
    out += seg(0xC4, bytes([0x10]) + bytes(_PAC_BITS) + _PAC_SYMBOLS)

    for comp_idxs, ss, se, ah, al in scans:
        sel = [comps[i] for i in comp_idxs]
        sos = bytes([len(sel)])
        for c in sel:
            sos += bytes([c["id"], 0x00])  # Td=0, Ta=0
        sos += bytes([ss, se, (ah << 4) | al])
        out += seg(0xDA, sos)
        bw = _BitWriter()
        st = {"eobrun": 0, "bits": [],
              "pred": {c["id"]: 0 for c in sel}}
        if ss == 0:  # DC scan
            if len(sel) > 1:
                units = [(c, my * c["v"] + by, mx * c["h"] + bx)
                         for my in range(mcuy) for mx in range(mcux)
                         for c in sel
                         for by in range(c["v"]) for bx in range(c["h"])]
            else:
                c = sel[0]
                hb, wb = _comp_block_dims(frame, c)
                units = [(c, row, col) for row in range(hb) for col in range(wb)]
            for c, row, col in units:
                dc = int(c["grid"][row, col, 0]) >> al
                if ah == 0:
                    diff = dc - st["pred"][c["id"]]
                    st["pred"][c["id"]] = dc
                    n = abs(diff).bit_length()
                    ln, code = dc_tab[n]
                    bw.write(code, ln)
                    if n:
                        bw.write(diff if diff >= 0 else diff + (1 << n) - 1, n)
                else:
                    bw.write(dc & 1, 1)
        else:  # AC scan, single component
            c = sel[0]
            hb, wb = _comp_block_dims(frame, c)
            enc = _enc_ac_first if ah == 0 else _enc_ac_refine
            for row in range(hb):
                for col in range(wb):
                    enc(bw, ac_tab, st, c["grid"][row, col], ss, se, al)
            _emit_eobrun(bw, ac_tab, st)
        bw.flush()
        out += bw.out
    return bytes(out) + b"\xff\xd9"


# ---------------------------------------------------------------------------
# MP4 (ISO base media file format) — container demux
# ---------------------------------------------------------------------------

def _boxes(data: bytes, start: int, end: int):
    pos = start
    while pos + 8 <= end:
        (size,), btype = struct.unpack_from(">I", data, pos), data[pos + 4 : pos + 8]
        if size == 1:
            if pos + 16 > end:
                raise ValueError("truncated MP4 largesize box")
            (size,) = struct.unpack_from(">Q", data, pos + 8)
            hdr = 16
        elif size == 0:
            size = end - pos
            hdr = 8
        else:
            hdr = 8
        if size < hdr or pos + size > end:
            raise ValueError(f"MP4 box {btype!r} size out of range")
        yield btype, pos + hdr, pos + size
        pos += size


def _find_box(data: bytes, start: int, end: int, path: list[bytes]):
    """First box matching the type path; (body_start, body_end) or None."""
    for btype, bstart, bend in _boxes(data, start, end):
        if btype == path[0]:
            if len(path) == 1:
                return bstart, bend
            return _find_box(data, bstart, bend, path[1:])
    return None


def parse_mp4(payload: bytes) -> dict:
    """Demux an ISO-BMFF file: video track dims + per-sample byte ranges.

    Returns ``{"width", "height", "duration_ms", "samples": [(off, size)],
    "sync": [1-based sample numbers]}``.  Resolves stsz (sizes) × stsc
    (samples-per-chunk runs) × stco/co64 (chunk offsets); stss lists sync
    samples (absent ⇒ all samples are sync, per spec).
    """
    if len(payload) < 16 or payload[4:8] != b"ftyp":
        raise ValueError("not an MP4 (no ftyp)")
    moov = _find_box(payload, 0, len(payload), [b"moov"])
    if moov is None:
        raise ValueError("MP4 missing moov")
    # mvhd: timescale + duration
    mvhd = _find_box(payload, moov[0], moov[1], [b"mvhd"])
    duration_ms = 0
    if mvhd is not None:
        ver = payload[mvhd[0]]
        if ver == 1:
            timescale, dur = struct.unpack_from(">IQ", payload, mvhd[0] + 20)
        else:
            timescale, dur = struct.unpack_from(">II", payload, mvhd[0] + 12)
        duration_ms = int(dur * 1000 // timescale) if timescale else 0
    # first video trak (hdlr type 'vide'); fall back to the first trak
    chosen = None
    for btype, bstart, bend in _boxes(payload, moov[0], moov[1]):
        if btype != b"trak":
            continue
        hdlr = _find_box(payload, bstart, bend, [b"mdia", b"hdlr"])
        if chosen is None:
            chosen = (bstart, bend)
        if hdlr is not None and payload[hdlr[0] + 8 : hdlr[0] + 12] == b"vide":
            chosen = (bstart, bend)
            break
    if chosen is None:
        raise ValueError("MP4 has no trak")
    tkhd = _find_box(payload, chosen[0], chosen[1], [b"tkhd"])
    width = height = 0
    if tkhd is not None:
        # v0 body: ver/flags 4 + times/ids 20 + reserved 8 + layer etc 8 +
        # matrix 36 = 76 bytes before the 16.16 fixed-point width/height
        # (v1's 64-bit times add 12)
        ver = payload[tkhd[0]]
        off = tkhd[0] + (76 if ver == 0 else 88)
        w_fix, h_fix = struct.unpack_from(">II", payload, off)
        width, height = w_fix >> 16, h_fix >> 16
    stbl = _find_box(payload, chosen[0], chosen[1], [b"mdia", b"minf", b"stbl"])
    if stbl is None:
        raise ValueError("MP4 trak missing stbl")

    tables: dict[bytes, tuple[int, int]] = {}
    for btype, bstart, bend in _boxes(payload, stbl[0], stbl[1]):
        tables[btype] = (bstart, bend)

    def full(btype: bytes):
        if btype not in tables:
            return None
        s, e = tables[btype]
        return s + 4, e  # skip version/flags

    stsz = full(b"stsz")
    if stsz is None:
        raise ValueError("MP4 missing stsz")
    sample_size, count = struct.unpack_from(">II", payload, stsz[0])
    # allocation guards: every table's declared count must fit inside its
    # own box (the entries are IN the box) — validated BEFORE any list of
    # `count` elements is built, so a crafted 100-byte file claiming 2^32
    # samples raises (dead-letters the row) instead of OOM-killing the task
    if sample_size:
        if sample_size * count > len(payload):
            raise ValueError("MP4 stsz total sample bytes exceed file size")
        sizes = [sample_size] * count
    else:
        if stsz[0] + 8 + 4 * count > stsz[1]:
            raise ValueError("MP4 stsz count exceeds box size")
        sizes = list(struct.unpack_from(f">{count}I", payload, stsz[0] + 8))

    co = full(b"stco")
    if co is not None:
        (n_chunks,) = struct.unpack_from(">I", payload, co[0])
        if co[0] + 4 + 4 * n_chunks > co[1]:
            raise ValueError("MP4 stco count exceeds box size")
        offsets = list(struct.unpack_from(f">{n_chunks}I", payload, co[0] + 4))
    else:
        co = full(b"co64")
        if co is None:
            raise ValueError("MP4 missing stco/co64")
        (n_chunks,) = struct.unpack_from(">I", payload, co[0])
        if co[0] + 4 + 8 * n_chunks > co[1]:
            raise ValueError("MP4 co64 count exceeds box size")
        offsets = list(struct.unpack_from(f">{n_chunks}Q", payload, co[0] + 4))

    stsc = full(b"stsc")
    if stsc is None:
        raise ValueError("MP4 missing stsc")
    (n_runs,) = struct.unpack_from(">I", payload, stsc[0])
    if stsc[0] + 4 + 12 * n_runs > stsc[1]:
        raise ValueError("MP4 stsc count exceeds box size")
    runs = [struct.unpack_from(">III", payload, stsc[0] + 4 + 12 * i)
            for i in range(n_runs)]  # (first_chunk, samples_per_chunk, desc_id)

    # expand stsc runs → samples per chunk, then walk chunks accumulating
    # in-chunk offsets (samples are contiguous within a chunk)
    samples: list[tuple[int, int]] = []
    si = 0
    for ci in range(n_chunks):
        spc = 0
        for first, cnt, _desc in runs:
            if ci + 1 >= first:
                spc = cnt
        off = offsets[ci]
        for _ in range(spc):
            if si >= count:
                break
            samples.append((off, sizes[si]))
            off += sizes[si]
            si += 1
    if si != count:
        raise ValueError("MP4 stsc/stsz sample count mismatch")
    for off, size in samples:
        if off + size > len(payload):
            raise ValueError("MP4 sample range beyond file end")

    stss = full(b"stss")
    if stss is None:
        sync = list(range(1, count + 1))  # count bounded by the stsz guard
    else:
        (n_sync,) = struct.unpack_from(">I", payload, stss[0])
        if stss[0] + 4 + 4 * n_sync > stss[1]:
            raise ValueError("MP4 stss count exceeds box size")
        sync = list(struct.unpack_from(f">{n_sync}I", payload, stss[0] + 4))

    return {"width": width, "height": height, "duration_ms": duration_ms,
            "samples": samples, "sync": sync}


def mp4_sample_frames(payload: bytes, n_frames: int,
                      keyframes_only: bool = False) -> list[tuple[int, bytes]]:
    """n evenly-spaced samples sliced straight out of mdat.

    ``keyframes_only`` restricts the candidate set to stss sync samples (what
    a real pipeline does — only keyframes decode standalone).  Returns
    ``[(sample_number_1based, sample_bytes)]``.
    """
    info = parse_mp4(payload)
    candidates = info["sync"] if keyframes_only else list(range(1, len(info["samples"]) + 1))
    if not candidates:
        return []
    n = min(n_frames, len(candidates))
    picks = sorted({candidates[int(i * (len(candidates) - 1) / max(1, n - 1))]
                    for i in range(n)})
    out = []
    for sn in picks:
        off, size = info["samples"][sn - 1]
        out.append((sn, payload[off : off + size]))
    return out


def mux_mp4(samples: list[bytes], width: int, height: int,
            sync_samples: list[int] | None = None, timescale: int = 1000,
            sample_duration: int = 40, samples_per_chunk: int = 2) -> bytes:
    """Minimal ISO-BMFF muxer for tests: one video track, mdat before moov.

    ``sync_samples``: 1-based keyframe numbers for stss (None ⇒ no stss box,
    i.e. every sample is sync).  Chunking is uniform ``samples_per_chunk``
    so stsc/stco resolution is genuinely exercised.
    """
    def box(btype: bytes, body: bytes) -> bytes:
        return struct.pack(">I", len(body) + 8) + btype + body

    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    mdat_body = b"".join(samples)
    mdat = box(b"mdat", mdat_body)
    mdat_start = len(ftyp) + 8  # payload offset of first sample

    n = len(samples)
    durations = n * sample_duration
    mvhd = box(b"mvhd", struct.pack(">B3xIIII", 0, 0, 0, timescale, durations)
               + struct.pack(">IH2x", 0x00010000, 0x0100) + b"\x00" * 8
               + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
               + b"\x00" * 24 + struct.pack(">I", 2))
    # tkhd v0 body: ver/flags, ctime, mtime, track_id, reserved, duration,
    # reserved[8], layer/alt_group/volume/reserved (8), matrix[36], w/h 16.16
    tkhd = box(b"tkhd", struct.pack(">B3xIIIII", 0, 0, 0, 1, 0, durations)
               + b"\x00" * 16
               + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
               + struct.pack(">II", width << 16, height << 16))
    mdhd = box(b"mdhd", struct.pack(">B3xIIIIHH", 0, 0, 0, timescale, durations, 0x55C4, 0))
    hdlr = box(b"hdlr", struct.pack(">B3xI", 0, 0) + b"vide" + b"\x00" * 12 + b"video\x00")
    vmhd = box(b"vmhd", struct.pack(">BBHHHHH", 0, 0, 1, 0, 0, 0, 0))
    dref = box(b"dref", struct.pack(">B3xI", 0, 1)
               + box(b"url ", struct.pack(">B3B", 0, 0, 0, 1)))
    dinf = box(b"dinf", dref)
    # stsd with an opaque sample entry (raw payload; no codec config needed)
    entry = box(b"raw ", b"\x00" * 6 + struct.pack(">H", 1) + b"\x00" * 16
                + struct.pack(">HH", width, height) + b"\x00" * 50)
    stsd = box(b"stsd", struct.pack(">B3xI", 0, 1) + entry)
    stts = box(b"stts", struct.pack(">B3xIII", 0, 1, n, sample_duration))
    n_chunks = -(-n // samples_per_chunk)
    stsc = box(b"stsc", struct.pack(">B3xI", 0, 1)
               + struct.pack(">III", 1, samples_per_chunk, 1))
    stsz = box(b"stsz", struct.pack(">B3xII", 0, 0, n)
               + b"".join(struct.pack(">I", len(s)) for s in samples))
    offs = []
    pos = mdat_start
    for ci in range(n_chunks):
        offs.append(pos)
        for s in samples[ci * samples_per_chunk:(ci + 1) * samples_per_chunk]:
            pos += len(s)
    stco = box(b"stco", struct.pack(">B3xI", 0, n_chunks)
               + b"".join(struct.pack(">I", o) for o in offs))
    stbl_children = stsd + stts + stsc + stsz + stco
    if sync_samples is not None:
        stbl_children += box(b"stss", struct.pack(">B3xI", 0, len(sync_samples))
                             + b"".join(struct.pack(">I", s) for s in sync_samples))
    stbl = box(b"stbl", stbl_children)
    minf = box(b"minf", vmhd + dinf + stbl)
    mdia = box(b"mdia", mdhd + hdlr + minf)
    trak = box(b"trak", tkhd + mdia)
    moov = box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


# ---------------------------------------------------------------------------
# GIF (87a/89a) — LZW decode, palette mapping, Adam-style interlace
# ---------------------------------------------------------------------------

def _gif_lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> np.ndarray:
    """GIF-variant LZW → palette indices.  Codes are packed LSB-first;
    CLEAR resets the table, EOI terminates; code width grows to 12 bits."""
    clear = 1 << min_code_size
    eoi = clear + 1

    def reset():
        return {i: (i,) for i in range(clear)}, min_code_size + 1, clear + 2

    table, width, next_code = reset()
    out: list[int] = []
    acc = nbits = 0
    prev: tuple[int, ...] | None = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table, width, next_code = reset()
                prev = None
                continue
            if code == eoi:
                return np.array(out[:n_pixels], dtype=np.uint8)
            if code < next_code and code in table:
                entry = table[code]
            elif code == next_code and prev is not None:
                entry = prev + (prev[0],)  # the KwKwK case
            else:
                raise ValueError("GIF LZW code out of range")
            out.extend(entry)
            if prev is not None and next_code < 4096:
                table[next_code] = prev + (entry[0],)
                next_code += 1
                if next_code == (1 << width) and width < 12:
                    width += 1
            prev = entry
            if len(out) >= n_pixels:
                return np.array(out[:n_pixels], dtype=np.uint8)
    raise ValueError("GIF LZW data exhausted before EOI")


_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(payload: bytes) -> tuple[int, int, np.ndarray]:
    """First image frame of a GIF → ``(width, height, RGB uint8 body)``.

    Global/local color tables, LZW decompression, interlaced row order,
    89a extensions skipped (incl. GCE transparency — rendered opaque).
    ``ValueError`` on malformed input.
    """
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    if len(payload) < 13:
        raise ValueError("truncated GIF header")
    sw, sh, packed, _bg, _aspect = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    global_table = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        global_table = np.frombuffer(payload, dtype=np.uint8, count=3 * n,
                                     offset=pos).reshape(n, 3)
        pos += 3 * n
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks
            pos += 1
            while pos < len(payload) and payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"GIF unknown block 0x{block:02x}")
        left, top, w, h, ipacked = struct.unpack_from("<HHHHB", payload, pos)
        pos += 9
        table = global_table
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            table = np.frombuffer(payload, dtype=np.uint8, count=3 * n,
                                  offset=pos).reshape(n, 3)
            pos += 3 * n
        if table is None:
            raise ValueError("GIF image with no color table")
        if w == 0 or h == 0:
            raise ValueError("GIF zero dimension")
        _check_pixels(w, h, "GIF")
        min_code_size = payload[pos]
        pos += 1
        if not 2 <= min_code_size <= 11:
            raise ValueError(f"GIF LZW min code size {min_code_size}")
        lzw = bytearray()
        while pos < len(payload) and payload[pos] != 0:
            ln = payload[pos]
            lzw += payload[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        idx = _gif_lzw_decode(min_code_size, bytes(lzw), w * h)
        if len(idx) < w * h:
            raise ValueError("GIF pixel data short")
        if idx.max(initial=0) >= len(table):
            raise ValueError("GIF palette index out of range")
        grid = idx.reshape(h, w)
        if ipacked & 0x40:  # interlaced: rows arrive in 4 passes
            deinterlaced = np.empty_like(grid)
            src = 0
            for start, step in _GIF_INTERLACE_PASSES:
                rows = range(start, h, step)
                for r in rows:
                    deinterlaced[r] = grid[src]
                    src += 1
            grid = deinterlaced
        rgb = table[grid.reshape(-1)]
        return w, h, rgb.astype(np.uint8).reshape(-1)
    raise ValueError("GIF contains no image block")


def encode_gif(pixels: np.ndarray, interlace: bool = False) -> bytes:
    """GIF89a encoder for tests: uint8 (h, w, 3) RGB → GIF bytes.

    Builds an exact palette from the distinct colors (≤256 required), real
    LZW compression (table growth to 4096 + CLEAR on overflow), optional
    interlaced row order so the decoder's deinterlace path is exercised.
    """
    h, w, _ = pixels.shape
    flat = pixels.reshape(-1, 3)
    palette, idx = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError("encode_gif needs <= 256 distinct colors")
    size_bits = max(1, int(len(palette) - 1).bit_length())
    n_table = 1 << size_bits
    table_bytes = np.zeros((n_table, 3), dtype=np.uint8)
    table_bytes[: len(palette)] = palette

    grid = idx.reshape(h, w)
    if interlace:
        order = [r for start, step in _GIF_INTERLACE_PASSES for r in range(start, h, step)]
        grid = grid[order]
    indices = grid.reshape(-1).tolist()

    min_code_size = max(2, size_bits)
    clear = 1 << min_code_size
    eoi = clear + 1

    codes: list[tuple[int, int]] = []  # (code, width)
    table = {(i,): i for i in range(clear)}
    width = min_code_size + 1
    next_code = clear + 2
    codes.append((clear, width))
    prev: tuple[int, ...] = ()
    for px in indices:
        cand = prev + (px,)
        if cand in table:
            prev = cand
            continue
        codes.append((table[prev], width))
        if next_code < 4096:
            table[cand] = next_code
            # GIF increments width when next_code EXCEEDS the current range
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:
            codes.append((clear, width))
            table = {(i,): i for i in range(clear)}
            width = min_code_size + 1
            next_code = clear + 2
        prev = (px,)
    if prev:
        codes.append((table[prev], width))
    codes.append((eoi, width))

    acc = nbits = 0
    packed = bytearray()
    for code, cwidth in codes:
        acc |= code << nbits
        nbits += cwidth
        while nbits >= 8:
            packed.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        packed.append(acc & 0xFF)

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (size_bits - 1), 0, 0)
    out += table_bytes.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0x40 if interlace else 0)
    out.append(min_code_size)
    for i in range(0, len(packed), 255):
        chunk = packed[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)
