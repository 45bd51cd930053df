"""Compressed-media codecs (frontier_engine.codecs): PNG / baseline JPEG /
MP4 demux — pure stdlib+numpy, deterministic, round-tripped against the
module's own spec-conformant encoders, plus malformed-input behavior
(ValueError, never a crash) and Spark-pipeline integration.

The reference stores media as URL strings only (bhx.py keeps ``image`` as a
text column) — this whole family is additive training-data capability.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from frontier_engine import codecs as C
from frontier_engine import multimodal as MM


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------

class TestPNG:
    @pytest.mark.parametrize("channels", [1, 2, 3, 4])
    @pytest.mark.parametrize("filt", [0, 1, 2, 3, 4])
    def test_round_trip_every_filter(self, channels, filt):
        rng = np.random.RandomState(channels * 10 + filt)
        px = rng.randint(0, 256, size=(11, 7, channels), dtype=np.uint8)
        w, h, c, body = C.decode_png(C.encode_png(px, filters=filt))
        assert (w, h, c) == (7, 11, channels)
        assert np.array_equal(body.reshape(11, 7, channels), px)

    def test_mixed_per_row_filters(self):
        rng = np.random.RandomState(99)
        px = rng.randint(0, 256, size=(20, 13, 3), dtype=np.uint8)
        filters = [rng.randint(0, 5) for _ in range(20)]
        _, _, _, body = C.decode_png(C.encode_png(px, filters=filters))
        assert np.array_equal(body.reshape(20, 13, 3), px)

    @settings(max_examples=25, deadline=None)
    @given(
        w=st.integers(1, 24), h=st.integers(1, 24),
        channels=st.sampled_from([1, 3, 4]), seed=st.integers(0, 2**31 - 1),
    )
    def test_round_trip_property(self, w, h, channels, seed):
        rng = np.random.RandomState(seed)
        px = rng.randint(0, 256, size=(h, w, channels), dtype=np.uint8)
        filters = [int(x) for x in rng.randint(0, 5, size=h)]
        got_w, got_h, got_c, body = C.decode_png(C.encode_png(px, filters=filters))
        assert (got_w, got_h, got_c) == (w, h, channels)
        assert np.array_equal(body.reshape(h, w, channels), px)

    @settings(max_examples=25, deadline=None)
    @given(
        w=st.integers(1, 24), h=st.integers(1, 24),
        channels=st.sampled_from([1, 2, 3, 4]), seed=st.integers(0, 2**31 - 1),
    )
    def test_adam7_round_trip_property(self, w, h, channels, seed):
        """Adam7 interlaced encode → decode is identity, and agrees with the
        non-interlaced decode of the same pixels (VERDICT r3 #8: interlaced
        PNGs are low-single-digit percent of real web corpora)."""
        rng = np.random.RandomState(seed)
        px = rng.randint(0, 256, size=(h, w, channels), dtype=np.uint8)
        filters = [int(x) for x in rng.randint(0, 5, size=h)]
        got_w, got_h, got_c, body = C.decode_png(
            C.encode_png(px, filters=filters, interlace=True)
        )
        assert (got_w, got_h, got_c) == (w, h, channels)
        assert np.array_equal(body.reshape(h, w, channels), px)
        _, _, _, plain = C.decode_png(C.encode_png(px))
        assert np.array_equal(plain, body)

    def test_adam7_single_pixel_and_thin_images(self):
        # degenerate Adam7 geometries: several passes are empty
        for (h, w, c) in [(1, 1, 1), (1, 9, 3), (9, 1, 4), (2, 2, 1)]:
            px = np.arange(h * w * c, dtype=np.uint8).reshape(h, w, c)
            _, _, _, body = C.decode_png(C.encode_png(px, interlace=True))
            assert np.array_equal(body.reshape(h, w, c), px)

    def test_grayscale_2d_input(self):
        px = np.arange(64, dtype=np.uint8).reshape(8, 8)
        w, h, c, body = C.decode_png(C.encode_png(px))
        assert (w, h, c) == (8, 8, 1)
        assert np.array_equal(body.reshape(8, 8), px)

    def test_crc_corruption_raises_valueerror(self):
        png = bytearray(C.encode_png(np.zeros((4, 4, 3), dtype=np.uint8)))
        png[40] ^= 0xFF  # flip a byte inside IDAT
        with pytest.raises(ValueError, match="CRC"):
            C.decode_png(bytes(png))

    def test_truncation_raises_valueerror(self):
        png = C.encode_png(np.zeros((4, 4, 3), dtype=np.uint8))
        with pytest.raises(ValueError):
            C.decode_png(png[: len(png) // 2])

    def test_interlaced_stream_hand_built(self):
        """A hand-assembled 2×2 RGB Adam7 stream decodes to the right
        pixels: passes 1 (top-left), 6 (top-right), 7 (bottom row)."""
        import zlib
        ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1)  # Adam7
        def chunk(t, d):
            return struct.pack(">I", len(d)) + t + d + struct.pack(
                ">I", zlib.crc32(t + d) & 0xFFFFFFFF)
        # filter byte 0 + raw pixels per pass row
        raw = (b"\x00" + bytes([1, 2, 3])          # pass 1: (0,0)
               + b"\x00" + bytes([4, 5, 6])        # pass 6: (0,1)
               + b"\x00" + bytes([7, 8, 9, 10, 11, 12]))  # pass 7: row 1
        png = C.PNG_MAGIC + chunk(b"IHDR", ihdr) + chunk(
            b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
        w, h, c, body = C.decode_png(png)
        assert (w, h, c) == (2, 2, 3)
        assert body.reshape(2, 2, 3).tolist() == [
            [[1, 2, 3], [4, 5, 6]], [[7, 8, 9], [10, 11, 12]]
        ]
        # a truncated interlaced stream still size-checks
        short = C.PNG_MAGIC + chunk(b"IHDR", ihdr) + chunk(
            b"IDAT", zlib.compress(raw[:-1])) + chunk(b"IEND", b"")
        with pytest.raises(ValueError, match="size mismatch"):
            C.decode_png(short)

    def test_decodes_through_multimodal_dispatch(self):
        px = np.full((5, 6, 3), 42, dtype=np.uint8)
        kind, w, h, body = MM._decode(C.encode_png(px))
        assert (kind, w, h) == ("image", 6, 5)
        assert np.array_equal(body.reshape(5, 6, 3), px)


# ---------------------------------------------------------------------------
# JPEG (baseline)
# ---------------------------------------------------------------------------

class TestJPEG:
    def test_flat_blocks_decode_near_exact(self):
        """Constant 8×8 blocks are DC-only after DCT — quantization error
        stays within rounding of a single coefficient."""
        px = np.zeros((16, 16, 3), dtype=np.uint8)
        px[:8, :8] = [200, 30, 90]
        px[:8, 8:] = [10, 220, 40]
        px[8:, :8] = [60, 60, 200]
        px[8:, 8:] = [128, 128, 128]
        w, h, body = C.decode_jpeg(C.encode_jpeg(px, quality=95))
        assert (w, h) == (16, 16)
        err = np.abs(body.reshape(16, 16, 3).astype(int) - px.astype(int)).max()
        assert err <= 4, err

    @pytest.mark.parametrize("kw", [
        {}, {"subsample": True}, {"restart_interval": 2},
        {"subsample": True, "restart_interval": 1},
    ])
    def test_gradient_tolerance_444_420_restarts(self, kw):
        g = np.arange(21 * 33 * 3, dtype=np.uint8).reshape(21, 33, 3)
        w, h, body = C.decode_jpeg(C.encode_jpeg(g, quality=90, **kw))
        assert (w, h) == (33, 21)  # odd dims: encoder pads, decoder crops
        mae = np.abs(body.reshape(21, 33, 3).astype(int) - g.astype(int)).mean()
        assert mae < (15 if kw.get("subsample") else 6), (kw, mae)

    @settings(max_examples=10, deadline=None)
    @given(w=st.integers(4, 40), h=st.integers(4, 40), seed=st.integers(0, 10**6))
    def test_smooth_image_bounded_error_property(self, w, h, seed):
        """Low-frequency images survive quality-90 round trips with small
        mean error at arbitrary (non-multiple-of-8) dimensions."""
        rng = np.random.RandomState(seed)
        base = rng.randint(40, 216, size=3)
        yy, xx = np.mgrid[0:h, 0:w]
        px = np.clip(
            base[None, None, :] + (yy[:, :, None] * 2 + xx[:, :, None]) % 32 - 16,
            0, 255).astype(np.uint8)
        got_w, got_h, body = C.decode_jpeg(C.encode_jpeg(px, quality=90))
        assert (got_w, got_h) == (w, h)
        mae = np.abs(body.reshape(h, w, 3).astype(int) - px.astype(int)).mean()
        assert mae < 8, mae

    def test_determinism(self):
        px = np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3)
        assert C.encode_jpeg(px, 85) == C.encode_jpeg(px, 85)
        a = C.decode_jpeg(C.encode_jpeg(px, 85))
        b = C.decode_jpeg(C.encode_jpeg(px, 85))
        assert np.array_equal(a[2], b[2])

    def test_truncated_raises_valueerror(self):
        jpg = C.encode_jpeg(np.zeros((8, 8, 3), dtype=np.uint8), 90)
        with pytest.raises(ValueError):
            C.decode_jpeg(jpg[:20])
        with pytest.raises(ValueError):
            C.decode_jpeg(b"\xff\xd8\xff\xe0 jpeg soi")

    def test_lossless_raises_notimplemented(self):
        jpg = bytearray(C.encode_jpeg(np.zeros((8, 8, 3), dtype=np.uint8), 90))
        # rewrite the SOF0 marker (FFC0) as SOF3 (lossless sequential)
        i = bytes(jpg).find(b"\xff\xc0")
        assert i > 0
        jpg[i + 1] = 0xC3
        with pytest.raises(NotImplementedError, match="lossless|non-baseline"):
            C.decode_jpeg(bytes(jpg))


class TestJPEGProgressive:
    """SOF2: the decoder must reproduce the baseline decode EXACTLY, because
    both entropy paths feed identical quantized coefficients into the same
    dequant/IDCT tail — any per-pixel difference is an entropy-coding bug."""

    @pytest.mark.parametrize("sub", [False, True])
    @pytest.mark.parametrize("scans", [None, C.SPECTRAL_ONLY_SCANS])
    def test_matches_baseline_exactly(self, sub, scans):
        rng = np.random.RandomState(7)
        px = rng.randint(0, 256, size=(37, 23, 3)).astype(np.uint8)
        base = C.decode_jpeg(C.encode_jpeg(px, 85, subsample=sub))
        prog = C.decode_jpeg(
            C.encode_jpeg_progressive(px, 85, subsample=sub, scans=scans))
        assert (base[0], base[1]) == (prog[0], prog[1]) == (23, 37)
        assert np.array_equal(base[2], prog[2])

    def test_flat_image_long_eob_runs(self):
        """A mostly-flat image makes every AC band an EOB run — the EOBn
        accumulate/flush path must round-trip."""
        px = np.full((48, 64, 3), 77, dtype=np.uint8)
        px[20:24, 30:34] = [250, 10, 10]  # one feature so not all-zero
        base = C.decode_jpeg(C.encode_jpeg(px, 90))
        prog = C.decode_jpeg(C.encode_jpeg_progressive(px, 90))
        assert np.array_equal(base[2], prog[2])

    @settings(max_examples=10, deadline=None)
    @given(w=st.integers(4, 40), h=st.integers(4, 40), seed=st.integers(0, 10**6),
           sub=st.booleans(), quality=st.sampled_from([35, 75, 95]))
    def test_progressive_equals_baseline_property(self, w, h, seed, sub, quality):
        rng = np.random.RandomState(seed)
        px = rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
        base = C.decode_jpeg(C.encode_jpeg(px, quality, subsample=sub))
        prog = C.decode_jpeg(C.encode_jpeg_progressive(px, quality, subsample=sub))
        assert np.array_equal(base[2], prog[2]), (w, h, seed, sub, quality)

    def test_truncated_scan_raises_valueerror(self):
        px = np.arange(16 * 16 * 3, dtype=np.uint8).reshape(16, 16, 3)
        jpg = C.encode_jpeg_progressive(px, 85)
        # chop inside the entropy data of a late scan: Huffman decode must
        # fail with ValueError (dead-letterable), never crash or hang
        with pytest.raises(ValueError):
            C.decode_jpeg(jpg[: len(jpg) - 40] + b"\xff\xd9")

    def test_interleaved_ac_scan_rejected(self):
        px = np.zeros((8, 8, 3), dtype=np.uint8)
        bad = (((0, 1, 2), 0, 0, 0, 0), ((0, 1), 1, 63, 0, 0))
        jpg = C.encode_jpeg_progressive(px, 85, scans=bad)
        with pytest.raises(ValueError, match="non-interleaved"):
            C.decode_jpeg(jpg)

    def test_progressive_through_multimodal_dispatch(self):
        px = np.full((8, 8, 3), 77, dtype=np.uint8)
        kind, w, h, body = MM._decode(C.encode_jpeg_progressive(px, 95))
        assert (kind, w, h) == ("image", 8, 8)
        assert np.abs(body.astype(int) - 77).max() <= 4

    def test_decodes_through_multimodal_dispatch(self):
        px = np.full((8, 8, 3), 77, dtype=np.uint8)
        kind, w, h, body = MM._decode(C.encode_jpeg(px, 95))
        assert (kind, w, h) == ("image", 8, 8)
        assert np.abs(body.astype(int) - 77).max() <= 4


# ---------------------------------------------------------------------------
# MP4 (ISO-BMFF demux)
# ---------------------------------------------------------------------------

def _samples(n=9, scale=3):
    return [bytes([i]) * (10 + scale * i) for i in range(n)]


class TestMP4:
    def test_mux_demux_round_trip(self):
        samples = _samples()
        mp4 = C.mux_mp4(samples, 320, 240, sync_samples=[1, 4, 7], samples_per_chunk=2)
        info = C.parse_mp4(mp4)
        assert (info["width"], info["height"]) == (320, 240)
        assert info["sync"] == [1, 4, 7]
        assert info["duration_ms"] == 9 * 40
        got = [mp4[o : o + s] for o, s in info["samples"]]
        assert got == samples  # stsz×stsc×stco resolved byte-exact

    @pytest.mark.parametrize("spc", [1, 2, 3, 5, 100])
    def test_chunking_variants(self, spc):
        samples = _samples(n=11)
        mp4 = C.mux_mp4(samples, 64, 64, samples_per_chunk=spc)
        info = C.parse_mp4(mp4)
        assert [mp4[o : o + s] for o, s in info["samples"]] == samples

    def test_no_stss_means_all_sync(self):
        mp4 = C.mux_mp4(_samples(n=4), 64, 64, sync_samples=None)
        assert C.parse_mp4(mp4)["sync"] == [1, 2, 3, 4]

    def test_sample_frames_even_spacing(self):
        samples = _samples(n=10)
        mp4 = C.mux_mp4(samples, 64, 64)
        frames = C.mp4_sample_frames(mp4, 4)
        assert [n for n, _ in frames] == [1, 4, 7, 10]
        assert all(fb == samples[n - 1] for n, fb in frames)

    def test_sample_frames_keyframes_only(self):
        samples = _samples(n=10)
        mp4 = C.mux_mp4(samples, 64, 64, sync_samples=[2, 5, 9])
        frames = C.mp4_sample_frames(mp4, 2, keyframes_only=True)
        assert [n for n, _ in frames] == [2, 9]
        assert all(fb == samples[n - 1] for n, fb in frames)

    def test_malformed_raises_valueerror(self):
        mp4 = C.mux_mp4(_samples(n=3), 64, 64)
        with pytest.raises(ValueError):
            C.parse_mp4(b"\x00\x00\x00\x08free" + mp4[8:])  # no ftyp
        with pytest.raises(ValueError):
            C.parse_mp4(mp4[:40])  # truncated: moov gone
        # sample range pointing past EOF
        bad = bytearray(mp4)
        i = bytes(mp4).rfind(b"stco")
        struct.pack_into(">I", bad, i + 4 + 4 + 4, len(mp4) + 1000)
        with pytest.raises(ValueError):
            C.parse_mp4(bytes(bad))

    def test_decodes_through_multimodal_dispatch(self):
        samples = _samples(n=4)
        mp4 = C.mux_mp4(samples, 128, 96)
        kind, w, h, body = MM._decode(mp4)
        assert (kind, w, h) == ("video", 128, 96)
        assert body.tobytes() == b"".join(samples)


# ---------------------------------------------------------------------------
# Spark pipeline integration: one mixed-format corpus, one mapInPandas pass
# ---------------------------------------------------------------------------

def test_compressed_formats_through_spark_pipeline(spark):
    png = C.encode_png(np.full((6, 4, 3), 9, dtype=np.uint8))
    jpg = C.encode_jpeg(np.full((8, 8, 3), 200, dtype=np.uint8), quality=95)
    mp4 = C.mux_mp4([b"frameA--", b"frameBB-", b"frameCCC"], 32, 24)
    corrupt_png = png[:-10]  # malformed → dead-lettered, not a task failure
    rows = [
        (20, "image", png, ("image/png", 4, 6, None)),
        (21, "image", jpg, ("image/jpeg", 8, 8, None)),
        (22, "video", mp4, ("video/mp4", 32, 24, 120)),
        (23, "image", corrupt_png, ("image/png", 4, 6, None)),
    ]
    df = spark.createDataFrame(rows, MM.MEDIA_SCHEMA)

    out = {r["media_id"]: r for r in MM.decode_features(df).collect()}
    assert set(out) == {20, 21, 22}
    assert (out[20]["kind"], out[20]["width"], out[20]["height"]) == ("image", 4, 6)
    assert out[20]["n_bytes"] == 6 * 4 * 3 and out[20]["mean_byte"] == 9.0
    assert (out[21]["kind"], out[21]["width"], out[21]["height"]) == ("image", 8, 8)
    assert abs(out[21]["mean_byte"] - 200.0) <= 4
    assert (out[22]["kind"], out[22]["width"], out[22]["height"]) == ("video", 32, 24)
    assert out[22]["n_bytes"] == 24  # 8+8+8 sample bytes out of mdat

    frames = MM.sample_frames(df, n_frames=2).collect()
    got = {(r["media_id"], r["frame_no"]): bytes(r["frame"]) for r in frames}
    assert got == {(22, 1): b"frameA--", (22, 3): b"frameCCC"}

    resized = {r["media_id"]: r for r in MM.resize(df, 2, 2).collect()}
    assert set(resized) == {20, 21, 22}
    assert resized[20]["width"] == 2 and resized[20]["height"] == 2


# ---------------------------------------------------------------------------
# GIF
# ---------------------------------------------------------------------------

class TestGIF:
    @pytest.mark.parametrize("interlace", [False, True])
    def test_round_trip(self, interlace):
        rng = np.random.RandomState(5)
        # 7 distinct colors over a 19x23 canvas
        palette = rng.randint(0, 256, size=(7, 3), dtype=np.uint8)
        px = palette[rng.randint(0, 7, size=(23, 19))]
        w, h, body = C.decode_gif(C.encode_gif(px, interlace=interlace))
        assert (w, h) == (19, 23)
        assert np.array_equal(body.reshape(23, 19, 3), px)

    def test_many_colors_forces_table_growth(self):
        """>2^(min_code_size+1) table entries force LZW code-width growth on
        both sides (the classic off-by-one spot)."""
        rng = np.random.RandomState(11)
        palette = np.array(
            [[i, 255 - i, (i * 7) % 256] for i in range(256)], dtype=np.uint8)
        px = palette[rng.randint(0, 256, size=(40, 40))]
        w, h, body = C.decode_gif(C.encode_gif(px))
        assert np.array_equal(body.reshape(40, 40, 3), px)

    def test_low_entropy_compresses_and_round_trips(self):
        px = np.zeros((64, 64, 3), dtype=np.uint8)
        px[::2] = [200, 10, 10]
        gif = C.encode_gif(px)
        assert len(gif) < 64 * 64  # LZW actually compressed the runs
        _, _, body = C.decode_gif(gif)
        assert np.array_equal(body.reshape(64, 64, 3), px)

    @settings(max_examples=15, deadline=None)
    @given(w=st.integers(1, 20), h=st.integers(1, 20),
           n_colors=st.integers(1, 17), seed=st.integers(0, 2**31 - 1),
           interlace=st.booleans())
    def test_round_trip_property(self, w, h, n_colors, seed, interlace):
        rng = np.random.RandomState(seed)
        palette = rng.randint(0, 256, size=(n_colors, 3), dtype=np.uint8)
        px = palette[rng.randint(0, n_colors, size=(h, w))]
        got_w, got_h, body = C.decode_gif(C.encode_gif(px, interlace=interlace))
        assert (got_w, got_h) == (w, h)
        assert np.array_equal(body.reshape(h, w, 3), px)

    def test_extensions_skipped(self):
        px = np.full((4, 4, 3), 33, dtype=np.uint8)
        gif = bytearray(C.encode_gif(px))
        # splice a Graphic Control Extension right before the image block
        i = bytes(gif).find(b"\x2c")
        gce = b"\x21\xf9\x04\x00\x0a\x00\x00\x00"
        spliced = bytes(gif[:i]) + gce + bytes(gif[i:])
        _, _, body = C.decode_gif(spliced)
        assert np.array_equal(body.reshape(4, 4, 3), px)

    def test_malformed_raises_valueerror(self):
        px = np.full((4, 4, 3), 1, dtype=np.uint8)
        gif = C.encode_gif(px)
        with pytest.raises(ValueError):
            C.decode_gif(b"GIF89a")  # truncated header
        with pytest.raises(ValueError):
            C.decode_gif(gif[: len(gif) - 6])  # LZW data cut short

    def test_decodes_through_multimodal_dispatch(self):
        px = np.full((3, 5, 3), 66, dtype=np.uint8)
        kind, w, h, body = MM._decode(C.encode_gif(px))
        assert (kind, w, h) == ("image", 5, 3)
        assert np.array_equal(body.reshape(3, 5, 3), px)


class TestPNGPalette:
    @staticmethod
    def _palette_png(idx: np.ndarray, palette: np.ndarray, with_plte=True) -> bytes:
        """Hand-built color-type-3 PNG (filter-0 rows of 8-bit indices)."""
        import zlib
        h, w = idx.shape
        def chunk(t, d):
            return struct.pack(">I", len(d)) + t + d + struct.pack(
                ">I", zlib.crc32(t + d) & 0xFFFFFFFF)
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)
        raw = b"".join(b"\x00" + idx[y].astype(np.uint8).tobytes() for y in range(h))
        out = C.PNG_MAGIC + chunk(b"IHDR", ihdr)
        if with_plte:
            out += chunk(b"PLTE", palette.astype(np.uint8).tobytes())
        return out + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")

    def test_indexed_decodes_to_rgb(self):
        palette = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [7, 8, 9]],
                           dtype=np.uint8)
        rng = np.random.RandomState(21)
        idx = rng.randint(0, 4, size=(6, 10))
        w, h, c, body = C.decode_png(self._palette_png(idx, palette))
        assert (w, h, c) == (10, 6, 3)
        assert np.array_equal(body.reshape(6, 10, 3), palette[idx])

    def test_missing_plte_raises(self):
        idx = np.zeros((2, 2), dtype=np.uint8)
        png = self._palette_png(idx, np.zeros((1, 3)), with_plte=False)
        with pytest.raises(ValueError, match="PLTE"):
            C.decode_png(png)

    def test_index_out_of_palette_range_raises(self):
        palette = np.array([[1, 2, 3]], dtype=np.uint8)  # 1 entry
        idx = np.full((2, 2), 5)  # index 5 out of range
        with pytest.raises(ValueError, match="index out of range"):
            C.decode_png(self._palette_png(idx, palette))

    def test_through_multimodal_dispatch(self):
        palette = np.array([[10, 20, 30], [40, 50, 60]], dtype=np.uint8)
        idx = np.array([[0, 1], [1, 0]])
        kind, w, h, body = MM._decode(self._palette_png(idx, palette))
        assert (kind, w, h) == ("image", 2, 2)
        assert np.array_equal(body.reshape(2, 2, 3), palette[idx])


# ---------------------------------------------------------------------------
# Allocation guards: header-declared sizes are bounded BEFORE any buffer is
# allocated.  Each payload here is ~100 bytes but declares GB-scale output;
# the decoder must raise ValueError (→ per-row dead-letter) instead of
# allocating.  All asserts must complete instantly — an OOM or a minutes-long
# LZW loop means the guard regressed.
# ---------------------------------------------------------------------------

def _patch_be32(buf: bytes, tag: bytes, field_off: int, value: int) -> bytes:
    """Overwrite the big-endian u32 at <first occurrence of tag> + field_off."""
    i = buf.find(tag)
    assert i >= 0
    out = bytearray(buf)
    struct.pack_into(">I", out, i + field_off, value)
    return bytes(out)


class TestAllocationGuards:
    def test_mp4_stsz_constant_size_bomb(self):
        mp4 = C.mux_mp4(_samples(n=3), 64, 64)
        # stsz layout: 'stsz' + ver/flags(4) + sample_size(4) + count(4)
        bomb = _patch_be32(mp4, b"stsz", 4 + 4, 1 << 16)        # sample_size
        bomb = _patch_be32(bomb, b"stsz", 4 + 8, 1 << 16)       # count → 2^32 B
        with pytest.raises(ValueError, match="stsz"):
            C.parse_mp4(bomb)

    def test_mp4_stsz_table_count_bomb(self):
        mp4 = C.mux_mp4(_samples(n=3), 64, 64)
        bomb = _patch_be32(mp4, b"stsz", 4 + 4, 0)              # table form
        bomb = _patch_be32(bomb, b"stsz", 4 + 8, 1 << 30)
        with pytest.raises(ValueError, match="stsz count exceeds box"):
            C.parse_mp4(bomb)

    def test_mp4_stss_count_bomb(self):
        mp4 = C.mux_mp4(_samples(n=3), 64, 64, sync_samples=[1])
        bomb = _patch_be32(mp4, b"stss", 4 + 4, 1 << 30)
        with pytest.raises(ValueError, match="stss count exceeds box"):
            C.parse_mp4(bomb)

    def test_mp4_stco_count_bomb(self):
        mp4 = C.mux_mp4(_samples(n=3), 64, 64)
        bomb = _patch_be32(mp4, b"stco", 4 + 4, 1 << 30)
        with pytest.raises(ValueError, match="stco count exceeds box"):
            C.parse_mp4(bomb)

    def test_mp4_stsc_count_bomb(self):
        mp4 = C.mux_mp4(_samples(n=3), 64, 64)
        bomb = _patch_be32(mp4, b"stsc", 4 + 4, 1 << 30)
        with pytest.raises(ValueError, match="stsc count exceeds box"):
            C.parse_mp4(bomb)

    def test_jpeg_sof_dimension_bomb(self):
        jpg = C.encode_jpeg(np.full((8, 8, 3), 50, dtype=np.uint8))
        i = jpg.find(b"\xff\xc0")
        assert i >= 0
        out = bytearray(jpg)
        # SOF0: FF C0 <len:2> <prec:1> <h:2> <w:2> ...
        struct.pack_into(">HH", out, i + 5, 65535, 65535)
        with pytest.raises(ValueError, match="pixel cap"):
            C.decode_jpeg(bytes(out))

    def test_gif_dimension_bomb(self):
        gif = C.encode_gif(np.full((4, 4, 3), 30, dtype=np.uint8))
        i = gif.find(b"\x2c")  # image descriptor
        assert i >= 0
        out = bytearray(gif)
        struct.pack_into("<HH", out, i + 5, 65535, 65535)  # w, h
        with pytest.raises(ValueError, match="pixel cap"):
            C.decode_gif(bytes(out))

    def test_png_ihdr_dimension_bomb(self):
        import zlib as _z

        def chunk(t, d):
            return struct.pack(">I", len(d)) + t + d + struct.pack(
                ">I", _z.crc32(t + d) & 0xFFFFFFFF)

        ihdr = struct.pack(">IIBBBBB", 100_000, 100_000, 8, 2, 0, 0, 0)
        png = (C.PNG_MAGIC + chunk(b"IHDR", ihdr)
               + chunk(b"IDAT", _z.compress(b"\x00")) + chunk(b"IEND", b""))
        with pytest.raises(ValueError, match="pixel cap"):
            C.decode_png(png)

    def test_png_deflate_bomb_is_bounded(self):
        # tiny declared dims, IDAT inflating to 64 MB: the bounded inflate
        # reads at most expected+1 bytes and reports a size mismatch
        import zlib as _z

        def chunk(t, d):
            return struct.pack(">I", len(d)) + t + d + struct.pack(
                ">I", _z.crc32(t + d) & 0xFFFFFFFF)

        ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0)
        bomb = _z.compress(b"\x00" * (64 << 20))
        png = (C.PNG_MAGIC + chunk(b"IHDR", ihdr)
               + chunk(b"IDAT", bomb) + chunk(b"IEND", b""))
        with pytest.raises(ValueError, match="size mismatch"):
            C.decode_png(png)

    def test_mp4_bomb_dead_letters_in_spark_decode(self, spark):
        # the ADVICE scenario end-to-end: a crafted bomb row inside a Spark
        # decode pass is dropped per-row, the good rows survive
        good = C.mux_mp4(_samples(n=3), 64, 64)
        bomb = _patch_be32(good, b"stsz", 4 + 4, 1 << 16)
        bomb = _patch_be32(bomb, b"stsz", 4 + 8, 1 << 16)
        df = spark.createDataFrame(
            [(1, bytearray(good)), (2, bytearray(bomb))],
            "media_id long, payload binary",
        )
        rows = MM.decode_features(df).select("media_id").collect()
        assert [r.media_id for r in rows] == [1]
