"""Multimodal plumbing: schemas, mapInPandas batching, real uncompressed
codecs (BMP/WAV/PPM) + fixture format.  Compressed codecs (PNG/JPEG/MP4)
are real too since round 3 — see tests/test_codecs.py; the payloads here
with PNG/JPEG magic are MALFORMED, so they exercise the drop path."""

from __future__ import annotations

import pytest

from frontier_engine import multimodal as MM


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", MM.fake_media_bytes("image", 64, 48, seed=1), ("image/x-fake", 64, 48, None)),
        (2, "audio", MM.fake_media_bytes("audio", 0, 0, seed=2, n=512), ("audio/x-fake", 0, 0, 3000)),
        (3, "video", MM.fake_media_bytes("video", 32, 32, seed=3, n=1024), ("video/x-fake", 32, 32, 9000)),
        (4, "image", b"\x89PNG\r\n\x1a\n not really", ("image/png", 1, 1, None)),  # malformed PNG → dropped
        (5, "image", None, ("image/x-fake", 0, 0, None)),
    ]
    return spark.createDataFrame(rows, MM.MEDIA_SCHEMA)


def test_decode_features(spark, media):
    out = {r["media_id"]: r for r in MM.decode_features(media).collect()}
    assert set(out) == {1, 2, 3}  # malformed-PNG + null payloads dropped
    img = out[1]
    assert (img["kind"], img["width"], img["height"], img["n_bytes"]) == ("image", 64, 48, 256)
    assert sum(img["byte_hist"]) == 256
    assert 0 <= img["mean_byte"] <= 255
    # deterministic: same seed → same features
    again = {r["media_id"]: r for r in MM.decode_features(media).collect()}
    assert again[1]["mean_byte"] == img["mean_byte"]


def test_resize(spark, media):
    out = {r["media_id"]: r for r in MM.resize(media, 16, 16).collect()}
    assert out[1]["width"] == 16 and out[1]["height"] == 16
    assert len(out[1]["payload"]) > 8


def test_sample_frames(spark, media):
    frames = MM.sample_frames(media, n_frames=4).collect()
    assert {r["media_id"] for r in frames} == {3}  # only video yields frames
    assert sorted(r["frame_no"] for r in frames) == [0, 1, 2, 3]
    total = sum(len(r["frame"]) for r in frames)
    assert total == 1024


def test_bmp_round_trip():
    import numpy as np

    px = np.arange(3 * 5 * 3, dtype=np.uint8).reshape(3, 5, 3)  # w=5 → row pad 1
    kind, w, h, body = MM._decode(MM.encode_bmp(px))
    assert (kind, w, h) == ("image", 5, 3)
    assert np.array_equal(body.reshape(3, 5, 3), px)  # padding stripped, BGR undone


def test_wav_round_trip():
    import numpy as np

    samples = (np.arange(16, dtype=np.int16) * 1000 - 8000).astype(np.int16)
    kind, channels, bits, body = MM._decode(MM.encode_wav(samples, 8000, channels=2))
    assert (kind, channels, bits) == ("audio", 2, 16)
    assert np.array_equal(np.frombuffer(body.tobytes(), dtype="<i2"), samples)


def test_ppm_round_trip():
    import numpy as np

    px = (np.arange(4 * 4 * 3, dtype=np.uint8) * 3).reshape(4, 4, 3)
    kind, w, h, body = MM._decode(MM.encode_ppm(px))
    assert (kind, w, h) == ("image", 4, 4)
    assert np.array_equal(body.reshape(4, 4, 3), px)
    # comments in the header parse too
    with_comment = b"P6\n# a comment\n4 4\n255\n" + px.tobytes()
    assert MM._decode(with_comment)[1:3] == (4, 4)


def test_real_formats_through_spark_pipeline(spark):
    """BMP/WAV payloads decode through the same mapInPandas operator as the
    fixture format — mixed-format corpora in one pass."""
    import numpy as np

    bmp = MM.encode_bmp(np.full((2, 2, 3), 7, dtype=np.uint8))
    wav = MM.encode_wav(np.zeros(8, dtype=np.int16))
    rows = [
        (10, "image", bmp, ("image/bmp", 2, 2, None)),
        (11, "audio", wav, ("audio/wav", 0, 0, 1000)),
        (12, "image", b"\xff\xd8\xff\xe0 jpeg soi", ("image/jpeg", 1, 1, None)),
    ]
    df = spark.createDataFrame(rows, MM.MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in MM.decode_features(df).collect()}
    assert set(out) == {10, 11}  # truncated JPEG dropped
    assert (out[10]["kind"], out[10]["width"], out[10]["height"]) == ("image", 2, 2)
    assert out[10]["n_bytes"] == 12 and out[10]["mean_byte"] == 7.0
    assert (out[11]["kind"], out[11]["width"]) == ("audio", 1)
    assert out[11]["n_bytes"] == 16 and out[11]["mean_byte"] == 0.0


def test_malformed_riff_dropped_not_task_failure(spark):
    """A RIFF/WAVE payload with a truncated 'fmt ' chunk raises struct.error
    deep in the codec; the operators must drop the ROW (dead-letter
    contract) rather than fail the whole Spark task on one malformed byte
    string in untrusted crawl data (ADVICE r2)."""
    import struct

    import numpy as np

    good = MM.encode_wav(np.zeros(4, dtype=np.int16))
    # 'fmt ' chunk claims 16 bytes but the payload ends after 2
    bad = b"RIFF" + struct.pack("<I", 20) + b"WAVE" + b"fmt " + struct.pack("<I", 16) + b"\x01\x00"
    # direct codec behavior: ValueError (catchable), never struct.error
    try:
        MM._decode(bad)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
    rows = [
        (1, "audio", good, ("audio/wav", 0, 0, 1000)),
        (2, "audio", bad, ("audio/wav", 0, 0, 1000)),
    ]
    df = spark.createDataFrame(rows, MM.MEDIA_SCHEMA)
    assert [r["media_id"] for r in MM.decode_features(df).collect()] == [1]
    assert [r["media_id"] for r in MM.resize(df, 2, 2).collect()] == [1]
    # sample_frames keeps only video rows; the point is it must not crash
    assert MM.sample_frames(df, 1).collect() == []


def test_audio_features_match_numpy_oracle(spark):
    import numpy as np

    from frontier_engine.multimodal import audio_features, encode_wav

    rows = []
    oracle = {}
    for i in range(5):
        n = 64 + i * 16
        s = (((np.arange(n) * 7 + i * 31) % 256) - 128).astype(np.int16)
        rows.append((i, encode_wav(s, sample_rate=8000)))
        sf_ = s.astype(np.float64)
        mag = np.abs(np.fft.rfft(sf_))
        freqs = np.fft.rfftfreq(n, d=1 / 8000)
        neg = s < 0
        oracle[i] = (
            n,
            n * 1000 // 8000,
            int(np.abs(s).max()),
            int(np.count_nonzero(neg[1:] != neg[:-1])),
            float(np.sqrt((sf_ * sf_).mean())),
            float((mag * freqs).sum() / mag.sum()),
        )
    # stereo: channels cancel -> integer-floor mixdown is exactly zero
    st = np.stack(
        [np.arange(40) % 100, -(np.arange(40) % 100)], axis=1
    ).astype(np.int16).reshape(-1)
    rows.append((100, encode_wav(st, sample_rate=16000, channels=2)))
    rows.append((200, b"not a wav"))  # undecodable -> dropped, not a failure
    # truncated fmt chunk: struct.error inside the parser must dead-letter
    # (ValueError), never fail the Spark task
    import struct as _struct

    rows.append(
        (201, b"RIFF\x00\x00\x00\x00WAVEfmt " + _struct.pack("<I", 4) + b"\x01\x00\x01\x00")
    )

    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r.media_id: r for r in audio_features(df).collect()}

    assert set(got) == {0, 1, 2, 3, 4, 100}  # 200/201 dead-lettered
    for i, (n, dur, peak, zc, rms, cent) in oracle.items():
        r = got[i]
        assert (r.sample_rate, r.n_samples, r.duration_ms) == (8000, n, dur)
        assert (r.peak, r.zero_crossings) == (peak, zc)
        assert r.rms == pytest.approx(rms, abs=1e-9)
        assert r.spectral_centroid_hz == pytest.approx(cent, abs=1e-6)
    r100 = got[100]
    assert (r100.sample_rate, r100.peak, r100.rms) == (16000, 0, 0.0)
    assert r100.spectral_centroid_hz == 0.0  # silent signal: defined as 0


def test_audio_resample_linear_interp(spark):
    import numpy as np

    from frontier_engine.multimodal import (
        audio_features,
        audio_resample,
        encode_wav,
        _wav_samples,
    )

    n = 100
    s = (((np.arange(n) * 13 + 5) % 200) - 100).astype(np.int16)
    df = spark.createDataFrame(
        [(1, encode_wav(s, sample_rate=8000)), (2, b"junk")],
        "media_id long, payload binary",
    )
    out = audio_resample(df, target_rate=4000).collect()
    assert len(out) == 1 and out[0].media_id == 1  # junk dropped
    assert (out[0].sample_rate, out[0].n_samples) == (4000, 50)
    rate, got = _wav_samples(bytes(out[0].payload))
    assert rate == 4000
    # numpy oracle: linear interp on the exact grid, round half away from 0
    dst = np.arange(50, dtype=np.float64) * 2.0
    want = np.interp(dst, np.arange(n, dtype=np.float64), s.astype(np.float64))
    want = np.trunc(want + np.where(want >= 0, 0.5, -0.5)).astype(np.int16)
    assert np.array_equal(got.astype(np.int16), want)
    # negative samples are NOT shifted: an exactly-representable negative
    # survives the round trip (floor-based rounding would yield -101)
    exact = (-100 * np.ones(8)).astype(np.int16)
    df2 = spark.createDataFrame(
        [(3, encode_wav(exact, sample_rate=8000))], "media_id long, payload binary"
    )
    out2 = audio_resample(df2, target_rate=4000).collect()[0]
    _, got2 = _wav_samples(bytes(out2.payload))
    assert np.array_equal(got2, -100 * np.ones(4, dtype=np.int32))
    # the re-encoded WAV feeds straight back into audio_features
    feats = audio_features(spark.createDataFrame(
        [(1, bytes(out[0].payload))], "media_id long, payload binary"
    )).collect()[0]
    assert (feats.sample_rate, feats.n_samples, feats.duration_ms) == (4000, 50, 12)


def test_spectrogram_frames_match_numpy(spark):
    import numpy as np
    import pytest as _pytest

    from frontier_engine.multimodal import encode_wav, spectrogram_frames

    n = 200
    s = (((np.arange(n) * 29 + 3) % 256) - 128).astype(np.int16)
    df = spark.createDataFrame(
        [(7, encode_wav(s, sample_rate=8000))], "media_id long, payload binary"
    )
    rows = sorted(spectrogram_frames(df, n_fft=64, n_frames=4, n_bands=8).collect(),
                  key=lambda r: r.frame_no)
    assert [r.frame_no for r in rows] == [0, 1, 2, 3]
    sf_ = s.astype(np.float64)
    for k, r in enumerate(rows):
        st = (k * (n - 64)) // 3
        mag = np.abs(np.fft.rfft(sf_[st:st + 64]))[:32]
        want = mag.reshape(8, 4).mean(axis=1)
        assert np.allclose(r.band_energy, want, atol=1e-9), k
    # a clip shorter than one window still emits zero-padded frames
    short = spark.createDataFrame(
        [(8, encode_wav(s[:10], sample_rate=8000))], "media_id long, payload binary"
    )
    srows = spectrogram_frames(short, n_fft=64, n_frames=2, n_bands=8).collect()
    assert len(srows) == 2
    magp = np.abs(np.fft.rfft(np.pad(sf_[:10], (0, 54))))[:32]
    assert np.allclose(srows[0].band_energy, magp.reshape(8, 4).mean(axis=1))
    with _pytest.raises(ValueError, match="must divide"):
        spectrogram_frames(short, n_fft=64, n_bands=5)
