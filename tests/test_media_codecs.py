"""Real media decode: PNG (all five filter types) and WAV round-trips,
resize, DSP features, and the Spark-side codec routing."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from mapping_analysis_spark.functions.media_codecs import (
    audio_features,
    decode_png,
    decode_wav,
    encode_png,
    encode_wav,
    image_features,
    resize_image,
)


def test_png_roundtrip_rgb_and_gray():
    rng = np.random.default_rng(7)
    for shape in [(5, 4, 3), (8, 8, 1), (3, 7, 4), (6, 2, 2)]:
        img = rng.integers(0, 256, size=shape).astype(np.uint8)
        assert np.array_equal(decode_png(encode_png(img)), img)


def test_png_decode_all_filter_types():
    """Hand-filter one scanline per PNG filter type (0..4) with the spec's
    forward formulas and assert the decoder inverts every one exactly."""
    rng = np.random.default_rng(11)
    h, w, ch = 5, 6, 3
    img = rng.integers(0, 256, size=(h, w, ch)).astype(np.uint8)
    stride = w * ch
    flat = img.reshape(h, stride).astype(int)

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

    raw = b""
    for y in range(h):
        ftype = y % 5
        rec = flat[y]
        prev = flat[y - 1] if y > 0 else np.zeros(stride, dtype=int)
        line = np.zeros(stride, dtype=int)
        for x in range(stride):
            left = rec[x - ch] if x >= ch else 0
            up = prev[x]
            ul = prev[x - ch] if x >= ch else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = left
            elif ftype == 2:
                pred = up
            elif ftype == 3:
                pred = (left + up) >> 1
            else:
                pred = paeth(left, up, ul)
            line[x] = (rec[x] - pred) & 0xFF
        raw += bytes([ftype]) + bytes(line.astype(np.uint8))

    def chunk(tag, data):
        body = tag + data
        return struct.pack(">I", len(data)) + body + struct.pack(
            ">I", zlib.crc32(body) & 0xFFFFFFFF
        )

    payload = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(payload), img)


def test_png_palette_expansion():
    plte = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 128]], dtype=np.uint8)
    idx = np.array([[0, 1], [2, 1]], dtype=np.uint8)
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(2))

    def chunk(tag, data):
        body = tag + data
        return struct.pack(">I", len(data)) + body + struct.pack(
            ">I", zlib.crc32(body) & 0xFFFFFFFF
        )

    payload = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0))
        + chunk(b"PLTE", plte.tobytes())
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(payload), plte[idx])


def test_png_rejects_non_png():
    with pytest.raises(ValueError):
        decode_png(b"\xff\xd8\xff\xe0 not a png")


def test_wav_roundtrip_16bit_exact():
    rng = np.random.default_rng(3)
    x = (rng.integers(-32768, 32768, size=(400, 2)) / 32768.0).astype(np.float32)
    out, rate = decode_wav(encode_wav(x, 16000))
    assert rate == 16000 and out.shape == (400, 2)
    # 16-bit quantization is the only loss: round-trip within 1 LSB
    assert np.max(np.abs(out - x)) <= 1.0 / 32767 + 1e-7


def test_resize_block_average():
    img = np.zeros((8, 8), dtype=np.uint8)
    img[:4] = 200  # top half bright
    out = resize_image(img, 2, 2)
    assert out.shape == (2, 2, 1)
    assert np.array_equal(out[:, :, 0], [[200, 200], [0, 0]])


def test_audio_features_sine_centroid():
    rate = 8000
    t = np.arange(rate) / rate  # 1 second
    for f0 in (500.0, 2000.0):
        feats = audio_features(np.sin(2 * np.pi * f0 * t).astype(np.float32), rate)
        dur, rms, zcr, centroid = feats[:4]
        assert abs(dur - 1.0) < 1e-6
        assert abs(rms - 0.7071) < 0.01
        # ZCR of a sine = 2*f0 crossings/sec → per-sample rate 2*f0/rate
        assert abs(zcr - 2 * f0 / rate) < 0.01
        # spectral centroid of a pure tone sits at f0 (normalized to Nyquist)
        assert abs(centroid - f0 / (rate / 2)) < 0.02
        assert len(feats) == 12


def test_image_features_shape_and_thumbnail():
    img = np.full((16, 16, 3), 100, dtype=np.uint8)
    feats = image_features(img)
    assert feats[:3].tolist() == [16.0, 16.0, 3.0]
    assert abs(feats[3] - 100.0) < 1e-5 and feats[4] == 0.0
    assert np.allclose(feats[5:], 100.0 / 255.0)


def test_spark_codec_routing(spark):
    """extract_features(use_codecs=True): PNG rows get real image features
    (len 21), WAV rows real audio features (len 12), video rows the
    histogram fallback (len 32 default dim)."""
    from mapping_analysis_spark.operators.multimodal import (
        extract_features,
        synthetic_media,
    )

    media = synthetic_media(spark, n=30)
    feats = {r["media_id"]: r for r in extract_features(media, use_codecs=True).collect()}
    kinds = {r["media_id"]: r["kind"] for r in media.select("media_id", "kind").collect()}
    want_len = {"image": 21, "audio": 12, "video": 32}
    assert len(feats) == 30
    for mid, r in feats.items():
        assert len(r["feature"]) == want_len[kinds[mid]], kinds[mid]
    # image thumbnails are real decodes: h=w=16, ch=3 in the header slots
    img_feats = [r["feature"] for m, r in feats.items() if kinds[m] == "image"]
    for f in img_feats:
        assert f[:3] == [16.0, 16.0, 3.0]
    # audio durations decode to the synthetic 0.5-3 s range
    for m, r in feats.items():
        if kinds[m] == "audio":
            assert 0.4 < r["feature"][0] < 3.1


def test_audio_features_zero_frames_fixed_dim():
    feats = audio_features(np.zeros((0, 1), dtype=np.float32), 8000)
    assert len(feats) == 12 and not np.any(feats)


def test_png_malformed_raises_valueerror_only():
    ok = encode_png(np.zeros((4, 4, 3), dtype=np.uint8))
    for bad in (ok[:20], ok[:-8], ok[:40] + b"\x00" * 10):
        with pytest.raises(ValueError):
            decode_png(bad)
