"""Real codec-free image decode: PPM/BMP roundtrips and the real
feature path through extract_features."""

from __future__ import annotations

import struct

import numpy as np

from hawk_pack_spark.multimodal.ops import (
    decode_bmp,
    decode_image,
    decode_ppm,
    encode_ppm,
    extract_features,
    image_feature,
)


def _pixels(h=12, w=16, seed=5):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_ppm_roundtrip_exact():
    px = _pixels()
    assert np.array_equal(decode_ppm(encode_ppm(px)), px)


def test_ppm_header_with_comment():
    px = _pixels(2, 3)
    raw = encode_ppm(px)
    commented = b"P6\n# a comment\n3 2\n255\n" + raw[raw.index(b"255\n") + 4 :]
    assert np.array_equal(decode_ppm(commented), px)


def _encode_bmp(px: np.ndarray) -> bytes:
    """Minimal 24-bit BI_RGB encoder (bottom-up, padded rows) for the
    roundtrip test."""
    h, w, _ = px.shape
    row_bytes = (w * 3 + 3) & ~3
    data = bytearray()
    for r in range(h - 1, -1, -1):  # bottom-up
        row = px[r][:, ::-1].tobytes()  # RGB -> BGR
        data += row + b"\0" * (row_bytes - len(row))
    off = 14 + 40
    hdr = b"BM" + struct.pack("<IHHI", off + len(data), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 0, 0, 0, 0)
    return hdr + info + bytes(data)


def test_bmp_roundtrip_exact():
    px = _pixels(5, 7)
    assert np.array_equal(decode_bmp(_encode_bmp(px)), px)
    assert np.array_equal(decode_image(_encode_bmp(px)), px)


def test_image_feature_is_real_and_unit_norm():
    px = _pixels()
    v = image_feature(px)
    assert v.shape == (64,)
    assert abs(np.linalg.norm(v) - 1.0) < 1e-12
    # real signal: brightening the image moves the grid-mean dims
    brighter = np.clip(px.astype(np.int32) + 80, 0, 255).astype(np.uint8)
    assert not np.allclose(v, image_feature(brighter))
    # and an all-black image still embeds (histogram mass keeps norm > 0)
    black = np.zeros_like(px)
    assert abs(np.linalg.norm(image_feature(black)) - 1.0) < 1e-12


def test_extract_features_uses_real_path_for_ppm(spark):
    px = _pixels()
    rows = [(1, "image", bytearray(encode_ppm(px)), None),
            (2, "audio", bytearray(b"not an image"), None)]
    df = spark.createDataFrame(
        rows,
        "media_id long, kind string, payload binary, "
        "meta struct<width:int,height:int,n_frames:int,sample_rate:int>",
    )
    feats = {r.media_id: np.array(r.feature) for r in extract_features(df).collect()}
    assert np.allclose(feats[1], image_feature(px))  # REAL decode+embed
    assert feats[1].shape == feats[2].shape == (64,)


def test_wav_roundtrip_exact():
    from hawk_pack_spark.multimodal.ops import decode_wav, encode_wav

    rng = np.random.default_rng(9)
    s = rng.integers(-32768, 32767, size=500, dtype=np.int16)
    x, rate = decode_wav(encode_wav(s, 8000))
    assert rate == 8000
    assert np.allclose(x, s.astype(np.float64) / 32768.0)


def test_audio_feature_real_signal():
    from hawk_pack_spark.multimodal.ops import audio_feature, decode_wav, encode_wav

    t = np.arange(1600)
    tone = (np.sin(2 * np.pi * 440 * t / 16000) * 20000).astype(np.int16)
    noise = (np.random.default_rng(1).standard_normal(1600) * 8000).astype(np.int16)
    f_tone = audio_feature(decode_wav(encode_wav(tone))[0])
    f_noise = audio_feature(decode_wav(encode_wav(noise))[0])
    for f in (f_tone, f_noise):
        assert f.shape == (64,) and abs(np.linalg.norm(f) - 1.0) < 1e-12
    # a pure tone and white noise must embed far apart
    assert float(f_tone @ f_noise) < 0.9
    # silence embeds without NaN/zero-norm
    silent = audio_feature(np.zeros(1600))
    assert abs(np.linalg.norm(silent) - 1.0) < 1e-12


def test_extract_features_uses_real_path_for_wav(spark):
    from hawk_pack_spark.multimodal.ops import audio_feature, decode_wav, encode_wav

    s = (np.arange(400) % 97).astype(np.int16) * 300
    rows = [(7, "audio", bytearray(encode_wav(s)), None)]
    df = spark.createDataFrame(
        rows,
        "media_id long, kind string, payload binary, "
        "meta struct<width:int,height:int,n_frames:int,sample_rate:int>",
    )
    feats = {r.media_id: np.array(r.feature) for r in extract_features(df).collect()}
    assert np.allclose(feats[7], audio_feature(decode_wav(encode_wav(s))[0]))
