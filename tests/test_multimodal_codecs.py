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
