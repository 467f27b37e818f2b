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


def _png_with_filters(pixels: np.ndarray, filters: list[int]) -> bytes:
    """Forward-filter a known RGB image with a chosen per-row filter
    sequence and wrap it into a valid PNG — exercises the decoder's
    Sub/Up/Average/Paeth reconstruction against ground truth."""
    import struct
    import zlib

    h, w, _ = pixels.shape
    bpp = 3
    flat = pixels.reshape(h, w * bpp).astype(np.int32)
    raw = bytearray()
    for y in range(h):
        f = filters[y % len(filters)]
        raw.append(f)
        prev = flat[y - 1] if y else np.zeros(w * bpp, np.int32)
        for x in range(w * bpp):
            cur = int(flat[y, x])
            a = int(flat[y, x - bpp]) if x >= bpp else 0
            b = int(prev[x])
            c = int(prev[x - bpp]) if x >= bpp else 0
            if f == 0:
                enc = cur
            elif f == 1:
                enc = cur - a
            elif f == 2:
                enc = cur - b
            elif f == 3:
                enc = cur - ((a + b) >> 1)
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                enc = cur - pred
            raw.append(enc & 0xFF)

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b"")
    )


def test_png_roundtrip_and_cross_codec():
    from hawk_pack_spark.multimodal.ops import (
        decode_image,
        decode_png,
        decode_ppm,
        encode_png,
        encode_ppm,
    )

    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(13, 9, 3), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(px)), px)
    # the three native codecs agree on the same pixels
    assert np.array_equal(decode_png(encode_png(px)), decode_ppm(encode_ppm(px)))
    # dispatcher routes by signature
    assert np.array_equal(decode_image(encode_png(px)), px)


def test_png_all_five_filters_reconstruct():
    from hawk_pack_spark.multimodal.ops import decode_png

    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, size=(10, 7, 3), dtype=np.uint8)
    # every row exercises a different filter, including y=0 edge cases
    for filters in ([1], [2], [3], [4], [0, 1, 2, 3, 4]):
        assert np.array_equal(
            decode_png(_png_with_filters(px, filters)), px
        ), f"filter sequence {filters}"


def test_png_gray_and_rgba_variants():
    import struct
    import zlib

    from hawk_pack_spark.multimodal.ops import decode_png

    def make(color_type: int, channels: int, w=5, h=4):
        rng = np.random.default_rng(color_type)
        img = rng.integers(0, 256, size=(h, w, channels), dtype=np.uint8)
        raw = np.concatenate(
            [np.zeros((h, 1), np.uint8), img.reshape(h, w * channels)], axis=1
        ).tobytes()

        def chunk(typ, data):
            return (
                struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
            )

        png = (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b"")
        )
        return img, png

    gray, png_g = make(0, 1)
    out = decode_png(png_g)
    assert out.shape == (4, 5, 3)
    assert np.array_equal(out, np.repeat(gray, 3, axis=2))

    rgba, png_a = make(6, 4)
    out = decode_png(png_a)
    assert np.array_equal(out, rgba[:, :, :3])


def test_extract_features_uses_real_path_for_png(spark):
    from hawk_pack_spark.multimodal.ops import encode_png, image_feature

    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    rows = [(9, "image", bytearray(encode_png(px)), None)]
    df = spark.createDataFrame(
        rows,
        "media_id long, kind string, payload binary, "
        "meta struct<width:int,height:int,n_frames:int,sample_rate:int>",
    )
    feats = {r.media_id: np.array(r.feature) for r in extract_features(df).collect()}
    assert np.allclose(feats[9], image_feature(px))


def test_png_extreme_dimensions():
    from hawk_pack_spark.multimodal.ops import decode_png, encode_png

    rng = np.random.default_rng(23)
    for h, w in ((1, 1), (1, 17), (17, 1), (2, 2)):
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert np.array_equal(decode_png(encode_png(px)), px), (h, w)
    # filtered single-column image exercises the x < bpp edges of
    # Sub/Average/Paeth reconstruction on every row
    px = rng.integers(0, 256, size=(6, 1, 3), dtype=np.uint8)
    for filters in ([1], [3], [4]):
        assert np.array_equal(
            decode_png(_png_with_filters(px, filters)), px
        ), filters


def test_resize_media_real_pixels(spark, sf_dir):
    """resize_media completes resize_meta's plan with REAL pixels:
    decoded dims equal the plan, and the resized pixels are exactly the
    nearest-neighbor gather of the original."""
    import numpy as np

    from hawk_pack_spark.multimodal import ops as M

    # note: resize_meta plans from DECLARED metadata (the catalog-scan
    # shape at 100 TB); resize_media executes on the REAL payload dims —
    # the fixture's synthetic meta deliberately differs, so the ground
    # truth here is the decoded pixels themselves.
    media = M.synthetic_media(spark, sf_dir).localCheckpoint()
    small = M.resize_media(media, max_side=8)
    orig = {r.media_id: bytes(r.payload) for r in media.collect()}
    n_img = 0
    for r in small.collect():
        if r.kind != "image":
            continue
        px = M.decode_image(bytes(r.payload))
        src_px = M.decode_image(orig[r.media_id])
        h, w = src_px.shape[:2]
        scale = min(1.0, 8 / max(w, h, 1))
        tw, th = max(1, round(w * scale)), max(1, round(h * scale))
        assert (r.meta.width, r.meta.height) == (tw, th)  # meta rewritten true
        assert px.shape == (th, tw, 3)
        np.testing.assert_array_equal(px, M.resize_pixels(src_px, tw, th))
        n_img += 1
    assert n_img > 0


# ---------------------------------------------------------------------------
# baseline JPEG (pure-numpy ITU-T T.81, multimodal/jpeg.py)


def _smooth(h=40, w=56):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            xx * 255 / w,
            yy * 255 / h,
            127 + 80 * np.sin(xx / 7.0) * np.cos(yy / 5.0),
        ],
        axis=2,
    ).clip(0, 255).astype(np.uint8)


def test_jpeg_roundtrip_within_lossy_tolerance():
    from hawk_pack_spark.multimodal.jpeg import decode_jpeg, encode_jpeg

    img = _smooth()
    for q, tol in [(100, 4), (95, 12), (75, 24)]:
        out = decode_jpeg(encode_jpeg(img, quality=q))
        assert out.shape == img.shape
        err = np.abs(out.astype(int) - img.astype(int))
        assert err.max() <= tol, (q, err.max())


def test_jpeg_chroma_subsampling_and_odd_dims():
    from hawk_pack_spark.multimodal.jpeg import decode_jpeg, encode_jpeg

    img = _smooth(41, 53)  # neither 8- nor 16-multiple
    out = decode_jpeg(encode_jpeg(img, quality=95, subsample=True))
    assert out.shape == img.shape
    err = np.abs(out.astype(int) - img.astype(int))
    # 4:2:0 averages chroma 2x2 — luma stays tight, chroma softer
    assert err.max() <= 40 and err.mean() <= 6


def test_jpeg_restart_intervals():
    from hawk_pack_spark.multimodal.jpeg import decode_jpeg, encode_jpeg

    img = _smooth(41, 53)
    base = decode_jpeg(encode_jpeg(img, quality=95))
    for ri in (1, 2, 3):
        out = decode_jpeg(encode_jpeg(img, quality=95, restart_interval=ri))
        # restarts change the bitstream framing, not the pixels
        assert np.array_equal(out, base)


def test_jpeg_gray_and_noise():
    from hawk_pack_spark.multimodal.jpeg import decode_jpeg, encode_jpeg

    g = (np.add.outer(np.arange(24), np.arange(32)) * 4).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(g, quality=95))
    assert out.shape == (24, 32, 3)
    assert np.abs(out[:, :, 0].astype(int) - g.astype(int)).max() <= 4
    # pure noise at q100: entropy coder must survive max-magnitude ACs
    noise = _pixels(24, 24, seed=0)
    out = decode_jpeg(encode_jpeg(noise, quality=100))
    assert np.abs(out.astype(int) - noise.astype(int)).max() <= 4


def test_jpeg_rejects_progressive():
    import pytest

    from hawk_pack_spark.multimodal.jpeg import decode_jpeg, encode_jpeg

    payload = bytearray(encode_jpeg(_smooth(16, 16)))
    i = payload.find(b"\xff\xc0")
    payload[i + 1] = 0xC2  # rewrite SOF0 → SOF2 (progressive)
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(payload))


def test_extract_features_uses_real_path_for_jpeg(spark):
    from hawk_pack_spark.multimodal.jpeg import encode_jpeg

    px = _smooth(12, 16)
    payload = encode_jpeg(px, quality=100)
    df = spark.createDataFrame(
        [(1, "image", bytearray(payload), None)],
        "media_id long, kind string, payload binary, "
        "meta struct<width:int, height:int, n_frames:int, sample_rate:int>",
    )
    feat = np.array(extract_features(df).collect()[0].feature)
    # matches the direct decode+feature path (not the fake)
    want = image_feature(decode_image(payload))
    assert np.allclose(feat, want)
    assert abs(np.linalg.norm(feat) - 1) < 1e-9


def test_synthetic_media_jpeg_rows_unique_and_decodable(spark, sf_dir):
    from hawk_pack_spark.multimodal.ops import synthetic_media

    media = synthetic_media(spark, sf_dir)
    rows = media.where("kind = 'image'").limit(40).collect()
    jpeg = [r for r in rows if bytes(r.payload).startswith(b"\xff\xd8")]
    ppm = [r for r in rows if bytes(r.payload).startswith(b"P6")]
    assert jpeg and ppm  # both formats present
    # decoded JPEG pixels are unique per media id (the 0/255 bit field)
    decoded = {r.media_id: decode_image(bytes(r.payload)) for r in jpeg}
    sigs = {tuple(v.reshape(-1)[:72].tolist()) for v in decoded.values()}
    assert len(sigs) == len(decoded)
