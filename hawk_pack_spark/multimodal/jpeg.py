"""Baseline JPEG (ITU-T T.81 / JFIF) codec in pure numpy + stdlib —
no codec library.

Closes the multimodal family's last image-codec stub (VERDICT r11 #6):
``decode_image`` previously fell back to NotImplementedError for JPEG
payloads. Everything here derives from the PUBLIC spec: baseline DCT
(SOF0), canonical Huffman entropy coding (Annex C/F), the Annex K
example quantization/Huffman tables for the encoder, zigzag order,
0xFF00 byte stuffing, JFIF APP0, and 4:4:4 / 4:2:0 chroma sampling.

The ENCODER exists to produce honest fixtures (this container has no
PIL), with quality-scaled Annex K tables; the DECODER is general over
baseline streams: tables are read from DQT/DHT markers, sampling
factors from SOF0, restart intervals honored. Progressive (SOF2),
arithmetic coding, and 12-bit precision are out of scope and raise
clearly.

Scale shape: the codec is a per-payload kernel invoked inside
mapInPandas batches (multimodal/ops.py) — pure worker-side compute,
no driver involvement; Python-loop Huffman is the honest cost of a
no-dependency decode and is bounded by payload size, not corpus size.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# shared tables (ITU-T T.81 Annex K)

ZIGZAG = np.array([
    0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)

# Annex K.1 luminance / K.2 chrominance quantization tables (natural order)
_QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)
_QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

# Annex K.3 typical Huffman tables: (bits[1..16], huffval)
_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)

# orthonormal 8x8 DCT-II basis: block_dct = M @ block @ M.T
_M = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _M[_k, _n] = np.cos(np.pi * (2 * _n + 1) * _k / 16.0) * (
            np.sqrt(0.125) if _k == 0 else 0.5
        )


def _quality_scale(qt: np.ndarray, quality: int) -> np.ndarray:
    """IJG-style quality scaling of an Annex K table (public libjpeg
    convention): 50 = as published, 100 → all-ones (near-lossless)."""
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((qt * s + 50) // 100, 1, 255).astype(np.int32)


def _canonical_codes(bits, huffval):
    """Annex C: (symbol -> (code, length)) for canonical Huffman."""
    out, code = {}, 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[huffval[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


# ---------------------------------------------------------------------------
# encoder


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing (F.1.2.3)
                self.buf.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-pad final byte
        return bytes(self.buf)


def _magnitude(v: int) -> tuple[int, int]:
    """(SSSS category, appended bits) for a DC diff / AC coeff
    (F.1.2.1.1: negatives encode as value - 1 in SSSS bits)."""
    if v == 0:
        return 0, 0
    s = int(abs(v)).bit_length()
    return s, (v if v >= 0 else v + (1 << s) - 1)


def _encode_block(w, coeffs, dc_codes, ac_codes, pred):
    """One dequantized-domain 8x8 block in zigzag order → bitstream."""
    dc = int(coeffs[0])
    s, bitsv = _magnitude(dc - pred)
    c, ln = dc_codes[s]
    w.write(c, ln)
    if s:
        w.write(bitsv, s)
    run = 0
    last_nz = 0
    for i in range(63, 0, -1):
        if coeffs[i]:
            last_nz = i
            break
    for i in range(1, last_nz + 1):
        v = int(coeffs[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_codes[0xF0]  # ZRL
            w.write(c, ln)
            run -= 16
        s, bitsv = _magnitude(v)
        c, ln = ac_codes[(run << 4) | s]
        w.write(c, ln)
        w.write(bitsv, s)
        run = 0
    if last_nz != 63:
        c, ln = ac_codes[0x00]  # EOB
        w.write(c, ln)
    return dc


def encode_jpeg(
    pixels: np.ndarray,
    quality: int = 90,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Encode (h, w, 3) uint8 RGB or (h, w) gray as baseline JFIF.
    ``subsample=True`` uses 4:2:0 chroma; else 4:4:4.
    ``restart_interval`` > 0 emits a DRI segment and RSTn markers every
    N MCUs (DC predictors reset, scan byte-aligned — F.1.2.3)."""
    gray = pixels.ndim == 2
    if gray:
        pixels = np.repeat(pixels[:, :, None], 3, axis=2)
    h, w = pixels.shape[:2]
    p = pixels.astype(np.float64)
    y = 0.299 * p[:, :, 0] + 0.587 * p[:, :, 1] + 0.114 * p[:, :, 2]
    cb = -0.168736 * p[:, :, 0] - 0.331264 * p[:, :, 1] + 0.5 * p[:, :, 2] + 128
    cr = 0.5 * p[:, :, 0] - 0.418688 * p[:, :, 1] - 0.081312 * p[:, :, 2] + 128

    qly = _quality_scale(_QT_LUMA, quality)
    qlc = _quality_scale(_QT_CHROMA, quality)
    n_comp = 1 if gray else 3
    hv = (2, 2) if (subsample and not gray) else (1, 1)

    def blocks_of(plane, factor):
        """Pad to MCU multiple, optionally 2x2-average, yield quantized
        zigzag blocks row-major."""
        if factor == 2:
            ph = -(-plane.shape[0] // 2) * 2
            pw = -(-plane.shape[1] // 2) * 2
            pp = np.pad(plane, ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])), "edge")
            plane = 0.25 * (
                pp[0::2, 0::2] + pp[1::2, 0::2] + pp[0::2, 1::2] + pp[1::2, 1::2]
            )
        bh = -(-plane.shape[0] // 8) * 8
        bw = -(-plane.shape[1] // 8) * 8
        return np.pad(
            plane, ((0, bh - plane.shape[0]), (0, bw - plane.shape[1])), "edge"
        )

    def quant_blocks(plane, qt):
        bh, bw = plane.shape[0] // 8, plane.shape[1] // 8
        qmat = qt.reshape(8, 8).astype(np.float64)
        out = np.zeros((bh, bw, 64), dtype=np.int32)
        for by in range(bh):
            for bx in range(bw):
                blk = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
                d = np.round((_M @ blk @ _M.T) / qmat).astype(np.int32)
                out[by, bx] = d.reshape(64)[ZIGZAG]
        return out

    yb = quant_blocks(blocks_of(y, 1), qly)
    if n_comp == 3:
        cbb = quant_blocks(blocks_of(cb, hv[0]), qlc)
        crb = quant_blocks(blocks_of(cr, hv[0]), qlc)

    dc_l = _canonical_codes(*_DC_LUMA)
    ac_l = _canonical_codes(*_AC_LUMA)
    dc_c = _canonical_codes(*_DC_CHROMA)
    ac_c = _canonical_codes(*_AC_CHROMA)

    # flatten the scan into MCUs: each MCU is a list of
    # (zigzag_coeffs, dc_codes, ac_codes, component_index)
    mcus = []
    if n_comp == 1:
        for by in range(yb.shape[0]):
            for bx in range(yb.shape[1]):
                mcus.append([(yb[by, bx], dc_l, ac_l, 0)])
    elif hv == (1, 1):
        for by in range(yb.shape[0]):
            for bx in range(yb.shape[1]):
                mcus.append([
                    (yb[by, bx], dc_l, ac_l, 0),
                    (cbb[by, bx], dc_c, ac_c, 1),
                    (crb[by, bx], dc_c, ac_c, 2),
                ])
    else:  # 4:2:0 MCU: 4 luma blocks + 1 cb + 1 cr
        mh = -(-yb.shape[0] // 2)
        mw = -(-yb.shape[1] // 2)
        # pad luma block grid to even counts (encoder padded pixels to
        # 8-multiples; MCU needs 16-multiples)
        if yb.shape[0] < mh * 2 or yb.shape[1] < mw * 2:
            yb2 = np.zeros((mh * 2, mw * 2, 64), dtype=np.int32)
            yb2[: yb.shape[0], : yb.shape[1]] = yb
            if yb.shape[0] < mh * 2:
                yb2[yb.shape[0] :, : yb.shape[1]] = yb[-1:, :]
            if yb.shape[1] < mw * 2:
                yb2[:, yb.shape[1] :] = yb2[:, yb.shape[1] - 1 : yb.shape[1]]
            yb = yb2
        for my in range(mh):
            for mx in range(mw):
                blocks = [
                    (yb[my * 2 + dy, mx * 2 + dx], dc_l, ac_l, 0)
                    for dy in (0, 1)
                    for dx in (0, 1)
                ]
                blocks.append((cbb[my, mx], dc_c, ac_c, 1))
                blocks.append((crb[my, mx], dc_c, ac_c, 2))
                mcus.append(blocks)

    scan_parts = []
    bw_ = _BitWriter()
    pred = [0, 0, 0]
    for i, blocks in enumerate(mcus):
        if restart_interval and i and i % restart_interval == 0:
            scan_parts.append(bw_.flush())
            scan_parts.append(
                struct.pack(">H", 0xFFD0 + ((i // restart_interval - 1) % 8))
            )
            bw_ = _BitWriter()
            pred = [0, 0, 0]
        for coeffs, dcc, acc, ci in blocks:
            pred[ci] = _encode_block(bw_, coeffs, dcc, acc, pred[ci])
    scan_parts.append(bw_.flush())
    scan = b"".join(scan_parts)

    # ---- markers
    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    def dht(tclass: int, ident: int, table) -> bytes:
        bits, vals = table
        return bytes([tclass << 4 | ident]) + bytes(bits) + bytes(vals)

    out = [struct.pack(">H", 0xFFD8)]  # SOI
    out.append(seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"))
    out.append(seg(0xFFDB, bytes([0]) + bytes(qly.reshape(64)[ZIGZAG].tolist())))
    if n_comp == 3:
        out.append(seg(0xFFDB, bytes([1]) + bytes(qlc.reshape(64)[ZIGZAG].tolist())))
    comps = b""
    for ci in range(n_comp):
        hvb = 0x22 if (ci == 0 and n_comp == 3 and hv == (2, 2)) else 0x11
        comps += bytes([ci + 1, hvb, 0 if ci == 0 else 1])
    out.append(
        seg(0xFFC0, struct.pack(">BHHB", 8, h, w, n_comp) + comps)
    )
    out.append(seg(0xFFC4, dht(0, 0, _DC_LUMA)))
    out.append(seg(0xFFC4, dht(1, 0, _AC_LUMA)))
    if n_comp == 3:
        out.append(seg(0xFFC4, dht(0, 1, _DC_CHROMA)))
        out.append(seg(0xFFC4, dht(1, 1, _AC_CHROMA)))
    if restart_interval:
        out.append(seg(0xFFDD, struct.pack(">H", restart_interval)))
    sos = bytes([n_comp])
    for ci in range(n_comp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out.append(seg(0xFFDA, sos))
    out.append(scan)
    out.append(struct.pack(">H", 0xFFD9))  # EOI
    return b"".join(out)


# ---------------------------------------------------------------------------
# decoder


class _BitReader:
    """Entropy-segment bit reader with 0xFF00 unstuffing and RSTn
    awareness (F.2.2.5)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:  # restart marker mid-fill: caller
                raise _RestartMarker()  # resyncs via sync_restart()
            else:
                # EOI or another marker: pad with 1s (spec allows)
                self.acc = (self.acc << 8) | 0xFF
                self.nbits += 8
                return
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def sync_restart(self) -> None:
        """Skip to just past the next RSTn marker, reset bit state."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        i = self.pos
        while i + 1 < len(d):
            if d[i] == 0xFF and 0xD0 <= d[i + 1] <= 0xD7:
                self.pos = i + 2
                return
            i += 1
        raise ValueError("expected restart marker")


class _RestartMarker(Exception):
    pass


def _build_decode(bits, huffval):
    """F.2.2.3 canonical decode tables: per-length (mincode, maxcode,
    valptr)."""
    mincode = [0] * 17
    maxcode = [-1] * 17
    valptr = [0] * 17
    code = 0
    k = 0
    for ln in range(1, 17):
        if bits[ln - 1]:
            valptr[ln] = k
            mincode[ln] = code
            code += bits[ln - 1]
            k += bits[ln - 1]
            maxcode[ln] = code - 1
        code <<= 1
    return mincode, maxcode, valptr, list(huffval)


def _huff_decode(r: _BitReader, tbl) -> int:
    mincode, maxcode, valptr, vals = tbl
    code = r.read_bit()
    ln = 1
    while code > maxcode[ln]:
        code = (code << 1) | r.read_bit()
        ln += 1
        if ln > 16:
            raise ValueError("bad Huffman code")
    return vals[valptr[ln] + code - mincode[ln]]


def _extend(v: int, s: int) -> int:
    """F.2.2.1 EXTEND: map s received bits to the signed value."""
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline (SOF0) JFIF/JPEG stream → (h, w, 3) uint8 RGB
    (grayscale broadcast). Supports any Huffman/quant tables in the
    stream, 4:4:4 / 4:2:2 / 4:2:0 sampling, and restart intervals."""
    if not payload.startswith(b"\xff\xd8"):
        raise ValueError("not a JPEG")
    qts: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], tuple] = {}
    comps = None
    h = w = 0
    restart = 0
    pos = 2
    data = payload
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:
            break
        (ln,) = struct.unpack_from(">H", data, pos + 2)
        seg = data[pos + 4 : pos + 2 + ln]
        pos += 2 + ln
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                tbl = np.zeros(64, dtype=np.int32)
                tbl[ZIGZAG] = np.frombuffer(seg, np.uint8, 64, i + 1)
                qts[tq] = tbl.reshape(8, 8)
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0xF
                bits = list(seg[i + 1 : i + 17])
                n = sum(bits)
                vals = list(seg[i + 17 : i + 17 + n])
                huff[(tc, th)] = _build_decode(bits, vals)
                i += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (baseline)
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise NotImplementedError("only 8-bit precision")
            comps = []
            for ci in range(nc):
                cid, hv, tq = seg[6 + ci * 3 : 9 + ci * 3]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq}
                )
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError("only baseline (SOF0/SOF1) JPEG")
        elif marker == 0xDD:  # DRI
            (restart,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scomp = []
            for si in range(ns):
                cs, tables = seg[1 + si * 2 : 3 + si * 2]
                c = next(c for c in comps if c["id"] == cs)
                c["dc"] = huff[(0, tables >> 4)]
                c["ac"] = huff[(1, tables & 0xF)]
                scomp.append(c)
            return _decode_scan(data, pos, scomp, qts, h, w, restart)
    raise ValueError("no SOS marker found")


def _decode_scan(data, pos, comps, qts, h, w, restart) -> np.ndarray:
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = []
    for c in comps:
        planes.append(
            np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64)
        )
    r = _BitReader(data, pos)
    pred = [0] * len(comps)
    Mt = _M.T
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and n_mcu and n_mcu % restart == 0:
                r.sync_restart()
                pred = [0] * len(comps)
            try:
                for ci, c in enumerate(comps):
                    for dy in range(c["v"]):
                        for dx in range(c["h"]):
                            coeffs = np.zeros(64, dtype=np.float64)
                            s = _huff_decode(r, c["dc"])
                            diff = _extend(r.receive(s), s) if s else 0
                            pred[ci] += diff
                            coeffs[0] = pred[ci]
                            k = 1
                            while k < 64:
                                rs = _huff_decode(r, c["ac"])
                                rr, s = rs >> 4, rs & 0xF
                                if s == 0:
                                    if rr == 15:
                                        k += 16
                                        continue
                                    break  # EOB
                                k += rr
                                if k > 63:
                                    raise ValueError("AC index overflow")
                                coeffs[k] = _extend(r.receive(s), s)
                                k += 1
                            blk = np.zeros((8, 8))
                            blk.reshape(64)[ZIGZAG] = coeffs
                            blk *= qts[c["tq"]]
                            px = Mt @ blk @ _M + 128.0
                            y0 = (my * c["v"] + dy) * 8
                            x0 = (mx * c["h"] + dx) * 8
                            planes[ci][y0 : y0 + 8, x0 : x0 + 8] = px
            except _RestartMarker:
                # stray restart inside fill: resync and redo nothing —
                # encoder bugs only; honest failure
                raise ValueError("unexpected restart marker") from None
            n_mcu += 1
    # upsample chroma to full size, crop, color-convert
    full = []
    for c, pl in zip(comps, planes):
        if c["h"] != hmax or c["v"] != vmax:
            pl = np.repeat(
                np.repeat(pl, vmax // c["v"], axis=0), hmax // c["h"], axis=1
            )
        full.append(pl[:h, :w])
    if len(full) == 1:
        g = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r_ = y + 1.402 * cr
    g_ = y - 0.344136 * cb - 0.714136 * cr
    b_ = y + 1.772 * cb
    rgb = np.stack([r_, g_, b_], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
