"""Dependency-free baseline JPEG codec (ITU-T T.81 sequential DCT,
Huffman entropy coding) — closes the last deterministic-fake branch in
the multimodal family (VERDICT r10 item 4): BMP, WAV, PNG and now JPEG
decode real bytes on the executor.

Decoder scope (loud refusal outside it, never a mis-decode):
- baseline/extended sequential DCT (SOF0/SOF1), Huffman coding, 8-bit
  samples, 1 or 3 components, sampling factors 1-2 (4:4:4, 4:2:2,
  4:2:0, ...), restart markers (DRI/RSTn), 0xFF00 byte stuffing,
  multi-table DQT/DHT segments, 16-bit quantizer entries;
- 4-component CMYK / YCCK streams (Adobe APP14 transform 0 / 2, the
  print-pipeline exports web corpora actually contain), including the
  Adobe inverted-sample convention — decoded to the same RGB
  libjpeg-derived viewers show;
- PROGRESSIVE DCT (SOF2, T.81 Annex G): multi-scan spectral selection
  AND successive approximation — DC first/refinement scans
  (interleaved or single-component), AC first/refinement scans with
  EOB-run coding (EOBn), ZRL, per-scan DHT redefinition, and restart
  markers inside progressive scans;
- arithmetic coding, 12-bit, and hierarchical modes raise
  ``NotImplementedError``.

All tables are parsed from the STREAM (DQT/DHT), so the decoder is not
tied to this module's encoder — any baseline JPEG from the wild with
the features above decodes. The encoder exists mainly to fabricate
real test bytes in a container without codec libraries; it writes
JFIF with the ITU Annex K example quantization + Huffman tables and
optional 2x2 chroma subsampling and restart intervals.

Exactness note the gate row builds on: JPEG is lossy in general, but a
GRAYSCALE image (R=G=B) that is CONSTANT within each 8x8 block round-
trips bit-exactly through this codec: Y==v and Cb==Cr==128 exactly
(the JFIF transform has zero chroma for gray), each block's DCT has a
lone integer DC coefficient 8*(v-128), the Annex-K-table quantizer is
bypassed by the encoder's quality=lossless option (all-ones tables),
and the IDCT of a lone DC is constant — so an arithmetic oracle over
decoded pixel sums is exact, same discipline as the BMP/PNG/WAV gates.

Reference parity note: the reference engine has no multimodal surface
at all (tile_processor/ is vector/raster tiles); this family is part
of the training-data-pipeline mandate, not reference parity.
"""

from __future__ import annotations

import struct

import numpy as np

# ---- shared constants -------------------------------------------------

#: zigzag scan order, generated (not transcribed) to avoid table bugs:
#: anti-diagonals s = row+col, row ascending on odd s, descending on even
_ZIGZAG: list[tuple[int, int]] = []
for _s in range(15):
    _rows = range(max(0, _s - 7), min(_s, 7) + 1)
    for _r in (_rows if _s % 2 == 1 else reversed(list(_rows))):
        _ZIGZAG.append((_r, _s - _r))

#: vectorized de-zigzag index arrays: natural[r, c] = zigzag[i]
_ZZ_ROWS = np.array([r for r, _c in _ZIGZAG])
_ZZ_COLS = np.array([c for _r, c in _ZIGZAG])

#: orthonormal 8-point DCT-II matrix; forward F = C f C^T, inverse
#: f = C^T F C — exactly T.81's normalization
_C = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _C[_u, _x] = np.cos((2 * _x + 1) * _u * np.pi / 16) * (
            np.sqrt(1 / 8) if _u == 0 else np.sqrt(2 / 8)
        )

# ITU T.81 Annex K.1 example quantization tables (the de-facto default)
_LUM_Q = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int32,
)
_CHROM_Q = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int32,
)

# ITU T.81 Annex K.3 example Huffman tables (bits[1..16], then values).
# Only the ENCODER depends on these being the standard ones; the
# decoder always builds its tables from the stream's DHT segments.
_DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUM_VALS = list(range(12))
_DC_CHR_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHR_VALS = list(range(12))
_AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
_AC_CHR_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHR_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) under JPEG's canonical assignment."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            k += 1
            code += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) → symbol — the inverse view, for the decoder."""
    out: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[k]
            k += 1
            code += 1
        code <<= 1
    return out


# ---- encoder ----------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
        self.acc &= (1 << self.nbits) - 1

    def pad_to_byte(self) -> None:
        if self.nbits:
            self.write(0x7F, 8 - self.nbits)  # pad with 1-bits (spec F.1.2.3)


def _magnitude(v: int) -> tuple[int, int]:
    """(category, value-bits) encoding of a DC diff / AC coefficient."""
    if v == 0:
        return 0, 0
    a = abs(v)
    t = a.bit_length()
    bits = v if v > 0 else v + (1 << t) - 1
    return t, bits


def _encode_block(
    w: _BitWriter, block: np.ndarray, q: np.ndarray, pred: int,
    dc_codes: dict, ac_codes: dict,
) -> int:
    coef = np.round((_C @ (block.astype(np.float64) - 128.0) @ _C.T) / q).astype(
        np.int64
    )
    zz = [int(coef[r, c]) for r, c in _ZIGZAG]
    t, bits = _magnitude(zz[0] - pred)
    code, ln = dc_codes[t]
    w.write(code, ln)
    if t:
        w.write(bits, t)
    run = 0
    last_nz = max((i for i in range(1, 64) if zz[i]), default=0)
    for i in range(1, last_nz + 1):
        if zz[i] == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            w.write(code, ln)
            run -= 16
        t, bits = _magnitude(zz[i])
        code, ln = ac_codes[(run << 4) | t]
        w.write(code, ln)
        w.write(bits, t)
        run = 0
    if last_nz < 63:
        code, ln = ac_codes[0x00]  # EOB
        w.write(code, ln)
    return zz[0]


def _dht_segment(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
    body = bytes([tc << 4 | th]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body


def _dqt_segment(tq: int, table: np.ndarray) -> bytes:
    zz = bytes(int(table[r, c]) for r, c in _ZIGZAG)
    return b"\xff\xdb" + struct.pack(">H", 2 + 1 + 64) + bytes([tq]) + zz


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    r = px[..., 0].astype(np.float64)
    g = px[..., 1].astype(np.float64)
    b = px[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    return np.clip(np.round(np.stack([y, cb, cr], axis=-1)), 0, 255)


def encode_jpeg(
    pixels: np.ndarray,
    subsampling: str = "444",
    lossless_tables: bool = False,
    restart_interval: int = 0,
    grayscale: bool = False,
) -> bytes:
    """Encode an H×W×3 uint8 RGB array as a baseline JFIF JPEG.

    ``subsampling``: '444' (no chroma subsampling) or '420' (2x2 box
    average, dims must be multiples of 16). ``lossless_tables`` writes
    all-ones quantization tables — the only loss left is
    DCT-coefficient rounding, which is ZERO for images constant within
    each 8x8 block (the exactness lever the gate oracle uses).
    ``restart_interval`` > 0 emits DRI + RSTn markers every that many
    MCUs (exercises the decoder's restart path). ``grayscale`` writes a
    single-component (luma-only) stream from the RGB's Y plane."""
    if pixels.ndim != 3 or pixels.shape[2] != 3 or pixels.dtype != np.uint8:
        raise ValueError(f"expected H×W×3 uint8 RGB, got {pixels.shape} {pixels.dtype}")
    if subsampling not in ("444", "420"):
        raise ValueError(f"subsampling must be '444' or '420', got {subsampling!r}")
    h, w = pixels.shape[:2]
    samp = (1, 1) if grayscale else ((2, 2) if subsampling == "420" else (1, 1))
    mcu_h, mcu_w = 8 * samp[0], 8 * samp[1]
    if h % mcu_h or w % mcu_w:
        raise ValueError(
            f"image dims ({h}x{w}) must be multiples of the MCU size "
            f"({mcu_h}x{mcu_w} for {subsampling})"
        )
    ycc = _rgb_to_ycbcr(pixels)
    y_plane = ycc[..., 0]
    if not grayscale and subsampling == "420":
        cb = ycc[..., 1].reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
        cr = ycc[..., 2].reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
        cb, cr = np.round(cb), np.round(cr)
    else:
        cb, cr = ycc[..., 1], ycc[..., 2]
    lum_q = np.ones((8, 8), np.int32) if lossless_tables else _LUM_Q
    chr_q = np.ones((8, 8), np.int32) if lossless_tables else _CHROM_Q

    out = bytearray(b"\xff\xd8")  # SOI
    out += (
        b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + bytes([1, 1, 0])
        + struct.pack(">HH", 1, 1) + bytes([0, 0])
    )
    out += _dqt_segment(0, lum_q)
    if not grayscale:
        out += _dqt_segment(1, chr_q)
    ncomp = 1 if grayscale else 3
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    sof += bytes([1, samp[0] << 4 | samp[1], 0])  # Y
    if not grayscale:
        sof += bytes([2, 0x11, 1]) + bytes([3, 0x11, 1])  # Cb, Cr
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    out += _dht_segment(0, 0, _DC_LUM_BITS, _DC_LUM_VALS)
    out += _dht_segment(1, 0, _AC_LUM_BITS, _AC_LUM_VALS)
    if not grayscale:
        out += _dht_segment(0, 1, _DC_CHR_BITS, _DC_CHR_VALS)
        out += _dht_segment(1, 1, _AC_CHR_BITS, _AC_CHR_VALS)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    if grayscale:
        sos = bytes([1, 1, 0x00, 0, 63, 0])
    else:
        sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    dc_l = _canonical_codes(_DC_LUM_BITS, _DC_LUM_VALS)
    ac_l = _canonical_codes(_AC_LUM_BITS, _AC_LUM_VALS)
    dc_c = _canonical_codes(_DC_CHR_BITS, _DC_CHR_VALS)
    ac_c = _canonical_codes(_AC_CHR_BITS, _AC_CHR_VALS)
    writer = _BitWriter()
    preds = [0, 0, 0]
    mcus_y, mcus_x = h // mcu_h, w // mcu_w
    mcu_count = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                writer.pad_to_byte()
                writer.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                preds = [0, 0, 0]
            for v in range(samp[0]):
                for u in range(samp[1]):
                    by, bx = my * samp[0] + v, mx * samp[1] + u
                    blk = y_plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                    preds[0] = _encode_block(writer, blk, lum_q, preds[0], dc_l, ac_l)
            if not grayscale:
                for ci, plane in ((1, cb), (2, cr)):
                    blk = plane[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8]
                    preds[ci] = _encode_block(
                        writer, blk, chr_q, preds[ci], dc_c, ac_c
                    )
            mcu_count += 1
    writer.pad_to_byte()
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def encode_jpeg_cmyk(
    inks: np.ndarray,
    transform: int = 0,
    lossless_tables: bool = False,
    adobe_marker: bool = True,
) -> bytes:
    """Encode an H×W×4 uint8 CMYK ink array as a 4-component baseline
    JPEG (1x1 sampling, dims multiples of 8) — the fixture factory for
    the decoder's 4-component path, mirroring how Adobe tooling writes
    print-pipeline JPEGs:

    - ``transform=0``: the four ink planes stored directly;
    - ``transform=2`` (YCCK): the inverted C/M/Y planes pass through
      the JFIF RGB→YCbCr transform, K stored as the fourth plane;
    - ``adobe_marker``: write APP14 with the transform byte AND store
      samples INVERTED (s = 255 - ink), the Adobe convention; with the
      marker suppressed (transform 0 only) samples are plain inks —
      the convention a markerless 4-component stream decodes under.
    """
    if inks.ndim != 3 or inks.shape[2] != 4 or inks.dtype != np.uint8:
        raise ValueError(
            f"expected H×W×4 uint8 CMYK, got {inks.shape} {inks.dtype}"
        )
    if transform not in (0, 2):
        raise ValueError(f"transform must be 0 (CMYK) or 2 (YCCK), got {transform}")
    if not adobe_marker and transform != 0:
        raise ValueError("YCCK requires the Adobe marker (transform byte)")
    h, w = inks.shape[:2]
    if h % 8 or w % 8:
        raise ValueError(f"image dims ({h}x{w}) must be multiples of 8")
    f = inks.astype(np.float64)
    if adobe_marker:
        f = 255.0 - f  # Adobe inverted-sample convention
    if transform == 2:
        ycc = _rgb_to_ycbcr(np.clip(f[..., :3], 0, 255).astype(np.uint8))
        planes = [ycc[..., 0], ycc[..., 1], ycc[..., 2], f[..., 3]]
        # Y and K quantize as luma; Cb/Cr as chroma (table 1)
        tqs, hts = [0, 1, 1, 0], [0, 1, 1, 0]
    else:
        planes = [f[..., 0], f[..., 1], f[..., 2], f[..., 3]]
        tqs, hts = [0, 0, 0, 0], [0, 0, 0, 0]
    lum_q = np.ones((8, 8), np.int32) if lossless_tables else _LUM_Q
    chr_q = np.ones((8, 8), np.int32) if lossless_tables else _CHROM_Q
    qts = {0: lum_q, 1: chr_q}

    out = bytearray(b"\xff\xd8")  # SOI (Adobe CMYK streams are not JFIF)
    if adobe_marker:
        app14 = b"Adobe" + struct.pack(">HHH", 100, 0, 0) + bytes([transform])
        out += b"\xff\xee" + struct.pack(">H", 2 + len(app14)) + app14
    out += _dqt_segment(0, lum_q)
    if 1 in tqs:
        out += _dqt_segment(1, chr_q)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([4])
    for cid in range(4):
        sof += bytes([cid + 1, 0x11, tqs[cid]])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    out += _dht_segment(0, 0, _DC_LUM_BITS, _DC_LUM_VALS)
    out += _dht_segment(1, 0, _AC_LUM_BITS, _AC_LUM_VALS)
    if 1 in hts:
        out += _dht_segment(0, 1, _DC_CHR_BITS, _DC_CHR_VALS)
        out += _dht_segment(1, 1, _AC_CHR_BITS, _AC_CHR_VALS)
    sos = bytes([4])
    for cid in range(4):
        sos += bytes([cid + 1, hts[cid] << 4 | hts[cid]])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    dc = {
        0: _canonical_codes(_DC_LUM_BITS, _DC_LUM_VALS),
        1: _canonical_codes(_DC_CHR_BITS, _DC_CHR_VALS),
    }
    ac = {
        0: _canonical_codes(_AC_LUM_BITS, _AC_LUM_VALS),
        1: _canonical_codes(_AC_CHR_BITS, _AC_CHR_VALS),
    }
    writer = _BitWriter()
    preds = [0, 0, 0, 0]
    for my in range(h // 8):
        for mx in range(w // 8):
            for ci in range(4):
                blk = planes[ci][my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8]
                preds[ci] = _encode_block(
                    writer, blk, qts[tqs[ci]], preds[ci],
                    dc[hts[ci]], ac[hts[ci]],
                )
    writer.pad_to_byte()
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---- progressive encoder ----------------------------------------------


def _quantize_plane(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Forward-DCT + quantize an (H, W) sample plane (dims multiples of
    8) into zigzag-ordered coefficient blocks ``(by, bx, 64)``."""
    h, w = plane.shape
    by, bx = h // 8, w // 8
    blocks = (
        plane.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3)
        .reshape(by * bx, 8, 8).astype(np.float64) - 128.0
    )
    # batched (C @ B) @ C.T — the SAME operation order as the baseline
    # encoder's _encode_block, so both streams carry bit-identical
    # quantized coefficients (an einsum contraction rounds differently
    # at exact .5 boundaries and broke the baseline/progressive
    # decode-identity by one quantizer step on unlucky blocks)
    coefs = (_C @ blocks) @ _C.T
    zz = np.round(
        coefs[:, _ZZ_ROWS, _ZZ_COLS] / q[_ZZ_ROWS, _ZZ_COLS]
    ).astype(np.int64)
    return zz.reshape(by, bx, 64)


class _ScanEmitter:
    """Two-pass scan emission: pass 1 (no writer) collects the Huffman
    symbol alphabet; pass 2 writes codes + raw bits."""

    def __init__(self, codes: dict | None = None, writer=None):
        self.codes = codes
        self.writer = writer
        self.symbols: set[int] = set()

    def symbol(self, sym: int) -> None:
        self.symbols.add(sym)
        if self.writer is not None:
            code, ln = self.codes[sym]
            self.writer.write(code, ln)

    def bits(self, val: int, n: int) -> None:
        if n and self.writer is not None:
            self.writer.write(val, n)


def _flat_table(symbols: set[int]) -> tuple[list[int], list[int]]:
    """A legal canonical Huffman table giving every symbol the same
    code length (the all-ones code stays unused, as T.81 C.2 requires).
    Wasteful vs frequency-optimal, but this encoder exists to fabricate
    REAL progressive streams for the decoder, not to compress."""
    syms = sorted(symbols)
    n = len(syms)
    ln = 1
    while (1 << ln) < n + 1:
        ln += 1
    bits = [0] * 16
    bits[ln - 1] = n
    return bits, syms


def _shift_toward_zero(v: int, al: int) -> int:
    """The AC point transform (T.81 A.4): signed division by 2^Al
    truncating toward zero (DC uses a plain arithmetic shift)."""
    return (abs(v) >> al) * (1 if v >= 0 else -1)


def _emit_progressive_scan(
    em: _ScanEmitter, units: list, ss: int, se: int, ah: int, al: int,
    restart_interval: int,
) -> None:
    """Emit one scan's entropy data (G.1.2): units mirror the decoder's
    iteration — MCUs of (zigzag block, comp index) when interleaved,
    single blocks otherwise."""
    preds: dict[int, int] = {}
    st = {"eobrun": 0, "pending": []}

    def flush_eob() -> None:
        n = st["eobrun"]
        if not n:
            return
        t = n.bit_length() - 1
        em.symbol(t << 4)
        em.bits(n - (1 << t), t)
        for b in st["pending"]:
            em.bits(b, 1)
        st["eobrun"] = 0
        st["pending"] = []

    def dc_first(zz: np.ndarray, ci: int) -> None:
        v = int(zz[0]) >> al  # DC point transform: arithmetic shift
        diff = v - preds.get(ci, 0)
        preds[ci] = v
        t, bits = _magnitude(diff)
        em.symbol(t)
        em.bits(bits, t)

    def dc_refine(zz: np.ndarray) -> None:
        em.bits((int(zz[0]) >> al) & 1, 1)

    def ac_first(zz: np.ndarray) -> None:
        r = 0
        for k in range(ss, se + 1):
            v = _shift_toward_zero(int(zz[k]), al)
            if v == 0:
                r += 1
                continue
            flush_eob()
            while r > 15:
                em.symbol(0xF0)
                r -= 16
            s, bits = _magnitude(v)
            em.symbol((r << 4) | s)
            em.bits(bits, s)
            r = 0
        if r > 0:
            st["eobrun"] += 1
            if st["eobrun"] == 0x7FFF:
                flush_eob()

    def ac_refine(zz: np.ndarray) -> None:
        absv = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
        eob_idx = -1
        for j, t in enumerate(absv):
            if t == 1:  # t == 1 ⇔ newly nonzero at this precision
                eob_idx = j
        r = 0
        br: list[int] = []
        for j, t in enumerate(absv):
            if t == 0:
                r += 1
                continue
            # eager ZRLs (only when a future NEW coefficient exists —
            # trailing zeros/corrections fold into the EOB run)
            while r > 15 and j <= eob_idx:
                flush_eob()
                em.symbol(0xF0)
                r -= 16
                for b in br:
                    em.bits(b, 1)
                br = []
            if t > 1:  # history coefficient: buffered correction bit
                br.append(t & 1)
                continue
            flush_eob()
            em.symbol((r << 4) | 1)
            em.bits(1 if int(zz[ss + j]) > 0 else 0, 1)
            for b in br:
                em.bits(b, 1)
            br = []
            r = 0
        if r > 0 or br:
            st["eobrun"] += 1
            st["pending"].extend(br)
            if st["eobrun"] == 0x7FFF:
                flush_eob()

    rst = 0
    for i, mcu in enumerate(units):
        if restart_interval and i and i % restart_interval == 0:
            flush_eob()
            if em.writer is not None:
                em.writer.pad_to_byte()
                em.writer.out += bytes([0xFF, 0xD0 + rst % 8])
            rst += 1
            preds.clear()
        for zz, ci in mcu:
            if ss == 0:
                dc_first(zz, ci) if ah == 0 else dc_refine(zz)
            else:
                ac_first(zz) if ah == 0 else ac_refine(zz)
    flush_eob()


#: the default progressive scan script (luma component index 0):
#: interleaved DC first + spectral-split AC firsts with successive
#: approximation, then DC refinement and the AC refinement chain —
#: chosen to exercise EVERY decoder path (EOBn, ZRL, corrections).
def _default_scan_script(ncomp: int) -> list[dict]:
    if ncomp == 1:
        return [
            {"comps": [0], "ss": 0, "se": 0, "ah": 0, "al": 1},
            {"comps": [0], "ss": 1, "se": 5, "ah": 0, "al": 2},
            {"comps": [0], "ss": 6, "se": 63, "ah": 0, "al": 2},
            {"comps": [0], "ss": 0, "se": 0, "ah": 1, "al": 0},
            {"comps": [0], "ss": 1, "se": 63, "ah": 2, "al": 1},
            {"comps": [0], "ss": 1, "se": 63, "ah": 1, "al": 0},
        ]
    return [
        {"comps": [0, 1, 2], "ss": 0, "se": 0, "ah": 0, "al": 1},
        {"comps": [0], "ss": 1, "se": 5, "ah": 0, "al": 2},
        {"comps": [1], "ss": 1, "se": 63, "ah": 0, "al": 1},
        {"comps": [2], "ss": 1, "se": 63, "ah": 0, "al": 1},
        {"comps": [0], "ss": 6, "se": 63, "ah": 0, "al": 2},
        {"comps": [0, 1, 2], "ss": 0, "se": 0, "ah": 1, "al": 0},
        {"comps": [0], "ss": 1, "se": 63, "ah": 2, "al": 1},
        {"comps": [0], "ss": 1, "se": 63, "ah": 1, "al": 0},
        {"comps": [1], "ss": 1, "se": 63, "ah": 1, "al": 0},
        {"comps": [2], "ss": 1, "se": 63, "ah": 1, "al": 0},
    ]


def encode_jpeg_progressive(
    pixels: np.ndarray,
    subsampling: str = "444",
    lossless_tables: bool = False,
    restart_interval: int = 0,
    grayscale: bool = False,
    scans: list[dict] | None = None,
) -> bytes:
    """Encode an H×W×3 uint8 RGB array as a PROGRESSIVE (SOF2) JFIF
    JPEG. Same plane preparation, point-transform discipline, and
    constraints as :func:`encode_jpeg`; the entropy data is organized
    as a multi-scan spectral-selection + successive-approximation
    script (``scans``: list of ``{"comps", "ss", "se", "ah", "al"}``,
    default :func:`_default_scan_script`). Because entropy coding is
    lossless, decoding this stream yields BIT-IDENTICAL pixels to
    decoding :func:`encode_jpeg` of the same input/options — the
    round-trip identity the tests pin. Huffman tables are per-scan
    fixed-length canonical tables (emitted as DHT before each SOS, so
    the decoder's between-scan table redefinition is exercised)."""
    if pixels.ndim != 3 or pixels.shape[2] != 3 or pixels.dtype != np.uint8:
        raise ValueError(
            f"expected H×W×3 uint8 RGB, got {pixels.shape} {pixels.dtype}"
        )
    if subsampling not in ("444", "420"):
        raise ValueError(f"subsampling must be '444' or '420', got {subsampling!r}")
    h, w = pixels.shape[:2]
    samp = (1, 1) if grayscale else ((2, 2) if subsampling == "420" else (1, 1))
    mcu_h, mcu_w = 8 * samp[0], 8 * samp[1]
    if h % mcu_h or w % mcu_w:
        raise ValueError(
            f"image dims ({h}x{w}) must be multiples of the MCU size "
            f"({mcu_h}x{mcu_w} for {subsampling})"
        )
    ycc = _rgb_to_ycbcr(pixels)
    y_plane = ycc[..., 0]
    if not grayscale and subsampling == "420":
        cb = ycc[..., 1].reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
        cr = ycc[..., 2].reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
        cb, cr = np.round(cb), np.round(cr)
    else:
        cb, cr = ycc[..., 1], ycc[..., 2]
    lum_q = np.ones((8, 8), np.int32) if lossless_tables else _LUM_Q
    chr_q = np.ones((8, 8), np.int32) if lossless_tables else _CHROM_Q
    # per component: (v, h) sampling, zigzag coefficient blocks
    comps = [(samp[0], samp[1], _quantize_plane(y_plane, lum_q))]
    if not grayscale:
        comps.append((1, 1, _quantize_plane(cb, chr_q)))
        comps.append((1, 1, _quantize_plane(cr, chr_q)))
    ncomp = len(comps)
    scans = scans if scans is not None else _default_scan_script(ncomp)

    out = bytearray(b"\xff\xd8")
    out += (
        b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + bytes([1, 1, 0])
        + struct.pack(">HH", 1, 1) + bytes([0, 0])
    )
    out += _dqt_segment(0, lum_q)
    if not grayscale:
        out += _dqt_segment(1, chr_q)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    sof += bytes([1, samp[0] << 4 | samp[1], 0])
    if not grayscale:
        sof += bytes([2, 0x11, 1]) + bytes([3, 0x11, 1])
    out += b"\xff\xc2" + struct.pack(">H", 2 + len(sof)) + sof
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    mcus_y, mcus_x = h // mcu_h, w // mcu_w
    for sc in scans:
        ss, se, ah, al = sc["ss"], sc["se"], sc["ah"], sc["al"]
        idxs = sc["comps"]
        # unit list mirroring the decoder's iteration order
        if len(idxs) > 1:
            if ss != 0:
                raise ValueError("interleaved progressive scan must be DC-only")
            units = []
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    mcu = []
                    for ci in idxs:
                        cv, ch_, zz = comps[ci]
                        for v in range(cv):
                            for u in range(ch_):
                                mcu.append(
                                    (zz[my * cv + v, mx * ch_ + u], ci)
                                )
                    units.append(mcu)
        else:
            ci = idxs[0]
            _cv, _ch, zz = comps[ci]
            by, bx = zz.shape[:2]
            units = [
                [(zz[r, c], ci)] for r in range(by) for c in range(bx)
            ]
        # pass 1: alphabet; pass 2: bytes
        counter = _ScanEmitter()
        _emit_progressive_scan(counter, units, ss, se, ah, al, restart_interval)
        kind = 0 if ss == 0 else 1
        needs_table = not (ss == 0 and ah > 0)  # DC refinement is raw bits
        if needs_table and counter.symbols:
            bits, vals = _flat_table(counter.symbols)
            out += _dht_segment(kind, 0, bits, vals)
            codes = _canonical_codes(bits, vals)
        else:
            codes = {}
        sos = bytes([len(idxs)])
        for ci in idxs:
            sos += bytes([ci + 1, 0x00])  # component id ci+1, tables 0/0
        sos += bytes([ss, se, (ah << 4) | al])
        out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
        writer = _BitWriter()
        _emit_progressive_scan(
            _ScanEmitter(codes, writer), units, ss, se, ah, al,
            restart_interval,
        )
        writer.pad_to_byte()
        out += writer.out
    out += b"\xff\xd9"
    return bytes(out)


# ---- decoder ----------------------------------------------------------


class _BitReader:
    """Entropy-coded-segment bit reader: un-stuffs 0xFF00, stops at any
    other marker (exposes it for the MCU loop's restart handling)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            # consecutive 0xFFs are legal fill bytes before a marker
            # (T.81 B.1.1.2) — skip to the marker byte itself
            while self.data[self.pos + 1] == 0xFF:
                self.pos += 1
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt)
            else:
                raise ValueError(
                    f"unexpected marker 0xFF{nxt:02X} inside entropy data"
                )
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

    def restart(self) -> None:
        """Consume an expected RSTn: drop pad bits, skip fill bytes,
        eat the marker."""
        self.acc = 0
        self.nbits = 0
        while self.data[self.pos] != 0xFF or self.data[self.pos + 1] in (
            0x00,
            0xFF,  # fill byte before the marker (T.81 B.1.1.2)
        ):
            self.pos += 1  # skip pad bits' bytes (already consumed logically)
        nxt = self.data[self.pos + 1]
        if not (0xD0 <= nxt <= 0xD7):
            raise ValueError(f"expected RSTn, found 0xFF{nxt:02X}")
        self.pos += 2


class _RestartMarker(Exception):
    def __init__(self, code: int):
        self.code = code


def _extend(v: int, t: int) -> int:
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _decode_huff(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in entropy data")


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline JPEG to an H×W×3 uint8 RGB array (grayscale
    inputs replicate to 3 channels). See the module doc for scope.
    Truncated payloads raise ``ValueError``, never return partial
    pixels."""
    try:
        return _decode_jpeg(payload)
    except (IndexError, struct.error):
        raise ValueError("truncated or corrupt JPEG payload") from None
    except _RestartMarker:
        # an RSTn where entropy data was expected: restart-interval
        # mismatch or corruption — surface the documented error type,
        # never the reader's internal control-flow exception
        raise ValueError(
            "unexpected restart marker in entropy data (corrupt stream "
            "or DRI mismatch)"
        ) from None


def _decode_jpeg(payload: bytes) -> np.ndarray:
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> decode table
    frame = None
    progressive = False
    planes: dict[int, np.ndarray] | None = None  # comp id -> (by,bx,64) zigzag
    restart_interval = 0
    adobe_transform: int | None = None  # APP14 color-transform byte
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}")
        marker = payload[pos + 1]
        if marker == 0xFF:  # legal fill byte before a marker (B.1.1.2)
            pos += 1
            continue
        if marker == 0xD9:  # EOI
            break
        (seg_len,) = struct.unpack_from(">H", payload, pos + 2)
        body = payload[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDB:  # DQT (may hold several tables)
            p = 0
            while p < len(body):
                prec, tq = body[p] >> 4, body[p] & 0xF
                p += 1
                n = 64 * (2 if prec else 1)
                vals = (
                    np.frombuffer(body, ">u2", 64, p)
                    if prec
                    else np.frombuffer(body, np.uint8, 64, p)
                ).astype(np.int32)
                tbl = np.zeros((8, 8), np.int32)
                for i, (r, c) in enumerate(_ZIGZAG):
                    tbl[r, c] = vals[i]
                qt[tq] = tbl
                p += n
        elif marker == 0xC4:  # DHT (may hold several tables)
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 0xF
                bits = list(body[p + 1 : p + 17])
                nsym = sum(bits)
                vals = list(body[p + 17 : p + 17 + nsym])
                huff[(tc, th)] = _decode_table(bits, vals)
                p += 17 + nsym
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/SOF1/SOF2
            prec = body[0]
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG not supported")
            fh, fw = struct.unpack_from(">HH", body, 1)
            ncomp = body[5]
            comps = []
            for i in range(ncomp):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {"h": fh, "w": fw, "comps": comps}
            progressive = marker == 0xC2
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG mode SOF{marker - 0xC0} not supported (baseline only)"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xEE and body[:5] == b"Adobe":  # APP14
            adobe_transform = body[11]
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan = []
            for i in range(ns):
                cs, tables = body[1 + 2 * i], body[2 + 2 * i]
                comp = next(c for c in frame["comps"] if c["id"] == cs)
                scan.append((comp, tables >> 4, tables & 0xF))
            if not progressive:
                return _decode_scan(
                    payload, pos + 2 + seg_len, frame, scan, qt, huff,
                    restart_interval, adobe_transform,
                )
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ah, al = body[3 + 2 * ns] >> 4, body[3 + 2 * ns] & 0xF
            hmax = max(c["h"] for c in frame["comps"])
            vmax = max(c["v"] for c in frame["comps"])
            if planes is None:
                if hmax > 2 or vmax > 2:
                    raise NotImplementedError(
                        f"sampling factors up to 2 supported, got {hmax}x{vmax}"
                    )
                mcus_x = -(-frame["w"] // (8 * hmax))
                mcus_y = -(-frame["h"] // (8 * vmax))
                planes = {
                    c["id"]: np.zeros(
                        (mcus_y * c["v"], mcus_x * c["h"], 64), np.int64
                    )
                    for c in frame["comps"]
                }
            pos = _decode_progressive_scan(
                payload, pos + 2 + seg_len, frame, scan, huff,
                restart_interval, planes, hmax, vmax, ss, se, ah, al,
            )
            continue
        # APPn / COM / anything else: skip
        pos += 2 + seg_len
    if progressive and planes is not None:
        # de-zigzag each component's accumulated coefficients, then the
        # same dequantize/IDCT/upsample/color path as baseline
        hmax = max(c["h"] for c in frame["comps"])
        vmax = max(c["v"] for c in frame["comps"])
        pairs = []
        for c in frame["comps"]:
            z = planes[c["id"]]
            nat = np.zeros(z.shape[:2] + (8, 8), np.int64)
            nat[:, :, _ZZ_ROWS, _ZZ_COLS] = z
            pairs.append((c, nat))
        return _reconstruct(
            pairs, qt, frame["h"], frame["w"], hmax, vmax, adobe_transform
        )
    raise ValueError("no SOS scan found in JPEG payload")


def _decode_scan(
    data: bytes, pos: int, frame: dict, scan: list, qt: dict, huff: dict,
    restart_interval: int, adobe_transform: int | None = None,
) -> np.ndarray:
    h, w = frame["h"], frame["w"]
    comps = [c for c, _, _ in scan]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax > 2 or vmax > 2:
        raise NotImplementedError(f"sampling factors up to 2 supported, got {hmax}x{vmax}")
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    # per-component coefficient store: (n_blocks_y, n_blocks_x, 8, 8)
    planes = []
    for c in comps:
        planes.append(
            np.zeros((mcus_y * c["v"], mcus_x * c["h"], 8, 8), np.int64)
        )
    reader = _BitReader(data, pos)
    preds = [0] * len(comps)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.restart()
                preds = [0] * len(comps)
            for ci, (c, td, ta) in enumerate(scan):
                dc_tbl, ac_tbl = huff.get((0, td)), huff.get((1, ta))
                if dc_tbl is None or ac_tbl is None:
                    raise ValueError("scan references missing Huffman table")
                for v in range(c["v"]):
                    for u in range(c["h"]):
                        blk = np.zeros(64, np.int64)
                        t = _decode_huff(reader, dc_tbl)
                        diff = _extend(reader.receive(t), t) if t else 0
                        preds[ci] += diff
                        blk[0] = preds[ci]
                        k = 1
                        while k < 64:
                            sym = _decode_huff(reader, ac_tbl)
                            if sym == 0x00:  # EOB
                                break
                            run, size = sym >> 4, sym & 0xF
                            if size == 0:
                                if run != 15:
                                    raise ValueError("bad AC symbol")
                                k += 16  # ZRL
                                continue
                            k += run
                            if k > 63:
                                raise ValueError("AC run overflows block")
                            blk[k] = _extend(reader.receive(size), size)
                            k += 1
                        out = np.zeros((8, 8), np.int64)
                        for i, (r, cc) in enumerate(_ZIGZAG):
                            out[r, cc] = blk[i]
                        planes[ci][my * c["v"] + v, mx * c["h"] + u] = out
            mcu_count += 1
    return _reconstruct(
        [(c, planes[ci]) for ci, (c, _td, _ta) in enumerate(scan)],
        qt, h, w, hmax, vmax, adobe_transform,
    )


def _reconstruct(
    pairs: list, qt: dict, h: int, w: int, hmax: int, vmax: int,
    adobe_transform: int | None = None,
) -> np.ndarray:
    """Dequantize + batched IDCT per component (natural-order
    ``(by, bx, 8, 8)`` coefficient arrays), upsample, crop, and color-
    transform — shared by the baseline single-scan path and the
    progressive EOI-time reconstruction. ``adobe_transform`` is the
    APP14 color-transform byte (None when the marker is absent):
    4-component streams decode as CMYK (transform 0 / no marker) or
    YCCK (transform 2), with the Adobe-standard INVERTED sample
    convention applied exactly when the marker is present — the same
    rule libjpeg-derived decoders follow, so web-corpus CMYK JPEGs
    (print-pipeline exports) land as the RGB every browser shows."""
    full = []
    for c, blocks in pairs:
        q = qt.get(c["tq"])
        if q is None:
            raise ValueError(f"component references missing DQT table {c['tq']}")
        by, bx = blocks.shape[:2]
        coefs = blocks.reshape(by * bx, 8, 8).astype(np.float64) * q
        spatial = np.einsum("ux,nuv,vy->nxy", _C, coefs, _C) + 128.0
        plane = (
            spatial.reshape(by, bx, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(by * 8, bx * 8)
        )
        # upsample to full MCU-grid resolution, then crop to h×w
        plane = np.repeat(np.repeat(plane, vmax // c["v"], 0), hmax // c["h"], 1)
        full.append(plane[:h, :w])
    if len(full) == 1:
        y = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return np.stack([y, y, y], axis=-1)
    if len(full) == 4:
        return _cmyk_to_rgb(full, adobe_transform)
    if len(full) != 3:
        raise NotImplementedError(f"{len(full)}-component JPEG not supported")
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136286 * (cb - 128.0) - 0.714136286 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(
        np.round(np.stack([r, g, b], axis=-1)), 0, 255
    ).astype(np.uint8)


def _ycc_to_rgb_planes(y, cb, cr):
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136286 * (cb - 128.0) - 0.714136286 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return r, g, b


def _cmyk_to_rgb(full: list, adobe_transform: int | None) -> np.ndarray:
    """4-component color path. Adobe APP14 transform 2 is YCCK: the
    first three planes are YCbCr of the INVERTED C/M/Y inks; transform
    0 (or 1, nonsensical for 4 comps but seen in the wild as 'no
    transform') stores the four ink planes directly. When the Adobe
    marker is PRESENT the samples are inverted (s = 255 - ink), so
    RGB = s_cmy * s_k / 255; without the marker the samples are plain
    inks, RGB = (255-C)(255-K)/255 — the two conventions real decoders
    (libjpeg APP14 handling) apply."""
    p0, p1, p2, p3 = full
    if adobe_transform == 2:  # YCCK → inverted-CMY planes
        c_s, m_s, y_s = (
            np.clip(pl, 0.0, 255.0) for pl in _ycc_to_rgb_planes(p0, p1, p2)
        )
        k_s = np.clip(p3, 0.0, 255.0)
        inverted = True
    else:
        c_s, m_s, y_s, k_s = (np.clip(pl, 0.0, 255.0) for pl in full)
        inverted = adobe_transform is not None
    if not inverted:
        c_s, m_s, y_s, k_s = 255.0 - c_s, 255.0 - m_s, 255.0 - y_s, 255.0 - k_s
    rgb = np.stack(
        [c_s * k_s / 255.0, m_s * k_s / 255.0, y_s * k_s / 255.0], axis=-1
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _comp_blocks(frame: dict, c: dict, hmax: int, vmax: int) -> tuple[int, int]:
    """Block-grid dims for a NON-INTERLEAVED scan of component ``c``:
    ceil(comp samples / 8) per axis (T.81 A.2.2) — at most the
    MCU-padded plane dims, never more."""
    cw = -(-(frame["w"] * c["h"]) // hmax)
    ch = -(-(frame["h"] * c["v"]) // vmax)
    return -(-ch // 8), -(-cw // 8)


def _decode_progressive_scan(
    data: bytes, pos: int, frame: dict, scan: list, huff: dict,
    restart_interval: int, planes: dict, hmax: int, vmax: int,
    ss: int, se: int, ah: int, al: int,
) -> int:
    """One progressive scan (T.81 Annex G.2): fills the per-component
    zigzag coefficient planes in place and returns the stream position
    of the next marker. DC scans (Ss=0) may be interleaved; AC scans
    are single-component by spec. ``Ah=0`` scans establish coefficient
    values at precision ``Al``; ``Ah>0`` scans refine one bit."""
    if ss > se or se > 63:
        raise ValueError(f"bad spectral band {ss}..{se}")
    reader = _BitReader(data, pos)
    state = {"eobrun": 0}
    preds = {c["id"]: 0 for c, _td, _ta in scan}

    def _tbl(kind: int, tid: int) -> dict:
        t = huff.get((kind, tid))
        if t is None:
            raise ValueError("scan references missing Huffman table")
        return t

    def dc_first(block: np.ndarray, c: dict, td: int) -> None:
        t = _decode_huff(reader, _tbl(0, td))
        diff = _extend(reader.receive(t), t) if t else 0
        preds[c["id"]] += diff
        block[0] = preds[c["id"]] << al

    def dc_refine(block: np.ndarray) -> None:
        if reader.read_bit():
            block[0] |= 1 << al

    def ac_first(block: np.ndarray, ta: int) -> None:
        if state["eobrun"] > 0:
            state["eobrun"] -= 1
            return
        tbl = _tbl(1, ta)
        k = ss
        while k <= se:
            sym = _decode_huff(reader, tbl)
            r, s = sym >> 4, sym & 0xF
            if s == 0:
                if r < 15:  # EOBn: run of 2^r + extra end-of-band blocks
                    state["eobrun"] = (1 << r) - 1
                    if r:
                        state["eobrun"] += reader.receive(r)
                    return
                k += 16  # ZRL
                continue
            k += r
            if k > se:
                raise ValueError("AC run overflows spectral band")
            block[k] = _extend(reader.receive(s), s) << al
            k += 1

    def _correct(block: np.ndarray, k: int, bit: int) -> None:
        # a 1-bit means this already-nonzero coefficient gains the
        # current precision bit (toward larger magnitude)
        if reader.read_bit() and not (block[k] & bit):
            block[k] += bit if block[k] > 0 else -bit

    def ac_refine(block: np.ndarray, ta: int) -> None:
        bit = 1 << al
        if state["eobrun"] > 0:
            state["eobrun"] -= 1
            for k in range(ss, se + 1):
                if block[k]:
                    _correct(block, k, bit)
            return
        tbl = _tbl(1, ta)
        k = ss
        while k <= se:
            sym = _decode_huff(reader, tbl)
            r, s = sym >> 4, sym & 0xF
            newval = 0
            if s == 0:
                if r < 15:
                    # EOBn: later blocks handled by the eobrun branch;
                    # r=64 makes the advance loop below correct the
                    # REST of this band and insert nothing
                    state["eobrun"] = (1 << r) - 1
                    if r:
                        state["eobrun"] += reader.receive(r)
                    r = 64
                # else ZRL: skip 16 zero-HISTORY positions (r == 15,
                # the advance loop consumes the 16th via r == 0)
            else:
                if s != 1:
                    raise ValueError("AC refinement size must be 1")
                newval = bit if reader.read_bit() else -bit
            while k <= se:
                if block[k]:
                    _correct(block, k, bit)
                    k += 1
                else:
                    if r == 0:
                        if newval:
                            block[k] = newval
                        k += 1
                        break
                    r -= 1
                    k += 1

    # ---- unit iteration (MCUs when interleaved, blocks otherwise) ----
    units: list[tuple[np.ndarray, dict, int, int]] = []  # (block, comp, td, ta)
    if len(scan) > 1:
        if ss != 0:
            raise ValueError("interleaved progressive scan must be DC-only")
        mcus_x = -(-frame["w"] // (8 * hmax))
        mcus_y = -(-frame["h"] // (8 * vmax))
        per_mcu = []
        for my in range(mcus_y):
            for mx in range(mcus_x):
                mcu = []
                for c, td, ta in scan:
                    for v in range(c["v"]):
                        for u in range(c["h"]):
                            mcu.append(
                                (
                                    planes[c["id"]][
                                        my * c["v"] + v, mx * c["h"] + u
                                    ],
                                    c, td, ta,
                                )
                            )
                per_mcu.append(mcu)
    else:
        c, td, ta = scan[0]
        by, bx = _comp_blocks(frame, c, hmax, vmax)
        per_mcu = [
            [(planes[c["id"]][r, cc], c, td, ta)]
            for r in range(by)
            for cc in range(bx)
        ]
    try:
        for i, mcu in enumerate(per_mcu):
            if restart_interval and i and i % restart_interval == 0:
                reader.restart()
                state["eobrun"] = 0
                for cid in preds:
                    preds[cid] = 0
            for block, c, td, ta in mcu:
                if ss == 0:
                    if se != 0:
                        raise ValueError("DC scan must have Se=0")
                    dc_first(block, c, td) if ah == 0 else dc_refine(block)
                else:
                    ac_first(block, ta) if ah == 0 else ac_refine(block, ta)
    except _RestartMarker:
        # an RSTn mid-MCU (restarts are consumed proactively only at
        # interval boundaries above): corrupt stream or DRI mismatch.
        # Honor the loud-refusal contract HERE, not only in the
        # decode_jpeg top-level wrapper — this function must never leak
        # the bit reader's internal control-flow exception
        raise ValueError(
            "unexpected restart marker in progressive scan "
            "(corrupt stream or DRI mismatch)"
        ) from None
    # advance to the next marker: pad bits live in the reader's
    # accumulator; legal residue is only 0xFF fill bytes, a stuffed
    # 0xFF00, or a trailing RSTn. Anything else is UNCONSUMED entropy
    # data — e.g. a corrupt symbol that decoded as an early EOB run —
    # and must refuse loudly, never resynchronize to wrong pixels
    p = reader.pos
    n = len(data)
    while p < n - 1:
        if data[p] != 0xFF:
            raise ValueError(
                f"unconsumed entropy byte 0x{data[p]:02X} after "
                "progressive scan (corrupt stream)"
            )
        nxt = data[p + 1]
        if nxt == 0x00:
            p += 2
            continue
        if nxt == 0xFF:
            p += 1
            continue
        if 0xD0 <= nxt <= 0xD7:
            p += 2
            continue
        return p
    raise ValueError("progressive scan ran past end of payload")
