"""The dependency-free BMP codec: the one REAL decoder in the container
(no codec libs), so its byte-level contract is pinned here — row order,
channel order, 4-byte row padding, and loud failure on every BMP variant
it does not speak. The Spark-side path (make_bmp_assets → mapInPandas
decode → features) is pinned against the DuckDB closed-form oracle."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from tile_processor_spark.multimodal.ops import (
    decode_bmp,
    decode_payload,
    encode_bmp,
)

SF = "/root/testdata/sf0.001"


def test_roundtrip_various_shapes():
    rng = np.random.default_rng(7)
    # w=3 → 9-byte rows need 3 pad bytes; w=4 → none; w=1 → 1 pad byte
    for shape in [(6, 8, 3), (5, 3, 3), (1, 1, 3), (4, 7, 3), (2, 4, 3)]:
        a = rng.integers(0, 256, shape, dtype=np.uint8)
        assert (decode_bmp(encode_bmp(a)) == a).all(), shape


def test_handbuilt_bytes_decode_exactly():
    """A 2×1 image built byte-by-byte (not via encode_bmp): row padding
    present, bottom-up storage, BGR order — decode must undo all
    three. Top row RGB=(1,2,3), bottom row RGB=(4,5,6)."""
    hdr = struct.pack("<2sIHHI", b"BM", 54 + 8, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, 1, 2, 1, 24, 0, 8, 0, 0, 0, 0)
    # bottom-up: bottom row first; BGR; 3-byte row padded to 4
    pixels = bytes([6, 5, 4, 0]) + bytes([3, 2, 1, 0])
    got = decode_bmp(hdr + info + pixels)
    assert got.shape == (2, 1, 3)
    assert got[0, 0].tolist() == [1, 2, 3]
    assert got[1, 0].tolist() == [4, 5, 6]


def test_unsupported_variants_raise():
    a = np.zeros((2, 2, 3), dtype=np.uint8)
    good = bytearray(encode_bmp(a))
    with pytest.raises(ValueError, match="magic"):
        decode_bmp(b"XX" + bytes(good[2:]))
    bpp32 = bytearray(good)
    struct.pack_into("<H", bpp32, 28, 32)
    with pytest.raises(NotImplementedError, match="24-bpp"):
        decode_bmp(bytes(bpp32))
    rle = bytearray(good)
    struct.pack_into("<I", rle, 30, 1)  # BI_RLE8
    with pytest.raises(NotImplementedError):
        decode_bmp(bytes(rle))
    topdown = bytearray(good)
    struct.pack_into("<i", topdown, 22, -2)  # negative height = top-down
    with pytest.raises(NotImplementedError):
        decode_bmp(bytes(topdown))
    with pytest.raises(ValueError, match="truncated"):
        decode_bmp(bytes(good[:-3]))
    with pytest.raises(ValueError, match="uint8"):
        encode_bmp(np.zeros((2, 2, 3), dtype=np.int64))


def test_decode_payload_routes_bmp():
    a = np.arange(24, dtype=np.uint8).reshape(2, 4, 3)
    flat = decode_payload(encode_bmp(a), "bmp")
    assert flat.tolist() == list(range(24))  # row-major RGB samples
    with pytest.raises(NotImplementedError, match="kind"):
        decode_payload(b"\x00", "mp4")


def test_bmp_gate_row_matches_closed_form(spark):
    """The Spark plan decodes what it encoded; the expected features
    come from doc_id arithmetic alone (same formula as the DuckDB
    oracle the driver runs)."""
    from tile_processor_spark.plans.multimodal_gate import multimodal_bmp_decode

    got = {
        r["asset_id"]: r
        for r in multimodal_bmp_decode(spark, SF).collect()
    }
    assert got
    for did, r in got.items():
        assert r["n_bytes"] == 144 and r["n_frames"] == 21 and r["kind"] == "bmp"
        assert r["byte_sum"] == sum((did * 31 + k) % 256 for k in range(144))


def test_resize2d_matches_closed_form(spark):
    """2-D average pool over the decoded raster equals the doc_id
    arithmetic the DuckDB oracle uses (same formula, no decode)."""
    from tile_processor_spark.plans.multimodal_gate import multimodal_bmp_resize2d

    got = {r["asset_id"]: r["resized2d"] for r in multimodal_bmp_resize2d(spark, SF).collect()}
    assert got
    for did, s in got.items():
        vals = []
        for by in range(2):
            for bx in range(2):
                for c in range(3):
                    px = [
                        (did * 31 + (y * 8 + x) * 3 + c) % 256
                        for y in range(by * 3, by * 3 + 3)
                        for x in range(bx * 4, bx * 4 + 4)
                    ]
                    vals.append(sum(px) // 12)
        assert s == "-".join(map(str, vals)), did


def test_resize2d_rejects_undecodable_kinds(spark):
    from tile_processor_spark.multimodal.ops import make_assets, resize2d

    with pytest.raises(Exception, match="real decoder"):
        resize2d(make_assets(spark, SF)).collect()


def test_wav_roundtrip_and_variants():
    import struct

    import numpy as np

    from tile_processor_spark.multimodal.ops import decode_wav, encode_wav

    rng = np.random.default_rng(3)
    for shape in [(120,), (55, 2), (1, 3)]:
        a = rng.integers(-32768, 32767, shape, dtype=np.int16)
        s, r = decode_wav(encode_wav(a, 44100))
        exp = a[:, None] if a.ndim == 1 else a
        assert r == 44100 and (s == exp).all(), shape
    # an extra RIFF chunk before data must be skipped (chunk walking)
    good = bytearray(encode_wav(np.array([5, -7], dtype=np.int16), 8000))
    extra = struct.pack("<4sI", b"LIST", 4) + b"INFO"
    payload = bytes(good[:12]) + extra + bytes(good[12:])
    payload = payload[:4] + struct.pack("<I", len(payload) - 8) + payload[8:]
    s, r = decode_wav(payload)
    assert r == 8000 and s[:, 0].tolist() == [5, -7]
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"XXXX" + bytes(good[4:]))
    # float-format WAV raises (format tag lives after the fmt chunk id)
    bad = bytearray(good)
    struct.pack_into("<H", bad, 20, 3)  # IEEE float
    with pytest.raises(NotImplementedError, match="PCM"):
        decode_wav(bytes(bad))
    with pytest.raises(ValueError, match="int16"):
        encode_wav(np.zeros(4, dtype=np.float32))


def test_wav_gate_row_matches_closed_form(spark):
    from tile_processor_spark.plans.multimodal_gate import multimodal_wav_decode

    got = {r["asset_id"]: r for r in multimodal_wav_decode(spark, SF).collect()}
    assert got
    for did, r in got.items():
        vals = [(did * 37 + k * 11) % 4096 - 2048 for k in range(120)]
        assert r["n_samples"] == 120 and r["sample_rate"] == 8000
        assert r["n_channels"] == 1
        assert r["sample_sum"] == sum(vals)
        assert r["peak_abs"] == max(abs(v) for v in vals)


def test_png_roundtrip_and_filter_types():
    """decode_png must undo ALL five PNG filter types — the test
    re-encodes a known image with each filter per the spec (independent
    of encode_png, which always uses filter 0) and decodes it."""
    import struct
    import zlib

    import numpy as np

    from tile_processor_spark.multimodal.ops import decode_png, encode_png

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (5, 4, 3), dtype=np.uint8)
    assert (decode_png(encode_png(img)) == img).all()

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    def encode_with_filter(pixels, ftype):
        h, w, ch = pixels.shape
        raw = bytearray()
        prev = np.zeros(w * ch, dtype=np.int32)
        for y in range(h):
            cur = pixels[y].reshape(-1).astype(np.int32)
            filt = np.zeros(w * ch, dtype=np.int32)
            for i in range(w * ch):
                a = cur[i - ch] if i >= ch else 0
                b = prev[i]
                c = prev[i - ch] if i >= ch else 0
                if ftype == 0:
                    pred = 0
                elif ftype == 1:
                    pred = a
                elif ftype == 2:
                    pred = b
                elif ftype == 3:
                    pred = (a + b) >> 1
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                filt[i] = (cur[i] - pred) & 0xFF
            raw.append(ftype)
            raw.extend(filt.astype(np.uint8).tobytes())
            prev = cur
        sig = b"\x89PNG\r\n\x1a\n"
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        return (
            sig + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b"")
        )

    for ftype in range(5):
        got = decode_png(encode_with_filter(img, ftype))
        assert (got == img).all(), f"filter {ftype}"


def test_png_variant_rejection():
    import struct
    import zlib

    import numpy as np

    from tile_processor_spark.multimodal.ops import decode_png, encode_png

    good = bytearray(encode_png(np.zeros((2, 2, 3), dtype=np.uint8)))
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"X" + bytes(good[1:]))
    # corrupt a data byte inside IHDR -> CRC catches it
    bad = bytearray(good)
    bad[16] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(bad))
    # 16-bit depth rejected (re-CRC the edited IHDR so CRC passes)
    deep = bytearray(good)
    deep[24] = 16
    ihdr = bytes(deep[12:16]) + bytes(deep[16:29])
    struct.pack_into(">I", deep, 29, zlib.crc32(ihdr) & 0xFFFFFFFF)
    with pytest.raises(NotImplementedError, match="truecolor"):
        decode_png(bytes(deep))


def test_png_gate_row_matches_closed_form(spark):
    from tile_processor_spark.plans.multimodal_gate import multimodal_png_decode

    got = {r["asset_id"]: r for r in multimodal_png_decode(spark, SF).collect()}
    assert got
    for did, r in got.items():
        assert (r["width"], r["height"], r["n_samples"]) == (8, 6, 144)
        assert r["pixel_sum"] == sum((did * 29 + 7 * k) % 256 for k in range(144))


def test_png_stream_split_walks_without_decoding():
    import numpy as np

    from tile_processor_spark.multimodal.ops import (
        decode_png,
        encode_png,
        split_png_stream,
    )

    rng = np.random.default_rng(5)
    imgs = [rng.integers(0, 256, (3, 4, 3), dtype=np.uint8) for _ in range(4)]
    stream = b"".join(encode_png(i) for i in imgs)
    frames = split_png_stream(stream)
    assert len(frames) == 4
    for f, img in zip(frames, imgs):
        assert (decode_png(f) == img).all()
    with pytest.raises(ValueError, match="signature"):
        split_png_stream(stream + b"junk")


def test_video_gate_row_matches_closed_form(spark):
    from tile_processor_spark.plans.multimodal_gate import (
        multimodal_video_frame_sample,
    )

    got = {
        r["asset_id"]: r for r in multimodal_video_frame_sample(spark, SF).collect()
    }
    assert got
    for did, r in got.items():
        assert (r["n_frames"], r["n_sampled"]) == (10, 4)
        assert r["sampled_pixel_sum"] == sum(
            (did * 13 + f * 101 + 3 * k) % 256
            for f in (0, 3, 6, 9)
            for k in range(36)
        )
