"""Multimodal asset operators.

Assets are rows ``(asset_id long, kind string, payload binary,
meta struct<n_bytes: long, declared_kind: string>)``. At 100 TB the
payload column stays opaque through every relational stage (column
pruning keeps it unread unless a UDF touches it); decode/feature steps
run as ``mapInPandas`` so one Arrow batch of binaries is processed per
Python call, never row-at-a-time.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tile_processor_spark.sources.tables import load_table

FEATURE_SCHEMA = "asset_id long, kind string, n_bytes long, byte_sum long, n_frames long"

_SAMPLE_STRIDE = 7


def make_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize an asset table from ``documents``: the UTF-8 text bytes
    stand in for opaque media payloads (the container has no codec libs),
    with a kind cycled over jpeg/png/wav and typed metadata."""
    d = load_table(spark, "documents", sf_dir)
    kind = F.element_at(
        F.array(F.lit("jpeg"), F.lit("png"), F.lit("wav")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return d.select(
        F.col("doc_id").alias("asset_id"),
        kind.alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.length("text").cast("long").alias("n_bytes"),
            kind.alias("declared_kind"),
        ).alias("meta"),
    )


_BMP_FILE_HEADER = 14
_BMP_INFO_HEADER = 40


def encode_bmp(pixels: np.ndarray) -> bytes:
    """Encode an H×W×3 uint8 RGB array as an uncompressed 24-bit BI_RGB
    Windows BMP: bottom-up rows, BGR byte order, rows padded to 4-byte
    boundaries. Dependency-free and byte-exact — the fixture side of
    the real decode path (``decode_bmp`` must invert this bit-for-bit,
    padding included)."""
    import struct

    if pixels.ndim != 3 or pixels.shape[2] != 3 or pixels.dtype != np.uint8:
        raise ValueError(f"expected H×W×3 uint8 RGB, got {pixels.shape} {pixels.dtype}")
    h, w = pixels.shape[:2]
    row = w * 3
    pad = (-row) % 4
    img_size = (row + pad) * h
    out = bytearray()
    out += struct.pack(
        "<2sIHHI", b"BM", _BMP_FILE_HEADER + _BMP_INFO_HEADER + img_size, 0, 0,
        _BMP_FILE_HEADER + _BMP_INFO_HEADER,
    )
    out += struct.pack(
        "<IiiHHIIiiII", _BMP_INFO_HEADER, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    for y in range(h - 1, -1, -1):
        out += pixels[y, :, ::-1].tobytes() + b"\x00" * pad
    return bytes(out)


def decode_bmp(payload: bytes) -> np.ndarray:
    """Decode an uncompressed 24-bit BI_RGB BMP to an H×W×3 uint8 RGB
    array. The one REAL (non-fake) decoder in the container: no codec
    libraries exist here, and uncompressed BMP is the standard raster
    container that needs none. Other BMP variants (palettized, RLE,
    top-down, 16/32-bpp) raise loudly rather than mis-decode."""
    import struct

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload (missing 'BM' magic)")
    (data_off,) = struct.unpack_from("<I", payload, 10)
    hdr_size, w, h, _planes, bpp, comp = struct.unpack_from("<IiiHHI", payload, 14)
    if hdr_size < _BMP_INFO_HEADER or bpp != 24 or comp != 0 or w <= 0 or h <= 0:
        raise NotImplementedError(
            f"only bottom-up uncompressed 24-bpp BMP supported "
            f"(got header={hdr_size} bpp={bpp} compression={comp} w={w} h={h})"
        )
    row = w * 3
    stride = row + ((-row) % 4)
    if data_off + stride * h > len(payload):
        raise ValueError("BMP payload truncated")
    a = np.frombuffer(payload, dtype=np.uint8, count=stride * h, offset=data_off)
    # bottom-up rows → top-down; strip padding; BGR → RGB
    return a.reshape(h, stride)[::-1, :row].reshape(h, w, 3)[:, :, ::-1].copy()


def decode_payload(payload: bytes, kind: str) -> np.ndarray:
    """Decode an asset payload to a 1-D sample array.

    ``bmp`` payloads go through the REAL decoder (``decode_bmp``;
    flattened row-major RGB samples). For jpeg/png/wav this LEGACY
    feature path keeps the deterministic fake (raw bytes as uint8)
    because ``make_assets`` fabricates payloads that are not real
    containers — but every kind now HAS a real decoder used by its own
    gate: ``decode_png``/``decode_wav`` here and ``decode_jpeg`` in
    ``multimodal/jpeg.py`` (full baseline: Huffman, IDCT, 4:2:0,
    restart markers). No stubbed codec kinds remain.
    """
    if kind == "bmp":
        return decode_bmp(payload).reshape(-1)
    if kind in ("jpeg", "png", "wav"):
        return np.frombuffer(payload, dtype=np.uint8)
    raise NotImplementedError(f"no decoder for asset kind {kind!r}")


def extract_features(assets: DataFrame) -> DataFrame:
    """Decode each payload and emit per-asset features: byte count, exact
    byte sum, and frame count at stride 7 (a stand-in for
    resize/frame-sample shape math). One Arrow batch per call."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            arrs = [decode_payload(bytes(p), k) for p, k in zip(pdf["payload"], pdf["kind"])]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"].to_numpy(),
                    "kind": pdf["kind"].to_numpy(),
                    "n_bytes": [len(a) for a in arrs],
                    "byte_sum": [int(a.astype(np.int64).sum()) for a in arrs],
                    "n_frames": [-(-len(a) // _SAMPLE_STRIDE) for a in arrs],
                }
            )

    return assets.mapInPandas(_batches, FEATURE_SCHEMA)


def frame_sample(assets: DataFrame, stride: int = _SAMPLE_STRIDE) -> DataFrame:
    """Every ``stride``-th sample of the decoded payload as an array
    column — the video-frame-sampling shape, kept binary-exact."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            frames = [
                decode_payload(bytes(p), k)[::stride].astype(np.int64).tolist()
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame({"asset_id": pdf["asset_id"].to_numpy(), "frames": frames})

    return assets.mapInPandas(_batches, "asset_id long, frames array<long>")


RESIZE_BINS = 16


def resize(assets: DataFrame, out_len: int = RESIZE_BINS) -> DataFrame:
    """Average-pool resize of the decoded payload to a fixed length —
    the 1-D stand-in for image resize (identical bin algebra to 2-D
    pooling: bin k averages samples [k·n/L, (k+1)·n/L)). Floored integer
    means keep the result exact; payloads shorter than ``out_len``
    yield NULL. Emitted as a '-'-joined string so the gate hash is
    type-stable."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for p, k in zip(pdf["payload"], pdf["kind"]):
                a = decode_payload(bytes(p), k).astype(np.int64)
                n = len(a)
                if n >= out_len:
                    edges = [(kk * n) // out_len for kk in range(out_len + 1)]
                    rows.append(
                        "-".join(
                            str(int(a[edges[kk] : edges[kk + 1]].sum() // (edges[kk + 1] - edges[kk])))
                            for kk in range(out_len)
                        )
                    )
                else:
                    rows.append(None)
            yield pd.DataFrame({"asset_id": pdf["asset_id"].to_numpy(), "resized": rows})

    return assets.mapInPandas(_batches, "asset_id long, resized string")


_BMP_W, _BMP_H = 8, 6


def make_bmp_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asset table whose payloads are REAL encoded images: per doc_id a
    deterministic 8×6 RGB raster (flattened pixel k carries value
    ``(doc_id·31 + k) mod 256``) encoded as an uncompressed 24-bit BMP.
    Downstream decode recovers the exact pixels, so the gate oracle can
    recompute every feature from doc_id arithmetic alone — the
    encode→decode roundtrip is pinned against closed form, not against
    itself. Same mapInPandas batch shape as the opaque-payload path."""
    d = load_table(spark, "documents", sf_dir).select("doc_id")
    n = _BMP_W * _BMP_H * 3

    def _gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        k = np.arange(n, dtype=np.int64)
        for pdf in it:
            payloads = [
                encode_bmp(
                    ((int(did) * 31 + k) % 256)
                    .astype(np.uint8)
                    .reshape(_BMP_H, _BMP_W, 3)
                )
                for did in pdf["doc_id"]
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["doc_id"].to_numpy(),
                    "kind": "bmp",
                    "payload": payloads,
                    "n_bytes": [len(p) for p in payloads],
                }
            )

    flat = d.mapInPandas(
        _gen, "asset_id long, kind string, payload binary, n_bytes long"
    )
    return flat.select(
        "asset_id",
        "kind",
        "payload",
        F.struct(
            F.col("n_bytes"), F.col("kind").alias("declared_kind")
        ).alias("meta"),
    )


def resize2d(assets: DataFrame, out_h: int = 2, out_w: int = 2) -> DataFrame:
    """TRUE 2-D average-pool image resize over decoded BMP rasters:
    bin (by, bx, c) is the floored integer mean of pixel block
    ``[by·H/out_h, (by+1)·H/out_h) × [bx·W/out_w, (bx+1)·W/out_w)`` per
    channel — the real form of the 1-D pooling algebra ``resize``
    stands in with for opaque payloads. Emitted as a '-'-joined string
    (row-major bins, RGB inner order) so the gate hash is type-stable.
    Payloads must be BMP (the real decoder); other kinds raise."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for p, k in zip(pdf["payload"], pdf["kind"]):
                if k != "bmp":
                    raise NotImplementedError(
                        f"resize2d needs decodable rasters; kind {k!r} has "
                        "no real decoder"
                    )
                img = decode_bmp(bytes(p)).astype(np.int64)
                h, w, _ = img.shape
                ye = [(i * h) // out_h for i in range(out_h + 1)]
                xe = [(i * w) // out_w for i in range(out_w + 1)]
                vals = []
                for by in range(out_h):
                    for bx in range(out_w):
                        block = img[ye[by] : ye[by + 1], xe[bx] : xe[bx + 1], :]
                        npix = block.shape[0] * block.shape[1]
                        for c in range(3):
                            vals.append(int(block[:, :, c].sum() // npix))
                rows.append("-".join(map(str, vals)))
            yield pd.DataFrame(
                {"asset_id": pdf["asset_id"].to_numpy(), "resized2d": rows}
            )

    return assets.mapInPandas(_batches, "asset_id long, resized2d string")


def encode_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """Encode int16 PCM samples — shape (n,) mono or (n, ch) — as a
    canonical RIFF/WAVE file (PCM format 1, 16-bit, little-endian
    interleaved). The audio twin of ``encode_bmp``: a real container
    format needing no codec libraries, byte-exactly invertible by
    ``decode_wav``."""
    import struct

    if samples.dtype != np.int16:
        raise ValueError(f"expected int16 PCM samples, got {samples.dtype}")
    if samples.ndim == 1:
        samples = samples[:, None]
    if samples.ndim != 2:
        raise ValueError(f"expected (n,) or (n, ch) samples, got {samples.shape}")
    n, ch = samples.shape
    data = samples.astype("<i2").tobytes()  # interleaved row-major
    block_align = ch * 2
    fmt = struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, 1, ch, sample_rate,
        sample_rate * block_align, block_align, 16,
    )
    body = b"WAVE" + fmt + struct.pack("<4sI", b"data", len(data)) + data
    return struct.pack("<4sI", b"RIFF", len(body)) + body


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a RIFF/WAVE payload to ``(samples (n, ch) int16,
    sample_rate)``. Walks the chunk list (so extra chunks like LIST /
    INFO are skipped, per the RIFF spec), requires PCM format 1 at 16
    bits — compressed or float WAV variants raise loudly."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, end = 12, min(len(payload), 8 + struct.unpack_from("<I", payload, 4)[0])
    fmt = None
    data = None
    while pos + 8 <= end:
        cid, size = struct.unpack_from("<4sI", payload, pos)
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV payload missing fmt/data chunk")
    audio_format, ch, sample_rate, _brate, _balign, bits = fmt
    if audio_format != 1 or bits != 16:
        raise NotImplementedError(
            f"only 16-bit PCM WAV supported (format={audio_format} bits={bits})"
        )
    n = len(data) // (ch * 2)
    samples = np.frombuffer(data, dtype="<i2", count=n * ch).reshape(n, ch)
    return samples.astype(np.int16), sample_rate


def wav_features(assets: DataFrame) -> DataFrame:
    """Decode real WAV payloads and emit per-asset audio features:
    sample/channel counts, rate, exact sample sum, and peak absolute
    amplitude — the audio analogue of ``extract_features``, through
    the same Arrow-batched ``mapInPandas`` path."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for aid, p in zip(pdf["asset_id"], pdf["payload"]):
                s, rate = decode_wav(bytes(p))
                rows.append(
                    (
                        int(aid),
                        s.shape[0],
                        rate,
                        s.shape[1],
                        int(s.astype(np.int64).sum()),
                        int(np.abs(s.astype(np.int64)).max()) if s.size else 0,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "n_samples", "sample_rate", "n_channels",
                    "sample_sum", "peak_abs",
                ],
            )

    return assets.mapInPandas(
        _batches,
        "asset_id long, n_samples long, sample_rate long, n_channels long, "
        "sample_sum long, peak_abs long",
    )


_WAV_N, _WAV_RATE = 120, 8000


def make_wav_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asset table whose payloads are REAL encoded audio: per doc_id a
    deterministic 120-sample mono PCM stream (sample k carries
    ``((doc_id·37 + k·11) mod 4096) − 2048``) encoded as 16-bit RIFF/
    WAVE — the oracle recomputes every feature from doc_id arithmetic,
    pinning the encode→decode roundtrip against closed form."""
    d = load_table(spark, "documents", sf_dir).select("doc_id")

    def _gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        k = np.arange(_WAV_N, dtype=np.int64)
        for pdf in it:
            payloads = [
                encode_wav(
                    (((int(did) * 37 + k * 11) % 4096) - 2048).astype(np.int16),
                    _WAV_RATE,
                )
                for did in pdf["doc_id"]
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["doc_id"].to_numpy(),
                    "kind": "wav",
                    "payload": payloads,
                    "n_bytes": [len(p) for p in payloads],
                }
            )

    flat = d.mapInPandas(
        _gen, "asset_id long, kind string, payload binary, n_bytes long"
    )
    return flat.select(
        "asset_id",
        "kind",
        "payload",
        F.struct(
            F.col("n_bytes"), F.col("kind").alias("declared_kind")
        ).alias("meta"),
    )


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def encode_png(pixels: np.ndarray) -> bytes:
    """Encode an H×W×3 uint8 RGB array as a real PNG (8-bit truecolor,
    non-interlaced, filter 0 rows, one zlib IDAT). PNG is the one
    COMPRESSED raster format buildable with the stdlib alone (zlib) —
    unlike BMP this exercises a real inflate on the decode side."""
    import struct
    import zlib

    if pixels.ndim != 3 or pixels.shape[2] != 3 or pixels.dtype != np.uint8:
        raise ValueError(f"expected H×W×3 uint8 RGB, got {pixels.shape} {pixels.dtype}")
    h, w = pixels.shape[:2]

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    raw = b"".join(b"\x00" + pixels[y].tobytes() for y in range(h))
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _png_unfilter(raw: bytes, h: int, w: int, ch: int) -> np.ndarray:
    """Undo PNG per-row filtering (all five filter types, Paeth
    included) on the inflated scanline stream."""
    stride = w * ch
    out = np.zeros((h, stride), dtype=np.uint8)
    pos = 0
    for y in range(h):
        ftype = raw[pos]
        row = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos + 1).astype(
            np.int32
        )
        pos += 1 + stride
        prev = out[y - 1].astype(np.int32) if y > 0 else np.zeros(stride, np.int32)
        if ftype == 0:  # None
            cur = row
        elif ftype == 2:  # Up
            cur = (row + prev) & 0xFF
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth need left context
            cur = np.zeros(stride, np.int32)
            for i in range(stride):
                a = cur[i - ch] if i >= ch else 0
                b = prev[i]
                if ftype == 1:
                    cur[i] = (row[i] + a) & 0xFF
                elif ftype == 3:
                    cur[i] = (row[i] + ((a + b) >> 1)) & 0xFF
                else:
                    c = prev[i - ch] if i >= ch else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    cur[i] = (row[i] + pr) & 0xFF
        else:
            raise NotImplementedError(f"PNG filter type {ftype}")
        out[y] = cur.astype(np.uint8)
    return out


def decode_png(payload: bytes) -> np.ndarray:
    """Decode an 8-bit truecolor (RGB or RGBA) non-interlaced PNG to an
    H×W×ch uint8 array: chunk walk with CRC verification, zlib inflate,
    full five-filter unfiltering. Palette/16-bit/interlaced variants
    raise loudly rather than mis-decode."""
    import struct
    import zlib

    if payload[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG payload (bad signature)")
    pos = len(_PNG_SIG)
    ihdr = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if crc != (zlib.crc32(ctype + data) & 0xFFFFFFFF):
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("PNG payload missing IHDR/IDAT")
    w, h, depth, color, _comp, _filt, interlace = ihdr
    if depth != 8 or color not in (2, 6) or interlace != 0:
        raise NotImplementedError(
            f"only 8-bit truecolor non-interlaced PNG supported "
            f"(depth={depth} color_type={color} interlace={interlace})"
        )
    ch = 3 if color == 2 else 4
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (1 + w * ch):
        raise ValueError("PNG scanline stream has wrong length")
    return _png_unfilter(raw, h, w, ch).reshape(h, w, ch)


def make_png_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asset table with REAL compressed image payloads: per doc_id the
    deterministic 8×6 raster (flat pixel k = ``(doc_id·29 + 7k) mod
    256``) encoded as an 8-bit truecolor PNG — decode pays a real zlib
    inflate + unfilter, and the gate oracle recomputes features from
    doc_id arithmetic alone."""
    d = load_table(spark, "documents", sf_dir).select("doc_id")
    n = _BMP_W * _BMP_H * 3

    def _gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        k = np.arange(n, dtype=np.int64)
        for pdf in it:
            payloads = [
                encode_png(
                    ((int(did) * 29 + 7 * k) % 256)
                    .astype(np.uint8)
                    .reshape(_BMP_H, _BMP_W, 3)
                )
                for did in pdf["doc_id"]
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["doc_id"].to_numpy(),
                    "kind": "png",
                    "payload": payloads,
                    "n_bytes": [len(p) for p in payloads],
                }
            )

    flat = d.mapInPandas(
        _gen, "asset_id long, kind string, payload binary, n_bytes long"
    )
    return flat.select(
        "asset_id",
        "kind",
        "payload",
        F.struct(
            F.col("n_bytes"), F.col("kind").alias("declared_kind")
        ).alias("meta"),
    )


def png_features(assets: DataFrame) -> DataFrame:
    """Decode PNG payloads (real inflate) and emit per-asset features:
    dimensions, decoded sample count, and exact pixel sum."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for aid, p in zip(pdf["asset_id"], pdf["payload"]):
                img = decode_png(bytes(p)).astype(np.int64)
                rows.append(
                    (
                        int(aid),
                        img.shape[1],
                        img.shape[0],
                        int(img.size),
                        int(img.sum()),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["asset_id", "width", "height", "n_samples", "pixel_sum"]
            )

    return assets.mapInPandas(
        _batches,
        "asset_id long, width long, height long, n_samples long, pixel_sum long",
    )


def split_png_stream(payload: bytes) -> list[bytes]:
    """Split a concatenated-PNG stream (the engine's dependency-free
    multi-frame 'video' container) into per-frame payloads by WALKING
    chunk lengths — no inflate, no pixel work. This is the structural
    pass frame sampling needs: at a large stride almost every frame is
    skipped, and skipping must not cost a decode."""
    import struct

    frames = []
    pos = 0
    while pos < len(payload):
        if payload[pos : pos + len(_PNG_SIG)] != _PNG_SIG:
            raise ValueError(f"PNG stream: bad signature at offset {pos}")
        start = pos
        pos += len(_PNG_SIG)
        while True:
            (length,) = struct.unpack_from(">I", payload, pos)
            ctype = payload[pos + 4 : pos + 8]
            pos += 12 + length
            if ctype == b"IEND":
                break
        frames.append(payload[start:pos])
    return frames


def video_frame_sample(assets: DataFrame, stride: int) -> DataFrame:
    """Frame sampling over the multi-frame container: structurally walk
    the stream (cheap), DECODE ONLY every ``stride``-th frame, and emit
    per-asset totals — the video keyframe-sampling shape with its real
    cost model (decode cost ∝ sampled frames, not stored frames)."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for aid, p in zip(pdf["asset_id"], pdf["payload"]):
                frames = split_png_stream(bytes(p))
                sampled = frames[::stride]
                pix = sum(
                    int(decode_png(f).astype(np.int64).sum()) for f in sampled
                )
                rows.append((int(aid), len(frames), len(sampled), pix))
            yield pd.DataFrame(
                rows,
                columns=["asset_id", "n_frames", "n_sampled", "sampled_pixel_sum"],
            )

    return assets.mapInPandas(
        _batches,
        "asset_id long, n_frames long, n_sampled long, sampled_pixel_sum long",
    )


_VID_FRAMES, _VID_H, _VID_W, _VID_STRIDE = 10, 3, 4, 3


def make_video_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asset table whose payloads are multi-frame containers: 10
    concatenated 4×3 PNG frames per doc, frame f's flat pixel k
    carrying ``(doc_id·13 + f·101 + 3k) mod 256`` — closed-form
    recomputable by the gate oracle."""
    d = load_table(spark, "documents", sf_dir).select("doc_id")
    n = _VID_H * _VID_W * 3

    def _gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        k = np.arange(n, dtype=np.int64)
        for pdf in it:
            payloads = []
            for did in pdf["doc_id"]:
                frames = [
                    encode_png(
                        ((int(did) * 13 + f * 101 + 3 * k) % 256)
                        .astype(np.uint8)
                        .reshape(_VID_H, _VID_W, 3)
                    )
                    for f in range(_VID_FRAMES)
                ]
                payloads.append(b"".join(frames))
            yield pd.DataFrame(
                {
                    "asset_id": pdf["doc_id"].to_numpy(),
                    "kind": "png-stream",
                    "payload": payloads,
                    "n_bytes": [len(p) for p in payloads],
                }
            )

    flat = d.mapInPandas(
        _gen, "asset_id long, kind string, payload binary, n_bytes long"
    )
    return flat.select(
        "asset_id",
        "kind",
        "payload",
        F.struct(
            F.col("n_bytes"), F.col("kind").alias("declared_kind")
        ).alias("meta"),
    )


# ---- JPEG (real baseline codec, multimodal/jpeg.py) --------------------

_JPEG_H, _JPEG_W = 16, 32  # one 4:2:0 MCU row of two MCUs — 8 luma blocks


def make_jpeg_assets(
    spark: SparkSession, sf_dir: str, progressive: bool = False
) -> DataFrame:
    """Asset table with REAL baseline-JPEG payloads: per doc_id a 16×32
    grayscale raster, constant g_b = ``(doc_id·23 + 41b) mod 256``
    within each of its 8 luma blocks (block index b row-major), encoded
    4:2:0 with a restart marker and lossless (all-ones) quantization
    tables. Block-constant gray round-trips bit-exactly through the
    codec (see multimodal/jpeg.py), so the gate oracle recomputes the
    decoded pixel sum from doc_id arithmetic alone — while the decode
    still pays the full real path: marker walk, DHT Huffman decode,
    RSTn handling, dequantize, IDCT, chroma upsample, YCbCr→RGB.

    ``progressive=True`` encodes the SAME rasters as multi-scan SOF2
    streams (spectral selection + successive approximation, per-scan
    DHT redefinition, restart markers inside progressive scans) — the
    pixel contract is identical, so the one oracle proves both entropy
    organizations."""
    from tile_processor_spark.multimodal.jpeg import (
        encode_jpeg,
        encode_jpeg_progressive,
    )

    enc = encode_jpeg_progressive if progressive else encode_jpeg
    d = load_table(spark, "documents", sf_dir).select("doc_id")

    def _gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        b = np.arange(8, dtype=np.int64)
        for pdf in it:
            payloads = []
            for did in pdf["doc_id"]:
                g = ((int(did) * 23 + 41 * b) % 256).astype(np.uint8).reshape(2, 4)
                img = np.repeat(np.repeat(g, 8, 0), 8, 1)
                payloads.append(
                    enc(
                        np.stack([img, img, img], axis=-1),
                        subsampling="420",
                        lossless_tables=True,
                        restart_interval=1,
                    )
                )
            yield pd.DataFrame(
                {
                    "asset_id": pdf["doc_id"].to_numpy(),
                    "kind": "jpeg",
                    "payload": payloads,
                    "n_bytes": [len(p) for p in payloads],
                }
            )

    flat = d.mapInPandas(
        _gen, "asset_id long, kind string, payload binary, n_bytes long"
    )
    return flat.select(
        "asset_id",
        "kind",
        "payload",
        F.struct(
            F.col("n_bytes"), F.col("kind").alias("declared_kind")
        ).alias("meta"),
    )


def make_cmyk_jpeg_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asset table with REAL 4-component Adobe-CMYK JPEG payloads: per
    doc_id a 16×32 raster whose four ink planes are block-constant —
    C_b = (did·23+41b)%256, M_b = (did·7+13b)%256, Y_b = (did·11+29b)%256,
    K_b = (did·5+17b)%256 per 8×8 block b (row-major) — encoded with
    the Adobe APP14 marker (transform 0, inverted samples) and lossless
    quantization tables. Block-constant inks round-trip bit-exactly, so
    the decoded RGB is r = round((255-C)(255-K)/255) per pixel (and m/y
    analogues) — integer arithmetic the gate oracle recomputes from
    doc_id alone. YCCK (transform 2) and the markerless plain-ink
    convention are pinned in tests/test_multimodal_jpeg.py."""
    from tile_processor_spark.multimodal.jpeg import encode_jpeg_cmyk

    d = load_table(spark, "documents", sf_dir).select("doc_id")

    def _gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        b = np.arange(8, dtype=np.int64)
        for pdf in it:
            payloads = []
            for did in pdf["doc_id"]:
                did = int(did)
                planes = [
                    ((did * 23 + 41 * b) % 256),
                    ((did * 7 + 13 * b) % 256),
                    ((did * 11 + 29 * b) % 256),
                    ((did * 5 + 17 * b) % 256),
                ]
                inks = np.stack(
                    [
                        np.repeat(np.repeat(
                            p.astype(np.uint8).reshape(2, 4), 8, 0), 8, 1)
                        for p in planes
                    ],
                    axis=-1,
                )
                payloads.append(
                    encode_jpeg_cmyk(inks, transform=0, lossless_tables=True)
                )
            yield pd.DataFrame(
                {
                    "asset_id": pdf["doc_id"].to_numpy(),
                    "kind": "jpeg-cmyk",
                    "payload": payloads,
                    "n_bytes": [len(p) for p in payloads],
                }
            )

    flat = d.mapInPandas(
        _gen, "asset_id long, kind string, payload binary, n_bytes long"
    )
    return flat.select(
        "asset_id",
        "kind",
        "payload",
        F.struct(
            F.col("n_bytes"), F.col("kind").alias("declared_kind")
        ).alias("meta"),
    )


def jpeg_features(assets: DataFrame) -> DataFrame:
    """Decode JPEG payloads through the real baseline decoder and emit
    per-asset features: dimensions, decoded sample count, exact pixel
    sum — same shape as ``png_features``."""
    from tile_processor_spark.multimodal.jpeg import decode_jpeg

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for aid, p in zip(pdf["asset_id"], pdf["payload"]):
                img = decode_jpeg(bytes(p)).astype(np.int64)
                rows.append(
                    (
                        int(aid),
                        img.shape[1],
                        img.shape[0],
                        int(img.size),
                        int(img.sum()),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["asset_id", "width", "height", "n_samples", "pixel_sum"]
            )

    return assets.mapInPandas(
        _batches,
        "asset_id long, width long, height long, n_samples long, pixel_sum long",
    )
