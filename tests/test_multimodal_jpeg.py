"""The dependency-free baseline JPEG codec: exactness on the
block-constant-gray contract the gate oracle relies on, bounded loss on
general content, restart-marker and 4:2:0 paths, and loud refusal of
unsupported modes — never a silent mis-decode."""

from __future__ import annotations

import numpy as np
import pytest

from tile_processor_spark.multimodal.jpeg import decode_jpeg, encode_jpeg


def _block_gray(values: np.ndarray) -> np.ndarray:
    """H/8 × W/8 block values → H×W×3 gray RGB image."""
    img = np.repeat(np.repeat(values.astype(np.uint8), 8, 0), 8, 1)
    return np.stack([img, img, img], axis=-1)


def test_block_constant_gray_is_bit_exact_420():
    """The gate-oracle lever: gray (zero chroma) + per-block-constant
    luma (lone integer DC) + all-ones quantizers = exact round trip,
    through the full real path (Huffman, RST, IDCT, upsample)."""
    rng = np.random.RandomState(11)
    rgb = _block_gray(rng.randint(0, 256, (2, 4)))
    for ri in (0, 1):
        payload = encode_jpeg(
            rgb, subsampling="420", lossless_tables=True, restart_interval=ri
        )
        assert payload[:2] == b"\xff\xd8" and payload[-2:] == b"\xff\xd9"
        assert np.array_equal(decode_jpeg(payload), rgb)


def test_block_constant_gray_is_bit_exact_444():
    rng = np.random.RandomState(13)
    rgb = _block_gray(rng.randint(0, 256, (3, 5)))
    payload = encode_jpeg(rgb, subsampling="444", lossless_tables=True)
    assert np.array_equal(decode_jpeg(payload), rgb)


def test_smooth_color_roundtrip_bounded_loss():
    """Annex-K quantization on smooth content: lossy but bounded (the
    standard JPEG contract) — a transform/zigzag/table bug shows up as
    gross error, not ±10."""
    h, w = 32, 48
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [
            (128 + 40 * np.sin(yy / 9.0)).astype(np.uint8),
            (128 + 40 * np.cos(xx / 11.0)).astype(np.uint8),
            (128 + 20 * np.sin((xx + yy) / 13.0)).astype(np.uint8),
        ],
        axis=-1,
    )
    for sub, shape in (("444", img), ("420", img[:32, :32])):
        out = decode_jpeg(encode_jpeg(shape, subsampling=sub)).astype(np.int32)
        assert np.abs(out - shape.astype(np.int32)).max() <= 16
        assert np.abs(out.mean() - shape.mean()) < 2.0


def test_lossless_tables_noise_tight():
    """All-ones quantizers on arbitrary content: the only loss is
    coefficient/color rounding — a few counts, not quantization-scale."""
    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, (16, 16, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, lossless_tables=True)).astype(np.int32)
    assert np.abs(out - img.astype(np.int32)).max() <= 4


def test_restart_markers_present_and_handled():
    rng = np.random.RandomState(3)
    rgb = _block_gray(rng.randint(0, 256, (2, 8)))  # 16×64: 4 MCUs at 4:2:0
    payload = encode_jpeg(
        rgb, subsampling="420", lossless_tables=True, restart_interval=1
    )
    assert b"\xff\xdd" in payload  # DRI segment
    assert any(bytes([0xFF, 0xD0 + i]) in payload for i in range(8))
    assert np.array_equal(decode_jpeg(payload), rgb)


def test_refusals_are_loud():
    rgb = _block_gray(np.array([[100]]))
    payload = encode_jpeg(rgb, lossless_tables=True)
    # a baseline stream whose SOF marker is doctored to SOF2 is a
    # CORRUPT progressive stream (its single scan claims the full
    # spectral band for a DC-style scan header) — malformed data, not
    # an unsupported mode, since round 12 decodes real progressive
    bad = bytearray(payload)
    bad[bytes(payload).find(b"\xff\xc0") + 1] = 0xC2
    with pytest.raises(ValueError):
        decode_jpeg(bytes(bad))
    # arithmetic coding SOF9
    bad = bytearray(payload)
    bad[bytes(payload).find(b"\xff\xc0") + 1] = 0xC9
    with pytest.raises(NotImplementedError, match="SOF9"):
        decode_jpeg(bytes(bad))
    # not a JPEG at all
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x89PNG\r\n\x1a\n")
    # odd dims at 4:2:0 refuse at encode time
    with pytest.raises(ValueError, match="multiples"):
        encode_jpeg(np.zeros((8, 8, 3), np.uint8), subsampling="420")


def test_grayscale_single_component_exact():
    """A TRUE single-component (luma-only) stream decodes through the
    gray branch to H×W×3 replicated channels — exactly, for
    block-constant content with lossless tables."""
    rgb = _block_gray(np.array([[50, 200], [0, 255]]))
    payload = encode_jpeg(rgb, lossless_tables=True, grayscale=True)
    # the stream really is 1-component: no chroma DQT/DHT ids
    out = decode_jpeg(payload)
    assert np.array_equal(out, rgb)
    # and it's smaller than the equivalent 3-component stream
    assert len(payload) < len(encode_jpeg(rgb, lossless_tables=True))


def test_jpeg_features_spark(spark):
    """The Spark surface: features computed on executors over real
    payloads match the doc_id arithmetic the gate oracle uses."""
    from tile_processor_spark.multimodal.ops import (
        jpeg_features,
        make_jpeg_assets,
    )

    assets = make_jpeg_assets(spark, "/root/testdata/sf0.001")
    got = {
        r["asset_id"]: r.asDict()
        for r in jpeg_features(assets).limit(500).collect()
    }
    assert got
    b = np.arange(8, dtype=np.int64)
    for aid, row in list(got.items())[:20]:
        expect = int(3 * 64 * ((aid * 23 + 41 * b) % 256).sum())
        assert (row["width"], row["height"], row["n_samples"]) == (32, 16, 1536)
        assert row["pixel_sum"] == expect


def test_fill_bytes_before_markers_are_skipped():
    """Legal 0xFF fill bytes preceding a marker (T.81 B.1.1.2) decode
    transparently."""
    img = np.full((8, 8, 3), 77, np.uint8)
    p = encode_jpeg(img, lossless_tables=True)
    i = p.find(b"\xff\xc0")
    assert np.array_equal(decode_jpeg(p[:i] + b"\xff\xff\xff" + p[i:]), img)


def test_truncated_payload_raises_cleanly():
    """Cutting the stream anywhere raises ValueError — never a crash
    with a raw IndexError, never partial pixels."""
    img = _block_gray(np.array([[10, 240]]))
    p = encode_jpeg(img, lossless_tables=True)
    for cut in (3, len(p) // 4, len(p) // 2, len(p) - 4):
        with pytest.raises(ValueError):
            decode_jpeg(p[:cut])


def test_fill_bytes_before_restart_marker():
    """Fill 0xFFs immediately before an RSTn inside entropy data (also
    legal per B.1.1.2) decode transparently — review r11 finding."""
    rng = np.random.RandomState(21)
    rgb = _block_gray(rng.randint(0, 256, (2, 4)))
    p = encode_jpeg(
        rgb, subsampling="420", lossless_tables=True, restart_interval=1
    )
    sos = p.find(b"\xff\xda")
    for n in range(8):
        rst = p.find(bytes([0xFF, 0xD0 + n]), sos)
        if rst != -1:
            break
    assert rst != -1
    padded = p[:rst] + b"\xff\xff" + p[rst:]
    assert np.array_equal(decode_jpeg(padded), rgb)


# ---- progressive (SOF2) — round 12 ------------------------------------

from tile_processor_spark.multimodal.jpeg import encode_jpeg_progressive


def test_progressive_gray_constant_blocks_bit_exact():
    """The gate exactness lever holds for progressive streams too:
    constant 8x8 gray blocks + all-ones tables round-trip exactly."""
    rng = np.random.RandomState(7)
    rgb = _block_gray(rng.randint(0, 256, (3, 5)))
    p = encode_jpeg_progressive(rgb, lossless_tables=True, grayscale=True)
    assert np.array_equal(decode_jpeg(p), rgb)
    p = encode_jpeg_progressive(rgb, lossless_tables=True)
    assert np.array_equal(decode_jpeg(p), rgb)


@pytest.mark.parametrize("sub,shape", [("444", (48, 64)), ("420", (32, 48))])
def test_progressive_decodes_identical_to_baseline(sub, shape):
    """Entropy coding is lossless, so a progressive stream of the same
    quantized coefficients must decode to BIT-IDENTICAL pixels as the
    baseline stream — one equality that exercises every progressive
    path at once (interleaved DC, spectral splits, successive
    approximation, EOB runs, ZRL, refinement corrections)."""
    rng = np.random.RandomState(11)
    px = rng.randint(0, 256, shape + (3,)).astype(np.uint8)
    base = decode_jpeg(encode_jpeg(px, sub))
    prog = decode_jpeg(encode_jpeg_progressive(px, sub))
    assert np.array_equal(base, prog)


def test_progressive_restart_markers():
    rng = np.random.RandomState(13)
    px = rng.randint(0, 256, (32, 48, 3)).astype(np.uint8)
    base = decode_jpeg(encode_jpeg(px, "420"))
    for rst in (1, 3, 7):
        p = encode_jpeg_progressive(px, "420", restart_interval=rst)
        assert b"\xff\xdd" in p  # DRI present
        assert np.array_equal(decode_jpeg(p), base)


def test_progressive_spectral_only_script():
    """Spectral selection without successive approximation (Ah=Al=0
    everywhere) is also legal progressive; exercises the first-scan
    paths with no refinement at all."""
    rng = np.random.RandomState(17)
    px = rng.randint(0, 256, (16, 24, 3)).astype(np.uint8)
    scans = [
        {"comps": [0, 1, 2], "ss": 0, "se": 0, "ah": 0, "al": 0},
        {"comps": [0], "ss": 1, "se": 9, "ah": 0, "al": 0},
        {"comps": [0], "ss": 10, "se": 63, "ah": 0, "al": 0},
        {"comps": [1], "ss": 1, "se": 63, "ah": 0, "al": 0},
        {"comps": [2], "ss": 1, "se": 63, "ah": 0, "al": 0},
    ]
    base = decode_jpeg(encode_jpeg(px, "444"))
    prog = decode_jpeg(encode_jpeg_progressive(px, "444", scans=scans))
    assert np.array_equal(base, prog)


def test_progressive_redefines_huffman_tables_between_scans():
    """The encoder emits a fresh DHT before every Huffman-coded scan
    (same table id), so the decoder's between-scan table redefinition
    is continuously exercised."""
    rng = np.random.RandomState(19)
    px = rng.randint(0, 256, (16, 16, 3)).astype(np.uint8)
    p = encode_jpeg_progressive(px)
    n_dht = p.count(b"\xff\xc4")
    n_sos = p.count(b"\xff\xda")
    assert n_sos == 10  # the default color scan script
    assert n_dht >= n_sos - 1  # all but the raw-bit DC refinement scan


def test_progressive_truncation_raises_cleanly():
    rng = np.random.RandomState(23)
    px = rng.randint(0, 256, (16, 16, 3)).astype(np.uint8)
    p = encode_jpeg_progressive(px)
    for cut in (len(p) // 4, len(p) // 2, len(p) - 6):
        with pytest.raises(ValueError):
            decode_jpeg(p[:cut])


def test_progressive_fuzz_identity_sweep():
    """Seeded sweep of the decode-identity property across shapes,
    subsampling, and restart intervals."""
    for seed in range(4):
        rng = np.random.RandomState(100 + seed)
        for shape, sub in (((16, 16), "444"), ((32, 16), "420")):
            px = rng.randint(0, 256, shape + (3,)).astype(np.uint8)
            base = decode_jpeg(encode_jpeg(px, sub))
            for rst in (0, 2):
                prog = decode_jpeg(
                    encode_jpeg_progressive(px, sub, restart_interval=rst)
                )
                assert np.array_equal(base, prog), (seed, shape, sub, rst)


def test_progressive_deep_approximation_chain():
    """Al=3→0 successive approximation with narrow spectral slices and
    restarts — the longest refinement chain the scan-script grammar
    allows, still bit-identical to baseline."""
    scans = [
        {"comps": [0, 1, 2], "ss": 0, "se": 0, "ah": 0, "al": 3},
        {"comps": [0], "ss": 1, "se": 2, "ah": 0, "al": 3},
        {"comps": [0], "ss": 3, "se": 17, "ah": 0, "al": 3},
        {"comps": [0], "ss": 18, "se": 63, "ah": 0, "al": 3},
        {"comps": [1], "ss": 1, "se": 63, "ah": 0, "al": 2},
        {"comps": [2], "ss": 1, "se": 63, "ah": 0, "al": 2},
        {"comps": [0, 1, 2], "ss": 0, "se": 0, "ah": 3, "al": 2},
        {"comps": [0, 1, 2], "ss": 0, "se": 0, "ah": 2, "al": 1},
        {"comps": [0, 1, 2], "ss": 0, "se": 0, "ah": 1, "al": 0},
        {"comps": [0], "ss": 1, "se": 63, "ah": 3, "al": 2},
        {"comps": [0], "ss": 1, "se": 63, "ah": 2, "al": 1},
        {"comps": [0], "ss": 1, "se": 63, "ah": 1, "al": 0},
        {"comps": [1], "ss": 1, "se": 63, "ah": 2, "al": 1},
        {"comps": [1], "ss": 1, "se": 63, "ah": 1, "al": 0},
        {"comps": [2], "ss": 1, "se": 63, "ah": 2, "al": 1},
        {"comps": [2], "ss": 1, "se": 63, "ah": 1, "al": 0},
    ]
    rng = np.random.RandomState(29)
    px = rng.randint(0, 256, (24, 32, 3)).astype(np.uint8)
    base = decode_jpeg(encode_jpeg(px, "444"))
    for rst in (0, 4):
        prog = decode_jpeg(
            encode_jpeg_progressive(px, "444", scans=scans, restart_interval=rst)
        )
        assert np.array_equal(base, prog)


def test_progressive_unconsumed_entropy_refuses():
    """Review r12: leftover non-fill bytes between the decoded scan and
    the next marker mean the decoder and the stream disagree about
    where entropy data ends (e.g. a corrupt early-EOB symbol) — refuse
    loudly instead of resynchronizing to wrong pixels."""
    rng = np.random.RandomState(31)
    px = rng.randint(0, 256, (16, 16, 3)).astype(np.uint8)
    p = encode_jpeg_progressive(px)
    # inject plain garbage right before the EOI
    eoi = p.rfind(b"\xff\xd9")
    doctored = p[:eoi] + b"\x55\x2a\x3c" + p[eoi:]
    with pytest.raises(ValueError):
        decode_jpeg(doctored)


def test_progressive_midstream_rstn_refuses_with_valueerror():
    """An RSTn arriving mid-MCU in a progressive scan (corruption / DRI
    mismatch) must surface the documented ValueError, never the bit
    reader's internal _RestartMarker control-flow exception — pinned at
    the SCAN level, not just the decode_jpeg wrapper (ADVICE r12)."""
    rng = np.random.default_rng(7)
    rgb = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    payload = bytearray(encode_jpeg_progressive(rgb, restart_interval=4))
    sos = payload.find(b"\xff\xda")
    hit = 0
    for off in (60, 90, 150, 220, 300):
        p = bytearray(payload)
        p[sos + off : sos + off] = b"\xff\xd5"
        try:
            decode_jpeg(bytes(p))
        except ValueError:
            hit += 1
        # any other exception type fails the test by propagating
    assert hit >= 2  # several injection points must land in entropy data


# ------------------------------------------------------- 4-component CMYK


def _cmyk_blocks(rng, blocks_hw=(2, 4)):
    base = rng.integers(0, 256, (*blocks_hw, 4), dtype=np.uint8)
    return np.repeat(np.repeat(base, 8, 0), 8, 1)


def _expected_rgb_from_inks(inks):
    """Independent recomputation of the documented CMYK→RGB contract:
    r = round((255-C)(255-K)/255) — integer formula, no .5 ties (255
    odd)."""
    t = inks.astype(np.int64)
    c, m, y, k = (t[..., i] for i in range(4))
    def ch(ink):
        return (2 * (255 - ink) * (255 - k) + 255) // 510
    return np.stack([ch(c), ch(m), ch(y)], -1).astype(np.uint8)


def test_cmyk_adobe_transform0_block_constant_exact():
    from tile_processor_spark.multimodal.jpeg import encode_jpeg_cmyk

    rng = np.random.default_rng(11)
    inks = _cmyk_blocks(rng)
    got = decode_jpeg(encode_jpeg_cmyk(inks, transform=0, lossless_tables=True))
    assert np.array_equal(got, _expected_rgb_from_inks(inks))


def test_ycck_transform2_within_color_rounding():
    from tile_processor_spark.multimodal.jpeg import encode_jpeg_cmyk

    rng = np.random.default_rng(12)
    inks = _cmyk_blocks(rng)
    got = decode_jpeg(encode_jpeg_cmyk(inks, transform=2, lossless_tables=True))
    exp = _expected_rgb_from_inks(inks)
    # YCbCr forward+inverse rounds each channel at most ±1 on
    # block-constant content (DCT itself is exact)
    assert np.abs(got.astype(int) - exp.astype(int)).max() <= 1


def test_markerless_4component_decodes_as_plain_inks():
    from tile_processor_spark.multimodal.jpeg import encode_jpeg_cmyk

    rng = np.random.default_rng(13)
    inks = _cmyk_blocks(rng)
    got = decode_jpeg(
        encode_jpeg_cmyk(inks, transform=0, lossless_tables=True,
                         adobe_marker=False)
    )
    # without APP14 the samples are NOT inverted: r=(255-C)(255-K)/255
    # over the stored (=actual) inks — same formula, same expectation
    assert np.array_equal(got, _expected_rgb_from_inks(inks))


def test_cmyk_lossy_tables_still_close():
    from tile_processor_spark.multimodal.jpeg import encode_jpeg_cmyk

    rng = np.random.default_rng(14)
    inks = _cmyk_blocks(rng)
    got = decode_jpeg(encode_jpeg_cmyk(inks, transform=0))
    exp = _expected_rgb_from_inks(inks)
    assert np.abs(got.astype(int) - exp.astype(int)).max() <= 8


def test_cmyk_encoder_refusals():
    from tile_processor_spark.multimodal.jpeg import encode_jpeg_cmyk

    rng = np.random.default_rng(15)
    with pytest.raises(ValueError, match="H×W×4"):
        encode_jpeg_cmyk(rng.integers(0, 256, (16, 32, 3), dtype=np.uint8))
    with pytest.raises(ValueError, match="transform"):
        encode_jpeg_cmyk(_cmyk_blocks(rng), transform=1)
    with pytest.raises(ValueError, match="Adobe marker"):
        encode_jpeg_cmyk(_cmyk_blocks(rng), transform=2, adobe_marker=False)
    with pytest.raises(ValueError, match="multiples of 8"):
        encode_jpeg_cmyk(rng.integers(0, 256, (12, 32, 4), dtype=np.uint8))
