"""Unit parity for the dedup-bloom kernels: the JVM-side probe
positions, the distributed bitmap build, and the membership UDF must
all agree with an independent numpy/hashlib recomputation — the
superset invariant the dedup loop's correctness argument leans on."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from tile_processor_spark.sources.dedup_bloom import (
    _BITS_PER_ELEMENT,
    _K,
    _capacity_for,
    _collect_bits,
    _m_for,
    _position_cols,
    build_bloom,
    fold_in,
    load_bloom,
    save_bloom,
    with_maybe_kept,
)


def ref_positions(fp: str, m: int) -> list[int]:
    h = hashlib.md5(fp.encode()).hexdigest()
    return [int(h[8 * w : 8 * w + 8], 16) % m for w in range(_K)]


def test_jvm_positions_match_reference(spark):
    fps = [f"fp-{i}" for i in range(64)] + ["", "ünïcode-fp", "a" * 100]
    df = spark.createDataFrame([(f,) for f in fps], "fp string")
    m = 1 << 20
    got = {
        r["fp"]: [r[f"_p{w}"] for w in range(_K)]
        for r in _position_cols(df, m).collect()
    }
    for f in fps:
        assert got[f] == ref_positions(f, m), f

def test_collect_bits_sets_exactly_the_reference_bits(spark):
    fps = [f"doc:{i}" for i in range(300)]
    m = 1 << 16
    bits = _collect_bits(
        spark.createDataFrame([(f,) for f in fps], "fp string"), m
    )
    expect = np.zeros(m // 8, dtype=np.uint8)
    for f in fps:
        for p in ref_positions(f, m):
            expect[p >> 3] |= 1 << (p & 7)
    assert np.array_equal(bits, expect)


def test_capacity_and_m_sizing():
    assert _capacity_for(0) == 1 << 17
    assert _capacity_for(10**6) >= 2 * 10**6
    m = _m_for(_capacity_for(10**6))
    assert m >= _BITS_PER_ELEMENT * 10**6 and (m & (m - 1)) == 0


def test_sidecar_roundtrip_and_fold(spark, tmp_path):
    df = spark.createDataFrame([(f"x{i}",) for i in range(50)], "fp string")
    b = build_bloom(spark, str(tmp_path), 3, df, 50)
    save_bloom(str(tmp_path), b)
    r = load_bloom(str(tmp_path), 3)
    assert r is not None and r.n == 50 and r.clustered_n == 50
    assert np.array_equal(r.bits, b.bits)
    assert load_bloom(str(tmp_path), 4) is None  # stale stamp
    more = spark.createDataFrame([(f"y{i}",) for i in range(10)], "fp string")
    b2 = fold_in(r, more, 10, 4)
    assert b2.n == 60 and b2.fp_version == 4 and b2.clustered_n == 50
    # folding only ADDS bits (superset preserved)
    assert np.array_equal(b2.bits & b.bits, b.bits)
    flagged = with_maybe_kept(df.union(more), b2)
    assert flagged.filter("NOT _maybe_kept").count() == 0


def test_sidecar_with_different_probe_count_is_rejected(spark, tmp_path):
    """Review r12: a sidecar built with different probe parameters
    would yield Bloom FALSE NEGATIVES — it must fail the stamp check
    and trigger a rebuild, never load."""
    import json

    import tile_processor_spark.sources.dedup_bloom as mod

    df = spark.createDataFrame([("a",), ("b",)], "fp string")
    b = build_bloom(spark, str(tmp_path), 1, df, 2)
    save_bloom(str(tmp_path), b)
    # rewrite the state file claiming k=2
    path = mod._state_path(str(tmp_path), 1)
    with np.load(path) as z:
        meta = json.loads(str(z["meta"]))
        bits = z["bits"]
    meta["k"] = 2
    with open(path, "wb") as f:
        np.savez(f, bits=bits, meta=np.array(json.dumps(meta)))
    assert load_bloom(str(tmp_path), 1) is None
