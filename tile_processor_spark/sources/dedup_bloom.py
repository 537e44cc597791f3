"""Bloom-filter sidecar for the incremental-dedup fingerprint table —
the piece that makes the per-version history check O(delta) instead of
O(history).

The fingerprint table is the exact kept-set; the sidecar is a LOSSY
SUPERSET of it (a Bloom filter has false positives, never false
negatives), versioned against the fingerprint table: ``state-v{N}``
is valid only while the table head is version ``N``. The dedup loop
uses it as a prescreen — a delta fingerprint the bloom rejects is
PROVABLY new and never touches history at all; the (few) maybe-present
candidates are verified exactly against a stats-pruned file subset.
Correctness therefore never depends on the sidecar: missing, stale, or
torn state just degrades to the exact full anti-join.

Shape: k=4 probe positions per fingerprint, taken from the 4 32-bit
words of ``md5(fp)`` (re-hashing keeps arbitrary caller fingerprints
uniform), each mod a power-of-two ``m``. At the default 16 bits per
element the false-positive rate is ~0.24%, so a 10k-row delta yields
~25 spurious candidates — the exact-verify stage stays tiny. Bits are
built DISTRIBUTED (positions computed JVM-side, per-partition bitmaps
OR-ed on the driver) and updates fold in only the delta's survivors;
a full rebuild happens only on staleness or capacity doubling
(geometric, so amortized O(1) per kept row). At 10B+ kept rows the
single bitmap (~20 GB) would need sharding by fingerprint prefix —
out of scope here; the state file records ``m`` so a reader can tell.

Durability: the state file is written tmp + ``os.replace`` next to the
table. It is a CACHE — on an object store without atomic replace, a
torn or lost write is detected by the version check and rebuilt.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_BLOOM_DIR = "_dedup_bloom"
_K = 4
_BITS_PER_ELEMENT = 16
_MIN_CAPACITY = 1 << 17  # 128k elements → 256 KiB bitmap floor


@dataclass
class DedupBloom:
    m: int  # bitmap size in bits (power of two)
    n: int  # elements inserted
    capacity: int  # rebuild threshold
    fp_version: int  # fingerprint-table version this state reflects
    bits: np.ndarray  # uint8[m // 8]
    #: rows in the table when it was last range-clustered — drives the
    #: geometric auto_cluster schedule; 0 = never/unknown (a rebuild
    #: sets it to the current n, deferring the next rewrite one
    #: doubling rather than triggering a spurious one)
    clustered_n: int = 0


def _state_path(fp_path: str, version: int) -> str:
    return os.path.join(
        os.path.abspath(fp_path), _BLOOM_DIR, f"state-v{version}.npz"
    )


def _capacity_for(n: int) -> int:
    cap = _MIN_CAPACITY
    while cap < 2 * n:
        cap *= 2
    return cap


def _m_for(capacity: int) -> int:
    m = 1
    while m < capacity * _BITS_PER_ELEMENT:
        m *= 2
    return m


def _position_cols(df: DataFrame, m: int) -> DataFrame:
    """Append probe-position columns ``_p0.._p3`` for the ``fp``
    column, JVM-side: the 4 32-bit words of md5(fp), each mod m.
    (m is a power of two, so ``% m`` is a mask — but `pmod` keeps the
    expression portable and the planner folds it anyway.)"""
    h = F.md5(F.col("fp"))
    out = df
    for w in range(_K):
        word = F.conv(F.substring(h, 1 + 8 * w, 8), 16, 10).cast("long")
        out = out.withColumn(f"_p{w}", word % F.lit(m))
    return out


def _collect_bits(df_fp: DataFrame, m: int) -> np.ndarray:
    """Distributed bitmap build: per Spark partition a uint8 bitmap of
    the partition's probe positions, OR-ed on the driver. Transfers
    one m/8-byte array per partition — the delta is coalesced small by
    the caller; rebuilds pay partitions × bitmap once."""
    mb = m // 8
    pos_df = _position_cols(df_fp.select("fp"), m).drop("fp")

    def _bitmaps(it):
        bits = np.zeros(mb, dtype=np.uint8)
        seen = False
        for pdf in it:
            if not len(pdf):
                continue
            seen = True
            for w in range(_K):
                p = pdf[f"_p{w}"].to_numpy(dtype=np.int64)
                np.bitwise_or.at(bits, p >> 3, (1 << (p & 7)).astype(np.uint8))
        if seen:
            yield pd.DataFrame({"bm": [bits.tobytes()]})

    out = np.zeros(mb, dtype=np.uint8)
    for row in pos_df.mapInPandas(_bitmaps, "bm binary").collect():
        out |= np.frombuffer(row.bm, dtype=np.uint8)
    return out


def load_bloom(fp_path: str, fp_version: int) -> DedupBloom | None:
    """The sidecar state for EXACTLY this fingerprint-table version, or
    None (missing / stale / unreadable → caller rebuilds or skips)."""
    path = _state_path(fp_path, fp_version)
    try:
        with np.load(path) as z:
            meta = json.loads(str(z["meta"]))
            bits = z["bits"]
    except (OSError, KeyError, ValueError):
        return None
    if (
        meta.get("fp_version") != fp_version
        or len(bits) * 8 != meta.get("m")
        or meta.get("k") != _K
    ):
        # a k mismatch means DIFFERENT probe positions: the bitmap
        # would yield Bloom FALSE NEGATIVES (missed duplicates), the
        # one failure mode the design forbids — rebuild instead
        return None
    return DedupBloom(
        m=int(meta["m"]),
        n=int(meta["n"]),
        capacity=int(meta["capacity"]),
        fp_version=int(fp_version),
        bits=bits,
        clustered_n=int(meta.get("clustered_n", 0)),
    )


def save_bloom(fp_path: str, bloom: DedupBloom) -> None:
    """Publish the state for ``bloom.fp_version``; best-effort removal
    of states for other versions (they can never be valid again)."""
    d = os.path.join(os.path.abspath(fp_path), _BLOOM_DIR)
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, f".tmp-{uuid.uuid4().hex}.npz")
    meta = json.dumps(
        {
            "m": bloom.m,
            "n": bloom.n,
            "capacity": bloom.capacity,
            "fp_version": bloom.fp_version,
            "k": _K,
            "clustered_n": bloom.clustered_n,
        }
    )
    with open(tmp, "wb") as f:
        np.savez(f, bits=bloom.bits, meta=np.array(meta))
    final = _state_path(fp_path, bloom.fp_version)
    os.replace(tmp, final)
    for name in os.listdir(d):
        if name.startswith("state-v") and os.path.join(d, name) != final:
            try:
                os.unlink(os.path.join(d, name))
            except OSError:
                pass


def build_bloom(
    spark: SparkSession,
    fp_path: str,
    fp_version: int,
    kept_fps: DataFrame,
    n_kept: int,
) -> DedupBloom:
    """Full rebuild from the exact kept-set (O(history), paid only on
    staleness or capacity doubling)."""
    capacity = _capacity_for(n_kept)
    m = _m_for(capacity)
    bits = _collect_bits(kept_fps, m) if n_kept else np.zeros(
        m // 8, dtype=np.uint8
    )
    return DedupBloom(
        m=m, n=n_kept, capacity=capacity, fp_version=fp_version, bits=bits,
        clustered_n=n_kept,
    )


def fold_in(bloom: DedupBloom, survivors_fps: DataFrame, n_new: int,
            new_version: int) -> DedupBloom:
    """The post-commit update: OR the survivors' bits into the bitmap
    and advance the version stamp. The caller rebuilds instead when
    ``n + n_new`` would exceed capacity."""
    bits = bloom.bits
    if n_new:
        bits = bits | _collect_bits(survivors_fps.coalesce(1), bloom.m)
    return DedupBloom(
        m=bloom.m,
        n=bloom.n + n_new,
        capacity=bloom.capacity,
        fp_version=new_version,
        bits=bits,
        clustered_n=bloom.clustered_n,
    )


def with_maybe_kept(
    df: DataFrame, bloom: DedupBloom, _bc_out: list | None = None
) -> DataFrame:
    """``df`` (with an ``fp`` column) plus boolean ``_maybe_kept``:
    False PROVES the fingerprint is not in the kept-set; True means
    verify exactly. Positions are computed JVM-side; the bit test is a
    vectorized Arrow-batched pandas UDF over the broadcast bitmap.

    ``_bc_out`` receives the Broadcast handle so a long-running loop
    (one bitmap per version) can ``destroy()`` it deterministically
    once the version's actions finish, instead of waiting on GC +
    ContextCleaner to release executor memory."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(bloom.bits)
    if _bc_out is not None:
        _bc_out.append(bc)

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("boolean")
    def _test(p0: pd.Series, p1: pd.Series, p2: pd.Series,
              p3: pd.Series) -> pd.Series:
        bits = bc.value
        ok = np.ones(len(p0), dtype=bool)
        for p in (p0, p1, p2, p3):
            a = p.to_numpy(dtype=np.int64)
            ok &= (bits[a >> 3] & (1 << (a & 7)).astype(np.uint8)) != 0
        return pd.Series(ok)

    out = _position_cols(df, bloom.m)
    return out.withColumn(
        "_maybe_kept", _test("_p0", "_p1", "_p2", "_p3")
    ).drop(*[f"_p{w}" for w in range(_K)])
