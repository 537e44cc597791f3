"""Property-based cross-checks for the sketch kernels: Spark register
computation vs an independent pure-Python md5 mirror, over randomized
key sets — the sketch twin of the k-means NumPy mirror test.

All hypothesis cases are packed into ONE DataFrame keyed by case_id so
the whole suite costs a handful of Spark jobs, not jobs-per-example."""

from __future__ import annotations

import hashlib

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from tile_processor_spark.plans.sketches import (
    BLOOM_BITS,
    BLOOM_K,
    BLOOM_WORD_BITS,
    HLL_REM_BITS,
    hll_registers,
)

words = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd")),
    min_size=1,
    max_size=12,
)
word_sets = st.lists(words, min_size=1, max_size=40, unique=True)


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _py_hll_registers(keys):
    regs: dict[int, int] = {}
    for k in keys:
        h = _h32("hll#" + k)
        idx = h >> HLL_REM_BITS
        rem = h % (1 << HLL_REM_BITS)
        rho = (HLL_REM_BITS + 1) if rem == 0 else HLL_REM_BITS + 1 - rem.bit_length()
        regs[idx] = max(regs.get(idx, 0), rho)
    return sorted(regs.items())


def test_hll_registers_match_pure_python_mirror(spark):
    cases = []
    # deterministic pseudo-random corpus of cases (no hypothesis needed
    # for the Spark side: one job covers many cases)
    import random

    rng = random.Random(42)
    for cid in range(25):
        n = rng.randint(1, 60)
        cases.append((cid, [f"w{rng.randint(0, 10_000)}" for _ in range(n)]))
    rows = [(cid, w) for cid, ws in cases for w in set(ws)]
    df = spark.createDataFrame(rows, "case_id long, word string")
    # per-case registers in ONE job
    got_rows = (
        df.select(
            "case_id",
            (F.conv(F.substring(F.md5(F.concat(F.lit("hll#"), F.col("word"))), 1, 8), 16, 10).cast("long")).alias("h"),
        )
        .select(
            "case_id",
            (F.col("h") / (1 << HLL_REM_BITS)).cast("long").alias("idx"),
            F.when(F.col("h") % (1 << HLL_REM_BITS) == 0, F.lit(HLL_REM_BITS + 1))
            .otherwise(
                F.lit(HLL_REM_BITS + 1)
                - F.length(F.bin(F.col("h") % (1 << HLL_REM_BITS)))
            )
            .alias("rho"),
        )
        .groupBy("case_id", "idx")
        .agg(F.max("rho").cast("long").alias("m"))
        .collect()
    )
    got: dict[int, list] = {}
    for r in got_rows:
        got.setdefault(r.case_id, []).append((r.idx, r.m))
    for cid, ws in cases:
        assert sorted(got[cid]) == _py_hll_registers(sorted(set(ws))), cid


@settings(max_examples=60, deadline=None)
@given(ws=word_sets)
def test_hll_register_function_pure(ws):
    """The python mirror itself is internally consistent: register
    count <= min(64, n), every rho in [1, 27]."""
    regs = _py_hll_registers(ws)
    assert len(regs) <= min(64, len(ws))
    assert all(1 <= m <= HLL_REM_BITS + 1 for _, m in regs)


def test_hll_registers_df_matches_mirror_on_events(spark):
    from tile_processor_spark.sources.tables import load_table

    ev = load_table(spark, "events", "/root/testdata/sf0.001")
    keys = ev.select(F.col("user_id").cast("string").alias("k")).filter(
        F.col("k").isNotNull()
    ).distinct()
    got = sorted((r.idx, r.m) for r in hll_registers(keys, "k").collect())
    pys = _py_hll_registers([r.k for r in keys.collect()])
    assert got == pys


def test_bloom_no_false_negatives_property(spark):
    """Every inserted key must hit — the Bloom contract that can never
    be violated regardless of hash family or packing; checked over a
    randomized vocabulary in one job."""
    import random

    rng = random.Random(7)
    vocab = list({f"v{rng.randint(0, 50_000)}" for _ in range(300)})
    df = spark.createDataFrame([(w,) for w in vocab], "word string")

    def pos(j, w):
        return _h32(f"bf{j}#{w}") % BLOOM_BITS

    bloom: dict[int, int] = {}
    for w in vocab:
        for j in range(BLOOM_K):
            p = pos(j, w)
            widx, bit = p // BLOOM_WORD_BITS, p % BLOOM_WORD_BITS
            bloom[widx] = bloom.get(widx, 0) | (1 << bit)
    # Spark-side set bits must equal the python mirror
    setbits = (
        df.select(F.explode(F.array(*[F.lit(j) for j in range(BLOOM_K)])).alias("j"), "word")
        .select(
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit("bf"), F.col("j").cast("string"), F.lit("#"), F.col("word"))),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("long")
                % BLOOM_BITS
            ).alias("pos")
        )
        .select(
            (F.col("pos") / BLOOM_WORD_BITS).cast("long").alias("widx"),
            F.pow(F.lit(2.0), (F.col("pos") % BLOOM_WORD_BITS).cast("double"))
            .cast("long")
            .alias("mask"),
        )
        .groupBy("widx")
        .agg(F.bit_or("mask").alias("bits"))
        .collect()
    )
    got = {r.widx: r.bits for r in setbits}
    assert got == bloom
    # no false negatives: every vocab word's k positions are set
    for w in vocab:
        for j in range(BLOOM_K):
            p = pos(j, w)
            assert bloom[p // BLOOM_WORD_BITS] >> (p % BLOOM_WORD_BITS) & 1 == 1


def test_kmv_set_estimates_underfull_are_exact(spark):
    # an under-full merged sketch (m < k) saw every distinct key, so the
    # estimators must return the exact counts — the branch the TPC-H
    # corpus never exercises (its key sets are always >= k)
    from tile_processor_spark.plans.sketches import (
        kmv_est_intersection,
        kmv_est_union,
        kmv_jaccard,
    )

    df = spark.createDataFrame(
        [
            # (m, kth_hash, inter_matches): under-full — exact counts
            (10, 123456789, 4),
            # full (m == k == 256): standard estimators
            (256, 2 ** 28, 64),
        ],
        "m long, kth_hash long, inter_matches long",
    )
    rows = {
        r["m"]: r
        for r in df.select(
            "m",
            kmv_est_union(256).alias("u"),
            kmv_est_intersection(256).alias("i"),
            kmv_jaccard().alias("j"),
        ).collect()
    }
    assert rows[10]["u"] == 10.0 and rows[10]["i"] == 4.0 and rows[10]["j"] == 0.4
    full = rows[256]
    assert full["u"] == 255 * 4294967296 / 2 ** 28  # (k-1)*2^32 / h_k
    assert full["i"] == 64 * 255 * 4294967296 / (256 * 2 ** 28)
    assert full["j"] == 64 / 256


def test_rolling_hll_estimate_tracks_truth(spark):
    """rolling_distinct_hll's raw estimate must track the exact rolling
    distinct within sketch error where the raw formula is in its
    accurate regime (n/m >~ 2; well below that raw HLL overestimates
    and a real deployment switches to linear counting — documented in
    the sketch_hll_by_type docstring). 64 registers -> relative sigma
    ~1.04/8 = 13%; assert within 3 sigma on qualifying days, and that
    the gate corpus actually exercises the regime (sf0.01 has 150
    distinct users, n/m ~ 2.3 on saturated windows)."""
    from tile_processor_spark.plans.registry import all_specs
    from tile_processor_spark.plans.sketches import HLL_M

    rows = (
        all_specs()["rolling_distinct_hll"]
        .spark_fn(spark, "/root/testdata/sf0.01")
        .collect()
    )
    assert rows
    qualifying = [r for r in rows if r["true_distinct"] >= 2 * HLL_M]
    assert qualifying, "gate corpus must exercise the accurate regime"
    for r in qualifying:
        rel = abs(r["est_raw"] - r["true_distinct"]) / r["true_distinct"]
        assert rel < 0.39, (r["day_idx"], r["est_raw"], r["true_distinct"])
