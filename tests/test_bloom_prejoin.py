"""Bloom filter as a pre-join existence filter — the claim in
sketch_bloom_membership's docstring made measurable: a fact-side
filter built from the dim side's bloom words prunes most non-matching
rows BEFORE the shuffle join, without changing the join's result."""

from __future__ import annotations

from pyspark.sql import functions as F

from tile_processor_spark.plans.llm_ops import hash32
from tile_processor_spark.plans.sketches import (
    BLOOM_BITS,
    BLOOM_K,
    BLOOM_WORD_BITS,
)
from tile_processor_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _positions(df, key):
    js = F.array(*[F.lit(j) for j in range(BLOOM_K)])
    return df.select(F.explode(js).alias("j"), "*").select(
        "*",
        (
            hash32(F.concat(F.lit("bf"), F.col("j").cast("string"), F.lit("#"), F.col(key)))
            % BLOOM_BITS
        ).alias("pos"),
    )


def test_bloom_prefilter_prunes_without_changing_join(spark):
    li = load_table(spark, "lineitem", SF)
    # selective dim: suppliers from one nation
    supp = load_table(spark, "supplier", SF).filter(F.col("s_nationkey") == 3)
    dim_keys = supp.select(F.col("s_suppkey").cast("string").alias("key"))

    # build the bloom words driver-side (128 ints — broadcastable literal)
    bits = {}
    for r in _positions(dim_keys, "key").collect():
        widx, bit = r.pos // BLOOM_WORD_BITS, r.pos % BLOOM_WORD_BITS
        bits[widx] = bits.get(widx, 0) | (1 << bit)

    # fact-side membership predicate: all k positions set
    key = F.col("l_suppkey").cast("string")
    pred = F.lit(True)
    word_arr = F.array(*[F.lit(bits.get(i, 0)) for i in range(BLOOM_BITS // BLOOM_WORD_BITS)])
    for j in range(BLOOM_K):
        pos = hash32(F.concat(F.lit(f"bf{j}#"), key)) % BLOOM_BITS
        word = F.element_at(word_arr, (pos / BLOOM_WORD_BITS).cast("int") + 1)
        mask = F.pow(F.lit(2.0), (pos % BLOOM_WORD_BITS).cast("double")).cast("long")
        pred = pred & (word.bitwiseAND(mask) != 0)

    filtered = li.filter(pred)
    n_all, n_filtered = li.count(), filtered.count()
    n_true = li.join(supp, li["l_suppkey"] == supp["s_suppkey"], "left_semi").count()
    # no false negatives: every truly-matching row survives the filter
    assert n_filtered >= n_true
    # and the filter genuinely prunes (dim is ~1/25 of suppliers)
    assert n_filtered < n_all * 0.5, (n_filtered, n_all)
    # join result identical through the prefilter
    want = sorted(
        r.l_orderkey
        for r in li.join(supp, li["l_suppkey"] == supp["s_suppkey"]).select("l_orderkey").collect()
    )
    got = sorted(
        r.l_orderkey
        for r in filtered.join(supp, filtered["l_suppkey"] == supp["s_suppkey"]).select("l_orderkey").collect()
    )
    assert got == want
