"""Round-16 §1 equivalence pin: the scaled-long money arithmetic.

``relational._cents`` claims ``floor(x·100 + 0.5)`` recovers EXACTLY the
integer the HALF_UP ``decimal(12,2)`` cast produces for every
non-negative double whose true magnitude is an exact 2-dp decimal (the
domain of all the money/measure columns it touches), and that the
``_sum_scaled``/``_revenue_c`` aggregation yields the identical double
the decimal formulation yields. These tests pin the identity
exhaustively over a cent range and end-to-end through a Spark aggregate.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from tile_processor_spark.plans.relational import _cents, _revenue_c, _sum_scaled


def test_cents_equals_half_up_decimal_cast_exhaustive():
    """Every 2-dp value in [0, 20000.00): the double round-trip is
    ~1e-9 ulp from the rational — floor(x·100 + 0.5) can never land on
    the wrong side of a half-cent. 2M cases cover > the full TPC-H
    l_extendedprice magnitude span; l_discount/l_tax live in [0, 0.10]."""
    cents = np.arange(0, 2_000_000, dtype=np.int64)
    doubles = cents / 100.0  # the generator's exact-2-dp-as-double encoding
    got = np.floor(doubles * 100 + 0.5).astype(np.int64)
    assert (got == cents).all(), np.argwhere(got != cents)[:5]


def test_cents_spot_checks_match_decimal_half_up():
    for v in (0.0, 0.01, 0.05, 0.1, 0.29, 1.13, 70.0, 999.99, 9999.95, 104949.5):
        expected = int(
            (Decimal(v).quantize(Decimal("0.01"), rounding=ROUND_HALF_UP) * 100)
        )
        got = int(np.floor(v * 100 + 0.5))
        assert got == expected, (v, got, expected)


def test_scaled_long_aggregate_matches_decimal_formulation(spark):
    """End-to-end: q1's sum_disc_price/sum_charge algebra on seeded
    2-dp data — the scaled-long plan must produce the bit-identical
    double of the decimal(12,2) formulation it replaced."""
    rng = np.random.default_rng(3)
    n = 20_000
    pdf = pd.DataFrame(
        {
            "g": rng.integers(0, 4, n),
            "l_extendedprice": rng.integers(100, 10_000_000, n) / 100.0,
            "l_discount": rng.integers(0, 11, n) / 100.0,
            "l_tax": rng.integers(0, 9, n) / 100.0,
        }
    )
    df = spark.createDataFrame(pdf)
    dec = (
        df.groupBy("g")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(12,2)")
                * (F.lit(1).cast("decimal(3,2)") - F.col("l_discount").cast("decimal(3,2)"))
            )
            .cast("double")
            .alias("disc"),
            F.sum(
                F.col("l_extendedprice").cast("decimal(12,2)")
                * (F.lit(1).cast("decimal(3,2)") - F.col("l_discount").cast("decimal(3,2)"))
                * (F.lit(1).cast("decimal(3,2)") + F.col("l_tax").cast("decimal(3,2)"))
            )
            .cast("double")
            .alias("charge"),
        )
        .orderBy("g")
        .collect()
    )
    scaled = (
        df.groupBy("g")
        .agg(
            _sum_scaled(_revenue_c(), 4, "disc"),
            _sum_scaled(
                _revenue_c() * (F.lit(100) + _cents(F.col("l_tax"))), 6, "charge"
            ),
        )
        .orderBy("g")
        .collect()
    )
    for a, b in zip(dec, scaled):
        assert a["g"] == b["g"]
        assert a["disc"] == b["disc"], (a, b)       # bit-identical doubles
        assert a["charge"] == b["charge"], (a, b)
