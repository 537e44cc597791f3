"""Rank-based equivalence for the 100×-scale percentile twin: the
approx variant of ``spatial_percentile_heights`` must return, per tile,
an ACTUAL z value whose rank brackets the target quantile within ±1
order statistic (Greenwald-Khanna at accuracy=10000 returns an exact
order statistic at gate scale; exact ``percentile`` interpolates
BETWEEN the two bracketing statistics, so an absolute-delta compare is
wrong for small tiles). Tile sets and point counts must match exactly.
The exact row keeps the reference semantic (worker.py:158-164) pinned;
this test is the evidence that swapping in the scale plan is
value-safe."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from tile_processor_spark.plans.spatial_gate import (
    spatial_percentile_heights,
    spatial_percentile_heights_approx,
    synthetic_points,
    tile_grid,
)
from tile_processor_spark.spatial.join import points_in_polygons

SF = "/root/testdata/sf0.001"


def _allowed_interval(zs: list[float], p: float) -> tuple[float, float]:
    """[lo, hi] an approx percentile may land in: the order statistics
    one below / one above the interpolation bracket of ``p``."""
    n = len(zs)
    r = p * (n - 1)
    lo_i = max(int(math.floor(r)) - 1, 0)
    hi_i = min(int(math.ceil(r)) + 1, n - 1)
    return zs[lo_i], zs[hi_i]


def test_approx_twin_matches_exact_within_rank_bound(spark):
    exact = spatial_percentile_heights(spark, SF).alias("e")
    approx = spatial_percentile_heights_approx(spark, SF).alias("a")
    j = exact.join(approx, "tile_id", "full").select(
        "tile_id",
        F.col("e.n_points").alias("n_e"),
        F.col("a.n_points").alias("n_a"),
        F.col("a.roof_h").alias("roof_a"),
        F.col("a.ground_h").alias("ground_a"),
    )
    rows = j.collect()
    assert rows, "expected per-tile results"
    # per-tile sorted z values (test scale only) for rank envelopes
    pts = points_in_polygons(synthetic_points(spark, SF), tile_grid(spark), cell_size=80.0)
    z_by_tile = {
        r["tile_id"]: r["zs"]
        for r in pts.groupBy("tile_id")
        .agg(F.sort_array(F.collect_list("z")).alias("zs"))
        .collect()
    }
    for r in rows:
        # identical tile sets + point counts (catches join/filter drift)
        assert r["n_e"] is not None and r["n_a"] is not None, r
        assert r["n_e"] == r["n_a"] == len(z_by_tile[r["tile_id"]]), r
        zs = z_by_tile[r["tile_id"]]
        lo, hi = _allowed_interval(zs, 0.95)
        assert lo <= r["roof_a"] <= hi, (r, lo, hi)
        lo, hi = _allowed_interval(zs, 0.10)
        assert lo <= r["ground_a"] <= hi, (r, lo, hi)
        assert r["roof_a"] >= r["ground_a"], r


def test_approx_twin_plan_uses_approx_aggregate(spark):
    plan = (
        spatial_percentile_heights_approx(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "approx_percentile" in plan or "percentile_approx" in plan
    # the exact buffering aggregate must NOT appear in the scale twin
    assert "percentile(z" not in plan
