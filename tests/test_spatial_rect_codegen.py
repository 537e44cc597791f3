"""Round-16 §2 equivalence pins: the rect-ring ray-cast → half-open box
identity and the Catalyst-compiled literal ray cast.

The optimization replaced per-pair Python (ArrowEvalPython) refines with
whole-stage-codegen comparisons on two paths:

- ``points_in_polygons(..., rects=True)``: for ``st_rect`` rings the
  even-odd ray cast reduces algebraically to
  ``xmin <= x < xmax AND ymin <= y < ymax``. The claim is an identity
  for EVERY input, boundaries included — so the tests here put points
  exactly on corners and edges on purpose.
- ``st_contains_point_ring``: the same ray cast as
  ``kernel.points_in_ring`` compiled to Catalyst expressions (same
  float64 operations, same order), for literal extent rings.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from tile_processor_spark.spatial import kernel
from tile_processor_spark.spatial.join import (
    points_in_polygons,
    st_contains_point_ring,
)
from tile_processor_spark.spatial.wkb import rect_wkb

RECT = (2.0, 3.0, 7.0, 9.0)  # xmin, ymin, xmax, ymax


def _rect_ring(xmin, ymin, xmax, ymax) -> np.ndarray:
    # same vertex order as wkb.rect_wkb, closed for points_in_ring
    return np.array(
        [[xmin, ymin], [xmax, ymin], [xmax, ymax], [xmin, ymax], [xmin, ymin]],
        dtype=np.float64,
    )


def _probe_points() -> tuple[np.ndarray, np.ndarray]:
    """3015 probe points: a half-integer lattice over [0,10]² whose lines
    pass EXACTLY through the rect's corners and edges (441 points), plus
    2574 seeded uniform points."""
    grid = np.arange(0.0, 10.5, 0.5)
    gx, gy = np.meshgrid(grid, grid)
    rng = np.random.default_rng(42)
    rx = rng.uniform(-1.0, 11.0, 2574)
    ry = rng.uniform(-1.0, 11.0, 2574)
    xs = np.concatenate([gx.ravel(), rx])
    ys = np.concatenate([gy.ravel(), ry])
    assert xs.size == 3015
    return xs, ys


def test_rect_ray_cast_equals_half_open_box_including_boundaries():
    xmin, ymin, xmax, ymax = RECT
    xs, ys = _probe_points()
    ray = kernel.points_in_ring(_rect_ring(*RECT), xs, ys)
    box = (xs >= xmin) & (xs < xmax) & (ys >= ymin) & (ys < ymax)
    assert (ray == box).all(), np.argwhere(ray != box)[:5]
    # the lattice hits every boundary class: corners, all four edges
    on_left = (xs == xmin) & (ys > ymin) & (ys < ymax)
    on_right = (xs == xmax) & (ys > ymin) & (ys < ymax)
    on_bottom = (ys == ymin) & (xs > xmin) & (xs < xmax)
    on_top = (ys == ymax) & (xs > xmin) & (xs < xmax)
    for mask in (on_left, on_right, on_bottom, on_top):
        assert mask.any()
    assert ray[on_left].all() and ray[on_bottom].all()       # closed sides
    assert not ray[on_right].any() and not ray[on_top].any()  # open sides


# an irregular pentagon plus one HORIZONTAL edge (compile-time skipped)
PENTAGON = [(0.0, 0.0), (8.0, 0.0), (10.0, 5.0), (4.0, 9.0), (-2.0, 4.0)]


def test_st_contains_point_ring_matches_python_kernel(spark):
    rng = np.random.default_rng(7)
    xs = rng.uniform(-4.0, 12.0, 4000)
    # include rows exactly at vertex y-levels (the crosses tie-break)
    ys = rng.uniform(-2.0, 11.0, 4000)
    ys[:5] = [0.0, 5.0, 9.0, 4.0, 0.0]
    ring = np.array(PENTAGON + [PENTAGON[0]], dtype=np.float64)
    expected = kernel.points_in_ring(ring, xs, ys)
    df = spark.createDataFrame(pd.DataFrame({"i": np.arange(4000), "x": xs, "y": ys}))
    got = (
        df.withColumn("ok", st_contains_point_ring(PENTAGON, F.col("x"), F.col("y")))
        .orderBy("i")
        .select("ok")
        .toPandas()["ok"]
        .to_numpy()
    )
    assert (got == expected).all(), int((got != expected).sum())


@pytest.fixture()
def _tiles_and_points(spark):
    tiles = pd.DataFrame(
        {
            "tile_id": ["a", "b", "c"],
            "xmin": [0.0, 5.0, 2.5],
            "ymin": [0.0, 0.0, 5.0],
            "xmax": [5.0, 10.0, 7.5],
            "ymax": [5.0, 5.0, 10.0],
        }
    )
    polys = (
        spark.createDataFrame(tiles)
        .withColumn(
            "geom",
            F.udf(lambda a, b, c, d: rect_wkb(a, b, c, d), "binary")(
                "xmin", "ymin", "xmax", "ymax"
            ),
        )
    )
    rng = np.random.default_rng(11)
    px = rng.uniform(-1.0, 11.0, 600)
    py = rng.uniform(-1.0, 11.0, 600)
    # boundary probes: shared tile edge x=5, corners, and tile-c edges
    px[:6] = [5.0, 5.0, 0.0, 2.5, 7.5, 5.0]
    py[:6] = [2.0, 5.0, 0.0, 5.0, 10.0, 0.0]
    pts = spark.createDataFrame(
        pd.DataFrame({"pid": np.arange(600), "x": px, "y": py})
    )
    return pts, polys


def test_points_in_polygons_rects_path_matches_general_kernel(_tiles_and_points):
    pts, polys = _tiles_and_points
    fast = points_in_polygons(pts, polys, cell_size=4.0, rects=True)
    slow = points_in_polygons(pts, polys, cell_size=4.0, rects=False)
    key = ["pid", "tile_id"]
    a = sorted(map(tuple, fast.select(*key).collect()))
    b = sorted(map(tuple, slow.select(*key).collect()))
    assert a == b
    assert len(a) > 0
    # half-open semantics: a point on the shared edge x=5 joins tile b only
    on_edge = [t for p, t in a if p == 0]
    assert on_edge == ["b"]
