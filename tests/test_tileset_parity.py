"""Reference-parity tests: the pinned tile-selection semantics of
tile_processor/tests/test_tiles.py re-created on synthetic grids
(SURVEY.md §5: "port the expected tile-ID sets verbatim as golden
assertions against synthetic tile geometry").

Layout mirrors the reference fixture corpus (FIXTURES.md):
- a 4×4 grid named 25gn1_1..25gn1_16 ("identical" variant),
- a 2×3 grid named u1..u6 ("different" variant),
- an extent centered on the grid middle.

Reference expectations (tests/test_tiles.py:144-166, 183-207):
- within_extent → {25gn1_6, 25gn1_7, 25gn1_10, 25gn1_11} resp. {u2, u5}
- tiles_in_index([... , 'not_in_index']) → known subset, warn not fail
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tile_processor_spark.pipeline.tiles import TileSet
from tile_processor_spark.spatial import wkb
from tile_processor_spark.spatial.join import points_in_polygons
from tile_processor_spark.spatial.udfs import st_rect

EXTENT = wkb.rect_wkb(1.4, 1.4, 2.6, 2.6)  # centered on the 4x4 grid middle


def _grid(spark, ncols, nrows, cell_w, cell_h, namer):
    rows = []
    for r in range(nrows):
        for c in range(ncols):
            rows.append(
                (namer(r, c), c * cell_w, r * cell_h, (c + 1) * cell_w, (r + 1) * cell_h)
            )
    df = spark.createDataFrame(
        rows, "tile_id string, xmin double, ymin double, xmax double, ymax double"
    )
    return df.withColumn("geom", st_rect("xmin", "ymin", "xmax", "ymax"))


@pytest.fixture
def features(spark):
    # one feature at the center of every 1x1 cell of the 4x4 domain
    pts = [
        (r * 4 + c, c + 0.5, r + 0.5) for r in range(4) for c in range(4)
    ]
    return spark.createDataFrame(pts, "fid long, x double, y double")


def _assign(features, grid):
    return points_in_polygons(features, grid, cell_size=1.0)


def test_within_extent_identical_grid(spark, features):
    grid = _grid(spark, 4, 4, 1.0, 1.0, lambda r, c: f"25gn1_{r * 4 + c + 1}")
    assigned = _assign(features, grid)
    got = {r.tile_id for r in TileSet(grid).with_extent(assigned, EXTENT).collect()}
    assert got == {"25gn1_6", "25gn1_7", "25gn1_10", "25gn1_11"}


def test_within_extent_different_grid(spark, features):
    grid = _grid(spark, 3, 2, 4.0 / 3.0, 2.0, lambda r, c: f"u{r * 3 + c + 1}")
    assigned = _assign(features, grid)
    got = {r.tile_id for r in TileSet(grid).with_extent(assigned, EXTENT).collect()}
    assert got == {"u2", "u5"}


def test_tiles_in_index_parity(spark):
    # tests/test_tiles.py:183-207: unknown IDs skipped with a warning.
    grid = _grid(spark, 4, 4, 1.0, 1.0, lambda r, c: f"25gn1_{r * 4 + c + 1}")
    ts = TileSet(grid)
    got = {
        r.tile_id
        for r in ts.with_list(["25gn1_10", "25gn1_11", "25gn1_6", "not_in_index"]).collect()
    }
    assert got == {"25gn1_10", "25gn1_11", "25gn1_6"}
