"""Unit tests for the numpy geometry kernel + WKB codec (the pieces under
every spatial gate query), including property-based checks."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from tile_processor_spark.spatial import kernel, wkb


def test_wkb_point_roundtrip():
    assert wkb.parse_point(wkb.point_wkb(1.5, -2.25)) == (1.5, -2.25)


def test_wkb_polygon_roundtrip_and_bbox():
    ring = np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 3.0], [0.0, 3.0]])
    buf = wkb.rect_wkb(0, 0, 4, 3)
    rings = wkb.parse_polygon(buf)
    assert len(rings) == 1 and len(rings[0]) == 5  # closed
    assert wkb.polygon_bbox(buf) == (0.0, 0.0, 4.0, 3.0)
    np.testing.assert_array_equal(rings[0][:-1], ring)


@given(
    st.floats(-99, 99), st.floats(-99, 99),
    st.floats(-100, 100), st.floats(-100, 100),
    st.floats(0.5, 50), st.floats(0.5, 50),
)
@settings(max_examples=200, deadline=None)
def test_point_in_rect_matches_arithmetic(px, py, x0, y0, w, h):
    rings = wkb.parse_polygon(wkb.rect_wkb(x0, y0, x0 + w, y0 + h))
    got = kernel.points_in_polygon(rings, np.array([px]), np.array([py]))[0]
    strict_in = (x0 < px < x0 + w) and (y0 < py < y0 + h)
    on_edge = (px in (x0, x0 + w) and y0 <= py <= y0 + h) or (
        py in (y0, y0 + h) and x0 <= px <= x0 + w
    )
    if not on_edge:  # boundary behavior is documented as unspecified
        assert bool(got) == strict_in


def test_point_in_polygon_with_hole():
    outer = np.array([[0.0, 0], [10, 0], [10, 10], [0, 10]])
    hole = np.array([[4.0, 4], [6, 4], [6, 6], [4, 6]])
    buf = wkb.polygon_wkb([outer, hole])
    rings = wkb.parse_polygon(buf)
    xs = np.array([5.0, 2.0, 11.0])
    ys = np.array([5.0, 2.0, 5.0])
    np.testing.assert_array_equal(
        kernel.points_in_polygon(rings, xs, ys), [False, True, False]
    )


def test_polygons_intersect_cases():
    a = wkb.parse_polygon(wkb.rect_wkb(0, 0, 2, 2))
    b_overlap = wkb.parse_polygon(wkb.rect_wkb(1, 1, 3, 3))
    b_touch = wkb.parse_polygon(wkb.rect_wkb(2, 0, 4, 2))  # shared edge
    b_apart = wkb.parse_polygon(wkb.rect_wkb(5, 5, 6, 6))
    b_contained = wkb.parse_polygon(wkb.rect_wkb(0.5, 0.5, 1.5, 1.5))
    big = wkb.parse_polygon(wkb.rect_wkb(-1, -1, 5, 5))
    assert kernel.polygons_intersect(a, b_overlap)
    assert kernel.polygons_intersect(a, b_touch)  # touch counts (ST_Intersects)
    assert not kernel.polygons_intersect(a, b_apart)
    assert kernel.polygons_intersect(a, b_contained)
    assert kernel.polygons_intersect(a, big)  # a fully inside big
    # cross shape: edges cross, no vertex containment either way
    tall = wkb.parse_polygon(wkb.rect_wkb(0.5, -5, 1.5, 5))
    wide = wkb.parse_polygon(wkb.rect_wkb(-5, 0.5, 5, 1.5))
    assert kernel.polygons_intersect(tall, wide)


@given(
    st.lists(
        st.tuples(
            st.integers(0, 40), st.integers(0, 40),
            st.integers(1, 15), st.integers(1, 15),
        ),
        min_size=0, max_size=12,
    )
)
@settings(max_examples=100, deadline=None)
def test_rect_union_area_matches_grid_count(boxes):
    rects = np.array([[x, y, x + w, y + h] for x, y, w, h in boxes], dtype=float)
    got = kernel.rect_union_area(rects.reshape(-1, 4))
    grid = np.zeros((60, 60), dtype=bool)
    for x, y, w, h in boxes:
        grid[x : x + w, y : y + h] = True
    assert got == float(grid.sum())
