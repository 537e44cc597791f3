"""Property-based tests for the WKB codec (spatial/wkb.py): roundtrip
identity and bbox consistency over arbitrary coordinates — the F9
geometry-cast surface beyond the pinned EWKB fixture."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from tile_processor_spark.spatial.wkb import (
    parse_point,
    parse_polygon,
    point_wkb,
    polygon_bbox,
    polygon_wkb,
    rect_wkb,
)

finite = st.floats(
    allow_nan=False, allow_infinity=False, min_value=-1e12, max_value=1e12
)


@settings(max_examples=300, deadline=None)
@given(x=finite, y=finite)
def test_point_roundtrip_bitexact(x, y):
    px, py = parse_point(point_wkb(x, y))
    assert (px, py) == (x, y)


@st.composite
def ring(draw):
    n = draw(st.integers(min_value=3, max_value=8))
    pts = [
        (draw(finite), draw(finite))
        for _ in range(n)
    ]
    pts.append(pts[0])  # closed
    return np.array(pts, dtype=np.float64)


@settings(max_examples=200, deadline=None)
@given(rings=st.lists(ring(), min_size=1, max_size=3))
def test_polygon_roundtrip_bitexact(rings):
    back = parse_polygon(polygon_wkb(rings))
    assert len(back) == len(rings)
    for a, b in zip(rings, back):
        assert a.shape == b.shape
        assert (a == b).all()


@settings(max_examples=200, deadline=None)
@given(rings=st.lists(ring(), min_size=1, max_size=3))
def test_polygon_bbox_matches_outer_ring(rings):
    x0, y0, x1, y1 = polygon_bbox(polygon_wkb(rings))
    outer = rings[0]
    assert x0 == outer[:, 0].min() and x1 == outer[:, 0].max()
    assert y0 == outer[:, 1].min() and y1 == outer[:, 1].max()


mid = st.floats(allow_nan=False, allow_infinity=False, min_value=-1e6, max_value=1e6)
extent = st.floats(allow_nan=False, allow_infinity=False, min_value=1e-3, max_value=1e6)


@settings(max_examples=200, deadline=None)
@given(x0=mid, y0=mid, w=extent, h=extent)
def test_rect_wkb_is_polygon_with_expected_bbox(x0, y0, w, h):
    # Non-degenerate rects only: w,h are large enough relative to the
    # coordinate range that x0+w > x0 in float64 (degenerate rings
    # legitimately collapse the closing vertex).
    x1, y1 = x0 + w, y0 + h
    buf = rect_wkb(x0, y0, x1, y1)
    rings = parse_polygon(buf)
    assert len(rings) == 1 and rings[0].shape[0] == 5
    bx0, by0, bx1, by1 = polygon_bbox(buf)
    assert (bx0, by0, bx1, by1) == (x0, y0, x1, y1)
