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


# ---- DE-9IM (ST_Relate / ST_Covers parity, tileconfig.py:587-598) --------


def _brute_de9im(boxes, brect):
    """Independent unit-grid DE-9IM for integer-coordinate inputs: no
    coordinate compression, every unit cell/edge/vertex checked literally.
    Mirrors the SQL oracle's construction, so kernel bugs and oracle bugs
    can't cancel out."""
    bx0, by0, bx1, by1 = brect
    xs = [r[0] for r in boxes] + [r[2] for r in boxes] + [bx0, bx1]
    ys = [r[1] for r in boxes] + [r[3] for r in boxes] + [by0, by1]
    X0, X1 = min(xs) - 2, max(xs) + 2
    Y0, Y1 = min(ys) - 2, max(ys) + 2
    nx, ny = X1 - X0, Y1 - Y0
    cov = np.zeros((nx, ny), dtype=bool)
    for x0, y0, x1, y1 in boxes:
        cov[x0 - X0 : x1 - X0, y0 - Y0 : y1 - Y0] = True
    inb = np.zeros((nx, ny), dtype=bool)
    inb[bx0 - X0 : bx1 - X0, by0 - Y0 : by1 - Y0] = True

    pad = np.zeros((nx + 2, ny + 2), dtype=bool)
    pad[1:-1, 1:-1] = cov
    ib = bi = bb1 = be = eb = bb0 = False
    # vertical unit edges at x = X0+i, span [Y0+j, Y0+j+1]
    for i in range(nx + 1):
        x = X0 + i
        for j in range(ny):
            y = Y0 + j
            l, r = pad[i, j + 1], pad[i + 1, j + 1]
            on_a, int_a, ext_a = l != r, l and r, not l and not r
            on_b = x in (bx0, bx1) and by0 <= y and y + 1 <= by1
            int_b = bx0 < x < bx1 and by0 <= y and y + 1 <= by1
            ext_b = x < bx0 or x > bx1 or y + 1 <= by0 or y >= by1
            ib |= on_b and int_a
            bi |= on_a and int_b
            bb1 |= on_a and on_b
            be |= on_a and ext_b
            eb |= on_b and ext_a
    # horizontal unit edges at y = Y0+j, span [X0+i, X0+i+1]
    for i in range(nx):
        x = X0 + i
        for j in range(ny + 1):
            y = Y0 + j
            b_, a_ = pad[i + 1, j], pad[i + 1, j + 1]
            on_a, int_a, ext_a = b_ != a_, b_ and a_, not b_ and not a_
            on_b = y in (by0, by1) and bx0 <= x and x + 1 <= bx1
            int_b = by0 < y < by1 and bx0 <= x and x + 1 <= bx1
            ext_b = y < by0 or y > by1 or x + 1 <= bx0 or x >= bx1
            ib |= on_b and int_a
            bi |= on_a and int_b
            bb1 |= on_a and on_b
            be |= on_a and ext_b
            eb |= on_b and ext_a
    if not bb1:
        for i in range(nx + 1):
            x = X0 + i
            for j in range(ny + 1):
                y = Y0 + j
                quad = [pad[i, j], pad[i + 1, j], pad[i, j + 1], pad[i + 1, j + 1]]
                on_a = any(quad) and not all(quad)
                on_b = (x in (bx0, bx1) and by0 <= y <= by1) or (
                    y in (by0, by1) and bx0 <= x <= bx1
                )
                bb0 |= on_a and on_b
    return "".join(
        [
            "2" if (cov & inb).any() else "F",
            "1" if ib else "F",
            "2" if (cov & ~inb).any() else "F",
            "1" if bi else "F",
            "1" if bb1 else ("0" if bb0 else "F"),
            "1" if be else "F",
            "2" if (inb & ~cov).any() else "F",
            "1" if eb else "F",
            "2",
        ]
    )


def test_de9im_pinned_matrices():
    a = np.array([[0.0, 0, 10, 10]])
    cases = [
        ((20, 0, 30, 10), "FF2FF1212"),  # disjoint
        ((0, 0, 10, 10), "2FFF1FFF2"),  # equal
        ((2, 2, 8, 8), "212FF1FF2"),  # contains strictly
        ((2, 0, 4, 2), "FF2F11212", [[0.0, 0, 2, 2]]),  # touches, shared edge
        ((2, 2, 4, 4), "FF2F01212", [[0.0, 0, 2, 2]]),  # touches at corner
        ((5, -5, 15, 15), "212101212"),  # transversal straddle: the pattern
        ((0, 0, 5, 5), "212F11FF2"),  # covers with shared boundary
    ]
    for case in cases:
        brect, want = case[0], case[1]
        rects = np.array(case[2]) if len(case) > 2 else a
        assert kernel.rect_union_de9im(rects, brect) == want, (brect, want)


def test_de9im_union_dissolves_internal_edges():
    # L-shape: two rects sharing the internal edge x=10; the union's
    # boundary must NOT contain it (this is what makes the rect list a
    # dissolve, ST_UnaryUnion semantics).
    ell = np.array([[0.0, 0, 10, 10], [10.0, 0, 20, 5]])
    # B sits across the internal edge, fully inside the union → contains.
    assert kernel.rect_union_de9im(ell, (8, 2, 12, 4)) == "212FF1FF2"
    assert kernel.rect_union_covers(ell, (8, 2, 12, 4))
    # B straddles the notch corner (10,5): transversal crossing pattern.
    assert kernel.rect_union_de9im(ell, (8, 4, 12, 6)) == "212101212"
    assert not kernel.rect_union_covers(ell, (8, 4, 12, 6))


def test_relate_pattern_semantics():
    m = "212101212"
    assert kernel.relate_pattern(m, "212101212")
    assert kernel.relate_pattern(m, "T********")
    assert kernel.relate_pattern(m, "*********")
    assert kernel.relate_pattern(m, "2121T1212")
    assert not kernel.relate_pattern(m, "FF*******")
    assert not kernel.relate_pattern(m, "212111212")  # BB must be 0 here
    # intersects = NOT disjoint; disjoint pattern FF*FF****
    assert kernel.relate_pattern("FF2FF1212", "FF*FF****")
    assert not kernel.relate_pattern(m, "FF*FF****")


def test_covers_cases():
    a = np.array([[0.0, 0, 10, 10]])
    assert kernel.rect_union_covers(a, (0, 0, 10, 10))  # equal
    assert kernel.rect_union_covers(a, (0, 0, 5, 5))  # shared corner
    assert kernel.rect_union_covers(a, (2, 2, 8, 8))  # strict
    assert not kernel.rect_union_covers(a, (5, 5, 15, 15))
    assert not kernel.rect_union_covers(a, (20, 20, 30, 30))
    assert not kernel.rect_union_covers(np.empty((0, 4)), (0, 0, 1, 1))


@given(
    st.lists(
        st.tuples(
            st.integers(0, 12), st.integers(0, 12),
            st.integers(1, 6), st.integers(1, 6),
        ),
        min_size=0, max_size=5,
    ),
    st.integers(0, 12), st.integers(0, 12),
    st.integers(1, 6), st.integers(1, 6),
)
@settings(max_examples=150, deadline=None)
def test_de9im_matches_unit_grid_brute_force(boxes, bx, by, bw, bh):
    rects = [(x, y, x + w, y + h) for x, y, w, h in boxes]
    brect = (bx, by, bx + bw, by + bh)
    got = kernel.rect_union_de9im(np.array(rects, dtype=float).reshape(-1, 4), brect)
    want = _brute_de9im(rects, brect)
    assert got == want, (rects, brect)


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
