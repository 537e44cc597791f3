"""Property-based tests (hypothesis) for the Delaunay / alpha-shape /
tinsimp kernels — invariants over randomized point sets, beyond the
fixture cases in tests/test_tin.py. Driver-side NumPy only."""

from __future__ import annotations

import numpy as np
from hypothesis import assume, example, given, settings
from hypothesis import strategies as st

from tile_processor_spark.spatial.tin import (
    alpha_shape,
    delaunay,
    tin_simplify,
    triangle_areas,
)

# Integer grid + small jitter: varied but non-degenerate configurations.
coord = st.integers(min_value=0, max_value=30)


@st.composite
def point_set(draw, min_size=4, max_size=20):
    pts = draw(
        st.lists(
            st.tuples(coord, coord), min_size=min_size, max_size=max_size, unique=True
        )
    )
    arr = np.array(pts, dtype=np.float64)
    # deterministic sub-cell jitter breaks exact collinearity
    k = np.arange(len(arr))
    arr[:, 0] += (k * 37 % 101) / 1010.0
    arr[:, 1] += (k * 53 % 97) / 970.0
    return arr


@settings(max_examples=80, deadline=None)
@given(pts=point_set())
@example(
    pts=np.array([[ 0.        ,  1.        ],
           [ 0.03663366,  2.05463918],
           [13.07326733,  1.00927835],
           [ 6.00990099,  1.06391753],
           [ 0.04653465,  0.0185567 ]]),
).via('discovered failure')
def test_delaunay_area_equals_hull_area(pts):
    """Triangulation tiles the convex hull: triangle areas sum to the
    hull area (shoelace over the hull polygon)."""
    assume(len(pts) >= 3)
    tri = delaunay(pts)
    assume(len(tri) > 0)
    total = float(triangle_areas(pts, tri).sum())
    # convex hull via monotone chain
    P = sorted(map(tuple, pts))

    def half(seq):
        out = []
        for q in seq:
            while len(out) >= 2 and (
                (out[-1][0] - out[-2][0]) * (q[1] - out[-2][1])
                - (out[-1][1] - out[-2][1]) * (q[0] - out[-2][0])
            ) <= 0:
                out.pop()
            out.append(q)
        return out

    hull = half(P)[:-1] + half(P[::-1])[:-1]
    hull_area = 0.5 * abs(
        sum(
            hull[i][0] * hull[(i + 1) % len(hull)][1]
            - hull[(i + 1) % len(hull)][0] * hull[i][1]
            for i in range(len(hull))
        )
    )
    assert abs(total - hull_area) < 1e-6 * max(hull_area, 1.0)


@settings(max_examples=60, deadline=None)
@given(pts=point_set(), r_small=st.floats(min_value=0.5, max_value=3.0))
def test_alpha_shape_monotone_in_radius(pts, r_small):
    """Growing the radius filter can only admit more triangles: area and
    triangle count are non-decreasing in r_max, and the full-radius
    shape equals the Delaunay tiling."""
    a1 = alpha_shape(pts, r_small)
    a2 = alpha_shape(pts, r_small * 4)
    a3 = alpha_shape(pts, 1e9)
    assert a1["n_triangles"] <= a2["n_triangles"] <= a3["n_triangles"]
    assert a1["area"] <= a2["area"] + 1e-9
    assert a2["area"] <= a3["area"] + 1e-9
    tri = delaunay(pts)
    if len(tri):
        assert a3["n_triangles"] == len(tri)
        assert abs(a3["area"] - float(triangle_areas(pts, tri).sum())) < 1e-9


@settings(max_examples=40, deadline=None)
@given(pts=point_set(min_size=6, max_size=16), tol=st.floats(min_value=0.1, max_value=5.0))
def test_tinsimp_achieves_threshold(pts, tol):
    """tinsimp's contract: the reported max vertical error of dropped
    samples is ≤ the threshold (when no point cap is hit), and
    tightening the threshold never selects fewer points."""
    z = 0.05 * (pts[:, 0] - 15) ** 2 + 0.3 * pts[:, 1]
    samples = np.column_stack([pts, z])
    loose = tin_simplify(samples, max_error=tol)
    assert loose["max_error"] <= tol + 1e-9
    tight = tin_simplify(samples, max_error=tol / 4)
    assert tight["max_error"] <= tol / 4 + 1e-9
    assert tight["n_selected"] >= loose["n_selected"]
