"""Property-based tests (hypothesis) for the spatial kernels — the
SURVEY §5 model applied to the DE-9IM/dissolve core: invariants that
must hold for ALL rectilinear inputs, not just the gate fixtures.

Driver-side only (the kernels are pure NumPy), so hypothesis can run
hundreds of examples without Spark job overhead.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from tile_processor_spark.spatial.kernel import (
    points_in_ring,
    rect_union_area,
    rect_union_covers,
    rect_union_de9im,
    relate_pattern,
)

# Integer-ish coordinates keep every intersection exactly representable;
# the kernels' contract is exact arithmetic on compressed coordinates.
coord = st.integers(min_value=0, max_value=12)


@st.composite
def rect(draw):
    x0 = draw(coord)
    y0 = draw(coord)
    w = draw(st.integers(min_value=1, max_value=6))
    h = draw(st.integers(min_value=1, max_value=6))
    return (x0, y0, x0 + w, y0 + h)


rect_list = st.lists(rect(), min_size=1, max_size=6)


@settings(max_examples=200, deadline=None)
@given(rects=rect_list)
def test_union_area_bounds_and_invariance(rects):
    a = rect_union_area(np.array(rects, dtype=float))
    each = sum((r[2] - r[0]) * (r[3] - r[1]) for r in rects)
    assert 0 < a <= each + 1e-9
    # Permutation + duplication invariance (union semantics).
    shuffled = rects[::-1] + [rects[0]]
    assert rect_union_area(np.array(shuffled, dtype=float)) == a


@settings(max_examples=200, deadline=None)
@given(rects=rect_list)
def test_union_covers_every_member(rects):
    arr = np.array(rects, dtype=float)
    for r in rects:
        assert rect_union_covers(arr, r), (rects, r)


@settings(max_examples=200, deadline=None)
@given(rects=rect_list)
def test_de9im_interior_consistency(rects):
    arr = np.array(rects, dtype=float)
    for r in rects:
        m = rect_union_de9im(arr, r)
        # B is a member of A's union: B's interior must lie in A's
        # interior (II=2) and never in A's exterior (EI=F); A's exterior
        # never meets B at all (EI=F, EB=F ⇔ covers).
        assert m[0] == "2", (m, rects, r)
        assert m[6] == "F" and m[7] == "F", (m, rects, r)
        assert m[8] == "2"
        assert relate_pattern(m, "T*****FF*")


@settings(max_examples=200, deadline=None)
@given(r=rect())
def test_de9im_identity_and_disjoint(r):
    arr = np.array([r], dtype=float)
    assert rect_union_de9im(arr, r) == "2FFF1FFF2"
    # Translate B fully outside A's bbox → canonical disjoint matrix.
    far = (r[0] + 100, r[1] + 100, r[2] + 100, r[3] + 100)
    assert rect_union_de9im(arr, far) == "FF2FF1212"


@settings(max_examples=200, deadline=None)
@given(rects=rect_list, r=rect())
def test_de9im_matches_area_decomposition(rects, r):
    """II=2 ⇔ the union overlaps B's interior with positive area; EI=2 ⇔
    part of B's interior is outside the union — both checkable exactly
    via inclusion-exclusion with rect_union_area."""
    arr = np.array(rects, dtype=float)
    m = rect_union_de9im(arr, r)
    area_b = (r[2] - r[0]) * (r[3] - r[1])
    clipped = []
    for x0, y0, x1, y1 in rects:
        cx0, cy0 = max(x0, r[0]), max(y0, r[1])
        cx1, cy1 = min(x1, r[2]), min(y1, r[3])
        if cx1 > cx0 and cy1 > cy0:
            clipped.append((cx0, cy0, cx1, cy1))
    inter = rect_union_area(np.array(clipped, dtype=float)) if clipped else 0.0
    assert (m[0] == "2") == (inter > 0), (m, rects, r)
    assert (m[6] == "2") == (inter < area_b), (m, rects, r)


@settings(max_examples=300, deadline=None)
@given(
    r=rect(),
    px=st.integers(min_value=-2, max_value=16),
    py=st.integers(min_value=-2, max_value=16),
)
def test_ray_cast_on_rectangle_ring_is_bbox_test(r, px, py):
    """For a rectangle ring, the ray-cast kernel must agree with the bbox
    test away from the boundary (boundary semantics are the caller's
    bbox-prefilter concern). Points are offset to half-integers so they
    never sit on an edge."""
    x, y = px + 0.5, py + 0.5
    ring = np.array(
        [[r[0], r[1]], [r[2], r[1]], [r[2], r[3]], [r[0], r[3]], [r[0], r[1]]],
        dtype=float,
    )
    got = points_in_ring(ring, np.array([x]), np.array([y]))[0]
    want = (r[0] < x < r[2]) and (r[1] < y < r[3])
    assert bool(got) == want
