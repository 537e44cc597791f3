"""TIN kernel tests: Delaunay structural invariants, alpha-shape
construction, greedy tinsimp semantics (reference worker.py:288-293,
587-610)."""

from __future__ import annotations

import numpy as np
import pytest

from tile_processor_spark.spatial.tin import (
    _circumcircle,
    alpha_shape,
    delaunay,
    tin_simplify,
    triangle_areas,
)


def _rand(n, seed=7):
    rng = np.random.RandomState(seed)
    return rng.rand(n, 2) * 100.0


def test_delaunay_square_with_center():
    pts = np.array([[0.0, 0], [10, 0], [10, 10], [0, 10], [5, 5]])
    tri = delaunay(pts)
    assert len(tri) == 4  # center fans to the four sides
    assert triangle_areas(pts, tri).sum() == pytest.approx(100.0)
    assert all(4 in t for t in tri)


def test_delaunay_empty_circumcircle_property():
    pts = _rand(40)
    tri = delaunay(pts)
    centers, r2 = _circumcircle(pts, tri)
    for t, c, rr in zip(tri, centers, r2):
        d2 = ((pts - c) ** 2).sum(1)
        inside = d2 < rr - 1e-7 * rr
        inside[list(t)] = False
        assert not inside.any(), "a point lies strictly inside a circumcircle"


def test_delaunay_covers_convex_hull_area():
    # Union of triangle areas equals the hull area — no holes/overlaps.
    pts = _rand(60, seed=11)
    tri = delaunay(pts)
    got = triangle_areas(pts, tri).sum()
    # hull area via monotone-chain + shoelace
    p = pts[np.lexsort((pts[:, 1], pts[:, 0]))]

    def half(iterable):
        h = []
        for q in iterable:
            while len(h) >= 2 and np.cross(h[-1] - h[-2], q - h[-2]) <= 0:
                h.pop()
            h.append(q)
        return h

    hull = half(p)[:-1] + half(p[::-1])[:-1]
    hull = np.asarray(hull)
    want = 0.5 * abs(
        np.dot(hull[:, 0], np.roll(hull[:, 1], -1))
        - np.dot(hull[:, 1], np.roll(hull[:, 0], -1))
    )
    assert got == pytest.approx(want, rel=1e-9)


def test_alpha_shape_hull_vs_tight():
    # 3x12 strip of jittered points: a huge radius keeps every triangle
    # (area = hull area); a tight radius thins it.
    rng = np.random.RandomState(3)
    xs, ys = np.meshgrid(np.arange(12) * 10.0, np.arange(3) * 10.0)
    pts = np.stack([xs.ravel(), ys.ravel()], 1) + rng.rand(36, 2)
    loose = alpha_shape(pts, r_max=1e6)
    tight = alpha_shape(pts, r_max=8.0)
    tri = delaunay(pts)
    assert loose["n_triangles"] == len(tri)
    assert loose["area"] == pytest.approx(triangle_areas(pts, tri).sum())
    assert 0 < tight["n_triangles"] <= loose["n_triangles"]
    assert tight["area"] <= loose["area"]
    assert tight["n_boundary_edges"] >= 3
    assert tight["perimeter"] > 0


def test_alpha_shape_splits_far_clusters():
    # Two distant blobs: with r_max smaller than the gap the shape keeps
    # only intra-cluster triangles, so the boundary decomposes into two
    # rings (edge count equals the two clusters' own alpha boundaries).
    a = _rand(20, seed=5)
    b = _rand(20, seed=6) + 1000.0
    both = alpha_shape(np.vstack([a, b]), r_max=60.0)
    sep = alpha_shape(a, r_max=60.0), alpha_shape(b, r_max=60.0)
    assert both["n_triangles"] == sep[0]["n_triangles"] + sep[1]["n_triangles"]
    assert both["area"] == pytest.approx(sep[0]["area"] + sep[1]["area"])


def test_tinsimp_plane_needs_no_interior_points():
    # Samples from a plane, with samples AT the bbox corners (so the
    # corner anchors snap exact z): the initial TIN already interpolates
    # every sample exactly — greedy insertion selects nothing.
    rng = np.random.RandomState(9)
    xy = rng.rand(200, 2) * 50.0
    xy = np.vstack([xy, [[0.0, 0.0], [50.0, 0.0], [50.0, 50.0], [0.0, 50.0]]])
    z = 2.0 * xy[:, 0] + 3.0 * xy[:, 1] + 1.0
    res = tin_simplify(np.column_stack([xy, z]), max_error=1e-6)
    # The padded anchors sit ~5e-5 outside the data, so at most the four
    # corner samples are pulled in; after that the plane is exact.
    assert res["n_selected"] <= 4
    assert res["max_error"] <= 1e-6


def test_tinsimp_threshold_contract():
    # Curved surface: simplification achieves the threshold with far
    # fewer vertices than samples, and a looser threshold needs fewer.
    rng = np.random.RandomState(2)
    xy = rng.rand(150, 2) * 20.0
    z = 0.05 * (xy[:, 0] - 10.0) ** 2 + 0.03 * (xy[:, 1] - 10.0) ** 2
    fine = tin_simplify(np.column_stack([xy, z]), max_error=0.05)
    coarse = tin_simplify(np.column_stack([xy, z]), max_error=1.0)
    assert fine["max_error"] <= 0.05
    assert coarse["max_error"] <= 1.0
    assert 0 < coarse["n_selected"] < fine["n_selected"] < 150


def test_alpha_gate_frame_is_nondegenerate():
    # The spatial_alpha_shape gate oracle is SELF-generated (a pin of the
    # engine's own output), so an all-zero frame would be vacuous — any
    # kernel returning zeros would "pass". Round-4 shipped exactly that
    # (modular-line points → collinear slivers → r²=inf → zero triangles
    # everywhere). Require the pin to exercise the kept-triangle, area,
    # and boundary paths, and the circumradius filter itself.
    import re

    from tile_processor_spark.plans import _tin_oracle_values as piv

    rows = re.findall(
        r"\('(t[^']*)', (\d+), CAST\('([^']+)' AS DOUBLE\), (\d+), CAST\('([^']+)' AS DOUBLE\)\)",
        piv.SPATIAL_ALPHA_SHAPE_ORACLE,
    )
    assert len(rows) == 100, "expected one row per 10×10 tile"
    ntri = [int(r[1]) for r in rows]
    areas = [float(r[2]) for r in rows]
    nbound = [int(r[3]) for r in rows]
    perims = [float(r[4]) for r in rows]
    assert sum(1 for n in ntri if n > 0) >= 90, "alpha frame went (near-)vacuous"
    assert sum(areas) > 0.0 and sum(nbound) > 0 and sum(perims) > 0.0
    assert len(set(ntri)) > 3, "suspiciously uniform triangle counts"
