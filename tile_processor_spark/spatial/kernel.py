"""Numpy-vectorized geometry math backing the spatial pandas UDFs.

Everything operates on float64 arrays; per-batch work is grouped by
distinct polygon so a tile join with K unique tiles per Arrow batch costs
K ray-cast sweeps, each vectorized over all points in the batch
(reference semantics: PostGIS ``ST_Within``/``ST_Intersects``/
``ST_UnaryUnion``, tile_processor/tileconfig.py:170-193, 565-586).
"""

from __future__ import annotations

import numpy as np


def points_in_ring(ring: np.ndarray, xs: np.ndarray, ys: np.ndarray) -> np.ndarray:
    """Vectorized even-odd ray casting: which (xs, ys) lie strictly inside
    the closed ring. Points exactly on an edge are implementation-defined
    (callers keep test data off boundaries; the reference inherits the
    same ambiguity from PostGIS vs shapely)."""
    x1, y1 = ring[:-1, 0], ring[:-1, 1]
    x2, y2 = ring[1:, 0], ring[1:, 1]
    xs = xs[:, None]
    ys = ys[:, None]
    crosses = (y1 > ys) != (y2 > ys)
    # x coordinate where the edge crosses the horizontal ray at ys
    with np.errstate(divide="ignore", invalid="ignore"):
        x_at = x1 + (ys - y1) * (x2 - x1) / np.where(y2 == y1, np.inf, y2 - y1)
    hits = crosses & (xs < x_at)
    return hits.sum(axis=1) % 2 == 1


def points_in_polygon(rings: list[np.ndarray], xs: np.ndarray, ys: np.ndarray) -> np.ndarray:
    """Inside exterior ring and outside every hole (even-odd rule)."""
    inside = points_in_ring(rings[0], xs, ys)
    for hole in rings[1:]:
        inside &= ~points_in_ring(hole, xs, ys)
    return inside


def bbox_intersects(
    a: tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray],
    b: tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray],
) -> np.ndarray:
    ax0, ay0, ax1, ay1 = a
    bx0, by0, bx1, by1 = b
    return (ax0 <= bx1) & (bx0 <= ax1) & (ay0 <= by1) & (by0 <= ay1)


def _segments_intersect(p1, p2, q1, q2) -> bool:
    def orient(a, b, c):
        return (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])

    d1, d2 = orient(q1, q2, p1), orient(q1, q2, p2)
    d3, d4 = orient(p1, p2, q1), orient(p1, p2, q2)
    if ((d1 > 0) != (d2 > 0)) and ((d3 > 0) != (d4 > 0)):
        return True

    def on_seg(a, b, c):
        return (
            orient(a, b, c) == 0
            and min(a[0], b[0]) <= c[0] <= max(a[0], b[0])
            and min(a[1], b[1]) <= c[1] <= max(a[1], b[1])
        )

    return on_seg(q1, q2, p1) or on_seg(q1, q2, p2) or on_seg(p1, p2, q1) or on_seg(p1, p2, q2)


def polygons_intersect(a_rings: list[np.ndarray], b_rings: list[np.ndarray]) -> bool:
    """Exact polygon-polygon intersection (boundaries touching counts,
    matching PostGIS ST_Intersects). Exterior rings only — adequate for
    tile/extent geometries, which are hole-free."""
    a, b = a_rings[0], b_rings[0]
    if points_in_polygon(a_rings, b[:-1, 0], b[:-1, 1]).any():
        return True
    if points_in_polygon(b_rings, a[:-1, 0], a[:-1, 1]).any():
        return True
    for i in range(len(a) - 1):
        for j in range(len(b) - 1):
            if _segments_intersect(a[i], a[i + 1], b[j], b[j + 1]):
                return True
    return False


def rect_union_area(rects: np.ndarray) -> float:
    """Exact area of the union of axis-aligned rectangles
    (n,4)=(xmin,ymin,xmax,ymax) — coordinate-compression sweep; the
    engine's dissolve (ST_UnaryUnion(ST_Collect(...)), A3 in SURVEY §2.4)
    reports union area per group."""
    rects = np.asarray(rects, dtype=np.float64)
    if len(rects) == 0:
        return 0.0
    xs = np.unique(np.concatenate([rects[:, 0], rects[:, 2]]))
    ys = np.unique(np.concatenate([rects[:, 1], rects[:, 3]]))
    if len(xs) < 2 or len(ys) < 2:
        return 0.0
    # covered[i, j] = cell (xs[i], xs[i+1]) x (ys[j], ys[j+1]) covered?
    covered = np.zeros((len(xs) - 1, len(ys) - 1), dtype=bool)
    xi0 = np.searchsorted(xs, rects[:, 0])
    xi1 = np.searchsorted(xs, rects[:, 2])
    yi0 = np.searchsorted(ys, rects[:, 1])
    yi1 = np.searchsorted(ys, rects[:, 3])
    for k in range(len(rects)):
        covered[xi0[k] : xi1[k], yi0[k] : yi1[k]] = True
    wx = np.diff(xs)
    wy = np.diff(ys)
    return float((covered * wx[:, None] * wy[None, :]).sum())
