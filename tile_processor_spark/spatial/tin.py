"""TIN kernel: Delaunay triangulation (Bowyer-Watson), alpha shapes, and
greedy TIN simplification — pure numpy, no scipy/shapely in the runtime.

Closes the two SURVEY §2.11 delegated-semantics rows that round 1
declared out of scope:

- *Alpha-shape per building* (reference ``AlphaShapeWorker``,
  tile_processor/worker.py:587-610, which shells out to a PostGIS
  ``ST_AlphaShape``-style plpgsql helper): triangles of the Delaunay
  triangulation whose circumradius ≤ r are kept; edges owned by exactly
  one kept triangle form the shape boundary.
- *Terrain TIN with simplification threshold* (reference 3dfier ``TIN``
  lifting with ``simplification_tinsimp``, worker.py:288-293): classic
  greedy insertion — keep inserting the sample with the largest vertical
  error against the current TIN until the max error drops under the
  threshold.

Scale model: these are **per-tile** kernels — the engine's parallelism is
tiles-across-executors (``applyInPandas`` over the tile group, like every
worker), not within one triangulation. O(n²) insertion is acceptable for
per-tile point counts; a tile that outgrows it should be re-tiled, which
is the reference's own operating assumption.
"""

from __future__ import annotations

import numpy as np


def _circumcircle(pts: np.ndarray, tri: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Circumcenters and squared radii for triangles ``tri`` (m,3) over
    points ``pts`` (n,2). Degenerate (collinear) triangles get r² = inf."""
    a, b, c = pts[tri[:, 0]], pts[tri[:, 1]], pts[tri[:, 2]]
    d = 2.0 * (
        a[:, 0] * (b[:, 1] - c[:, 1])
        + b[:, 0] * (c[:, 1] - a[:, 1])
        + c[:, 0] * (a[:, 1] - b[:, 1])
    )
    with np.errstate(divide="ignore", invalid="ignore"):
        ux = (
            (a**2).sum(1) * (b[:, 1] - c[:, 1])
            + (b**2).sum(1) * (c[:, 1] - a[:, 1])
            + (c**2).sum(1) * (a[:, 1] - b[:, 1])
        ) / d
        uy = (
            (a**2).sum(1) * (c[:, 0] - b[:, 0])
            + (b**2).sum(1) * (a[:, 0] - c[:, 0])
            + (c**2).sum(1) * (b[:, 0] - a[:, 0])
        ) / d
    centers = np.stack([ux, uy], axis=1)
    r2 = ((pts[tri[:, 0]] - centers) ** 2).sum(1)
    r2 = np.where(np.isfinite(r2), r2, np.inf)
    return centers, r2


def delaunay(points: np.ndarray) -> np.ndarray:
    """Bowyer-Watson Delaunay triangulation.

    ``points`` (n,2) float64, n ≥ 3. Returns (m,3) int vertex indices.
    Deterministic: fixed super-triangle, insertion in input order.
    Cocircular ties resolve by insertion order (strict in-circle test) —
    callers that need exact parity keep fixtures in general position.
    """
    pts = np.asarray(points, dtype=np.float64)
    n = len(pts)
    if n < 3:
        return np.empty((0, 3), dtype=np.int64)
    # Super-triangle comfortably containing everything.
    lo, hi = pts.min(0), pts.max(0)
    span = float(max(hi[0] - lo[0], hi[1] - lo[1], 1.0))
    cx, cy = (lo[0] + hi[0]) / 2.0, (lo[1] + hi[1]) / 2.0
    sup = np.array(
        [
            [cx - 20.0 * span, cy - 10.0 * span],
            [cx + 20.0 * span, cy - 10.0 * span],
            [cx, cy + 20.0 * span],
        ]
    )
    allp = np.vstack([pts, sup])
    center0 = np.array([cx, cy])  # cx/cy are shadowed inside the loop
    tris: list[tuple[int, int, int]] = [(n, n + 1, n + 2)]
    for i in range(n):
        p = allp[i]
        t_arr = np.asarray(tris, dtype=np.int64)
        # Determinant in-circle predicate (orientation-corrected): far
        # more stable than comparing distances to the circumcenter,
        # whose coordinates explode for sliver triangles (catastrophic
        # cancellation there dropped thin hull triangles — caught by
        # tests/test_tin_properties.py::test_delaunay_area_equals_hull_area).
        a, b, c = allp[t_arr[:, 0]], allp[t_arr[:, 1]], allp[t_arr[:, 2]]
        orient = (b[:, 0] - a[:, 0]) * (c[:, 1] - a[:, 1]) - (
            b[:, 1] - a[:, 1]
        ) * (c[:, 0] - a[:, 0])
        ax, ay = a[:, 0] - p[0], a[:, 1] - p[1]
        bx, by = b[:, 0] - p[0], b[:, 1] - p[1]
        cx, cy = c[:, 0] - p[0], c[:, 1] - p[1]
        a2, b2, c2 = ax * ax + ay * ay, bx * bx + by * by, cx * cx + cy * cy
        det = (
            ax * (by * c2 - b2 * cy)
            - ay * (bx * c2 - b2 * cx)
            + a2 * (bx * cy - by * cx)
        )
        margin = det * np.sign(orient)
        # Super vertices act as points at infinity (CGAL's convention):
        # a triangle with exactly one super vertex conflicts with p iff
        # p lies strictly on the super side of its real edge. Using the
        # finite circumcircle there instead distorts Delaunay near the
        # hull (a finite super's huge circumcircle can swallow interior
        # points and delete thin hull triangles — the second failure
        # mode test_delaunay_area_equals_hull_area caught).
        is_sup = t_arr >= n
        n_sup = is_sup.sum(1)
        one = n_sup == 1
        if one.any():
            t1 = t_arr[one]
            rows = np.arange(len(t1))
            sup_pos = np.argmax(is_sup[one], axis=1)
            u = allp[t1[rows, (sup_pos + 1) % 3]]
            v = allp[t1[rows, (sup_pos + 2) % 3]]
            s = allp[t1[rows, sup_pos]]
            o_p = (v[:, 0] - u[:, 0]) * (p[1] - u[:, 1]) - (v[:, 1] - u[:, 1]) * (
                p[0] - u[:, 0]
            )
            o_s = (v[:, 0] - u[:, 0]) * (s[:, 1] - u[:, 1]) - (v[:, 1] - u[:, 1]) * (
                s[:, 0] - u[:, 0]
            )
            margin[one] = np.where(o_p * o_s > 0, 1.0, -1.0)
        # TWO super vertices: the coherent at-infinity rule is the limit
        # of the in-circle determinant as the supers recede along their
        # fixed directions d1, d2 (leading t³ term; the finite-circle
        # test here produced a DISCONNECTED cavity on nearly-collinear
        # inputs — a non-planar mesh that dropped a hull triangle,
        # caught by test_delaunay_area_equals_hull_area):
        #   det∞ = ax(d1y|d2|² − |d1|²d2y) − ay(d1x|d2|² − |d1|²d2x),
        #   orient∞ ∝ cross(d1, d2),  with (ax, ay) = u − p
        # for the triangle cyclically rotated to (u, S1, S2).
        two = n_sup == 2
        if two.any():
            t2 = t_arr[two]
            rows2 = np.arange(len(t2))
            real_pos = np.argmin(is_sup[two], axis=1)
            u2 = allp[t2[rows2, real_pos]]
            d1 = allp[t2[rows2, (real_pos + 1) % 3]] - center0
            d2 = allp[t2[rows2, (real_pos + 2) % 3]] - center0
            aax, aay = u2[:, 0] - p[0], u2[:, 1] - p[1]
            n1 = (d1 * d1).sum(1)
            n2 = (d2 * d2).sum(1)
            det_inf = aax * (d1[:, 1] * n2 - n1 * d2[:, 1]) - aay * (
                d1[:, 0] * n2 - n1 * d2[:, 0]
            )
            cross12 = d1[:, 0] * d2[:, 1] - d1[:, 1] * d2[:, 0]
            margin[two] = np.where(det_inf * np.sign(cross12) > 0, 1.0, -1.0)
        # THREE supers (initial state): the whole plane — always conflicts.
        margin[n_sup == 3] = 1.0
        bad = margin > 0  # strict: on-circle keeps
        if not bad.any():
            # Numerically on the hull of current triangulation; nudge via
            # the largest in-circle margin to keep the mesh legal.
            bad = np.zeros(len(t_arr), dtype=bool)
            bad[np.argmax(margin)] = True
        # Boundary of the star-shaped cavity: edges of bad triangles that
        # are not shared between two bad triangles.
        edge_count: dict[tuple[int, int], int] = {}
        for t in t_arr[bad]:
            for e in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
                k = (min(e), max(e))
                edge_count[k] = edge_count.get(k, 0) + 1
        tris = [tuple(t) for t in t_arr[~bad]]
        for (u, v), cnt in edge_count.items():
            if cnt == 1:
                tris.append((u, v, i))
    out = np.asarray(
        [t for t in tris if max(t) < n], dtype=np.int64
    ).reshape(-1, 3)
    return out


def triangle_areas(pts: np.ndarray, tri: np.ndarray) -> np.ndarray:
    a, b, c = pts[tri[:, 0]], pts[tri[:, 1]], pts[tri[:, 2]]
    return 0.5 * np.abs(
        (b[:, 0] - a[:, 0]) * (c[:, 1] - a[:, 1])
        - (c[:, 0] - a[:, 0]) * (b[:, 1] - a[:, 1])
    )


def alpha_shape(points: np.ndarray, r_max: float) -> dict:
    """Alpha shape as circumradius-filtered Delaunay triangles
    (the ST_AlphaShape construction the reference delegates to PostGIS).

    Returns exact stats of the shape: kept-triangle count, area (sum of
    kept triangles), boundary edges (owned by exactly one kept triangle)
    and their total length — deterministic scalars a gate/bench query can
    pin without a geometry type.
    """
    pts = np.asarray(points, dtype=np.float64)
    tri = delaunay(pts)
    if len(tri) == 0:
        return {"n_triangles": 0, "area": 0.0, "n_boundary_edges": 0, "perimeter": 0.0}
    _, r2 = _circumcircle(pts, tri)
    kept = tri[r2 <= float(r_max) ** 2]
    edge_count: dict[tuple[int, int], int] = {}
    for t in kept:
        for e in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
            k = (min(e), max(e))
            edge_count[k] = edge_count.get(k, 0) + 1
    boundary = [e for e, cnt in edge_count.items() if cnt == 1]
    perim = float(
        sum(np.hypot(*(pts[u] - pts[v])) for u, v in boundary)
    )
    return {
        "n_triangles": int(len(kept)),
        "area": float(triangle_areas(pts, kept).sum()),
        "n_boundary_edges": int(len(boundary)),
        "perimeter": perim,
    }


def _interp_z(pts2: np.ndarray, z: np.ndarray, tri: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Barycentric z interpolation of query points ``q`` (k,2) against the
    TIN (pts2, z, tri). Points outside every triangle get nan."""
    out = np.full(len(q), np.nan)
    a, b, c = pts2[tri[:, 0]], pts2[tri[:, 1]], pts2[tri[:, 2]]
    den = (b[:, 1] - c[:, 1]) * (a[:, 0] - c[:, 0]) + (c[:, 0] - b[:, 0]) * (
        a[:, 1] - c[:, 1]
    )
    with np.errstate(divide="ignore", invalid="ignore"):
        for i, p in enumerate(q):
            w1 = ((b[:, 1] - c[:, 1]) * (p[0] - c[:, 0]) + (c[:, 0] - b[:, 0]) * (p[1] - c[:, 1])) / den
            w2 = ((c[:, 1] - a[:, 1]) * (p[0] - c[:, 0]) + (a[:, 0] - c[:, 0]) * (p[1] - c[:, 1])) / den
            w3 = 1.0 - w1 - w2
            eps = 1e-9
            inside = (w1 >= -eps) & (w2 >= -eps) & (w3 >= -eps)
            if inside.any():
                t = int(np.argmax(inside))
                out[i] = (
                    w1[t] * z[tri[t, 0]] + w2[t] * z[tri[t, 1]] + w3[t] * z[tri[t, 2]]
                )
    return out


def tin_simplify(points: np.ndarray, max_error: float, max_points: int | None = None) -> dict:
    """Greedy-insertion TIN simplification (tinsimp semantics,
    reference worker.py:288-293: "simplification threshold" = stop when
    the largest vertical error of any dropped sample is ≤ threshold).

    ``points`` (n,3) x/y/z samples. Anchors the TIN on four synthetic
    bbox-corner vertices (z of the nearest sample), then repeatedly
    inserts the worst-error sample. Returns selected-vertex count (the
    four anchors excluded), achieved max error, and triangle count.
    """
    p = np.asarray(points, dtype=np.float64)
    xy, z = p[:, :2], p[:, 2]
    lo, hi = xy.min(0), xy.max(0)
    pad = 1e-6 * float(max(hi[0] - lo[0], hi[1] - lo[1], 1.0))
    corners = np.array(
        [
            [lo[0] - pad, lo[1] - pad],
            [hi[0] + pad, lo[1] - pad],
            [hi[0] + pad, hi[1] + pad],
            [lo[0] - pad, hi[1] + pad],
        ]
    )
    cz = np.array(
        [z[np.argmin(((xy - c) ** 2).sum(1))] for c in corners]
    )
    sel_xy = [c for c in corners]
    sel_z = list(cz)
    chosen: list[int] = []
    remaining = set(range(len(p)))
    limit = max_points if max_points is not None else len(p)
    while True:
        tin_pts = np.asarray(sel_xy)
        tin_z = np.asarray(sel_z)
        tri = delaunay(tin_pts)
        if not remaining:
            err = 0.0
            break
        idx = np.asarray(sorted(remaining), dtype=np.int64)
        zi = _interp_z(tin_pts, tin_z, tri, xy[idx])
        errs = np.abs(zi - z[idx])
        errs = np.where(np.isfinite(errs), errs, np.inf)
        err = float(errs.max())
        if err <= max_error or len(chosen) >= limit:
            break
        worst = int(idx[np.argmax(errs)])
        chosen.append(worst)
        remaining.discard(worst)
        sel_xy.append(xy[worst])
        sel_z.append(z[worst])
    return {
        "n_selected": int(len(chosen)),
        "max_error": err,
        "n_triangles": int(len(tri)),
    }
