"""Minimal standard WKB (ISO little-endian) encode/decode for Point and
Polygon, numpy-based.

Geometry travels through the engine as ``BinaryType`` WKB plus float64
bbox columns (xmin, ymin, xmax, ymax) for cheap Catalyst-side pruning —
the same row layout the reference keeps in PostGIS (geometry column +
GiST index; the bbox columns play the index's role, SURVEY.md §4).
SRID is carried out-of-band as a column (reference uses EPSG:28992).
"""

from __future__ import annotations

import struct

import numpy as np

WKB_POINT = 1
WKB_POLYGON = 3
_LE = 1  # little-endian byte-order marker


def point_wkb(x: float, y: float) -> bytes:
    return struct.pack("<BIdd", _LE, WKB_POINT, x, y)


def polygon_wkb(rings: list[np.ndarray]) -> bytes:
    """``rings``: list of (n,2) float64 arrays; first = exterior (closed or
    open — closing vertex appended if missing), rest = holes."""
    out = [struct.pack("<BII", _LE, WKB_POLYGON, len(rings))]
    for ring in rings:
        ring = np.asarray(ring, dtype=np.float64)
        if not np.array_equal(ring[0], ring[-1]):
            ring = np.vstack([ring, ring[:1]])
        out.append(struct.pack("<I", len(ring)))
        out.append(ring.astype("<f8").tobytes())
    return b"".join(out)


def rect_wkb(xmin: float, ymin: float, xmax: float, ymax: float) -> bytes:
    return polygon_wkb(
        [np.array([[xmin, ymin], [xmax, ymin], [xmax, ymax], [xmin, ymax]])]
    )


def parse_point(buf: bytes) -> tuple[float, float]:
    order, gtype, x, y = struct.unpack_from("<BIdd", buf)
    if gtype != WKB_POINT:
        raise ValueError(f"not a WKB point (type={gtype})")
    return x, y


def parse_polygon(buf: bytes) -> list[np.ndarray]:
    """Return list of (n,2) float64 rings (closing vertex retained)."""
    order, gtype, nrings = struct.unpack_from("<BII", buf)
    if gtype != WKB_POLYGON:
        raise ValueError(f"not a WKB polygon (type={gtype})")
    rings, off = [], 9
    for _ in range(nrings):
        (npts,) = struct.unpack_from("<I", buf, off)
        off += 4
        ring = np.frombuffer(buf, dtype="<f8", count=npts * 2, offset=off)
        rings.append(ring.reshape(npts, 2).copy())
        off += npts * 16
    return rings


def polygon_bbox(buf: bytes) -> tuple[float, float, float, float]:
    ext = parse_polygon(buf)[0]
    return float(ext[:, 0].min()), float(ext[:, 1].min()), float(ext[:, 0].max()), float(ext[:, 1].max())
