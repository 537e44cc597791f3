"""Extent polygon input — ``DbTiles.read_extent`` (tileconfig.py:98-126).

The reference's implementation raises NotImplementedError but its tests
pin the expected behavior: read a single-polygon GeoJSON file and return
(polygon, EWKB hex) where EWKB is little-endian with an SRID field
(tests/test_tiles.py:135-141 pins the EWKB/WKT pair). Here the polygon
becomes the engine's WKB bytes + an EWKB hex string for interop.
"""

from __future__ import annotations

import json
import struct

import numpy as np

from tile_processor_spark.spatial import wkb as _wkb

DEFAULT_SRID = 28992  # reference CRS (EPSG:28992, Dutch RD New)


def read_extent(path: str, srid: int = DEFAULT_SRID) -> tuple[np.ndarray, bytes, str]:
    """GeoJSON file (one Feature/FeatureCollection with one Polygon) →
    (exterior ring (n,2), engine WKB, EWKB hex with SRID).

    Multi-feature files are rejected, like the reference's single-extent
    contract; holes are preserved in the WKB.
    """
    with open(path) as f:
        gj = json.load(f)
    if gj.get("type") == "FeatureCollection":
        feats = gj["features"]
        if len(feats) != 1:
            raise ValueError(f"extent file must contain exactly one feature, got {len(feats)}")
        geom = feats[0]["geometry"]
    elif gj.get("type") == "Feature":
        geom = gj["geometry"]
    else:
        geom = gj
    if geom["type"] != "Polygon":
        raise ValueError(f"extent geometry must be a Polygon, got {geom['type']}")
    rings = [np.asarray(r, dtype=np.float64) for r in geom["coordinates"]]
    return rings[0], _wkb.polygon_wkb(rings), ewkb_hex(rings, srid)


def ewkb_hex(rings: list[np.ndarray], srid: int = DEFAULT_SRID) -> str:
    """Little-endian EWKB (PostGIS flavor: type | 0x20000000, then SRID) —
    the wire format the reference passes to ST_GeomFromEWKB
    (tileconfig.py:128-143)."""
    out = [struct.pack("<BII", 1, _wkb.WKB_POLYGON | 0x20000000, srid)]
    out.append(struct.pack("<I", len(rings)))
    for ring in rings:
        ring = np.asarray(ring, dtype=np.float64)
        if not np.array_equal(ring[0], ring[-1]):
            ring = np.vstack([ring, ring[:1]])
        out.append(struct.pack("<I", len(ring)))
        out.append(ring.astype("<f8").tobytes())
    return b"".join(out).hex().upper()


def wkt(ring: np.ndarray) -> str:
    """WKT of a closed exterior ring (parity surface for the pinned WKT in
    tests/test_tiles.py:17-18)."""
    ring = np.asarray(ring, dtype=np.float64)
    if not np.array_equal(ring[0], ring[-1]):
        ring = np.vstack([ring, ring[:1]])
    coords = ", ".join(f"{x:.10g} {y:.10g}" for x, y in ring)
    return f"POLYGON (({coords}))"
