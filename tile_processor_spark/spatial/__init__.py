"""Spatial subsystem: WKB geometry kernel, vectorized predicates, and the
grid-bucketed spatial-join pattern.

The reference (tudelft3d/tile-processor) delegates all spatial predicates
to PostGIS (``ST_Within``/``ST_Intersects``/``ST_UnaryUnion``/…,
``tile_processor/tileconfig.py:170-193, 565-598``). Catalyst has no native
spatial support, so this package provides:

- ``wkb``: standard little-endian WKB encode/decode for Point / Polygon
  (numpy + struct; no GEOS dependency in this environment).
- ``kernel``: numpy-vectorized geometry math — ray-casting
  point-in-polygon, bbox algebra, axis-aligned union area (sweepline).
- ``udfs``: Arrow-batched pandas UDFs wrapping the kernel.
- ``join``: the scale pattern for spatial joins — bbox grid bucketing →
  equi-join on cell → exact-predicate refine. Broadcast the small side
  when it fits; at 100 TB the bucketed equi-join shuffles once on the
  grid cell and AQE handles skewed cells.
"""
