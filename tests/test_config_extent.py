"""Unit tests for the config surface and the extent reader (S6/S7 —
driver-side pieces, no Spark needed)."""

from __future__ import annotations

import numpy as np
import pytest

from tile_processor_spark.pipeline.config import SchemaRegistry, parse_configuration
from tile_processor_spark.pipeline.extent import ewkb_hex, read_extent, wkt
from tile_processor_spark.spatial import wkb as _wkb


CFG_YAML = """
features:
  schema: public
  table: footprints
elevation:
  directories:
    /data/ahn3: {file_pattern: "C_{tile}.LAZ", priority: 1}
output:
  dir: /tmp/out
"""


def test_parse_configuration_yaml_and_dict(tmp_path):
    p = tmp_path / "cfg.yml"
    p.write_text(CFG_YAML)
    cfg = parse_configuration(p)
    assert cfg["elevation"]["directories"]["/data/ahn3"]["priority"] == 1
    # plain dicts accepted for embedding (controller.py:211-214)
    assert parse_configuration(dict(cfg)) == cfg


def test_parse_configuration_missing_sections():
    with pytest.raises(ValueError, match="missing required sections"):
        parse_configuration({"features": {}})


def test_schema_registry_roundtrip(tmp_path):
    # controller.py:27-116 register/list/remove contract
    db = tmp_path / "schemas.json"
    reg = SchemaRegistry(db)
    schema = tmp_path / "bag3d.yml"
    schema.write_text(CFG_YAML)
    reg.register("bag3d", schema)
    assert "bag3d" in reg.list()
    reg.remove("bag3d")
    assert reg.list() == {}
    with pytest.raises(KeyError):
        reg.remove("bag3d")
    with pytest.raises(FileNotFoundError):
        reg.register("nope", tmp_path / "missing.yml")


GEOJSON = """
{"type": "FeatureCollection", "features": [
  {"type": "Feature", "properties": {},
   "geometry": {"type": "Polygon",
     "coordinates": [[[0.0, 0.0], [4.0, 0.0], [4.0, 3.0], [0.0, 3.0], [0.0, 0.0]]]}}
]}
"""


def test_read_extent_roundtrip(tmp_path):
    p = tmp_path / "extent.geojson"
    p.write_text(GEOJSON)
    ring, wkb_bytes, ehex = read_extent(p)
    np.testing.assert_array_equal(ring[0], [0.0, 0.0])
    assert _wkb.polygon_bbox(wkb_bytes) == (0.0, 0.0, 4.0, 3.0)
    # EWKB: little-endian, SRID flag + default reference SRID 28992
    assert ehex.startswith("0103000020407100000100000005000000".upper())
    assert wkt(ring) == "POLYGON ((0 0, 4 0, 4 3, 0 3, 0 0))"


def test_read_extent_rejects_multifeature(tmp_path):
    import json

    gj = json.loads(GEOJSON)
    gj["features"] = gj["features"] * 2
    p = tmp_path / "two.geojson"
    p.write_text(json.dumps(gj))
    with pytest.raises(ValueError, match="exactly one feature"):
        read_extent(p)


def test_ewkb_matches_reference_layout():
    # Reference pin (tests/test_tiles.py:17): EWKB begins 0103000020 4071 0000
    # (polygon | SRID flag, little-endian SRID 28992 = 0x7140).
    ring = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]])
    h = ewkb_hex([ring], srid=28992)
    assert h.startswith("010300002040710000")
