"""Configuration surface — YAML pipeline configs plus the schema registry
(tile_processor/controller.py:27-143, cli.py:146-175).

The reference stores registered schema YAMLs in a JSON "db" file and
validates run configs against a fixed top-level shape; both behaviors are
kept. Config shape (bag3d_config.yml layout):

    database: {...}           # ignored here: sources are parquet paths
    features: {schema, table, field: {pk, geometry, uniqueid}}
    features_tiles: {boundaries: {...}, index: {...}}
    elevation: {directories: {path: {file_pattern, priority}}}
    elevation_tiles: {boundaries: {...}, index: {...}}
    output: {dir | database}
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any

import yaml

REQUIRED_TOP_LEVEL = ("features", "elevation", "output")


def parse_configuration(source: str | Path | dict) -> dict[str, Any]:
    """YAML path / YAML text / dict → validated config dict. Plain dicts
    are accepted for embedding (controller.py:211-214 keeps that door
    open for workflow engines)."""
    if isinstance(source, dict):
        cfg = dict(source)
    else:
        p = Path(source)
        text = p.read_text() if p.exists() else str(source)
        cfg = yaml.safe_load(text)
    if not isinstance(cfg, dict):
        raise ValueError("configuration must be a mapping")
    missing = [k for k in REQUIRED_TOP_LEVEL if k not in cfg]
    if missing:
        raise ValueError(f"configuration missing required sections: {missing}")
    return cfg


class SchemaRegistry:
    """register/list/remove named schema files in a JSON db
    (controller.py:27-116)."""

    def __init__(self, db_path: str | Path):
        self.db_path = Path(db_path)

    def _load(self) -> dict[str, str]:
        if self.db_path.exists():
            return json.loads(self.db_path.read_text())
        return {}

    def register(self, name: str, schema_path: str | Path) -> None:
        schema_path = Path(schema_path)
        if not schema_path.exists():
            raise FileNotFoundError(schema_path)
        yaml.safe_load(schema_path.read_text())  # must parse
        db = self._load()
        db[name] = str(schema_path.resolve())
        self.db_path.write_text(json.dumps(db, indent=2, sort_keys=True))

    def list(self) -> dict[str, str]:
        return self._load()

    def remove(self, name: str) -> None:
        db = self._load()
        if name not in db:
            raise KeyError(name)
        del db[name]
        self.db_path.write_text(json.dumps(db, indent=2, sort_keys=True))


# --- YAML config → Spark DataFrames (the CLI run-controller glue) --------

# Engine extension to the bag3d layout: any features / *_tiles.boundaries /
# *_tiles.index / elevation section may carry a ``path:`` key pointing at a
# parquet dataset — the format swap (PostGIS table → parquet) the engine
# applies to the reference's scans. Sections without a path simply yield no
# frame (controllers validate what they actually need).
_FRAME_SECTIONS: dict[str, tuple[str, ...]] = {
    "features": ("features", "path"),
    "tile_index": ("features_tiles", "boundaries", "path"),
    "feature_index": ("features_tiles", "index", "path"),
    "elevation_index": ("elevation_tiles", "boundaries", "path"),
    "elevation_points": ("elevation", "path"),
}


def load_config_frames(spark, cfg: dict[str, Any]) -> dict[str, Any]:
    """Resolve every ``path:``-bearing section of a parsed configuration
    into a DataFrame: {frame_name: DataFrame}. The reference's controllers
    open DB connections from the ``database:`` block (controller.py:375-
    435); the Spark engine reads the parquet swap instead — see
    ``engine.Engine.read_jdbc`` for the native-DSN option builder."""
    frames = {}
    for name, keys in _FRAME_SECTIONS.items():
        node: Any = cfg
        for k in keys:
            node = node.get(k) if isinstance(node, dict) else None
            if node is None:
                break
        if node is not None:
            frames[name] = spark.read.parquet(str(node))
    return frames
