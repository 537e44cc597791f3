"""Tile selection — the ``DbTiles``/``DbTilesAHN`` query surface
(tile_processor/tileconfig.py) as lazy DataFrame ops.

A *tile index* here is any DataFrame with a ``tile_id`` string column
(plus optional geometry/bbox columns); a *feature index* maps features to
tiles. Selection never collects feature data — only the (small) chosen
tile-ID set, mirroring the reference where tile selection is metadata
work and per-tile processing is the heavy phase.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

log = logging.getLogger(__name__)


class TileSet:
    """Immutable wrapper over a tile-index DataFrame.

    Reference parity: ``configure(tiles=[...])`` → :meth:`with_list`,
    ``tiles=['all']`` → :meth:`all_in_index`, ``extent=poly`` →
    :meth:`with_extent`; the ``reorder`` shuffle (tileconfig.py:128-140)
    is :meth:`reorder`.
    """

    def __init__(self, index: DataFrame, tile_col: str = "tile_id"):
        if tile_col != "tile_id":
            index = index.withColumnRenamed(tile_col, "tile_id")
        self.index = index

    def all_in_index(self) -> DataFrame:
        """P2: SELECT DISTINCT tile FROM index (tileconfig.py:218-222)."""
        return self.index.select("tile_id").distinct()

    def with_list(self, tiles: list[str]) -> DataFrame:
        """P3 + J9 (tileconfig.py:196-249): keep requested tiles that
        exist; *warn* about unknown IDs; *raise* if none match."""
        req = self.index.sparkSession.createDataFrame(
            [(t,) for t in tiles], "tile_id string"
        )
        known = self.all_in_index()
        missing = [r.tile_id for r in req.join(known, "tile_id", "left_anti").collect()]
        if missing:
            log.warning("tiles not in index (skipped): %s", sorted(missing))
        found = req.join(known, "tile_id", "left_semi")
        if found.limit(1).count() == 0:
            raise ValueError(f"none of the requested tiles exist in the index: {tiles}")
        return found

    def with_extent(self, features: DataFrame, extent_wkb: bytes) -> DataFrame:
        """within_extent (tileconfig.py:128-194): DISTINCT tiles whose
        features (point x/y + tile_id columns) fall within the extent
        polygon. bbox prefilter keeps the exact UDF off pruned rows."""
        from tile_processor_spark.spatial import wkb as _wkb
        from tile_processor_spark.spatial.udfs import st_contains_point

        x0, y0, x1, y1 = _wkb.polygon_bbox(extent_wkb)
        return (
            features.filter(
                (F.col("x") >= x0) & (F.col("x") <= x1)
                & (F.col("y") >= y0) & (F.col("y") <= y1)
            )
            .filter(st_contains_point(F.lit(extent_wkb), F.col("x"), F.col("y")))
            .select("tile_id")
            .distinct()
        )

    @staticmethod
    def reorder(tiles: DataFrame, seed: int = 42) -> DataFrame:
        """O2 (tileconfig.py:128-140): randomize processing order so heavy
        neighboring tiles spread across executors. With Spark's task
        scheduler this is rarely needed — kept for contract parity, and
        made deterministic via the seed."""
        return tiles.orderBy(F.rand(seed))
