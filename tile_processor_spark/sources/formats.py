"""Multi-format dataset IO — the engine-native generalization of the
reference's fixed inputs (PostGIS tables, LAZ directories, TSV logs,
GeoJSON): one reader/writer pair over Spark's built-in sources so a
pipeline can land or ingest the same frame as parquet, ORC, CSV, or
JSON-lines without bespoke code.

Format notes (enforced by ``tests/test_formats_roundtrip.py``):

- ``parquet`` / ``orc``: schema-preserving, splittable, predicate
  pushdown — the only formats the engine recommends for data-plane
  tables at scale.
- ``csv`` / ``json`` (JSON-lines): interchange formats. Reads REQUIRE
  an explicit schema — inference costs an extra full scan and types
  drift between writers, so ``read_any`` refuses to guess
  (``schema=None`` raises for these formats). CSV writes include a
  header; timestamps round-trip as ISO-8601 strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

FORMATS = ("parquet", "orc", "csv", "json")

_SCHEMA_REQUIRED = ("csv", "json")


def write_any(df: DataFrame, path: str, fmt: str = "parquet", **options: str) -> None:
    """Write ``df`` to ``path`` in ``fmt`` (overwrite). CSV gets a header
    so the file is self-describing for humans even though reads use an
    explicit schema."""
    if fmt not in FORMATS:
        raise ValueError(f"unknown format {fmt!r}; supported: {FORMATS}")
    w = df.write.mode("overwrite").format(fmt)
    if fmt == "csv":
        w = w.option("header", "true")
    for k, v in options.items():
        w = w.option(k, v)
    w.save(path)


def read_any(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: T.StructType | str | None = None,
    **options: str,
) -> DataFrame:
    """Read ``path`` as ``fmt``. Text formats (csv/json) REQUIRE a
    schema: inference is an extra full scan and silently drifts types
    (ints→doubles, timestamps→strings) between producers — at 100 TB
    either cost is a bug, so the engine refuses to guess."""
    if fmt not in FORMATS:
        raise ValueError(f"unknown format {fmt!r}; supported: {FORMATS}")
    if fmt in _SCHEMA_REQUIRED and schema is None:
        raise ValueError(
            f"{fmt} reads require an explicit schema (inference scans the "
            "whole dataset and drifts types); pass schema=..."
        )
    r = spark.read.format(fmt)
    if schema is not None:
        r = r.schema(schema)
    if fmt == "csv":
        r = r.option("header", "true")
    for k, v in options.items():
        r = r.option(k, v)
    return r.load(path)
