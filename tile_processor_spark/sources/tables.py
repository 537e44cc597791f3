"""Parquet table sources for the driver-generated testdata star schema.

At scale these would be partitioned/bucketed datasets on object storage;
the reader deliberately stays ``spark.read.parquet`` so Catalyst keeps
predicate pushdown, column pruning, and partition pruning.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; known: {TABLE_NAMES}")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # The driver has regenerated events.parquet with different physical
        # ts encodings across rounds; normalize to TIMESTAMP (LTZ) whatever
        # the on-disk flavor so downstream `unix_micros` / `window()` /
        # `session_window()` work uniformly:
        #   - timestamp[us] isAdjustedToUTC=false → Spark TIMESTAMP_NTZ:
        #     pin the session tz to UTC and cast (wall-clock == instant, so
        #     the cast is exact; epoch-µs values verified against DuckDB).
        #   - int64 nanos (legacy nanosAsLong sessions) → integer-divide to
        #     µs (`div`, not `/`: float division loses bits above 2^53).
        #   - timestamp[us] UTC-adjusted → already TIMESTAMP, passthrough.
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.TimestampNTZType):
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        elif isinstance(ts_type, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {name: load_table(spark, name, sf_dir) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every table as a temp view so ``spark.sql`` works on the
    same names the DuckDB oracle uses."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
