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
    if name == "events":
        # events.parquet stores ts as TIMESTAMP(NANOS), which Spark's parquet
        # reader rejects unless the legacy nanos-as-long conf is set. Our own
        # session (session.py) sets it at build time, but a vanilla session
        # (e.g. the correctness harness) does not — set it at read time so
        # load_table works on ANY session. Runtime-set is honored by the
        # parquet reader (it is read per-query, not per-session).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        # TIMESTAMP(NANOS) parquet read as long (nanosAsLong); values are
        # µs-precision so integer-dividing to µs is lossless and exact
        # (`div`, not `/`: float division loses bits above 2^53).
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {name: load_table(spark, name, sf_dir) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every table as a temp view so ``spark.sql`` works on the
    same names the DuckDB oracle uses."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
