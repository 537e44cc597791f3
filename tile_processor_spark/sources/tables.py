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
    """Read one engine table; ``events`` is normalized to TIMESTAMP.

    .. warning:: Loading ``events`` may MUTATE the passed session, and
       the mutation persists beyond this call: if the parquet carries an
       NTZ timestamp the session timezone is pinned to ``UTC``, and if
       it carries int64 nanos ``spark.sql.legacy.parquet.nanosAsLong``
       stays set (the scan consults it lazily at execution time, so it
       cannot be restored here). On a session you intentionally run in a
       non-UTC timezone this changes the semantics of your OWN later
       timestamp queries — pass a dedicated session
       (``spark.newSession()``) if you need your confs untouched. The
       engine's own sessions already run UTC, so library-created
       sessions are unaffected. Rationale below.
    """
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; known: {TABLE_NAMES}")
    path = f"{sf_dir}/{name}.parquet"
    if name != "events":
        return spark.read.parquet(path)
    # The driver has regenerated events.parquet with different physical
    # ts encodings across rounds; normalize to TIMESTAMP (LTZ) whatever
    # the on-disk flavor so downstream `unix_micros` / `window()` /
    # `session_window()` work uniformly:
    #   - timestamp[us] isAdjustedToUTC=false → Spark TIMESTAMP_NTZ:
    #     pin the session tz to UTC and cast. This deliberately mutates
    #     the session tz (NTZ→LTZ casts are tz-dependent and no
    #     tz-independent conversion exists — verified empirically); the
    #     engine's own sessions already run UTC, and the oracle compare
    #     assumes it. Wall-clock == instant under UTC, so the cast is
    #     exact (epoch-µs verified against DuckDB).
    #   - int64 nanos: TIMESTAMP(NANOS) parquet is rejected by a plain
    #     reader — retry under the legacy nanosAsLong conf and
    #     integer-divide to µs (`div`, not `/`: float division loses
    #     bits above 2^53). The conf stays set for the session: the
    #     scan itself consults it lazily at execution, so restoring it
    #     here would break the very read it enabled. The mutation is
    #     per-session and only fires when the data is actually nanos.
    nanos_conf = "spark.sql.legacy.parquet.nanosAsLong"
    try:
        df = spark.read.parquet(path)
    except Exception:
        spark.conf.set(nanos_conf, "true")
        df = spark.read.parquet(path)
    ts_type = df.schema["ts"].dataType
    if isinstance(ts_type, T.TimestampNTZType):
        # conf.get WITHOUT a default: passing one (even "") makes Spark
        # validate it as a timezone and raise on unset vanilla sessions.
        if spark.conf.get("spark.sql.session.timeZone") != "UTC":
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
