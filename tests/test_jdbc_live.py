"""Opt-in live-database tier: the analogue of the reference's
dockerized-PostGIS test tier (reference tests/conftest.py:49-59). The
build sandbox has no database, so this module SKIPS unless
``SPARK_GRAFT_PG_URL`` points at a reachable PostgreSQL —
docs/INTEGRATION.md has the docker recipe. It owns its SparkSession
(the JDBC driver jar must be on the session classpath, which the
shared fixture session doesn't carry)."""

from __future__ import annotations

import os

import pytest

PG_URL = os.environ.get("SPARK_GRAFT_PG_URL")

pytestmark = pytest.mark.skipif(
    not PG_URL,
    reason="live-PG tier: set SPARK_GRAFT_PG_URL (see docs/INTEGRATION.md)",
)

_TABLE = "tps_it_roundtrip"


def _conn_opts() -> dict[str, str]:
    opts = {"url": PG_URL, "driver": "org.postgresql.Driver"}
    if os.environ.get("SPARK_GRAFT_PG_USER"):
        opts["user"] = os.environ["SPARK_GRAFT_PG_USER"]
    if os.environ.get("SPARK_GRAFT_PG_PASSWORD") is not None:
        opts["password"] = os.environ.get("SPARK_GRAFT_PG_PASSWORD", "")
    return opts


@pytest.fixture(scope="module")
def pg_spark():
    from pyspark.sql import SparkSession

    b = (
        SparkSession.builder.master("local[4]")
        .appName("tps-jdbc-live")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
    )
    jar = os.environ.get("SPARK_GRAFT_PG_JAR")
    if jar:
        b = b.config("spark.jars", jar)
    else:
        b = b.config(
            "spark.jars.packages",
            os.environ.get(
                "SPARK_GRAFT_PG_JAR_PKG", "org.postgresql:postgresql:42.7.4"
            ),
        )
    s = b.getOrCreate()
    yield s
    s.stop()


@pytest.fixture(scope="module")
def seeded(pg_spark):
    from pyspark.sql import functions as F

    df = (
        pg_spark.range(0, 10_000)
        .select(
            F.col("id").alias("gid"),
            (F.col("id") % 7).alias("grp"),
            (F.col("id") * 3 + 1).cast("double").alias("val"),
        )
    )
    (
        df.write.format("jdbc")
        .options(**_conn_opts(), dbtable=_TABLE)
        .mode("overwrite")
        .save()
    )
    return df


def test_roundtrip_single_and_partitioned_read(pg_spark, seeded):
    expect = sorted(tuple(r) for r in seeded.collect())
    single = (
        pg_spark.read.format("jdbc").options(**_conn_opts(), dbtable=_TABLE).load()
    )
    assert sorted(tuple(r) for r in single.collect()) == expect
    parted = (
        pg_spark.read.format("jdbc")
        .options(
            **_conn_opts(),
            dbtable=_TABLE,
            partitionColumn="gid",
            numPartitions="4",
            lowerBound="0",
            upperBound="10000",
        )
        .load()
    )
    assert parted.rdd.getNumPartitions() == 4
    assert sorted(tuple(r) for r in parted.collect()) == expect


def test_filter_pushes_to_database(pg_spark, seeded):
    got = (
        pg_spark.read.format("jdbc")
        .options(**_conn_opts(), dbtable=_TABLE)
        .load()
        .filter("grp = 3")
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "grp" in plan
    assert got.count() == sum(1 for i in range(10_000) if i % 7 == 3)


def test_engine_config_drives_live_scan(pg_spark, seeded):
    """The same bag3d-style YAML block the reference consumes opens the
    live table through Engine.jdbc_options unchanged."""
    from urllib.parse import urlparse

    from tile_processor_spark.engine import Engine

    # jdbc:postgresql://host:port/db → the reference's database: block
    parsed = urlparse(PG_URL.removeprefix("jdbc:"))
    cfg = {
        "database": {
            "dbname": parsed.path.lstrip("/"),
            "host": parsed.hostname or "localhost",
            "port": parsed.port or 5432,
            "user": os.environ.get("SPARK_GRAFT_PG_USER"),
            "password": os.environ.get("SPARK_GRAFT_PG_PASSWORD"),
        },
        "features": {"schema": "public", "table": _TABLE, "field": {"pk": "gid"}},
    }
    eng = Engine(spark=pg_spark, config=cfg)
    df = eng.read_jdbc(
        section="features", num_partitions=4, lower_bound=0, upper_bound=10_000
    ).load()
    assert df.count() == 10_000
    assert df.rdd.getNumPartitions() == 4
