"""The tps_snapshot Python Data Source (Spark 4 connector surface) must
agree with read_snapshot on every axis: latest/time-travel reads,
committed schema (partition dtype included), and manifest-level
partition pruning — which here must shrink the PLANNED partition count,
not just the rows."""

from __future__ import annotations

import pytest

from tile_processor_spark.sources.snapshot_datasource import (
    SnapshotReader,
    register,
)
from tile_processor_spark.sources.snapshots import (
    compact_manifest,
    read_snapshot,
    upsert_snapshot,
    write_snapshot,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def tbl(spark, tmp_path):
    path = str(tmp_path / "ds_tbl")
    df = spark.createDataFrame(
        [("2024", 1, 10.0), ("2024", 2, 20.0), ("2025", 3, 30.0)],
        "yr string, k long, v double",
    )
    write_snapshot(df, path, partition_by=["yr"])
    upd = spark.createDataFrame([("2025", 3, 33.0)], "yr string, k long, v double")
    upsert_snapshot(upd, path, ["k"])  # v2
    register(spark)
    return path


def _read(spark, path, **opts):
    r = spark.read.format("tps_snapshot").option("path", path)
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_matches_read_snapshot_latest_and_time_travel(spark, tbl):
    for v in (1, 2):
        via_fn = read_snapshot(spark, tbl, version=v)
        via_ds = _read(spark, tbl, version=str(v))
        assert via_ds.schema == via_fn.schema  # committed dtype incl. yr string
        assert _rows(via_ds) == _rows(via_fn)
    assert _rows(_read(spark, tbl)) == _rows(read_snapshot(spark, tbl))


def test_partition_filter_prunes_planned_partitions(spark, tbl):
    from tile_processor_spark.sources.snapshots import _read_manifest, list_versions

    manifest = _read_manifest(tbl, list_versions(tbl)[-1])
    all_parts = SnapshotReader(
        _read(spark, tbl).schema, {"path": tbl}
    ).partitions()
    pruned_parts = SnapshotReader(
        _read(spark, tbl).schema,
        {"path": tbl, "partition_filter": '{"yr": "2025"}'},
    ).partitions()
    assert 0 < len(pruned_parts) < len(all_parts)
    got = _read(spark, tbl, partition_filter='{"yr": "2025"}')
    assert _rows(got) == _rows(
        read_snapshot(spark, tbl, partition_filter={"yr": "2025"})
    )
    with pytest.raises(Exception, match="non-partition"):
        _read(spark, tbl, partition_filter='{"k": 1}').collect()
    assert manifest["partition_by"] == ["yr"]


def test_reads_through_grouped_manifest(spark, tbl):
    v3 = compact_manifest(tbl)
    via_ds = _read(spark, tbl, version=str(v3))
    assert _rows(via_ds) == _rows(read_snapshot(spark, tbl, version=v3))


def test_sql_using_clause(spark, tbl):
    spark.sql(
        f"CREATE OR REPLACE TEMPORARY VIEW snap_ds "
        f"USING tps_snapshot OPTIONS (path '{tbl}')"
    )
    got = spark.sql("SELECT yr, k, v FROM snap_ds ORDER BY k").collect()
    assert [tuple(r) for r in got] == [
        ("2024", 1, 10.0), ("2024", 2, 20.0), ("2025", 3, 33.0),
    ]
