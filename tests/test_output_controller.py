"""Output sinks (S8/S9, contract pinned by reference tests/test_output.py)
and controller presets (ControllerFactory parity)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tile_processor_spark.pipeline.controller import (
    ahn_controller,
    example_controller,
    get_controller,
    list_controllers,
)
from tile_processor_spark.pipeline.output import DbOutput, DbParams, DirOutput, Output


@pytest.fixture
def db_params():
    return DbParams(
        dbname="bag3d_db", host="localhost", port=5590,
        user="bag3d_tester", password="bag3d_test", schema="out_schema",
    )


def test_dboutput_dsn_contract(db_params):
    # reference tests/test_output.py:44-62
    dbout = DbOutput(db_params)
    assert dbout.dsn == (
        "PG:dbname=bag3d_db host=localhost port=5590 user=bag3d_tester "
        "password=bag3d_test schemas=out_schema"
    )
    assert dbout.with_table("sometable") == (
        "PG:dbname=bag3d_db host=localhost port=5590 user=bag3d_tester "
        "password=bag3d_test schemas=out_schema tables=sometable"
    )
    dbout.schema = "bla bla"
    assert dbout.dsn.endswith("schemas=bla bla")
    assert dbout.dsn_no_relation() == (
        "PG:dbname=bag3d_db host=localhost port=5590 user=bag3d_tester "
        "password=bag3d_test"
    )
    # tables replacement, not duplication
    dbout2 = DbOutput(db_params, table="old")
    assert dbout2.with_table("new").endswith("tables=new")
    assert "tables=old" not in dbout2.with_table("new")
    assert dbout2.jdbc_url == "jdbc:postgresql://localhost:5590/bag3d_db"


def test_diroutput_and_output(tmp_path, db_params):
    d = DirOutput(tmp_path / "3DBAG")
    assert d.path.is_dir()
    assert d.join_path("AHN") == d.path / "AHN"
    out = Output(dir=d, db=DbOutput(db_params))
    assert out.db.with_table("t").endswith("tables=t")


def test_diroutput_write_partitioned(spark, tmp_path):
    df = spark.createDataFrame(
        [(t, v) for t in ("a", "b") for v in range(3)], "tile_id string, v int"
    )
    d = DirOutput(tmp_path / "out")
    d.write_partitioned(df)
    back = spark.read.parquet(str(d.path))
    assert back.count() == 6
    # partition pruning applies on the tile filter
    assert back.filter(F.col("tile_id") == "a").count() == 3


def test_diroutput_partial_rerun_preserves_other_tiles(spark, tmp_path):
    # Retry semantics: re-writing a SUBSET of tiles (the failed ones)
    # must replace only those partitions — dynamic partition overwrite —
    # not wipe completed tiles the way static overwrite would.
    full = spark.createDataFrame(
        [(t, v) for t in ("a", "b", "c") for v in range(3)], "tile_id string, v int"
    )
    d = DirOutput(tmp_path / "out")
    d.write_partitioned(full)
    retry = spark.createDataFrame([("b", 99)], "tile_id string, v int")
    d.write_partitioned(retry)
    back = spark.read.parquet(str(d.path))
    assert back.filter(F.col("tile_id") == "a").count() == 3
    assert back.filter(F.col("tile_id") == "c").count() == 3
    b_rows = [r.v for r in back.filter(F.col("tile_id") == "b").collect()]
    assert b_rows == [99]


def test_controller_registry():
    assert {"Example", "AHN"} <= set(list_controllers())
    with pytest.raises(KeyError):
        get_controller("nope")


def test_example_controller(spark):
    data = spark.createDataFrame(
        [(t, v) for t in ("a", "b", "c") for v in range(3)], "tile_id string, v int"
    )
    res = example_controller(data, tiles=["a", "b"])
    assert res == {"failed_tiles": [], "nr_success": 2}


def test_ahn_controller_matches_and_skips(spark):
    # 2 tiles; elevation only covers t0 → t1 skipped (P9 existence filter)
    tile_index = spark.createDataFrame(
        [("t0", 0.0, 0.0, 10.0, 10.0), ("t1", 10.0, 0.0, 20.0, 10.0)],
        "tile_id string, xmin double, ymin double, xmax double, ymax double",
    )
    elevation = spark.createDataFrame(
        [(0.0, 0.0, 9.0, 9.0, 2), (1.0, 1.0, 8.0, 8.0, 3)],
        "xmin double, ymin double, xmax double, ymax double, version int",
    )
    features = spark.createDataFrame(
        [("t0", 1), ("t0", 2), ("t1", 3)], "tile_id string, v int"
    )
    def spy_worker(tile_id, pdf, config):
        # executes on an executor: signal via the success channel. The
        # version set arrives as a COLUMN of the tile's own group — the
        # controller must not ship a per-tile dict through the driver.
        if "tile_versions" in config:
            raise AssertionError("versions must not ride in the config dict")
        got = list(pdf["versions"].iloc[0])
        if got != [2, 3]:
            raise AssertionError(f"bad versions for {tile_id}: {got}")
        return pdf

    from tile_processor_spark.pipeline.workers import register_worker

    register_worker("_spy", spy_worker)
    res = ahn_controller(features, tile_index, elevation, "_spy", cell_size=10.0)
    # t1 has no elevation coverage → never reaches the worker (P9);
    # t0's worker asserted versions == [2, 3] (success implies it held).
    assert res == {"failed_tiles": [], "nr_success": 1}

    # The scale contract itself: nothing in ahn_controller materializes
    # per-tile state on the driver.
    import inspect

    from tile_processor_spark.pipeline import controller as controller_mod

    assert ".collect(" not in inspect.getsource(controller_mod.ahn_controller)
