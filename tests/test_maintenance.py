"""Small-file compaction: fewer files, identical data, surgical
per-partition rewrites, cheap no-op when already compact."""

from __future__ import annotations

from pyspark.sql import functions as F

from tile_processor_spark.sources.maintenance import (
    _dir_stats,
    compact_dir,
    compact_partitioned,
)


def test_compact_dir_reduces_files_preserves_data(spark, tmp_path):
    path = str(tmp_path / "frag")
    df = spark.range(10_000).select("id", (F.col("id") * 2).alias("v"))
    df.repartition(20).write.parquet(path)
    assert _dir_stats(path)[1] == 20
    before = sorted(r.id for r in spark.read.parquet(path).collect())
    res = compact_dir(spark, path, target_bytes=64 * 1024 * 1024)
    assert res["files_before"] == 20 and res["files_after"] == 1
    after_df = spark.read.parquet(path)
    assert sorted(r.id for r in after_df.collect()) == before
    # second call is a no-op
    res2 = compact_dir(spark, path, target_bytes=64 * 1024 * 1024)
    assert res2["files_before"] == res2["files_after"] == 1


def test_compact_partitioned_only_touches_fragmented(spark, tmp_path):
    path = str(tmp_path / "tiled")
    frag = spark.createDataFrame(
        [("a", i) for i in range(50)], "tile_id string, v int"
    ).repartition(10)
    compact = spark.createDataFrame([("b", 0)], "tile_id string, v int").coalesce(1)
    frag.write.partitionBy("tile_id").parquet(path)
    compact.write.mode("append").partitionBy("tile_id").parquet(path)
    res = compact_partitioned(spark, path, "tile_id", target_bytes=64 * 1024 * 1024)
    assert res["partitions"] == 2 and res["compacted"] == 1
    back = spark.read.parquet(path)
    assert back.count() == 51
    assert back.filter(F.col("tile_id") == "a").count() == 50
