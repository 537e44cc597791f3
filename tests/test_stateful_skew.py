"""Tests: custom stateful streaming operator + salted-join equivalence."""

from __future__ import annotations

from pyspark.sql import functions as F

from tile_processor_spark.pipeline.skew import salted_join
from tile_processor_spark.sources.tables import load_table
from tile_processor_spark.streaming import read_events_stream
from tile_processor_spark.streaming.stateful import running_user_totals

SF = "/root/testdata/sf0.001"


def test_stateful_running_totals_matches_batch(spark, tmp_path):
    src = str(tmp_path / "events_src")
    load_table(spark, "events", SF).write.parquet(src)
    q = (
        running_user_totals(read_events_stream(spark, src))
        .writeStream.format("memory")
        .queryName("stateful_smoke")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # update mode appends one row per user per batch; the final state is
    # the max n_events per user.
    got = {
        r.user_id: r.n_events
        for r in spark.sql(
            "SELECT user_id, MAX(n_events) AS n_events FROM stateful_smoke GROUP BY user_id"
        ).collect()
    }
    want = {
        r.user_id: r.cnt
        for r in load_table(spark, "events", SF)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert got == want


def test_salted_join_equals_plain_join(spark):
    # skewed left: one hot key with 500 rows, 9 cold keys
    rows = [(0, i) for i in range(500)] + [(k, k) for k in range(1, 10)]
    large = spark.createDataFrame(rows, "k int, v int")
    small = spark.createDataFrame([(k, f"dim{k}") for k in range(10)], "k int, name string")
    plain = large.join(small, ["k"]).orderBy("k", "v").collect()
    salted = salted_join(large, small, ["k"], salt=4).orderBy("k", "v").collect()
    assert salted == plain
    # left join keeps unmatched rows
    small2 = small.filter(F.col("k") <= 5)
    plain_l = large.join(small2, ["k"], "left").orderBy("k", "v").collect()
    salted_l = salted_join(large, small2, ["k"], how="left", salt=4).orderBy("k", "v").collect()
    assert salted_l == plain_l


def test_stateful_anomaly_zscore_stream(spark, tmp_path):
    # Feed 7 single-file micro-batches per event type: 6 calm batches
    # (value sum 10 ± small) then one 100× spike — the spike must score
    # |z| >= 3 once enough priors accumulated, calm batches must not.
    from tile_processor_spark.streaming.stateful import running_anomaly_zscore

    src = tmp_path / "stream_src"
    src.mkdir()
    calm = [10.0, 10.5, 9.5, 10.2, 9.8, 10.0]
    for i, v in enumerate(calm + [1000.0]):
        spark.createDataFrame(
            [(i, "2024-01-01 00:00:00", 1, "click", v, "{}")],
            "event_id long, ts string, user_id long, event_type string, value double, props string",
        ).withColumn("ts", F.col("ts").cast("timestamp")).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))
    q = (
        running_anomaly_zscore(read_events_stream(spark, str(src), max_files=1))
        .writeStream.format("memory")
        .queryName("anomaly_smoke")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql(
        "SELECT * FROM anomaly_smoke ORDER BY obs_n"
    ).collect()
    assert [r.obs_n for r in rows] == list(range(1, 8))
    # no z until 5 priors; calm z small; the spike flags
    assert all(r.z is None for r in rows if r.obs_n <= 5)
    spike = rows[-1]
    assert spike.v == 1000.0 and spike.is_anomaly and abs(spike.z) > 3
    assert not any(r.is_anomaly for r in rows[:-1])
