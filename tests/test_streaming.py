"""Streaming surface smoke: the streaming window plans produce the same
totals as their batch counterparts when the whole file source is replayed
with trigger(availableNow)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tile_processor_spark.sources.tables import load_table
from tile_processor_spark.streaming import (
    read_events_stream,
    streaming_tumbling_counts,
)

SF = "/root/testdata/sf0.001"


def test_streaming_tumbling_matches_batch(spark, tmp_path):
    # events table is TIMESTAMP(NANOS) parquet — rewrite through the
    # loader once so the stream source reads µs timestamps.
    src = str(tmp_path / "events_src")
    load_table(spark, "events", SF).write.parquet(src)

    stream = read_events_stream(spark, src)
    q = (
        streaming_tumbling_counts(stream)
        .writeStream.format("memory")
        .queryName("tumbling_smoke")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT CAST(SUM(n_events) AS LONG) AS n FROM tumbling_smoke"
    ).collect()[0].n
    want = load_table(spark, "events", SF).count()
    assert got == want
    # per-window parity with the batch plan
    batch = (
        load_table(spark, "events", SF)
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .count()
        .count()
    )
    rows = spark.sql("SELECT COUNT(*) AS c FROM tumbling_smoke").collect()[0].c
    assert rows == batch
