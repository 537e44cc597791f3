"""Incrementally-maintained hour rollup == from-scratch batch rollup,
and partial re-merges only touch their own hour partitions."""

from __future__ import annotations

from pyspark.sql import functions as F

from tile_processor_spark.sources.tables import load_table
from tile_processor_spark.streaming import read_events_stream
from tile_processor_spark.streaming.rollup import (
    _hour_rollup,
    merge_batch_into_rollup,
    read_rollup,
    start_continuous_rollup,
)

SF = "/root/testdata/sf0.001"


def _canon(df):
    return sorted(
        (r.h_start_us, r.event_type, r.n_events, str(r.value_sum))
        for r in df.collect()
    )


def test_incremental_rollup_matches_batch(spark, tmp_path):
    ev = load_table(spark, "events", SF)
    # Split the table into 3 disjoint "deliveries" overlapping in hours
    # (event_id mod), merge each incrementally, compare with one-shot.
    store = str(tmp_path / "rollup_store")
    for k in range(3):
        merge_batch_into_rollup(ev.filter(F.col("event_id") % 3 == k), store)
    got = _canon(read_rollup(spark, store))
    want = _canon(_hour_rollup(ev))
    assert got == want and len(got) > 0


def test_streaming_rollup_foreach_batch(spark, tmp_path):
    src = str(tmp_path / "events_src")
    load_table(spark, "events", SF).write.parquet(src)
    store = str(tmp_path / "store")
    q = start_continuous_rollup(
        read_events_stream(spark, src, max_files=1),
        store,
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    got = _canon(read_rollup(spark, store))
    want = _canon(_hour_rollup(load_table(spark, "events", SF)))
    assert got == want and len(got) > 0


def test_streaming_rollup_checkpoint_restart_exactly_once(spark, tmp_path):
    # Two runs over the SAME checkpoint: run 1 drains files 1-2, run 2
    # sees file 3 added and must process ONLY it — no double counting of
    # the first delivery (exactly-once via the file-source offset log).
    src = tmp_path / "src"
    src.mkdir()
    ev = load_table(spark, "events", SF)
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")

    def deliver(k):
        ev.filter(F.col("event_id") % 3 == k).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))

    deliver(0)
    deliver(1)
    q = start_continuous_rollup(read_events_stream(spark, str(src)), store, ckpt)
    q.awaitTermination(120)
    deliver(2)
    q2 = start_continuous_rollup(read_events_stream(spark, str(src)), store, ckpt)
    q2.awaitTermination(120)
    got = _canon(read_rollup(spark, store))
    want = _canon(_hour_rollup(ev))
    assert got == want
