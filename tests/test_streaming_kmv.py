"""Streaming KMV bottom-k store == batch bottom-k of the full frame,
under incremental merges, replays, and checkpointed streams; the
estimate follows the shared batch rule including under-full exactness."""

from __future__ import annotations

from pyspark.sql import functions as F

from tile_processor_spark.sources.tables import load_table
from tile_processor_spark.streaming import read_events_stream
from tile_processor_spark.streaming.kmv import (
    KMV_STREAM_K,
    kmv_batch_hashes,
    kmv_store_estimate,
    merge_batch_into_kmv,
    read_kmv_store,
    start_continuous_kmv,
)

SF = "/root/testdata/sf0.001"


def _batch_bottom_k(spark):
    return kmv_batch_hashes(load_table(spark, "events", SF), "user_id")


def _canon(df):
    return sorted(r.h for r in df.collect())


def test_incremental_merges_match_batch(spark, tmp_path):
    ev = load_table(spark, "events", SF)
    store = str(tmp_path / "kmv")
    for k in range(3):
        merge_batch_into_kmv(ev.filter(F.col("event_id") % 3 == k), store)
    assert _canon(read_kmv_store(spark, store)) == _canon(_batch_bottom_k(spark))


def test_replay_is_noop(spark, tmp_path):
    ev = load_table(spark, "events", SF)
    store = str(tmp_path / "kmv")
    merge_batch_into_kmv(ev.filter(F.col("event_id") % 2 == 0), store)
    once = _canon(read_kmv_store(spark, store))
    merge_batch_into_kmv(ev.filter(F.col("event_id") % 2 == 0), store)
    assert _canon(read_kmv_store(spark, store)) == once


def test_streaming_drain_matches_batch_and_underfull_estimate(spark, tmp_path):
    src = str(tmp_path / "src")
    load_table(spark, "events", SF).write.parquet(src)
    store = str(tmp_path / "store")
    q = start_continuous_kmv(
        read_events_stream(spark, src, max_files=1), store, str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    assert _canon(read_kmv_store(spark, store)) == _canon(_batch_bottom_k(spark))
    est = kmv_store_estimate(spark, store).collect()[0]
    true_distinct = (
        load_table(spark, "events", SF)
        .filter(F.col("user_id").isNotNull())
        .select("user_id")
        .distinct()
        .count()
    )
    if est.m < KMV_STREAM_K:
        # under-full sketch saw everything: estimate is EXACT
        assert est.m == true_distinct
        assert est.est_distinct == float(true_distinct)
    else:
        assert abs(est.est_distinct / true_distinct - 1.0) < 0.25


def test_empty_batch_is_noop(spark, tmp_path):
    ev = load_table(spark, "events", SF)
    store = str(tmp_path / "kmv")
    merge_batch_into_kmv(ev, store)
    once = _canon(read_kmv_store(spark, store))
    merge_batch_into_kmv(ev.filter(F.lit(False)), store)
    assert _canon(read_kmv_store(spark, store)) == once
