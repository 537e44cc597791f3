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


def test_stream_stream_join_matches_batch(spark, tmp_path):
    # Stream-stream inner join with watermark + time-range condition:
    # replayed with availableNow, the attribution pairs must equal the
    # batch twin's exactly (same predicate, no state semantics leak).
    from tile_processor_spark.streaming import (
        batch_click_purchase_join,
        stream_click_purchase_join,
    )

    # ONE file → one micro-batch: parquet task files are not time-
    # ordered, so a multi-batch replay would advance the watermark past
    # later files' older clicks and (correctly, per streaming
    # semantics) evict them — batch parity holds only when no row is
    # late. Late-drop behavior is the watermark's contract, not this
    # test's subject.
    src = str(tmp_path / "events_src")
    load_table(spark, "events", SF).coalesce(1).write.parquet(src)

    q = (
        stream_click_purchase_join(read_events_stream(spark, src))
        .writeStream.format("memory")
        .queryName("ss_join")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r.purchase_id, r.click_id) for r in spark.sql("SELECT * FROM ss_join").collect()
    )
    want = sorted(
        (r.purchase_id, r.click_id)
        for r in batch_click_purchase_join(load_table(spark, "events", SF)).collect()
    )
    assert got == want and len(got) > 0
    # value columns ride through identically
    v = spark.sql("SELECT SUM(purchase_value) AS s, COUNT(*) AS c FROM ss_join").collect()[0]
    assert v.c == len(want)


def test_stream_sessionize_matches_batch_closed_sessions(spark, tmp_path):
    # One availableNow pass: sessions closed by an IN-BATCH gap must
    # match the batch sessionizer exactly, AND — because availableNow
    # runs a final timeout batch after the watermark advances to
    # max(ts) − 2h — each user's final session is also emitted iff the
    # watermark strictly passed its last_event + gap. Only final
    # sessions active within the trailing (2h + gap) window stay open.
    from tile_processor_spark.plans.relational_ext3 import sessionize_gap_ids
    from tile_processor_spark.streaming import stream_sessionize
    from tile_processor_spark.streaming.stateful import SESSION_GAP_US

    src = str(tmp_path / "events_src")
    ev = load_table(spark, "events", SF)
    ev.coalesce(1).write.parquet(src)
    q = (
        stream_sessionize(read_events_stream(spark, src))
        .writeStream.format("memory")
        .queryName("sess_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.user_id, r.session_seq, r.n_events, r.start_us, r.end_us)
        for r in spark.sql("SELECT * FROM sess_stream").collect()
    }
    batch = sessionize_gap_ids(spark, SF).collect()
    last_seq = {}
    for r in batch:
        last_seq[r.user_id] = max(last_seq.get(r.user_id, -1), r.session_seq)
    max_us = ev.agg(F.max(F.unix_micros("ts"))).collect()[0][0]
    wm_ms = max_us // 1000 - 2 * 3600 * 1000
    want = {
        (r.user_id, r.session_seq, r.n_events, r.start_us, r.end_us)
        for r in batch
        if r.session_seq < last_seq[r.user_id]
        or wm_ms > r.end_us // 1000 + SESSION_GAP_US // 1000
    }
    assert got == want and len(got) > 0
