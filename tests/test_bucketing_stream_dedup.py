"""Bucketed co-located joins (shuffle elimination) and streaming
ingestion-time dedup."""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import functions as F

from tile_processor_spark.sources.bucketing import (
    colocated_join,
    count_exchanges,
    write_bucketed,
)
from tile_processor_spark.sources.tables import load_table
from tile_processor_spark.streaming import stream_dedup_exact

SF = "/root/testdata/sf0.001"


@contextmanager
def _conf(spark, key: str, value: str):
    old = spark.conf.get(key, None)
    spark.conf.set(key, value)
    try:
        yield
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    li = load_table(spark, "lineitem", SF)
    orders = load_table(spark, "orders", SF)
    write_bucketed(li, "li_b", ["l_orderkey"], 4, str(tmp_path / "li_b"))
    write_bucketed(orders, "ord_b", ["o_orderkey"], 4, str(tmp_path / "ord_b"))
    try:
        # Force the sort-merge path (the sf0.001 orders table would
        # otherwise broadcast) to show the bucketed SMJ plans no shuffle.
        with _conf(spark, "spark.sql.autoBroadcastJoinThreshold", "-1"):
            joined = colocated_join(spark, "li_b", "ord_b", "l_orderkey", "o_orderkey")
            assert count_exchanges(joined) == 0
            want = li.join(orders, li.l_orderkey == orders.o_orderkey).count()
            assert joined.count() == want

            # The unbucketed equivalent of the same join shuffles both
            # sides — the cost bucketing eliminates.
            plain = li.join(orders, li.l_orderkey == orders.o_orderkey)
            assert count_exchanges(plain) == 2

            # Aggregation on the bucket key also rides the layout.
            agg = spark.table("li_b").groupBy("l_orderkey").count()
            assert count_exchanges(agg) == 0
    finally:
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS ord_b")


def test_stream_dedup_exact(spark, tmp_path):
    docs = (
        load_table(spark, "documents", SF)
        .limit(50)
        .withColumn("ts", F.lit("2026-01-01 00:00:00").cast("timestamp"))
        .select("doc_id", "text", "ts")
    )
    # Re-deliver every document twice (distinct doc_ids, identical text).
    dup = docs.withColumn("doc_id", F.col("doc_id") + 1_000_000)
    src = str(tmp_path / "docs_src")
    docs.unionByName(dup).write.parquet(src)

    stream = (
        spark.readStream.schema("doc_id long, text string, ts timestamp")
        .parquet(src)
    )
    q = (
        stream_dedup_exact(stream)
        .writeStream.format("memory")
        .queryName("dedup_smoke")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT COUNT(*) AS c FROM dedup_smoke").collect()[0].c
    want = docs.select("text").distinct().count()
    assert got == want
