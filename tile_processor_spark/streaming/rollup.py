"""Incrementally-maintained continuous aggregate — the streaming
materialization of ``plans/events_windows.events_hypertable_rollup``'s
semantics (TimescaleDB continuous aggregates / the lakehouse
merge-into-rollup pattern), with plain parquet as the store.

Shape: ``foreachBatch`` over the event stream; each micro-batch is
aggregated to hour grain, unioned with the CURRENT stored rows for the
hours it touches, re-aggregated, and written back with **dynamic
partition overwrite** — only the touched hour partitions are replaced,
so the merge is idempotent per batch and O(touched hours), never a full
rewrite. Late data within the watermark simply lands in an old hour's
partition and is merged the same way.

Exactness: the stored measures are an exact decimal sum and a count —
both mergeable (sum of sums, sum of counts) — so incremental
maintenance produces bit-identical results to a from-scratch batch
rollup over the same events (``tests/test_streaming_rollup.py`` pins
this equivalence).

Scale: state lives in the store, not the streaming state manager; each
merge reads only the touched partitions (partition pruning on
``h_start_us``) plus the batch. 100 TB of history costs nothing per
batch — the working set is the batch's hour span.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

US = 1_000_000

ROLLUP_SCHEMA = (
    "h_start_us long, event_type string, n_events long, value_sum decimal(18,4)"
)


def _hour_rollup(events: DataFrame) -> DataFrame:
    return events.groupBy(
        ((F.unix_micros("ts") / F.lit(3600 * US)).cast("long") * (3600 * US)).alias(
            "h_start_us"
        ),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,4)")).alias("value_sum"),
    )


def read_rollup(spark: SparkSession, store_path: str) -> DataFrame:
    if not os.path.isdir(store_path) or not any(
        n.startswith("h_start_us=") for n in os.listdir(store_path)
    ):
        return spark.createDataFrame([], ROLLUP_SCHEMA)
    return spark.read.schema(ROLLUP_SCHEMA).parquet(store_path).select(
        "h_start_us", "event_type", "n_events", "value_sum"
    )


def merge_batch_into_rollup(
    batch: DataFrame, store_path: str
) -> None:
    """Merge one (micro-)batch of raw events into the hour-grain store.

    union(current rows for touched hours, batch rollup) → re-aggregate →
    dynamic-overwrite only those hour partitions. The touched-hours
    filter is a partition-pruning IN-list, so the read side never scans
    the full store.
    """
    spark = batch.sparkSession
    # localCheckpoint: the delta feeds both the touched-hours collect and
    # the merge write — without materializing, every micro-batch would
    # re-scan and re-aggregate its source twice. The delta is at most
    # O(touched hours × event types) rows.
    delta = _hour_rollup(batch).localCheckpoint()
    hours = [r.h_start_us for r in delta.select("h_start_us").distinct().collect()]
    if not hours:
        return
    current = read_rollup(spark, store_path).filter(F.col("h_start_us").isin(hours))
    merged = (
        delta.unionByName(current)
        .groupBy("h_start_us", "event_type")
        .agg(
            F.sum("n_events").cast("long").alias("n_events"),
            F.sum("value_sum").cast("decimal(18,4)").alias("value_sum"),
        )
    )
    (
        merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("h_start_us")
        .parquet(store_path)
    )


def start_continuous_rollup(
    events: DataFrame,
    store_path: str,
    checkpoint_path: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Maintain the hour rollup from an event stream via foreachBatch."""
    writer = (
        events.writeStream.foreachBatch(
            lambda batch, _epoch: merge_batch_into_rollup(batch, store_path)
        )
        .option("checkpointLocation", checkpoint_path)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
