"""Stream enrichment against a snapshot-table dimension that can be
republished mid-stream — the streaming consumer of
``sources/snapshots.py``.

Problem shape: a 100 TB event stream joins a small, slowly-changing
dimension (user tier, tile index version, centroid table). Restarting
the stream on every dimension change is operationally wrong; joining a
live directory is read-torn under concurrent rewrite. The snapshot
manifest solves both: each micro-batch resolves the CURRENT committed
version once (one manifest read), broadcast-joins it, and tags output
rows with the dimension version used — so enrichment is torn-free,
auditable, and picks up dimension updates at the next batch boundary
with no restart.

This is foreachBatch-side logic: the dimension is deliberately NOT a
stream (no state store, no watermark); per-batch re-resolution is the
lakehouse idiom for slowly-changing broadcast dims (Delta's
"stream-static join", with the manifest providing the isolation Delta
gets from its log).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from tile_processor_spark.sources.snapshots import list_versions, read_snapshot


def enrich_batch(
    batch: DataFrame,
    dim_table_path: str,
    out_path: str,
    join_key: str,
) -> None:
    """Broadcast-join one micro-batch against the latest committed
    dimension snapshot and append to ``out_path``. Output carries
    ``dim_version`` — every row is traceable to the exact dimension
    state that enriched it."""
    spark = batch.sparkSession
    versions = list_versions(dim_table_path)
    if not versions:
        raise FileNotFoundError(f"no committed dimension at {dim_table_path}")
    v = versions[-1]
    dim = read_snapshot(spark, dim_table_path, version=v)
    (
        batch.join(F.broadcast(dim), join_key, "left")
        .withColumn("dim_version", F.lit(v).cast("long"))
        .write.mode("append")
        .parquet(out_path)
    )


def start_enriched_stream(
    events: DataFrame,
    dim_table_path: str,
    out_path: str,
    checkpoint_path: str,
    join_key: str = "user_id",
    available_now: bool = True,
) -> StreamingQuery:
    """Continuously enrich an event stream against the snapshot dim."""
    writer = (
        events.writeStream.foreachBatch(
            lambda batch, _epoch: enrich_batch(batch, dim_table_path, out_path, join_key)
        )
        .option("checkpointLocation", checkpoint_path)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
