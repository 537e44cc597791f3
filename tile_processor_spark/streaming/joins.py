"""Stream-stream joins — the last major Structured Streaming surface
the engine lacked.

Spark's stream-stream inner join buffers both sides in state; the
watermark plus a time-range join condition lets the engine age state
out (each side keeps only rows the other side could still match).
Shape: purchases attributed to the same user's clicks within the
preceding 30 minutes — the streaming form of the batch
``events_asof_join`` / ``events_first_touch`` attribution family.

The streaming and batch forms share ONE builder (the only difference
is whether watermarks attach), so the "identical predicate" parity the
tests pin is true by construction, not by keeping two copies in sync.

Scale: state size = events within the (watermark + range) horizon per
side, partitioned by the equi-key (user_id) — independent of stream
history length. Without the time-range condition the state would grow
unboundedly; the range predicate is what makes the join viable, so it
is part of this operator's contract, not an optimization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ATTRIBUTION_WINDOW = "30 minutes"


def _click_purchase_join(events: DataFrame, watermark: str | None) -> DataFrame:
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    if watermark is not None:
        clicks = clicks.withWatermark("click_ts", watermark)
        purchases = purchases.withWatermark("purchase_ts", watermark)
    return purchases.join(
        clicks,
        F.expr(
            f"""
            p_user = c_user
            AND click_ts <= purchase_ts
            AND click_ts >= purchase_ts - INTERVAL {ATTRIBUTION_WINDOW}
            """
        ),
    ).select(
        "purchase_id",
        "click_id",
        F.col("p_user").alias("user_id"),
        F.unix_micros("purchase_ts").alias("purchase_us"),
        F.unix_micros("click_ts").alias("click_us"),
        "purchase_value",
    )


def stream_click_purchase_join(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """(purchase, click) pairs: same user, click within the 30 minutes
    before the purchase. ``events`` is a streaming DataFrame of the
    events schema; both sides derive from it by filter (Spark plans two
    stateful sides over the one source)."""
    return _click_purchase_join(events, watermark)


def batch_click_purchase_join(events: DataFrame) -> DataFrame:
    """The batch twin — same builder, no watermarks."""
    return _click_purchase_join(events, None)
