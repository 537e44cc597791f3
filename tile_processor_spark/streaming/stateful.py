"""Custom stateful streaming operators via ``applyInPandasWithState``
(SURVEY §2.9: the reference has none; this is the engine's surface for
per-key running state the built-in window aggregates can't express).

State is per-key and partitioned by the grouping key: 100 TB of events
shard across the state store by user_id; the watermark/timeout bounds
state growth.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double"
STATE_SCHEMA = "n long, total double"


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user cumulative event count + value total, emitted on every
    micro-batch (update mode) — the canonical custom-stateful shape:
    read state, fold the batch, write state, emit."""

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [user_id], "n_events": [n], "total_value": [total]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


ANOMALY_OUTPUT_SCHEMA = (
    "event_type string, obs_n long, v double, z double, is_anomaly boolean"
)
ANOMALY_STATE_SCHEMA = "n long, s1 double, s2 double"

#: Observations required before a z-score is emitted (matches the batch
#: events_rolling_zscore guard) and the |z| alert threshold.
ANOMALY_MIN_OBS = 5
ANOMALY_Z_THRESHOLD = 3.0


def running_anomaly_zscore(events: DataFrame) -> DataFrame:
    """Streaming mirror of the batch ``events_rolling_zscore``: per
    event_type, each micro-batch's value total is one observation in a
    running (n, Σv, Σv²) state; the observation is scored against the
    PRIOR observations' mean/std before being folded in. Emits one row
    per key per batch with a nullable z (null until ANOMALY_MIN_OBS
    priors exist) and an is_anomaly flag at |z| ≥ 3.

    State is three scalars per key — O(#event_types), unbounded input —
    the exact shape ``applyInPandasWithState`` exists for; the windowed
    built-ins cannot express 'score against history, then update it'.
    """

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (event_type,) = key
        n, s1, s2 = state.get if state.exists else (0, 0.0, 0.0)
        v = 0.0
        seen = False
        for pdf in pdfs:
            if len(pdf):
                seen = True
                v += float(pdf["value"].sum())
        if not seen:
            return
        z = None
        if n >= ANOMALY_MIN_OBS:
            mean = s1 / n
            var = (s2 - s1 * s1 / n) / (n - 1)
            if var > 0:
                z = (v - mean) / var**0.5
        state.update((n + 1, s1 + v, s2 + v * v))
        yield pd.DataFrame(
            {
                "event_type": [event_type],
                "obs_n": [n + 1],
                "v": [v],
                "z": [z],
                "is_anomaly": [z is not None and abs(z) >= ANOMALY_Z_THRESHOLD],
            }
        )

    return events.groupBy("event_type").applyInPandasWithState(
        fn,
        outputStructType=ANOMALY_OUTPUT_SCHEMA,
        stateStructType=ANOMALY_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


SESSION_OUTPUT_SCHEMA = (
    "user_id long, session_seq long, n_events long, "
    "start_us long, end_us long, duration_us long"
)
SESSION_STATE_SCHEMA = "seq long, n long, start_us long, last_us long"

#: same gap rule as the batch plans.relational_ext3.sessionize_gap_ids
SESSION_GAP_US = 30 * 60 * 1_000_000


def stream_sessionize(events: DataFrame, gap_us: int = SESSION_GAP_US) -> DataFrame:
    """Streaming twin of the batch ``sessionize_gap_ids``: per-user open
    sessions live in state; a session CLOSES (and is emitted, append
    mode) when a later event arrives past the gap, or when the
    event-time timeout fires after the watermark passes last_event +
    gap — so an idle user's final session still closes without waiting
    for their next visit. State is four scalars per user regardless of
    history length; emissions are immutable (append), exactly what a
    downstream sink wants from sessionization.

    Semantics note: events are processed in event-time order WITHIN a
    batch; late data older than an already-closed session boundary
    starts a new (out-of-order) session rather than rewriting history —
    the same trade every append-mode sessionizer makes; bound lateness
    with the input watermark.
    """

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        cols = [
            "user_id", "session_seq", "n_events", "start_us", "end_us",
            "duration_us",
        ]
        if state.hasTimedOut:
            seq, n, start, last = state.get
            state.remove()
            if n > 0:
                yield pd.DataFrame(
                    [(user_id, seq, n, start, last, last - start)], columns=cols
                )
            return
        seq, n, start, last = state.get if state.exists else (0, 0, 0, 0)
        ts: list[int] = []
        for pdf in pdfs:
            if len(pdf):
                ts.extend(
                    pdf["ts"].values.astype("datetime64[us]").astype("int64").tolist()
                )
        if not ts:
            return
        closed = []
        for t in sorted(ts):
            if n > 0 and t - last > gap_us:
                closed.append((user_id, seq, n, start, last, last - start))
                seq += 1
                n = 0
            if n == 0:
                start = t
            n += 1
            last = t
        state.update((seq, n, start, last))
        # close the open session once the watermark passes last + gap
        state.setTimeoutTimestamp(last // 1000 + gap_us // 1000)
        if closed:
            yield pd.DataFrame(closed, columns=cols)

    return events.withWatermark("ts", "2 hours").groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
