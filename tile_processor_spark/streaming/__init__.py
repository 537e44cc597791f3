"""Structured-Streaming surface (SURVEY.md §2.9/§7.8: the reference has
no streaming; this is the engine's north-star extension).

The batch definitions in ``plans.events_windows`` are the semantics of
record; this module lifts the same transformations onto ``readStream``
sources with watermarks, so a pipeline developed against the batch gate
runs unchanged over a stream.
"""

from tile_processor_spark.streaming.dedup import (  # noqa: F401
    stream_dedup_exact,
)
from tile_processor_spark.streaming.joins import (  # noqa: F401
    batch_click_purchase_join,
    stream_click_purchase_join,
)
from tile_processor_spark.streaming.stateful import (  # noqa: F401
    running_anomaly_zscore,
    running_user_totals,
    stream_sessionize,
)
from tile_processor_spark.streaming.windows import (  # noqa: F401
    read_events_stream,
    streaming_session_values,
    streaming_tumbling_counts,
)
