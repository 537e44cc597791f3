"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata, processed via Arrow-batched ``mapInPandas``.

Decode steps that need codec libraries (not present in this
environment) are stubbed behind ``decode_payload`` with a
deterministic fake; the Spark-side plumbing — schema, batch iteration,
partitioning, UDF signatures — is real and oracle-tested.
"""

from tile_processor_spark.multimodal.ops import (  # noqa: F401
    decode_payload,
    extract_features,
    frame_sample,
    make_assets,
)
