from tile_processor_spark.functions.text import (  # noqa: F401
    PII_PATTERNS,
    pii_counts,
    redact_pii,
)
from tile_processor_spark.functions.udtf import (  # noqa: F401
    ChunkSpans,
    SplitTileId,
    register_udtfs,
)
