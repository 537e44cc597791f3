from tile_processor_spark.functions.text import (  # noqa: F401
    PII_PATTERNS,
    pii_counts,
    redact_pii,
)
