"""Streaming deduplication — the ingestion-time arm of the dedup family
(plans.llm_ops holds the batch arms: exact, MinHash-LSH, n-gram Jaccard,
SimHash, rolling-hash fingerprints).

A training-data pipeline ingests documents continuously; deduplicating
at ingestion keeps the corpus append-only-clean instead of re-running
batch dedup over the whole 100 TB corpus per delivery. Semantics:

- ``stream_dedup_exact``: drop re-deliveries of the same normalized-text
  fingerprint. Uses ``dropDuplicatesWithinWatermark`` so the dedup state
  store holds only the watermark horizon (bounded memory at any scale),
  not every fingerprint ever seen — the standard Spark trade: duplicates
  separated by more than the watermark delay both survive and are left
  to the periodic batch pass.
- State is partitioned by fingerprint hash across executors; no
  operator ever sees the whole corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fingerprint_col(text: F.Column) -> F.Column:
    """Same normalized-text md5 fingerprint as the batch ``dedup_exact``
    gate query (lowercase, whitespace-collapsed) — ingestion-time and
    batch dedup agree on what 'identical' means."""
    return F.md5(F.regexp_replace(F.lower(F.trim(text)), r"\s+", " "))


def stream_dedup_exact(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: first delivery of each fingerprint within
    the watermark horizon survives."""
    return (
        docs.withColumn("fingerprint", fingerprint_col(F.col(text_col)))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["fingerprint"])
    )
