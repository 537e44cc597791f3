"""tile_processor_spark — a PySpark-native tile/batch analytics engine.

A from-scratch, Spark-first reimplementation of the *capabilities* of
``tudelft3d/tile-processor`` (reference at ``/root/reference``, v0.4.2):
tile-based spatial batch processing (tile selection by ID list / polygon
extent, elevation-tile + file matching, per-tile views, worker fan-out with
bounded retry, resource-log analytics), plus the relational / streaming /
LLM-data-pipeline operators a 100 TB training-data pipeline needs
(dedup, similarity search, text analysis, multimodal columns).

Design stance (see SURVEY.md §7):
- DataFrames all the way down; tiles are partition keys.
- Geometry is WKB ``BinaryType`` + bbox columns; predicates are
  numpy-vectorized pandas UDFs with a bbox fast path (no JVM spatial dep).
- Catalyst plans everything relational; custom code only where Spark has
  no native operator (spatial join, minhash-LSH, per-tile workers).
"""

__version__ = "0.1.0"

from tile_processor_spark.engine import Engine  # noqa: F401
from tile_processor_spark.session import get_spark, stop_spark  # noqa: F401
