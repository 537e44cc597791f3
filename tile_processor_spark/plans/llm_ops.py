"""LLM training-data pipeline operators (dedup, similarity, text stats).

Filled in incrementally; see tile_processor_spark/operators/ for the
reusable implementations.
"""

from __future__ import annotations
