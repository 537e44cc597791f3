"""Spatial correctness-gate queries: geometry synthesized deterministically
from the relational testdata; the engine runs its real WKB kernel, the
DuckDB oracle verifies with plain arithmetic.
"""

from __future__ import annotations
