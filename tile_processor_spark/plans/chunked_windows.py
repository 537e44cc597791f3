"""Halo-chunked trailing-row windows: exact sliding-frame computation
whose parallelism scales with DATA VOLUME, not with the cardinality of
the partition key.

The hazard this solves (measured, docs/SCALE.md §sf10): a window like

    W.partitionBy("event_type").orderBy(...).rowsBetween(-50, 0)

is "partitioned", but ``event_type`` has 5 values — so the whole fact
stream funnels through 5 tasks, and a 10× data step costs ~10× wall
regardless of cluster size (events_rolling_median measured 13.7× on
the sf1 → sf10 rehearsal step). The plan LOOKS scale-safe (no global
window) while behaving like a single-partition sort per key.

The fix is the standard halo (ghost-cell) exchange, all in DataFrame
operators:

1. **Banded global row index** per key: local ``row_number`` within
   (key, time-cell) partitions + exclusive cumulative cell counts per
   key (a window over the per-key CELL SERIES — bounded by the
   calendar, shuffled per key, never the fact grain) → a dense global
   index ``r`` per key, without any low-parallelism fact-grain window.
2. **Chunk** rows by ``r div chunk_rows``; copy the last ``window``
   rows of every chunk to the NEXT chunk as flagged halo rows (each
   row is duplicated at most once).
3. Run the trailing frame within (key, chunk) — thousands of
   independent partitions — and keep only non-halo outputs. Frames of
   kept rows are exactly the global frames: a kept row needs at most
   ``window`` predecessors, and those are present by construction
   (same chunk, or its halo prefix).

Exactness requires only that ``order_cols`` are a total order per key
(include a tiebreaker id). Results are value-identical to the naive
per-key window — the rewritten queries keep their DuckDB oracles
unchanged, which is the correctness gate for the pattern.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

#: rows per chunk — sized so a task sorts a few thousand rows: small
#: enough for thousands-way parallelism at 100 TB, large enough that
#: the per-chunk halo duplication (window/chunk_rows) is noise.
CHUNK_ROWS = 8192

DAY_US = 86_400_000_000


def banded_row_index(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    cell: Column,
) -> DataFrame:
    """Add a dense per-key global row index ``r`` (1-based, ordered by
    ``order_cols``) using the two-pass banded discipline: local ranks
    within (key, cell), plus broadcast exclusive per-cell offsets. The
    only cross-cell window runs on the per-key cell series (calendar-
    bounded), so no fact-grain data ever funnels through few tasks.
    ``cell`` must be a monotone coarsening of the first order column."""
    keys = list(key_cols)
    order = list(order_cols)
    b = df.withColumn("_cell", cell)
    wloc = W.partitionBy(*keys, "_cell").orderBy(*order)
    local = b.withColumn("_lrk", F.row_number().over(wloc))
    counts = b.groupBy(*keys, "_cell").agg(F.count(F.lit(1)).alias("_bc"))
    woff = (
        W.partitionBy(*keys)
        .orderBy("_cell")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    offs = counts.select(
        *keys,
        "_cell",
        F.coalesce(F.sum("_bc").over(woff), F.lit(0)).alias("_off"),
    )
    # the offset table is (keys × occupied cells) — calendar-bounded,
    # broadcastable at any fact volume
    return (
        local.join(F.broadcast(offs), [*keys, "_cell"])
        .withColumn("r", F.col("_off") + F.col("_lrk"))
        .drop("_cell", "_lrk", "_off")
    )


def chunked_trailing_frame(
    indexed: DataFrame,
    key_cols: Sequence[str],
    window: int,
    frame_fn: Callable[[DataFrame, W], DataFrame],
    chunk_rows: int = CHUNK_ROWS,
) -> DataFrame:
    """Evaluate a trailing ``rowsBetween(-window, 0)`` frame over a
    frame ``indexed`` carrying the dense per-key index ``r`` (from
    ``banded_row_index``), chunked for data-proportional parallelism.
    ``frame_fn(df, w)`` receives the haloed frame and the chunk-local
    WindowSpec and must return ``df`` plus its frame columns; halo rows
    (whose frames would be incomplete) are dropped afterwards."""
    keys = list(key_cols)
    base = indexed.withColumn(
        "_chunk", F.floor((F.col("r") - 1) / chunk_rows)
    ).withColumn("_halo", F.lit(False))
    halo = (
        base.filter(((F.col("r") - 1) % chunk_rows) >= chunk_rows - window)
        .withColumn("_chunk", F.col("_chunk") + 1)
        .withColumn("_halo", F.lit(True))
    )
    both = base.unionByName(halo)
    wch = (
        W.partitionBy(*keys, "_chunk")
        .orderBy("r")
        .rowsBetween(-window, 0)
    )
    return frame_fn(both, wch).filter(~F.col("_halo")).drop("_chunk", "_halo")
