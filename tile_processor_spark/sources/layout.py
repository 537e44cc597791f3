"""Z-order (Morton) spatial file layout — the 100 TB companion to
bucketing for spatial tables.

Hash-bucketing co-locates equal keys; spatial range queries instead
need *nearby* rows co-located. Interleaving the bits of the quantized
(x, y) cell indexes gives a 1-D key whose ordering preserves 2-D
locality: rows inside any 2^k-aligned square share their zkey's high
bits, so sorting files by zkey means a bbox scan touches a contiguous
handful of files/row-groups and parquet min/max stats prune the rest.
This is the standard lakehouse OPTIMIZE ZORDER BY technique, built here
from plain column algebra (no engine extension needed).

The key algebra is exact integer arithmetic, mirrored in SQL by the
``spatial_zorder_keys`` gate query's DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZORDER_BITS = 10  # 1024×1024 cells; raise for finer grids


def zorder_key(xi: Column, yi: Column, bits: int = ZORDER_BITS) -> Column:
    """Morton key of two non-negative integer cell indexes: bit b of xi
    lands at position 2b, bit b of yi at 2b+1. Pure JVM-side integer
    algebra — whole-stage-codegen keeps it in the scan stage."""
    terms = []
    for b in range(bits):
        terms.append(F.shiftleft(F.shiftright(xi, b).bitwiseAND(F.lit(1)), 2 * b))
        terms.append(F.shiftleft(F.shiftright(yi, b).bitwiseAND(F.lit(1)), 2 * b + 1))
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out.cast("long")


def write_zordered(
    df: DataFrame,
    path: str,
    xi_col: str,
    yi_col: str,
    bits: int = ZORDER_BITS,
    num_files: int | None = None,
) -> None:
    """Write ``df`` parquet, range-partitioned and sorted by the Morton
    key of (xi_col, yi_col): each output file covers a contiguous zkey
    range (= a compact 2-D region), so bbox filters prune whole files
    via parquet min/max statistics."""
    keyed = df.withColumn("_zkey", zorder_key(F.col(xi_col), F.col(yi_col), bits))
    parts = num_files or keyed.sparkSession.sparkContext.defaultParallelism
    (
        keyed.repartitionByRange(parts, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
