"""Z-order layout: key algebra properties (hypothesis, driver-side
reference) and the file-pruning effect of the range-partitioned write."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from tile_processor_spark.sources.layout import write_zordered, zorder_key

cell = st.integers(min_value=0, max_value=1023)


def _morton_ref(xi: int, yi: int, bits: int = 10) -> int:
    z = 0
    for b in range(bits):
        z |= ((xi >> b) & 1) << (2 * b)
        z |= ((yi >> b) & 1) << (2 * b + 1)
    return z


@settings(max_examples=50, deadline=None)
@given(pairs=st.lists(st.tuples(cell, cell), min_size=1, max_size=8, unique=True))
def test_zorder_key_matches_reference(spark, pairs):
    df = spark.createDataFrame(pairs, "xi long, yi long")
    got = {
        (r.xi, r.yi): r.z
        for r in df.select("xi", "yi", zorder_key(F.col("xi"), F.col("yi")).alias("z")).collect()
    }
    for xi, yi in pairs:
        assert got[(xi, yi)] == _morton_ref(xi, yi)


def test_zorder_locality_shared_prefix():
    # All cells inside a 2^k-aligned square share the zkey's high bits.
    base_x, base_y, k = 512, 256, 4
    keys = [
        _morton_ref(base_x + dx, base_y + dy)
        for dx in range(2**k)
        for dy in range(2**k)
    ]
    prefixes = {z >> (2 * k) for z in keys}
    assert len(prefixes) == 1
    # And the square occupies exactly the contiguous zkey range.
    assert max(keys) - min(keys) == 4**k - 1


def test_write_zordered_prunes_files(spark, tmp_path):
    n = 64 * 1024
    df = spark.range(n).select(
        F.col("id"),
        ((F.col("id") * 7919) % 1024).cast("long").alias("xi"),
        ((F.col("id") * 104729) % 1024).cast("long").alias("yi"),
    )
    path = str(tmp_path / "zordered")
    write_zordered(df, path, "xi", "yi", num_files=16)
    files = sorted(glob.glob(f"{path}/part-*.parquet"))
    assert len(files) >= 8
    # A small bbox must be coverable by a minority of files, judged by
    # each file's (xi, yi) min/max stats — the pruning parquet scanners
    # actually perform.
    bx = (100, 160, 100, 160)  # xmin, xmax, ymin, ymax
    touching = 0
    for f in files:
        md = pq.read_metadata(f)
        xmin = min(md.row_group(i).column(1).statistics.min for i in range(md.num_row_groups))
        xmax = max(md.row_group(i).column(1).statistics.max for i in range(md.num_row_groups))
        ymin = min(md.row_group(i).column(2).statistics.min for i in range(md.num_row_groups))
        ymax = max(md.row_group(i).column(2).statistics.max for i in range(md.num_row_groups))
        if not (xmax < bx[0] or xmin > bx[1] or ymax < bx[2] or ymin > bx[3]):
            touching += 1
    assert touching < len(files), "bbox should not touch every z-ordered file"
    # Random (unordered) layout for contrast: every file touches the bbox.
    rnd = str(tmp_path / "random")
    df.repartition(16).write.parquet(rnd)
    rfiles = sorted(glob.glob(f"{rnd}/part-*.parquet"))
    rtouch = 0
    for f in rfiles:
        md = pq.read_metadata(f)
        xmin = min(md.row_group(i).column(1).statistics.min for i in range(md.num_row_groups))
        xmax = max(md.row_group(i).column(1).statistics.max for i in range(md.num_row_groups))
        if xmin <= bx[1] and xmax >= bx[0]:
            rtouch += 1
    assert rtouch == len(rfiles)
    assert touching < rtouch
