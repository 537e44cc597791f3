#!/usr/bin/env python
"""Measure registry queries across scale points (docs/SCALE.md tables).

Runs each named query at each data directory, min-of-N warm, one Spark
session, and prints a step table. Data dirs come from tools/gen_sf1.py
(e.g. ``--relational`` stars at scale 1 and 10) or the driver testdata.

Usage:
    python tools/rehearse_scale.py q1_pricing_summary,q3_shipping_priority \
        /tmp/sf01rel /tmp/sf1rel [runs]

Never run concurrently with another Spark session when the timings
matter (shared-host contention inflates them 20x+).
"""

from __future__ import annotations

import sys
import time


def main() -> None:
    if len(sys.argv) < 4:
        raise SystemExit(__doc__)
    queries = [q for q in sys.argv[1].split(",") if q]
    runs = int(sys.argv[-1]) if sys.argv[-1].isdigit() else 3
    dirs = [d for d in sys.argv[2:] if not d.isdigit()]

    sys.path.insert(0, __file__.rsplit("/", 2)[0])
    from tile_processor_spark.plans.registry import all_specs
    from tile_processor_spark.session import get_spark

    specs = all_specs()
    unknown = [q for q in queries if q not in specs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")
    spark = get_spark(app_name="scale-rehearsal")

    results: dict[str, list[tuple[float, int]]] = {q: [] for q in queries}
    for d in dirs:
        for q in queries:
            fn = specs[q].spark_fn
            fn(spark, d).collect()  # warm: ingest re-layout + plan caches
            best, nrows = 1e9, 0
            for _ in range(runs):
                s = time.perf_counter()
                nrows = len(fn(spark, d).collect())
                best = min(best, time.perf_counter() - s)
            results[q].append((best, nrows))
            print(f"{d:24s} {q:32s} {best:8.2f}s rows={nrows}", flush=True)

    print("\nstep table (vs first dir):")
    for q, pts in results.items():
        base = pts[0][0]
        steps = "  ".join(
            f"{t:.2f}s ({t / max(base, 1e-9):.2f}x)" for t, _ in pts
        )
        print(f"  {q:32s} {steps}")


if __name__ == "__main__":
    main()
