#!/usr/bin/env python
"""Benchmark harness — runs the engine's headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"q1_pricing_summary": sec, ...}, "sf": 0.1}

Each query is executed to completion via the ``noop`` sink (full physical
plan runs; no driver-side materialization cost is measured). A session-level
warm-up scan is run first so JVM/codegen startup is not billed to the first
query.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

import pandas  # module-level: pandas_udf type hints resolve against module globals

# Fixed control subset: the queries benched since round 1, re-measured in
# a FRESH JVM after the main suite so round-over-round drift can be split
# into (a) host/plan changes and (b) shared-JVM suite-growth effects
# (codegen-cache/GC pressure, accumulated lineage). The control sum is
# the suite-size-invariant longitudinal series.
CONTROL_QUERIES = (
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q4_order_priority",
    "q5_local_supplier_volume",
    "q6_revenue_forecast",
    "q10_returned_items",
    "text_quality_scores",
    "dedup_minhash_pairs",
    "embedding_cosine_topk",
    "spatial_point_in_tile_join",
    "spatial_within_extent",
    "spatial_percentile_heights",
    "events_tumbling_window",
    "events_asof_join",
)


# Epoch-consistent relational side star (round 10): the driver's
# mid-round-9 sf0.1 orders regeneration moved o_orderdate to 2017-2023,
# so the TPC-H date predicates (1996/1997) select nothing at sf0.1 and
# the q3/q4/q5/q10 headline numbers measure a big scan feeding EMPTY
# joins. The side star (tools/gen_sf1.py --relational, seed-pinned,
# 1995-2001 epoch, same 600k-lineitem / 1.5M-orders scale) restores
# non-empty join measurement; BASELINE.md records its baseline row.
REL_STAR_QUERIES = (
    "q3_shipping_priority",
    "q4_order_priority",
    "q5_local_supplier_volume",
    "q10_returned_items",
)


def _ensure_rel_star() -> str | None:
    """Generate (once) the seed-pinned epoch-consistent relational star
    and return its directory — or None when generation fails (the side
    bench is diagnostics; it must never fail the bench)."""
    import subprocess

    rel_dir = os.environ.get("SPARK_GRAFT_REL_STAR_DIR", "/tmp/tps_rel_star_m1")
    expected = ["lineitem", "orders", "customer", "supplier", "nation", "region"]
    # stamp ties the cached star to the generator version: a generator
    # change must regenerate, not silently reuse a stale /tmp cache
    stamp_path = os.path.join(rel_dir, ".gen_stamp")
    stamp = "gen_sf1-relational-v1-mult1"
    if all(
        os.path.exists(os.path.join(rel_dir, f"{t}.parquet")) for t in expected
    ) and (
        os.path.exists(stamp_path) and open(stamp_path).read().strip() == stamp
    ):
        return rel_dir
    gen = os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools", "gen_sf1.py")
    try:
        subprocess.run(
            [sys.executable, gen, rel_dir, "1", "--relational"],
            capture_output=True,
            timeout=300,
            check=True,
        )
        with open(stamp_path, "w") as f:
            f.write(stamp)
        return rel_dir
    except Exception:
        return None


def _run_control() -> dict | None:
    """Measure the fixed control subset in its own fresh process BEFORE
    the main session exists (so the two JVMs never coexist). Returns the
    control run's parsed JSON, or None on failure — control is
    diagnostics and must never fail the bench."""
    import subprocess

    env = dict(os.environ)
    env["SPARK_GRAFT_BENCH_ONLY"] = ",".join(CONTROL_QUERIES)
    env["SPARK_GRAFT_BENCH_NO_CONTROL"] = "1"
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            timeout=1200,
        )
        ctl = None
        for line in proc.stdout.splitlines():
            line = line.strip()
            if line.startswith("{"):
                ctl = json.loads(line)
        return ctl
    except Exception:
        return None


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    only_env = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    run_control = not only_env and not os.environ.get("SPARK_GRAFT_BENCH_NO_CONTROL")
    ctl = _run_control() if run_control else None

    from tile_processor_spark.session import get_spark
    from tile_processor_spark.plans.registry import all_specs

    spark = get_spark(app_name="tps-bench")
    specs = all_specs()
    bench_names = [n for n, s in specs.items() if "headline" in s.tags] or sorted(specs)
    if only_env:
        wanted = [n.strip() for n in only_env.split(",") if n.strip()]
        bench_names = [n for n in wanted if n in specs]

    # Warm-up: touch every table once so file listing + footer reads +
    # codegen warmup don't bill to the first measured query.
    from tile_processor_spark.sources.tables import load_tables

    for df in load_tables(spark, sf_dir).values():
        df.count()

    # Pre-warm the Python UDF worker pool (pandas/pyarrow imports happen
    # once per worker); otherwise the first UDF query is billed ~10 s of
    # interpreter startup that is infrastructure, not query cost.
    from pyspark.sql.functions import col, pandas_udf

    @pandas_udf("long")
    def _noop_udf(s: pandas.Series) -> pandas.Series:
        return s

    spark.range(0, 10000, 1, 32).select(_noop_udf(col("id"))).write.format(
        "noop"
    ).mode("overwrite").save()

    # Unbilled warmup pass (JMH-style): the first execution of each plan
    # pays JVM JIT compilation, whole-stage-codegen compilation, and
    # Python-worker fork/import — one-time infrastructure cost, not query
    # cost. Steady-state is what a long-running cluster would see.
    for name in bench_names:
        t0 = time.perf_counter()
        specs[name].spark_fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        print(
            f"[bench] warmup {name}: {time.perf_counter() - t0:.2f}s",
            file=sys.stderr,
            flush=True,
        )

    # No query pins executor storage (materialization points use
    # localCheckpoint, whose blocks the ContextCleaner reclaims), so no
    # clearCache is needed between passes; just clear the warmup pass's
    # garbage now so GC debt isn't billed to the first measured query.
    spark._jvm.System.gc()

    # Host-speed calibration: a fixed JVM-side workload (range-sum, no
    # I/O, no Python). Query wall times only compare across rounds when
    # divided by this — the shared hosts differ round-to-round by 2-3×
    # (measured: identical q6 plan+data, 0.18s on the round-2 host vs
    # 0.6s on the round-4 host).
    # min of 5 spaced attempts: single measurements of this instrument
    # spread up to ~5x on the shared host (external contention); the min
    # over spaced attempts estimates uncontended host capability, which
    # is the quantity a host-speed correction needs.
    calib = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        spark.range(0, 200_000_000, 1, 32).selectExpr("sum(id * 3 + 1)").collect()
        calib = round(min(calib, time.perf_counter() - t0), 4)
        time.sleep(0.5)
    print(f"[bench] calibration range-sum (min/5): {calib:.2f}s", file=sys.stderr, flush=True)

    # I/O-aware calibration companion (round 15, VERDICT r14): the
    # CPU-only range-sum probe is blind to I/O stalls — a stall window
    # that hits the workload but not the probe makes the normalized
    # number look honest when it is not (documented twice in SCALE.md
    # r14). This second component times a fixed parquet scan+agg —
    # file listing, footer decode, column decode, the storage path the
    # workload actually exercises. The probe data regenerates per run
    # (deterministic content) under the default tempdir — NOT /dev/shm,
    # which session.py routes shuffle to — and min-of-5 estimates
    # uncontended capability exactly like the CPU probe. Recorded as a
    # SECOND component; the close normalizes against the combined sum.
    import shutil as _shutil
    import tempfile as _tempfile

    probe_dir = _tempfile.mkdtemp(prefix="tps_bench_ioprobe_")
    try:
        spark.range(0, 10_000_000, 1, 32).selectExpr(
            "id",
            "cast(id % 97 as double) as a",
            "cast(id % 101 as double) as b",
        ).write.mode("overwrite").parquet(probe_dir + "/t")
        io_calib = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            spark.read.parquet(probe_dir + "/t").selectExpr(
                "sum(a * b + id)"
            ).collect()
            io_calib = round(min(io_calib, time.perf_counter() - t0), 4)
            time.sleep(0.5)
    finally:
        _shutil.rmtree(probe_dir, ignore_errors=True)
    print(
        f"[bench] calibration parquet scan+agg (min/5): {io_calib:.2f}s",
        file=sys.stderr,
        flush=True,
    )
    time.sleep(2)

    # Measured passes: two full interleaved rounds, best time per query.
    # The shared host shows intermittent multi-second I/O/scheduling
    # stalls unrelated to the plans; min over interleaved rounds is the
    # standard steady-state estimator under external interference (a
    # stall window can't cover both attempts of the same query), and the
    # warmup pass above already absorbed all one-time compilation cost.
    timings: dict[str, float] = {name: float("inf") for name in bench_names}
    import gc

    for rnd in range(2):
        for name in bench_names:
            t0 = time.perf_counter()
            df = specs[name].spark_fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            took = time.perf_counter() - t0
            timings[name] = round(min(timings[name], took), 4)
            print(f"[bench] round {rnd} {name}: {took:.2f}s", file=sys.stderr, flush=True)
            # Outside the timed window: drop the query's frames NOW so the
            # ContextCleaner reclaims localCheckpoint blocks before the
            # next query runs, instead of letting block-manager debt from
            # earlier queries bill to later ones (the measured shared-JVM
            # suite-growth effect the control pass quantifies).
            del df
            gc.collect()

    # Relational-star side bench: same warmup + min-of-2-interleaved
    # estimator, against the epoch-consistent star, so the join queries
    # are measured doing joins (see REL_STAR_QUERIES note). Result row
    # counts are recorded as the non-empty-join proof.
    rel_out: dict | None = None
    if run_control and not os.environ.get("SPARK_GRAFT_BENCH_NO_RELSTAR"):
        rel_dir = _ensure_rel_star()
        if rel_dir:
            rel_names = [n for n in REL_STAR_QUERIES if n in specs]
            for name in rel_names:  # unbilled warmup (same as main suite)
                specs[name].spark_fn(spark, rel_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
            spark._jvm.System.gc()
            rel_timings = {name: float("inf") for name in rel_names}
            for rnd in range(2):
                for name in rel_names:
                    t0 = time.perf_counter()
                    specs[name].spark_fn(spark, rel_dir).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    took = time.perf_counter() - t0
                    rel_timings[name] = round(min(rel_timings[name], took), 4)
                    print(
                        f"[bench] rel-star round {rnd} {name}: {took:.2f}s",
                        file=sys.stderr,
                        flush=True,
                    )
            rel_out = {
                "relational_star_dir": rel_dir,
                "relational_star_queries": rel_timings,
                "relational_star_sum": round(sum(rel_timings.values()), 4),
                "relational_star_rows": {
                    name: specs[name].spark_fn(spark, rel_dir).count()
                    for name in rel_names
                },
            }

    # Host-normalized headline: raw sum scaled by how fast THIS host runs
    # the fixed calibration workload relative to the pinned round-4
    # reference (0.485 s). A 2×-slower host halves its raw penalty;
    # round-over-round comparisons should read value_calibrated first.
    # Reference re-pinned in round 6 for the min-of-N method (the old
    # 0.485 was a single-shot r4 measurement; min-of-N lands near the
    # uncontended capability, ~0.1 s on this host class). Longitudinal
    # comparisons should read the control_fresh series first and treat
    # value_calibrated as a secondary, method-matched indicator only.
    CALIB_REF_SEC = 0.1
    total = round(sum(timings.values()), 4)
    out = {
        "metric": "headline query wall time (sum)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "calibration_range_sum_sec": calib,
        # method + reference changed in round 6 (see CALIB_REF_SEC note);
        # r1-r5 calibration values are single-shot and NOT comparable.
        "calibration_method": "min_of_5_range_sum",
        "calibration_ref_sec": CALIB_REF_SEC,
        # second probe component (round 15): fixed parquet scan+agg —
        # the I/O-path twin of the CPU probe; the bench close's
        # normalized targets divide by (range_sum + scan_agg) so stall
        # windows that only hit storage still normalize honestly
        "calibration_scan_agg_sec": io_calib,
        "calibration_combined_sec": round(calib + io_calib, 4),
        "value_calibrated": round(total * (CALIB_REF_SEC / calib), 4) if calib > 0 else total,
    }
    if rel_out:
        out.update(rel_out)

    # Fresh-JVM control evidence (measured BEFORE this session started):
    # control_fresh vs control_insuite isolates shared-JVM suite-size
    # effects from real plan/host changes — the fresh-14 series is the
    # suite-size-invariant longitudinal number to compare across rounds.
    if run_control:
        insuite = {n: timings[n] for n in CONTROL_QUERIES if n in timings}
        out["control_insuite_queries"] = insuite
        out["control_insuite_sum"] = round(sum(insuite.values()), 4)
        if ctl:
            out["control_fresh_queries"] = ctl["queries"]
            out["control_fresh_sum"] = ctl["value"]
            out["control_fresh_calibration_sec"] = ctl.get(
                "calibration_range_sum_sec"
            )
            out["control_fresh_calibration_scan_sec"] = ctl.get(
                "calibration_scan_agg_sec"
            )
            if ctl["value"] > 0:
                out["control_insuite_over_fresh"] = round(
                    out["control_insuite_sum"] / ctl["value"], 4
                )
        else:
            out["control_error"] = "control subprocess produced no JSON"

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
