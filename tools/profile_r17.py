#!/usr/bin/env python
"""Round-17 measurement harness (guide §1): per headline query, split
the timed cost into (a) DataFrame construction (driver/py4j/analysis),
(b) noop-sink execution, and count jobs/stages/tasks per execution via
the status tracker. Also dumps explain("formatted") to plans/r17/.

Usage: python tools/profile_r17.py [out_prefix] [only_csv]
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS as usual.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import pandas  # noqa: F401


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_prefix = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None

    from tile_processor_spark.session import get_spark
    from tile_processor_spark.plans.registry import all_specs
    from tile_processor_spark.sources.tables import load_tables

    spark = get_spark(app_name="tps-profile-r17")
    sc = spark.sparkContext
    specs = all_specs()
    names = [n for n, s in specs.items() if "headline" in s.tags]
    if only:
        names = [n for n in names if n in only]

    for df in load_tables(spark, sf_dir).values():
        df.count()

    from pyspark.sql.functions import col, pandas_udf

    @pandas_udf("long")
    def _noop_udf(s: pandas.Series) -> pandas.Series:
        return s

    spark.range(0, 10000, 1, 32).select(_noop_udf(col("id"))).write.format(
        "noop"
    ).mode("overwrite").save()

    # warmup (unbilled, like bench.py)
    for name in names:
        specs[name].spark_fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
    spark._jvm.System.gc()

    os.makedirs("/root/repo/plans/r17", exist_ok=True)
    tracker = sc.statusTracker()
    results = {}
    for name in names:
        sc.setJobDescription(f"profile:{name}")
        # construction time (driver-side): build the DataFrame 3x, min
        tc = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            df = specs[name].spark_fn(spark, sf_dir)
            tc = min(tc, time.perf_counter() - t0)
        # explain dump (once)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(f"/root/repo/plans/r17/{name}_{out_prefix}.txt", "w") as f:
            f.write(plan)
        # execution time: noop sink 3x, min; job/stage counts from ids
        te = float("inf")
        jobs = stages = tasks = 0
        for i in range(3):
            ids0 = set(tracker.getJobIdsForGroup(None) or [])
            t0 = time.perf_counter()
            df = specs[name].spark_fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            t1 = time.perf_counter() - t0
            te = min(te, t1)
            if i == 0:
                ids1 = set(tracker.getJobIdsForGroup(None) or [])
                new = ids1 - ids0
                jobs = len(new)
                for jid in new:
                    ji = tracker.getJobInfo(jid)
                    if ji:
                        for sid in ji.stageIds:
                            si = tracker.getStageInfo(sid)
                            if si:
                                stages += 1
                                tasks += si.numTasks
        nsh = plan.count("+- Exchange") + plan.count(":- Exchange")
        nbr = plan.count("BroadcastExchange (")
        results[name] = {
            "construct_s": round(tc, 4),
            "exec_noop_s": round(te, 4),
            "jobs": jobs,
            "stages": stages,
            "tasks": tasks,
            "shuffle_exchanges": nsh,
            "broadcast_exchanges": nbr,
        }
        print(
            f"[profile] {name}: construct={tc:.3f}s exec={te:.3f}s "
            f"jobs={jobs} stages={stages} tasks={tasks} xch={nsh} bx={nbr}",
            file=sys.stderr,
            flush=True,
        )
    # calibration probe for window classification
    calib = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        spark.range(0, 200_000_000, 1, 32).selectExpr("sum(id * 3 + 1)").collect()
        calib = min(calib, time.perf_counter() - t0)
    out = {"calibration": round(calib, 4), "queries": results}
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
