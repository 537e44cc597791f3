#!/usr/bin/env python
"""Oracle-compare a comma-separated list of queries at one or more SF
dirs, and dump each query's formatted plan to plans/r17/<name>_<tag>.txt.

Usage: python tools/check_queries_r17.py q1,q2 sf0.01,sf0.1 [plantag]
"""
from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")


def main() -> None:
    names = sys.argv[1].split(",")
    sfs = sys.argv[2].split(",") if len(sys.argv) > 2 else ["sf0.01"]
    tag = sys.argv[3] if len(sys.argv) > 3 else None

    from tile_processor_spark.session import get_spark
    from tile_processor_spark.testing.oracle import compare_query
    from tile_processor_spark.plans.registry import all_specs

    spark = get_spark(app_name="check-r17")
    specs = all_specs()
    ok = True
    for name in names:
        s = specs[name]
        for sf in sfs:
            sf_dir = f"/root/testdata/{sf}"
            r = compare_query(spark, name, s.spark_fn, s.oracle, sf_dir)
            print(f"{name} @ {sf}: ok={r.ok} rows={r.spark_rows}/{r.oracle_rows} {r.detail}")
            ok = ok and r.ok
        if tag:
            df = s.spark_fn(spark, "/root/testdata/sf0.1")
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(f"/root/repo/plans/r17/{name}_{tag}.txt", "w") as f:
                f.write(plan)
            print(
                f"{name} plan: shuffleX="
                f"{plan.count('+- Exchange') + plan.count(':- Exchange')} "
                f"broadcastX={plan.count('BroadcastExchange (')}"
            )
    print("ALL_OK" if ok else "MISMATCH")
    spark.stop()
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
