#!/usr/bin/env python
"""Measure the tps_postgres connector against a real local server:
COPY write throughput, single vs partitioned read throughput, and
pushdown selectivity — the connector's docs/SCALE.md numbers.

Starts its own PostgreSQL (same recipe as tests/test_postgres_live.py),
seeds N rows server-side, and times: full read (1 task), partitioned
read (8 tasks), pushed-down selective read, and a Spark->PG COPY write
of the full table. Run on a calm host, nothing else on Spark.

    python tools/rehearse_pg.py [--rows 1000000]
"""

from __future__ import annotations

import argparse
import os
import shutil
import socket
import subprocess
import sys
import tempfile
import time

PG_BIN = "/usr/lib/postgresql/15/bin"


def _as_pg(cmd):
    if os.geteuid() == 0:
        return ["setpriv", "--reuid=postgres", "--regid=104", "--clear-groups"] + cmd
    return cmd


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--rows", type=int, default=1_000_000)
    ns = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    root = tempfile.mkdtemp(prefix="tps_pgbench_", dir="/tmp")
    data = os.path.join(root, "data")
    if os.geteuid() == 0:
        shutil.chown(root, user="postgres")
    s = socket.socket(); s.bind(("127.0.0.1", 0)); port = s.getsockname()[1]; s.close()
    subprocess.run(
        _as_pg([f"{PG_BIN}/initdb", "-D", data, "--auth=trust", "-U", "tps"]),
        check=True, capture_output=True, cwd=root,
    )
    subprocess.run(
        _as_pg([f"{PG_BIN}/pg_ctl", "-D", data, "-o", f"-p {port} -k {root}",
                "-l", os.path.join(root, "log"), "start"]),
        check=True, capture_output=True, cwd=root,
    )
    try:
        from tile_processor_spark.session import get_spark
        from tile_processor_spark.sources.pgwire import PGConnection
        from tile_processor_spark.sources.postgres_datasource import register

        conn = PGConnection(port=port, user="tps", database="postgres")
        conn.execute("CREATE TABLE src (k bigint NOT NULL, grp int, v float8, s text)")
        t0 = time.perf_counter()
        conn.execute(
            f"INSERT INTO src SELECT g, g % 97, g * 0.5, 'row-' || g "
            f"FROM generate_series(1, {ns.rows}) g"
        )
        print(f"seeded {ns.rows:,} rows server-side in {time.perf_counter()-t0:.1f}s")

        spark = get_spark(app_name="pg-rehearsal", shuffle_partitions=8)
        register(spark)
        base = {
            "host": "127.0.0.1", "port": str(port), "user": "tps",
            "database": "postgres", "dbtable": "src",
        }

        def load(**extra):
            r = spark.read.format("tps_postgres")
            for k, v in {**base, **extra}.items():
                r = r.option(k, str(v))
            return r.load()

        for label, extra in (
            ("single-task full read", {}),
            ("8-partition parallel read", {
                "partition_column": "k", "lower_bound": 1,
                "upper_bound": ns.rows, "num_partitions": 8,
            }),
        ):
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                n = load(**extra).count()
                best = min(best, time.perf_counter() - t0)
            print(f"{label}: {best:.2f}s ({n/best/1e6:.2f} M rows/s)")

        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            n_sel = load().filter("k > %d" % (ns.rows - 1000)).count()
            best = min(best, time.perf_counter() - t0)
        print(f"pushed-down selective read ({n_sel} rows): {best:.2f}s")

        conn.execute("CREATE TABLE dst (k bigint, grp int, v float8, s text)")
        df = load(partition_column="k", lower_bound=1,
                  upper_bound=ns.rows, num_partitions=8)
        t0 = time.perf_counter()
        df.write.format("tps_postgres").options(
            **{**base, "dbtable": "dst"}
        ).mode("append").save()
        w = time.perf_counter() - t0
        n_dst = int(conn.query("SELECT count(*) FROM dst")[1][0][0])
        print(f"COPY write of {n_dst:,} rows (8 tasks): {w:.2f}s "
              f"({n_dst/w/1e6:.2f} M rows/s)")
        conn.close()
    finally:
        subprocess.run(
            _as_pg([f"{PG_BIN}/pg_ctl", "-D", data, "stop", "-m", "immediate"]),
            capture_output=True, cwd=root,
        )
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
