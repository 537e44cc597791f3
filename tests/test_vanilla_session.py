"""VANILLA-SESSION tier: the driver's correctness gate runs every query
on a bare ``SparkSession.builder`` session — NOT the engine's
``get_spark()`` factory — so a gate row that silently depends on a conf
``session.py`` sets can be green across the whole local suite and still
red at the gate. CORRECTNESS_r12 proved the hole: the snapshot
connector's reader advertised ``pushFilters`` while only the engine's
factory enabled ``spark.sql.python.filterPushdown.enabled``, so the one
row reading through ``spark.read.format('tps_snapshot')`` raised
``[DATA_SOURCE_PUSHDOWN_DISABLED]`` on the driver's session and nowhere
else. This tier re-runs the datasource-backed gate rows in a SUBPROCESS
whose session is built exactly like the driver's (bare builder, no
engine confs), and pins the two escape hatches:

- ``register()`` enables the pushdown conf, so the default read works
  on a vanilla session (the r12 failure, now green);
- ``.option("pushdown", "false")`` selects a pushFilters-free reader
  for environments whose admin pins the conf off;
- the conf-off + pushdown-advertised combination still fails LOUDLY
  (Spark's own contract) — guarding that the reader-class split keeps
  meaning something if someone later merges the classes back.

One subprocess, one extra JVM (~30 s): the cost of never shipping this
bug class again.
"""

from __future__ import annotations

import json
import subprocess
import sys

SF_SMOKE = "/root/testdata/sf0.001"

_SCRIPT = r"""
import json, sys
from pyspark.sql import SparkSession

# the driver's gate session: bare builder, no engine confs (UI off and
# small driver memory are environmental, not SQL semantics)
spark = (
    SparkSession.builder.master("local[4]")
    .appName("tps-vanilla-gate")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "4g")
    .getOrCreate()
)
out = {}
assert (
    spark.conf.get("spark.sql.python.filterPushdown.enabled") == "false"
), "precondition: a vanilla Spark 4.1 session has pushdown OFF"

from tile_processor_spark.plans.registry import REGISTRY
from tile_processor_spark.plans import snapshot_gate  # noqa: F401 - registers rows

# 1. the r12-red row, exactly as the driver runs it
rows = REGISTRY["snapshot_datasource_read"].spark_fn(spark, sys.argv[1]).collect()
out["datasource_read_rows"] = len(rows)
out["datasource_read_statuses"] = sorted({r["status"] for r in rows})

# register() has now run inside the row; table path for the raw reads
from tile_processor_spark.plans.snapshot_gate import _build_partitioned
table = _build_partitioned(spark, sys.argv[1])

# 1b. the s3-NATIVE write+append+read loop on the bare session (round
# 14): executors PUT through the in-process endpoint, the driver
# commits via conditional PUT, the read plane resolves it back
from tile_processor_spark.testing.fake_s3 import start_fake_s3
srv = start_fake_s3("VKEY", "vsecret")
host, port = srv.server_address
s3opts = {
    "path": "s3://vanilla-bucket/warehouse/vtbl",
    "s3_endpoint": f"http://{host}:{port}",
    "s3_access_key": "VKEY",
    "s3_secret_key": "vsecret",
}
for lo, hi, mode in ((0, 3, "overwrite"), (3, 5, "append")):
    w = spark.range(lo, hi).selectExpr("id AS k").write.format("tps_snapshot")
    for k, v in s3opts.items():
        w = w.option(k, v)
    w.mode(mode).save()
r = spark.read.format("tps_snapshot")
for k, v in s3opts.items():
    r = r.option(k, v)
out["s3_native_rows"] = sorted(x.k for x in r.load().collect())
out["s3_rejections"] = len(srv.rejections)

# 1c. the FUNCTION API against s3:// paths on the bare session (round
# 15): write_snapshot / append_snapshot / upsert_snapshot /
# read_snapshot route through the connector, needing no engine confs
from tile_processor_spark.sources.snapshots import (
    append_snapshot, read_snapshot, upsert_snapshot, write_snapshot,
)
fn_opts = {k: v for k, v in s3opts.items() if k != "path"}
fn_url = "s3://vanilla-bucket/warehouse/vfn"
v1 = write_snapshot(
    spark.range(0, 3).selectExpr("id AS k", "CAST(id AS double) AS v"),
    fn_url, s3_options=fn_opts,
)
v2 = append_snapshot(
    spark.range(3, 5).selectExpr("id AS k", "CAST(id AS double) AS v"),
    fn_url, s3_options=fn_opts,
)
v3 = upsert_snapshot(
    spark.range(4, 6).selectExpr("id AS k", "CAST(id * 10 AS double) AS v"),
    fn_url, ["k"], s3_options=fn_opts,
)
out["fn_versions"] = [v1, v2, v3]
out["fn_rows"] = sorted(
    (x.k, x.v)
    for x in read_snapshot(spark, fn_url, s3_options=fn_opts).collect()
)

# 2. conf pinned off by an admin AFTER register: opt-out option works
spark.conf.set("spark.sql.python.filterPushdown.enabled", "false")
n_optout = (
    spark.read.format("tps_snapshot")
    .option("path", table)
    .option("pushdown", "false")
    .load()
    .count()
)
out["optout_rows"] = n_optout

# 3. conf off + default (pushdown-advertising) reader still fails loudly
try:
    spark.read.format("tps_snapshot").option("path", table).load().count()
    out["conf_off_default"] = "no error"
except Exception as e:  # AnalysisException wraps the worker assertion
    out["conf_off_default"] = (
        "PUSHDOWN_DISABLED" if "PUSHDOWN_DISABLED" in str(e) else f"other: {e}"
    )

# 4. register() RESPECTS an explicit admin pin (ADVICE r13): the conf
# was pinned false above; re-registering must not flip it back
from tile_processor_spark.sources.snapshot_datasource import register as reg_ds
reg_ds(spark)
out["pinned_after_register"] = spark.conf.get(
    "spark.sql.python.filterPushdown.enabled"
)

print("VANILLA_RESULT " + json.dumps(out))
spark.stop()
"""


def test_datasource_gate_rows_on_vanilla_session():
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT, SF_SMOKE],
        capture_output=True,
        text=True,
        timeout=600,
        cwd="/root/repo",
    )
    assert proc.returncode == 0, f"vanilla subprocess failed:\n{proc.stderr[-4000:]}"
    line = next(
        ln for ln in proc.stdout.splitlines() if ln.startswith("VANILLA_RESULT ")
    )
    out = json.loads(line[len("VANILLA_RESULT ") :])
    # the r12 failure: this was 0 rows + AnalysisException on the driver
    assert out["datasource_read_rows"] > 0
    assert out["datasource_read_statuses"] == ["F"]
    # opt-out reads the WHOLE table (all three status partitions)
    assert out["optout_rows"] > out["datasource_read_rows"]
    # Spark's own loud-failure contract still holds for the default
    # reader under a pinned-off conf
    assert out["conf_off_default"] == "PUSHDOWN_DISABLED"
    # register() never overrides an explicit pin (ADVICE r13)
    assert out["pinned_after_register"] == "false"
    # the s3-native write plane works on the driver's bare session and
    # every request it made was signature-verified (round 14)
    assert out["s3_native_rows"] == [0, 1, 2, 3, 4]
    assert out["s3_rejections"] == 0
    # the FUNCTION API's s3 routing works on the bare session too
    # (round 15): three commits, upsert replaces k=4 and inserts k=5
    assert out["fn_versions"] == [1, 2, 3]
    assert out["fn_rows"] == [
        [0, 0.0], [1, 1.0], [2, 2.0], [3, 3.0], [4, 40.0], [5, 50.0],
    ]
