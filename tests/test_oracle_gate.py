"""Run every registered query against its DuckDB oracle at sf0.01 —
a strict local mirror of the driver's correctness gate.

This sweep dominates full-suite wall time as the registry grows
(~200+ rows). It SHARDS via environment variables so parallel runners
can split it without pytest-xdist:

    SPARK_GRAFT_ORACLE_SHARDS=4 SPARK_GRAFT_ORACLE_SHARD=0 pytest tests/test_oracle_gate.py &
    ... SHARD=1 ... &  # each in its own process/window

Sharding is deterministic (sorted names, round-robin); the default
(no env vars) runs everything, so plain `pytest tests/` is unchanged
and CI that wants the time back opts in per-process. Sizing datum
(round 11, then ~214 rows — the live count is ``len(SPECS)``):
serial ~6-7 min; 4 concurrent shard processes finish in 3.7 min wall
(shards 2:56-3:41 each) — correctness runs may overlap, only TIMING
runs must not."""

from __future__ import annotations

import os

import pytest

from tile_processor_spark.plans.registry import all_specs
from tile_processor_spark.testing.oracle import compare_query

SF_ORACLE = "/root/testdata/sf0.01"

SPECS = all_specs()

_N_SHARDS = int(os.environ.get("SPARK_GRAFT_ORACLE_SHARDS", "1"))
_SHARD = int(os.environ.get("SPARK_GRAFT_ORACLE_SHARD", "0"))
_NAMES = [
    n for i, n in enumerate(sorted(SPECS)) if i % _N_SHARDS == _SHARD
]


@pytest.mark.parametrize("name", _NAMES)
def test_oracle_match(spark, name):
    spec = SPECS[name]
    res = compare_query(spark, name, spec.spark_fn, spec.oracle, SF_ORACLE)
    assert res.ok, res.detail
    assert res.spark_rows > 0, "query returned no rows — weak test"


def test_events_loader_on_vanilla_session(spark):
    """The driver's correctness gate runs on a VANILLA session (none of
    the engine confs set). newSession() shares the JVM but resets
    session state, so this pins the whole loader path — NTZ detection,
    tz probe, cast — against exactly that environment. Round-4 history:
    a conf.get(key, "") probe passed every engine-session test and
    raised INVALID_CONF_VALUE only on vanilla sessions."""
    ns = spark.newSession()
    spec = SPECS["events_tumbling_window"]
    res = compare_query(ns, "events_tumbling_window", spec.spark_fn, spec.oracle, SF_ORACLE)
    assert res.ok, res.detail
    assert res.spark_rows > 0
