"""Run every registered query against its DuckDB oracle at sf0.01 —
a strict local mirror of the driver's correctness gate."""

from __future__ import annotations

import pytest

from tile_processor_spark.plans.registry import all_specs
from tile_processor_spark.testing.oracle import compare_query

SF_ORACLE = "/root/testdata/sf0.01"

SPECS = all_specs()


@pytest.mark.parametrize("name", sorted(SPECS))
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
