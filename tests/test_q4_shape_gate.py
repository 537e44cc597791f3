"""Round-17 pin: q4's cost-based shape gate.

``q4_order_priority`` picks between two provably equivalent physical
shapes — a DIRECT left-semi join against the filtered 2-column lineitem
projection (best when that side broadcasts: no extra Exchange), and the
round-16 pre-aggregated form (``max(l_shipdate) per orderkey`` before
the join: strictly fewer shuffled bytes when the build side cannot
broadcast). The gate reads the engine's own size estimate against its
own ``autoBroadcastJoinThreshold`` — the same decision the planner
makes for the join itself.

Pins: (a) the two shapes return identical rows on the oracle testdata;
(b) the gate actually switches on the threshold (forcing the threshold
to its floor reproduces the pre-agg plan, the default reproduces the
direct plan at gate scale).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_gate_switches_and_shapes_agree(spark):
    from tile_processor_spark.plans.relational import q4_order_priority

    # default threshold (10 MB) >> sf0.01 lineitem: direct shape
    direct_df = q4_order_priority(spark, SF_ORACLE)
    direct_plan = _plan(direct_df)
    assert "_max_ship" not in direct_plan
    direct_rows = _rows(direct_df)

    # force the threshold to the floor: the gate must fall back to the
    # pre-aggregated shape, and the rows must be identical
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1")
    try:
        preagg_df = q4_order_priority(spark, SF_ORACLE)
        preagg_plan = _plan(preagg_df)
        assert "_max_ship" in preagg_plan
        assert _rows(preagg_df) == direct_rows
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

    # both shapes keep the transferred shipdate bound at the scan
    for plan in (direct_plan, preagg_plan):
        assert "GreaterThan(l_shipdate,1997-01-01" in plan, plan


def test_window_bound_shared_constant(spark):
    """The ADVICE r16 coupling: the orders window lower bound and the
    transferred lineitem bound must be the same constant."""
    from tile_processor_spark.plans import relational
    import inspect

    src = inspect.getsource(relational.q4_order_priority)
    assert relational.Q4_WIN_LO == "1997-01-01"
    # the function must not re-introduce a divergent literal for either
    # the orders window lower bound or the lineitem bound
    assert src.count('F.lit(Q4_WIN_LO)') == 2, src
