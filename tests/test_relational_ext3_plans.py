"""Plan-shape assertions for the round-5 analytic operators — the
100 TB claims in their docstrings, pinned against the physical plan
(the oracle gate already pins their values)."""

from __future__ import annotations

from tile_processor_spark.plans.relational_ext3 import (
    argmax_order_per_customer,
    price_band_assign,
    sessionize_gap_ids,
    stats_second_moments,
    weekly_revenue_wow,
)
from tile_processor_spark.sources.bucketing import count_exchanges

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_argmax_is_partial_aggregate_not_window(spark):
    # The point of min(struct(...)) over row_number(): a map-side
    # combined aggregate (one shuffle of one struct per key per mapper),
    # never a full-partition window sort of the fact table.
    df = argmax_order_per_customer(spark, SF)
    plan = _plan(df)
    assert "Window" not in plan
    assert count_exchanges(df) == 1
    assert "partial_min" in plan or "partial_first" in plan, plan


def test_price_band_join_broadcasts_the_bands(spark):
    plan = _plan(price_band_assign(spark, SF))
    assert "BroadcastNestedLoopJoin" in plan
    # the fact side must NOT shuffle for the join itself; the only hash
    # exchange is the final per-band aggregate
    assert count_exchanges(price_band_assign(spark, SF)) == 1


def test_sessionize_reuses_one_user_shuffle(spark):
    # lag, running sum, and the per-session aggregate all cluster by
    # user_id: one hash exchange end to end.
    assert count_exchanges(sessionize_gap_ids(spark, SF)) == 1


def test_moment_sums_partial_aggregate(spark):
    # Σx/Σx² must partial-aggregate map-side (that is why the query
    # avoids built-in var_samp): expect partial_sum in the plan.
    plan = _plan(stats_second_moments(spark, SF))
    assert "partial_sum" in plan or "partial_count" in plan


def test_wow_window_runs_on_aggregate_not_fact(spark):
    # The un-partitioned lag() window is only safe because it consumes
    # the weekly aggregate: the single-partition exchange must sit ABOVE
    # a hash aggregate, not above the scan.
    plan = _plan(weekly_revenue_wow(spark, SF))
    agg_pos = plan.find("HashAggregate")
    single_pos = plan.find("Exchange SinglePartition")
    assert agg_pos != -1 and single_pos != -1
    # executedPlan prints top-down: the SinglePartition exchange (feeding
    # the window) must appear before (above) at least one HashAggregate
    # it consumes.
    assert single_pos < plan.rfind("HashAggregate")
