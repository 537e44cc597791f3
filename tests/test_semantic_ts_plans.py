"""Plan-shape assertions for the semantic/time-series/sketch batch
added this round — each operator's 100 TB scale claim pinned against
its physical plan (values are pinned by the oracle gate)."""

from __future__ import annotations

from tile_processor_spark.plans.semantic_ops import (
    embedding_whiten,
    text_bigram_model_score,
)
from tile_processor_spark.plans.timeseries_ops import (
    events_cusum_drift,
    events_interval_overlap,
    events_regression_slope,
)
from tile_processor_spark.sources.bucketing import count_exchanges

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_whiten_broadcasts_dim_stats(spark):
    # The 64-row stats side must broadcast back onto the exploded
    # stream: ONE shuffle total (the per-dimension aggregate), never a
    # sort-merge join keyed on dimension index.
    df = embedding_whiten(spark, SF)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert count_exchanges(df) == 1


def test_interval_overlap_is_equi_join_not_cartesian(spark):
    # The point of the hour-grid explode: the session self-join runs as
    # an ordinary equi-join on the grid cell — no O(n^2) cartesian /
    # nested-loop path anywhere in the plan.
    plan = _plan(events_interval_overlap(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_regression_slope_is_one_partial_aggregate(spark):
    # Five decimal sufficient statistics -> fully map-side combinable:
    # one shuffle (the per-type final aggregate), partial agg present.
    df = events_regression_slope(spark, SF)
    assert count_exchanges(df) == 1
    assert "partial" in _plan(df)


def test_cusum_broadcasts_totals_single_fact_shuffle(spark):
    # Totals (5 rows) broadcast; the fact stream is shuffled exactly
    # once — into the (type, day-cell) window of the banded-extrema
    # form, whose partitioning the per-cell collapse reuses. The other
    # two exchanges are the 5-row totals aggregate and the cell-grain
    # offsets window; nothing past the single window pass is
    # fact-grain.
    df = events_cusum_drift(spark, SF)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    assert "Window" in plan
    assert count_exchanges(df) <= 3
    # the per-cell collapse must NOT re-shuffle: partial agg directly
    # on the window output
    assert "partial" in plan


def test_bigram_score_no_cartesian(spark):
    # Model and heads join back by equi-keys; nothing quadratic.
    plan = _plan(text_bigram_model_score(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_twap_banded_lead_no_type_funnel(spark):
    # banded_next form: every fact-grain exchange lands on (type, day
    # cell) — data-proportional — and the cross-cell stitch/hourly
    # segment aggregates are cell/hour grain. No window may be
    # partitioned by event_type alone (the 5-task funnel class).
    import re

    from tile_processor_spark.plans.timeseries_ops import events_twap_hourly

    df = events_twap_hourly(spark, SF)
    plan = _plan(df)
    assert "Window" in plan
    assert count_exchanges(df) <= 4
    for s in re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
        cols = [c.strip() for c in s.split(",")]
        if cols and cols[0].startswith("event_type"):
            rest = ",".join(cols[1:])
            assert "_cell" in rest or "_chunk" in rest, (
                f"window partitioned by event_type alone: {s[:90]}"
            )


def test_corr_matrix_zero_shuffles(spark):
    # Ten co-moments in ONE global aggregate: pure map-side combine,
    # no hash exchange at all (the single-partition final agg is not a
    # hash shuffle).
    from tile_processor_spark.plans.timeseries_ops import lineitem_corr_matrix

    assert count_exchanges(lineitem_corr_matrix(spark, SF)) == 0


def test_ewma_halo_chunked_no_type_funnel(spark):
    # halo-chunked lag form (banded_row_index + chunked_frame): the
    # trailing-lag window must be partitioned by (event_type, _chunk),
    # and no window may be partitioned by event_type alone. The plan
    # has more exchange NODES than the old single-window form (the
    # union's halo branches re-plan the index subtree; identical
    # shuffles dedupe at runtime via ReusedExchange) — every one is on
    # (type, cell|chunk), never a 5-task funnel.
    import re

    from tile_processor_spark.plans.timeseries_ops import events_ewma_approx

    df = events_ewma_approx(spark, SF)
    plan = _plan(df)
    wspecs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert any("_chunk" in s for s in wspecs), "chunked lag window missing"
    for s in wspecs:
        cols = [c.strip() for c in s.split(",")]
        if cols and cols[0].startswith("event_type"):
            rest = ",".join(cols[1:])
            assert "_cell" in rest or "_chunk" in rest, (
                f"window partitioned by event_type alone: {s[:90]}"
            )


def test_rolling_median_halo_chunked(spark):
    """events_rolling_median serves the halo-chunked plan
    (plans/chunked_windows.py): the frame window must be partitioned by
    (event_type, _chunk) — data-proportional parallelism — and no
    window may be partitioned by event_type ALONE (the 5-task funnel
    the sf10 rehearsal measured at 13.7x; docs/SCALE.md). Every window
    here is partitioned, so the registry-wide sweep's global-window
    checks don't see this shape — this pin does."""
    import re

    from tile_processor_spark.plans.timeseries_ops import events_rolling_median

    plan = _plan(events_rolling_median(spark, SF))
    wspecs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert any("_chunk" in s for s in wspecs), "chunked frame window missing"
    for s in wspecs:
        cols = [c.strip() for c in s.split(",")]
        if cols and cols[0].startswith("event_type"):
            rest = ",".join(cols[1:])
            assert "_chunk" in rest or "_cell" in rest, (
                f"window partitioned by event_type alone: {s[:90]}"
            )


def test_percentile_cont_rank_pick_never_sorts_facts(spark):
    # banded_rank_pick form: the bracketing rows come from counting
    # cells (partial-aggregable) and row-ranking ONLY the target
    # cells; every join is broadcast and no window runs over the raw
    # order stream — the only row_number window is on the broadcast-
    # filtered candidate cells.
    import re

    from tile_processor_spark.plans.timeseries_ops import orders_percentile_cont

    df = orders_percentile_cont(spark, SF)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "partial" in plan
    for s in re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
        cols = [c.strip() for c in s.split(",")]
        if cols and cols[0].startswith("o_orderpriority"):
            assert "_cell" in ",".join(cols[1:]), (
                f"window partitioned by priority alone: {s[:90]}"
            )


def test_bm25_no_cartesian_on_data_paths(spark):
    # corpus scalars may broadcast-nested-loop (1 row); the tf/df/dl
    # joins must be hash joins.
    from tile_processor_spark.plans.semantic_ops import text_bm25_scores

    plan = _plan(text_bm25_scores(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_partitioned_sweep_has_no_fact_grain_global_window(spark):
    # The distributed prefix-sum promise: the only unpartitioned
    # window runs over the DAY series, never the full delta stream.
    # Evidence: the plan's SinglePartition exchanges feed only
    # day-grain inputs (the day-offset window), and the day-partitioned
    # running sum exists.
    from tile_processor_spark.plans.timeseries_ops import (
        events_active_sessions_sweep,
        events_sweep_partitioned,
        sweep_global_baseline,
    )

    plan = _plan(events_sweep_partitioned(spark, SF))
    assert "Window" in plan
    # the day-partitioned local window is present
    assert "partitionspec(day" in plan.lower().replace(" ", "") or "day#" in plan
    # values equal the single-window strategy bit-for-bit; the global
    # single-partition sweep survives ONLY as this unregistered baseline
    a = sorted(map(tuple, sweep_global_baseline(spark, SF).collect()))
    b = sorted(map(tuple, events_sweep_partitioned(spark, SF).collect()))
    assert a == b
    # the registered name now serves the SAME distributed plan
    c = sorted(map(tuple, events_active_sessions_sweep(spark, SF).collect()))
    assert a == c
