"""Run the staged streaming-store gate plans through the same DuckDB
compare the driver gate uses (``testing.oracle.compare_query``): the
store build folds events through three micro-batches plus a replayed
final batch, and the oracle recomputes the full-stream sketch state
from plain SQL — so merge, swap-commit, replay-guard, and estimator
bugs all break value parity. Round 8 registers these three names; the
compare here is identical to what the driver will run."""

from __future__ import annotations

import pyspark.sql.functions as F

from tile_processor_spark.plans.streaming_gate import (
    STAGED_R8_QUERIES,
    _build_stores,
)
from tile_processor_spark.testing.oracle import compare_query

SF = "/root/testdata/sf0.01"


def test_staged_streaming_gate_rows_match_oracle(spark):
    for name, (fn, oracle) in STAGED_R8_QUERIES.items():
        r = compare_query(spark, name, fn, oracle, SF)
        assert r.ok, (name, r)


def test_cms_overestimate_guarantee(spark):
    fn, _ = STAGED_R8_QUERIES["stream_cms_event_type_counts"]
    rows = fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["est_cnt"] >= r["true_cnt"], r


def test_hist_estimates_bracket_exact_percentiles(spark):
    # histogram quantile error is bounded by one bin width
    fn, _ = STAGED_R8_QUERIES["stream_hist_quantiles"]
    from tile_processor_spark.sources.tables import load_table

    est = {r["event_type"]: r for r in fn(spark, SF).collect()}
    ev = load_table(spark, "events", SF).filter(F.col("value").isNotNull())
    rng = ev.agg(F.min("value"), F.max("value")).collect()[0]
    bin_w = (rng[1] - rng[0]) / 512
    exact = {
        r["event_type"]: r
        for r in ev.groupBy("event_type")
        .agg(
            F.expr("percentile(value, 0.50)").alias("p50"),
            F.expr("percentile(value, 0.95)").alias("p95"),
        )
        .collect()
    }
    assert est and set(est) == set(exact)
    for t, e in est.items():
        assert abs(e["p50_est"] - exact[t]["p50"]) <= 2 * bin_w, (t, e)
        assert abs(e["p95_est"] - exact[t]["p95"]) <= 2 * bin_w, (t, e)


def test_store_build_is_memoized(spark):
    a = _build_stores(spark, SF)
    b = _build_stores(spark, SF)
    assert a == b


def test_kmv_store_replay_equals_full_stream_bottom_k(spark):
    # the store's bottom-k equals the bottom-k of the full static
    # stream (set-min merge is micro-batch invariant)
    import os

    from tile_processor_spark.sources.tables import load_table
    from tile_processor_spark.streaming.kmv import (
        kmv_batch_hashes,
        read_kmv_store,
    )

    root, _, _ = _build_stores(spark, SF)
    store = sorted(
        r["h"] for r in read_kmv_store(spark, os.path.join(root, "kmv")).collect()
    )
    full = sorted(
        r["h"]
        for r in kmv_batch_hashes(
            load_table(spark, "events", SF), "user_id"
        ).collect()
    )
    assert store == full
