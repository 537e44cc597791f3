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

    root = _build_stores(spark, SF)
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
