"""Query registry: each engine capability that is part of the correctness
gate registers a (name, spark_fn, oracle_sql) triple here.

``spark_fn(spark, sf_dir) -> DataFrame`` is the engine's idiomatic-Spark
implementation; ``oracle`` is equivalent ANSI SQL DuckDB runs on the same
parquet tables. ``oracle=None`` marks genuinely non-SQL-expressible ops
(the driver then records a weaker rows-only check).

Float discipline: aggregate money/measure columns through
``DECIMAL(18,4)`` (exact, order-independent) and cast the final result to
``DOUBLE`` — both engines convert the same decimal to the same double, so
value hashes match bit-for-bit regardless of partial-aggregation order.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark_fn: SparkQuery
    oracle: str | None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str, oracle: str | None, doc: str = "", tags: tuple[str, ...] = ()
) -> Callable[[SparkQuery], SparkQuery]:
    def deco(fn: SparkQuery) -> SparkQuery:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(name=name, spark_fn=fn, oracle=oracle, doc=doc, tags=tags)
        return fn

    return deco


# The external correctness gate records only the FIRST 50 registry entries,
# so ordering is part of the verification contract. Rotation policy: a
# query that is driver-green in TWO consecutive rounds yields its slot to
# queries that have never had a driver row (or whose code path changed).
# Round-7 window: drain the backlog to 187/187 ever-driver-green — q1
# (flagship) + the 23 registry rows that have never had a driver row (21
# round-5 additions + 2 round-6 snapshot-store rows) + the 18 rows last
# driver-green in r2/r3 + 4 rows whose code changed this round (sweep
# re-point, KMV jaccard m=0 guard, cached PQ ground truth) + the 4
# stalest r4 rows still on the bench watch list. All 50 passed the
# DuckDB oracle at sf0.01 this round. No new registry queries this
# round (judge directive); additions resume r8 through the
# streaming-store read paths (the remaining r4 rows — TPC-H q3/q4/q5,
# distinct_projection, etc. — rotate alongside them).
_GATE_PRIORITY: tuple[str, ...] = (
    # flagship
    "q1_pricing_summary",
    # round-5/6 additions: never driver-gated (all oracle-green in the
    # r6 full-registry pytest gate at sf0.01)
    "events_twap_hourly",
    "text_bm25_scores",
    "dedup_jaccard_prefix_filtered",
    "events_rolling_median",
    "multimodal_dedup_binary",
    "events_ewma_approx",
    "events_anomaly_intervals",
    "basket_brand_pairs",
    "sketch_hll_by_type",
    "events_sequence_match",
    "spatial_raster_smooth",
    "spatial_region_labeling",
    "events_type_runs",
    "dq_key_skew",
    "orders_cohort_ltv",
    "nation_revenue_hhi",
    "dedup_threshold_curve",
    "dsir_importance_weights",
    "graph_bfs_hops",
    "sample_weighted_priority",
    "events_winsorized_stats",
    "snapshot_time_travel_diff",
    "snapshot_merge_upsert_state",
    # stale rows last driver-green r2/r3
    "spatial_version_boundary_region",
    "spatial_percentile_heights",
    "spatial_rasterize",
    "tile_file_index",
    "spatial_las_class_mapping",
    "multimodal_features",
    "multimodal_resize",
    "text_token_stats",
    "text_quality_scores",
    "dedup_exact",
    "dedup_minhash_pairs",
    "embedding_cosine_topk",
    "text_langid",
    "text_bpe_counts",
    "dedup_ngram_jaccard",
    "text_fingerprint",
    "embedding_near_dup_pairs",
    "ann_ivf_assign",
    # rows whose code changed this round — re-verify (standing policy;
    # the other changed rows are already in the window above)
    "events_active_sessions_sweep",
    "events_sweep_partitioned",
    "sketch_kmv_set_ops",
    "ann_pq_adc_recall",
    # stalest r4-green rows fill the remaining slots
    "q6_revenue_forecast",
    "q10_returned_items",
    "events_tumbling_window",
    "events_asof_join",
    # everything else follows in registration order
)

# Round-8 rotation candidates, in priority order: (a) any row that is
# red in CORRECTNESS_r07; (b) the five streaming-store gate rows
# ALREADY BUILT and oracle-verified in plans/streaming_gate.py
# (stream_kmv_distinct_users, stream_hll_distinct_users,
# stream_cms_event_type_counts, stream_hist_quantiles,
# stream_topk_heavy_users — wrap STAGED_R8_QUERIES with @register)
# plus spatial_percentile_heights_approx (plans/spatial_gate.py, rank-
# bound equivalence already pinned); (c) rows whose code changes in
# round 8; (d) the stalest remaining r4/r5 rows by last-verified round
# (q2/q3/q4/q5, distinct_projection, isin_filter, ...).


def all_specs() -> dict[str, QuerySpec]:
    """Import every module that registers queries, then return the registry
    ordered so gate-critical queries come first (see ``_GATE_PRIORITY``)."""
    # Imports deferred so a syntax error in one module is loud, not silent.
    import tile_processor_spark.plans.relational  # noqa: F401
    import tile_processor_spark.plans.relational_ext  # noqa: F401
    import tile_processor_spark.plans.relational_ext2  # noqa: F401
    import tile_processor_spark.plans.relational_ext3  # noqa: F401
    import tile_processor_spark.plans.relational_ext4  # noqa: F401
    import tile_processor_spark.plans.relational_ext5  # noqa: F401
    import tile_processor_spark.plans.llm_ops  # noqa: F401
    import tile_processor_spark.plans.pipeline_ops  # noqa: F401
    import tile_processor_spark.plans.ann_kmeans  # noqa: F401
    import tile_processor_spark.plans.ann_pq  # noqa: F401
    import tile_processor_spark.plans.dsir  # noqa: F401
    import tile_processor_spark.plans.spatial_gate  # noqa: F401
    import tile_processor_spark.plans.events_windows  # noqa: F401
    import tile_processor_spark.plans.multimodal_gate  # noqa: F401
    import tile_processor_spark.plans.sketches  # noqa: F401
    import tile_processor_spark.plans.ann_eval  # noqa: F401
    import tile_processor_spark.plans.dedup_eval  # noqa: F401
    import tile_processor_spark.plans.graph_ops  # noqa: F401
    import tile_processor_spark.plans.entity_ops  # noqa: F401
    import tile_processor_spark.plans.modern_sql  # noqa: F401
    import tile_processor_spark.plans.semantic_ops  # noqa: F401
    import tile_processor_spark.plans.snapshot_gate  # noqa: F401
    import tile_processor_spark.plans.timeseries_ops  # noqa: F401

    rank = {name: i for i, name in enumerate(_GATE_PRIORITY)}
    reg_order = {name: i for i, name in enumerate(REGISTRY)}
    ordered = sorted(
        REGISTRY, key=lambda n: (rank.get(n, len(rank)), reg_order[n])
    )
    return {name: REGISTRY[name] for name in ordered}
