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
# Round-6 window: burn down the round-5 backlog — all 70 round-5
# additions were judge-verified green vs DuckDB at sf0.01 in r5 but have
# never had a driver row; the window takes q1 (flagship), the eight rows
# whose code or tags change THIS round (RFM/Pareto rewritten to the
# distributed two-pass prefix sum, histogram NULL/degenerate guards, KMV
# set-ops under-full rule + wider key packing, PQ bench trim, sweep
# headline swap), then 41 more round-5 rows in staged order. The r5
# green block (r4 additions, TPC-H q14–q22, spatial gate family) rotates
# out as fresh-green; names not listed keep registration order.
_GATE_PRIORITY: tuple[str, ...] = (
    # flagship
    "q1_pricing_summary",
    # code/tags changed this round — re-verify
    "customer_rfm_segments",
    "pareto_abc_parts",
    "sketch_histogram_quantiles",
    "sketch_kmv_set_ops",
    "ann_pq_codes",
    "ann_pq_adc_recall",
    "events_sweep_partitioned",
    "events_active_sessions_sweep",
    # round-5 additions: never driver-gated (judge-green r5 at sf0.01)
    "window_range_frame_spend",
    "scd2_snapshot_values",
    "sessionize_gap_ids",
    "islands_active_days",
    "price_band_assign",
    "argmax_order_per_customer",
    "stats_second_moments",
    "median_disc_by_priority",
    "weekly_revenue_wow",
    "mode_priority_by_status",
    "events_first_touch",
    "multiset_except_intersect",
    "dedup_minhash_recall",
    "graph_pagerank_fixedpoint",
    "graph_triangle_count",
    "fuzzy_part_name_pairs",
    "user_event_type_bitmap",
    "events_props_variant",
    "spatial_quadtree_rollup",
    "dq_profile_orders",
    "cumulative_distinct_users",
    "rolling_7d_distinct_users",
    "revenue_share_by_nation",
    "leave_one_out_customer_mean",
    "order_quantity_array_hof",
    "events_mad_by_type",
    "window_nth_value",
    "skyline_orders_2d",
    "sketch_hll_distinct",
    "sketch_bloom_membership",
    "dedup_semantic_clusters",
    "text_bigram_model_score",
    "embedding_whiten",
    "events_interval_overlap",
    "events_regression_slope",
    "events_cusum_drift",
    "dedup_containment_pairs",
    "dq_referential_integrity",
    "events_markov_transitions",
    "orders_percentile_cont",
    "lineitem_corr_matrix",
    # everything else follows in registration order
)

# Round-7 rotation candidates, in priority order:
# (a) the remaining round-5 additions, never driver-gated (judge-green
#     r5 at sf0.01): events_twap_hourly, text_bm25_scores,
#     dedup_jaccard_prefix_filtered, events_rolling_median,
#     multimodal_dedup_binary, events_ewma_approx,
#     events_anomaly_intervals, basket_brand_pairs, sketch_hll_by_type,
#     events_sequence_match, spatial_raster_smooth,
#     spatial_region_labeling, events_type_runs, dq_key_skew,
#     orders_cohort_ltv, nation_revenue_hhi, dedup_threshold_curve,
#     dsir_importance_weights, graph_bfs_hops, sample_weighted_priority,
#     events_winsorized_stats;
# (b) the round-6 snapshot-store additions (never driver-gated):
#     snapshot_time_travel_diff, snapshot_merge_upsert_state;
# (c) stale rows last driver-green r2/r3:
#     spatial_version_boundary_region, spatial_percentile_heights,
#     spatial_rasterize, tile_file_index, spatial_las_class_mapping,
#     multimodal_features, multimodal_resize, text_token_stats,
#     text_quality_scores, dedup_exact, dedup_minhash_pairs,
#     embedding_cosine_topk, text_langid, text_bpe_counts,
#     dedup_ngram_jaccard, text_fingerprint, embedding_near_dup_pairs.
# (a)+(b)+(c) = 40 names; the remaining ~10 slots take the stalest
# r4-green rows by last-verified round.


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
