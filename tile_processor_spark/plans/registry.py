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
# so ordering is part of the verification contract. The window is no
# longer hand-curated prose: ``tools/gate_rotation.py`` derives it from
# the CORRECTNESS_r*.json history (flagship → red rows → declared
# changed rows → never-gated rows → stalest-first), and
# ``tests/test_gate_rotation.py::test_current_gate_priority_matches_derived_window``
# pins that this list IS the tool's output for the checked-in history +
# ``_ROUND_CHANGED`` — regenerate with
#   python tools/gate_rotation.py --changed <names>
# whenever the round's changed-row set or the correctness history moves.

#: the round this gate window was staged FOR: the window is derived
#: from CORRECTNESS rounds strictly below this, so the driver
#: depositing this round's own file mid-round cannot retroactively
#: invalidate the committed window (round-9 lifecycle bug). Bump this
#: and regenerate the window together at each round start.
_STAGED_FOR_ROUND: int = 11

#: rows whose CODE was re-planned since the previous staging commit —
#: now DERIVED MECHANICALLY (tools/gate_rotation.py derive_changed:
#: git diff 097a439..worktree -> modules -> reverse-import closure,
#: with per-function granularity inside registered defs). Round 11:
#: the r10 late-round re-plans (chunked_windows halo chaining,
#: append-delta clustering) plus this round's snapshot commit
#: hardening mark 187 rows (restaged at round close to fold in the
#: JPEG decoder, PG connector, and grouped-append work); the
#: window takes the never-gated rows + the stalest rest.
#: To restage: python tools/gate_rotation.py --since <staging commit>
#: (find it via: git log -S"_STAGED_FOR_ROUND: int = <N>").
_ROUND_CHANGED: tuple[str, ...] = (
    "q1_pricing_summary",
    "multimodal_jpeg_decode",
    "dedup_cdc_chunks",
    "snapshot_incremental_dedup",
    "order_quantity_array_hof",
    "window_nth_value",
    "skyline_orders_2d",
    "dq_referential_integrity",
    "ann_pq_codes",
    "sketch_hll_distinct",
    "sketch_bloom_membership",
    "sketch_histogram_quantiles",
    "dedup_minhash_recall",
    "events_props_variant",
    "spatial_quadtree_rollup",
    "dedup_semantic_clusters",
    "text_bigram_model_score",
    "embedding_whiten",
    "dedup_containment_pairs",
    "events_regression_slope",
    "events_markov_transitions",
    "orders_percentile_cont",
    "lineitem_corr_matrix",
    "q6_revenue_forecast",
    "q10_returned_items",
    "text_token_stats",
    "text_quality_scores",
    "dedup_exact",
    "embedding_cosine_topk",
    "text_langid",
    "text_bpe_counts",
    "dedup_ngram_jaccard",
    "text_fingerprint",
    "embedding_near_dup_pairs",
    "ann_ivf_assign",
    "sample_weighted_priority",
    "dsir_importance_weights",
    "spatial_version_boundary_region",
    "spatial_percentile_heights",
    "spatial_rasterize",
    "tile_file_index",
    "spatial_las_class_mapping",
    "spatial_raster_smooth",
    "spatial_region_labeling",
    "multimodal_features",
    "multimodal_resize",
    "multimodal_dedup_binary",
    "sketch_hll_by_type",
    "sketch_kmv_set_ops",
    "text_bm25_scores",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q4_order_priority",
    "distinct_projection",
    "isin_filter",
    "anti_join_missing",
    "semi_join_intersection",
    "array_agg_group",
    "priority_dedup_ties",
    "topk_per_group",
    "regexp_extract_ids",
    "union_dedup",
    "null_guard_filter",
    "groupby_month_rollup",
    "q2_min_price_supplier",
    "q7_nation_volume",
    "q8_market_share",
    "q9_profit_by_nation",
    "q12_priority_by_status",
    "q14_promo_share",
    "q18_large_orders",
    "q19_disjunctive_pred",
    "q22_idle_customers",
    "window_running_sum",
    "window_order_gaps",
    "rollup_order_stats",
    "window_rank_family",
    "grouping_sets_order_stats",
    "q11_important_parts",
    "q13_order_count_distribution",
    "q15_top_supplier",
    "q16_supplier_count_by_part",
    "q17_small_quantity_revenue",
    "q20_substantial_suppliers",
    "cube_segment_priority",
    "q21_waiting_suppliers",
    "lateral_top_order_per_customer",
    "window_range_frame_spend",
    "scd2_snapshot_values",
    "sessionize_gap_ids",
    "islands_active_days",
    "price_band_assign",
    "argmax_order_per_customer",
    "stats_second_moments",
    "median_disc_by_priority",
    "lineitem_weighted_median",
    "weekly_revenue_wow",
    "mode_priority_by_status",
    "events_first_touch",
    "multiset_except_intersect",
    "cumulative_distinct_users",
    "rolling_7d_distinct_users",
    "revenue_share_by_nation",
    "leave_one_out_customer_mean",
    "events_mad_by_type",
    "dq_column_profile",
    "dedup_minhash_pairs",
    "dedup_simhash",
    "ann_lsh_buckets",
    "dedup_ngram_jaccard_sampled",
    "ann_ivf_search",
    "text_chunk_windows",
    "text_pii_redact",
    "text_html_strip",
    "text_url_domains",
    "dedup_connected_components",
    "dedup_keep_canonical",
    "sample_stratified",
    "sample_per_group_topk",
    "sample_split_assign",
    "embedding_dim_stats",
    "curate_quality_by_cluster",
    "text_repetition_stats",
    "decontaminate_overlap",
    "pack_sequences",
    "text_top_terms",
    "embedding_normalize",
    "corpus_shard_assign",
    "text_doc_frequency_score",
    "dedup_connected_components_star",
    "sample_temperature_mixture",
    "corpus_curation_manifest",
    "ann_kmeans_fit",
    "ann_pq_adc_recall",
    "spatial_point_in_tile_join",
    "spatial_within_extent",
    "spatial_tiles_intersecting_extent",
    "spatial_dissolve_union_area",
    "spatial_match_elevation_versions",
    "spatial_version_not_boundary",
    "spatial_versions",
    "spatial_version_boundary",
    "spatial_percentile_heights_approx",
    "spatial_alpha_shape",
    "spatial_tin_simplify",
    "spatial_zorder_keys",
    "spatial_knn_tile_center",
    "multimodal_frame_sample",
    "multimodal_bmp_decode",
    "multimodal_bmp_resize2d",
    "multimodal_wav_decode",
    "multimodal_png_decode",
    "multimodal_video_frame_sample",
    "sketch_count_min",
    "sketch_cms_point_queries",
    "sketch_kmv_distinct",
    "rolling_distinct_hll",
    "ann_ivf_recall",
    "dedup_minhash_recall_sampled",
    "dedup_jaccard_prefix_filtered",
    "dedup_jaccard_prefix_filtered_sampled",
    "dedup_threshold_curve",
    "snapshot_merge_upsert_state",
    "snapshot_time_travel_diff",
    "snapshot_schema_evolution_state",
    "snapshot_schema_evolution_diff",
    "snapshot_partition_pruned_read",
    "snapshot_datasource_read",
    "snapshot_where_pruned_read",
    "stream_kmv_distinct_users",
    "stream_hll_distinct_users",
    "stream_cms_event_type_counts",
    "stream_hist_quantiles",
    "stream_topk_heavy_users",
    "stream_sessionize_late_events",
    "events_interval_overlap",
    "events_cusum_drift",
    "events_twap_hourly",
    "events_rolling_median",
    "events_ewma_approx",
    "events_anomaly_intervals",
    "events_sequence_match",
    "events_active_sessions_sweep",
    "events_sweep_partitioned",
    "events_type_runs",
    "events_winsorized_stats",
    "events_seasonal_hourly",
)

# Round-11 window: q1 (flagship) + the never-gated new rows + the
# stalest of the mechanically-derived changed set (_ROUND_CHANGED).
_GATE_PRIORITY: tuple[str, ...] = (
    "q1_pricing_summary",
    "multimodal_jpeg_decode",
    "dedup_cdc_chunks",
    "snapshot_incremental_dedup",
    "snapshot_where_pruned_read",
    "order_quantity_array_hof",
    "window_nth_value",
    "skyline_orders_2d",
    "dq_referential_integrity",
    "ann_pq_codes",
    "sketch_hll_distinct",
    "sketch_bloom_membership",
    "sketch_histogram_quantiles",
    "dedup_minhash_recall",
    "events_props_variant",
    "spatial_quadtree_rollup",
    "dedup_semantic_clusters",
    "text_bigram_model_score",
    "embedding_whiten",
    "dedup_containment_pairs",
    "events_regression_slope",
    "events_markov_transitions",
    "orders_percentile_cont",
    "lineitem_corr_matrix",
    "q6_revenue_forecast",
    "q10_returned_items",
    "text_token_stats",
    "text_quality_scores",
    "dedup_exact",
    "embedding_cosine_topk",
    "text_langid",
    "text_bpe_counts",
    "dedup_ngram_jaccard",
    "text_fingerprint",
    "embedding_near_dup_pairs",
    "ann_ivf_assign",
    "sample_weighted_priority",
    "dsir_importance_weights",
    "spatial_version_boundary_region",
    "spatial_percentile_heights",
    "spatial_rasterize",
    "tile_file_index",
    "spatial_las_class_mapping",
    "spatial_raster_smooth",
    "spatial_region_labeling",
    "multimodal_features",
    "multimodal_resize",
    "multimodal_dedup_binary",
    "sketch_hll_by_type",
    "sketch_kmv_set_ops",
    # everything else follows in registration order
)


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
    import tile_processor_spark.plans.streaming_gate  # noqa: F401
    import tile_processor_spark.plans.timeseries_ops  # noqa: F401

    # The first 50 of _GATE_PRIORITY ARE the external gate window: a
    # misspelled name would silently demote itself (rank.get default)
    # and change which queries get driver evidence — fail loudly.
    unknown = set(_GATE_PRIORITY) - set(REGISTRY)
    if unknown:
        raise ValueError(f"_GATE_PRIORITY names not in REGISTRY: {sorted(unknown)}")
    rank = {name: i for i, name in enumerate(_GATE_PRIORITY)}
    reg_order = {name: i for i, name in enumerate(REGISTRY)}
    ordered = sorted(
        REGISTRY, key=lambda n: (rank.get(n, len(rank)), reg_order[n])
    )
    return {name: REGISTRY[name] for name in ordered}
