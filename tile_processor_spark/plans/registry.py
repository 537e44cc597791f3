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
# Round-5 window: the 19 round-4 additions that have never had a driver
# row (all judge-verified green at sf0.01 in r4), the nine TPC-H rows
# last driver-green in r1 (q14–q22), the two rows whose kernels/oracles
# change this round (alpha-shape non-degenerate pin, k-means decimal
# oracle), and the 19 stalest rows last verified in r2/r3. The r4 green
# block (events core, §2-parity relational patterns, TPC-H q2–q13,
# pipeline/layout ops) rotates out as double-or-fresh-green; names not
# listed keep registration order after these.
_GATE_PRIORITY: tuple[str, ...] = (
    # flagship
    "q1_pricing_summary",
    # round-4 additions: never driver-gated (judge-green r4 at sf0.01)
    "window_rank_family",
    "grouping_sets_order_stats",
    "lateral_top_order_per_customer",
    "text_chunk_windows",
    "corpus_shard_assign",
    "text_doc_frequency_score",
    "dedup_connected_components_star",
    "sample_temperature_mixture",
    "corpus_curation_manifest",
    "spatial_knn_tile_center",
    "events_rolling_zscore",
    "events_pivot_hourly",
    "events_unpivot_hourly",
    "events_click_purchase_outer",
    "events_value_histogram",
    "sketch_count_min",
    "sketch_cms_point_queries",
    "sketch_kmv_distinct",
    "ann_ivf_recall",
    # TPC-H rows last driver-green in r1
    "q14_promo_share",
    "q15_top_supplier",
    "q16_supplier_count_by_part",
    "q17_small_quantity_revenue",
    "q18_large_orders",
    "q19_disjunctive_pred",
    "q20_substantial_suppliers",
    "q21_waiting_suppliers",
    "q22_idle_customers",
    # code/oracle paths changed this round — re-verify
    "spatial_alpha_shape",
    "ann_kmeans_fit",
    # stalest rows (last driver-green r2/r3)
    "q12_priority_by_status",
    "dedup_simhash",
    "ann_lsh_buckets",
    "ann_ivf_search",
    "dedup_connected_components",
    "dedup_keep_canonical",
    "sample_stratified",
    "sample_per_group_topk",
    "sample_split_assign",
    "embedding_dim_stats",
    "curate_quality_by_cluster",
    "spatial_point_in_tile_join",
    "spatial_within_extent",
    "spatial_tiles_intersecting_extent",
    "spatial_dissolve_union_area",
    "spatial_match_elevation_versions",
    "spatial_version_not_boundary",
    "spatial_versions",
    "spatial_version_boundary",
    # everything else follows in registration order
)

# Round-6 rotation candidates, in priority order:
# (a) the round-5 additions, never driver-gated (local gate green):
#     window_range_frame_spend, scd2_snapshot_values, sessionize_gap_ids,
#     islands_active_days, price_band_assign, argmax_order_per_customer,
#     stats_second_moments, median_disc_by_priority, weekly_revenue_wow,
#     mode_priority_by_status, events_first_touch,
#     multiset_except_intersect, dedup_minhash_recall,
#     graph_pagerank_fixedpoint, graph_triangle_count,
#     fuzzy_part_name_pairs, user_event_type_bitmap,
#     events_props_variant, spatial_quadtree_rollup, dq_profile_orders,
#     cumulative_distinct_users, rolling_7d_distinct_users,
#     revenue_share_by_nation, leave_one_out_customer_mean,
#     order_quantity_array_hof, events_mad_by_type, window_nth_value,
#     skyline_orders_2d, sketch_hll_distinct, sketch_bloom_membership,
#     dedup_semantic_clusters, text_bigram_model_score,
#     embedding_whiten, events_interval_overlap,
#     events_regression_slope, events_cusum_drift,
#     dedup_containment_pairs, dq_referential_integrity,
#     events_markov_transitions, orders_percentile_cont,
#     lineitem_corr_matrix, events_twap_hourly, text_bm25_scores,
#     dedup_jaccard_prefix_filtered, events_rolling_median,
#     multimodal_dedup_binary, events_ewma_approx,
#     events_anomaly_intervals, basket_brand_pairs,
#     customer_rfm_segments, sketch_hll_by_type,
#     events_sequence_match, pareto_abc_parts, spatial_raster_smooth,
#     spatial_region_labeling, events_active_sessions_sweep,
#     events_sweep_partitioned, events_type_runs, dq_key_skew,
#     orders_cohort_ltv, nation_revenue_hhi, dedup_threshold_curve,
#     ann_pq_codes, ann_pq_adc_recall, dsir_importance_weights,
#     graph_bfs_hops, sketch_histogram_quantiles,
#     sample_weighted_priority, events_winsorized_stats;
# (b) stale rows last driver-green r2/r3:
#     spatial_version_boundary_region, spatial_percentile_heights,
#     spatial_rasterize, tile_file_index, spatial_las_class_mapping,
#     multimodal_features, multimodal_resize, text_token_stats,
#     text_quality_scores, dedup_exact, dedup_minhash_pairs,
#     embedding_cosine_topk, text_langid, text_bpe_counts,
#     dedup_ngram_jaccard, text_fingerprint, embedding_near_dup_pairs.


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
    import tile_processor_spark.plans.timeseries_ops  # noqa: F401

    rank = {name: i for i, name in enumerate(_GATE_PRIORITY)}
    reg_order = {name: i for i, name in enumerate(REGISTRY)}
    ordered = sorted(
        REGISTRY, key=lambda n: (rank.get(n, len(rank)), reg_order[n])
    )
    return {name: REGISTRY[name] for name in ordered}
