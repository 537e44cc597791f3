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
# Round-4 window: the six events queries red in r3 (NTZ loader fix), the
# ten never-gated queries, the three rows that just gained real oracles,
# the three events queries that must re-verify through the LTZ path, the
# §2-parity relational patterns (green only under r1's ordering), and
# eleven TPC-H rows last verified in r1. Double-green rows from r2+r3
# (spatial_*, text_*, dedup_*, sample_*, multimodal feat/resize, IVF)
# rotate out; names not listed keep registration order after these.
_GATE_PRIORITY: tuple[str, ...] = (
    # flagship
    "q1_pricing_summary",
    # events: red in r3 (unix_micros vs NTZ), fixed by the loader change
    "events_tumbling_window",
    "events_sliding_window",
    "events_session_window",
    "events_asof_join",
    "events_band_join",
    "events_hypertable_rollup",
    # events: never had a driver row
    "events_ohlc_hourly",
    "events_asof_forward",
    "events_funnel",
    "events_retention_cohorts",
    # events: green in r3 through the NTZ path — re-verify through LTZ
    "events_daily_profile",
    "events_gapfill_locf",
    "events_json_props",
    # formerly no_oracle, now pinned by real value-level oracles
    "spatial_tin_simplify",
    "spatial_alpha_shape",
    "ann_kmeans_fit",
    # never-gated pipeline/layout ops
    "text_repetition_stats",
    "decontaminate_overlap",
    "pack_sequences",
    "text_top_terms",
    "embedding_normalize",
    "spatial_zorder_keys",
    "multimodal_frame_sample",
    # §2-parity relational patterns (green only under r1's ordering)
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
    "window_running_sum",
    "window_order_gaps",
    "rollup_order_stats",
    "cube_segment_priority",
    # TPC-H rows last verified in r1
    "q2_min_price_supplier",
    "q3_shipping_priority",
    "q4_order_priority",
    "q5_local_supplier_volume",
    "q6_revenue_forecast",
    "q7_nation_volume",
    "q8_market_share",
    "q9_profit_by_nation",
    "q10_returned_items",
    "q11_important_parts",
    "q13_order_count_distribution",
    # everything else follows in registration order
)

# Round-5 rotation candidates (never driver-gated; all green in the
# local gate): q14–q22, q12_priority_by_status is double-green, and the
# round-4 additions — corpus_shard_assign, text_doc_frequency_score,
# dedup_connected_components_star, events_rolling_zscore,
# sample_temperature_mixture, text_chunk_windows, spatial_knn_tile_center,
# sketch_count_min, sketch_cms_point_queries, sketch_kmv_distinct,
# ann_ivf_recall, events_pivot_hourly, events_unpivot_hourly,
# events_click_purchase_outer, lateral_top_order_per_customer,
# window_rank_family, corpus_curation_manifest, events_value_histogram,
# grouping_sets_order_stats.


def all_specs() -> dict[str, QuerySpec]:
    """Import every module that registers queries, then return the registry
    ordered so gate-critical queries come first (see ``_GATE_PRIORITY``)."""
    # Imports deferred so a syntax error in one module is loud, not silent.
    import tile_processor_spark.plans.relational  # noqa: F401
    import tile_processor_spark.plans.relational_ext  # noqa: F401
    import tile_processor_spark.plans.relational_ext2  # noqa: F401
    import tile_processor_spark.plans.llm_ops  # noqa: F401
    import tile_processor_spark.plans.pipeline_ops  # noqa: F401
    import tile_processor_spark.plans.ann_kmeans  # noqa: F401
    import tile_processor_spark.plans.spatial_gate  # noqa: F401
    import tile_processor_spark.plans.events_windows  # noqa: F401
    import tile_processor_spark.plans.multimodal_gate  # noqa: F401
    import tile_processor_spark.plans.sketches  # noqa: F401
    import tile_processor_spark.plans.ann_eval  # noqa: F401

    rank = {name: i for i, name in enumerate(_GATE_PRIORITY)}
    reg_order = {name: i for i, name in enumerate(REGISTRY)}
    ordered = sorted(
        REGISTRY, key=lambda n: (rank.get(n, len(rank)), reg_order[n])
    )
    return {name: REGISTRY[name] for name in ordered}
