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
_STAGED_FOR_ROUND: int = 10

#: rows whose CODE was re-planned this round (plan changed, oracle
#: unchanged) — the standing re-verify policy's explicit input.
#: Round 10: the snapshot rows' partitioned read path changed
#: (partition-column dtype now cast to the committed manifest schema
#: instead of Spark path inference, ADVICE r9 item 4).
_ROUND_CHANGED: tuple[str, ...] = (
    "snapshot_partition_pruned_read",
    "snapshot_schema_evolution_state",
    "snapshot_schema_evolution_diff",
)

# Round-10 window: q1 (flagship) + the 3 snapshot re-plans + the
# never-gated rows added this round + all 20 rows whose latest
# driver-green is round 5 + the stalest round-6 rows.
_GATE_PRIORITY: tuple[str, ...] = (
    "q1_pricing_summary",
    "snapshot_partition_pruned_read",
    "snapshot_schema_evolution_state",
    "snapshot_schema_evolution_diff",
    "multimodal_bmp_decode",
    "multimodal_bmp_resize2d",
    "multimodal_wav_decode",
    "multimodal_png_decode",
    "multimodal_video_frame_sample",
    "snapshot_datasource_read",
    "text_pii_redact",
    "dq_column_profile",
    "events_seasonal_hourly",
    "text_html_strip",
    "text_url_domains",
    "ann_kmeans_fit",
    "spatial_point_in_tile_join",
    "spatial_within_extent",
    "spatial_tiles_intersecting_extent",
    "spatial_dissolve_union_area",
    "spatial_match_elevation_versions",
    "spatial_version_not_boundary",
    "spatial_versions",
    "spatial_version_boundary",
    "spatial_alpha_shape",
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
    "cumulative_distinct_users",
    "revenue_share_by_nation",
    "leave_one_out_customer_mean",
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
