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
_STAGED_FOR_ROUND: int = 16

#: rows whose CODE was re-planned since the previous staging commit —
#: DERIVED MECHANICALLY (tools/gate_rotation.py derive_changed: git
#: diff 64aad3c..worktree -> modules -> reverse-import closure, with
#: per-NAME granularity inside a row's own module: changed lines
#: attribute to their owning top-level node and resolve through the
#: module's internal reference graph). Round 16: read-version conflict
#: detection + row-level DELETE + AS-OF time travel (snapshots.py,
#: s3_snapshot_write.py, snapshot_datasource.py) and the THREE new
#: gate rows mark the snapshot family (13 rows).
#: To restage: python tools/gate_rotation.py --since <staging commit>
#: (find it via: git log -S"_STAGED_FOR_ROUND: int = <N>").
_ROUND_CHANGED: tuple[str, ...] = (
    "snapshot_s3_partitioned_append",
    "snapshot_s3_write_read",
    "snapshot_datasource_read",
    "snapshot_merge_upsert_state",
    "snapshot_time_travel_diff",
    "snapshot_schema_evolution_state",
    "snapshot_schema_evolution_diff",
    "snapshot_partition_pruned_read",
    "snapshot_incremental_dedup",
    "snapshot_where_pruned_read",
    "snapshot_delete_where",
    "snapshot_delete_diff",
    "snapshot_as_of_read",
)

# Round-16 window: q1 (flagship), the three never-gated DELETE/AS-OF
# rows, then the rest of the changed snapshot family (the conflict-
# detection re-plan touched every snapshot row), then the ENTIRE r10
# staleness tail (34 rows: the spatial family, ann_kmeans_fit,
# ann_ivf_recall, sketch cms/kmv, text_html_strip/pii_redact/
# url_domains, events/stats families) and two r11 rows to fill —
# after this round no row's evidence is older than r11 (the r15
# verdict's ask, item 4).
_GATE_PRIORITY: tuple[str, ...] = (
    "q1_pricing_summary",
    "snapshot_delete_where",
    "snapshot_delete_diff",
    "snapshot_as_of_read",
    "snapshot_s3_partitioned_append",
    "snapshot_s3_write_read",
    "snapshot_datasource_read",
    "snapshot_merge_upsert_state",
    "snapshot_time_travel_diff",
    "snapshot_schema_evolution_state",
    "snapshot_schema_evolution_diff",
    "snapshot_partition_pruned_read",
    "snapshot_incremental_dedup",
    "snapshot_where_pruned_read",
    "stats_second_moments",
    "median_disc_by_priority",
    "weekly_revenue_wow",
    "mode_priority_by_status",
    "events_first_touch",
    "multiset_except_intersect",
    "cumulative_distinct_users",
    "revenue_share_by_nation",
    "leave_one_out_customer_mean",
    "dq_column_profile",
    "text_pii_redact",
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
    "events_seasonal_hourly",
    "q6_revenue_forecast",
    "q10_returned_items",
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
