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
_STAGED_FOR_ROUND: int = 14

#: rows whose CODE was re-planned since the previous staging commit —
#: DERIVED MECHANICALLY (tools/gate_rotation.py derive_changed: git
#: diff 1f60667..worktree -> modules -> reverse-import closure, with
#: per-NAME granularity inside a row's own module: changed lines
#: attribute to their owning top-level node and resolve through the
#: module's internal reference graph). Round 14: the vacuum retention
#: window (snapshots.py), the s3-native write plane + datasource
#: wiring, and the sidecar-store refactor (dedup_bloom.py) mark the
#: snapshot + multimodal families (21 rows incl. the NEW
#: snapshot_s3_write_read).
#: To restage: python tools/gate_rotation.py --since <staging commit>
#: (find it via: git log -S"_STAGED_FOR_ROUND: int = <N>").
_ROUND_CHANGED: tuple[str, ...] = (
    "snapshot_datasource_read",
    "multimodal_jpeg_cmyk",
    "multimodal_jpeg_progressive",
    "snapshot_merge_upsert_state",
    "snapshot_time_travel_diff",
    "multimodal_frame_sample",
    "multimodal_bmp_decode",
    "multimodal_bmp_resize2d",
    "multimodal_wav_decode",
    "multimodal_png_decode",
    "multimodal_video_frame_sample",
    "snapshot_schema_evolution_state",
    "snapshot_schema_evolution_diff",
    "snapshot_partition_pruned_read",
    "multimodal_jpeg_decode",
    "snapshot_incremental_dedup",
    "snapshot_where_pruned_read",
    "multimodal_features",
    "multimodal_resize",
    "multimodal_dedup_binary",
    "snapshot_s3_write_read",
)

# Round-14 window: q1 (flagship), the never-gated s3-native write row
# first among the changed set, the rest of the changed set
# (_ROUND_CHANGED), then the ENTIRE r8 staleness tail (16 rows: the
# events robust-stats family + the stream_* sketch rows) and the start
# of the r9 tail — after this round no row's evidence is older than r9
# (the r12 close's ask, deferred one round by the r13 changed-set
# priority).
_GATE_PRIORITY: tuple[str, ...] = (
    "q1_pricing_summary",
    "snapshot_s3_write_read",
    "snapshot_datasource_read",
    "multimodal_jpeg_cmyk",
    "multimodal_jpeg_progressive",
    "snapshot_merge_upsert_state",
    "snapshot_time_travel_diff",
    "multimodal_frame_sample",
    "multimodal_bmp_decode",
    "multimodal_bmp_resize2d",
    "multimodal_wav_decode",
    "multimodal_png_decode",
    "multimodal_video_frame_sample",
    "snapshot_schema_evolution_state",
    "snapshot_schema_evolution_diff",
    "snapshot_partition_pruned_read",
    "multimodal_jpeg_decode",
    "snapshot_incremental_dedup",
    "snapshot_where_pruned_read",
    "multimodal_features",
    "multimodal_resize",
    "multimodal_dedup_binary",
    "events_funnel",
    "events_retention_cohorts",
    "rolling_distinct_hll",
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
    "events_winsorized_stats",
    "semi_join_intersection",
    "topk_per_group",
    "regexp_extract_ids",
    "union_dedup",
    "q12_priority_by_status",
    "q14_promo_share",
    "q18_large_orders",
    "q19_disjunctive_pred",
    "q22_idle_customers",
    "window_running_sum",
    "window_order_gaps",
    "rollup_order_stats",
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
