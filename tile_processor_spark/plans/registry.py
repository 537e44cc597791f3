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
# so ordering is part of the verification contract: the reference's core
# capability surface (spatial tile selection — tileconfig.py:128-194,
# 395-499, 600-678 — plus events/multimodal/ANN) must come before the
# TPC-H long tail, which only exists as relational breadth coverage.
# Names not listed here keep registration order after the listed ones.
_GATE_PRIORITY: tuple[str, ...] = (
    # flagship
    "q1_pricing_summary",
    # spatial / tile pipeline (the reference's whole purpose)
    "spatial_point_in_tile_join",
    "spatial_within_extent",
    "spatial_tiles_intersecting_extent",
    "spatial_dissolve_union_area",
    "spatial_match_elevation_versions",
    "spatial_versions",
    "spatial_version_boundary",
    "spatial_version_not_boundary",
    "spatial_version_boundary_region",
    "spatial_percentile_heights",
    "spatial_rasterize",
    "spatial_alpha_shape",
    "spatial_tin_simplify",
    "tile_file_index",
    "spatial_las_class_mapping",
    # events (streaming-shaped analytics)
    "events_tumbling_window",
    "events_sliding_window",
    "events_session_window",
    "events_asof_join",
    "events_json_props",
    "events_daily_profile",
    "events_band_join",
    "events_hypertable_rollup",
    "events_gapfill_locf",
    # multimodal plumbing
    "multimodal_features",
    "multimodal_resize",
    # ANN scale path + the round-1 hash-amber trio (fixes need driver rows)
    "ann_ivf_assign",
    "ann_ivf_search",
    "ann_kmeans_fit",
    "q12_priority_by_status",
    "dedup_simhash",
    "ann_lsh_buckets",
    # LLM pipeline core
    "text_token_stats",
    "text_quality_scores",
    "text_langid",
    "text_bpe_counts",
    "text_fingerprint",
    "dedup_exact",
    "dedup_minhash_pairs",
    "dedup_ngram_jaccard",
    "embedding_cosine_topk",
    "embedding_near_dup_pairs",
    # tier-2 pipeline ops: dedup clustering + deterministic sampling
    "dedup_connected_components",
    "dedup_keep_canonical",
    "sample_stratified",
    "sample_per_group_topk",
    "sample_split_assign",
    "embedding_dim_stats",
    "curate_quality_by_cluster",
    # relational operator patterns mapped 1:1 to SURVEY §2.2-2.7
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
    # TPC-H long tail follows in registration order (driver-green in r1)
)


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

    rank = {name: i for i, name in enumerate(_GATE_PRIORITY)}
    reg_order = {name: i for i, name in enumerate(REGISTRY)}
    ordered = sorted(
        REGISTRY, key=lambda n: (rank.get(n, len(rank)), reg_order[n])
    )
    return {name: REGISTRY[name] for name in ordered}
