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
_STAGED_FOR_ROUND: int = 15

#: rows whose CODE was re-planned since the previous staging commit —
#: DERIVED MECHANICALLY (tools/gate_rotation.py derive_changed: git
#: diff d5a4452..worktree -> modules -> reverse-import closure, with
#: per-NAME granularity inside a row's own module: changed lines
#: attribute to their owning top-level node and resolve through the
#: module's internal reference graph). Round 15: partitioned
#: s3-native appends + stream-sink scheme inheritance
#: (s3_snapshot_write.py), the vacuum_store root guard
#: (snapshot_datasource.py), the sidecar retention window + cache
#: ownership check (dedup_bloom.py), and the gate module's assert
#: hygiene + the NEW snapshot_s3_partitioned_append row mark the
#: snapshot family (10 rows).
#: To restage: python tools/gate_rotation.py --since <staging commit>
#: (find it via: git log -S"_STAGED_FOR_ROUND: int = <N>").
_ROUND_CHANGED: tuple[str, ...] = (
    "snapshot_s3_write_read",
    "snapshot_datasource_read",
    "snapshot_merge_upsert_state",
    "snapshot_time_travel_diff",
    "snapshot_schema_evolution_state",
    "snapshot_schema_evolution_diff",
    "snapshot_partition_pruned_read",
    "snapshot_incremental_dedup",
    "snapshot_where_pruned_read",
    "snapshot_s3_partitioned_append",
)

# Round-15 window: q1 (flagship), the never-gated partitioned-append
# row first among the changed set, the rest of the changed snapshot
# family, then the ENTIRE r9 staleness tail (33 rows:
# ann/cc/dedup-eval/sampling/q15-q17/text families) and six r10 rows
# to fill — after this round no row's evidence is older than r10
# (the r14 verdict's ask, item 2).
_GATE_PRIORITY: tuple[str, ...] = (
    "q1_pricing_summary",
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
    "window_rank_family",
    "grouping_sets_order_stats",
    "q15_top_supplier",
    "q16_supplier_count_by_part",
    "q17_small_quantity_revenue",
    "q20_substantial_suppliers",
    "q21_waiting_suppliers",
    "lateral_top_order_per_customer",
    "lineitem_weighted_median",
    "dedup_simhash",
    "ann_lsh_buckets",
    "dedup_ngram_jaccard_sampled",
    "ann_ivf_search",
    "text_chunk_windows",
    "dedup_connected_components",
    "dedup_keep_canonical",
    "sample_stratified",
    "sample_per_group_topk",
    "sample_split_assign",
    "embedding_dim_stats",
    "curate_quality_by_cluster",
    "text_repetition_stats",
    "text_top_terms",
    "embedding_normalize",
    "corpus_shard_assign",
    "text_doc_frequency_score",
    "dedup_connected_components_star",
    "sample_temperature_mixture",
    "corpus_curation_manifest",
    "ann_pq_adc_recall",
    "spatial_tin_simplify",
    "spatial_zorder_keys",
    "dedup_minhash_recall_sampled",
    "window_range_frame_spend",
    "scd2_snapshot_values",
    "sessionize_gap_ids",
    "islands_active_days",
    "price_band_assign",
    "argmax_order_per_customer",
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
