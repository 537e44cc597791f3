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

#: rows whose CODE was re-planned this round (plan changed, oracle
#: unchanged) — the standing re-verify policy's explicit input.
#: Round 9: curate_quality_by_cluster gained the banded_topk size
#: dispatch (naive window under a row-capped input at bench scale);
#: ann_pq_adc_recall's cached exact-truth query frame gained a
#: structural limit (the checkpoint-intercepting sweep flagged its
#: filter-only broadcast bound on first run).
_ROUND_CHANGED: tuple[str, ...] = (
    "curate_quality_by_cluster",
    "ann_pq_adc_recall",
)

# Round-9 window: q1 (flagship) + the 2 re-plans + the 7 never-gated
# rows (lineitem_weighted_median from round-8 close; the three
# sampled-slice audit twins, the two snapshot schema-evolution rows,
# and the manifest partition-pruning row added this round) + the 12
# rows whose latest driver-green is round 4 + the 28 stalest round-5
# rows. After this round every registry row's driver evidence is
# round 5 or newer and the r4 backlog retires.
_GATE_PRIORITY: tuple[str, ...] = (
    "q1_pricing_summary",
    "curate_quality_by_cluster",
    "ann_pq_adc_recall",
    "lineitem_weighted_median",
    "dedup_ngram_jaccard_sampled",
    "dedup_minhash_recall_sampled",
    "dedup_jaccard_prefix_filtered_sampled",
    "snapshot_schema_evolution_state",
    "snapshot_schema_evolution_diff",
    "snapshot_partition_pruned_read",
    "regexp_extract_ids",
    "rollup_order_stats",
    "semi_join_intersection",
    "spatial_tin_simplify",
    "text_repetition_stats",
    "text_top_terms",
    "topk_per_group",
    "union_dedup",
    "window_order_gaps",
    "window_running_sum",
    "embedding_normalize",
    "spatial_zorder_keys",
    "q12_priority_by_status",
    "q14_promo_share",
    "q18_large_orders",
    "q19_disjunctive_pred",
    "q22_idle_customers",
    "window_rank_family",
    "grouping_sets_order_stats",
    "q15_top_supplier",
    "q16_supplier_count_by_part",
    "q17_small_quantity_revenue",
    "q20_substantial_suppliers",
    "q21_waiting_suppliers",
    "lateral_top_order_per_customer",
    "dedup_simhash",
    "ann_lsh_buckets",
    "ann_ivf_search",
    "text_chunk_windows",
    "dedup_connected_components",
    "dedup_keep_canonical",
    "sample_stratified",
    "sample_per_group_topk",
    "sample_split_assign",
    "embedding_dim_stats",
    "corpus_shard_assign",
    "text_doc_frequency_score",
    "dedup_connected_components_star",
    "sample_temperature_mixture",
    "corpus_curation_manifest",
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
