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


def all_specs() -> dict[str, QuerySpec]:
    """Import every module that registers queries, then return the registry."""
    # Imports deferred so a syntax error in one module is loud, not silent.
    import tile_processor_spark.plans.relational  # noqa: F401
    import tile_processor_spark.plans.relational_ext  # noqa: F401
    import tile_processor_spark.plans.relational_ext2  # noqa: F401
    import tile_processor_spark.plans.llm_ops  # noqa: F401
    import tile_processor_spark.plans.spatial_gate  # noqa: F401
    import tile_processor_spark.plans.events_windows  # noqa: F401
    import tile_processor_spark.plans.multimodal_gate  # noqa: F401

    return dict(REGISTRY)
