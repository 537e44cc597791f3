from tile_processor_spark.plans.registry import REGISTRY, QuerySpec, register  # noqa: F401
