"""Spark 4 SQL surface: VARIANT semi-structured shredding and recursive
CTEs — the two headline additions of the Spark 4 line, exercised as
gate queries so the engine demonstrably supports them.

- ``events_props_variant``: the ``props`` JSON column through
  ``parse_json`` → VariantType → ``variant_get`` typed extraction
  (binary-shredded access, NOT per-row string JSON-path parsing — at
  100 TB the variant encoding is parsed once at ingest and every
  extraction is a typed offset read).
- ``spatial_quadtree_rollup``: WITH RECURSIVE walking every occupied
  tile up its quadtree ancestry (level k cell = floor(i/2^k),
  floor(j/2^k)), aggregating point counts at every level — the
  hierarchy-rollup shape (org charts, BOM explosions, region trees)
  that needed iterative drivers before recursive CTEs landed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tile_processor_spark.plans.registry import register
from tile_processor_spark.sources.tables import load_table

QT_LEVELS = 3  # 10×10 grid → 5×5 → 3×3 (ceil) → 2×2


@register(
    "events_props_variant",
    oracle="""
    SELECT event_type,
           CAST(COUNT(CAST(props AS JSON)->>'k') AS BIGINT) AS k_present,
           CAST(MIN(CAST((CAST(props AS JSON)->>'k') AS BIGINT)) AS BIGINT) AS k_min,
           CAST(MAX(CAST((CAST(props AS JSON)->>'k') AS BIGINT)) AS BIGINT) AS k_max,
           CAST(COUNT(DISTINCT CAST((CAST(props AS JSON)->>'k') AS BIGINT)) AS BIGINT)
             AS k_distinct
    FROM events GROUP BY event_type
    """,
    doc=(
        "VARIANT shredding (Spark 4): props parsed once into the binary "
        "variant encoding, fields read with variant_get typed extraction "
        "— the open-table-format path for semi-structured columns, vs "
        "events_json_props' string JSON-path scan. Aggregates the "
        "extracted field exactly (count/min/max/distinct, all integers)."
    ),
    tags=("events", "json", "variant"),
)
def events_props_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    return (
        ev.withColumn("pv", F.parse_json("props"))
        .withColumn("k", F.expr("variant_get(pv, '$.k', 'long')"))
        .groupBy("event_type")
        .agg(
            F.count("k").alias("k_present"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
            F.count_distinct("k").alias("k_distinct"),
        )
    )


_QT_RECURSIVE_SQL = f"""
    WITH RECURSIVE anc AS (
      SELECT qi, qj, 0 AS lvl, n FROM {{base}}
      UNION ALL
      SELECT qi div 2 AS qi, qj div 2 AS qj, lvl + 1 AS lvl, n
      FROM anc WHERE lvl < {QT_LEVELS}
    )
    SELECT lvl, qi, qj, CAST(SUM(n) AS BIGINT) AS n_points
    FROM anc GROUP BY lvl, qi, qj
"""


@register(
    "spatial_quadtree_rollup",
    oracle="""
    WITH RECURSIVE base AS (
      SELECT CAST(floor(((c_custkey * 7919) % 1000 + 0.5) / 100) AS BIGINT) AS qi,
             CAST(floor(((c_custkey * 104729) % 1000 + 0.5) / 100) AS BIGINT) AS qj,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM customer GROUP BY 1, 2
    ), anc AS (
      SELECT qi, qj, 0 AS lvl, n FROM base
      UNION ALL
      SELECT qi // 2, qj // 2, lvl + 1, n FROM anc WHERE lvl < 3
    )
    SELECT lvl, qi, qj, CAST(SUM(n) AS BIGINT) AS n_points
    FROM anc GROUP BY lvl, qi, qj
    """,
    doc=(
        "Recursive CTE (Spark 4 WITH RECURSIVE): every occupied tile of "
        "the synthetic point grid walked up its quadtree ancestry "
        "(cell_k = cell_0 div 2^k), point counts re-aggregated at every "
        "level — multi-resolution spatial rollup in ONE declarative "
        "query where pre-4.0 Spark needed a driver loop. The recursion "
        "depth is the tree height (3), not data size, and each step is "
        "a partial-aggregable projection of the previous level."
    ),
    tags=("spatial", "recursive", "agg"),
)
def spatial_quadtree_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tile_processor_spark.plans.spatial_gate import synthetic_points

    base = (
        synthetic_points(spark, sf_dir)
        .groupBy(
            F.floor(F.col("x") / 100).cast("long").alias("qi"),
            F.floor(F.col("y") / 100).cast("long").alias("qj"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # DataFrame reference passed straight into spark.sql — no named temp
    # view registered on the caller's session (a fixed view name would
    # leak into the user's catalog and race concurrent plan building)
    return spark.sql(_QT_RECURSIVE_SQL, base=base)
