"""Entity-resolution / encoding primitives: edit-distance fuzzy
matching and bitset aggregation — the record-linkage layer a curation
pipeline runs between exact dedup (hash equality) and fuzzy dedup
(MinHash): catalog strings that are ALMOST equal, and compact set
encodings for per-entity behavior.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tile_processor_spark.plans.registry import register
from tile_processor_spark.sources.tables import load_table

FUZZY_MAX_DIST = 3

# Deterministic bit assignment: alphabetical event types.
EVENT_TYPE_BITS = {"click": 1, "error": 2, "purchase": 4, "signup": 8, "view": 16}


@register(
    "fuzzy_part_name_pairs",
    oracle=f"""
    WITH n AS (SELECT DISTINCT p_name FROM part)
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
    FROM n a JOIN n b
      ON a.p_name < b.p_name
     AND levenshtein(a.p_name, b.p_name) <= {FUZZY_MAX_DIST}
    """,
    doc=(
        "Fuzzy string matching: catalog-name pairs within Levenshtein "
        "distance 3 (classic unit-cost DP — exact integers, identical "
        "in both engines). The self-join runs on the DISTINCT name "
        "dimension, never the fact table; at a 100 TB catalog the "
        "distinct-name side is what you'd length-bucket or q-gram-"
        "prefilter (|len(a)−len(b)| > k ⇒ dist > k) before the DP — "
        "here the dimension is broadcast-sized, so the direct product "
        "is the right plan."
    ),
    tags=("entity", "string", "join"),
)
def fuzzy_part_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, "part", sf_dir)
    names = p.select("p_name").distinct()
    a = names.select(F.col("p_name").alias("name_a"))
    b = names.select(F.col("p_name").alias("name_b"))
    return (
        a.join(
            F.broadcast(b),
            (F.col("name_a") < F.col("name_b"))
            & (F.levenshtein("name_a", "name_b") <= FUZZY_MAX_DIST),
        )
        .select(
            "name_a",
            "name_b",
            F.levenshtein("name_a", "name_b").cast("long").alias("dist"),
        )
    )


def _bit_case_sql() -> str:
    whens = " ".join(
        f"WHEN '{t}' THEN {b}" for t, b in sorted(EVENT_TYPE_BITS.items())
    )
    return f"CASE event_type {whens} ELSE 0 END"


@register(
    "user_event_type_bitmap",
    oracle=f"""
    SELECT user_id,
           CAST(bit_or({_bit_case_sql()}) AS BIGINT) AS type_bitmap,
           CAST(bit_count(CAST(bit_or({_bit_case_sql()}) AS BIGINT)) AS BIGINT)
             AS n_types,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events GROUP BY user_id
    """,
    doc=(
        "Bitset encoding of per-entity behavior: each user's observed "
        "event types folded into one BIGINT via bit_or (alphabetical "
        "bit assignment), cardinality via bit_count. The bitmap is the "
        "compact alternative to collect_set for bounded vocabularies — "
        "8 bytes per user instead of an array, mergeable map-side, and "
        "segment predicates become bitwise tests (`bitmap & 4 != 0` = "
        "'ever purchased')."
    ),
    tags=("entity", "agg", "events"),
)
def user_event_type_bitmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    bit = F.coalesce(
        *[
            F.when(F.col("event_type") == t, F.lit(b))
            for t, b in sorted(EVENT_TYPE_BITS.items())
        ],
        F.lit(0),
    )
    bitmap = F.bit_or(bit).cast("long")
    return ev.groupBy("user_id").agg(
        bitmap.alias("type_bitmap"),
        F.bit_count(bitmap).cast("long").alias("n_types"),
        F.count(F.lit(1)).alias("n_events"),
    )


PROFILE_COLS = (
    "o_orderkey", "o_custkey", "o_orderstatus",
    "o_totalprice", "o_orderdate", "o_orderpriority",
)


@register(
    "dq_profile_orders",
    oracle="""
    SELECT * FROM (
    """ + "\nUNION ALL\n".join(
        f"""SELECT '{c}' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_nulls,
               CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct
        FROM orders"""
        for c in PROFILE_COLS
    ) + """
    )
    """,
    doc=(
        "Data-quality profile (the ANALYZE/dbt-test shape): per-column "
        "row/null/exact-distinct counts over orders in ONE job. Spark "
        "computes all six columns' aggregates in a single pass "
        "(count_distinct per column partial-aggregates map-side) and "
        "unpivots driver-free via an inline array-explode; profiling a "
        "100 TB table stays one scan, not one scan per column."
    ),
    tags=("entity", "quality", "agg"),
)
def dq_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in PROFILE_COLS:
        aggs.append(F.count(c).alias(f"{c}__nn"))
        aggs.append(F.count_distinct(c).alias(f"{c}__nd"))
    row = o.agg(*aggs)
    profile = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("n_rows").alias("n_rows"),
                (F.col("n_rows") - F.col(f"{c}__nn")).alias("n_nulls"),
                F.col(f"{c}__nd").alias("n_distinct"),
            )
            for c in PROFILE_COLS
        ]
    )
    return row.select(F.explode(profile).alias("p")).select(
        "p.col_name", "p.n_rows", "p.n_nulls", "p.n_distinct"
    )
