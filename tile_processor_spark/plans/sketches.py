"""Deterministic streaming-sketch operators over the corpus vocabulary:
Count-Min (point-frequency estimation) and KMV/bottom-k (distinct-count
estimation).

Sketches are usually treated as unverifiable-by-oracle because
implementations randomize their hash seeds; built instead on the
engine's fixed md5-prefix hash family they are pure functions of the
data, so BOTH the sketch content and the estimates are checked
bit-for-bit against DuckDB — the estimation ERROR itself becomes a
pinned, reproducible quantity.

Scale shape (100 TB):

- Count-Min is the poster child of map-side combine: the token stream
  collapses to ≤ depth×width (4×1024) partial rows inside the scan
  stage; the only shuffle carries the sketch cells, never the tokens.
  Merging shards/streams = cell-wise addition (the same groupBy).
- KMV keeps the k smallest hashes of the distinct stream: per-partition
  top-k (sort-free via min-heap under AQE partial aggregation; here
  expressed as orderBy+limit which Spark executes as TakeOrderedAndProject
  — a partial per-partition top-k, NOT a global sort) then a k-row
  reduction on the driver side of the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tile_processor_spark.plans.llm_ops import (
    SQL_HASH32,
    SQL_TOKENS,
    hash32,
    tokens_col,
)
from tile_processor_spark.plans.registry import register
from tile_processor_spark.sources.tables import load_table

CMS_DEPTH = 4
CMS_WIDTH = 1024
KMV_K = 256
HASH_SPACE = float(2**32)


def _words(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, "documents", sf_dir)
    return d.select(F.explode(tokens_col(F.col("text"))).alias("word"))


@register(
    "sketch_count_min",
    oracle=f"""
    WITH words AS (
      SELECT unnest({SQL_TOKENS}) AS word FROM documents
    ),
    cells AS (
      SELECT d.d AS depth,
             {SQL_HASH32.format(v="CAST(d.d AS VARCHAR) || '#' || word")}
               % {CMS_WIDTH} AS bucket
      FROM words CROSS JOIN range({CMS_DEPTH}) d(d)
    )
    SELECT CAST(depth AS BIGINT) AS depth, bucket,
           COUNT(*) AS cnt
    FROM cells GROUP BY depth, bucket
    """,
    doc=(
        "Count-Min sketch of the corpus token stream (depth 4 × width "
        "1024, fixed md5 hash family): each token increments one bucket "
        "per row. Point estimate for any word = min over rows of its "
        "bucket count (always ≥ truth). The token stream collapses to "
        "≤ 4096 cells map-side; only the cells shuffle. Deterministic "
        "hashes make the whole sketch — not just its API — "
        "oracle-checkable."
    ),
    tags=("llm", "sketch"),
)
def sketch_count_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = _words(spark, sf_dir)
    depths = F.array(*[F.lit(d) for d in range(CMS_DEPTH)])
    cells = w.select(
        F.explode(depths).alias("depth"), F.col("word")
    ).select(
        F.col("depth").cast("long").alias("depth"),
        (hash32(F.concat(F.col("depth").cast("string"), F.lit("#"), F.col("word"))) % CMS_WIDTH).alias(
            "bucket"
        ),
    )
    return cells.groupBy("depth", "bucket").agg(F.count(F.lit(1)).alias("cnt"))


@register(
    "sketch_cms_point_queries",
    oracle=f"""
    WITH words AS (
      SELECT unnest({SQL_TOKENS}) AS word FROM documents
    ),
    truth AS (
      SELECT word, COUNT(*) AS true_cnt FROM words GROUP BY word
    ),
    top AS (
      SELECT word, true_cnt FROM truth
      ORDER BY true_cnt DESC, word LIMIT 20
    ),
    cells AS (
      SELECT d.d AS depth,
             {SQL_HASH32.format(v="CAST(d.d AS VARCHAR) || '#' || word")}
               % {CMS_WIDTH} AS bucket,
             COUNT(*) AS cnt
      FROM words CROSS JOIN range({CMS_DEPTH}) d(d)
      GROUP BY 1, 2
    ),
    probes AS (
      SELECT t.word, t.true_cnt, d.d AS depth,
             {SQL_HASH32.format(v="CAST(d.d AS VARCHAR) || '#' || t.word")}
               % {CMS_WIDTH} AS bucket
      FROM top t CROSS JOIN range({CMS_DEPTH}) d(d)
    )
    SELECT p.word, CAST(MIN(c.cnt) AS BIGINT) AS est_cnt,
           CAST(MAX(p.true_cnt) AS BIGINT) AS true_cnt
    FROM probes p JOIN cells c ON p.depth = c.depth AND p.bucket = c.bucket
    GROUP BY p.word
    """,
    doc=(
        "Count-Min point queries for the 20 most frequent words: "
        "estimate = min over depths of the probed cell, compared against "
        "ground truth in the same frame. est_cnt ≥ true_cnt always; the "
        "overestimate is a deterministic, oracle-pinned function of the "
        "corpus — the sketch's error bound made into a testable value."
    ),
    tags=("llm", "sketch"),
)
def sketch_cms_point_queries(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = _words(spark, sf_dir)
    truth = w.groupBy("word").agg(F.count(F.lit(1)).alias("true_cnt"))
    top = truth.orderBy(F.desc("true_cnt"), "word").limit(20)
    depths = F.array(*[F.lit(d) for d in range(CMS_DEPTH)])
    cells = (
        w.select(F.explode(depths).alias("depth"), "word")
        .select(
            F.col("depth").cast("long").alias("depth"),
            (
                hash32(F.concat(F.col("depth").cast("string"), F.lit("#"), F.col("word")))
                % CMS_WIDTH
            ).alias("bucket"),
        )
        .groupBy("depth", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    probes = top.crossJoin(
        F.broadcast(spark.range(CMS_DEPTH).withColumnRenamed("id", "depth"))
    )
    probes = probes.select(
        "word",
        "true_cnt",
        F.col("depth").cast("long").alias("depth"),
        (
            hash32(F.concat(F.col("depth").cast("string"), F.lit("#"), F.col("word")))
            % CMS_WIDTH
        ).alias("bucket"),
    )
    est = (
        probes.join(cells, ["depth", "bucket"])
        .groupBy("word")
        .agg(
            F.min("cnt").cast("long").alias("est_cnt"),
            F.max("true_cnt").cast("long").alias("true_cnt"),
        )
    )
    return est


@register(
    "sketch_kmv_distinct",
    oracle=f"""
    WITH words AS (
      SELECT DISTINCT unnest({SQL_TOKENS}) AS word FROM documents
    ),
    hashed AS (
      SELECT word, {SQL_HASH32.format(v="'kmv#' || word")} AS h FROM words
    ),
    bottom AS (
      SELECT h FROM hashed ORDER BY h, word LIMIT {KMV_K}
    )
    SELECT CAST({KMV_K} AS BIGINT) AS k,
           CAST(MAX(h) AS BIGINT) AS kth_hash,
           CAST(({KMV_K} - 1) * {HASH_SPACE!r} AS DOUBLE) / MAX(h) AS est_distinct,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM hashed) AS true_distinct
    FROM bottom
    """,
    doc=(
        "KMV (bottom-k) distinct-count sketch over the corpus "
        "vocabulary: keep the k = 256 smallest md5 hashes of the "
        "distinct-word stream; estimate |V| ≈ (k−1)·2³² / h_(k). "
        "Deterministic hash family → the estimate AND its error vs the "
        "exact count are oracle-pinned. Spark executes the bottom-k as "
        "TakeOrderedAndProject (per-partition top-k, no global sort); "
        "merging two sketches = union + re-limit."
    ),
    tags=("llm", "sketch"),
)
def sketch_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = _words(spark, sf_dir).distinct()
    hashed = w.select(
        "word", hash32(F.concat(F.lit("kmv#"), F.col("word"))).alias("h")
    )
    bottom = hashed.orderBy("h", "word").limit(KMV_K)
    true_cnt = hashed.agg(F.count(F.lit(1)).cast("long").alias("true_distinct"))
    agg = bottom.agg(
        F.lit(KMV_K).cast("long").alias("k"),
        F.max("h").cast("long").alias("kth_hash"),
        ((KMV_K - 1) * F.lit(HASH_SPACE) / F.max("h")).alias("est_distinct"),
    )
    return agg.crossJoin(F.broadcast(true_cnt))
