"""Round-5 third analytics batch: market-basket association rules and
RFM customer segmentation — the two classic retail-analytics shapes the
registry didn't exercise yet (within-group self-join co-occurrence;
multi-dimension quantile bucketing).

Same exactness discipline as the rest of the registry: exact integer
counts, decimal money sums, rank-based quantiles with full tie-breaks,
doubles only in final fixed expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from tile_processor_spark.plans.registry import register
from tile_processor_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, name, sf_dir)


BASKET_MIN_SUPPORT = 5  # brand pair must co-occur in >= 5 orders


@register(
    "basket_brand_pairs",
    oracle=f"""
    WITH ob AS (
      SELECT DISTINCT l.l_orderkey AS okey, p.p_brand AS brand
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    n_orders AS (SELECT CAST(COUNT(DISTINCT okey) AS BIGINT) AS n FROM ob),
    brand_cnt AS (
      SELECT brand, CAST(COUNT(*) AS BIGINT) AS cnt FROM ob GROUP BY brand
    ),
    pairs AS (
      SELECT a.brand AS b1, b.brand AS b2, CAST(COUNT(*) AS BIGINT) AS both_cnt
      FROM ob a JOIN ob b ON a.okey = b.okey AND a.brand < b.brand
      GROUP BY a.brand, b.brand
    )
    SELECT p.b1, p.b2, p.both_cnt, c1.cnt AS b1_cnt, c2.cnt AS b2_cnt,
           CAST(p.both_cnt AS DOUBLE) / n.n AS support,
           CAST(p.both_cnt AS DOUBLE) / c1.cnt AS confidence_1_to_2,
           CAST(p.both_cnt AS DOUBLE) * n.n / (CAST(c1.cnt AS DOUBLE) * c2.cnt)
             AS lift
    FROM pairs p
    JOIN brand_cnt c1 ON p.b1 = c1.brand
    JOIN brand_cnt c2 ON p.b2 = c2.brand
    CROSS JOIN n_orders n
    WHERE p.both_cnt >= {BASKET_MIN_SUPPORT}
    """,
    doc=(
        "Market-basket association rules over order contents: distinct "
        "(order, brand) pairs -> within-order brand co-occurrence "
        "self-join -> support / confidence / lift per brand pair (each "
        "one exact-integer ratio evaluated once). The Apriori 2-itemset "
        "pass. Scale shape: the self-join is keyed on orderkey (an "
        "equi-join whose fan-out is bounded by brands-per-order "
        "squared, not corpus size), brand marginals are "
        "dimension-sized broadcasts, and the min-support filter is the "
        "standard candidate-pruning step that keeps the output "
        "itemset-sparse at any scale."
    ),
    tags=("relational-ext", "join", "agg"),
)
def basket_brand_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    ob = (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .select(F.col("l_orderkey").alias("okey"), F.col("p_brand").alias("brand"))
        .distinct()
        # deliberately NOT checkpointed: ob is fact-grain; at scale
        # materialize it once as a bucketed table instead of pinning a
        # fact-sized block in executor storage
    )
    n_orders = ob.agg(F.count_distinct("okey").cast("long").alias("n"))
    brand_cnt = ob.groupBy("brand").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    pairs = (
        ob.alias("a")
        .join(ob.alias("b"), "okey")
        .filter(F.col("a.brand") < F.col("b.brand"))
        .groupBy(F.col("a.brand").alias("b1"), F.col("b.brand").alias("b2"))
        .agg(F.count(F.lit(1)).cast("long").alias("both_cnt"))
        .filter(F.col("both_cnt") >= BASKET_MIN_SUPPORT)
    )
    c1 = brand_cnt.select(F.col("brand").alias("b1"), F.col("cnt").alias("b1_cnt"))
    c2 = brand_cnt.select(F.col("brand").alias("b2"), F.col("cnt").alias("b2_cnt"))
    return (
        pairs.join(F.broadcast(c1), "b1")
        .join(F.broadcast(c2), "b2")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "b1",
            "b2",
            "both_cnt",
            "b1_cnt",
            "b2_cnt",
            (F.col("both_cnt").cast("double") / F.col("n")).alias("support"),
            (F.col("both_cnt").cast("double") / F.col("b1_cnt")).alias(
                "confidence_1_to_2"
            ),
            (
                F.col("both_cnt").cast("double")
                * F.col("n")
                / (F.col("b1_cnt").cast("double") * F.col("b2_cnt"))
            ).alias("lift"),
        )
    )


RFM_REF_DAY = 20089  # fixed reference day (1970-01-01 + n): analysis date


@register(
    "customer_rfm_segments",
    oracle=f"""
    WITH base AS (
      SELECT o_custkey AS custkey,
             {RFM_REF_DAY} - MAX(date_diff('day', DATE '1970-01-01', o_orderdate))
               AS recency_days,
             CAST(COUNT(*) AS BIGINT) AS frequency,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS monetary
      FROM orders GROUP BY o_custkey
    )
    SELECT custkey, recency_days, frequency, monetary,
           CAST(ntile(5) OVER (ORDER BY recency_days DESC, custkey) AS BIGINT) AS r,
           CAST(ntile(5) OVER (ORDER BY frequency, custkey) AS BIGINT) AS f,
           CAST(ntile(5) OVER (ORDER BY monetary, custkey) AS BIGINT) AS m
    FROM base
    """,
    doc=(
        "RFM customer segmentation: per-customer recency (days from "
        "last order to a fixed analysis date), frequency (order "
        "count), monetary (decimal-exact spend) -> 1-5 quintile per "
        "dimension via NTILE with full tie-breaks (recency DESC so "
        "5 = most recent, matching marketing convention). The "
        "embedding every retention/churn campaign keys on. Scale "
        "note: the three global NTILEs are single-partition windows "
        "over the CUSTOMER grain (dimension-sized after the one fact "
        "aggregate); at a 10^9-customer grain swap NTILE for the "
        "rank-arithmetic bucketing of orders_percentile_cont to keep "
        "the plan shuffle-parallel."
    ),
    tags=("relational-ext", "window", "agg"),
)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    base = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        (
            F.lit(RFM_REF_DAY)
            - F.max(F.datediff(F.col("o_orderdate"), F.lit("1970-01-01")))
        ).alias("recency_days"),
        F.count(F.lit(1)).cast("long").alias("frequency"),
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .cast("double")
        .alias("monetary"),
    )
    return base.select(
        "custkey",
        "recency_days",
        "frequency",
        "monetary",
        F.ntile(5)
        .over(W.orderBy(F.desc("recency_days"), "custkey"))
        .cast("long")
        .alias("r"),
        F.ntile(5).over(W.orderBy("frequency", "custkey")).cast("long").alias("f"),
        F.ntile(5).over(W.orderBy("monetary", "custkey")).cast("long").alias("m"),
    )


@register(
    "pareto_abc_parts",
    oracle="""
    WITH rev AS (
      SELECT l_partkey AS partkey,
             SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
               AS revenue
      FROM lineitem GROUP BY l_partkey
    ),
    ranked AS (
      SELECT partkey, revenue,
             SUM(revenue) OVER (ORDER BY revenue DESC, partkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_rev,
             SUM(revenue) OVER () AS total_rev,
             row_number() OVER (ORDER BY revenue DESC, partkey) AS rk
      FROM rev
    )
    SELECT partkey, CAST(revenue AS DOUBLE) AS revenue, rk,
           CAST(cum_rev AS DOUBLE) / CAST(total_rev AS DOUBLE) AS cum_share,
           CASE WHEN cum_rev * 10 <= total_rev * 8 THEN 'A'
                WHEN cum_rev * 100 <= total_rev * 95 THEN 'B'
                ELSE 'C' END AS abc_class
    FROM ranked
    """,
    doc=(
        "Pareto / ABC inventory analysis: parts ranked by exact "
        "decimal revenue, cumulative share via a decimal running sum "
        "(order fully tie-broken), classed A (first 80% of revenue) / "
        "B (to 95%) / C — with the class thresholds evaluated as "
        "EXACT decimal cross-multiplications (cum*10 <= total*8), "
        "never a float cumulative ratio, so the boundary part can't "
        "flip class between engines. The global running sum is the "
        "honest cost: one single-partition window over the PART grain "
        "(dimension-sized after the fact aggregate) — same caveat and "
        "same fix as customer_rfm_segments documents."
    ),
    tags=("relational-ext", "window", "agg"),
)
def pareto_abc_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    rev = li.groupBy(F.col("l_partkey").alias("partkey")).agg(
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
        ).alias("revenue")
    )
    wo = W.orderBy(F.desc("revenue"), "partkey")
    wrun = wo.rowsBetween(W.unboundedPreceding, W.currentRow)
    wall = W.orderBy(F.lit(1)).rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    ranked = rev.select(
        "partkey",
        "revenue",
        F.sum("revenue").over(wrun).alias("cum_rev"),
        F.sum("revenue").over(wall).alias("total_rev"),
        F.row_number().over(wo).alias("rk"),
    )
    return ranked.select(
        "partkey",
        F.col("revenue").cast("double").alias("revenue"),
        "rk",
        (F.col("cum_rev").cast("double") / F.col("total_rev").cast("double")).alias(
            "cum_share"
        ),
        F.when(F.col("cum_rev") * 10 <= F.col("total_rev") * 8, "A")
        .when(F.col("cum_rev") * 100 <= F.col("total_rev") * 95, "B")
        .otherwise("C")
        .alias("abc_class"),
    )


@register(
    "dq_key_skew",
    oracle="""
    WITH per_key AS (
      SELECT l_suppkey AS key, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM lineitem GROUP BY l_suppkey
    ),
    stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
             CAST(SUM(cnt) AS BIGINT) AS n_rows,
             CAST(MAX(cnt) AS BIGINT) AS max_cnt
      FROM per_key
    ),
    top AS (
      SELECT CAST(SUM(cnt) AS BIGINT) AS top10_rows FROM (
        SELECT cnt FROM per_key ORDER BY cnt DESC, key LIMIT 10
      )
    )
    SELECT s.n_keys, s.n_rows, s.max_cnt,
           CAST(s.max_cnt AS DOUBLE) * s.n_keys / s.n_rows AS max_over_mean,
           CAST(t.top10_rows AS DOUBLE) / s.n_rows AS top10_share
    FROM stats s CROSS JOIN top t
    """,
    doc=(
        "Join-key skew diagnostic for the fact table's supplier key: "
        "key count, max key frequency, max/mean ratio, and the row "
        "share of the 10 hottest keys — the numbers that decide "
        "between a plain shuffle join, AQE skew-join splitting, and "
        "explicit salting (pipeline/skew.py) BEFORE a 100 TB job "
        "launches. One aggregate over the per-key counts (map-side "
        "combined) + a TakeOrderedAndProject for the hot-key mass; "
        "the profile itself never shuffles fact rows."
    ),
    tags=("relational-ext", "dq", "agg"),
)
def dq_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    per_key = li.groupBy(F.col("l_suppkey").alias("key")).agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    stats = per_key.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("cnt").cast("long").alias("n_rows"),
        F.max("cnt").cast("long").alias("max_cnt"),
    )
    top = (
        per_key.orderBy(F.desc("cnt"), "key")
        .limit(10)
        .agg(F.sum("cnt").cast("long").alias("top10_rows"))
    )
    return stats.crossJoin(F.broadcast(top)).select(
        "n_keys",
        "n_rows",
        "max_cnt",
        (F.col("max_cnt").cast("double") * F.col("n_keys") / F.col("n_rows")).alias(
            "max_over_mean"
        ),
        (F.col("top10_rows").cast("double") / F.col("n_rows")).alias("top10_share"),
    )
