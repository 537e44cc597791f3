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

from tile_processor_spark.plans.relational import _cents, _revenue_c
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
        "dimension with full tie-breaks (recency DESC so 5 = most "
        "recent, matching marketing convention). The embedding every "
        "retention/churn campaign keys on. Physical strategy is the "
        "distributed two-pass prefix sum (the events_sweep_partitioned "
        "discipline), NOT a global NTILE window: local row_number "
        "within each value BAND (parallel windows), cumulative band-"
        "count offsets over the tiny band series (bounded by the "
        "value domain, not the customer count), global rank = offset "
        "+ local rank, then the exact NTILE bucket arithmetic from "
        "(rank, n). The oracle stays the single-window NTILE form — "
        "physical re-strategies must be value-invisible."
    ),
    tags=("relational-ext", "window", "agg", "scale"),
)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    base = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        (
            F.lit(RFM_REF_DAY)
            - F.max(F.datediff(F.col("o_orderdate"), F.lit("1970-01-01")))
        ).alias("recency_days"),
        F.count(F.lit(1)).cast("long").alias("frequency"),
        (
            F.sum(_cents(F.col("o_totalprice")).cast("decimal(18,0)"))
            * F.lit(0.01).cast("decimal(3,2)")
        )
        .cast("double")
        .alias("monetary"),
    ).localCheckpoint()  # feeds three rankings + the final join
    r = _ntile5_distributed(
        base, "recency_days", F.col("recency_days").cast("long"), True, "r"
    )
    f = _ntile5_distributed(
        base, "frequency", F.col("frequency"), False, "f"
    )
    m = _ntile5_distributed(
        base, "monetary", F.floor(F.col("monetary") / 10000).cast("long"), False, "m"
    )
    return (
        base.join(r, "custkey")
        .join(f, "custkey")
        .join(m, "custkey")
        .select(
            "custkey", "recency_days", "frequency", "monetary", "r", "f", "m"
        )
    )


def _ntile5_distributed(
    base: DataFrame, value: str, band: F.Column, desc: bool, out: str
) -> DataFrame:
    """Global NTILE(5) over (value [DESC], custkey) WITHOUT a single-
    partition fact-grain window. Pass 1: row_number within each value
    band (band = a monotone coarsening of the order key, so band order
    extends to global order). Pass 2: exclusive cumulative band-count
    offsets over the band series (cardinality bounded by the VALUE
    domain — days / order counts / price range — not the row count),
    broadcast back; global rank = offset + local rank. Bucket = the
    exact NTILE arithmetic: with q = n div 5, r = n mod 5, the first r
    buckets take q+1 rows, the rest q."""
    b = base.select("custkey", value).withColumn("_band", band)
    order = [F.desc(value) if desc else F.asc(value), F.asc("custkey")]
    local = b.withColumn(
        "_lrk", F.row_number().over(W.partitionBy("_band").orderBy(*order))
    )
    counts = b.groupBy("_band").agg(F.count(F.lit(1)).alias("_bc"))
    woff = W.orderBy(F.desc("_band") if desc else F.asc("_band")).rowsBetween(
        W.unboundedPreceding, -1
    )
    offs = counts.select(
        "_band", F.coalesce(F.sum("_bc").over(woff), F.lit(0)).alias("_off")
    )
    n = base.agg(F.count(F.lit(1)).alias("_n"))
    bucket = F.expr(
        "CASE WHEN _rk <= (_n % 5) * ((_n div 5) + 1) "
        "THEN (_rk + (_n div 5)) div ((_n div 5) + 1) "
        "ELSE (_n % 5) + ((_rk - (_n % 5) * ((_n div 5) + 1) + (_n div 5) - 1) "
        "div (_n div 5)) END"
    )
    return (
        local.join(F.broadcast(offs), "_band")
        .crossJoin(F.broadcast(n))
        .withColumn("_rk", F.col("_off") + F.col("_lrk"))
        .select("custkey", bucket.cast("long").alias(out))
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
        "flip class between engines. Physical strategy: the "
        "distributed two-pass prefix sum — running sum + row_number "
        "WITHIN each revenue band (parallel windows), exclusive "
        "cumulative (revenue, count) offsets over the tiny band "
        "series broadcast back (decimal addition is exact, so the "
        "re-association is value-invisible); no window ever orders "
        "the full part grain on one partition. The oracle stays the "
        "single-window form."
    ),
    tags=("relational-ext", "window", "agg", "scale"),
)
def pareto_abc_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    rev = li.groupBy(F.col("l_partkey").alias("partkey")).agg(
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
        ).alias("revenue")
    ).localCheckpoint()  # feeds the banding, the band series, and the total
    banded = rev.withColumn("_band", F.floor(F.col("revenue") / 1000).cast("long"))
    wloc = W.partitionBy("_band").orderBy(F.desc("revenue"), "partkey")
    wrun = wloc.rowsBetween(W.unboundedPreceding, W.currentRow)
    local = banded.select(
        "partkey",
        "revenue",
        "_band",
        F.sum("revenue").over(wrun).alias("_lcum"),
        F.row_number().over(wloc).alias("_lrk"),
    )
    bands = banded.groupBy("_band").agg(
        F.sum("revenue").alias("_brev"), F.count(F.lit(1)).alias("_bc")
    )
    woff = W.orderBy(F.desc("_band")).rowsBetween(W.unboundedPreceding, -1)
    offs = bands.select(
        "_band",
        F.coalesce(
            F.sum("_brev").over(woff), F.lit(0).cast("decimal(38,4)")
        ).alias("_roff"),
        F.coalesce(F.sum("_bc").over(woff), F.lit(0)).alias("_coff"),
    )
    tot = rev.agg(F.sum("revenue").alias("total_rev"))
    ranked = (
        local.join(F.broadcast(offs), "_band")
        .crossJoin(F.broadcast(tot))
        .select(
            "partkey",
            "revenue",
            (F.col("_roff") + F.col("_lcum")).alias("cum_rev"),
            (F.col("_coff") + F.col("_lrk")).cast("long").alias("rk"),
            "total_rev",
        )
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


@register(
    "orders_cohort_ltv",
    oracle="""
    WITH firsts AS (
      SELECT o_custkey AS custkey,
             MIN(date_trunc('month', o_orderdate)) AS cohort_month
      FROM orders GROUP BY o_custkey
    ),
    spend AS (
      SELECT f.cohort_month,
             date_diff('month', f.cohort_month,
                       date_trunc('month', o.o_orderdate)) AS months_since,
             SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS rev,
             CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM orders o JOIN firsts f ON o.o_custkey = f.custkey
      GROUP BY 1, 2
    ),
    cohort_n AS (
      SELECT cohort_month, CAST(COUNT(*) AS BIGINT) AS cohort_users
      FROM firsts GROUP BY cohort_month
    )
    SELECT CAST(s.cohort_month AS DATE) AS cohort_month,
           CAST(s.months_since AS BIGINT) AS months_since,
           s.n_orders, c.cohort_users,
           CAST(SUM(s.rev) OVER (PARTITION BY s.cohort_month
             ORDER BY s.months_since
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             / c.cohort_users AS cum_ltv_per_user
    FROM spend s JOIN cohort_n c USING (cohort_month)
    """,
    doc=(
        "Cohort LTV triangle: customers grouped by first-order month, "
        "revenue bucketed by months-since-acquisition, cumulative "
        "spend per cohort user via a decimal running sum — the "
        "customer-lifetime-value table every growth team maintains, "
        "and the revenue-weighted complement of "
        "events_retention_cohorts (which counts users). Exactness: "
        "decimal revenue end-to-end; ONE double division per cell at "
        "the end. Shape: fact aggregate to (cohort x month) grain "
        "first, so the running-sum window runs over the tiny "
        "triangle, never order rows."
    ),
    tags=("relational-ext", "window", "agg"),
)
def orders_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    firsts = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.min(F.date_trunc("month", "o_orderdate").cast("date")).alias("cohort_month")
    )
    spend = (
        o.join(firsts, o["o_custkey"] == firsts["custkey"])
        .groupBy(
            "cohort_month",
            (
                F.months_between(
                    F.date_trunc("month", "o_orderdate"), F.col("cohort_month")
                )
            )
            .cast("long")
            .alias("months_since"),
        )
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias("rev"),
            F.count(F.lit(1)).cast("long").alias("n_orders"),
        )
    )
    cohort_n = firsts.groupBy("cohort_month").agg(
        F.count(F.lit(1)).cast("long").alias("cohort_users")
    )
    wrun = (
        W.partitionBy("cohort_month")
        .orderBy("months_since")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        spend.join(F.broadcast(cohort_n), "cohort_month")
        .withColumn("cum_rev", F.sum("rev").over(wrun))
        .select(
            "cohort_month",
            "months_since",
            "n_orders",
            "cohort_users",
            (F.col("cum_rev").cast("double") / F.col("cohort_users")).alias(
                "cum_ltv_per_user"
            ),
        )
    )


@register(
    "nation_revenue_hhi",
    oracle="""
    WITH per_supp AS (
      SELECT n.n_name,
             -- unit-rounded revenue: squares stay < 2^53, so every
             -- decimal->double conversion below is EXACT in both engines
             CAST(FLOOR(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))))
                  AS DECIMAL(18,0)) AS rev_u
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      GROUP BY n.n_name, s.s_suppkey
    )
    SELECT n_name,
           CAST(COUNT(*) AS BIGINT) AS n_suppliers,
           CAST(SUM(rev_u * rev_u) AS DOUBLE)
             / (CAST(SUM(rev_u) AS DOUBLE) * CAST(SUM(rev_u) AS DOUBLE)) AS hhi,
           1.0 / COUNT(*) AS hhi_floor
    FROM per_supp GROUP BY n_name
    """,
    doc=(
        "Herfindahl-Hirschman concentration index of supplier revenue "
        "per nation: HHI = sum(share_i^2) computed as "
        "sum(rev^2)/sum(rev)^2 on FLOOR-to-unit revenue — the identity "
        "keeps accumulators exact decimals, and unit rounding keeps "
        "squares under 2^53 so every decimal->double conversion is "
        "exact in both engines (wide-scale conversions diverge in the "
        "last ulp; this metric is insensitive to sub-unit cents). "
        "1/n is the perfectly-competitive floor "
        "for context. The market-concentration / load-balance metric "
        "— the same number diagnoses revenue concentration and "
        "partition-size skew. Per-supplier grain aggregates map-side; "
        "the HHI aggregate runs over the supplier dimension."
    ),
    tags=("relational-ext", "agg", "stats"),
)
def nation_revenue_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    per_supp = (
        li.join(supp, li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(nation), supp["s_nationkey"] == nation["n_nationkey"])
        .groupBy("n_name", "s_suppkey")
        .agg(
            F.floor(
                F.sum(_revenue_c().cast("decimal(18,0)"))
                * F.lit(0.0001).cast("decimal(5,4)")
            )
            .cast("decimal(18,0)")
            .alias("rev_u")
        )
    )
    return per_supp.groupBy("n_name").agg(
        F.count(F.lit(1)).cast("long").alias("n_suppliers"),
        (
            F.sum(F.col("rev_u") * F.col("rev_u")).cast("double")
            / (F.sum("rev_u").cast("double") * F.sum("rev_u").cast("double"))
        ).alias("hhi"),
        (F.lit(1.0) / F.count(F.lit(1))).alias("hhi_floor"),
    )
