"""Extended relational coverage — the TPC-H-style patterns beyond the
reference's own operator set that a drop-in OLAP engine needs (SURVEY §7.8
north-star): correlated/scalar subqueries, conditional aggregation,
disjunctive predicate pushdown, HAVING + semi-join, analytic windows
(running sums, lead/lag), and ROLLUP grouping sets.

Same exactness discipline as plans.relational: decimal accumulation for
money, single-double-division ratios, pinned tie-breaks on every top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from tile_processor_spark.plans.registry import register
from tile_processor_spark.plans.relational import _cents, dsum, dsum_c2, dsum_rev
from tile_processor_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, name, sf_dir)


@register(
    "q2_min_price_supplier",
    oracle="""
    WITH offers AS (
      SELECT l_partkey, l_suppkey,
             CAST(MIN(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS best_price
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    best AS (
      SELECT l_partkey, MIN(best_price) AS min_price FROM offers GROUP BY l_partkey
    )
    SELECT p_partkey, p_name, s_name, min_price AS price
    FROM offers o
    JOIN best b ON o.l_partkey = b.l_partkey AND o.best_price = b.min_price
    JOIN part ON p_partkey = o.l_partkey
    JOIN supplier ON s_suppkey = o.l_suppkey
    WHERE p_size >= 48
    """,
    doc=(
        "TPC-H Q2 pattern: correlated-min subquery decorrelated into "
        "aggregate + self-join (ties kept, like Q2). At scale the `best` "
        "side is the small aggregate; Catalyst broadcast applies."
    ),
    tags=("relational-ext", "subquery"),
)
def q2_min_price_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_size") >= 48)
    supp = _t(spark, sf_dir, "supplier")
    offers = li.groupBy("l_partkey", "l_suppkey").agg(
        # min needs no decimal detour: double conversion of exact-2-dp
        # rationals is monotone, so min(double) IS the decimal min's double
        F.min(F.col("l_extendedprice")).alias("best_price")
    )
    best = offers.groupBy("l_partkey").agg(F.min("best_price").alias("min_price"))
    return (
        offers.join(
            best,
            (offers.l_partkey == best.l_partkey) & (offers.best_price == best.min_price),
        )
        .drop(best.l_partkey)
        .join(part, F.col("l_partkey") == part.p_partkey)
        .join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .select("p_partkey", "p_name", "s_name", F.col("min_price").alias("price"))
    )


@register(
    "q7_nation_volume",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS INT) AS l_year,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation n1 ON n1.n_nationkey = s_nationkey
    JOIN nation n2 ON n2.n_nationkey = c_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    GROUP BY 1, 2, 3
    """,
    doc="TPC-H Q7: double nation-dim join with symmetric pair predicate.",
    tags=("relational-ext", "join"),
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("s_nk"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("c_nk"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return joined.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").cast("int").alias("l_year")
    ).agg(dsum_rev("revenue"))


@register(
    "q8_market_share",
    oracle="""
    WITH volumes AS (
      SELECT CAST(year(o_orderdate) AS INT) AS o_year,
             CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)) AS volume,
             n_name
      FROM lineitem
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation   ON n_nationkey = s_nationkey
    )
    SELECT o_year,
           CAST(SUM(CASE WHEN n_name = 'NATION_3' THEN volume ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE) AS mkt_share
    FROM volumes GROUP BY o_year
    """,
    doc=(
        "TPC-H Q8: market share as a ratio of conditional decimal sums — "
        "one double division of two exact values."
    ),
    tags=("relational-ext", "agg"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    vol = F.col("volume")
    volumes = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            # ×10⁴ scaled-long revenue (see relational._revenue_c): the
            # conditional and total sums stay exact integers; ONE
            # decimal rescale per sum recovers the identical doubles
            (_cents(F.col("l_extendedprice")) * (100 - _cents(F.col("l_discount"))))
            .cast("decimal(18,0)")
            .alias("volume"),
            "n_name",
        )
    )
    zero = F.lit(0).cast("decimal(18,0)")
    scale4 = F.lit(0.0001).cast("decimal(5,4)")
    return volumes.groupBy("o_year").agg(
        (
            (F.sum(F.when(F.col("n_name") == "NATION_3", vol).otherwise(zero)) * scale4)
            .cast("double")
            / (F.sum(vol) * scale4).cast("double")
        ).alias("mkt_share")
    )


@register(
    "q9_profit_by_nation",
    oracle="""
    SELECT n_name, CAST(year(o_orderdate) AS INT) AS o_year,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS amount
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN nation   ON n_nationkey = s_nationkey
    WHERE p_name LIKE '%red%'
    GROUP BY 1, 2
    """,
    doc="TPC-H Q9 pattern: LIKE-filtered part dim over a 5-way join.",
    tags=("relational-ext", "join"),
)
def q9_profit_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    nation = _t(spark, sf_dir, "nation")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("n_name", F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(dsum_rev("amount"))
    )


@register(
    "q12_priority_by_status",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_count
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l_linestatus
    """,
    doc="TPC-H Q12: CASE-based conditional counting after a fact join.",
    tags=("relational-ext", "agg"),
)
def q12_priority_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_count"),
        )
    )


@register(
    "q14_promo_share",
    oracle="""
    SELECT CAST(SUM(CASE WHEN p_type = 'PROMO'
                         THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
                         ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
           / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
           AS promo_share,
           COUNT(*) AS n_items
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-03-01' AND l_shipdate < TIMESTAMP '1997-04-01'
    """,
    doc="TPC-H Q14: promo revenue share — conditional/total decimal sums, one division.",
    tags=("relational-ext", "agg"),
)
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    part = _t(spark, sf_dir, "part")
    rev = (_cents(F.col("l_extendedprice")) * (100 - _cents(F.col("l_discount")))).cast(
        "decimal(18,0)"
    )
    zero = F.lit(0).cast("decimal(18,0)")
    scale4 = F.lit(0.0001).cast("decimal(5,4)")
    return li.join(part, li.l_partkey == part.p_partkey).agg(
        (
            (F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(zero)) * scale4)
            .cast("double")
            / (F.sum(rev) * scale4).cast("double")
        ).alias("promo_share"),
        F.count(F.lit(1)).alias("n_items"),
    )


@register(
    "q18_large_orders",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS total_qty
    FROM orders
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN customer ON c_custkey = o_custkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > 160
    )
    GROUP BY c_custkey, c_name, o_orderkey
    """,
    doc="TPC-H Q18: IN-aggregate subquery as semi-join on a HAVING aggregate.",
    tags=("relational-ext", "semijoin"),
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        # scaled-long HAVING: sum of ×100-long quantities, compared at
        # the same scale (exact integers — identical qualification set)
        .agg(F.sum(_cents(F.col("l_quantity")).cast("decimal(18,0)")).alias("sq"))
        .filter(F.col("sq") > 160 * 100)
        .select("l_orderkey")
    )
    return (
        orders.join(big.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey", "left_semi")
        .join(li, orders.o_orderkey == li.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name", "o_orderkey")
        .agg(dsum_c2(F.col("l_quantity"), "total_qty"))
    )


@register(
    "q19_disjunctive_pred",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 1 AND l_quantity <= 21)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity >= 10 AND l_quantity <= 30)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 45 AND l_quantity >= 20 AND l_quantity <= 40)
    """,
    doc=(
        "TPC-H Q19: OR-of-ANDs across both join sides — Catalyst splits "
        "the common single-side conjuncts below the join."
    ),
    tags=("relational-ext", "filter"),
)
def q19_disjunctive_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    j = li.join(part, li.l_partkey == part.p_partkey)
    q = F.col("l_quantity")
    sz = F.col("p_size")
    cond = (
        ((F.col("p_brand") == "Brand#1") & sz.between(1, 15) & (q >= 1) & (q <= 21))
        | ((F.col("p_brand") == "Brand#2") & sz.between(10, 30) & (q >= 10) & (q <= 30))
        | ((F.col("p_brand") == "Brand#3") & sz.between(20, 45) & (q >= 20) & (q <= 40))
    )
    return j.filter(cond).agg(
        dsum_rev("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


@register(
    "q22_idle_customers",
    oracle="""
    WITH rich AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS s,
             COUNT(*) AS n
      FROM customer WHERE c_acctbal > 0
    )
    SELECT c_custkey % 7 AS cc, COUNT(*) AS n_cust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_bal
    FROM customer, rich
    WHERE c_acctbal > s / n
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 250000)
    GROUP BY 1
    """,
    doc=(
        "TPC-H Q22: scalar-average threshold (exact decimal sum / count, "
        "one double division — no float-average nondeterminism) + NOT "
        "EXISTS anti-join, grouped by a derived country code."
    ),
    tags=("relational-ext", "antijoin", "subquery"),
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 250000)
    rich = cust.filter(F.col("c_acctbal") > 0).agg(
        F.sum(F.col("c_acctbal").cast("decimal(18,4)")).cast("double").alias("s"),
        F.count(F.lit(1)).alias("n"),
    )
    return (
        cust.crossJoin(F.broadcast(rich))
        .filter(F.col("c_acctbal") > F.col("s") / F.col("n"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy((F.col("c_custkey") % 7).alias("cc"))
        .agg(F.count(F.lit(1)).alias("n_cust"), dsum(F.col("c_acctbal"), "total_bal"))
    )


@register(
    "window_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey, epoch_us(o_orderdate) AS odate_us,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_total
    FROM orders
    """,
    doc=(
        "Analytic window: per-customer running revenue (decimal "
        "accumulation; frame order pinned by (date, key))."
    ),
    tags=("relational-ext", "window"),
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("odate_us"),
        (
            F.sum(_cents(F.col("o_totalprice")).cast("decimal(18,0)")).over(w)
            * F.lit(0.01).cast("decimal(3,2)")
        ).cast("double").alias("running_total"),
    )


@register(
    "window_order_gaps",
    oracle="""
    SELECT o_custkey, o_orderkey,
           epoch_us(o_orderdate) - epoch_us(LAG(o_orderdate) OVER
             (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)) AS gap_us,
           LEAD(o_orderkey) OVER
             (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_order
    FROM orders
    """,
    doc="Analytic window: lead/lag inter-order gaps per customer (µs-exact).",
    tags=("relational-ext", "window"),
)
def window_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        (F.unix_micros(F.col("o_orderdate").cast("timestamp"))
         - F.unix_micros(F.lag("o_orderdate").over(w).cast("timestamp"))).alias("gap_us"),
        F.lead("o_orderkey").over(w).alias("next_order"),
    )


@register(
    "rollup_order_stats",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INT) AS yr, o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
    FROM orders
    GROUP BY ROLLUP (1, 2)
    """,
    doc=(
        "ROLLUP grouping sets (year, status) → subtotals + grand total. "
        "Beyond the reference (SURVEY §2.4: no grouping sets) — required "
        "OLAP surface."
    ),
    tags=("relational-ext", "agg", "rollup"),
)
def rollup_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return orders.rollup(
        F.year("o_orderdate").cast("int").alias("yr"), "o_orderstatus"
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum_c2(F.col("o_totalprice"), "total"),
    )


@register(
    "window_rank_family",
    oracle="""
    SELECT c_nationkey, c_custkey,
           CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
           PERCENT_RANK() OVER w AS pr,
           CUME_DIST() OVER w AS cd
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey
                 ORDER BY c_acctbal DESC, c_custkey)
    """,
    doc=(
        "Ranking-function family beyond rank/row_number: NTILE quartiles, "
        "PERCENT_RANK, CUME_DIST per nation over account balance. The "
        "(c_acctbal DESC, c_custkey) order is a total order, so every "
        "rank value — including the rational pr/cd doubles, which are "
        "single divisions of exact integer ranks — is engine-independent. "
        "One shuffle on the partition key, same as any window."
    ),
    tags=("relational-ext", "window"),
)
def window_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), "c_custkey")
    return c.select(
        "c_nationkey",
        "c_custkey",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )


@register(
    "grouping_sets_order_stats",
    oracle="""
    SELECT COALESCE(o_orderstatus, '<all>') AS status,
           COALESCE(o_orderpriority, '<all>') AS priority,
           CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                            (o_orderstatus), (o_orderpriority), ())
    """,
    doc=(
        "GROUPING SETS with grouping_id — the explicit-sets member of "
        "the rollup/cube family (the other two are registered "
        "separately): status×priority totals plus each single-dimension "
        "margin plus the grand total in ONE aggregation pass (Catalyst "
        "expands sets into a single Expand + hash aggregate — one "
        "shuffle, not four queries). gid disambiguates margin rows from "
        "real '<all>' values; both engines emit the same left-to-right "
        "grouping bitmask."
    ),
    tags=("relational-ext", "grouping"),
)
def grouping_sets_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "orders").createOrReplaceTempView("_gs_orders")
    return spark.sql(
        """
        SELECT COALESCE(o_orderstatus, '<all>') AS status,
               COALESCE(o_orderpriority, '<all>') AS priority,
               CAST(grouping_id() AS BIGINT) AS gid,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        FROM _gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderstatus), (o_orderpriority), ())
        """
    )
