"""Completion of the TPC-H query-pattern family (Q11/Q13/Q15/Q16/Q17/
Q20/Q21 analogues), adapted to the testdata star schema — which has no
``partsupp`` table, so part-supplier relations derive from ``lineitem``
(the same adaptation Q2 uses in plans.relational_ext), and no
``l_commitdate``/``l_receiptdate``, so Q21's "late" predicate becomes
ship-lag vs the order date.

Each query exercises a distinct plan shape the others don't: scalar
global-threshold subquery (Q11), left-outer join with a join-side
predicate + double aggregation (Q13), scalar-max with ties (Q15),
COUNT(DISTINCT) with a NOT-IN anti-join (Q16), correlated per-group
average threshold (Q17), nested semi-join chain (Q20), and
EXISTS/NOT-EXISTS over the same fact table decorrelated into one
per-order aggregate (Q21).

Exactness discipline as plans.relational: decimal accumulation for
money, single double divisions, pinned tie-breaks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tile_processor_spark.plans.registry import register
from tile_processor_spark.plans.relational import _cents, dsum, dsum_c2, dsum_rev
from tile_processor_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, name, sf_dir)


@register(
    "q11_important_parts",
    oracle="""
    WITH vp AS (
      SELECT l_partkey,
             SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(18,4))) AS val
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON n_nationkey = s_nationkey
      WHERE n_name = 'NATION_1'
      GROUP BY l_partkey
    )
    SELECT l_partkey, CAST(val AS DOUBLE) AS part_value
    FROM vp, (SELECT CAST(SUM(val) AS DOUBLE) AS total FROM vp)
    WHERE CAST(val AS DOUBLE) > total * 0.001
    """,
    doc=(
        "TPC-H Q11 pattern: per-part inventory value filtered against a "
        "global-total scalar subquery (HAVING > fraction-of-total). The "
        "scalar is one row → broadcast; the per-part aggregate is "
        "computed once and reused for both sides (Catalyst reuses the "
        "exchange). Value = extendedprice·quantity over the NATION_1 "
        "supplier slice, standing in for partsupp supplycost·availqty."
    ),
    tags=("relational-ext", "subquery", "agg"),
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
    vp = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("l_partkey")
        .agg(
            # ×10⁴ scaled-long product sum (exact: 2-dp price × 2-dp
            # quantity); same rationals as the decimal(18,4) form
            F.sum(
                (_cents(F.col("l_extendedprice")) * _cents(F.col("l_quantity")))
                .cast("decimal(18,0)")
            ).alias("val_c")
        )
        # The aggregate feeds both the row side and the scalar total;
        # without persisting it, Catalyst plans the whole lineitem join
        # twice (verified via executedPlan) — two fact scans at 100 TB.
        # The per-part aggregate itself is dimension-sized.
        # localCheckpoint (not cache) so the blocks are reclaimed when
        # the DataFrame is dropped instead of leaking across queries.
        .localCheckpoint()
    )
    scale4 = F.lit(0.0001).cast("decimal(5,4)")
    total = vp.agg((F.sum("val_c") * scale4).cast("double").alias("total"))
    return (
        vp.crossJoin(F.broadcast(total))
        .filter((F.col("val_c") * scale4).cast("double") > F.col("total") * 0.001)
        .select("l_partkey", (F.col("val_c") * scale4).cast("double").alias("part_value"))
    )


@register(
    "q13_order_count_distribution",
    oracle="""
    WITH c_orders AS (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer
      LEFT JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    )
    SELECT c_count, COUNT(*) AS custdist
    FROM c_orders GROUP BY c_count
    """,
    doc=(
        "TPC-H Q13: customer order-count distribution. Left-outer join "
        "with the filter on the JOIN side (not WHERE — customers with no "
        "qualifying orders must survive as c_count=0), then a second "
        "aggregation over the first. COUNT(col) null-skipping does the "
        "zero-orders accounting."
    ),
    tags=("relational-ext", "outerjoin", "agg"),
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    c_orders = (
        cust.join(
            orders,
            (cust.c_custkey == orders.o_custkey) & (orders.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return c_orders.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey,
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
               AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier
    JOIN revenue ON s_suppkey = l_suppkey,
         (SELECT MAX(total_revenue) AS mx FROM revenue)
    WHERE total_revenue = mx
    """,
    doc=(
        "TPC-H Q15: top supplier by quarterly revenue — scalar-MAX "
        "subquery over a derived aggregate, ties kept (like the spec's "
        "view formulation). The revenue aggregate is tiny relative to "
        "lineitem, so both the max scalar and the supplier dim broadcast."
    ),
    tags=("relational-ext", "subquery", "agg"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    supp = _t(spark, sf_dir, "supplier")
    revenue = li.groupBy("l_suppkey").agg(
        dsum_rev("total_revenue")
    ).localCheckpoint()  # feeds both the scalar max and the join — scan
    # lineitem once; checkpoint blocks are GC-reclaimed, unlike cache()
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    return (
        revenue.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q16_supplier_count_by_part",
    oracle="""
    SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_type NOT LIKE 'PROMO%'
      AND p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_name LIKE '%7%')
    GROUP BY 1, 2, 3
    """,
    doc=(
        "TPC-H Q16: supplier diversity per (brand, type, size) — "
        "COUNT(DISTINCT) after a NOT-IN exclusion list. NOT IN on a "
        "non-nullable key is a left-anti join; the exclusion list and "
        "the filtered part dim both broadcast, so the only shuffle is "
        "the distinct-count aggregation itself."
    ),
    tags=("relational-ext", "antijoin", "agg"),
)
def q16_supplier_count_by_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & ~F.col("p_type").like("PROMO%")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    excluded = (
        _t(spark, sf_dir, "supplier").filter(F.col("s_name").like("%7%")).select("s_suppkey")
    )
    return (
        li.join(
            excluded, li.l_suppkey == excluded.s_suppkey, "left_anti"
        )
        .join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
    WITH avg_qty AS (
      SELECT l_partkey AS ap,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS aq
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / 7.0 AS avg_yearly,
           COUNT(*) AS n_items
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN avg_qty ON ap = p_partkey
    WHERE p_brand = 'Brand#2' AND l_quantity < 0.2 * aq
    """,
    doc=(
        "TPC-H Q17: small-quantity order revenue — correlated per-part "
        "AVG subquery decorrelated into an aggregate + join back to the "
        "fact. The average is an exact decimal sum over an exact count "
        "(one double division), so the 0.2·avg threshold is "
        "bit-identical in both engines."
    ),
    tags=("relational-ext", "subquery", "agg"),
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#2")
    avg_qty = li.groupBy(F.col("l_partkey").alias("ap")).agg(
        (
            (F.sum(_cents(F.col("l_quantity")).cast("decimal(18,0)"))
             * F.lit(0.01).cast("decimal(3,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("aq")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(avg_qty, F.col("l_partkey") == F.col("ap"))
        .filter(F.col("l_quantity") < 0.2 * F.col("aq"))
        .agg(
            (
                (F.sum(_cents(F.col("l_extendedprice")).cast("decimal(18,0)"))
                 * F.lit(0.01).cast("decimal(3,2)")).cast("double") / 7.0
            ).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q20_substantial_suppliers",
    oracle="""
    WITH qty AS (
      SELECT l_suppkey, l_partkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sq
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
      GROUP BY l_suppkey, l_partkey
    )
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey FROM qty
      JOIN part ON p_partkey = l_partkey
      WHERE p_name LIKE '%red%' AND sq > 50
    )
    """,
    doc=(
        "TPC-H Q20: suppliers who moved substantial volume of 'red' "
        "parts in 1997 — a nested semi-join chain (part-name filter → "
        "per-(supplier, part) quantity threshold → supplier semi-join), "
        "standing in for the spec's partsupp availqty correlation."
    ),
    tags=("relational-ext", "semijoin"),
)
def q20_substantial_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    supp = _t(spark, sf_dir, "supplier")
    qty = li.groupBy("l_suppkey", "l_partkey").agg(dsum_c2(F.col("l_quantity"), "sq"))
    qualifying = (
        qty.join(part, qty.l_partkey == part.p_partkey)
        .filter(F.col("sq") > 50)
        .select("l_suppkey")
    )
    return (
        supp.join(qualifying, supp.s_suppkey == qualifying.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
    )


@register(
    "cube_segment_priority",
    oracle="""
    SELECT c_mktsegment, o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
    FROM orders JOIN customer ON c_custkey = o_custkey
    GROUP BY CUBE (c_mktsegment, o_orderpriority)
    """,
    doc=(
        "CUBE grouping sets over (segment, priority): all four "
        "subtotal combinations in one pass — Spark expands to a single "
        "hash aggregate over the grouping-set id, one shuffle total "
        "(vs four separate group-bys re-reading the fact table). "
        "Completes the grouping-set family next to rollup_order_stats."
    ),
    tags=("relational-ext", "agg", "cube"),
)
def cube_segment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .cube("c_mktsegment", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum_c2(F.col("o_totalprice"), "total"),
        )
    )


@register(
    "q21_waiting_suppliers",
    oracle="""
    WITH l AS (
      SELECT l_orderkey, l_suppkey,
             (l_shipdate > o_orderdate + INTERVAL 60 DAY) AS late
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE o_orderstatus = 'F'
    )
    SELECT s_name, COUNT(*) AS numwait
    FROM l l1
    JOIN supplier ON s_suppkey = l1.l_suppkey
    WHERE l1.late
      AND EXISTS (SELECT 1 FROM l l2
                  WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM l l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey AND l3.late)
    GROUP BY s_name
    """,
    doc=(
        "TPC-H Q21 pattern: suppliers who alone held up multi-supplier "
        "orders ('late' = shipped >60 days after the order date, since "
        "the schema has no commit/receipt dates). The oracle keeps the "
        "spec's EXISTS / NOT-EXISTS formulation; the Spark plan "
        "decorrelates both into ONE per-order aggregate — distinct "
        "supplier count ≥ 2 and distinct *late* supplier count = 1 — "
        "turning two correlated self-joins into a single reduction, the "
        "shape that survives 100 TB (one shuffle of (orderkey) instead "
        "of two fact×fact joins)."
    ),
    tags=("relational-ext", "subquery", "agg"),
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    supp = _t(spark, sf_dir, "supplier")
    lat = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            "l_orderkey",
            "l_suppkey",
            (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
            ).alias("late"),
        )
    )
    per_order = lat.groupBy("l_orderkey").agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct(F.when(F.col("late"), F.col("l_suppkey"))).alias("n_late_supp"),
    )
    return (
        lat.filter(F.col("late"))
        .join(per_order, "l_orderkey")
        .filter((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
        .join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@register(
    "lateral_top_order_per_customer",
    oracle="""
    SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
    FROM customer c,
    LATERAL (
      SELECT o_orderkey, o_totalprice FROM orders
      WHERE o_custkey = c.c_custkey
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 1
    ) o
    """,
    doc=(
        "LATERAL correlated subquery: each customer's single most "
        "expensive order, written as the SQL-standard lateral join both "
        "engines now support (Spark >= 3.2, DuckDB native) — the modern "
        "form of the per-key top-1 lookup. Catalyst rewrites it to the "
        "same window/aggregate shuffle as topk_per_group, so the "
        "declarative form costs nothing; customers without orders drop "
        "(inner lateral), matching the oracle."
    ),
    tags=("relational", "lateral"),
)
def lateral_top_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "customer").createOrReplaceTempView("_lat_customer")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("_lat_orders")
    return spark.sql(
        """
        SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
        FROM _lat_customer c,
        LATERAL (
          SELECT o_orderkey, o_totalprice FROM _lat_orders
          WHERE o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 1
        ) o
        """
    )
