"""Relational query library — TPC-H-style headline queries plus one query
per relational operator pattern in SURVEY.md §2 (joins J1-J9, filters
P1-P10, aggregations A1-A11, sorts O1-O3, set ops §2.7), expressed over
the driver-generated star schema.

Every query is declarative DataFrame API: Catalyst handles predicate
pushdown / column pruning / join strategy; small dimensions are broadcast
explicitly where statistics may be missing at 100 TB (tile indexes,
nation/region dims).

Reference parity notes cite ``/root/reference`` file:line in docstrings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from tile_processor_spark.plans.registry import register
from tile_processor_spark.sources.tables import load_table


def dsum(col, alias):
    """Order-independent exact sum: DECIMAL(18,4) accumulate → DOUBLE out.

    Double summation order differs between Spark partial aggregation and
    the DuckDB oracle; decimal accumulation makes the result exact and
    therefore bit-identical after the final double cast.
    """
    return F.sum(col.cast("decimal(18,4)")).cast("double").alias(alias)


def _cents(col):
    """Exact 2-dp money column (the TPC-H star's DECIMAL(m,2) domain,
    carried as double by the generator) → ×100-scaled long.

    ``floor(x·100 + 0.5)`` is whole-stage-codegen double/long math where
    a decimal cast allocates a BigDecimal per row; for a non-negative
    value whose true magnitude is an exact 2-dp decimal (oracle-pinned
    for every money/measure column this touches) it recovers exactly the
    same integer the HALF_UP decimal cast produces — the double carries
    the 2-dp rational to within ~1e-9·ulp, which can never cross the
    half-cent boundary."""
    return F.floor(col * 100 + F.lit(0.5))


def _sum_scaled(col_c, frac_digits: int, alias: str):
    """Exact order-independent sum of a 10^frac_digits-scaled long
    column, returned as the same double the dsum() decimal formulation
    yields: the per-row values are integers (pure long math in codegen),
    only the 6-or-so GROUP results pay a decimal rescale. decimal(18,0)
    per-row / decimal(28,0) accumulator keep Spark's compact-long
    decimal representation through the partial and final aggregates;
    headroom to 10²⁸ covers ~10¹⁶ rows at the largest per-row scale."""
    scale = F.lit(10**-frac_digits).cast(f"decimal({frac_digits + 1},{frac_digits})")
    return (
        (F.sum(col_c.cast("decimal(18,0)")) * scale).cast("double").alias(alias)
    )


def _revenue_c():
    """×10⁴-scaled exact revenue term l_extendedprice·(1−l_discount) —
    the long-codegen twin of dsum(p·(1−d)): both resolve to the same
    exact 4-dp rational per row (see _cents), so the scaled sum casts to
    the identical double."""
    return _cents(F.col("l_extendedprice")) * (
        F.lit(100) - _cents(F.col("l_discount"))
    )


def dsum_c2(col, alias):
    """Scaled-long twin of ``dsum`` for a single exact-2-dp non-negative
    money/measure column (the ``_cents`` domain): per-row ×100 long in
    codegen instead of a per-row BigDecimal, one decimal rescale per
    group result — bit-identical double out (round-16 §1 proof,
    tests/test_scaled_long_money.py)."""
    return _sum_scaled(_cents(col), 2, alias)


def dsum_rev(alias):
    """Scaled-long twin of ``dsum(l_extendedprice·(1−l_discount))`` —
    the TPC-H revenue term (see ``_revenue_c``)."""
    return _sum_scaled(_revenue_c(), 4, alias)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, name, sf_dir)


#: q4's order window LOWER bound — shared by the orders filter AND the
#: transferred lineitem shipdate bound (the bound-transfer argument in
#: q4_order_priority is only valid while the two stay equal; see
#: tests/test_q4_shipdate_bound.py).
Q4_WIN_LO = "1997-01-01"


# ---------------------------------------------------------------------------
# Headline TPC-H-style queries
# ---------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE)
             AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))
                    * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(3,2)))) AS DOUBLE)
             AS sum_charge,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc=(
        "TPC-H Q1 pricing summary: scan → filter → hash agg (partial+final). "
        "Money math is decimal end-to-end: inputs are exact 2dp, so "
        "decimal×decimal is exact in both engines and the oracle matches "
        "bit-for-bit regardless of aggregation order."
    ),
    tags=("headline", "agg"),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Same exact rationals as the decimal formulation (and the oracle),
    # computed in scaled-long codegen instead of per-row BigDecimal:
    # price/discount/tax are exact 2-dp, so disc_price = p_c·(100−d_c)
    # (×10⁴) and charge = disc_price_c·(100+t_c) (×10⁶) are exact
    # integers; only the 6 group results touch decimal (guide §1.2:
    # per-task work, after the plan shape is already one exchange).
    li = _t(spark, sf_dir, "lineitem")
    price_c = _cents(F.col("l_extendedprice"))
    disc_price_c = price_c * (F.lit(100) - _cents(F.col("l_discount")))
    charge_c = disc_price_c * (F.lit(100) + _cents(F.col("l_tax")))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _sum_scaled(_cents(F.col("l_quantity")), 2, "sum_qty"),
            _sum_scaled(price_c, 2, "sum_base_price"),
            _sum_scaled(disc_price_c, 4, "sum_disc_price"),
            _sum_scaled(charge_c, 6, "sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3: 3-way join → agg → deterministic top-10 (tiebreaks pinned).",
    tags=("headline", "join", "topk"),
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_sum_scaled(_revenue_c(), 4, "revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM customer JOIN orders   ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
                  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
                  JOIN nation   ON s_nationkey = n_nationkey
                  JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n_name
    """,
    doc=(
        "TPC-H Q5: 6-way join. nation/region are DOMAIN-bounded (25/5 "
        "rows) and broadcast by explicit hint; supplier SCALES with "
        "the data, so its join strategy is left to size statistics + "
        "AQE — auto-broadcast at bench scale, sort-merge at 100 TB "
        "(a forced broadcast hint would OOM there)."
    ),
    tags=("headline", "join"),
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(_sum_scaled(_revenue_c(), 4, "revenue"))
    )


@register(
    "q6_revenue_forecast",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.04 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6: pure scan + pushed predicates + global agg.",
    tags=("headline", "scan"),
)
def q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.04)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        ).agg(
            _sum_scaled(
                _cents(F.col("l_extendedprice")) * _cents(F.col("l_discount")),
                4,
                "revenue",
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-07-01'
      AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey
                  AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
    doc="TPC-H Q4: EXISTS as left-semi join (J8 set-intersection pattern).",
    tags=("headline", "semijoin"),
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(Q4_WIN_LO).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    # The window lower bound transfers to lineitem (guide §6 predicate
    # pushdown): every kept order has o_orderdate >= Q4_WIN_LO, so a
    # lineitem can only satisfy l_shipdate > o_orderdate if
    # l_shipdate > Q4_WIN_LO — dropping the rest changes no order's
    # qualification (a lineitem failing the bound could never exceed
    # any in-window o_orderdate). The predicate reaches the parquet
    # scan as a pushed filter (~30% fewer rows at sf0.1).
    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") > F.lit(Q4_WIN_LO).cast("timestamp"))
        .select("l_orderkey", "l_shipdate")
    )
    # Cost-based shape gate (round 17; guide §2.3/§3.1): when the
    # filtered 2-column lineitem projection is small enough to
    # broadcast (the engine's own estimate vs its own broadcast
    # threshold — the same decision the planner makes), join it
    # DIRECTLY as the semi-join build: one pass, no extra Exchange
    # (round 16 measured the always-pre-aggregate form +33% at local
    # scale, where the pre-agg's per-orderkey Exchange costs more than
    # the smaller broadcast saves). When it is too big to broadcast —
    # every real cluster scale — pre-aggregate first:
    # EXISTS(l_shipdate > o_orderdate) ⟺ max(l_shipdate) per order >
    # o_orderdate, so the map-side partial max collapses lineitem to
    # one narrow row per order before the shuffled join, strictly
    # fewer shuffled bytes (guide §2.3 "aggregate before you shuffle").
    est = int(str(li._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()))
    thr = int(
        spark._jsparkSession.sessionState().conf().autoBroadcastJoinThreshold()
    )
    if 0 < est <= thr:
        semi = orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
    else:
        li_max = li.groupBy("l_orderkey").agg(F.max("l_shipdate").alias("_max_ship"))
        semi = orders.join(
            li_max,
            (orders.o_orderkey == li_max.l_orderkey)
            & (li_max._max_ship > orders.o_orderdate),
            "left_semi",
        )
    return semi.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


@register(
    "q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           n_name
    FROM customer JOIN orders   ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
                  JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-10-01' AND o_orderdate < TIMESTAMP '1997-01-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10: join + agg + deterministic top-20.",
    tags=("headline", "join", "topk"),
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = _t(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(_sum_scaled(_revenue_c(), 4, "revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Operator-pattern queries (SURVEY §2 inventory, one per pattern)
# ---------------------------------------------------------------------------


@register(
    "distinct_projection",
    oracle="SELECT DISTINCT o_orderpriority AS priority FROM orders",
    doc="P2/A1: SELECT DISTINCT single column (tileconfig.py:218-222).",
    tags=("operator",),
)
def distinct_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .select(F.col("o_orderpriority").alias("priority"))
        .distinct()
    )


@register(
    "isin_filter",
    oracle="""
    SELECT n_nationkey, n_name FROM nation
    WHERE n_name IN ('NATION_3', 'NATION_7', 'NATION_11', 'NATION_24')
    """,
    doc="P3: tile = ANY(list) membership predicate (tileconfig.py:234-240).",
    tags=("operator",),
)
def isin_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin("NATION_3", "NATION_7", "NATION_11", "NATION_24"))
        .select("n_nationkey", "n_name")
    )


@register(
    "anti_join_missing",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 300000)
    """,
    doc="J5/J9: left anti-join (non-border tiles / unknown-ID validation, tileconfig.py:565-585, 243-249).",
    tags=("operator", "antijoin"),
)
def anti_join_missing(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@register(
    "semi_join_intersection",
    oracle="""
    SELECT p_partkey, p_name FROM part
    WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey AND l_quantity > 45)
    """,
    doc="J8: set intersection as left-semi join (tileconfig.py:344-348).",
    tags=("operator", "semijoin"),
)
def semi_join_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return part.join(li, part.p_partkey == li.l_partkey, "left_semi").select(
        "p_partkey", "p_name"
    )


@register(
    "array_agg_group",
    oracle="""
    SELECT n_name,
           array_to_string(list_sort(array_agg(c_custkey)), ',') AS custkeys,
           COUNT(*) AS n_customers
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE c_acctbal > 9000
    GROUP BY n_name
    """,
    doc="A4: array_agg(...) GROUP BY (tileconfig.py:587-598); sorted + stringified for stable comparison.",
    tags=("operator", "agg"),
)
def array_agg_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000)
    nation = _t(spark, sf_dir, "nation")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.array_join(
                F.sort_array(F.collect_list("c_custkey")).cast("array<string>"), ","
            ).alias("custkeys"),
            F.count(F.lit(1)).alias("n_customers"),
        )
    )


@register(
    "priority_dedup_ties",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_partkey, l_shipdate FROM (
      SELECT l_orderkey, l_linenumber, l_partkey, l_shipdate,
             RANK() OVER (PARTITION BY l_orderkey ORDER BY l_shipdate) AS rk
      FROM lineitem
    ) WHERE rk = 1
    """,
    doc=(
        "A9: priority-dedup keeping ties — RANK, not ROW_NUMBER "
        "(tileconfig.py:464-497: equal priorities append)."
    ),
    tags=("operator", "window"),
)
def priority_dedup_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    w = W.partitionBy("l_orderkey").orderBy("l_shipdate")
    return (
        li.withColumn("rk", F.rank().over(w))
        .filter(F.col("rk") == 1)
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_shipdate")
    )


@register(
    "topk_per_group",
    oracle="""
    SELECT n_name, s_name, total_bal FROM (
      SELECT n_name, s_name,
             CAST(CAST(s_acctbal AS DECIMAL(18,4)) AS DOUBLE) AS total_bal,
             ROW_NUMBER() OVER (PARTITION BY n_name ORDER BY s_acctbal DESC, s_suppkey) AS rn
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
    ) WHERE rn <= 2
    """,
    doc="Top-K per group via window row_number (common OLAP pattern; scale path for per-tile ranking).",
    tags=("operator", "window", "topk"),
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tile_processor_spark.plans.chunked_windows import banded_topk

    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    # top-2 by balance via cell-count pruning (banded_topk): 25 nations
    # make the naive per-nation rank window the low-cardinality funnel
    # class (docs/SCALE.md §sf10) while suppliers scale with the data;
    # the negated acctbal/64 cells are bounded by the balance domain,
    # and only cells whose count offset is below k reach a row window.
    joined = supp.join(
        F.broadcast(nation), supp.s_nationkey == nation.n_nationkey
    ).withColumn("_nb", -F.col("s_acctbal"))
    return (
        banded_topk(
            joined,
            ["n_name"],
            ["_nb", "s_suppkey"],
            F.floor(F.col("_nb") / F.lit(64)).cast("long"),
            2,
        )
        .withColumn("total_bal", F.col("s_acctbal").cast("decimal(18,4)").cast("double"))
        .select("n_name", "s_name", "total_bal")
    )


@register(
    "regexp_extract_ids",
    oracle="""
    SELECT p_partkey, regexp_extract(lower(p_brand), 'brand#([0-9]+)', 1) AS brand_num
    FROM part WHERE p_size >= 40
    """,
    doc="P10/F1/F2: case-insensitive regex extract of an ID from a pattern (tileconfig.py:450-461).",
    tags=("operator", "scalar"),
)
def regexp_extract_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_size") >= 40)
        .select(
            "p_partkey",
            F.regexp_extract(F.lower(F.col("p_brand")), r"brand#([0-9]+)", 1).alias(
                "brand_num"
            ),
        )
    )


@register(
    "union_dedup",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    doc="§2.7 UNION + A1 dedup (multi-directory file-index merge pattern, tileconfig.py:490-496).",
    tags=("operator", "setop"),
)
def union_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.unionByName(s).distinct()


@register(
    "null_guard_filter",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE o_totalprice IS NOT NULL AND o_orderstatus = 'F' AND o_totalprice > 400000
    """,
    doc="P7/P8: NULL-guard filters (tileconfig.py:633-639).",
    tags=("operator",),
)
def null_guard_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .filter(
            F.col("o_totalprice").isNotNull()
            & (F.col("o_orderstatus") == "F")
            & (F.col("o_totalprice") > 400000)
        )
        .select("o_orderkey", "o_totalprice")
    )


@register(
    "groupby_month_rollup",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INT) AS yr, CAST(month(o_orderdate) AS INT) AS mon,
           o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total,
           CAST(MAX(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS max_price
    FROM orders GROUP BY 1, 2, 3
    """,
    doc="A6/A7/A8: time-derived group-by with count/sum/max (recorder.py:96-133 analytics pattern).",
    tags=("operator", "agg"),
)
def groupby_month_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.year("o_orderdate").cast("int").alias("yr"),
            F.month("o_orderdate").cast("int").alias("mon"),
            "o_orderstatus",
        ).agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice"), "total"),
            F.max(F.col("o_totalprice").cast("decimal(18,4)")).cast("double").alias("max_price"),
        )
    )
