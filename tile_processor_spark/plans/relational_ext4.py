"""Round-5 second analytics batch: distinct-over-time patterns, share
ratios, self-excluding aggregates, and higher-order array functions —
each a plan shape the other registry entries don't exercise.

Same exactness discipline: decimal accumulation, single double
divisions, integer day arithmetic, fully tie-broken orderings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from tile_processor_spark.plans.registry import register
from tile_processor_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, name, sf_dir)


_DAY = "date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))"


@register(
    "cumulative_distinct_users",
    oracle=f"""
    WITH first_seen AS (
      SELECT user_id, MIN({_DAY}) AS first_day FROM events GROUP BY user_id
    ), per_day AS (
      SELECT first_day AS day_idx, CAST(COUNT(*) AS BIGINT) AS new_users
      FROM first_seen GROUP BY first_day
    )
    SELECT day_idx, new_users,
           CAST(SUM(new_users) OVER (ORDER BY day_idx
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cum_users
    FROM per_day
    """,
    doc=(
        "Cumulative distinct users by day WITHOUT a quadratic "
        "distinct-over-expanding-window: reduce each user to their "
        "first-seen day (one aggregate), count arrivals per day, then a "
        "running sum over the tiny day series. The naive COUNT(DISTINCT) "
        "OVER (ORDER BY day) rescans every prior day's users per row — "
        "this shape is O(n) and partial-aggregable, the only form that "
        "survives 100 TB."
    ),
    tags=("relational-ext", "events", "window", "agg"),
)
def cumulative_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    day = F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")).cast(
        "long"
    )
    first_seen = ev.select("user_id", day.alias("day_idx")).groupBy("user_id").agg(
        F.min("day_idx").alias("first_day")
    )
    per_day = first_seen.groupBy(F.col("first_day").alias("day_idx")).agg(
        F.count(F.lit(1)).alias("new_users")
    )
    w = W.orderBy("day_idx").rowsBetween(W.unboundedPreceding, W.currentRow)
    return per_day.select(
        "day_idx", "new_users", F.sum("new_users").over(w).alias("cum_users")
    )


@register(
    "rolling_7d_distinct_users",
    oracle=f"""
    WITH daily AS (
      SELECT DISTINCT {_DAY} AS day_idx, user_id FROM events
    )
    SELECT DISTINCT day_idx,
           CAST(COUNT(DISTINCT user_id) OVER (ORDER BY day_idx
             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT)
             AS users_7d
    FROM daily
    """,
    doc=(
        "Trailing-7-day distinct users per day WITHOUT any global "
        "window (COUNT(DISTINCT) OVER a value range is inherently a "
        "single-partition sort over the (day, user) grain — daily "
        "actives × days, which scales with data): dedup to (day, user), "
        "explode each active day onto the ≤7 future days it covers, "
        "then one partial-aggregable countDistinct per covered day, "
        "semi-joined to the observed-day series (broadcast — bounded "
        "by the calendar span) so only days present in the data are "
        "emitted, matching the windowed-oracle row set. Cost is a "
        "fixed 7× fan-out of the deduped daily grain; every step "
        "shuffles on a key."
    ),
    tags=("relational-ext", "events", "window"),
)
def rolling_7d_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    day = F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")).cast(
        "long"
    )
    daily = ev.select(day.alias("day_idx"), "user_id").distinct()
    days = daily.select("day_idx").distinct()
    covered = daily.select(
        F.explode(
            F.sequence(F.col("day_idx"), F.col("day_idx") + F.lit(6))
        ).alias("day_idx"),
        "user_id",
    )
    return (
        covered.join(F.broadcast(days), "day_idx")
        .groupBy("day_idx")
        .agg(F.countDistinct("user_id").cast("long").alias("users_7d"))
    )


@register(
    "revenue_share_by_nation",
    oracle="""
    WITH per_nation AS (
      SELECT n_name,
             SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
               AS rev
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON n_nationkey = s_nationkey
      GROUP BY n_name
    )
    SELECT n_name, CAST(rev AS DOUBLE) AS revenue,
           CAST(rev AS DOUBLE) / CAST(SUM(rev) OVER () AS DOUBLE) AS share
    FROM per_nation
    """,
    doc=(
        "Ratio-to-report: each nation's revenue share of the total via "
        "an un-partitioned window sum — safe ONLY because it runs on the "
        "nation-grain aggregate (25 rows), never the fact table; the "
        "share is one double division of two identically-accumulated "
        "decimals."
    ),
    tags=("relational-ext", "window", "agg"),
)
def revenue_share_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    per_nation = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,4)"
                )
            ).alias("rev")
        )
    )
    w = W.partitionBy()
    return per_nation.select(
        "n_name",
        F.col("rev").cast("double").alias("revenue"),
        (F.col("rev").cast("double") / F.sum("rev").over(w).cast("double")).alias(
            "share"
        ),
    )


@register(
    "leave_one_out_customer_mean",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CASE WHEN cnt > 1
                THEN (CAST(tot AS DOUBLE) - o_totalprice) / (cnt - 1)
                END AS loo_mean
    FROM (
      SELECT o_orderkey, o_custkey, o_totalprice,
             SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (PARTITION BY o_custkey)
               AS tot,
             COUNT(*) OVER (PARTITION BY o_custkey) AS cnt
      FROM orders
    )
    """,
    doc=(
        "Self-excluding (leave-one-out) aggregate: for every order, the "
        "mean value of the customer's OTHER orders as (Σ − x)/(n − 1) "
        "from one partition-window sum — the O(n) identity that replaces "
        "a per-row self-join, the shape feature pipelines use for "
        "target-encoding without leakage. Decimal window sum; the "
        "subtraction mixes decimal-exact Σ with the double x "
        "identically in both engines."
    ),
    tags=("relational-ext", "window"),
)
def leave_one_out_customer_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey")
    tot = F.sum(F.col("o_totalprice").cast("decimal(18,4)")).over(w)
    cnt = F.count(F.lit(1)).over(w)
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.when(
            cnt > 1,
            (tot.cast("double") - F.col("o_totalprice")) / (cnt - 1),
        ).alias("loo_mean"),
    )


@register(
    "order_quantity_array_hof",
    oracle="""
    SELECT l_orderkey,
           array_to_string(list_sort(list(CAST(l_quantity AS BIGINT))), '-')
             AS qtys_str,
           CAST(list_reduce(list(CAST(l_quantity AS BIGINT)), (a, b) -> a + b)
                AS BIGINT) AS total_qty,
           CAST(len(list_filter(list(CAST(l_quantity AS BIGINT)), x -> x > 25))
                AS BIGINT) AS n_large,
           CAST(list_reduce(list_transform(list(CAST(l_quantity AS BIGINT)),
                x -> x * x), (a, b) -> a + b) AS BIGINT) AS sum_sq
    FROM lineitem GROUP BY l_orderkey
    """,
    doc=(
        "Higher-order array functions over per-order quantity arrays: "
        "collect → sort_array (canonical order), aggregate (fold) for "
        "the sum, filter+size, transform+fold for Σx² — the Catalyst HOF "
        "family (transform/filter/aggregate) evaluated JVM-side on "
        "integer-valued quantities; every derived value is exact."
    ),
    tags=("relational-ext", "array", "agg"),
)
def order_quantity_array_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    g = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_list(F.col("l_quantity").cast("long"))).alias("qtys")
    )
    zero = F.lit(0).cast("long")
    return g.select(
        "l_orderkey",
        # joined string, not the raw array: the value-hash compare (and
        # the driver's) cannot hash list cells
        F.array_join("qtys", "-").alias("qtys_str"),
        F.aggregate("qtys", zero, lambda a, x: a + x).alias("total_qty"),
        F.size(F.filter("qtys", lambda x: x > 25)).cast("long").alias("n_large"),
        F.aggregate(
            F.transform("qtys", lambda x: x * x), zero, lambda a, x: a + x
        ).alias("sum_sq"),
    )


def robust_center_by_type(ev: DataFrame) -> DataFrame:
    """(event_type, med_value, mad_value, cnt): rank-exact discrete
    median and MAD per event type — THE one derivation shared by
    events_mad_by_type and timeseries_ops.events_anomaly_intervals (a
    tie-break or rank fix here reaches both operators)."""
    from tile_processor_spark.plans.chunked_windows import banded_rank_pick

    # Exact rank-picked medians WITHOUT shuffling the fact stream
    # (chunked_windows.banded_rank_pick): per-(type, floor(value))
    # counts locate the one value cell holding rank (n+1) div 2; only
    # that cell's rows are pulled and row-ranked. The naive
    # event_type-only rank window sorts the whole fact stream in
    # |event_type| tasks (the 5-task funnel class, docs/SCALE.md
    # §sf10); the earlier banded_row_index form still shuffled every
    # fact into (type, cell) sorts.
    med_rank = {"med": F.expr("(n + 1) div 2")}
    med = banded_rank_pick(
        ev.select("event_type", "value", "event_id"),
        ["event_type"],
        ["value", "event_id"],
        F.floor("value").cast("long"),
        med_rank,
    ).select("event_type", F.col("value").alias("med_value"), F.col("n").alias("cnt"))
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type",
        F.abs(F.col("value") - F.col("med_value")).alias("ad"),
        "event_id",
    )
    mad = banded_rank_pick(
        dev, ["event_type"], ["ad", "event_id"], F.floor("ad").cast("long"), med_rank
    ).select("event_type", F.col("ad").alias("mad_value"))
    return med.join(mad, "event_type").select(
        "event_type", "med_value", "mad_value", "cnt"
    )



@register(
    "events_mad_by_type",
    oracle="""
    WITH ranked AS (
      SELECT event_type, value,
             row_number() OVER (PARTITION BY event_type
               ORDER BY value, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS cnt
      FROM events
    ), med AS (
      SELECT event_type, value AS med_value, cnt
      FROM ranked WHERE rn = (cnt + 1) // 2
    ), dev AS (
      SELECT e.event_type, abs(e.value - m.med_value) AS ad, e.event_id
      FROM events e JOIN med m USING (event_type)
    ), ranked2 AS (
      SELECT event_type, ad,
             row_number() OVER (PARTITION BY event_type
               ORDER BY ad, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS cnt
      FROM dev
    )
    SELECT m.event_type, m.med_value, r2.ad AS mad_value,
           CAST(m.cnt AS BIGINT) AS n
    FROM med m JOIN ranked2 r2
      ON m.event_type = r2.event_type AND r2.rn = (r2.cnt + 1) // 2
    """,
    doc=(
        "Median absolute deviation per event type — the robust "
        "dispersion measure outlier pipelines prefer over stddev — via "
        "two DISCRETE medians (rank-picked actual values, fully "
        "tie-broken), so every number is exact and engine-independent "
        "where interpolating percentiles could never hash-match. The "
        "median side is dimension-sized, so the deviation join "
        "broadcasts."
    ),
    tags=("relational-ext", "events", "window", "quality"),
)
def events_mad_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return robust_center_by_type(ev).select(
        "event_type", "med_value", "mad_value", F.col("cnt").cast("long").alias("n")
    )


@register(
    "window_nth_value",
    oracle="""
    SELECT DISTINCT o_custkey,
           nth_value(o_totalprice, 2) OVER (PARTITION BY o_custkey
             ORDER BY o_totalprice DESC, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS second_highest
    FROM orders
    """,
    doc=(
        "nth_value window function (the last analytic-family member no "
        "other entry exercised): each customer's second-highest order "
        "value over the full-partition frame, NULL for single-order "
        "customers, ordering fully tie-broken."
    ),
    tags=("relational-ext", "window"),
)
def window_nth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        F.nth_value("o_totalprice", 2).over(w).alias("second_highest"),
    ).distinct()


@register(
    "skyline_orders_2d",
    oracle="""
    WITH per_day AS (
      SELECT date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
               AS day_idx,
             MAX(o_totalprice) AS best_price
      FROM orders GROUP BY 1
    ), keyed AS (
      SELECT p.day_idx, p.best_price,
             MIN(o.o_orderkey) AS o_orderkey
      FROM per_day p JOIN orders o
        ON date_diff('day', DATE '1970-01-01', CAST(o.o_orderdate AS DATE))
             = p.day_idx
       AND o.o_totalprice = p.best_price
      GROUP BY p.day_idx, p.best_price
    )
    SELECT day_idx, best_price, o_orderkey FROM (
      SELECT *, MAX(best_price) OVER (ORDER BY day_idx
        RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hi_prev
      FROM keyed
    ) WHERE hi_prev IS NULL OR best_price > hi_prev
    """,
    doc=(
        "2D skyline (Pareto front): orders not dominated on (earlier "
        "date, higher price). The scale-safe decomposition: reduce to "
        "per-day maxima FIRST (a partial-aggregable groupBy — the "
        "global sort never sees the fact table), then one running-max "
        "window over the tiny day series keeps exactly the points whose "
        "price beats every earlier day. Ties pinned by the smallest "
        "orderkey achieving the day's maximum."
    ),
    tags=("relational-ext", "window", "agg"),
)
def skyline_orders_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    day = F.datediff(
        F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
    ).cast("long")
    od = o.select(day.alias("day_idx"), "o_totalprice", "o_orderkey")
    # argmax via min(struct(-price, key)): per-day max price + the
    # smallest orderkey achieving it in ONE partial-aggregable pass — no
    # self-join back to the fact table (and no ambiguous-lineage join).
    keyed = (
        od.groupBy("day_idx")
        .agg(
            F.min(
                F.struct(
                    (-F.col("o_totalprice")).alias("np"),
                    F.col("o_orderkey").alias("k"),
                )
            ).alias("m")
        )
        .select(
            "day_idx",
            (-F.col("m.np")).alias("best_price"),
            F.col("m.k").alias("o_orderkey"),
        )
    )
    w = W.orderBy("day_idx").rangeBetween(W.unboundedPreceding, -1)
    return (
        keyed.withColumn("hi_prev", F.max("best_price").over(w))
        .filter(F.col("hi_prev").isNull() | (F.col("best_price") > F.col("hi_prev")))
        .select("day_idx", "best_price", "o_orderkey")
    )


_FK_CHECKS = (
    # (constraint, child, child_key, parent, parent_key)
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
)


@register(
    "dq_referential_integrity",
    oracle="\nUNION ALL\n".join(
        f"""
    SELECT '{name}' AS constraint_name,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM {child}) AS n_child_rows,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM {child} c
             WHERE NOT EXISTS (SELECT 1 FROM {parent} p
                               WHERE p.{pkey} = c.{ckey})) AS n_orphans,
           (SELECT CAST(COUNT(DISTINCT c.{ckey}) AS BIGINT) FROM {child} c
             WHERE NOT EXISTS (SELECT 1 FROM {parent} p
                               WHERE p.{pkey} = c.{ckey})) AS n_orphan_keys
    """
        for (name, child, ckey, parent, pkey) in _FK_CHECKS
    ),
    doc=(
        "Referential-integrity profile: for every foreign-key edge of "
        "the star schema, total child rows, orphan rows (no parent), "
        "and distinct orphan keys — the dbt-test/'relationships' "
        "constraint suite as one frame. Spark shape: each check is a "
        "LEFT ANTI join with the dimension side broadcast (facts never "
        "shuffle); the five 1-row aggregates union. On healthy data "
        "every orphan count pins to 0 — and because the oracle "
        "recomputes the anti-joins independently, a generator change "
        "that breaks integrity surfaces as a gate diff, not silently."
    ),
    tags=("relational-ext", "dq"),
)
def dq_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = None
    for name, child, ckey, parent, pkey in _FK_CHECKS:
        c = _t(spark, sf_dir, child)
        p = _t(spark, sf_dir, parent).select(F.col(pkey).alias(ckey))
        # parent key sets SCALE with the data (orders, customer, ...):
        # the anti-join strategy is left to size stats + AQE rather
        # than a forced broadcast that would OOM at 100 TB
        orphans = c.join(p, ckey, "left_anti")
        row = (
            c.agg(F.count(F.lit(1)).cast("long").alias("n_child_rows"))
            .crossJoin(
                orphans.agg(
                    F.count(F.lit(1)).cast("long").alias("n_orphans"),
                    F.count_distinct(F.col(ckey)).cast("long").alias("n_orphan_keys"),
                )
            )
            .select(
                F.lit(name).alias("constraint_name"),
                "n_child_rows",
                "n_orphans",
                "n_orphan_keys",
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


_PROFILE_COLS = ("o_orderstatus", "o_orderpriority", "o_custkey", "o_orderdate")


@register(
    "dq_column_profile",
    oracle="""
    SELECT 'o_orderstatus' AS col,
           CAST(COUNT(*) - COUNT(o_orderstatus) AS BIGINT) AS n_null,
           CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS n_distinct,
           CAST(MIN(o_orderstatus) AS VARCHAR) AS min_str,
           CAST(MAX(o_orderstatus) AS VARCHAR) AS max_str
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority',
           CAST(COUNT(*) - COUNT(o_orderpriority) AS BIGINT),
           CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT),
           CAST(MIN(o_orderpriority) AS VARCHAR),
           CAST(MAX(o_orderpriority) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_custkey',
           CAST(COUNT(*) - COUNT(o_custkey) AS BIGINT),
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT),
           CAST(MIN(o_custkey) AS VARCHAR),
           CAST(MAX(o_custkey) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_orderdate',
           CAST(COUNT(*) - COUNT(o_orderdate) AS BIGINT),
           CAST(COUNT(DISTINCT o_orderdate) AS BIGINT),
           CAST(MIN(o_orderdate) AS VARCHAR),
           CAST(MAX(o_orderdate) AS VARCHAR)
    FROM orders
    """,
    doc=(
        "Column-profile data-quality report: per column, null count, "
        "exact distinct count, and min/max rendered as strings — the "
        "table-profiling pass every ingest pipeline runs before "
        "trusting a new drop. ONE scan computes every column's "
        "aggregates side by side (Spark evaluates them in a single "
        "Aggregate; no per-column rescans), then the wide row unpivots "
        "to the per-column report. String casts are restricted to "
        "types both engines render identically (strings, integers, "
        "dates) — profiling a double belongs in a typed column, not a "
        "string cast. At 100 TB: one pass, map-side partial aggs; "
        "distinct counts are the only shuffle, one per column."
    ),
    tags=("dq", "profiling"),
)
def dq_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            (F.count(F.lit(1)) - F.count(c)).cast("long").alias(f"{c}__null"),
            F.countDistinct(c).cast("long").alias(f"{c}__distinct"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    wide = o.agg(*aggs)
    entries = F.array(
        *[
            F.struct(
                F.lit(c).alias("col"),
                F.col(f"{c}__null").alias("n_null"),
                F.col(f"{c}__distinct").alias("n_distinct"),
                F.col(f"{c}__min").alias("min_str"),
                F.col(f"{c}__max").alias("max_str"),
            )
            for c in _PROFILE_COLS
        ]
    )
    return wide.select(F.explode(entries).alias("e")).select("e.*")
