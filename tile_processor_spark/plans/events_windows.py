"""Event-stream window aggregations and as-of joins over the ``events``
table — the batch-mode definitions of the engine's streaming surface
(tile_processor_spark.streaming exposes the same logic over readStream).

The reference has no streaming operators (SURVEY.md §2.9); these are the
north-star extensions from SURVEY.md §7.8. Window starts are compared as
microsecond-exact integers (``unix_micros`` / ``epoch_us``) so oracle
comparison never depends on timestamp/timezone canonicalization.

Scale notes: tumbling/sliding windows are pure map-side bucket assignment
followed by one hash aggregation (one shuffle); the session window and
as-of join shuffle once on the entity key and then use a sort within the
partition — both hold at 100 TB provided user_id is not pathologically
skewed (AQE skew-join handles the rest).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from tile_processor_spark.plans.registry import register
from tile_processor_spark.sources.tables import load_table
from tile_processor_spark.plans.relational import _cents, _sum_scaled

US = 1_000_000  # microseconds per second


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, "events", sf_dir)


@register(
    "events_tumbling_window",
    oracle=f"""
    SELECT (epoch_us(ts) // {3600 * US}) * {3600 * US} AS win_start_us,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    doc=(
        "Tumbling 1-hour window per event_type: F.window bucket assignment "
        "→ single hash agg. Window start emitted as epoch-µs for exact "
        "oracle comparison."
    ),
    tags=("events", "window", "headline"),
)
def events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _sum_scaled(_cents(F.col("value")), 2, "total_value"),
        )
        .select(
            F.unix_micros(F.col("win.start")).alias("win_start_us"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@register(
    "events_sliding_window",
    oracle=f"""
    WITH offsets AS (SELECT UNNEST([0, 1]) AS k),
    assigned AS (
      SELECT ((epoch_us(ts) // {1800 * US}) - o.k) * {1800 * US} AS win_start_us,
             epoch_us(ts) AS ts_us, value
      FROM events CROSS JOIN offsets o
    )
    SELECT win_start_us,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
    FROM assigned
    WHERE ts_us >= win_start_us AND ts_us < win_start_us + {3600 * US}
      AND win_start_us >= 0
    GROUP BY 1
    """,
    doc=(
        "Sliding window (1 h width, 30 min slide): each event lands in 2 "
        "windows. Spark assigns via F.window(w, s); the oracle replays the "
        "assignment with integer epoch arithmetic."
    ),
    tags=("events", "window"),
)
def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("win"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _sum_scaled(_cents(F.col("value")), 2, "total_value"),
        )
        .select(
            F.unix_micros(F.col("win.start")).alias("win_start_us"),
            "n_events",
            "total_value",
        )
    )


@register(
    "events_session_window",
    oracle=f"""
    WITH ordered AS (
      SELECT user_id, epoch_us(ts) AS ts_us, value,
             LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)) AS prev_us
      FROM events
    ),
    flagged AS (
      SELECT *, CASE WHEN prev_us IS NULL OR ts_us - prev_us >= {1800 * US}
                     THEN 1 ELSE 0 END AS is_new
      FROM ordered
    ),
    sessions AS (
      SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_us
                                  ROWS UNBOUNDED PRECEDING) AS session_no
      FROM flagged
    )
    SELECT user_id, MIN(ts_us) AS session_start_us,
           MAX(ts_us) + {1800 * US} AS session_end_us,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
    FROM sessions
    GROUP BY user_id, session_no
    """,
    doc=(
        "Session window per user (30 min gap) via F.session_window — "
        "Spark merges overlapping [ts, ts+gap) intervals; the oracle "
        "reproduces that with the lag/islands pattern. Session end = last "
        "event + gap in both."
    ),
    tags=("events", "window", "session"),
)
def events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("win"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _sum_scaled(_cents(F.col("value")), 2, "total_value"),
        )
        .select(
            "user_id",
            F.unix_micros(F.col("win.start")).alias("session_start_us"),
            F.unix_micros(F.col("win.end")).alias("session_end_us"),
            "n_events",
            "total_value",
        )
    )


@register(
    "events_asof_join",
    oracle="""
    WITH clicks AS (
      SELECT user_id, ts, MAX(event_id) AS click_id
      FROM events WHERE event_type = 'click' GROUP BY user_id, ts
    ),
    purchases AS (
      SELECT event_id AS purchase_id, user_id, ts, value FROM events
      WHERE event_type = 'purchase'
    )
    SELECT p.purchase_id, p.user_id,
           epoch_us(p.ts) AS purchase_ts_us,
           epoch_us(c.ts) AS click_ts_us,
           c.click_id
    FROM purchases p ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    doc=(
        "As-of join: each purchase matched to the latest click at-or-before "
        "it by the same user. Spark has no native as-of join; implemented "
        "as the scalable union + last(ignorenulls) running-value pattern — "
        "one shuffle on user_id, one sort, no range explosion. Clicks are "
        "deduped to one per (user, ts) so ties are deterministic. Oracle "
        "uses DuckDB's native ASOF LEFT JOIN."
    ),
    tags=("events", "asof", "headline"),
)
def events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
        .select("user_id", "ts", "click_id", F.lit(0).alias("kind"))
        .withColumn("purchase_id", F.lit(None).cast("long"))
        .withColumn("value", F.lit(None).cast("double"))
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            "ts",
            F.lit(None).cast("long").alias("click_id"),
            F.lit(1).alias("kind"),
            F.col("event_id").alias("purchase_id"),
            "value",
        )
    )
    # kind orders clicks before purchases at equal ts: "at-or-before".
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "kind")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    merged = clicks.unionByName(purchases).select(
        "*",
        F.last("click_id", ignorenulls=True).over(w).alias("asof_click_id"),
        F.last(F.when(F.col("kind") == 0, F.col("ts")), ignorenulls=True)
        .over(w)
        .alias("asof_click_ts"),
    )
    return merged.filter(F.col("kind") == 1).select(
        "purchase_id",
        "user_id",
        F.unix_micros("ts").alias("purchase_ts_us"),
        F.unix_micros("asof_click_ts").alias("click_ts_us"),
        F.col("asof_click_id").alias("click_id"),
    )


@register(
    "events_json_props",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_total,
           COUNT(json_extract_string(props, '$.k')) AS k_present
    FROM events
    GROUP BY event_type
    """,
    doc="F10/JSON path: extract a typed field from a JSON props column, aggregate exactly.",
    tags=("events", "scalar", "json"),
)
def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("bigint")
    return ev.groupBy("event_type").agg(
        F.sum(k).alias("k_total"), F.count(k).alias("k_present")
    )


@register(
    "events_daily_profile",
    oracle="""
    SELECT CAST(EXTRACT(dow FROM ts) AS INT) AS dow,
           CAST(EXTRACT(hour FROM ts) AS INT) AS hod,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users
    FROM events GROUP BY 1, 2
    """,
    doc=(
        "F7 timestamp arithmetic: day-of-week × hour-of-day activity "
        "profile with exact distinct-count."
    ),
    tags=("events", "scalar", "agg"),
)
def events_daily_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return ev.groupBy(
        (F.dayofweek("ts") - 1).cast("int").alias("dow"),  # Spark: Sun=1 → DuckDB dow: Sun=0
        F.hour("ts").cast("int").alias("hod"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count_distinct("user_id").alias("n_users"),
    )


BAND_US = 60 * US  # band half-width: pairs within 60 seconds


@register(
    "events_band_join",
    oracle=f"""
    SELECT a.event_type, a.event_id AS a_id, b.event_id AS b_id,
           epoch_us(b.ts) - epoch_us(a.ts) AS dt_us
    FROM events a JOIN events b
      ON a.event_type = b.event_type
     AND a.event_id < b.event_id
     AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= {BAND_US}
    """,
    doc=(
        "Band (range) join: same-type event pairs within 60 s of each "
        "other. The oracle states it as the O(n²) theta join; the engine "
        "runs the scalable bin-replication pattern — each right-side row "
        "is replicated to its time bin ±1 (3×), the join is a pure "
        "equi-join on (event_type, bin), and the |Δt| predicate refines. "
        "Every qualifying pair matches in exactly one bin (the left row's "
        "own bin), so no dedup pass is needed. One shuffle on a compound "
        "key whose cardinality grows with the data — the standard "
        "interval-join build Catalyst lacks natively."
    ),
    tags=("events", "join", "band"),
)
def events_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).select(
        "event_type", "event_id", F.unix_micros(F.col("ts")).alias("us")
    )
    bin_ = (F.col("us") / F.lit(BAND_US)).cast("long")
    a = ev.select(
        "event_type",
        F.col("event_id").alias("a_id"),
        F.col("us").alias("a_us"),
        bin_.alias("bin"),
    )
    b = ev.select(
        "event_type",
        F.col("event_id").alias("b_id"),
        F.col("us").alias("b_us"),
        F.explode(F.array(bin_ - 1, bin_, bin_ + 1)).alias("bin"),
    )
    return (
        a.join(b, ["event_type", "bin"])
        .filter(
            (F.col("a_id") < F.col("b_id"))
            & (F.abs(F.col("a_us") - F.col("b_us")) <= BAND_US)
        )
        .select(
            "event_type",
            "a_id",
            "b_id",
            (F.col("b_us") - F.col("a_us")).alias("dt_us"),
        )
    )


@register(
    "events_hypertable_rollup",
    oracle=f"""
    WITH minutes AS (
      SELECT (epoch_us(ts) // {60 * US}) * {60 * US} AS m_start,
             event_type, COUNT(*) AS n,
             SUM(CAST(value AS DECIMAL(18,4))) AS v
      FROM events GROUP BY 1, 2
    ),
    hours AS (
      SELECT (m_start // {3600 * US}) * {3600 * US} AS h_start,
             event_type, SUM(n) AS n, SUM(v) AS v
      FROM minutes GROUP BY 1, 2
    )
    SELECT (h_start // {86400 * US}) * {86400 * US} AS d_start,
           event_type,
           CAST(SUM(n) AS BIGINT) AS n_events,
           CAST(SUM(v) AS DOUBLE) AS total_value,
           COUNT(*) AS n_hours
    FROM hours GROUP BY 1, 2
    """,
    doc=(
        "Hypertable-style continuous-aggregate rollup: minute → hour → "
        "day, each level aggregated FROM the previous (never re-scanning "
        "raw events). This is the incremental-rollup contract of a "
        "TimescaleDB continuous aggregate: at 100 TB the raw table is "
        "touched once to build minutes; coarser levels are tiny "
        "aggregate-of-aggregate passes (counts/sums are re-aggregable; "
        "decimal accumulation keeps every level exact)."
    ),
    tags=("events", "window", "rollup"),
)
def events_hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    minutes = ev.groupBy(
        ((F.unix_micros(F.col("ts")) / F.lit(60 * US)).cast("long") * (60 * US)).alias("m_start"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,4)")).alias("v"),
    )
    hours = minutes.groupBy(
        ((F.col("m_start") / F.lit(3600 * US)).cast("long") * (3600 * US)).alias("h_start"),
        "event_type",
    ).agg(F.sum("n").alias("n"), F.sum("v").alias("v"))
    return hours.groupBy(
        ((F.col("h_start") / F.lit(86400 * US)).cast("long") * (86400 * US)).alias("d_start"),
        "event_type",
    ).agg(
        F.sum("n").alias("n_events"),
        F.sum("v").cast("double").alias("total_value"),
        F.count(F.lit(1)).alias("n_hours"),
    )


@register(
    "events_gapfill_locf",
    oracle="""
    WITH bounds AS (
      SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi
      FROM events
    ),
    spine AS (
      SELECT event_type, unnest(generate_series(lo, hi, INTERVAL '1 hour')) AS bucket
      FROM (SELECT DISTINCT event_type FROM events), bounds
    ),
    hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS bucket,
             COUNT(*) AS n, SUM(CAST(value AS DECIMAL(18,4))) AS sv
      FROM events GROUP BY 1, 2
    )
    SELECT s.event_type, s.bucket,
           COALESCE(h.n, 0) AS n_events,
           CAST(last_value(h.sv IGNORE NULLS) OVER (
             PARTITION BY s.event_type ORDER BY s.bucket
             ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS sum_value_locf
    FROM spine s LEFT JOIN hourly h USING (event_type, bucket)
    """,
    doc=(
        "Gap-fill + last-observation-carried-forward: a dense hourly "
        "spine per event type (generated, not stored), left-joined with "
        "the hourly rollup; missing hours get n_events = 0 and carry the "
        "last seen hourly sum (leading gaps stay NULL). The "
        "time_bucket_gapfill/locf idiom of hypertable stores, built from "
        "sequence+explode and last(ignorenulls) over an ordered window. "
        "Scale: the spine is |types| x |hours| - tiny relative to the "
        "events it summarizes; one shuffle on (type, bucket) for the "
        "rollup, one window partitioned by type."
    ),
    tags=("events", "window", "gapfill", "headline"),
)
def events_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum(_cents(F.col("value")).cast("decimal(18,0)"))
         * F.lit(0.01).cast("decimal(3,2)")).alias("sv"),
    )
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine = (
        ev.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(
                F.sequence(F.col("lo"), F.col("hi"), F.expr("interval 1 hour"))
            ).alias("bucket"),
        )
    )
    w = (
        W.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        spine.join(hourly, ["event_type", "bucket"], "left")
        .select(
            "event_type",
            "bucket",
            F.coalesce(F.col("n"), F.lit(0).cast("long")).alias("n_events"),
            F.last("sv", ignorenulls=True).over(w).cast("double").alias("sum_value_locf"),
        )
    )


@register(
    "events_ohlc_hourly",
    oracle="""
    WITH h AS (
      SELECT event_type, date_trunc('hour', ts) AS bucket, value,
             row_number() OVER (
               PARTITION BY event_type, date_trunc('hour', ts)
               ORDER BY ts, event_id) AS rn_open,
             row_number() OVER (
               PARTITION BY event_type, date_trunc('hour', ts)
               ORDER BY ts DESC, event_id DESC) AS rn_close
      FROM events
    )
    SELECT event_type, bucket,
           MAX(CASE WHEN rn_open = 1 THEN value END) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           MAX(CASE WHEN rn_close = 1 THEN value END) AS close,
           COUNT(*) AS n_events
    FROM h GROUP BY event_type, bucket
    """,
    doc=(
        "OHLC hourly rollup: open/close via deterministic (ts, event_id) "
        "ordering windows, high/low exact extrema - the first/last-in-"
        "window aggregation family (arg_min/arg_max semantics) stated "
        "with row_number so both engines tie-break identically. One "
        "shuffle on (type, hour) shared by the windows and the final "
        "aggregate."
    ),
    tags=("events", "window", "agg"),
)
def events_ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    bucket = F.date_trunc("hour", F.col("ts"))
    keys = [F.col("event_type"), bucket.alias("bucket")]
    wo = W.partitionBy("event_type", bucket).orderBy(F.col("ts").asc(), F.col("event_id").asc())
    wc = W.partitionBy("event_type", bucket).orderBy(F.col("ts").desc(), F.col("event_id").desc())
    h = ev.select(
        *keys,
        "value",
        F.row_number().over(wo).alias("rn_open"),
        F.row_number().over(wc).alias("rn_close"),
    )
    return h.groupBy("event_type", "bucket").agg(
        F.max(F.when(F.col("rn_open") == 1, F.col("value"))).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max(F.when(F.col("rn_close") == 1, F.col("value"))).alias("close"),
        F.count(F.lit(1)).alias("n_events"),
    )


ASOF_TOL_US = 5 * 60 * US  # forward-match tolerance: 5 minutes


@register(
    "events_asof_forward",
    oracle=f"""
    WITH clicks AS (
      SELECT event_id AS click_id, user_id, ts FROM events
      WHERE event_type = 'click'
    ),
    purchases AS (
      SELECT event_id AS purchase_id, user_id, ts FROM events
      WHERE event_type = 'purchase'
    ),
    matched AS (
      SELECT c.click_id, c.user_id, c.ts AS c_ts, p.purchase_id, p.ts AS p_ts,
             row_number() OVER (
               PARTITION BY c.click_id ORDER BY p.ts, p.purchase_id) AS rn
      FROM clicks c JOIN purchases p
        ON p.user_id = c.user_id
       AND p.ts >= c.ts
       AND epoch_us(p.ts) - epoch_us(c.ts) <= {ASOF_TOL_US}
    )
    SELECT c.click_id, c.user_id, epoch_us(c.ts) AS click_ts_us,
           m.purchase_id, epoch_us(m.p_ts) AS purchase_ts_us
    FROM clicks c LEFT JOIN (SELECT * FROM matched WHERE rn = 1) m
      USING (click_id)
    """,
    doc=(
        "Forward as-of join with tolerance: each click matches the FIRST "
        "purchase by the same user at-or-after it within 5 minutes "
        "(pandas merge_asof direction='forward' semantics); unmatched "
        "clicks survive with NULLs. Engine shape: union the two streams, "
        "one shuffle on user_id, first(ignorenulls) over a forward "
        "window — no O(clicks x purchases) join at any scale. The "
        "oracle states the same result as the theta join + row_number, "
        "viable only at gate scale."
    ),
    tags=("events", "asof"),
)
def events_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(
            "user_id", "ts",
            F.col("event_id").alias("click_id"),
            F.lit(0).alias("kind"),
            F.lit(None).cast("long").alias("purchase_id"),
        )
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            "user_id", "ts",
            F.lit(None).cast("long").alias("click_id"),
            F.lit(1).alias("kind"),
            F.col("event_id").alias("purchase_id"),
        )
    )
    # Forward scan: at equal ts a purchase sorts AFTER the click (kind),
    # and purchases at the same ts order by purchase_id — matching the
    # oracle's (p.ts, p.purchase_id) tie-break.
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "kind", "purchase_id")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    merged = clicks.unionByName(purchases).select(
        "*",
        F.first("purchase_id", ignorenulls=True).over(w).alias("next_purchase_id"),
        F.first(F.when(F.col("kind") == 1, F.col("ts")), ignorenulls=True)
        .over(w)
        .alias("next_purchase_ts"),
    )
    out = merged.filter(F.col("kind") == 0).select(
        "click_id",
        "user_id",
        F.unix_micros("ts").alias("click_ts_us"),
        "next_purchase_id",
        F.unix_micros("next_purchase_ts").alias("next_purchase_ts_us"),
    )
    within = (
        F.col("next_purchase_ts_us") - F.col("click_ts_us") <= ASOF_TOL_US
    ) & F.col("next_purchase_id").isNotNull()
    return out.select(
        "click_id",
        "user_id",
        "click_ts_us",
        F.when(within, F.col("next_purchase_id")).alias("purchase_id"),
        F.when(within, F.col("next_purchase_ts_us")).alias("purchase_ts_us"),
    )


@register(
    "events_funnel",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS t_view FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS t_click
      FROM events e JOIN v ON v.user_id = e.user_id AND e.ts > v.t_view
      WHERE e.event_type = 'click' GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS t_purchase
      FROM events e JOIN c ON c.user_id = e.user_id AND e.ts > c.t_click
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    ),
    u AS (SELECT DISTINCT user_id FROM events),
    staged AS (
      SELECT u.user_id,
             CASE WHEN p.user_id IS NOT NULL THEN 3
                  WHEN c.user_id IS NOT NULL THEN 2
                  WHEN v.user_id IS NOT NULL THEN 1
                  ELSE 0 END AS stage
      FROM u LEFT JOIN v USING (user_id)
             LEFT JOIN c USING (user_id)
             LEFT JOIN p USING (user_id)
    )
    SELECT stage, CAST(COUNT(*) AS BIGINT) AS n_users
    FROM staged GROUP BY stage
    """,
    doc=(
        "Conversion funnel: per-user ordered stage progression (first "
        "view, then first click strictly after it, then first purchase "
        "strictly after that), rolled up to users-per-stage. The "
        "sequence constraint is three chained min-aggregations over "
        "type-filtered scans (predicate pushdown trims each pass), with "
        "the tiny per-user stage frames broadcast back - every shuffle "
        "is user_id-keyed and O(users), never O(events x events)."
    ),
    tags=("events", "funnel"),
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    u = ev.select("user_id").distinct()
    staged = (
        u.join(v, "user_id", "left")
        .join(c.withColumnRenamed("t_click", "tc"), "user_id", "left")
        .join(p.withColumnRenamed("t_purchase", "tp"), "user_id", "left")
        .select(
            "user_id",
            F.when(F.col("tp").isNotNull(), 3)
            .when(F.col("tc").isNotNull(), 2)
            .when(F.col("t_view").isNotNull(), 1)
            .otherwise(0)
            .alias("stage"),
        )
    )
    return staged.groupBy("stage").agg(F.count(F.lit(1)).alias("n_users"))


@register(
    "events_retention_cohorts",
    oracle="""
    WITH firsts AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day FROM events
      GROUP BY user_id
    ),
    active AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    )
    SELECT CAST(f.cohort_day AS VARCHAR) AS cohort_day,
           date_diff('day', f.cohort_day, a.d) AS day_offset,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM active a JOIN firsts f USING (user_id)
    GROUP BY f.cohort_day, date_diff('day', f.cohort_day, a.d)
    """,
    doc=(
        "Cohort retention matrix: users grouped by first-activity day, "
        "counted at each later activity-day offset - the standard "
        "retention triangle. Two user_id-keyed aggregations plus one "
        "user_id equi-join; the per-user firsts frame SCALES with the "
        "user population, so its join strategy is left to size stats + "
        "AQE (auto-broadcast at bench scale, shuffle join when users "
        "number in the billions — a forced hint would OOM there)."
    ),
    tags=("events", "retention"),
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    firsts = ev.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("cohort_day"))
    active = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    return (
        active.join(firsts, "user_id")
        .groupBy(
            F.col("cohort_day").cast("string").alias("cohort_day"),
            F.datediff(F.col("d"), F.col("cohort_day")).alias("day_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@register(
    "events_rolling_zscore",
    oracle=f"""
    WITH buckets AS (
      SELECT (epoch_us(ts) // {3600 * US}) * {3600 * US} AS h_start_us,
             event_type,
             CAST(SUM(CAST(value AS DECIMAL(18,4))) * 10000 AS BIGINT) AS v_i
      FROM events GROUP BY 1, 2
    ),
    framed AS (
      SELECT h_start_us, event_type, v_i,
             COUNT(*) OVER w AS c,
             SUM(v_i) OVER w AS s1,
             SUM(CAST(v_i AS DECIMAL(38,0)) * v_i) OVER w AS s2
      FROM buckets
      WINDOW w AS (
        PARTITION BY event_type ORDER BY h_start_us
        RANGE BETWEEN {43200 * US} PRECEDING AND {3600 * US} PRECEDING
      )
    )
    SELECT h_start_us, event_type, v_i, CAST(c AS BIGINT) AS n_prev,
           (CAST(v_i AS DOUBLE) - CAST(s1 AS DOUBLE) / CAST(c AS DOUBLE))
             / sqrt((CAST(s2 AS DOUBLE)
                     - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(c AS DOUBLE))
                    / (CAST(c AS DOUBLE) - 1.0)) AS z
    FROM framed
    WHERE c >= 5
      AND (CAST(s2 AS DOUBLE)
           - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(c AS DOUBLE))
          / (CAST(c AS DOUBLE) - 1.0) > 0
    """,
    doc=(
        "Rolling anomaly z-score over the hour-bucketed value series "
        "per event_type — the continuous-monitoring idiom (TimescaleDB "
        "anomaly queries / Flink CEP preludes) expressed as a RANGE "
        "window frame over the previous 12 hours (time-range, not row-"
        "count, so gaps behave correctly). Exactness discipline: bucket "
        "values are exact integers (decimal sum × 10⁴), the frame's "
        "count/sum/sum-of-squares are integer/decimal-exact and order-"
        "independent, and both engines evaluate the identical final "
        "double expression — so even sqrt-based z-scores hash-match. At "
        "scale: one shuffle for the bucket agg, one for the per-type "
        "sort; frames never materialize more than the running sums."
    ),
    tags=("events", "window", "anomaly"),
)
def events_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    buckets = (
        ev.groupBy(
            ((F.unix_micros("ts") / F.lit(3600 * US)).cast("long") * (3600 * US)).alias(
                "h_start_us"
            ),
            "event_type",
        )
        .agg(
            (F.sum(F.col("value").cast("decimal(18,4)")) * 10000)
            .cast("long")
            .alias("v_i")
        )
    )
    w = (
        W.partitionBy("event_type")
        .orderBy("h_start_us")
        .rangeBetween(-43200 * US, -3600 * US)
    )
    framed = buckets.select(
        "h_start_us",
        "event_type",
        "v_i",
        F.count(F.lit(1)).over(w).alias("c"),
        F.sum("v_i").over(w).alias("s1"),
        F.sum(F.col("v_i").cast("decimal(38,0)") * F.col("v_i")).over(w).alias("s2"),
    )
    cd = F.col("c").cast("double")
    s1d = F.col("s1").cast("double")
    s2d = F.col("s2").cast("double")
    vd = F.col("v_i").cast("double")
    var = (s2d - s1d * s1d / cd) / (cd - F.lit(1.0))
    z = (vd - s1d / cd) / F.sqrt(var)
    return (
        framed.filter((F.col("c") >= 5) & (var > 0))
        .select(
            "h_start_us",
            "event_type",
            "v_i",
            F.col("c").cast("long").alias("n_prev"),
            z.alias("z"),
        )
    )


EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@register(
    "events_pivot_hourly",
    oracle=f"""
    SELECT (epoch_us(ts) // {3600 * US}) * {3600 * US} AS h_start_us,
           {", ".join(f"COUNT(*) FILTER (WHERE event_type = '{t}') AS n_{t}" for t in EVENT_TYPES)}
    FROM events GROUP BY 1
    """,
    doc=(
        "PIVOT: hour × event_type count matrix as wide columns — the "
        "operator family (pivot/conditional aggregation) the rest of the "
        "registry lacks. Fixed pivot values keep the schema static (a "
        "dynamic pivot would scan twice); absent combinations are 0, "
        "matching the oracle's FILTER semantics. One hash aggregate, "
        "identical shuffle shape to the plain rollup at any scale."
    ),
    tags=("events", "pivot"),
)
def events_pivot_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    hour = ((F.unix_micros("ts") / F.lit(3600 * US)).cast("long") * (3600 * US)).alias(
        "h_start_us"
    )
    pivoted = (
        ev.select(hour, "event_type")
        .groupBy("h_start_us")
        .pivot("event_type", list(EVENT_TYPES))
        .count()
    )
    return pivoted.select(
        "h_start_us",
        *[
            F.coalesce(F.col(t), F.lit(0)).cast("long").alias(f"n_{t}")
            for t in EVENT_TYPES
        ],
    )


@register(
    "events_unpivot_hourly",
    oracle=f"""
    WITH wide AS (
      SELECT (epoch_us(ts) // {3600 * US}) * {3600 * US} AS h_start_us,
             {", ".join(f"COUNT(*) FILTER (WHERE event_type = '{t}') AS n_{t}" for t in EVENT_TYPES)}
      FROM events GROUP BY 1
    )
    SELECT h_start_us, replace(event_type, 'n_', '') AS event_type, n FROM (
      UNPIVOT wide ON {", ".join(f"n_{t}" for t in EVENT_TYPES)}
      INTO NAME event_type VALUE n
    ) u
    """,
    doc=(
        "UNPIVOT/melt — the inverse of events_pivot_hourly via Spark's "
        "native DataFrame.unpivot (Spark ≥ 3.4) and DuckDB's UNPIVOT: "
        "wide hour × type matrix back to long form, zeros retained (the "
        "round trip is lossless, unlike re-aggregating the raw events "
        "which drops empty combinations). Pure map over the wide frame."
    ),
    tags=("events", "pivot"),
)
def events_unpivot_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    wide = events_pivot_hourly(spark, sf_dir)
    long = wide.unpivot(
        "h_start_us",
        [f"n_{t}" for t in EVENT_TYPES],
        "event_type",
        "n",
    )
    return long.select(
        "h_start_us",
        F.regexp_replace("event_type", "^n_", "").alias("event_type"),
        F.col("n").cast("long").alias("n"),
    )


@register(
    "events_click_purchase_outer",
    oracle="""
    WITH c AS (
      SELECT user_id, COUNT(*) AS n_clicks FROM events
      WHERE event_type = 'click' GROUP BY user_id
    ),
    p AS (
      SELECT user_id, COUNT(*) AS n_purchases FROM events
      WHERE event_type = 'purchase' GROUP BY user_id
    )
    SELECT COALESCE(c.user_id, p.user_id) AS user_id,
           COALESCE(c.n_clicks, 0) AS n_clicks,
           COALESCE(p.n_purchases, 0) AS n_purchases
    FROM c FULL OUTER JOIN p ON c.user_id = p.user_id
    """,
    doc=(
        "FULL OUTER join — the join type the rest of the registry "
        "lacks: per-user click vs purchase activity, retaining users "
        "present on only one side (zero-filled). Two pre-aggregations "
        "shrink both sides to O(users) before the join, so the outer "
        "join shuffles aggregates, never raw events — the right order "
        "of operations at any scale."
    ),
    tags=("events", "join", "outer"),
)
def events_click_purchase_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    c = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_clicks"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_purchases"))
    )
    j = c.join(p, "user_id", "full_outer")
    return j.select(
        "user_id",
        F.coalesce(F.col("n_clicks"), F.lit(0)).cast("long").alias("n_clicks"),
        F.coalesce(F.col("n_purchases"), F.lit(0)).cast("long").alias("n_purchases"),
    )


@register(
    "events_value_histogram",
    oracle="""
    SELECT event_type,
           CAST(floor(value / 5.0) AS BIGINT) AS bin,
           COUNT(*) AS n
    FROM events
    WHERE value IS NOT NULL
    GROUP BY 1, 2
    """,
    doc=(
        "Fixed-width histogram of event values per type (bin width 5) — "
        "the distribution primitive dashboards and data-quality checks "
        "bin with. floor(x/width) of a double is deterministic, so the "
        "whole histogram hash-matches. Map-side combine collapses rows "
        "to O(types × bins) before the only shuffle — the same "
        "sketch-like collapse as Count-Min, exact because the domain "
        "is bounded."
    ),
    tags=("events", "histogram"),
)
def events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return (
        ev.filter(F.col("value").isNotNull())
        .groupBy(
            "event_type",
            F.floor(F.col("value") / 5.0).cast("long").alias("bin"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
