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



def cms_positions(df, key_col: str, keep: tuple = ()):
    """(depth, bucket, *keep) for every (row, depth) of a string key
    column — THE Count-Min cell expression (md5 of "<depth>#<key>" mod
    width). Single source of truth shared by the batch sketch, its
    point queries, and the streaming store/estimator in
    ``streaming/cms.py``: the streaming store's bit-for-bit parity with
    the batch sketch rests on this expression never forking."""
    depths = F.array(*[F.lit(d) for d in range(CMS_DEPTH)])
    return df.select(F.explode(depths).alias("depth"), key_col, *keep).select(
        F.col("depth").cast("long").alias("depth"),
        (
            hash32(F.concat(F.col("depth").cast("string"), F.lit("#"), F.col(key_col)))
            % CMS_WIDTH
        ).alias("bucket"),
        *keep,
    )


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
    cells = cms_positions(_words(spark, sf_dir), "word")
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
    cells = (
        cms_positions(w, "word")
        .groupBy("depth", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    probes = cms_positions(top, "word", keep=("word", "true_cnt"))
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


# --- HyperLogLog ----------------------------------------------------------

HLL_P = 6  # 2^6 = 64 registers
HLL_M = 1 << HLL_P
HLL_REM_BITS = 32 - HLL_P  # low 26 bits feed the rho (leading-zero) count
# alpha_m * m^2 for m = 64 (Flajolet et al. 2007, alpha_64 = 0.709).
# Interpolated as the same decimal literal into both engines so each
# parses the identical double.
HLL_ALPHA_M2 = 0.709 * HLL_M * HLL_M  # = 2904.064


def hll_registers(
    keys: DataFrame, key_col: str, keep: tuple = ()
) -> DataFrame:
    """(*keep, idx, m): HyperLogLog registers of a string key column —
    only registers touched by at least one key appear (absent idx = 0);
    ``keep`` columns become extra grouping keys (per-group sketches,
    the cms_positions pattern — ONE derivation of the hash/idx/rho
    kernel so grouped and global registers can never fork).
    Mergeable across batches/shards/groups by groupBy(idx).max(m): max
    is idempotent and commutative, so HLL union is replay-safe for free
    (the property ``streaming/hll.py`` builds on)."""
    return _hll_rho(keys, key_col, keep).groupBy(*keep, "idx").agg(
        F.max("rho").cast("long").alias("m")
    )


def _hll_rho(keys: DataFrame, key_col: str, keep: tuple = ()) -> DataFrame:
    """(*keep, idx, rho): the shared HLL hash/idx/rho kernel — one row
    per input key (pre-aggregation), so callers can fold extra per-cell
    statistics into the same groupBy pass."""
    hashed = keys.select(
        *keep, hash32(F.concat(F.lit("hll#"), F.col(key_col))).alias("h")
    )
    rem_space = 1 << HLL_REM_BITS
    split = hashed.select(
        *keep,
        (F.col("h") / rem_space).cast("long").alias("idx"),
        (F.col("h") % rem_space).alias("rem"),
    )
    return split.select(
        *keep,
        "idx",
        F.when(F.col("rem") == 0, F.lit(HLL_REM_BITS + 1))
        .otherwise(F.lit(HLL_REM_BITS + 1) - F.length(F.bin(F.col("rem"))))
        .alias("rho"),
    )


def hll_dense_registers(spark: SparkSession, regs: DataFrame) -> DataFrame:
    """Fill the untouched registers with 0 — the 64-row dense frame the
    estimate formula needs."""
    all_idx = spark.range(HLL_M).withColumnRenamed("id", "idx")
    return (
        all_idx.join(regs, "idx", "left")
        .groupBy("idx")
        .agg(F.coalesce(F.max("m"), F.lit(0)).cast("long").alias("m"))
    )



@register(
    "sketch_hll_distinct",
    oracle=f"""
    WITH words AS (
      SELECT DISTINCT unnest({SQL_TOKENS}) AS word FROM documents
    ),
    hashed AS (
      SELECT word, {SQL_HASH32.format(v="'hll#' || word")} AS h FROM words
    ),
    split AS (
      SELECT h // {1 << HLL_REM_BITS} AS idx, h % {1 << HLL_REM_BITS} AS rem
      FROM hashed
    ),
    rho AS (
      SELECT idx,
             CASE WHEN rem = 0 THEN {HLL_REM_BITS + 1}
                  ELSE {HLL_REM_BITS + 1} - length(bin(rem)) END AS rho
      FROM split
    ),
    regs AS (
      SELECT r.r AS idx, COALESCE(MAX(rho.rho), 0) AS m
      FROM range({HLL_M}) r(r) LEFT JOIN rho ON rho.idx = r.r
      GROUP BY r.r
    ),
    agg AS (
      SELECT SUM(pow(2.0, -m)) AS sum_inv,
             SUM(CASE WHEN m = 0 THEN 1 ELSE 0 END) AS n_zero
      FROM regs
    )
    SELECT CAST({HLL_M} AS BIGINT) AS m,
           CAST(n_zero AS BIGINT) AS n_zero,
           CAST(sum_inv AS DOUBLE) AS sum_inv,
           CAST({HLL_ALPHA_M2!r} AS DOUBLE) / sum_inv AS est_raw,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM hashed) AS true_distinct,
           (CAST({HLL_ALPHA_M2!r} AS DOUBLE) / sum_inv)
             / (SELECT COUNT(*) FROM hashed) - 1.0 AS rel_err
    FROM agg
    """,
    doc=(
        "HyperLogLog distinct-count sketch over the corpus vocabulary "
        "(p = 6, 64 registers, fixed md5 hash family): register index = "
        "top 6 hash bits, rho = leading-zero count of the low 26 bits "
        "+ 1 (computed exactly via length(bin(rem)) in BOTH engines — "
        "no float log2). sum(2^-M_j) over 64 registers is a sum of "
        "dyadic rationals needing < 34 mantissa bits, so it is EXACT in "
        "double regardless of aggregation order — the estimate and its "
        "relative error are oracle-pinned bit-for-bit. Scale shape: the "
        "token stream collapses to 64 (idx, max rho) cells map-side; "
        "merging shards = cell-wise MAX, the canonical HLL union."
    ),
    tags=("llm", "sketch", "headline"),
)
def sketch_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Single pass over the vocabulary: each distinct word is exactly one
    # row of the rho kernel, so the register groupBy can carry the exact
    # distinct count as a per-cell COUNT(*) folded into the same
    # aggregation — true_distinct = Σ c over cells. This removes the
    # second corpus scan + distinct shuffle the separate true_cnt branch
    # paid, and the dense-fill join now feeds both statistics. Values
    # are identical: max/count over the same rows, summed exactly.
    w = _words(spark, sf_dir).distinct()
    cells = _hll_rho(w, "word").groupBy("idx").agg(
        F.max("rho").cast("long").alias("m"),
        F.count(F.lit(1)).cast("long").alias("c"),
    )
    all_idx = spark.range(HLL_M).withColumnRenamed("id", "idx")
    dense = all_idx.join(cells, "idx", "left").select(
        "idx",
        F.coalesce(F.col("m"), F.lit(0)).cast("long").alias("m"),
        F.coalesce(F.col("c"), F.lit(0)).cast("long").alias("c"),
    )
    est = F.lit(HLL_ALPHA_M2) / F.col("sum_inv")
    return dense.agg(
        F.sum(F.pow(F.lit(2.0), -F.col("m"))).alias("sum_inv"),
        F.sum(F.when(F.col("m") == 0, 1).otherwise(0)).cast("long").alias("n_zero"),
        F.sum("c").cast("long").alias("true_distinct"),
    ).select(
        F.lit(HLL_M).cast("long").alias("m"),
        "n_zero",
        F.col("sum_inv").cast("double").alias("sum_inv"),
        est.alias("est_raw"),
        "true_distinct",
        (est / F.col("true_distinct") - 1.0).alias("rel_err"),
    )


# --- Bloom filter ---------------------------------------------------------

BLOOM_BITS = 4096
BLOOM_WORD_BITS = 32  # pack 32 bits/word: masks stay < 2^32, exact BIGINT
BLOOM_WORDS = BLOOM_BITS // BLOOM_WORD_BITS
BLOOM_K = 3
BLOOM_PROBE_PRESENT = 20
BLOOM_PROBE_ABSENT = 10


@register(
    "sketch_bloom_membership",
    oracle=f"""
    WITH vocab AS (
      SELECT DISTINCT unnest({SQL_TOKENS}) AS word FROM documents
    ),
    setbits AS (
      SELECT DISTINCT
             ({SQL_HASH32.format(v="'bf' || CAST(j.j AS VARCHAR) || '#' || word")}
               % {BLOOM_BITS}) // {BLOOM_WORD_BITS} AS widx,
             CAST(pow(2, ({SQL_HASH32.format(v="'bf' || CAST(j.j AS VARCHAR) || '#' || word")}
               % {BLOOM_BITS}) % {BLOOM_WORD_BITS}) AS BIGINT) AS mask
      FROM vocab CROSS JOIN range({BLOOM_K}) j(j)
    ),
    bloom AS (
      SELECT widx, bit_or(mask) AS bits FROM setbits GROUP BY widx
    ),
    freq AS (
      SELECT word, COUNT(*) AS cnt
      FROM (SELECT unnest({SQL_TOKENS}) AS word FROM documents)
      GROUP BY word ORDER BY cnt DESC, word LIMIT {BLOOM_PROBE_PRESENT}
    ),
    probes AS (
      SELECT word AS probe FROM freq
      UNION ALL
      SELECT 'qqabsent' || CAST(i.i AS VARCHAR) FROM range({BLOOM_PROBE_ABSENT}) i(i)
    ),
    checks AS (
      SELECT p.probe, j.j,
             ({SQL_HASH32.format(v="'bf' || CAST(j.j AS VARCHAR) || '#' || p.probe")}
               % {BLOOM_BITS}) // {BLOOM_WORD_BITS} AS widx,
             CAST(pow(2, ({SQL_HASH32.format(v="'bf' || CAST(j.j AS VARCHAR) || '#' || p.probe")}
               % {BLOOM_BITS}) % {BLOOM_WORD_BITS}) AS BIGINT) AS mask
      FROM probes p CROSS JOIN range({BLOOM_K}) j(j)
    ),
    verdicts AS (
      SELECT c.probe,
             CAST(MIN(CASE WHEN (COALESCE(b.bits, 0) & c.mask) <> 0
                           THEN 1 ELSE 0 END) AS INTEGER) AS bloom_hit
      FROM checks c LEFT JOIN bloom b ON b.widx = c.widx
      GROUP BY c.probe
    )
    SELECT v.probe,
           CAST(CASE WHEN vo.word IS NULL THEN 0 ELSE 1 END AS INTEGER)
             AS in_vocab,
           v.bloom_hit
    FROM verdicts v LEFT JOIN vocab vo ON vo.word = v.probe
    """,
    doc=(
        "Bloom-filter membership over the corpus vocabulary: 4096 bits "
        "packed as 128 x 32-bit BIGINT words (masks < 2^32 so bit_or "
        "stays exact/positive in both engines), k = 3 md5-prefix "
        "hashes. Probes = the 20 most frequent words (must hit) + 10 "
        "constructed absent keys; in_vocab is derived by anti-lookup, "
        "never assumed, so any false positive is itself a pinned, "
        "reproducible value. Scale shape: building is one map-side "
        "bit_or groupBy collapsing the vocabulary to 128 rows; the "
        "probe side broadcasts. The same frame drop-in serves as a "
        "pre-join existence filter (semi-join pushdown for 100 TB "
        "fact/dim joins)."
    ),
    tags=("llm", "sketch"),
)
def sketch_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    vocab = _words(spark, sf_dir).distinct()
    js = F.array(*[F.lit(j) for j in range(BLOOM_K)])

    def _pos(word_col, j_col):
        return hash32(
            F.concat(F.lit("bf"), j_col.cast("string"), F.lit("#"), word_col)
        ) % BLOOM_BITS

    setbits = (
        vocab.select(F.explode(js).alias("j"), "word")
        .select(_pos(F.col("word"), F.col("j")).alias("pos"))
        .select(
            (F.col("pos") / BLOOM_WORD_BITS).cast("long").alias("widx"),
            F.pow(F.lit(2.0), (F.col("pos") % BLOOM_WORD_BITS).cast("double"))
            .cast("long")
            .alias("mask"),
        )
        .distinct()
    )
    bloom = setbits.groupBy("widx").agg(F.bit_or("mask").alias("bits"))
    freq = (
        _words(spark, sf_dir)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), "word")
        .limit(BLOOM_PROBE_PRESENT)
        .select(F.col("word").alias("probe"))
    )
    absent = spark.range(BLOOM_PROBE_ABSENT).select(
        F.concat(F.lit("qqabsent"), F.col("id").cast("string")).alias("probe")
    )
    probes = freq.unionByName(absent)
    checks = probes.select(F.explode(js).alias("j"), "probe").select(
        "probe", _pos(F.col("probe"), F.col("j")).alias("pos")
    ).select(
        "probe",
        (F.col("pos") / BLOOM_WORD_BITS).cast("long").alias("widx"),
        F.pow(F.lit(2.0), (F.col("pos") % BLOOM_WORD_BITS).cast("double"))
        .cast("long")
        .alias("mask"),
    )
    verdicts = (
        checks.join(F.broadcast(bloom), "widx", "left")
        .select(
            "probe",
            F.when(
                (F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("mask"))) != 0, 1
            )
            .otherwise(0)
            .alias("hit"),
        )
        .groupBy("probe")
        .agg(F.min("hit").cast("int").alias("bloom_hit"))
    )
    return verdicts.join(
        vocab.withColumnRenamed("word", "probe").withColumn("present", F.lit(1)),
        "probe",
        "left",
    ).select(
        "probe",
        F.coalesce(F.col("present"), F.lit(0)).cast("int").alias("in_vocab"),
        "bloom_hit",
    )


@register(
    "sketch_hll_by_type",
    oracle=f"""
    WITH keys AS (
      SELECT DISTINCT event_type, CAST(user_id AS VARCHAR) AS k
      FROM events WHERE user_id IS NOT NULL
    ),
    hashed AS (
      SELECT event_type, {SQL_HASH32.format(v="'hll#' || k")} AS h FROM keys
    ),
    rho AS (
      SELECT event_type,
             h // {1 << HLL_REM_BITS} AS idx,
             CASE WHEN h % {1 << HLL_REM_BITS} = 0 THEN {HLL_REM_BITS + 1}
                  ELSE {HLL_REM_BITS + 1} - length(bin(h % {1 << HLL_REM_BITS}))
             END AS rho
      FROM hashed
    ),
    regs AS (
      SELECT g.event_type, r.r AS idx, COALESCE(MAX(rho.rho), 0) AS m
      FROM (SELECT DISTINCT event_type FROM keys) g
      CROSS JOIN range({HLL_M}) r(r)
      LEFT JOIN rho ON rho.event_type = g.event_type AND rho.idx = r.r
      GROUP BY g.event_type, r.r
    ),
    agg AS (
      SELECT event_type, SUM(pow(2.0, -m)) AS sum_inv FROM regs GROUP BY event_type
    ),
    truth AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS true_distinct
      FROM keys GROUP BY event_type
    )
    SELECT a.event_type,
           CAST(a.sum_inv AS DOUBLE) AS sum_inv,
           CAST({HLL_ALPHA_M2!r} AS DOUBLE) / a.sum_inv AS est_raw,
           t.true_distinct
    FROM agg a JOIN truth t USING (event_type)
    """,
    doc=(
        "Grouped HyperLogLog: per-event-type approximate distinct "
        "users — the sketch as an AGGREGATION COLUMN (the "
        "approx_count_distinct GROUP BY shape), sharing the exact "
        "register derivation of sketch_hll_distinct so per-group "
        "registers max-merge into the global sketch by construction. "
        "Per group the state is 64 cells regardless of cardinality; "
        "the shuffle carries |groups| x 64 rows. Raw estimate only "
        "(small groups sit in linear-counting territory; the "
        "correction's ln() is cross-engine-unsafe, so the gate pins "
        "the raw value and the exact truth side-by-side)."
    ),
    tags=("llm", "sketch"),
)
def sketch_hll_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    keys = (
        ev.filter(F.col("user_id").isNotNull())
        .select("event_type", F.col("user_id").cast("string").alias("k"))
        .distinct()
    )
    sparse = hll_registers(keys, "k", keep=("event_type",))
    groups = keys.select("event_type").distinct()
    dense = groups.crossJoin(
        F.broadcast(spark.range(HLL_M).withColumnRenamed("id", "idx"))
    )
    regs = (
        dense.join(sparse, ["event_type", "idx"], "left")
        .groupBy("event_type", "idx")
        .agg(F.coalesce(F.max("m"), F.lit(0)).alias("m"))
    )
    agg = regs.groupBy("event_type").agg(
        F.sum(F.pow(F.lit(2.0), -F.col("m"))).alias("sum_inv")
    )
    truth = keys.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("true_distinct")
    )
    return agg.join(truth, "event_type").select(
        "event_type",
        F.col("sum_inv").cast("double").alias("sum_inv"),
        (F.lit(HLL_ALPHA_M2) / F.col("sum_inv")).alias("est_raw"),
        "true_distinct",
    )


#: trailing-window width (days) for the HLL rolling-distinct rollup —
#: matches rolling_7d_distinct_users so the two strategies are
#: cross-checkable on the same oracle grain.
ROLLING_HLL_DAYS = 7

_ROLLING_DAY = "date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))"


@register(
    "rolling_distinct_hll",
    oracle=f"""
    WITH keys AS (
      SELECT DISTINCT {_ROLLING_DAY} AS day_idx, CAST(user_id AS VARCHAR) AS k
      FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
    ),
    days AS (SELECT DISTINCT day_idx FROM keys),
    hashed AS (
      SELECT day_idx, {SQL_HASH32.format(v="'hll#' || k")} AS h FROM keys
    ),
    rho AS (
      SELECT day_idx,
             h // {1 << HLL_REM_BITS} AS idx,
             CASE WHEN h % {1 << HLL_REM_BITS} = 0 THEN {HLL_REM_BITS + 1}
                  ELSE {HLL_REM_BITS + 1} - length(bin(h % {1 << HLL_REM_BITS}))
             END AS rho
      FROM hashed
    ),
    cover AS (
      SELECT r.day_idx + o.o AS day_idx, r.idx, r.rho
      FROM rho r CROSS JOIN range({ROLLING_HLL_DAYS}) o(o)
    ),
    regs AS (
      SELECT d.day_idx, rr.r AS idx, COALESCE(MAX(c.rho), 0) AS m
      FROM days d
      CROSS JOIN range({HLL_M}) rr(r)
      LEFT JOIN cover c ON c.day_idx = d.day_idx AND c.idx = rr.r
      GROUP BY d.day_idx, rr.r
    ),
    agg AS (
      SELECT day_idx, SUM(pow(2.0, -m)) AS sum_inv FROM regs GROUP BY day_idx
    ),
    truth AS (
      SELECT c.day_idx, CAST(COUNT(DISTINCT c.k) AS BIGINT) AS true_distinct
      FROM (
        SELECT day_idx + o.o AS day_idx, k
        FROM keys CROSS JOIN range({ROLLING_HLL_DAYS}) o(o)
      ) c JOIN days USING (day_idx)
      GROUP BY c.day_idx
    )
    SELECT a.day_idx,
           CAST(a.sum_inv AS DOUBLE) AS sum_inv,
           CAST({HLL_ALPHA_M2!r} AS DOUBLE) / a.sum_inv AS est_raw,
           t.true_distinct
    FROM agg a JOIN truth t USING (day_idx)
    """,
    doc=(
        "Trailing-7-day distinct users via MERGED PER-DAY HLL REGISTER "
        "STATES — the wide-window scale path. rolling_7d_distinct_users "
        "is exact but fans the (day, user) grain out W× (explode onto "
        "covered days), so its cost grows with window width × daily "
        "actives; here each day is first reduced to 64 registers "
        "(bounded state, any cardinality), the W-day merge is a "
        "register-wise MAX over W × 64 rows per output day — "
        "independent of how many users each day saw — and the register "
        "derivation is shared with sketch_hll_distinct/by_type "
        "(hll_registers), so day-sketches max-merge into any coarser "
        "rollup by construction. At W = 90 and millions of daily "
        "actives the exact explode moves ~90 × actives rows while this "
        "plan moves 90 × 64. The oracle recomputes registers, merge, "
        "and estimate in SQL (exact: every 2^-m term and the ≤64-term "
        "sum are exactly representable doubles) alongside the exact "
        "truth, pinning the approximation itself."
    ),
    tags=("llm", "sketch", "events", "window"),
)
def rolling_distinct_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    day = F.datediff(
        F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")
    ).cast("long")
    keys = (
        ev.filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .select(day.alias("day_idx"), F.col("user_id").cast("string").alias("k"))
        .distinct()
    )
    days = keys.select("day_idx").distinct()
    # per-day sparse registers -> explode onto the W covered days ->
    # register-wise max-merge (all partitioned aggregations)
    sparse = hll_registers(keys, "k", keep=("day_idx",))
    cover = sparse.select(
        F.explode(
            F.sequence(
                F.col("day_idx"), F.col("day_idx") + F.lit(ROLLING_HLL_DAYS - 1)
            )
        ).alias("day_idx"),
        "idx",
        "m",
    )
    merged = cover.groupBy("day_idx", "idx").agg(F.max("m").alias("m"))
    dense = days.crossJoin(
        F.broadcast(spark.range(HLL_M).withColumnRenamed("id", "idx"))
    )
    regs = (
        dense.join(merged, ["day_idx", "idx"], "left")
        .select("day_idx", "idx", F.coalesce(F.col("m"), F.lit(0)).alias("m"))
    )
    agg = regs.groupBy("day_idx").agg(
        F.sum(F.pow(F.lit(2.0), -F.col("m"))).alias("sum_inv")
    )
    truth = (
        keys.select(
            F.explode(
                F.sequence(
                    F.col("day_idx"),
                    F.col("day_idx") + F.lit(ROLLING_HLL_DAYS - 1),
                )
            ).alias("day_idx"),
            "k",
        )
        .join(F.broadcast(days), "day_idx")
        .groupBy("day_idx")
        .agg(F.countDistinct("k").cast("long").alias("true_distinct"))
    )
    return agg.join(truth, "day_idx").select(
        "day_idx",
        F.col("sum_inv").cast("double").alias("sum_inv"),
        (F.lit(HLL_ALPHA_M2) / F.col("sum_inv")).alias("est_raw"),
        "true_distinct",
    )


HIST_BINS = 512


@register(
    "sketch_histogram_quantiles",
    oracle=f"""
    WITH rng AS (
      SELECT MIN(value) AS vmin, MAX(value) AS vmax FROM events
      WHERE value IS NOT NULL
    ),
    binned AS (
      SELECT event_type,
             CASE WHEN vmax = vmin THEN CAST(0 AS BIGINT)
                  ELSE LEAST(CAST(floor((value - vmin) / (vmax - vmin)
                                        * {HIST_BINS}) AS BIGINT),
                             {HIST_BINS - 1})
             END AS bin
      FROM events, rng
      WHERE value IS NOT NULL
    ),
    hist AS (
      SELECT event_type, bin, CAST(COUNT(*) AS BIGINT) AS c
      FROM binned GROUP BY event_type, bin
    ),
    cum AS (
      SELECT event_type, bin, c,
             SUM(c) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
             SUM(c) OVER (PARTITION BY event_type) AS n
      FROM hist
    ),
    picks AS (
      SELECT event_type, CAST(n AS BIGINT) AS n,
             MIN(CASE WHEN cum >= (n * 50 + 99) // 100 THEN bin END) AS b50,
             MIN(CASE WHEN cum >= (n * 95 + 99) // 100 THEN bin END) AS b95,
             MIN(CASE WHEN cum >= (n * 99 + 99) // 100 THEN bin END) AS b99
      FROM cum GROUP BY event_type, n
    )
    SELECT event_type, n,
           vmin + (b50 + 1) * (vmax - vmin) / {HIST_BINS} AS p50_est,
           vmin + (b95 + 1) * (vmax - vmin) / {HIST_BINS} AS p95_est,
           vmin + (b99 + 1) * (vmax - vmin) / {HIST_BINS} AS p99_est
    FROM picks, rng
    """,
    doc=(
        "Mergeable quantile sketch: a 512-bin equi-width histogram of "
        "events.value per event_type (two passes: global [min, max], "
        "then bin counts), quantile estimate = upper edge of the first "
        "bin whose cumulative count reaches ceil(q·n) — the ceil done "
        "as exact integer (n·q + 99) div 100, the bin index from one "
        "fixed double expression both engines evaluate identically. "
        "The sketch is 512 longs per group, collapses map-side inside "
        "the scan stage (the groupBy key space is |types|×512), merges "
        "across shards/streams by cell-wise addition, and its error is "
        "bounded by the bin width — the poor man's t-digest, with the "
        "estimate itself oracle-pinned bit-for-bit."
    ),
    tags=("sketch", "quantile", "events"),
)
def sketch_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NULL values are excluded (matching streaming hist_cells); a
    # degenerate range (vmax == vmin, e.g. a constant or 1-row corpus)
    # maps every value to bin 0 instead of dividing by zero.
    ev = (
        load_table(spark, "events", sf_dir)
        .select("event_type", "value")
        .filter(F.col("value").isNotNull())
    )
    rng = ev.agg(F.min("value").alias("vmin"), F.max("value").alias("vmax"))
    binned = ev.crossJoin(F.broadcast(rng)).select(
        "event_type",
        "vmin",
        "vmax",
        F.when(F.col("vmax") == F.col("vmin"), F.lit(0).cast("long"))
        .otherwise(
            F.least(
                F.floor(
                    (F.col("value") - F.col("vmin"))
                    / (F.col("vmax") - F.col("vmin"))
                    * HIST_BINS
                ).cast("long"),
                F.lit(HIST_BINS - 1).cast("long"),
            )
        )
        .alias("bin"),
    )
    hist = binned.groupBy("event_type", "vmin", "vmax", "bin").agg(
        F.count(F.lit(1)).alias("c")
    )
    from pyspark.sql.window import Window as W

    cum = hist.select(
        "event_type",
        "vmin",
        "vmax",
        "bin",
        F.sum("c").over(
            W.partitionBy("event_type").orderBy("bin")
        ).alias("cum"),
        F.sum("c").over(W.partitionBy("event_type")).alias("n"),
    )

    def pick(pct: int):
        thresh = F.expr(f"(n * {pct} + 99) div 100")
        return F.min(F.when(F.col("cum") >= thresh, F.col("bin"))).alias(f"b{pct}")

    picks = cum.groupBy("event_type", "vmin", "vmax", "n").agg(
        pick(50), pick(95), pick(99)
    )
    # association must mirror the oracle exactly: ((b+1)·range)/BINS,
    # NOT (b+1)·(range/BINS) — double rounding differs between the two.
    def edge(b):
        return F.col("vmin") + (
            (F.col(b) + 1) * (F.col("vmax") - F.col("vmin"))
        ) / HIST_BINS

    return picks.select(
        "event_type",
        "n",
        edge("b50").alias("p50_est"),
        edge("b95").alias("p95_est"),
        edge("b99").alias("p99_est"),
    )


KMV_SET_K = 256
_SET_A_BEFORE = "1995-09-01"  # part-supplier pairs ordered before this
_SET_B_FROM = "1995-06-01"  # ... and from this date on (3-month overlap)


@register(
    "sketch_kmv_set_ops",
    oracle=f"""
    WITH keys AS (
      SELECT DISTINCT CAST(l.l_partkey AS BIGINT) * 1000000 + l.l_suppkey AS k,
             o.o_orderdate
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    ha AS (SELECT DISTINCT {SQL_HASH32.format(v="'kmv#' || CAST(k AS VARCHAR)")} AS h
           FROM keys WHERE o_orderdate < DATE '{_SET_A_BEFORE}'),
    hb AS (SELECT DISTINCT {SQL_HASH32.format(v="'kmv#' || CAST(k AS VARCHAR)")} AS h
           FROM keys WHERE o_orderdate >= DATE '{_SET_B_FROM}'),
    ska AS (SELECT h FROM ha ORDER BY h LIMIT {KMV_SET_K}),
    skb AS (SELECT h FROM hb ORDER BY h LIMIT {KMV_SET_K}),
    merged AS (SELECT h FROM (SELECT h FROM ska UNION SELECT h FROM skb)
               ORDER BY h LIMIT {KMV_SET_K}),
    kth AS (SELECT MAX(h) AS hk, CAST(COUNT(*) AS BIGINT) AS m FROM merged),
    inter AS (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM merged
              WHERE h IN (SELECT h FROM ska) AND h IN (SELECT h FROM skb)),
    exact AS (
      SELECT CAST(COUNT(DISTINCT k) AS BIGINT) AS exact_union,
             CAST(SUM(CASE WHEN lo < DATE '{_SET_A_BEFORE}'
                            AND hi >= DATE '{_SET_B_FROM}'
                       THEN 1 ELSE 0 END) AS BIGINT) AS exact_intersection
      FROM (SELECT k, MIN(o_orderdate) AS lo, MAX(o_orderdate) AS hi
            FROM keys GROUP BY k)
    )
    SELECT CAST({KMV_SET_K} AS BIGINT) AS k,
           kth.m AS m,
           kth.hk AS kth_hash,
           CASE WHEN kth.m < {KMV_SET_K} THEN CAST(kth.m AS DOUBLE)
                ELSE CAST(({KMV_SET_K} - 1) * 4294967296 AS DOUBLE) / kth.hk
           END AS est_union,
           exact.exact_union,
           inter.c AS inter_matches,
           CASE WHEN kth.m < {KMV_SET_K} THEN CAST(inter.c AS DOUBLE)
                ELSE CAST(inter.c * ({KMV_SET_K} - 1) * 4294967296 AS DOUBLE)
                     / ({KMV_SET_K} * kth.hk)
           END AS est_intersection,
           exact.exact_intersection,
           CAST(inter.c AS DOUBLE) / kth.m AS jaccard_est
    FROM kth, inter, exact
    """,
    doc=(
        "Theta-sketch-style SET ALGEBRA on KMV sketches: bottom-k "
        "(k=256) hash sketches of two overlapping part-supplier key "
        "sets (pairs ordered before 1995-09 vs from 1995-06), merged "
        "union sketch → distinct estimate (k−1)·2^32/h_k, intersection "
        "via the matching-bottom-k rule (members of the union sketch "
        "present in both input sketches), Jaccard = matches/k. The "
        "point: union/intersection cardinalities WITHOUT rescanning — "
        "sketches merge; only the two distinct-key scans touch the "
        "fact. Exact union/intersection ride along so the estimation "
        "error itself is oracle-pinned (same discipline as "
        "sketch_kmv_distinct). All estimates are single double "
        "divisions of exact integers. An UNDER-FULL merged sketch "
        "(m < k) saw every distinct key, so the estimates collapse to "
        "the exact counts: est_union = m, est_intersection = matches, "
        "jaccard = matches/m — the standard KMV small-set rule."
    ),
    tags=("sketch", "set-ops"),
)
def sketch_kmv_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    # BIGINT packing injective for any TPC-H SF (suppkey < 1e6 up to SF 100)
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey",
        (F.col("l_partkey").cast("long") * 1000000 + F.col("l_suppkey")).alias("k"),
    )
    o = load_table(spark, "orders", sf_dir).select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderdate"
    )
    keys = li.join(o, "l_orderkey").select("k", "o_orderdate")
    h = hash32(F.concat(F.lit("kmv#"), F.col("k").cast("string"))).alias("h")

    def bottom_k(cond) -> DataFrame:
        return (
            keys.filter(cond)
            .select(h)
            .distinct()
            .orderBy("h")
            .limit(KMV_SET_K)
        )

    ska = bottom_k(F.col("o_orderdate") < _SET_A_BEFORE).localCheckpoint()
    skb = bottom_k(F.col("o_orderdate") >= _SET_B_FROM).localCheckpoint()
    merged = (
        ska.unionByName(skb).distinct().orderBy("h").limit(KMV_SET_K).localCheckpoint()
    )
    kth = merged.agg(
        F.max("h").alias("kth_hash"), F.count(F.lit(1)).cast("long").alias("m")
    )
    inter = (
        merged.join(ska, "h", "left_semi")
        .join(skb, "h", "left_semi")
        .agg(F.count(F.lit(1)).cast("long").alias("inter_matches"))
    )
    exact = (
        keys.groupBy("k")
        .agg(F.min("o_orderdate").alias("lo"), F.max("o_orderdate").alias("hi"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("exact_union"),
            F.sum(
                (
                    (F.col("lo") < _SET_A_BEFORE) & (F.col("hi") >= _SET_B_FROM)
                ).cast("long")
            ).alias("exact_intersection"),
        )
    )
    return (
        kth.crossJoin(inter)
        .crossJoin(exact)
        .select(
            F.lit(KMV_SET_K).cast("long").alias("k"),
            "m",
            "kth_hash",
            kmv_est_union(KMV_SET_K).alias("est_union"),
            "exact_union",
            "inter_matches",
            kmv_est_intersection(KMV_SET_K).alias("est_intersection"),
            "exact_intersection",
            kmv_jaccard().alias("jaccard_est"),
        )
    )


def kmv_est_union(k: int) -> F.Column:
    """Union-cardinality estimate from a merged bottom-k sketch state
    ``(m, kth_hash)``: the standard (k−1)·2³²/h_k estimator when the
    sketch is full, and the EXACT count m when under-full (m < k means
    the sketch holds every distinct key it ever saw)."""
    scale = (k - 1) * 4294967296
    return F.when(F.col("m") < k, F.col("m").cast("double")).otherwise(
        F.lit(scale).cast("double") / F.col("kth_hash")
    )


def kmv_est_intersection(k: int) -> F.Column:
    """Intersection estimate via the matching-bottom-k rule over state
    ``(m, kth_hash, inter_matches)``: matches·est_union/k when full
    (= jaccard·est_union), and exactly ``inter_matches`` when the merged
    sketch is under-full."""
    scale = (k - 1) * 4294967296
    return F.when(
        F.col("m") < k, F.col("inter_matches").cast("double")
    ).otherwise(
        (F.col("inter_matches") * scale).cast("double")
        / (k * F.col("kth_hash"))
    )


def kmv_jaccard() -> F.Column:
    """Jaccard estimate = inter_matches / m (m = k when full, so this is
    the one expression that covers both regimes). Two empty sketches
    (m = 0) estimate 0.0, not NULL — J(∅, ∅) is defined as 0 here so
    downstream thresholds never see a silent NULL."""
    return F.when(F.col("m") == 0, F.lit(0.0)).otherwise(
        F.col("inter_matches").cast("double") / F.col("m")
    )
