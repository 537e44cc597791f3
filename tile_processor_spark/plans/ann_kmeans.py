"""Deterministic k-means trainer for the IVF coarse quantizer.

``ann_ivf_assign`` / ``ann_ivf_search`` route against centroids derived
from the pre-existing ``label`` column; this module makes the IVF path
self-contained by TRAINING the list structure with Lloyd iterations —
the same exactness discipline as the rest of the ANN family:

- centroid state is the pair (integer sum vector, count) — never a
  divided mean — so every iteration's algebra is exact BIGINT;
- squared distance to a centroid expands to
  ``(n²·|q|² − 2n·(q·s) + |s|²) / n²`` with a single double division,
  identical to ``ann_ivf_assign``'s formula (llm_ops.py), so the
  trained assignment plugs straight into the bucketed search;
- initialization is the k vectors with smallest vec_id (a fixed,
  engine-independent choice), iteration count is fixed, ties break on
  centroid id: the whole fit is a pure function of the input.

Not SQL-oracle-checkable (the iteration is the point), so the registry
entry is rows-only for the driver; the LOCAL pin is stronger: a NumPy
mirror recomputes the identical integer/double algebra driver-side and
``tests/test_ann_kmeans.py`` asserts bit-equal assignments.

Scale shape (100 TB): per iteration, the corpus is scanned once, the
k×(d+2) centroid state broadcasts, and the only shuffle is the
(c_id, dim)-keyed partial-aggregated centroid update — no per-vector
state crosses the network. ``localCheckpoint`` bounds lineage across
iterations. Integer headroom: the d2 numerator is computed in
DECIMAL(38,0) on the Spark side and HUGEINT (int128) in the DuckDB
oracle — n²·|q|² for a 2^20-quantized 64-dim vector is ~2^46·n², so
int64 would wrap (Spark) or raise (DuckDB) already at n≈360 members;
decimal-128 holds to n≈2^40 — beyond any real list size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from tile_processor_spark.plans.llm_ops import dot_col, quantized_col
from tile_processor_spark.plans.registry import register
from tile_processor_spark.sources.tables import load_table

K_CLUSTERS = 8
KMEANS_ITERS = 3


def _assign_nearest(e: DataFrame, centroids: DataFrame) -> DataFrame:
    """(vec_id, q, c_id): each vector's nearest centroid under the exact
    rational distance, ties to the smallest centroid id."""
    scored = (
        e.withColumn("q2", dot_col(F.col("q"), F.col("q")))
        .crossJoin(F.broadcast(centroids))
        .withColumn("qs", dot_col(F.col("q"), F.col("sv")))
        .withColumn(
            # Numerator in DECIMAL(38,0): n²·|q|² reaches ~2^86 for a
            # million-vector cluster of 2^20-quantized 64-dim embeddings —
            # far past int64 (which would silently wrap) but comfortably
            # inside decimal-128. The oracle mirrors with HUGEINT.
            "d2",
            (
                F.col("n").cast("decimal(38,0)") * F.col("n") * F.col("q2")
                - 2 * F.col("n").cast("decimal(38,0)") * F.col("qs")
                + F.col("s2")
            ).cast("double")
            / (F.col("n").cast("double") * F.col("n")),
        )
    )
    w = W.partitionBy("vec_id").orderBy("d2", "c_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "q", "c_id")
    )


def _centroid_state(assigned: DataFrame) -> DataFrame:
    """(c_id, sv, s2, n) from an assignment — integer sums only. Empty
    clusters simply vanish (no member rows → no group)."""
    dims = assigned.select("c_id", F.posexplode(F.col("q")).alias("i", "qv"))
    cent = (
        dims.groupBy("c_id", "i")
        .agg(F.sum("qv").alias("s"))
        .groupBy("c_id")
        .agg(
            F.sort_array(F.collect_list(F.struct("i", "s"))).alias("pairs"),
            F.sum(F.col("s") * F.col("s")).alias("s2"),
        )
        .select("c_id", F.col("pairs.s").alias("sv"), "s2")
    )
    cn = assigned.groupBy("c_id").agg(F.count(F.lit(1)).alias("n"))
    return cent.join(cn, "c_id")


def kmeans_fit(e: DataFrame, k: int = K_CLUSTERS, iters: int = KMEANS_ITERS) -> DataFrame:
    """Lloyd on quantized vectors; ``e`` must carry (vec_id, q).
    Returns the final assignment (vec_id, c_id)."""
    seeds = (
        e.orderBy("vec_id")
        .limit(k)
        .select(
            F.col("vec_id").alias("c_id"),
            F.col("q").alias("sv"),
            dot_col(F.col("q"), F.col("q")).alias("s2"),
            F.lit(1).cast("long").alias("n"),
        )
    )
    centroids = seeds.localCheckpoint()
    for _ in range(iters):
        assigned = _assign_nearest(e, centroids)
        centroids = _centroid_state(assigned).localCheckpoint()
    return _assign_nearest(e, centroids).select("vec_id", F.col("c_id").alias("assigned"))


def _assign_sql(cent: str, cnt: str) -> str:
    """One Lloyd assignment step in DuckDB SQL against centroid-state CTEs
    ``cent(c_id, i, s)`` and ``cnt(c_id, n)`` — the same exact algebra as
    ``_assign_nearest``: d2 = (n²·|q|² − 2n·(q·s) + |s|²) / n² with a
    single double division, ties to the smallest c_id."""
    return f"""
    SELECT vec_id, c_id FROM (
      SELECT q2.vec_id, sc.c_id,
             ROW_NUMBER() OVER (PARTITION BY q2.vec_id
               ORDER BY CAST(CAST(nk.n AS HUGEINT)*nk.n*q2.q2
                             - 2*CAST(nk.n AS HUGEINT)*sc.qs + s2.s2 AS DOUBLE)
                        / (CAST(nk.n AS DOUBLE)*nk.n), sc.c_id) AS rn
      FROM q2
      JOIN (SELECT qd.vec_id, c.c_id, SUM(qd.qv * c.s) AS qs
            FROM qd JOIN {cent} c ON qd.i = c.i GROUP BY qd.vec_id, c.c_id) sc
        ON q2.vec_id = sc.vec_id
      JOIN (SELECT c_id, SUM(s*s) AS s2 FROM {cent} GROUP BY c_id) s2
        ON sc.c_id = s2.c_id
      JOIN {cnt} nk ON sc.c_id = nk.c_id
    ) WHERE rn = 1
    """


def _kmeans_oracle(iters: int = KMEANS_ITERS, k: int = K_CLUSTERS) -> str:
    """The full fixed-iteration Lloyd fit unrolled as chained CTEs — the
    iteration count is a compile-time constant, so 'iterative' does not
    mean 'not SQL-expressible'."""
    from tile_processor_spark.plans.llm_ops import SQL_QUANT

    ctes = [
        "qd AS (SELECT vec_id, i, "
        + SQL_QUANT.format(i="i")
        + " AS qv FROM embeddings, range(1, 65) r(i))",
        "q2 AS (SELECT vec_id, SUM(qv*qv) AS q2 FROM qd GROUP BY vec_id)",
        f"seeds AS (SELECT vec_id AS c_id FROM embeddings ORDER BY vec_id LIMIT {k})",
        "c0 AS (SELECT s.c_id, qd.i, qd.qv AS s FROM seeds s JOIN qd ON qd.vec_id = s.c_id)",
        "n0 AS (SELECT c_id, CAST(1 AS BIGINT) AS n FROM seeds)",
    ]
    for it in range(1, iters + 1):
        ctes.append(f"a{it} AS ({_assign_sql(f'c{it - 1}', f'n{it - 1}')})")
        ctes.append(
            f"c{it} AS (SELECT a.c_id, qd.i, SUM(qd.qv) AS s "
            f"FROM a{it} a JOIN qd USING (vec_id) GROUP BY a.c_id, qd.i)"
        )
        ctes.append(f"n{it} AS (SELECT c_id, COUNT(*) AS n FROM a{it} GROUP BY c_id)")
    final = _assign_sql(f"c{iters}", f"n{iters}")
    return (
        "WITH " + ",\n".join(ctes) + f" SELECT vec_id, c_id AS assigned FROM ({final})"
    )


@register(
    "ann_kmeans_fit",
    oracle=_kmeans_oracle(),
    doc=(
        "Train the IVF list structure: k=8 Lloyd iterations (3 fixed "
        "rounds) over 2^20-quantized vectors with exact integer centroid "
        "state; deterministic init (k smallest vec_ids) and tie-breaks. "
        "The DuckDB oracle unrolls the same fixed iteration count as "
        "chained CTEs (identical integer algebra, one double division), "
        "and tests/test_ann_kmeans.py additionally recomputes the "
        "algebra in NumPy and asserts bit-equal assignments."
    ),
    tags=("llm", "similarity", "ivf"),
)
def ann_kmeans_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, "embeddings", sf_dir).select(
        "vec_id", quantized_col(F.col("embedding")).alias("q")
    )
    return kmeans_fit(e)
