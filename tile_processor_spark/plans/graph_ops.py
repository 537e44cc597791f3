"""Graph analytics over relational-derived graphs — fixed-point exact
algebra so every result is oracle-checkable (the same discipline as the
k-means trainer: iterative ≠ non-verifiable when the iteration count is
fixed and the arithmetic is integral).

Graph: the part–supplier bipartite graph derived from ``lineitem``
(distinct (l_partkey, l_suppkey) pairs; nodes namespaced ``p<k>`` /
``s<k>``), and the part co-occurrence graph (parts appearing in the
same order). Both are the shapes a dedup/curation pipeline produces
(doc–cluster membership, candidate-pair graphs), re-derivable from the
gate tables.

``dedup_connected_components(_star)`` already covers component finding;
this module adds centrality (PageRank) and local clustering evidence
(triangle counting).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tile_processor_spark.plans.registry import register
from tile_processor_spark.sources.tables import load_table

PR_SCALE = 1_000_000  # fixed-point: 1.0 == 1e6
PR_ITERS = 3
PR_DAMP_NUM, PR_DAMP_DEN = 85, 100  # d = 0.85 as an exact rational


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed bipartite edges part → supplier, distinct."""
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.select(
            F.concat(F.lit("p"), F.col("l_partkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
        .distinct()
    )


def _pagerank_fixedpoint(edges: DataFrame, iters: int = PR_ITERS) -> DataFrame:
    """Fixed-point PageRank: ranks are BIGINT micro-units; each step is

        pr'(v) = (1-d)·SCALE + d · Σ_{u→v} pr(u) div outdeg(u)

    with integer division (``div``) — every engine computes the identical
    integers, so a fixed iteration count is exactly reproducible. Dangling
    redistribution is deliberately omitted (suppliers absorb mass), which
    is fine for a *ranking* and keeps the recurrence local: one shuffle
    per iteration, partial-aggregated, broadcast-free.
    """
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # Edges with the sender's outdegree attached — static across
    # iterations, so materialize once (localCheckpoint: reclaimable).
    e = edges.join(outdeg, "src").localCheckpoint()
    base = (PR_DAMP_DEN - PR_DAMP_NUM) * PR_SCALE  # (1-d)·SCALE, ×DEN
    pr = nodes.withColumn("pr", F.lit(PR_SCALE).cast("long"))
    for _ in range(iters):
        contrib = (
            e.join(pr, e.src == pr.node)
            .select(
                F.col("dst").alias("node"),
                F.expr("pr div outdeg").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
        )
        pr = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                F.expr(
                    f"(({base} + {PR_DAMP_NUM} * coalesce(inflow, 0)) "
                    f"div {PR_DAMP_DEN})"
                )
                .cast("long")
                .alias("pr"),
            )
            .localCheckpoint()
        )
    return pr


def _pagerank_oracle(iters: int = PR_ITERS) -> str:
    base = (PR_DAMP_DEN - PR_DAMP_NUM) * PR_SCALE
    ctes = [
        "e AS (SELECT DISTINCT 'p' || CAST(l_partkey AS VARCHAR) AS src, "
        "'s' || CAST(l_suppkey AS VARCHAR) AS dst FROM lineitem)",
        "nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        "outdeg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS outdeg FROM e GROUP BY src)",
        f"pr0 AS (SELECT node, CAST({PR_SCALE} AS BIGINT) AS pr FROM nodes)",
    ]
    for it in range(1, iters + 1):
        p = f"pr{it - 1}"
        ctes.append(
            f"c{it} AS (SELECT e.dst AS node, SUM({p}.pr // o.outdeg) AS inflow "
            f"FROM e JOIN {p} ON e.src = {p}.node JOIN outdeg o ON e.src = o.src "
            f"GROUP BY e.dst)"
        )
        ctes.append(
            f"pr{it} AS (SELECT n.node, CAST(({base} + {PR_DAMP_NUM} * "
            f"COALESCE(c.inflow, 0)) // {PR_DAMP_DEN} AS BIGINT) AS pr "
            f"FROM nodes n LEFT JOIN c{it} c ON n.node = c.node)"
        )
    return "WITH " + ",\n".join(ctes) + f" SELECT node, pr FROM pr{iters}"


@register(
    "graph_pagerank_fixedpoint",
    oracle=_pagerank_oracle(),
    doc=(
        "Fixed-point PageRank (3 iterations, d = 85/100 exact rational, "
        "BIGINT micro-unit ranks, integer division) over the part→"
        "supplier bipartite graph — iterative graph centrality with a "
        "fully unrolled SQL oracle, the k-means discipline applied to "
        "graphs. Per iteration: one equi-join pr⋈edges (partial-"
        "aggregated inflow) + one left join back to nodes; lineage cut "
        "by localCheckpoint. At 100 TB this is vertex-cut territory — "
        "the join stays keyed on src/node, so pre-bucketing both frames "
        "on the node key removes the per-iteration shuffle."
    ),
    tags=("graph", "iterative"),
)
def graph_pagerank_fixedpoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _pagerank_fixedpoint(_edges(spark, sf_dir))


@register(
    "graph_triangle_count",
    oracle="""
    WITH pairs AS (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM pairs) AS n_edges
    FROM pairs e1
    JOIN pairs e2 ON e1.v = e2.u
    JOIN pairs e3 ON e1.u = e3.u AND e2.v = e3.v
    """,
    doc=(
        "Triangle counting on the part co-purchase graph (parts sharing "
        "an order; edges deduped and oriented u < v so each triangle "
        "counts exactly once). The two-hop join + closing-edge check is "
        "the standard distributed formulation; orienting edges by id is "
        "the degree-splitting trick that bounds the join fan-out. Local "
        "clustering evidence for curation graphs (a near-dup candidate "
        "graph with many triangles indicates template families)."
    ),
    tags=("graph", "join", "agg"),
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("u"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("v"))
    pairs = (
        a.join(b, "ok")
        .filter(F.col("u") < F.col("v"))
        .select("u", "v")
        .distinct()
        .localCheckpoint()  # feeds three join aliases + the edge count
    )
    e1 = pairs.select(F.col("u").alias("x"), F.col("v").alias("y"))
    e2 = pairs.select(F.col("u").alias("y"), F.col("v").alias("z"))
    e3 = pairs.select(F.col("u").alias("x"), F.col("v").alias("z"))
    tri = e1.join(e2, "y").join(e3, ["x", "z"]).agg(
        F.count(F.lit(1)).alias("n_triangles")
    )
    edges = pairs.agg(F.count(F.lit(1)).alias("n_edges"))
    return tri.crossJoin(edges)


BFS_ROUNDS = 4


def _bfs_oracle(rounds: int = BFS_ROUNDS) -> str:
    ctes = [
        "pairs AS (SELECT DISTINCT 'p' || CAST(l_partkey AS VARCHAR) AS src, "
        "'s' || CAST(l_suppkey AS VARCHAR) AS dst FROM lineitem)",
        "e AS (SELECT src, dst FROM pairs UNION ALL SELECT dst, src FROM pairs)",
        "d0 AS (SELECT MIN(src) AS node, CAST(0 AS INTEGER) AS hops FROM e)",
    ]
    for it in range(1, rounds + 1):
        p = f"d{it - 1}"
        ctes.append(
            f"d{it} AS (SELECT node, CAST(MIN(hops) AS INTEGER) AS hops FROM ("
            f"SELECT node, hops FROM {p} "
            f"UNION ALL "
            f"SELECT e.dst AS node, {p}.hops + 1 AS hops "
            f"FROM {p} JOIN e ON e.src = {p}.node) GROUP BY node)"
        )
    return "WITH " + ",\n".join(ctes) + f" SELECT node, hops FROM d{rounds}"


@register(
    "graph_bfs_hops",
    oracle=_bfs_oracle(),
    doc=(
        "Single-source BFS (4 fixed rounds) over the undirected part–"
        "supplier graph from the deterministic source node MIN(node): "
        "per round, relax distances through one equi-join + min-"
        "aggregate — the Pregel shortest-path kernel as DataFrame "
        "algebra, exact integers throughout, oracle fully unrolled. "
        "Each round re-relaxes the full distance frame (simple, "
        "idempotent); at 100 TB restrict the join's left side to the "
        "newly-improved frontier — same results, frontier-sized "
        "shuffles. Bipartite diameter is even, so 4 rounds reach every "
        "part within two supplier hops."
    ),
    tags=("graph", "iterative"),
)
def graph_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = _edges(spark, sf_dir)
    e = (
        pairs.unionByName(
            pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .localCheckpoint()
    )
    dist = e.agg(F.min("src").alias("node")).select(
        "node", F.lit(0).cast("int").alias("hops")
    )
    for _ in range(BFS_ROUNDS):
        relaxed = (
            dist.join(e, dist.node == e.src)
            .select(F.col("dst").alias("node"), (F.col("hops") + 1).alias("hops"))
        )
        dist = (
            dist.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("hops").cast("int").alias("hops"))
            .localCheckpoint()
        )
    return dist
