"""Semantic-dedup and corpus-model operators that COMPOSE the engine's
existing primitives into the pipelines a training-data curation run
actually ships:

- ``dedup_semantic_clusters``: embedding-LSH candidate pairs -> exact
  cosine verify -> connected components -> canonical flag. The
  embedding-space analogue of ``dedup_connected_components`` (which
  clusters on MinHash/Jaccard text similarity).
- ``text_bigram_model_score``: the corpus as its own bigram language
  model; per-doc mean scaled conditional frequency — the
  "perplexity-filter" shape (CCNet / Gopher quality filtering) with
  exact integer arithmetic instead of float log-probs so the score is
  oracle-pinned bit-for-bit.
- ``embedding_whiten``: per-dimension standardization (z-score) of the
  embedding column from exact integer moments — the preprocessing step
  ANN indexes and linear probes want applied once at ingest.

Reference parity note: the reference engine (tile-processor) has no
embedding/text operators — this module is part of the
training-data-pipeline surface the brief adds on top of reference
parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tile_processor_spark.plans import llm_ops  # registers embedding_near_dup_pairs
from tile_processor_spark.plans.cc_star import connected_components_star
from tile_processor_spark.plans.llm_ops import (
    AUDIT_SAMPLE_PCT,
    SQL_AUDIT_SLICE,
    SQL_QUANT,
    SQL_TOKENS,
    quantized_col,
    tokens_col,
)
from tile_processor_spark.plans.registry import REGISTRY, register
from tile_processor_spark.sources.tables import load_table

# The near-dup pair oracle is the single source of truth for the edge
# set; embedding it as a subquery keeps cluster oracle and pair oracle
# from drifting apart.
_EMB_PAIRS_ORACLE = REGISTRY["embedding_near_dup_pairs"].oracle


@register(
    "dedup_semantic_clusters",
    oracle=f"""
    WITH RECURSIVE pairs AS (
      SELECT v1, v2 FROM ({_EMB_PAIRS_ORACLE})
    ),
    edges AS (
      SELECT v1 AS s, v2 AS t FROM pairs
      UNION ALL
      SELECT v2 AS s, v1 AS t FROM pairs
    ),
    reach(id, lbl) AS (
      SELECT vec_id, vec_id FROM embeddings
      UNION
      SELECT e.s, r.lbl FROM edges e JOIN reach r ON r.id = e.t
    ),
    comp AS (SELECT id AS vec_id, MIN(lbl) AS cluster_id FROM reach GROUP BY id),
    sizes AS (
      SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
      FROM comp GROUP BY cluster_id
    )
    SELECT c.vec_id, c.cluster_id, s.cluster_size,
           CAST(CASE WHEN c.vec_id = c.cluster_id THEN 1 ELSE 0 END AS INTEGER)
             AS is_canonical
    FROM comp c JOIN sizes s USING (cluster_id)
    """,
    doc=(
        "Semantic (embedding-space) dedup clustering: LSH-banded "
        "candidate pairs verified by exact quantized-integer cosine "
        ">= 0.4 (embedding_near_dup_pairs) -> alternating large-/"
        "small-star connected components (O(log^2 n) rounds, "
        "cc_star.py) -> min-id canonical per cluster. This is the "
        "SemDeDup-style pipeline: near-dup PAIRS alone don't dedup; "
        "the keep/drop decision needs the transitive closure. Scale "
        "shape: the edge frame is O(near-dups) not O(corpus^2); every "
        "CC round is one symmetrize + groupBy(min) + equi-join. "
        "Oracle: recursive-CTE closure over the SAME pair subquery."
    ),
    tags=("llm", "dedup", "embedding"),
)
def dedup_semantic_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    vecs = load_table(spark, "embeddings", sf_dir).select("vec_id")
    pairs = llm_ops.embedding_near_dup_pairs(spark, sf_dir).select(
        F.col("v1").alias("a"), F.col("v2").alias("b")
    )
    comp = connected_components_star(pairs).withColumnRenamed("node", "vec_id")
    # Isolated vectors are their own cluster.
    labels = (
        vecs.join(comp, "vec_id", "left")
        .select(
            "vec_id", F.coalesce(F.col("component"), F.col("vec_id")).alias("cluster_id")
        )
    )
    sizes = labels.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("cluster_size"))
    return labels.join(sizes, "cluster_id").select(
        "vec_id",
        "cluster_id",
        "cluster_size",
        (F.col("vec_id") == F.col("cluster_id")).cast("int").alias("is_canonical"),
    )


BIGRAM_SCALE = 1_000_000  # conditional frequency quantum: floor(1e6 * c2 / c1)


@register(
    "text_bigram_model_score",
    oracle=f"""
    WITH t AS (SELECT doc_id, {SQL_TOKENS} AS w FROM documents),
    bigrams AS (
      -- zipped unnest: DuckDB aligns multiple unnests positionally
      SELECT doc_id, unnest(w[1:len(w)-1]) AS w1, unnest(w[2:len(w)]) AS w2
      FROM t
    ),
    model AS (
      SELECT w1, w2, COUNT(*) AS c2 FROM bigrams GROUP BY w1, w2
    ),
    heads AS (
      SELECT w1, SUM(c2) AS c1 FROM model GROUP BY w1
    ),
    scored AS (
      SELECT b.doc_id,
             {BIGRAM_SCALE} * m.c2 // h.c1 AS p_scaled
      FROM bigrams b
      JOIN model m USING (w1, w2)
      JOIN heads h USING (w1)
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(p_scaled) AS BIGINT) AS sum_p,
           CAST(MIN(p_scaled) AS BIGINT) AS min_p,
           CAST(SUM(p_scaled) AS DOUBLE) / COUNT(*) AS mean_p
    FROM scored GROUP BY doc_id
    """,
    doc=(
        "Corpus-as-its-own-language-model quality score (the "
        "perplexity-filter shape from CCNet/Gopher data curation): "
        "build the corpus bigram table, then score every document by "
        "the scaled conditional frequency floor(1e6 * c(w1,w2) / "
        "c(w1)) of each of its bigrams — mean high = predictable "
        "text, mean low = unusual/garbled. Integer floor-division "
        "replaces float log-prob so per-doc sums are exact BIGINTs "
        "and the score is oracle-pinned (log is monotone; the "
        "filter's ORDERING is identical). Scale shape: two passes "
        "over the bigram stream (model aggregate, then score join); "
        "the model is vocabulary-bounded and the join is an "
        "equi-join on (w1, w2) — no window, no cross join."
    ),
    tags=("llm", "text"),
)
def text_bigram_model_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, "documents", sf_dir)
    w = tokens_col(F.col("text"))
    grams = F.when(
        F.size(w) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - 1),
            lambda i: F.struct(
                F.element_at(w, i).alias("w1"), F.element_at(w, i + 1).alias("w2")
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    bigrams = d.select("doc_id", F.explode(grams).alias("g")).select(
        "doc_id", F.col("g.w1").alias("w1"), F.col("g.w2").alias("w2")
    )
    model = bigrams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    heads = model.groupBy("w1").agg(F.sum("c2").alias("c1"))
    scored = (
        bigrams.join(model, ["w1", "w2"])
        .join(heads, "w1")
        .select(
            "doc_id",
            F.floor(F.lit(BIGRAM_SCALE) * F.col("c2") / F.col("c1")).alias("p_scaled"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.sum("p_scaled").cast("long").alias("sum_p"),
        F.min("p_scaled").cast("long").alias("min_p"),
        (F.sum("p_scaled").cast("double") / F.count(F.lit(1))).alias("mean_p"),
    )


@register(
    "embedding_whiten",
    oracle=f"""
    WITH qd AS (
      SELECT vec_id, i, {SQL_QUANT.format(i="i")} AS qv
      FROM embeddings, range(1, 65) r(i)
    ),
    stats AS (
      SELECT i,
             CAST(COUNT(*) AS DECIMAL(38,0)) AS n,
             CAST(SUM(qv) AS DECIMAL(38,0)) AS s,
             CAST(SUM(qv * qv) AS DECIMAL(38,0)) AS ss
      FROM qd GROUP BY i
    ),
    var AS (
      SELECT i, n, s, n * ss - s * s AS var_num FROM stats
    )
    SELECT q.vec_id, q.i,
           CAST(CAST(v.n * q.qv - v.s AS DOUBLE)
                / sqrt(CAST(v.var_num AS DOUBLE)) AS DOUBLE) AS z
    FROM qd q JOIN var v USING (i)
    WHERE v.var_num > 0
    """,
    doc=(
        "Per-dimension whitening (z-score standardization) of the "
        "embedding column: z = (n*q - sum) / sqrt(n*sumsq - sum^2), "
        "the algebraic identity that keeps every intermediate an "
        "EXACT integer (DECIMAL(38,0) accumulators — int64 would "
        "overflow n*sumsq at ~10^5 vectors, the k-means oracle "
        "lesson) so the one cast-to-double + sqrt + division per "
        "value is bit-identical in both engines regardless of "
        "aggregation order. Scale shape: the stats side is 64 rows "
        "(one per dimension, full map-side combine); it broadcasts "
        "back onto the posexploded stream — two scans, zero wide "
        "shuffles, output repartitionable by vec_id for free."
    ),
    tags=("llm", "embedding"),
)
def embedding_whiten(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, "embeddings", sf_dir)
    qd = e.select(
        "vec_id",
        F.posexplode(quantized_col(F.col("embedding"))).alias("pos", "qv"),
    ).select("vec_id", (F.col("pos") + 1).alias("i"), "qv")
    stats = qd.groupBy("i").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("qv").cast("decimal(38,0)").alias("s"),
        F.sum(F.col("qv") * F.col("qv")).cast("decimal(38,0)").alias("ss"),
    )
    var = stats.select(
        "i", "n", "s", (F.col("n") * F.col("ss") - F.col("s") * F.col("s")).alias("var_num")
    )
    return (
        qd.join(F.broadcast(var.filter(F.col("var_num") > 0)), "i")
        .select(
            "vec_id",
            "i",
            (
                (F.col("n") * F.col("qv") - F.col("s")).cast("double")
                / F.sqrt(F.col("var_num").cast("double"))
            ).alias("z"),
        )
    )


CONTAINMENT_THRESHOLD = 0.6


@register(
    "dedup_containment_pairs",
    oracle=f"""
    WITH words AS (
      SELECT doc_id, {SQL_TOKENS} AS w FROM documents
    ),
    sh AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, len(w) - 1),
               i -> CAST('0x' || substr(md5(w[i] || ' ' || w[i+1] || ' ' || w[i+2]), 1, 8) AS BIGINT)))
               AS hs
      FROM words
    ),
    toks AS (SELECT doc_id, unnest(hs) AS h FROM sh),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM toks GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS c
      FROM toks a JOIN toks b ON a.h = b.h AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT d1, d2, c AS n_common,
           CAST(c AS DOUBLE) / LEAST(s1.n, s2.n) AS containment,
           CAST(c AS DOUBLE) / (s1.n + s2.n - c) AS jaccard
    FROM inter
    JOIN sizes s1 ON d1 = s1.doc_id JOIN sizes s2 ON d2 = s2.doc_id
    WHERE CAST(c AS DOUBLE) / LEAST(s1.n, s2.n) >= {CONTAINMENT_THRESHOLD}
    """,
    doc=(
        "Asymmetric containment dedup: C = |S(A) inter S(B)| / "
        "min(|S(A)|, |S(B)|) over the SAME distinct 3-gram shingle "
        "hashes as dedup_ngram_jaccard — catches a short document "
        "EMBEDDED in a long one (quotation, boilerplate wrapping, "
        "concatenated crawls), which symmetric Jaccard structurally "
        "misses: a 100-shingle doc inside a 10000-shingle doc has "
        "J ~ 0.01 but C = 1.0. Same narrow hash-keyed self-equi-join "
        "shape (and the same scale caveat: a document-frequency prefix "
        "cap bounds the join at 100 TB). Jaccard is carried alongside "
        "so the quotation case (high C, low J) is visible in the frame."
    ),
    tags=("llm", "dedup", "text"),
)
def dedup_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tile_processor_spark.plans.llm_ops import shingle_pair_stats, shingle_tokens

    d = load_table(spark, "documents", sf_dir)
    d = d.repartition(spark.sparkContext.defaultParallelism, "doc_id")
    # checkpoint: 6 reads of the shingle-UDF output in one plan otherwise
    toks, sizes = shingle_tokens(d, checkpoint=True)
    return (
        shingle_pair_stats(toks, sizes)
        .withColumn(
            "containment",
            F.col("n_common").cast("double") / F.least(F.col("n1"), F.col("n2")),
        )
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("n1") + F.col("n2") - F.col("n_common")),
        )
        .filter(F.col("containment") >= CONTAINMENT_THRESHOLD)
        .select("d1", "d2", "n_common", "containment", "jaccard")
    )


BM25_SCALE = 1_000_000_000  # floor(1e9 * rational) keeps per-term scores exact


@register(
    "text_bm25_scores",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest({SQL_TOKENS}) AS term FROM documents
    ),
    dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM toks GROUP BY doc_id),
    corpus AS (
      SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS sumdl
      FROM toks
    ),
    tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
           FROM toks GROUP BY doc_id, term),
    df AS (SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
           FROM toks GROUP BY term),
    qterms AS (
      SELECT term, df FROM df
      ORDER BY df ASC, term LIMIT 5
    ),
    scored AS (
      SELECT tf.doc_id, tf.term,
             CAST(
               (CAST({BM25_SCALE} AS HUGEINT)
                 * (2*c.n - 2*q.df + 1) * 22 * tf.tf * c.sumdl)
               // (CAST(2*q.df + 1 AS HUGEINT)
                 * (10 * tf.tf * c.sumdl + 3 * c.sumdl + 9 * dl.dl * c.n))
               AS BIGINT) AS p
      FROM tf JOIN qterms q USING (term)
      JOIN dl USING (doc_id) CROSS JOIN corpus c
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_query_terms_hit,
           CAST(SUM(p) AS BIGINT) AS bm25_scaled,
           CAST(SUM(p) AS DOUBLE) / {BM25_SCALE} AS bm25
    FROM scored GROUP BY doc_id
    """,
    doc=(
        "BM25 ranking (k1 = 1.2, b = 0.75) for a deterministic "
        "5-term query (the five rarest terms: lowest df, highest idf), "
        "with the "
        "log-free Robertson idf (2N-2df+1)/(2df+1) — the same "
        "monotone-transform trade as text_top_terms, because ln's "
        "last-ulp differs between JVM and C libm. Clearing "
        "denominators makes each per-term score an exact integer "
        "ratio (x22/x10 absorbs k1+1 = 2.2 and the 0.3 + 0.9*dl/avgdl "
        "saturation), quantized by 128-bit floor-division "
        "(decimal div / HUGEINT //) BEFORE the per-doc sum — so the "
        "sum is exact and shuffle-order-free where a float sum of "
        "term scores would not be. Shape: the classic two-pass IR "
        "scorer — corpus stats (2 scalars + df table) broadcast back "
        "onto the tf stream; one groupBy per doc."
    ),
    tags=("llm", "text", "headline"),
)
def text_bm25_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, "documents", sf_dir)
    toks = d.select("doc_id", F.explode(tokens_col(F.col("text"))).alias("term"))
    # The checkpoint moves UP one level, from the raw token stream to
    # the (doc_id, term) aggregate (guide §2.3 "aggregate before you
    # shuffle"): the map-side partial count collapses fully inside the
    # tokenize stage (a doc's tokens live in one input split), so the
    # materialized frame is |tf| rows instead of every token, and every
    # downstream statistic derives from it — dl = Σ tf per doc,
    # df(term) = tf row count per term, n = |dl|, sumdl = Σ dl — the
    # same exact integer counts the four raw-stream aggregations
    # produced, without re-scanning tokens per branch (plan: 6 shuffle
    # Exchanges → 4; round-17 same-JVM interleave of four equivalent
    # formulations measured this one fastest, 0.74 vs 0.84 s; the
    # grouping-sets single-shuffle variant measured SLOWER, 1.02 s —
    # the Expand doubles the partial-aggregate input; recorded so it is
    # not re-attempted).
    tf = (
        toks.groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
        .localCheckpoint()
    )
    dl = tf.groupBy("doc_id").agg(F.sum("tf").cast("long").alias("dl"))
    corpus = dl.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("dl").cast("long").alias("sumdl"),
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    qterms = df.orderBy("df", "term").limit(5).select("term", "df")
    dec = "decimal(38,0)"
    # qterms are the 5 RAREST terms (ascending df), so the tf rows that
    # survive the qterm join are df-bound by construction — the hit
    # set, not the per-doc dl table, is what broadcasts; dl stays the
    # streaming side (the previous shape shuffle-joined the full tf
    # against dl doc-wise).
    hits = tf.join(F.broadcast(qterms), "term")
    scored = (
        dl.join(F.broadcast(hits), "doc_id")
        .crossJoin(F.broadcast(corpus))
        .select(
            "doc_id",
            F.expr(
                f"CAST((CAST({BM25_SCALE} AS {dec})"
                f"  * (2*n - 2*df + 1) * 22 * tf * sumdl)"
                f" div (CAST(2*df + 1 AS {dec})"
                f"  * (10 * tf * sumdl + 3 * sumdl + 9 * dl * n))"
                f" AS BIGINT)"
            ).alias("p"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_query_terms_hit"),
        F.sum("p").cast("long").alias("bm25_scaled"),
        (F.sum("p").cast("double") / BM25_SCALE).alias("bm25"),
    )


SHINGLE_DF_CAP = 3  # prefix filter: join only through shingles in <= 3 docs


def _prefix_filter_oracle(doc_filter: str = "TRUE") -> str:
    return f"""
    WITH words AS (
      SELECT doc_id, {SQL_TOKENS} AS w FROM documents WHERE {doc_filter}
    ),
    sh AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, len(w) - 1),
               i -> CAST('0x' || substr(md5(w[i] || ' ' || w[i+1] || ' ' || w[i+2]), 1, 8) AS BIGINT)))
               AS hs
      FROM words
    ),
    toks AS (SELECT doc_id, unnest(hs) AS h FROM sh),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM toks GROUP BY doc_id),
    shdf AS (SELECT h, COUNT(*) AS df FROM toks GROUP BY h),
    rare AS (SELECT doc_id, h FROM toks JOIN shdf USING (h) WHERE df <= {SHINGLE_DF_CAP}),
    cand AS (
      SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
      FROM rare a JOIN rare b ON a.h = b.h AND a.doc_id < b.doc_id
    ),
    inter AS (
      SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS c
      FROM toks a JOIN toks b ON a.h = b.h AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    truth AS (
      SELECT d1, d2 FROM inter
      JOIN sizes s1 ON d1 = s1.doc_id JOIN sizes s2 ON d2 = s2.doc_id
      WHERE CAST(c AS DOUBLE) / (s1.n + s2.n - c) >= 0.5
    ),
    found AS (SELECT d1, d2 FROM truth SEMI JOIN cand USING (d1, d2))
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM truth) AS n_true,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM cand) AS n_candidates,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM inter) AS n_unfiltered_candidates,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM found) AS n_found,
           CASE WHEN (SELECT COUNT(*) FROM truth) = 0 THEN 1.0
                ELSE CAST((SELECT COUNT(*) FROM found) AS DOUBLE)
                     / (SELECT COUNT(*) FROM truth) END AS recall,
           CAST((SELECT COUNT(*) FROM cand) AS DOUBLE)
             / (SELECT COUNT(*) FROM inter) AS candidate_ratio
    """


@register(
    "dedup_jaccard_prefix_filtered",
    oracle=_prefix_filter_oracle(),
    doc=(
        "The documented 100 TB path for exact-Jaccard dedup, made real "
        "and AUDITED: a document-frequency prefix filter drops shingles "
        "above the df cap before the self-join (per-shingle "
        "fan-out bounded by CAP^2, so the join is linear in corpus "
        "size instead of quadratic through boilerplate shingles), then "
        "candidates verify against FULL shingle sets. The frame pins "
        "recall vs exact truth (J >= 0.5), the candidate count, and "
        "the candidate_ratio vs the unfiltered join — the "
        "cost/recall trade is a deterministic, oracle-checked quantity "
        "exactly like dedup_minhash_recall and ann_ivf_recall."
    ),
    tags=("llm", "dedup"),
)
def dedup_jaccard_prefix_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _prefix_filter_frame(spark, sf_dir, sampled=False)


@register(
    "dedup_jaccard_prefix_filtered_sampled",
    oracle=_prefix_filter_oracle(SQL_AUDIT_SLICE.format(pct=AUDIT_SAMPLE_PCT)),
    doc=(
        "Sampled-slice audit mode of dedup_jaccard_prefix_filtered: the "
        "prefix-filter recall/cost audit on a deterministic audit_slice "
        "of the corpus. The audit's quadratic truth side shrinks by "
        "pct² while recall and candidate_ratio stay exact ON the slice "
        "— the form that stays runnable at sf1+ (docs/SCALE.md §sf1). "
        "Gate-pinned at 50%; production audits run 1-5%."
    ),
    tags=("llm", "dedup", "sampled"),
)
def dedup_jaccard_prefix_filtered_sampled(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return _prefix_filter_frame(spark, sf_dir, sampled=True)


def _prefix_filter_frame(spark: SparkSession, sf_dir: str, sampled: bool) -> DataFrame:
    from tile_processor_spark.plans.llm_ops import (
        audit_slice,
        shingle_pair_stats,
        shingle_tokens,
    )

    d = load_table(spark, "documents", sf_dir)
    if sampled:
        d = audit_slice(d)
    d = d.repartition(spark.sparkContext.defaultParallelism, "doc_id")
    # ONE shingle pass (checkpointed) feeds the df table, the filtered
    # candidate join, the unfiltered pair stats, and the exact truth.
    toks, sizes = shingle_tokens(d, checkpoint=True)
    toks = toks.localCheckpoint()
    shdf = toks.groupBy("h").agg(F.count(F.lit(1)).alias("df"))
    rare = toks.join(shdf.filter(F.col("df") <= SHINGLE_DF_CAP), "h")
    cand = (
        rare.alias("a")
        .join(rare.alias("b"), "h")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .distinct()
        .localCheckpoint()
    )
    stats = shingle_pair_stats(toks, sizes).localCheckpoint()
    truth = stats.filter(
        F.col("n_common").cast("double")
        / (F.col("n1") + F.col("n2") - F.col("n_common"))
        >= 0.5
    ).select("d1", "d2")
    found = truth.join(cand, ["d1", "d2"], "left_semi")
    t = truth.agg(F.count(F.lit(1)).cast("long").alias("n_true"))
    c = cand.agg(F.count(F.lit(1)).cast("long").alias("n_candidates"))
    u = stats.agg(F.count(F.lit(1)).cast("long").alias("n_unfiltered_candidates"))
    g = found.agg(F.count(F.lit(1)).cast("long").alias("n_found"))
    m = t.crossJoin(c).crossJoin(u).crossJoin(g)
    return m.select(
        "n_true",
        "n_candidates",
        "n_unfiltered_candidates",
        "n_found",
        F.when(F.col("n_true") == 0, F.lit(1.0))
        .otherwise(F.col("n_found").cast("double") / F.col("n_true"))
        .alias("recall"),
        (F.col("n_candidates").cast("double") / F.col("n_unfiltered_candidates")).alias(
            "candidate_ratio"
        ),
    )


DEDUP_CURVE_THRESHOLDS = (50, 60, 70, 80, 90)  # percent


@register(
    "dedup_threshold_curve",
    oracle=f"""
    WITH words AS (
      SELECT doc_id, {SQL_TOKENS} AS w FROM documents
    ),
    sh AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, len(w) - 1),
               i -> CAST('0x' || substr(md5(w[i] || ' ' || w[i+1] || ' ' || w[i+2]), 1, 8) AS BIGINT)))
               AS hs
      FROM words
    ),
    toks AS (SELECT doc_id, unnest(hs) AS h FROM sh),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM toks GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS c
      FROM toks a JOIN toks b ON a.h = b.h AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT c, s1.n + s2.n - c AS un FROM inter
      JOIN sizes s1 ON d1 = s1.doc_id JOIN sizes s2 ON d2 = s2.doc_id
    )
    SELECT t.t AS threshold_pct,
           CAST(SUM(CASE WHEN p.c * 100 >= t.t * p.un THEN 1 ELSE 0 END)
                AS BIGINT) AS n_pairs
    FROM (VALUES {", ".join(f"({t})" for t in DEDUP_CURVE_THRESHOLDS)}) t(t)
    CROSS JOIN pairs p
    GROUP BY t.t
    """,
    doc=(
        "Dedup threshold-sensitivity curve: near-dup pair counts at "
        "Jaccard >= 0.5/0.6/0.7/0.8/0.9 from ONE pass over the pair "
        "stats (threshold tests as exact integer cross-multiplications "
        "c*100 >= t*union, no float Jaccard at the boundary) — the "
        "tuning table that tells you what a threshold change would "
        "delete BEFORE you rerun the pipeline. Shares the "
        "shingle_pair_stats pipeline; thresholds ride along as a tiny "
        "exploded dimension, so five curves cost one self-join."
    ),
    tags=("llm", "dedup"),
)
def dedup_threshold_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tile_processor_spark.plans.llm_ops import shingle_pair_stats, shingle_tokens

    d = load_table(spark, "documents", sf_dir)
    d = d.repartition(spark.sparkContext.defaultParallelism, "doc_id")
    # checkpoint: 6 reads of the shingle-UDF output in one plan otherwise
    toks, sizes = shingle_tokens(d, checkpoint=True)
    pairs = shingle_pair_stats(toks, sizes).select(
        "n_common", (F.col("n1") + F.col("n2") - F.col("n_common")).alias("un")
    )
    ts = F.array(*[F.lit(t) for t in DEDUP_CURVE_THRESHOLDS])
    expanded = pairs.select(F.explode(ts).alias("threshold_pct"), "n_common", "un")
    return expanded.groupBy("threshold_pct").agg(
        F.sum(
            F.when(F.col("n_common") * 100 >= F.col("threshold_pct") * F.col("un"), 1)
            .otherwise(0)
        )
        .cast("long")
        .alias("n_pairs")
    )
