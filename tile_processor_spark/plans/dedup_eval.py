"""Dedup-approximation evaluation: pin the LSH banding itself, not just
its verified output — the dedup-side twin of ``ann_eval.ann_ivf_recall``.

``dedup_minhash_pairs``'s oracle proves the END result (banding + exact
verify) equals exact all-pairs Jaccard. This module measures the
APPROXIMATION layer: the DuckDB oracle independently recomputes the full
128-perm MinHash + 32×4 banding in SQL (the permutation family is
md5-based modular algebra, so both engines derive bit-identical
signatures — validated value-by-value) and counts

- ``n_true``        exact near-dup pairs (Jaccard ≥ 0.8),
- ``n_candidates``  distinct bucket-colliding pairs the banding emits,
- ``n_caught``      true pairs among the candidates,
- ``recall``        n_caught / n_true  (1 − 5e-8 by construction),
- ``precision``     n_caught / n_candidates (the cost of the recall:
                    how much exact-verify work the buckets admit).

A banding bug (wrong band slicing, permutation drift, key collisions)
moves recall or precision and fails the gate even though
``dedup_minhash_pairs`` — whose verify step masks candidate-set bugs
that only add false positives — would still pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tile_processor_spark.plans.llm_ops import (
    AUDIT_SAMPLE_PCT,
    MINHASH_EMIT_THRESHOLD,
    MINHASH_PRIME,
    SQL_AUDIT_SLICE,
    SQL_TOKENS,
    _docs,
    audit_slice,
    exact_jaccard_pairs,
    minhash_bands,
    minhash_candidates,
    minhash_signatures,
)
from tile_processor_spark.plans.registry import register

def _recall_oracle(doc_filter: str = "TRUE") -> str:
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
    inter AS (
      SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS c
      FROM toks a JOIN toks b ON a.h = b.h AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    truth AS (
      SELECT d1, d2 FROM inter
      JOIN sizes s1 ON d1 = s1.doc_id JOIN sizes s2 ON d2 = s2.doc_id
      WHERE CAST(c AS DOUBLE) / (s1.n + s2.n - c) >= {MINHASH_EMIT_THRESHOLD}
    ),
    sigs AS (
      -- the engine's permutation family: sig[p] = min((p*h + (p-1)^2 + 1)
      -- mod P) for p = 1..128; pure BIGINT modular algebra (h < 2^32,
      -- p*h < 2^39), bit-identical across engines.
      SELECT doc_id, p,
             MIN((p * h + (p - 1) * (p - 1) + 1) % {MINHASH_PRIME}) AS mh
      FROM toks, range(1, 129) r(p) GROUP BY doc_id, p
    ),
    bands AS (
      SELECT doc_id, (p - 1) // 4 AS band, list(mh ORDER BY p) AS key
      FROM sigs GROUP BY doc_id, (p - 1) // 4
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
    ),
    caught AS (SELECT d1, d2 FROM truth INTERSECT SELECT d1, d2 FROM cand),
    m AS (
      SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM truth) AS n_true,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM cand) AS n_candidates,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM caught) AS n_caught
    )
    SELECT n_true, n_candidates, n_caught,
           CASE WHEN n_true = 0 THEN CAST(1.0 AS DOUBLE)
                ELSE CAST(n_caught AS DOUBLE) / n_true END AS recall,
           CASE WHEN n_candidates = 0 THEN CAST(1.0 AS DOUBLE)
                ELSE CAST(n_caught AS DOUBLE) / n_candidates END AS precision
    FROM m
"""


_RECALL_ORACLE = _recall_oracle()


@register(
    "dedup_minhash_recall",
    oracle=_RECALL_ORACLE,
    doc=(
        "LSH banding quality metrics: recall and candidate precision of "
        "the 32×4 MinHash banding against exact Jaccard ≥ 0.8 ground "
        "truth, with the ENTIRE approximation (128 md5-modular "
        "permutations, band keys, bucket pairs) independently recomputed "
        "by the DuckDB oracle — the dedup twin of ann_ivf_recall. "
        "Engine plan: one Arrow pass for signatures, band equi-join for "
        "candidates, shingle-hash equi-join for truth (gate-scale only "
        "— at 100 TB the truth side is the thing LSH exists to avoid; "
        "run this on a sampled audit slice), three tiny aggregates "
        "cross-joined into one metrics row."
    ),
    tags=("llm", "dedup", "eval"),
)
def dedup_minhash_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _minhash_recall_frame(spark, sf_dir, sampled=False)


@register(
    "dedup_minhash_recall_sampled",
    oracle=_recall_oracle(SQL_AUDIT_SLICE.format(pct=AUDIT_SAMPLE_PCT)),
    doc=(
        "Sampled-slice audit mode of dedup_minhash_recall: the full "
        "LSH-vs-exact-truth metric computed on a deterministic "
        "audit_slice of the corpus — the quadratic truth side (the "
        "thing LSH exists to avoid) shrinks by pct² while recall and "
        "precision stay exact ON the slice, which is an unbiased "
        "estimate of the banding's corpus-wide behavior. This is the "
        "form that stays runnable as the corpus scales; gate-pinned "
        "at 50%."
    ),
    tags=("llm", "dedup", "eval", "sampled"),
)
def dedup_minhash_recall_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _minhash_recall_frame(spark, sf_dir, sampled=True)


def _minhash_recall_frame(
    spark: SparkSession, sf_dir: str, sampled: bool, pct: int | None = None
) -> DataFrame:
    """``pct`` overrides the gate's AUDIT_SAMPLE_PCT slice width — the
    production audit mode (1-5%) measured in docs/SCALE.md runs through
    here; the registered row keeps the pinned 50% default."""
    d = _docs(spark, sf_dir)
    if sampled:
        d = audit_slice(d) if pct is None else audit_slice(d, pct)
    # Zero-shingle documents (< 3 tokens) get the sentinel all-PRIME
    # signature and would bucket-collide with each other in every band,
    # while the oracle's sigs CTE simply has no rows for them — exclude
    # them symmetrically (they can never be near-dups at J ≥ 0.8 anyway;
    # their exact Jaccard is 0/0).
    toks3 = F.filter(F.split(F.trim(F.col("text")), r"\s+"), lambda x: F.length(x) > 0)
    d = d.filter(F.size(toks3) >= 3)
    d = d.repartition(spark.sparkContext.defaultParallelism, "doc_id")

    sig = minhash_signatures(d).localCheckpoint()
    cand = minhash_candidates(minhash_bands(sig)).localCheckpoint()

    truth = (
        exact_jaccard_pairs(d, MINHASH_EMIT_THRESHOLD)
        .select("d1", "d2")
        .localCheckpoint()
    )
    caught = truth.join(cand, ["d1", "d2"], "left_semi")

    t = truth.agg(F.count(F.lit(1)).alias("n_true"))
    c = cand.agg(F.count(F.lit(1)).alias("n_candidates"))
    g = caught.agg(F.count(F.lit(1)).alias("n_caught"))
    m = t.crossJoin(c).crossJoin(g)
    return m.select(
        "n_true",
        "n_candidates",
        "n_caught",
        F.when(F.col("n_true") == 0, F.lit(1.0))
        .otherwise(F.col("n_caught").cast("double") / F.col("n_true"))
        .alias("recall"),
        F.when(F.col("n_candidates") == 0, F.lit(1.0))
        .otherwise(F.col("n_caught").cast("double") / F.col("n_candidates"))
        .alias("precision"),
    )
