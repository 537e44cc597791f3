"""ANN quality evaluation: recall of the IVF bucketed search against
the exact brute-force ground truth — the measurement every approximate
index needs before it replaces the exact path in production.

Both sides are existing registered queries (`ann_ivf_search`,
`embedding_cosine_topk`), so the recall frame is a pure composition:
per query vector, |IVF top-5 ∩ exact top-5| / 5. Everything is
deterministic, so the recall numbers themselves — the quality of the
approximation, not just its mechanics — are oracle-pinned.

Scale: both inputs are top-k frames (O(#queries × k)); the join and
aggregate are dimension-sized regardless of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tile_processor_spark.plans.llm_ops import (
    IVF_TOPK,
    ann_ivf_search,
    embedding_cosine_topk,
)
from tile_processor_spark.plans.registry import REGISTRY, register


def _recall_oracle() -> str:
    brute = REGISTRY["embedding_cosine_topk"].oracle
    ivf = REGISTRY["ann_ivf_search"].oracle
    return f"""
    WITH brute AS (SELECT * FROM ({brute})),
    ivf AS (SELECT * FROM ({ivf}))
    SELECT b.q_id,
           CAST(COUNT(i.neighbor_id) AS BIGINT) AS n_hits,
           CAST(COUNT(i.neighbor_id) AS DOUBLE) / {IVF_TOPK} AS recall_at_k
    FROM brute b
    LEFT JOIN ivf i ON b.q_id = i.q_id AND b.neighbor_id = i.neighbor_id
    GROUP BY b.q_id
    """


@register(
    "ann_ivf_recall",
    oracle=_recall_oracle(),
    doc=(
        "Recall@5 of ann_ivf_search vs the embedding_cosine_topk exact "
        "ground truth, per query vector. nprobe=2 of 8 lists bounds "
        "recall below 1.0 by construction; the exact value is a "
        "deterministic function of the corpus and is verified "
        "bit-for-bit. The frame a capacity-planning dashboard reads "
        "when tuning nprobe."
    ),
    tags=("llm", "similarity", "ivf", "eval"),
)
def ann_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    brute = embedding_cosine_topk(spark, sf_dir).select("q_id", "neighbor_id")
    ivf = ann_ivf_search(spark, sf_dir).select(
        F.col("q_id").alias("iq"), F.col("neighbor_id").alias("inb")
    )
    joined = brute.join(
        ivf,
        (brute.q_id == ivf.iq) & (brute.neighbor_id == ivf.inb),
        "left",
    )
    return joined.groupBy("q_id").agg(
        F.count("inb").cast("long").alias("n_hits"),
        (F.count("inb").cast("double") / IVF_TOPK).alias("recall_at_k"),
    )
