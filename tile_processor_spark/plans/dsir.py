"""DSIR-style data selection: hashed n-gram importance weights.

Data Selection with Importance Resampling (Xie et al., NeurIPS 2023)
scores each raw document by how target-like its hashed n-gram profile
is, then keeps the high-importance slice. This module implements the
deterministic, oracle-checkable core of that recipe:

- features: word unigrams + bigrams WITH multiplicity, hashed into
  ``N_BUCKETS`` buckets (md5-based ``hash32`` — the engine's
  cross-engine-reproducible hash, same as the dedup family);
- two bag-of-features models: the TARGET corpus (``lang = 'en'``
  documents, standing in for the curated target distribution) and the
  RAW corpus (everything), as exact integer bucket counts with add-one
  smoothing;
- per-document importance: the ratio of the document's summed smoothed
  target frequencies to its summed smoothed raw frequencies, each
  normalized by its corpus total — computed as one double division of
  two exact decimal-128 products, so Spark and DuckDB agree
  bit-for-bit. (The paper's product-of-likelihood-ratios needs logs,
  whose bit-level cross-engine equality is not guaranteed; the
  ratio-of-sums form keeps the ordering signal and stays exact.)
- selection: ``importance > 1`` — "more target-like than the raw
  average" — evaluated as an exact integer cross-multiplication, so
  the flag never depends on float rounding.

Scale shape (100 TB): the bucket-count models are ``N_BUCKETS`` rows
each (broadcast, O(1) — that is the point of hashing the vocabulary);
scoring is one map-side pass over the feature stream plus a per-doc
partial aggregation. The only shuffle is doc_id-keyed. Selection is a
scale-free predicate, not a global sort.

Reference parity: no counterpart (the reference has no text pipeline);
part of the training-data-curation surface the brief adds.
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

N_BUCKETS = 512
TARGET_LANG = "en"

_DSIR_ORACLE = f"""
WITH words AS (SELECT doc_id, lang, {SQL_TOKENS} AS w FROM documents),
feats AS (
  SELECT doc_id, lang, unnest(w) AS f FROM words
  UNION ALL
  SELECT doc_id, lang,
         unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS f
  FROM words
),
bk AS (SELECT doc_id, lang,
              {SQL_HASH32.format(v="f")} % {N_BUCKETS} AS b
       FROM feats),
cr AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS cr FROM bk GROUP BY b),
ct AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS ct
       FROM bk WHERE lang = '{TARGET_LANG}' GROUP BY b),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS nr,
               CAST(SUM(CASE WHEN lang = '{TARGET_LANG}' THEN 1 ELSE 0 END)
                    AS BIGINT) AS nt
        FROM bk),
per AS (
  SELECT bk.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_features,
         CAST(SUM(COALESCE(ct.ct, 0) + 1) AS BIGINT) AS st_sum,
         CAST(SUM(cr.cr + 1) AS BIGINT) AS sr_sum
  FROM bk JOIN cr USING (b) LEFT JOIN ct USING (b)
  GROUP BY bk.doc_id
)
SELECT doc_id, n_features, st_sum, sr_sum,
       CAST(CAST(st_sum AS HUGEINT) * (nr + {N_BUCKETS}) AS DOUBLE)
         / CAST(CAST(sr_sum AS HUGEINT) * (nt + {N_BUCKETS}) AS DOUBLE)
         AS importance,
       CAST(CASE WHEN CAST(st_sum AS HUGEINT) * (nr + {N_BUCKETS})
                      > CAST(sr_sum AS HUGEINT) * (nt + {N_BUCKETS})
                 THEN 1 ELSE 0 END AS INTEGER) AS selected
FROM per, tot
"""


def _feature_buckets(d: DataFrame) -> DataFrame:
    """(doc_id, lang, b): hashed unigram+bigram stream with multiplicity."""
    words = tokens_col(F.col("text"))
    bigrams = F.when(
        F.size(words) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(words) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(words, i), F.element_at(words, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return d.select(
        "doc_id", "lang", F.explode(F.concat(words, bigrams)).alias("f")
    ).withColumn("b", hash32(F.col("f")) % N_BUCKETS)


@register(
    "dsir_importance_weights",
    oracle=_DSIR_ORACLE,
    doc=(
        "DSIR-style curation: hashed unigram+bigram bucket models for the "
        "target (lang='en') and raw corpora, per-doc importance as the "
        "ratio of summed smoothed target vs raw frequencies (exact "
        "decimal-128 products, one double division), and an exact "
        "integer-cross-multiplied selected flag (importance > 1). Bucket "
        "models are N_BUCKETS broadcast rows at any corpus size."
    ),
    tags=("llm", "curation", "quality"),
)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    bk = _feature_buckets(load_table(spark, "documents", sf_dir))
    cr = bk.groupBy("b").agg(F.count(F.lit(1)).alias("cr"))
    ct = (
        bk.filter(F.col("lang") == TARGET_LANG)
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("ct"))
    )
    tot = bk.agg(
        F.count(F.lit(1)).alias("nr"),
        F.sum((F.col("lang") == TARGET_LANG).cast("long")).alias("nt"),
    )
    per = (
        bk.join(F.broadcast(cr), "b")
        .join(F.broadcast(ct), "b", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_features"),
            F.sum(F.coalesce(F.col("ct"), F.lit(0)) + 1).alias("st_sum"),
            F.sum(F.col("cr") + 1).alias("sr_sum"),
        )
    )
    num = F.col("st_sum").cast("decimal(38,0)") * (F.col("nr") + N_BUCKETS)
    den = F.col("sr_sum").cast("decimal(38,0)") * (F.col("nt") + N_BUCKETS)
    return per.crossJoin(F.broadcast(tot)).select(
        "doc_id",
        "n_features",
        "st_sum",
        "sr_sum",
        (num.cast("double") / den.cast("double")).alias("importance"),
        (num > den).cast("int").alias("selected"),
    )
