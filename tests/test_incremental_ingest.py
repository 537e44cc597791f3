"""Incremental dedup ingest: a new batch probes the materialized band
index with a shuffle on the new side only, and the streaming appender
produces band keys bit-identical to the batch build."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tile_processor_spark.plans.llm_ops import (
    incremental_band_candidates,
    minhash_bands,
    minhash_signatures,
)
from tile_processor_spark.sources.bucketing import count_exchanges, write_bucketed
from tile_processor_spark.sources.tables import load_table
from tile_processor_spark.streaming.ingest import start_band_index_append

SF = "/root/testdata/sf0.01"


@pytest.fixture()
def band_index(spark, tmp_path):
    """Band index over the corpus minus doc_id >= 440 (held out as the
    'new' batch; the cut keeps several near-dup pairs straddling it)."""
    docs = load_table(spark, "documents", SF)
    existing = docs.filter(F.col("doc_id") < 440)
    bands = minhash_bands(minhash_signatures(existing))
    spark.sql("DROP TABLE IF EXISTS band_index_test")
    write_bucketed(
        bands, "band_index_test", ["bk"], 8, str(tmp_path / "bands"), sort_cols=["bk"]
    )
    return docs.filter(F.col("doc_id") >= 440)


def test_incremental_candidates_match_full_batch(spark, band_index):
    new_docs = band_index
    cand = incremental_band_candidates(spark, "band_index_test", new_docs)
    got = {(r.new_id, r.existing_id) for r in cand.collect()}
    # Ground truth: the full-corpus banding self-join restricted to
    # (new, existing) pairs.
    docs = load_table(spark, "documents", SF)
    all_bands = minhash_bands(minhash_signatures(docs))
    full = (
        all_bands.alias("a")
        .join(all_bands.alias("b"), "bk")
        .filter((F.col("a.doc_id") >= 440) & (F.col("b.doc_id") < 440))
        .select(
            F.col("a.doc_id").alias("new_id"), F.col("b.doc_id").alias("existing_id")
        )
        .distinct()
    )
    want = {(r.new_id, r.existing_id) for r in full.collect()}
    assert got == want
    assert got, "held-out batch should collide with its near-dups"


def test_incremental_probe_shuffles_new_side_only(spark, band_index):
    cand = incremental_band_candidates(spark, "band_index_test", band_index)
    # Exchanges: the new batch's bands repartitioned to the index's
    # bucket layout, plus the distinct's aggregation shuffle. The
    # existing-corpus side must NOT appear as an exchange.
    assert count_exchanges(cand) <= 2
    plan = cand._jdf.queryExecution().executedPlan().toString()
    assert "SelectedBucketsCount" in plan or "Bucketed: true" in plan, plan[:2000]


def test_streaming_append_matches_batch_bands(spark, tmp_path):
    docs = load_table(spark, "documents", SF).filter(F.col("doc_id") < 50)
    src = str(tmp_path / "src")
    docs.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(docs.schema).parquet(src)
    q = start_band_index_append(
        stream, str(tmp_path / "delta"), str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    streamed = spark.read.parquet(str(tmp_path / "delta"))
    batch = minhash_bands(minhash_signatures(docs))
    assert streamed.count() == 50 * 32
    assert streamed.exceptAll(batch).count() == 0
    assert batch.exceptAll(streamed).count() == 0


def test_compaction_folds_delta_into_new_generation(spark, band_index, tmp_path):
    """index(old corpus) + streamed delta(new batch) compacts to exactly
    the full-corpus band set, rides the bucket layout, and re-running
    (at-least-once replay) converges to the same index."""
    from tile_processor_spark.streaming.ingest import (
        compact_band_index,
        start_band_index_append,
    )

    new_docs = band_index
    src = str(tmp_path / "newdocs")
    new_docs.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(new_docs.schema).parquet(src)
    q = start_band_index_append(stream, str(tmp_path / "delta"), str(tmp_path / "ck"))
    q.awaitTermination(120)

    spark.sql("DROP TABLE IF EXISTS band_index_v2")
    compact_band_index(
        spark, "band_index_test", str(tmp_path / "delta"), "band_index_v2",
        str(tmp_path / "bands_v2"), 8,
    )
    got = spark.table("band_index_v2")
    full = minhash_bands(minhash_signatures(load_table(spark, "documents", SF)))
    assert got.exceptAll(full).count() == 0
    assert full.exceptAll(got).count() == 0
    # Replayed compaction (same inputs, new generation) is identical.
    spark.sql("DROP TABLE IF EXISTS band_index_v3")
    compact_band_index(
        spark, "band_index_test", str(tmp_path / "delta"), "band_index_v3",
        str(tmp_path / "bands_v3"), 8,
    )
    assert spark.table("band_index_v3").exceptAll(got).count() == 0
    import pytest as _pytest

    with _pytest.raises(ValueError):
        compact_band_index(spark, "band_index_v2", "x", "band_index_v2", "y", 8)


def test_incremental_screened_candidates_match_batch_screen(spark, band_index, tmp_path):
    """The screened incremental path (band probe + signature-agreement
    estimate) must equal the batch pipeline's screen applied to the
    same (new, existing) pairs — and the screen must actually drop
    low-estimate collisions (be a strict subset when any exist)."""
    from tile_processor_spark.plans.llm_ops import (
        incremental_screened_candidates,
        minhash_estimate_filter,
    )

    docs = load_table(spark, "documents", SF)
    existing = docs.filter(F.col("doc_id") < 440)
    sig_old = minhash_signatures(existing)
    spark.sql("DROP TABLE IF EXISTS sig_index_test")
    write_bucketed(
        sig_old, "sig_index_test", ["doc_id"], 8, str(tmp_path / "sigs"),
        sort_cols=["doc_id"],
    )

    got = {
        (r.new_id, r.existing_id)
        for r in incremental_screened_candidates(
            spark, "band_index_test", "sig_index_test", band_index
        ).collect()
    }

    # ground truth: unscreened incremental candidates, screened by the
    # batch path's own estimate filter over the full signature table
    unscreened = incremental_band_candidates(
        spark, "band_index_test", band_index
    ).select(F.col("new_id").alias("d1"), F.col("existing_id").alias("d2"))
    all_sigs = minhash_signatures(docs)
    want = {
        (r.d1, r.d2)
        for r in minhash_estimate_filter(unscreened, all_sigs).collect()
    }
    assert got == want
    assert got, "held-out near-dups must survive the screen"
