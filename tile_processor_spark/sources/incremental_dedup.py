"""Incremental corpus dedup over the snapshot version stream — the
production loop a continuously-ingesting 100 TB corpus needs: each
append version's NEW rows are checked against the fingerprints of
everything ever kept, WITHOUT rescanning history's raw text. History
is represented once, as a fingerprint snapshot table; per version the
work is O(delta + fingerprint-join), never O(corpus).

The loop is EXACTLY-ONCE per corpus version via the same per-app
high-water mark the streaming sink uses (``commit_append``'s
``stream_mark``): every fingerprint commit records the corpus version
it processed, carried forward by all commit paths, so a crashed or
re-run driver re-processes only unmarked versions — and re-processing
an uncommitted version is idempotent by construction (the anti-join
against the uncommitted fingerprints yields the same survivors).

Composition, not a new engine: the corpus table's ``appended_files``
give the delta (the version-stream contract), ``read_snapshot`` gives
the fingerprint state, and ``commit_append`` gives the marked commit.

Reference parity note: the reference engine has no ingest/dedup story
at all; this is part of the training-data-pipeline mandate, composing
the snapshot store (Iceberg-shaped) with the dedup family.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from tile_processor_spark.sources.snapshots import (
    _DATA_DIR,
    _manifest_files,
    _read_manifest,
    commit_append,
    list_versions,
    read_snapshot,
    write_snapshot,
)

_APP_ID = "incremental_dedup"


def _fingerprint_schema_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [], "fp string, doc_key long, src_version int"
    )


def processed_through(fp_path: str) -> int:
    """The corpus version the fingerprint table has processed through
    (0 = nothing yet)."""
    versions = list_versions(fp_path)
    if not versions:
        return 0
    man = _read_manifest(fp_path, versions[-1])
    return int((man.get("stream_high_water") or {}).get(_APP_ID, 0))


def dedup_new_versions(
    spark: SparkSession,
    corpus_path: str,
    fp_path: str,
    text_col: str = "text",
    key_col: str = "doc_id",
    fingerprint: Column | None = None,
) -> list[dict]:
    """Process every corpus append version newer than the fingerprint
    table's high-water mark, in order. Per version: read ONLY the
    delta's files, fingerprint each row (default: md5 of ``text_col``;
    pass ``fingerprint`` for MinHash keys, CDC chunk sets, etc.),
    drop rows whose fingerprint is already kept (corpus history) or
    duplicated within the delta (min ``key_col`` wins), and commit the
    survivors' fingerprints with the version mark.

    Returns per-version stats ``{"version", "new_rows", "kept",
    "dropped"}``. Partitioned corpus tables are refused (the delta
    files do not carry partition columns); REWRITE versions raise like
    the version stream does — an incremental consumer cannot interpret
    a rewrite without re-emitting history — while metadata-only
    versions (``compact_manifest`` / ``convert_to_shared_layout``,
    whose deltas are provably empty) advance the mark with zero rows.
    A GAP between the processed-through mark and the oldest surviving
    corpus manifest (a too-aggressive ``vacuum``) raises rather than
    silently under-deduplicating: rows in the vacuumed versions were
    never fingerprinted.

    Rows whose fingerprint evaluates to NULL are OUTSIDE the dedup
    domain: they are never recorded and never suppressed (they count
    in ``new_rows`` but not ``kept``/``dropped`` bookkeeping beyond
    that)."""
    corpus_versions = list_versions(corpus_path)
    if not corpus_versions:
        raise FileNotFoundError(f"no committed snapshot at {corpus_path}")
    if _read_manifest(corpus_path, corpus_versions[-1]).get("partition_by"):
        raise NotImplementedError(
            "incremental dedup over a partitioned corpus (delta files "
            "lack partition columns) — dedup before partitioning, or "
            "carry the partition values as data columns"
        )
    if not list_versions(fp_path):
        # bootstrap an EMPTY fingerprint table so every version's
        # fingerprints land as a marked append (a bootstrap that wrote
        # v1's fingerprints unmarked would re-add them on replay)
        write_snapshot(_fingerprint_schema_df(spark), fp_path)
    done = processed_through(fp_path)
    pending = [v for v in corpus_versions if v > done]
    expected = done + 1
    if pending and pending[0] != expected:
        raise ValueError(
            f"corpus versions {expected}..{pending[0] - 1} were vacuumed "
            f"before being fingerprinted (processed through {done}, "
            f"oldest surviving manifest is {pending[0]}); their rows "
            "would silently never dedupe — re-bootstrap the fingerprint "
            "table from the full corpus instead"
        )
    fp_expr = (
        fingerprint
        if fingerprint is not None
        else F.md5(F.encode(F.col(text_col), "UTF-8"))
    )
    stats: list[dict] = []
    for v in pending:
        man = _read_manifest(corpus_path, v)
        delta_files = man.get("appended_files")
        if delta_files is None:
            if man.get("version") == 1 and "files" in man:
                delta_files = _manifest_files(man)
            elif "compacted_from" in man or "converted_from" in man:
                # metadata-only commit: the file SET is unchanged, the
                # delta is provably empty — advance the mark, keep zero
                delta_files = []
            else:
                raise ValueError(
                    f"corpus version {v} is not an append commit; "
                    "incremental dedup cannot interpret a rewrite"
                )
        if delta_files:
            delta = spark.read.parquet(*delta_files).select(
                F.col(key_col).cast("long").alias("doc_key"),
                fp_expr.alias("fp"),
            )
            # NULL fingerprints are outside the dedup domain (an anti-
            # join could never match them anyway — SQL NULL inequality —
            # so recording them would only accumulate dead rows)
            delta = delta.filter(F.col("fp").isNotNull())
            # within-delta dedup first (min key wins), then against
            # every fingerprint ever kept
            delta = (
                delta.groupBy("fp")
                .agg(F.min("doc_key").alias("doc_key"))
            )
            kept_fps = read_snapshot(spark, fp_path).select("fp")
            survivors = delta.join(kept_fps, "fp", "left_anti").select(
                "fp", "doc_key", F.lit(v).cast("int").alias("src_version")
            )
            new_files, n_kept = _stage_parquet(survivors, fp_path)
            n_new = sum(_parquet_rows(f) for f in delta_files)
        else:
            new_files, n_new, n_kept = [], 0, 0
        # the mark advances even for empty/no-survivor versions —
        # replay protection is per corpus version, not per row
        commit_append(
            fp_path,
            new_files,
            stream_mark=(_APP_ID, v),
            extra={"src_corpus_version": v},
        )
        stats.append(
            {
                "version": v,
                "new_rows": n_new,
                "kept": n_kept,
                "dropped": n_new - n_kept,
            }
        )
    return stats


def _parquet_rows(path: str) -> int:
    import pyarrow.parquet as pq

    return pq.ParquetFile(path).metadata.num_rows


def _stage_parquet(df: DataFrame, table_path: str) -> tuple[list[str], int]:
    """Write ``df`` into a private staging dir under the table's data
    root; returns (file list with ZERO-ROW task files dropped, total
    rows) — one footer read per file serves both the filter and the
    row accounting (the fingerprint manifest stays proportional to
    kept rows, not task count; no Spark job)."""
    stage = os.path.join(
        os.path.abspath(table_path), _DATA_DIR, uuid.uuid4().hex
    )
    df.write.mode("error").parquet(stage)
    files: list[str] = []
    total = 0
    for root, _d, names in os.walk(stage):
        for n in sorted(names):
            if not n.endswith(".parquet"):
                continue
            p = os.path.join(root, n)
            rows = _parquet_rows(p)
            if rows > 0:
                files.append(p)
                total += rows
    return sorted(files), total
