"""Round-12 incremental-dedup additions: partitioned-corpus deltas
(VERDICT r11 Missing #3) and the Bloom-prescreened, stats-pruned
history check (VERDICT r11 Wrong #2 — the one super-linear term left
in the ingest loop).

The Bloom sidecar is a cache keyed to the fingerprint-table version:
false positives are exact-verified against a min/max-pruned file
subset, false negatives cannot exist, and a stale/missing sidecar
degrades to the exact full anti-join — so every test here asserts
BOTH the exact results and the telemetry that proves which path ran.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from tile_processor_spark.sources.dedup_bloom import (
    build_bloom,
    load_bloom,
    save_bloom,
    with_maybe_kept,
)
from tile_processor_spark.sources.incremental_dedup import (
    cluster_fingerprints,
    dedup_new_versions,
    processed_through,
)
from tile_processor_spark.sources.snapshots import (
    append_snapshot,
    convert_to_shared_layout,
    list_versions,
    read_snapshot,
    write_snapshot,
)


def _docs(spark, rows, schema="doc_id long, text string"):
    return spark.createDataFrame(rows, schema)


# ---------------------------------------------------------------- partitioned


def test_partitioned_corpus_dedup_across_versions(spark, tmp_path):
    """A corpus partitioned by language dedupes incrementally: delta
    files live in the shared Hive tree without partition columns, and
    the basePath read re-derives them."""
    corpus = str(tmp_path / "corpus")
    fps = str(tmp_path / "fps")
    schema = "doc_id long, lang string, text string"
    write_snapshot(
        _docs(spark, [(1, "en", "alpha"), (2, "de", "beta")], schema),
        corpus,
        partition_by=["lang"],
    )
    convert_to_shared_layout(corpus)  # v2 metadata-only
    append_snapshot(
        _docs(spark, [(3, "en", "beta"), (4, "fr", "gamma")], schema), corpus
    )  # v3: beta dup (cross-partition!)
    append_snapshot(
        _docs(spark, [(5, "de", "alpha"), (6, "en", "delta")], schema), corpus
    )  # v4: alpha dup

    stats = dedup_new_versions(spark, corpus, fps)
    assert stats == [
        {"version": 1, "new_rows": 2, "kept": 2, "dropped": 0},
        {"version": 2, "new_rows": 0, "kept": 0, "dropped": 0},
        {"version": 3, "new_rows": 2, "kept": 1, "dropped": 1},
        {"version": 4, "new_rows": 2, "kept": 1, "dropped": 1},
    ]
    kept = read_snapshot(spark, fps)
    assert sorted(
        tuple(r) for r in kept.select("doc_key", "src_version").collect()
    ) == [(1, 1), (2, 1), (4, 3), (6, 4)]
    assert processed_through(fps) == 4
    # replay: exactly-once
    assert dedup_new_versions(spark, corpus, fps) == []
    assert read_snapshot(spark, fps).count() == 4


def test_partitioned_corpus_can_fingerprint_on_partition_column(
    spark, tmp_path
):
    """The re-derived partition column is a real column: a fingerprint
    expression may reference it (e.g. per-language dedup keys)."""
    corpus = str(tmp_path / "corpus")
    fps = str(tmp_path / "fps")
    schema = "doc_id long, lang string, text string"
    write_snapshot(
        _docs(spark, [(1, "en", "same"), (2, "de", "same")], schema),
        corpus,
        partition_by=["lang"],
    )
    convert_to_shared_layout(corpus)
    stats = dedup_new_versions(
        spark,
        corpus,
        fps,
        fingerprint=F.md5(
            F.encode(F.concat_ws("|", F.col("lang"), F.col("text")), "UTF-8")
        ),
    )
    # same text, different lang → BOTH kept (the partition column
    # participated in the fingerprint); stats[-1] is the metadata-only
    # convert_to_shared_layout version
    assert stats[0]["kept"] == 2
    assert stats[-1] == {"version": 2, "new_rows": 0, "kept": 0, "dropped": 0}


# --------------------------------------------------------------------- bloom


def test_bloom_prescreen_same_results_and_prunes_history(spark, tmp_path):
    """Bloom path and exact path agree; the telemetry proves all-new
    versions never read history and duplicate versions open only the
    stats-matching file subset."""
    corpus = str(tmp_path / "corpus")
    fps = str(tmp_path / "fps")
    append_snapshot(
        _docs(spark, [(i, f"uniq-{i}") for i in range(1, 51)]), corpus
    )  # v1
    append_snapshot(
        _docs(
            spark,
            [(100 + i, f"uniq-{i}") for i in range(1, 11)]  # 10 dups
            + [(200 + i, f"new-{i}") for i in range(1, 11)],  # 10 new
        ),
        corpus,
    )  # v2
    tele: list = []
    stats = dedup_new_versions(spark, corpus, fps, telemetry=tele)
    assert stats == [
        {"version": 1, "new_rows": 50, "kept": 50, "dropped": 0},
        {"version": 2, "new_rows": 20, "kept": 10, "dropped": 10},
    ]
    # v1 ran against an empty kept-set: zero candidates, no history read
    assert tele[0]["mode"] == "bloom-all-new"
    # v2 had true duplicates → candidates ≥ 10, verified via pruned read
    assert tele[1]["mode"] == "bloom-pruned"
    assert tele[1]["candidates"] >= 10
    assert 0 < tele[1]["fp_files_opened"] <= tele[1]["fp_files_total"]
    # sidecar is valid for the current head
    assert load_bloom(fps, list_versions(fps)[-1]) is not None


def test_bloom_disabled_matches_bloom_enabled(spark, tmp_path):
    rows1 = [(i, f"t{i % 7}") for i in range(30)]
    rows2 = [(100 + i, f"t{i % 11}") for i in range(30)]

    def run(use_bloom, base):
        corpus, fps = str(base / "c"), str(base / "f")
        append_snapshot(_docs(spark, rows1), corpus)
        append_snapshot(_docs(spark, rows2), corpus)
        stats = dedup_new_versions(
            spark, corpus, fps, use_bloom=use_bloom
        )
        kept = sorted(
            tuple(r)
            for r in read_snapshot(spark, fps)
            .select("doc_key", "src_version")
            .collect()
        )
        return stats, kept

    (tmp_path / "a").mkdir()
    (tmp_path / "b").mkdir()
    assert run(True, tmp_path / "a") == run(False, tmp_path / "b")


def test_stale_sidecar_is_rebuilt_not_trusted(spark, tmp_path):
    """A sidecar for an older fingerprint version must be ignored: a
    missed entry would be a silent missed duplicate. Round 15: the
    retention prune keeps the most recent OTHER version, so a
    wrong-version save no longer destroys the head state (strictly
    safer) — the sabotage therefore also deletes the head's state file
    to prove the stale file alone is never trusted."""
    import os

    from tile_processor_spark.sources.dedup_bloom import _state_path

    corpus = str(tmp_path / "corpus")
    fps = str(tmp_path / "fps")
    append_snapshot(_docs(spark, [(1, "a")]), corpus)
    dedup_new_versions(spark, corpus, fps)
    head = list_versions(fps)[-1]
    good = load_bloom(fps, head)
    assert good is not None
    # sabotage: save an EMPTY bloom stamped for a WRONG (old) version
    empty = build_bloom(
        spark, fps, head - 1,
        spark.createDataFrame([], "fp string"), 0,
    )
    save_bloom(fps, empty)
    # the head state SURVIVES the wrong-version save (retention)
    assert load_bloom(fps, head) is not None
    # now only the stale (head-1) state remains on disk
    os.unlink(_state_path(fps, head))
    assert load_bloom(fps, head) is None  # stale → rejected
    # a duplicate in the next version is still caught (rebuild path)
    append_snapshot(_docs(spark, [(2, "a"), (3, "b")]), corpus)
    stats = dedup_new_versions(spark, corpus, fps)
    assert stats == [{"version": 2, "new_rows": 2, "kept": 1, "dropped": 1}]


def test_candidate_cap_falls_back_to_full_anti_join(spark, tmp_path):
    corpus = str(tmp_path / "corpus")
    fps = str(tmp_path / "fps")
    append_snapshot(_docs(spark, [(i, f"x{i}") for i in range(20)]), corpus)
    append_snapshot(
        _docs(spark, [(100 + i, f"x{i}") for i in range(20)]), corpus
    )  # all dup
    tele: list = []
    stats = dedup_new_versions(
        spark, corpus, fps, candidate_cap=5, telemetry=tele
    )
    assert tele[1]["mode"] == "full-anti-join"
    assert stats[1] == {"version": 2, "new_rows": 20, "kept": 0, "dropped": 20}


def test_bloom_membership_has_no_false_negatives(spark, tmp_path):
    """Property the whole design rests on: every inserted fingerprint
    tests positive."""
    fps_df = spark.createDataFrame(
        [(f"{i:032x}",) for i in range(500)], "fp string"
    )
    bloom = build_bloom(spark, str(tmp_path), 1, fps_df, 500)
    flagged = with_maybe_kept(fps_df, bloom)
    assert flagged.filter(~F.col("_maybe_kept")).count() == 0
    # and unrelated fingerprints are mostly rejected (fpp ~ 0.24%)
    other = spark.createDataFrame(
        [(f"{i + 10**9:032x}",) for i in range(2000)], "fp string"
    )
    fp_hits = with_maybe_kept(other, bloom).filter(
        F.col("_maybe_kept")
    ).count()
    assert fp_hits < 2000 * 0.05


# ----------------------------------------------------------------- clustering


def test_cluster_fingerprints_preserves_state_and_prunes_harder(
    spark, tmp_path
):
    corpus = str(tmp_path / "corpus")
    fps = str(tmp_path / "fps")
    rng = np.random.default_rng(3)
    for v in range(4):
        rows = [
            (int(v * 1000 + i), f"doc-{rng.integers(0, 10**9)}")
            for i in range(50)
        ]
        append_snapshot(_docs(spark, rows), corpus)
    dedup_new_versions(spark, corpus, fps)
    mark = processed_through(fps)
    kept_before = sorted(
        tuple(r) for r in read_snapshot(spark, fps).collect()
    )
    v = cluster_fingerprints(spark, fps, files_target=4)
    # rewrite carries the replay mark and the exact kept-set
    assert processed_through(fps) == mark
    assert sorted(
        tuple(r) for r in read_snapshot(spark, fps).collect()
    ) == kept_before
    # sidecar stamp advanced in place (content identical)
    assert load_bloom(fps, v) is not None
    # next version still dedupes correctly after the rewrite
    append_snapshot(_docs(spark, [(9001, "doc-known"), (9002, "doc-known")]),
                    corpus)
    append_snapshot(_docs(spark, [(9003, "doc-known")]), corpus)
    tele: list = []
    stats = dedup_new_versions(spark, corpus, fps, telemetry=tele)
    assert [s["kept"] for s in stats] == [1, 0]
    assert processed_through(fps) == mark + 2


def test_auto_cluster_fires_geometrically_and_stays_correct(
    spark, tmp_path, monkeypatch
):
    """With the doubling threshold shrunk, the loop interleaves rewrite
    commits with appends; dedup results, replay marks, and the sidecar
    all stay consistent across them."""
    import tile_processor_spark.sources.incremental_dedup as mod

    monkeypatch.setattr(mod, "_MIN_CLUSTER_ROWS", 2)
    corpus = str(tmp_path / "corpus")
    fps = str(tmp_path / "fps")
    for v in range(1, 5):
        rows = [(v * 100 + i, f"t{v}-{i}") for i in range(4)] + [
            (v * 100 + 50, "t1-0")  # dup of v1's first row (v>1)
        ]
        append_snapshot(_docs(spark, rows), corpus)
    stats = dedup_new_versions(spark, corpus, fps)
    # v1's own t1-0 repeat dedupes within the delta (min key wins);
    # v2+ each drop their cross-version t1-0 dup
    assert [s["kept"] for s in stats] == [4, 4, 4, 4]
    assert processed_through(fps) == 4
    # at least one rewrite version exists between the marked appends
    from tile_processor_spark.sources.snapshots import _read_manifest

    versions = list_versions(fps)
    rewrites = [
        v for v in versions
        if "appended_to" not in _read_manifest(fps, v) and v > 1
    ]
    assert rewrites, "auto_cluster never fired"
    # replay: nothing reprocessed, nothing duplicated
    assert dedup_new_versions(spark, corpus, fps) == []
    assert read_snapshot(spark, fps).count() == 16
