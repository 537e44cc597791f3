"""Store-native manifest compaction (round 15): ``compact_store``
rewrites a committed version's flat manifest into the two-level grouped
layout directly against the ``s3://`` prefix — driver-side metadata
only, no data bytes moved, no local mirror round-trip — and
``vacuum_store`` reclaims superseded group side objects like the local
vacuum's groups sweep.
"""

from __future__ import annotations

import json
import time

import pytest

from tests.test_s3_commit_fs import ACCESS, REGION, SECRET
from tests.test_s3_snapshot_write import _client, _read, _rows, _s3_opts

BUCKET = "tbl-bucket"


@pytest.fixture()
def fake_s3():
    from tile_processor_spark.testing.fake_s3 import start_fake_s3

    srv = start_fake_s3(ACCESS, SECRET)
    try:
        yield srv
    finally:
        srv.shutdown()
        srv.server_close()


@pytest.fixture(autouse=True)
def _register(spark):
    from tile_processor_spark.sources.snapshot_datasource import register

    register(spark)


def test_compact_store_partitioned_grouped_pruned_read(spark, fake_s3):
    """Native partitioned table + append → compact_store groups by
    partition value; the grouped manifest reads identically, pruning
    opens only the matching group's side object, and stats survive."""
    from tile_processor_spark.sources.snapshot_datasource import (
        compact_store,
    )

    prefix = "warehouse/native_compact"
    df1 = spark.createDataFrame(
        [("F", 1, 10.0), ("O", 2, 20.0)], "status string, k long, v double"
    )
    (
        df1.write.format("tps_snapshot")
        .options(**_s3_opts(fake_s3, prefix))
        .option("partition_by", "status")
        .mode("overwrite")
        .save()
    )
    df2 = spark.createDataFrame(
        [("F", 3, 30.0), ("P", 4, 40.0)], "status string, k long, v double"
    )
    (
        df2.write.format("tps_snapshot")
        .options(**_s3_opts(fake_s3, prefix))
        .mode("append")
        .save()
    )
    before = _rows(_read(spark, fake_s3, prefix))

    opts = {k: v for k, v in _s3_opts(fake_s3, prefix).items() if k != "path"}
    v3 = compact_store(f"s3://{BUCKET}/{prefix}", opts)
    assert v3 == 3
    m3 = json.loads(
        _client(fake_s3).get_object(f"{prefix}/manifest-v00000003.json")
    )
    assert "groups" in m3 and "files" not in m3
    assert m3["compacted_from"] == 2
    assert m3["partition_by"] == ["status"]
    # one group per partition value; the two F files (both snap
    # prefixes) merge into ONE group
    values = sorted(g["values"]["status"] for g in m3["groups"])
    assert values == ["F", "O", "P"]
    f_group = next(g for g in m3["groups"] if g["values"]["status"] == "F")
    assert f_group["n_files"] == 2
    # grouped head reads identically; pruning works through groups
    assert _rows(_read(spark, fake_s3, prefix)) == before
    assert _rows(
        _read(spark, fake_s3, prefix, partition_filter='{"status": "F"}')
        .select("k")
    ) == [(1,), (3,)]
    # side objects landed under the prefix and resolve via the root
    assert all(g["path"].startswith(m3["root"] + "/groups/") for g in m3["groups"])
    assert not fake_s3.rejections


def test_compact_store_rollback_guard_and_stats(spark, fake_s3):
    from tile_processor_spark.sources.snapshot_datasource import (
        SnapshotPushdownReader,
        compact_store,
    )

    prefix = "warehouse/native_compact2"
    # two range-disjoint appends -> per-file stats in the manifest
    (
        spark.createDataFrame([(i, float(i)) for i in range(10)],
                              "k long, v double").coalesce(1)
        .write.format("tps_snapshot").options(**_s3_opts(fake_s3, prefix))
        .mode("overwrite").save()
    )
    (
        spark.createDataFrame([(i, float(i)) for i in range(100, 110)],
                              "k long, v double").coalesce(1)
        .write.format("tps_snapshot").options(**_s3_opts(fake_s3, prefix))
        .mode("append").save()
    )
    opts = {k: v for k, v in _s3_opts(fake_s3, prefix).items() if k != "path"}
    with pytest.raises(ValueError, match="rolling back|allow_rollback"):
        compact_store(f"s3://{BUCKET}/{prefix}", opts, version=1)
    v3 = compact_store(f"s3://{BUCKET}/{prefix}", opts, group_files=1)
    # stats carried into group side files -> where-skipping still plans
    # fewer input partitions on the grouped head
    schema = _read(spark, fake_s3, prefix).schema
    all_opts = dict(_s3_opts(fake_s3, prefix))
    rdr_all = SnapshotPushdownReader(schema, dict(all_opts))
    rdr_skip = SnapshotPushdownReader(schema, dict(all_opts))
    rdr_skip._where = [("k", ">=", 100)]
    n_all = sum(len(p.files) for p in rdr_all.partitions())
    n_skip = sum(len(p.files) for p in rdr_skip.partitions())
    assert 0 < n_skip < n_all
    assert _read(spark, fake_s3, prefix).filter("k >= 100").count() == 10
    # re-compaction of a grouped head is idempotent in effect
    v4 = compact_store(f"s3://{BUCKET}/{prefix}", opts, group_files=1)
    assert v4 == v3 + 1
    assert _read(spark, fake_s3, prefix).count() == 20


def test_vacuum_store_reclaims_superseded_group_objects(spark, fake_s3):
    from tile_processor_spark.sources.snapshot_datasource import (
        compact_store,
        vacuum_store,
    )

    prefix = "warehouse/native_compact3"
    (
        spark.createDataFrame([(1,), (2,)], "k long")
        .write.format("tps_snapshot").options(**_s3_opts(fake_s3, prefix))
        .mode("overwrite").save()
    )
    opts = {k: v for k, v in _s3_opts(fake_s3, prefix).items() if k != "path"}
    compact_store(f"s3://{BUCKET}/{prefix}", opts)          # v2 grouped
    compact_store(f"s3://{BUCKET}/{prefix}", opts)          # v3 grouped
    c = _client(fake_s3)
    group_keys = [k for k in c.list_objects(prefix + "/groups/")]
    assert len(group_keys) == 2  # one side object per compaction
    # age everything past the window, then vacuum keep_last=1: v3's
    # group object survives (referenced), the superseded one goes
    for k in group_keys:
        fake_s3.mtimes[k] = time.time() - 7200
    out = vacuum_store(
        f"s3://{BUCKET}/{prefix}", opts, keep_last=1, claim_ttl_s=3600
    )
    assert out["kept_versions"] == [3]
    left = [k for k in c.list_objects(prefix + "/groups/")]
    assert len(left) == 1
    m3 = json.loads(c.get_object(f"{prefix}/manifest-v00000003.json"))
    assert m3["groups"][0]["path"].endswith(left[0].rsplit("/", 1)[-1])
    # the grouped head still reads after the sweep
    assert _rows(_read(spark, fake_s3, prefix)) == [(1,), (2,)]
    assert not fake_s3.rejections


def test_snapshot_history_local_and_s3(spark, fake_s3, tmp_path):
    """DESCRIBE HISTORY twin (round 15): one metadata row per version
    with the operation classified — create / append / rewrite /
    compact — identical through the local and s3 paths."""
    from tile_processor_spark.sources.snapshot_datasource import (
        compact_store,
    )
    from tile_processor_spark.sources.snapshots import (
        append_snapshot,
        compact_manifest,
        snapshot_history,
        upsert_snapshot,
        write_snapshot,
    )

    # local: create -> append -> upsert(rewrite) -> compact
    tbl = str(tmp_path / "tbl")
    write_snapshot(spark.createDataFrame([(1, "a")], "k long, s string"), tbl)
    append_snapshot(spark.createDataFrame([(2, "b")], "k long, s string"), tbl)
    upsert_snapshot(
        spark.createDataFrame([(2, "B")], "k long, s string"), tbl, ["k"]
    )
    compact_manifest(tbl)
    h = snapshot_history(tbl)
    assert [e["operation"] for e in h] == [
        "create", "append", "rewrite", "compact",
    ]
    assert [e["version"] for e in h] == [1, 2, 3, 4]
    assert h[1]["n_appended"] >= 1 and h[1]["n_files"] > h[0]["n_files"]
    assert h[3]["compacted_from"] == 3
    # grouped head reports file counts without opening side files
    assert h[3]["n_files"] == h[2]["n_files"]

    # s3: the native write plane produces the same classified history
    prefix = "warehouse/fn_history"
    url = f"s3://{BUCKET}/{prefix}"
    opts = {k: v for k, v in _s3_opts(fake_s3, prefix).items() if k != "path"}
    write_snapshot(
        spark.createDataFrame([("F", 1)], "g string, k long"),
        url, partition_by=["g"], s3_options=opts,
    )
    append_snapshot(
        spark.createDataFrame([("O", 2)], "g string, k long"),
        url, s3_options=opts,
    )
    compact_store(url, opts)
    hs = snapshot_history(url, s3_options=opts)
    assert [e["operation"] for e in hs] == ["create", "append", "compact"]
    assert all(e["partition_by"] == ["g"] for e in hs)
    assert hs[1]["n_appended"] == 1
    assert not fake_s3.rejections
