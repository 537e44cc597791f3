"""S3-NATIVE snapshot commits: the write half of the object-store story
(VERDICT r13 Missing #3). Round 13 made ``s3://`` paths first-class for
batch reads, version streams, and vacuum; commits still required the
``S3CommitFS`` mount to be the table root. This module closes the loop:

    df.write.format("tps_snapshot").option("path", "s3://bucket/tbl")
      .options(**s3_creds).mode("append").save()

    stream.writeStream.format("tps_snapshot")
      .option("path", "s3://bucket/tbl").option("stream_app_id", "app")

Architecture — the same two-phase commit as the local connector writer,
re-expressed over the store:

- EXECUTORS each serialize their Arrow batches to one parquet object
  and PUT it under a task-private ``data/<uuid>/`` key prefix
  (unconditional PUT — a speculated/retried task writes a fresh
  uuid-named key; losers become invisible orphans for ``vacuum_store``,
  which is why its retention window exists). Per-file column min/max
  stats are computed from the in-memory Arrow table at write time
  (cheaper than the local path's footer re-reads, and the driver never
  fetches a byte of data).
- The DRIVER then publishes a manifest referencing exactly the
  acknowledged keys via CONDITIONAL PUT (``If-None-Match: *``,
  ``s3_client.put_object``) — the same atomic-create primitive
  ``commit_fs.S3CommitFS.publish_exclusive`` rests on. Appends use
  optimistic concurrency: losing the version race re-reads the new
  latest manifest and retries on top (``snapshots.commit_append``'s
  shape), with the same schema re-validation and streaming high-water
  replay check inside every retry.

Path model: a store-resident manifest needs a ``root`` against which
its recorded file paths relativize into keys (``S3SnapshotStore``'s
read contract, snapshot_datasource.py). A native commit has no local
root, so it writes a VIRTUAL one — ``/<bucket>/<prefix>`` — and
records every file as ``<vroot>/<key relative to prefix>``; carried-
forward files from older manifests (which may carry a real local root
from a mirrored table) are re-rooted the same way, so one manifest
never mixes root namespaces. ``key_for(f, root) = prefix +
relpath(f, root)`` then resolves both mirrored and native manifests
uniformly. Appending onto a GROUPED manifest (compact_manifest mirror)
flattens it to a plain file list — correct, but group-level stats are
dropped; re-run compaction locally and re-mirror to restore them.

Scope: full read/write for both UNPARTITIONED and PARTITIONED tables.
Partitioned creation/overwrite takes ``.option("partition_by",
"col1,col2")``; appends (and the stream sink) inherit the committed
table's scheme — executors split their batches by partition value and
PUT each sub-table under a Hive ``col=val`` key chain inside their own
task-private ``data/<uuid>/`` prefix. No shared-tree re-home is needed
(the local path's requirement, snapshot_datasource.SnapshotWriter):
the reader prunes DRIVER-SIDE from the manifest's file list, and
``_partition_values`` parses ``col=val`` segments from each file's
path RELATIVE to the manifest base — a delta living under a different
snap prefix than the base relativizes through ``..`` segments, which
carry no ``=`` and so cannot alias a partition pair (pinned by
tests/test_s3_snapshot_write.py). Appends re-validate the committed
``partition_by`` against the delta's key chains inside every commit
retry, so a rewrite (or raced creation) that changed the layout
mid-append raises instead of publishing files whose chains contradict
the manifest's declared scheme. Ambiguous
commit outcomes (connection death during the conditional PUT)
propagate: the write job fails loudly, its objects stay invisible, and
``vacuum_store`` reclaims them after the retention window — never a
blind retry that could misread our own landed manifest as a lost race.

Reference parity: the reference overwrites output directories in place
(tile_processor/output.py DirOutput ~L40); this is the engine-grade
replacement for object-store deployments.
"""

from __future__ import annotations

import json
import posixpath

from pyspark.sql.datasource import (
    DataSourceArrowWriter,
    DataSourceStreamArrowWriter,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

from tile_processor_spark.sources.snapshots import (
    _APPEND_RETRIES,
    _CONFLICT_MARKER,
    _manifest_files,
    _schema_fields,
)


class _S3WriteMessage(WriterCommitMessage):
    def __init__(self, key: str | None, rows: int, stats: dict | None):
        self.key = key
        self.rows = rows
        self.stats = stats


class _S3PartWriteMessage(WriterCommitMessage):
    """Partitioned-write commit message: one (key, per-file stats)
    pair per occupied partition-value combination the task saw."""

    def __init__(self, files: list[tuple[str, dict | None]], rows: int):
        self.files = files
        self.rows = rows


def _arrow_stats(tbl) -> dict[str, list]:
    """Per-column [min, max] from the in-memory Arrow table — the same
    sortable-primitives-only contract as ``snapshots._collect_stats``
    (ints, floats, strings, dates; dates as ISO strings; a float column
    containing NaN is dropped because JSON cannot carry it and a
    NaN-blind range could wrongly exclude the file). Stats are OPTIONAL
    metadata: absence is always sound."""
    import pyarrow as pa
    import pyarrow.compute as pc

    out: dict[str, list] = {}
    for field in tbl.schema:
        col = tbl.column(field.name)
        if len(col) == 0 or col.null_count == len(col):
            continue
        t = field.type
        is_date = pa.types.is_date(t)
        if not (
            pa.types.is_integer(t)
            or pa.types.is_floating(t)
            or pa.types.is_string(t)
            or pa.types.is_large_string(t)
            or is_date
        ):
            continue
        if pa.types.is_floating(t) and pc.any(
            pc.is_nan(col.drop_null())
        ).as_py():
            continue
        mm = pc.min_max(col)
        mn, mx = mm["min"].as_py(), mm["max"].as_py()
        if mn is None or mx is None:
            continue
        if is_date:
            mn, mx = mn.isoformat(), mx.isoformat()
        out[field.name] = [mn, mx]
    return out


class S3SnapshotCommitter:
    """Driver-side manifest commits against the store: virtual-root
    path bookkeeping + conditional-PUT publishes."""

    def __init__(self, store):
        self.store = store
        self.vroot = f"/{store.bucket}/{store.prefix}"

    def vpath(self, key: str) -> str:
        """Key under the table prefix → the virtual path recorded in
        manifests (``key_for(vpath, vroot)`` round-trips to the key)."""
        if not key.startswith(self.store.prefix + "/"):
            raise ValueError(f"key {key!r} not under {self.store.prefix!r}")
        return f"{self.vroot}/{key[len(self.store.prefix) + 1:]}"

    def re_root(self, path: str, old_root: str) -> str:
        """A file path from an older manifest (local root on mirrored
        tables, virtual root on native ones) → the same object under
        THIS committer's virtual root."""
        rel = posixpath.relpath(path, old_root)
        if rel.startswith(".."):
            raise ValueError(
                f"manifest references {path!r} outside its root "
                f"{old_root!r} — not mirrorable"
            )
        return f"{self.vroot}/{rel}"

    def _manifest_key(self, version: int) -> str:
        return f"{self.store.prefix}/manifest-v{version:08d}.json"

    def publish(self, manifest: dict, version: int) -> int:
        """Atomic exclusive create of the version manifest; raises
        FileExistsError on a lost version race (caller retries or
        surfaces it, mirroring ``_commit_manifest``)."""
        manifest.setdefault("root", self.vroot)
        self.store.client().put_object(
            self._manifest_key(version),
            json.dumps(manifest).encode(),
            if_none_match=True,
        )
        return version

    def first_manifest(
        self,
        files: list[str],
        schema_json: str,
        snap_rel: str,
        partition_by: list[str] | None = None,
    ) -> dict:
        import time

        return {
            "version": 1,
            "committed_at": time.time(),
            "files": files,
            "schema": schema_json,
            "base": f"{self.vroot}/{snap_rel}",
            "partition_by": list(partition_by or []),
            # version 1 of an append-born table: its full file list IS
            # the appended delta (the version-stream reader's contract)
            "appended_files": files,
        }

    def commit_overwrite(
        self,
        data_keys: list[str],
        schema_json: str,
        file_stats: dict,
        snap_rel: str,
        partition_by: list[str] | None = None,
        expected_version: int | None = None,
        extra: dict | None = None,
    ) -> int:
        """Replace the table state as the next version. Two committers
        racing on the same version number are arbitrated by the
        conditional PUT (the loser raises, never clobbers); pass
        ``expected_version`` (the version the written state derives
        from — round 16, Delta's read-version conflict detection) to
        ALSO refuse when any commit landed after the caller's read:
        the publish then targets exactly ``expected_version + 1``, so
        an append sneaking in between read and publish fails this
        commit instead of silently vanishing from the new head. With
        ``partition_by`` the data keys carry Hive ``col=val`` chains
        under the snap prefix and the manifest records the scheme —
        the reader's driver-side partition pruning works unchanged."""
        import time

        versions = self.store.versions()
        latest = versions[-1] if versions else 0
        if expected_version is not None and latest != expected_version:
            raise RuntimeError(
                f"rewrite derived from version {expected_version} but "
                f"s3://{self.store.bucket}/{self.store.prefix} is at "
                f"version {latest} — a concurrent commit landed after "
                f"the read; re-derive and retry {_CONFLICT_MARKER}"
            )
        version = latest + 1
        manifest = {
            "version": version,
            "committed_at": time.time(),
            "files": [self.vpath(k) for k in sorted(data_keys)],
            "schema": schema_json,
            "base": f"{self.vroot}/{snap_rel}",
            "partition_by": list(partition_by or []),
        }
        if file_stats:
            manifest["file_stats"] = file_stats
        if versions:
            # the streaming replay watermark survives rewrites (same
            # carry as write_snapshot)
            hw = self.store.manifest(versions[-1]).get("stream_high_water")
            if hw:
                manifest["stream_high_water"] = hw
        manifest.update(extra or {})
        try:
            return self.publish(manifest, version)
        except FileExistsError:
            raise RuntimeError(
                f"version {version} already committed at "
                f"s3://{self.store.bucket}/{self.store.prefix} "
                f"{_CONFLICT_MARKER}"
            ) from None

    def commit_replace(
        self,
        data_keys: list[str],
        schema_json: str,
        file_stats: dict,
        replace_vpaths: list[str],
        expected_version: int,
        extra: dict | None = None,
    ) -> int:
        """Copy-on-write REPLACE (the ``delete_snapshot`` commit
        shape): the files named in ``replace_vpaths`` (paths in the
        READ manifest's own namespace) drop out of the carried state
        and the freshly-PUT ``data_keys`` stand in for them; every
        other file carries by reference. Schema, base, partition
        scheme, and the streaming watermark carry unchanged. Publishes
        at exactly ``expected_version + 1`` — any concurrent commit
        makes this raise (conflict marker) rather than lose rows."""
        import time

        versions = self.store.versions()
        latest = versions[-1] if versions else 0
        if latest != expected_version:
            raise RuntimeError(
                f"replace derived from version {expected_version} but "
                f"s3://{self.store.bucket}/{self.store.prefix} is at "
                f"version {latest} — a concurrent commit landed after "
                f"the read; re-derive and retry {_CONFLICT_MARKER}"
            )
        latest_m = self.store.manifest(latest)
        old_root = latest_m.get("root")
        if old_root is None:
            raise ValueError(
                "latest manifest lacks the table 'root' field "
                "(committed before round 13) — recommit or delete "
                "through a local mount"
            )
        replaced = set(replace_vpaths)
        carried = [
            self.re_root(f, old_root)
            for f in _manifest_files(
                latest_m, open_json=self.store.json_loader(old_root)
            )
            if f not in replaced
        ]
        merged_stats = {
            self.re_root(p, old_root): s
            for p, s in (latest_m.get("file_stats") or {}).items()
            if p not in replaced
        }
        merged_stats.update(file_stats)
        version = latest + 1
        manifest = {
            "version": version,
            "committed_at": time.time(),
            "files": carried + [self.vpath(k) for k in sorted(data_keys)],
            "schema": latest_m["schema"],
            "base": self.re_root(latest_m["base"], old_root),
            "partition_by": list(latest_m.get("partition_by") or []),
        }
        if merged_stats:
            manifest["file_stats"] = merged_stats
        hw = latest_m.get("stream_high_water")
        if hw:
            manifest["stream_high_water"] = hw
        manifest.update(extra or {})
        try:
            return self.publish(manifest, version)
        except FileExistsError:
            raise RuntimeError(
                f"version {version} already committed at "
                f"s3://{self.store.bucket}/{self.store.prefix} "
                f"{_CONFLICT_MARKER}"
            ) from None

    def commit_append(
        self,
        data_keys: list[str],
        schema_json: str,
        file_stats: dict,
        snap_rel: str,
        expected_schema: str | None = None,
        extra: dict | None = None,
        stream_mark: tuple[str, int] | None = None,
        partition_by: list[str] | None = None,
    ) -> int:
        """Optimistic-concurrency append on the store —
        ``snapshots.commit_append`` re-expressed over conditional PUT:
        every retry re-lists versions, re-validates the schema AND the
        partition scheme, and re-runs the streaming high-water replay
        check on the FRESH latest manifest. ``partition_by`` declares
        the Hive scheme the delta keys were written under (empty/None
        for flat keys); it must match the committed table's scheme —
        a mismatch means the data objects carry the wrong key chains
        for the table, so the commit refuses rather than publishing a
        manifest whose declared scheme contradicts its files."""
        import time

        new_vpaths = [self.vpath(k) for k in sorted(data_keys)]
        delta_parts = list(partition_by or [])
        last_err: Exception | None = None
        for _ in range(_APPEND_RETRIES):
            versions = self.store.versions()
            if not versions:
                manifest = self.first_manifest(
                    new_vpaths, schema_json, snap_rel,
                    partition_by=delta_parts,
                )
                if file_stats:
                    manifest["file_stats"] = file_stats
                if stream_mark is not None:
                    app_id, batch_id = stream_mark
                    manifest["stream_high_water"] = {app_id: batch_id}
                manifest.update(extra or {})
                try:
                    return self.publish(manifest, 1)
                except FileExistsError as e:  # raced table creation
                    last_err = e
                    continue
            latest = self.store.manifest(versions[-1])
            high_water = dict(latest.get("stream_high_water") or {})
            if stream_mark is not None:
                app_id, batch_id = stream_mark
                if high_water.get(app_id, -1) >= batch_id:
                    return latest["version"]  # replayed batch — drop
                high_water[app_id] = batch_id
            if expected_schema is not None and _schema_fields(
                latest["schema"]
            ) != _schema_fields(expected_schema):
                raise ValueError(
                    "append aborted: table schema changed under the "
                    "append (a rewrite committed mid-append at "
                    f"s3://{self.store.bucket}/{self.store.prefix}); "
                    "the delta objects were written against the old schema"
                )
            committed_parts = list(latest.get("partition_by") or [])
            if committed_parts != delta_parts:
                raise ValueError(
                    "append aborted: the table is partitioned by "
                    f"{committed_parts} but the delta objects were "
                    f"written under partition scheme {delta_parts} (a "
                    "rewrite or raced table creation changed the layout "
                    "mid-append at "
                    f"s3://{self.store.bucket}/{self.store.prefix}); "
                    "their key chains would contradict the manifest"
                )
            old_root = latest.get("root")
            if old_root is None:
                raise ValueError(
                    "latest manifest lacks the table 'root' field "
                    "(committed before round 13) — recommit or append "
                    "through a local mount"
                )
            old_files = [
                self.re_root(f, old_root)
                for f in _manifest_files(
                    latest, open_json=self.store.json_loader(old_root)
                )
            ]
            merged_stats = {
                self.re_root(p, old_root): s
                for p, s in (latest.get("file_stats") or {}).items()
            }
            merged_stats.update(file_stats)
            version = versions[-1] + 1
            manifest = {
                "version": version,
                "committed_at": time.time(),
                "schema": latest["schema"],
                "base": self.re_root(latest["base"], old_root),
                "files": old_files + new_vpaths,
                "appended_files": new_vpaths,
                "appended_to": versions[-1],
                "partition_by": committed_parts,
            }
            if merged_stats:
                manifest["file_stats"] = merged_stats
            if high_water:
                manifest["stream_high_water"] = high_water
            manifest.update(extra or {})
            try:
                return self.publish(manifest, version)
            except FileExistsError as e:  # lost the version race
                last_err = e
        raise RuntimeError(
            f"append lost the commit race {_APPEND_RETRIES} times at "
            f"s3://{self.store.bucket}/{self.store.prefix}; giving up"
        ) from last_err


def _put_parquet(store, tbl, key: str) -> None:
    import io

    import pyarrow.parquet as pq

    buf = io.BytesIO()
    pq.write_table(tbl, buf)
    store.client().put_object(key, buf.getvalue())


def _write_one_object(store, schema, snap_rel: str, iterator,
                      part_cols: list[str] | None = None):
    """Executor body shared by the batch writer and the stream sink:
    Arrow batches → one parquet object under the task-private snap
    prefix (one object PER occupied partition-value combination when
    ``part_cols`` is set — partition columns live in the Hive key
    chain, not the data bytes); returns the commit message."""
    import uuid

    import pyarrow as pa
    from pyspark.sql.pandas.types import to_arrow_schema

    batches = list(iterator)
    rows = sum(b.num_rows for b in batches)
    if part_cols:
        if rows == 0:
            return _S3PartWriteMessage([], 0)
        from tile_processor_spark.sources.snapshot_datasource import (
            _hive_chain,
            _split_by_partitions,
        )

        target = to_arrow_schema(schema)
        tbl = pa.Table.from_batches(batches).cast(target)
        staged: list[tuple[str, dict | None]] = []
        for values, sub in _split_by_partitions(tbl, part_cols):
            chain = _hive_chain(part_cols, values)
            key = (
                f"{store.prefix}/{snap_rel}/{chain}/"
                f"part-{uuid.uuid4().hex}.parquet"
            )
            _put_parquet(store, sub, key)
            staged.append((key, _arrow_stats(sub)))
        return _S3PartWriteMessage(staged, rows)
    if rows == 0:
        return _S3WriteMessage(None, 0, None)
    target = to_arrow_schema(schema)
    tbl = pa.Table.from_batches(batches).cast(target)
    key = f"{store.prefix}/{snap_rel}/part-{uuid.uuid4().hex}.parquet"
    _put_parquet(store, tbl, key)
    return _S3WriteMessage(key, rows, _arrow_stats(tbl))


def _message_files(messages) -> list[tuple[str, dict | None]]:
    """Flatten commit messages into (key, stats) pairs."""
    out: list[tuple[str, dict | None]] = []
    for m in messages:
        if m is None:
            continue
        if isinstance(m, _S3PartWriteMessage):
            out.extend(m.files)
        elif m.key:
            out.append((m.key, m.stats))
    return out


def _drop_staged_objects(store, messages) -> None:
    """Abort path: best-effort DELETE of acknowledged objects (anything
    missed stays invisible and ages into vacuum_store's sweep)."""
    for key, _stats in _message_files(messages):
        try:
            store.client().delete_object(key)
        except Exception:
            pass


def _collect_file_stats(committer, messages) -> dict:
    return {
        committer.vpath(key): stats
        for key, stats in _message_files(messages)
        if stats
    }


class S3SnapshotWriter(DataSourceArrowWriter):
    """Batch writes against an ``s3://`` table path. ``mode('append')``
    = optimistic-concurrency append commit; ``mode('overwrite')`` (or a
    first write) replaces the table state. The writer pickles to
    executors with a client-less store (rebuilt lazily per process)."""

    def __init__(self, schema: StructType, options: dict, overwrite: bool):
        import uuid

        from tile_processor_spark.sources.snapshot_datasource import (
            S3SnapshotStore,
        )

        self._schema = schema
        self._store = S3SnapshotStore(options["path"], dict(options))
        self._overwrite = overwrite
        self._snap_rel = f"data/{uuid.uuid4().hex}"
        self._expected_schema: str | None = None
        # round 16: read-version conflict detection + exact-version /
        # audit plumbing for the function API (upsert/delete) — see
        # snapshots._write_snapshot_s3
        ev = options.get("expected_version")
        self._expected_version = int(ev) if ev is not None else None
        self._extra = json.loads(options.get("commit_extra", "{}")) or None
        raw_replace = options.get("replace_files")
        self._replace = (
            json.loads(raw_replace) if raw_replace is not None else None
        )
        if self._replace is not None and not overwrite:
            raise ValueError(
                "replace_files requires mode('overwrite') — a replace "
                "commit rewrites part of the table state"
            )
        if self._replace is not None and self._expected_version is None:
            raise ValueError(
                "replace_files requires expected_version — a replace "
                "commit is only sound against the exact state it read"
            )
        raw_parts = options.get("partition_by", "")
        self._part_cols = [c.strip() for c in raw_parts.split(",") if c.strip()]
        bad = [c for c in self._part_cols if c not in schema.fieldNames()]
        if bad:
            raise ValueError(
                f"partition_by column(s) {bad} not in the written "
                f"schema {schema.fieldNames()}"
            )
        if self._part_cols and len(self._part_cols) == len(schema.fields):
            raise ValueError(
                "partition_by covers every column — the data files "
                "would be empty; leave at least one data column"
            )
        if self._replace is not None:
            # a replace carries the COMMITTED schema forward — data
            # written against a drifted schema would contradict it
            versions = self._store.versions()
            if versions:
                committed = json.loads(
                    self._store.manifest(versions[-1])["schema"]
                )
                want = [(f["name"], f["type"]) for f in committed["fields"]]
                got = [(f.name, f.dataType.jsonValue()) for f in schema.fields]
                if got != want:
                    raise ValueError(
                        f"replace schema {got} does not match committed {want}"
                    )
        if not overwrite:
            versions = self._store.versions()
            if versions:
                latest = self._store.manifest(versions[-1])
                committed_parts = list(latest.get("partition_by") or [])
                if self._part_cols and self._part_cols != committed_parts:
                    raise ValueError(
                        f"partition_by option {self._part_cols} does "
                        "not match the committed table's scheme "
                        f"{committed_parts} — appends inherit the "
                        "table's partitioning (omit the option)"
                    )
                # appends onto a partitioned table inherit its scheme:
                # executors write Hive col=val chains under their own
                # snap prefix; the reader prunes from the manifest, so
                # no shared-tree re-home is needed (module docstring)
                self._part_cols = committed_parts
                committed = json.loads(latest["schema"])
                want = [(f["name"], f["type"]) for f in committed["fields"]]
                got = [(f.name, f.dataType.jsonValue()) for f in schema.fields]
                if got != want:
                    raise ValueError(
                        f"append schema {got} does not match committed {want}"
                    )
                # re-validated at commit time against the FRESH latest
                # manifest inside the retry loop
                self._expected_schema = latest["schema"]

    def write(self, iterator):
        return _write_one_object(
            self._store, self._schema, self._snap_rel, iterator,
            part_cols=self._part_cols or None,
        )

    def commit(self, messages) -> None:
        committer = S3SnapshotCommitter(self._store)
        keys = sorted(key for key, _st in _message_files(messages))
        stats = _collect_file_stats(committer, messages)
        if self._replace is not None:
            committer.commit_replace(
                keys,
                self._schema.json(),
                stats,
                self._replace,
                self._expected_version,
                extra=self._extra,
            )
        elif self._overwrite:
            committer.commit_overwrite(
                keys, self._schema.json(), stats, self._snap_rel,
                partition_by=self._part_cols or None,
                expected_version=self._expected_version,
                extra=self._extra,
            )
        else:
            # mode('append') always goes through commit_append —
            # partitioned or not. Its empty-table branch creates v1 AND
            # retries on a raced table creation (two jobs appending to
            # a new table must BOTH land, one as v1 and one as v2;
            # commit_overwrite's single-writer contract would fail the
            # loser outright — and routing a raced partitioned creation
            # through commit_overwrite would silently REPLACE the
            # winner's data under append semantics)
            committer.commit_append(
                keys,
                self._schema.json(),
                stats,
                self._snap_rel,
                # the files were written against self._schema; an
                # existing table validated (name, type) equality at
                # init, and a raced creator with a DIFFERENT schema
                # must fail this check inside the retry, not commit
                # files the manifest's declared schema contradicts
                expected_schema=self._schema.json(),
                extra=self._extra,
                # likewise the delta's key chains were written under
                # this scheme; a raced creator with a DIFFERENT scheme
                # must fail the partition check inside the retry
                partition_by=self._part_cols or None,
            )

    def abort(self, messages) -> None:
        _drop_staged_objects(self._store, messages)


class S3SnapshotStreamWriter(DataSourceStreamArrowWriter):
    """Streaming SINK against an ``s3://`` table path: every micro-batch
    lands as one append commit via conditional PUT, with the same
    exactly-once replay contract as the local sink — a per-app
    high-water batch id (``stream_high_water``, keyed by
    ``.option('stream_app_id', ...)``) carried in every manifest and
    re-checked on the fresh latest manifest inside every retry, so a
    replayed batch is dropped even when other commits landed in
    between (Delta's txnAppId/txnVersion shape). A dropped replay's
    objects stay orphans for ``vacuum_store``."""

    def __init__(self, schema: StructType, options: dict, overwrite: bool):
        from tile_processor_spark.sources.snapshot_datasource import (
            S3SnapshotStore,
        )

        self._schema = schema
        self._store = S3SnapshotStore(options["path"], dict(options))
        self._app_id = options.get("stream_app_id", "default")
        self._committed_schema: str | None = None
        # a PARTITIONED sink table inherits the committed scheme: each
        # micro-batch's objects carry Hive key chains under their own
        # stream snap prefix, exactly like the batch appender
        self._part_cols: list[str] = []
        versions = self._store.versions()
        if versions:
            latest = self._store.manifest(versions[-1])
            self._part_cols = list(latest.get("partition_by") or [])
            self._committed_schema = latest.get("schema")
            if self._committed_schema is not None:
                # validate writer-vs-committed NOW (the batch writer's
                # init check): a stream whose query schema drifted from
                # the table must refuse before appending objects the
                # manifest's declared schema contradicts —
                # commit_append's expected_schema only guards
                # committed-vs-fresh-latest
                committed = json.loads(self._committed_schema)
                want = [(f["name"], f["type"]) for f in committed["fields"]]
                got = [(f.name, f.dataType.jsonValue()) for f in schema.fields]
                if got != want:
                    raise ValueError(
                        f"stream write schema {got} does not match "
                        f"committed {want}"
                    )

    def write(self, iterator):
        import uuid

        return _write_one_object(
            self._store, self._schema, f"data/stream-{uuid.uuid4().hex}",
            iterator, part_cols=self._part_cols or None,
        )

    def commit(self, messages, batchId: int) -> None:
        committer = S3SnapshotCommitter(self._store)
        keys = sorted(key for key, _st in _message_files(messages))
        stats = _collect_file_stats(committer, messages)
        # per-batch snap_rel only matters for a FIRST commit's base;
        # the writer lays keys as <prefix>/data/stream-<uuid>/[chain/]
        # part-*.parquet, so the snap prefix is the first two segments
        # under the table prefix (a partitioned key's chain must NOT
        # leak into the base, or partition parsing would miss it)
        snap_rel = (
            "/".join(keys[0][len(self._store.prefix) + 1:].split("/")[:2])
            if keys
            else "data/empty"
        )
        committer.commit_append(
            keys,
            self._schema.json(),
            stats,
            snap_rel,
            expected_schema=self._committed_schema,
            extra={"stream_batch_id": batchId},
            stream_mark=(self._app_id, batchId),
            partition_by=self._part_cols or None,
        )

    def abort(self, messages, batchId: int) -> None:
        _drop_staged_objects(self._store, messages)
