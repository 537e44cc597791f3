"""Snapshot tables as a PySpark Python Data Source (Spark 4 API):

    spark.dataSource.register(SnapshotDataSource)
    spark.read.format("tps_snapshot")
         .option("path", table_path)
         .option("version", 3)                      # optional: time travel
         .option("partition_filter", '{"yr": ["2024"]}')  # optional: pruning
         .load()

Why a connector when ``read_snapshot`` exists: the function API resolves
the manifest and hands Spark a parquet file list — the FAST path (JVM
scan, vectorized, pushdown). The connector expresses the same table
semantics through Spark's source interface, which is what third-party
tooling speaks (``spark.read.format(...)`` with options, SQL `USING`),
and it is the natural seam for payloads that are NOT parquet later.
Partition planning happens in ``partitions()``: one input partition per
data file, with manifest-level partition-filter pruning applied
driver-side BEFORE Spark schedules anything — the same Iceberg-style
file skip as ``read_snapshot(partition_filter=...)``, expressed in the
DSv2-style planning hook. Reads yield Arrow record batches (the
vectorized lane of the Python source API), with Hive-style partition
column values re-attached as constant Arrow columns cast to the
COMMITTED dtype (no path-inference drift by construction).
"""

from __future__ import annotations

import json

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamArrowWriter,
    DataSourceStreamReader,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

from tile_processor_spark.sources.snapshots import (
    _bucket_sort_key,
    _manifest_files,
    _partition_values,
    _read_manifest,
    list_versions,
)

FORMAT_NAME = "tps_snapshot"


class S3SnapshotStore:
    """Object-store-RESIDENT snapshot table reads: ``.option("path",
    "s3://bucket/prefix")`` resolves manifests, group side files, and
    parquet data through the dependency-free SigV4 client instead of
    the local filesystem — the read half of the S3 story (the commit
    half is ``commit_fs.S3CommitFS``; together a table mirrored under
    a prefix is fully usable without a local copy).

    Path translation: every manifest records the table ``root`` it was
    committed under (``snapshots._commit_manifest``), so the absolute
    local paths inside it map to ``prefix + relpath(path, root)`` —
    exactly the key layout ``S3CommitFS`` produces when its mount is
    the table root. Planning stays driver-side and cheap: versions and
    data-file SIZES come from ONE ListObjectsV2 pass (no per-file
    HEADs), pruning runs on the manifest before any data fetch, and
    executors fetch only their partitions' objects.

    Client config comes from read options ``s3_endpoint``,
    ``s3_access_key``, ``s3_secret_key``, ``s3_region`` (or env
    ``SPARK_GRAFT_S3_ENDPOINT`` / ``_ACCESS_KEY`` / ``_SECRET_KEY`` /
    ``_REGION``). The store pickles to executors WITHOUT its client
    (rebuilt lazily per process)."""

    def __init__(self, path: str, options: dict):
        from tile_processor_spark.sources.s3_client import (
            parse_s3_url,
            resolve_s3_config,
        )

        self.bucket, self.prefix = parse_s3_url(path, "s3 table path")
        cfg = resolve_s3_config(options, "s3:// snapshot tables")
        self.endpoint = cfg["endpoint"]
        self.access_key = cfg["access_key"]
        self.secret_key = cfg["secret_key"]
        self.region = cfg["region"]
        self._client = None

    def __getstate__(self):
        d = dict(self.__dict__)
        d["_client"] = None
        return d

    def client(self):
        if self._client is None:
            from tile_processor_spark.sources.s3_client import S3Client

            self._client = S3Client(
                self.endpoint, self.bucket, self.access_key,
                self.secret_key, region=self.region,
            )
        return self._client

    # -- manifest plane (driver-side) --------------------------------

    def versions(self) -> list[int]:
        pre = f"{self.prefix}/manifest-v"
        out = []
        for k in self.client().list_objects(pre):
            name = k.rsplit("/", 1)[-1]
            if name.startswith("manifest-v") and name.endswith(".json"):
                out.append(int(name[len("manifest-v"):-len(".json")]))
        return sorted(out)

    def manifest(self, version: int) -> dict:
        key = f"{self.prefix}/manifest-v{version:08d}.json"
        return json.loads(self.client().get_object(key))

    def key_for(self, local_path: str, root: str) -> str:
        import os

        rel = os.path.relpath(local_path, root)
        if rel.startswith(".."):
            raise ValueError(
                f"manifest references {local_path!r} outside table root "
                f"{root!r} — not mirrorable to a key prefix"
            )
        return f"{self.prefix}/{rel.replace(os.sep, '/')}"

    def data_sizes(self) -> dict[str, int]:
        """One listing pass over the table prefix → key→size map for
        the planner's bin-packing."""
        return dict(self.client().list_objects_sizes(self.prefix + "/"))

    def json_loader(self, root: str):
        def _load(local_path: str) -> dict:
            return json.loads(self.client().get_object(self.key_for(local_path, root)))

        return _load

    # -- data plane (executor-side) -----------------------------------

    def fetch(self, key: str) -> bytes:
        return self.client().get_object(key)


def _make_store(options: dict) -> S3SnapshotStore | None:
    path = options.get("path", "")
    return S3SnapshotStore(path, options) if path.startswith("s3://") else None


def _require_root(manifest: dict, path: str) -> str:
    """The table ``root`` every store-resident code path needs for
    key translation — with the same friendly contract as the read
    paths (``_resolve_manifest``) instead of a bare ``KeyError`` when
    a pre-round-13 manifest lacks it."""
    root = manifest.get("root")
    if root is None:
        raise ValueError(
            f"manifest v{manifest.get('version', '?')} at {path} lacks "
            "the table 'root' field (committed before round 13) — "
            "recommit or maintain the table from a local path"
        )
    return root


def vacuum_store(
    path: str,
    options: dict | None = None,
    keep_last: int = 2,
    claim_ttl_s: float = 86400.0,
    force: bool = False,
) -> dict:
    """VACUUM for an S3-RESIDENT snapshot mirror: drop all but the last
    ``keep_last`` manifests and delete data objects no retained
    manifest references — the object-store twin of
    ``snapshots.vacuum`` (whose local ``os.unlink`` calls never reach
    the mirror). Same crash-safe ordering: retired MANIFESTS delete
    first, then newly-unreferenced data keys — an interruption leaves
    extra objects (harmless, re-vacuumable), never a manifest pointing
    at deleted data.

    ``claim_ttl_s`` is the retention window for unreferenced DATA keys
    (Delta's VACUUM retention check): appends upload their data objects
    BEFORE the manifest commit, so an unreferenced-but-young key may be
    an in-flight append's staged data — reclaiming it would let the
    append publish a manifest pointing at deleted objects. Only keys
    whose LastModified (from the same single listing pass) is older
    than the window are reclaimed; a missing LastModified counts as too
    young (never-delete is sound, wrongly-delete is data loss). The
    CONTRACT: ``claim_ttl_s`` must exceed the longest
    staging-to-publish duration of any writer on the table — a commit
    that outlasts the window re-opens the race. The 24 h default covers
    multi-hour large-table writes; pass ``claim_ttl_s=0`` only under
    declared writer quiescence.

    Also sweeps ORPHANED MULTIPART UPLOADS under the table prefix older
    than the same window (ListMultipartUploads + Abort): a writer crash
    between CreateMultipartUpload and Complete/Abort leaves parts
    invisible but billed forever.

    Deletion scope is conservative: only retired manifest keys and
    unreferenced keys under the table's data roots (every retained
    manifest's ``base``/group side files stay). Keys the tool does not
    recognize (sidecars, foreign objects under the prefix) are left
    alone. Cost: one object listing + one upload listing + one manifest
    read per version + one DELETE per reclaimed object.

    ``keep_last=0`` retires EVERY version including the live head —
    refused unless ``force=True``."""
    import time as _time

    if keep_last <= 0 and not force:
        raise ValueError(
            "vacuum_store(keep_last=0) retires every version including "
            "the live head (the table becomes unreadable) — pass "
            "force=True to destroy the mirror on purpose"
        )
    store = S3SnapshotStore(path, options or {})
    versions = store.versions()
    kept = versions[-keep_last:] if keep_last > 0 else []
    retired = [v for v in versions if v not in kept]
    referenced: set[str] = set()
    data_prefixes: set[str] = set()
    for v in kept:
        m = store.manifest(v)
        root = _require_root(m, path)
        files = _manifest_files(m, open_json=store.json_loader(root))
        referenced |= {store.key_for(f, root) for f in files}
        for g in m.get("groups") or []:
            referenced.add(store.key_for(g["path"], root))
        data_prefixes.add(store.key_for(m["base"], root).rstrip("/") + "/")
    # retired manifests' data dirs are reclaim candidates too
    for v in retired:
        m = store.manifest(v)
        root = _require_root(m, path)
        data_prefixes.add(store.key_for(m["base"], root).rstrip("/") + "/")
    # the table's own data/ prefix is always a candidate: s3-native
    # appends stage under data/<uuid>/ prefixes no manifest's "base"
    # covers, and a crashed/aborted write's objects must age into the
    # sweep (the local vacuum's walk of data/ has the same scope)
    data_prefixes.add(f"{store.prefix}/data/")
    client = store.client()
    removed_manifests = 0
    for v in retired:  # manifests first (crash-safe ordering)
        client.delete_object(f"{store.prefix}/manifest-v{v:08d}.json")
        removed_manifests += 1
    removed_files = 0
    cutoff = _time.time() - claim_ttl_s
    from tile_processor_spark.sources.snapshots import _GROUPS_DIR

    # group side objects (compact_store / mirrored compact_manifest
    # layouts) retire with their manifests, exactly like the local
    # vacuum's groups sweep; the retention window guards an in-flight
    # commit's freshly-written side objects
    groups_prefix = f"{store.prefix}/{_GROUPS_DIR}/"
    for key, _size, mtime in client.list_objects_meta(store.prefix + "/"):
        if key in referenced:
            continue
        base = key.rsplit("/", 1)[-1]
        if key.startswith(groups_prefix):
            if not base.endswith(".json"):
                continue
        elif not any(key.startswith(p) for p in data_prefixes):
            continue
        elif not (
            base.endswith(".parquet")
            or base.startswith("_")
            or base.startswith(".")
        ):
            # same filename scope as the local vacuum: foreign objects
            # a user parked under the data prefix are not ours to
            # delete (the docstring's conservative-scope promise)
            continue
        if mtime is None or mtime > cutoff:
            continue  # in-flight-append grace: too young to reclaim
        client.delete_object(key)
        removed_files += 1
    uploads_aborted = 0
    for key, upload_id, initiated in client.list_multipart_uploads(
        store.prefix + "/"
    ):
        if initiated is None or initiated > cutoff:
            continue  # may be a live upload — leave it for a later sweep
        client.abort_multipart_upload(key, upload_id)
        uploads_aborted += 1
    return {
        "retired_versions": retired,
        "kept_versions": kept,
        "manifests_removed": removed_manifests,
        "files_removed": removed_files,
        "uploads_aborted": uploads_aborted,
    }


def compact_store(
    path: str,
    options: dict | None = None,
    version: int | None = None,
    group_files: int = 100,
    allow_rollback: bool = False,
) -> int:
    """``compact_manifest`` for an S3-RESIDENT table (round 15): rewrite
    a committed version's flat manifest into the two-level grouped
    layout and publish it as the NEXT version via conditional PUT —
    entirely driver-side metadata work (one GET per source manifest,
    one PUT per group side object, one conditional PUT), zero data
    bytes moved. Previously a mirror had to be compacted locally and
    re-mirrored; now the maintenance plane (compact + vacuum) is fully
    store-native.

    Grouping matches the local compactor exactly (shared bucketing
    rules): one group per partition value on partitioned tables — so
    ``partition_filter`` reads open only matching groups' side
    objects — else ``group_files``-sized chunks, bounding the top
    manifest at O(partitions) / O(files ÷ chunk). Group side objects
    land under ``<prefix>/groups/`` and are recorded against the
    source manifest's root, so ``key_for`` resolves them like every
    other side file. Same rollback guard as the local path: compacting
    a non-latest version without ``allow_rollback=True`` refuses (it
    would commit an older file set as the new head). The streaming
    replay watermark carries from the CURRENT head, never backwards."""
    import time as _time
    import uuid as _uuid

    from tile_processor_spark.sources.snapshots import (
        _GROUPS_DIR,
        _merge_stats,
    )

    store = S3SnapshotStore(path, options or {})
    versions = store.versions()
    if not versions:
        raise FileNotFoundError(f"no committed snapshot at {path}")
    v = versions[-1] if version is None else int(version)
    if v not in versions:
        raise FileNotFoundError(f"version {v} not in {versions} at {path}")
    if v != versions[-1] and not allow_rollback:
        raise ValueError(
            f"compact_store(version={v}) would commit a non-latest "
            f"version's file set as the new head (latest is "
            f"{versions[-1]}), silently rolling back later appends; "
            "pass allow_rollback=True for an explicit RESTORE"
        )
    manifest = store.manifest(v)
    root = _require_root(manifest, path)
    loader = store.json_loader(root)
    files = _manifest_files(manifest, open_json=loader)
    part_cols = manifest.get("partition_by") or []
    base = manifest["base"]
    buckets: dict[tuple, list[str]] = {}
    if part_cols:
        for f in files:
            pv = _partition_values(f, base)
            buckets.setdefault(
                tuple((c, pv.get(c)) for c in part_cols), []
            ).append(f)
    else:
        ordered = sorted(files)
        for i in range(0, len(ordered), group_files):
            buckets[(("_chunk", str(i // group_files)),)] = (
                ordered[i: i + group_files]
            )
    # all stats the source version knows, through either layout
    if "groups" in manifest:
        all_stats: dict = {}
        for g in manifest["groups"]:
            side = loader(g["path"])
            all_stats.update(side.get("file_stats") or {})
    else:
        all_stats = dict(manifest.get("file_stats") or {})
    groups = []
    for key, flist in sorted(buckets.items(), key=_bucket_sort_key):
        name = f"{_GROUPS_DIR}/{_uuid.uuid4().hex}.json"
        ordered = sorted(flist)
        fstats = {f: all_stats[f] for f in ordered if f in all_stats}
        side = {"files": ordered}
        if fstats:
            side["file_stats"] = fstats
        store.client().put_object(
            f"{store.prefix}/{name}", json.dumps(side).encode()
        )
        entry = {
            "values": dict(key),
            "path": f"{root}/{name}",
            "n_files": len(ordered),
        }
        gstats = _merge_stats(ordered, all_stats)
        if gstats:
            entry["stats"] = gstats
        groups.append(entry)
    new_version = versions[-1] + 1
    new_manifest = {
        "version": new_version,
        "committed_at": _time.time(),
        "groups": groups,
        "schema": manifest["schema"],
        "base": base,
        "root": root,
        "partition_by": list(part_cols),
        "compacted_from": v,
    }
    if manifest.get("layout"):
        new_manifest["layout"] = manifest["layout"]
    hw = store.manifest(versions[-1]).get("stream_high_water")
    if hw:
        new_manifest["stream_high_water"] = hw
    from tile_processor_spark.sources.s3_snapshot_write import (
        S3SnapshotCommitter,
    )

    try:
        return S3SnapshotCommitter(store).publish(new_manifest, new_version)
    except FileExistsError:
        raise RuntimeError(
            f"version {new_version} already committed at "
            f"s3://{store.bucket}/{store.prefix} (a concurrent commit "
            "raced the compaction) — re-run compact_store"
        ) from None


def _resolve_manifest(options: dict) -> dict:
    path = options.get("path")
    if not path:
        raise ValueError("tps_snapshot requires .option('path', <table dir>)")
    store = _make_store(options)
    versions = store.versions() if store else list_versions(path)
    if not versions:
        raise FileNotFoundError(f"no committed snapshot at {path}")
    as_of = options.get("as_of")
    if as_of is not None:
        # AS OF TIMESTAMP through the connector (option value is a
        # string: epoch seconds or ISO-8601) — same resolution as
        # read_snapshot(as_of=...)
        if "version" in options:
            raise ValueError(
                "tps_snapshot: version and as_of are mutually exclusive"
            )
        from tile_processor_spark.sources.snapshots import resolve_as_of

        try:
            ts = float(as_of)
        except (TypeError, ValueError):
            ts = str(as_of)
        v = resolve_as_of(path, ts, dict(options) if store else None)
    else:
        v = int(options.get("version", versions[-1]))
    if v not in versions:
        raise FileNotFoundError(f"version {v} not in {versions} at {path}")
    manifest = store.manifest(v) if store else _read_manifest(path, v)
    if store and "root" not in manifest:
        raise ValueError(
            "manifest lacks the table 'root' field (committed before "
            "round 13) — recommit or read the table from a local path"
        )
    return manifest


class _FilePartition(InputPartition):
    def __init__(self, file_path: str, part_values: dict):
        self.file_path = file_path
        self.part_values = part_values


class _FileGroupPartition(InputPartition):
    """A bin-packed group of data files sharing one task — the
    million-small-files defense: task count scales with BYTES, not
    file count. Files in a group share identical partition values
    (grouping never crosses a Hive partition boundary)."""

    def __init__(self, files: list[str], part_values: dict):
        self.files = files
        self.part_values = part_values


class SnapshotReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self._schema = schema
        self._options = options
        self._store = _make_store(options)
        self._manifest = _resolve_manifest(options)
        raw = options.get("partition_filter")
        self._filter = json.loads(raw) if raw else None
        self._where: list[tuple] = []
        if self._filter:
            part_cols = self._manifest.get("partition_by") or []
            bad = [c for c in self._filter if c not in part_cols]
            if bad:
                raise ValueError(
                    f"partition_filter on non-partition column(s) {bad}; "
                    f"table is partitioned by {part_cols or 'nothing'}"
                )

    def partitions(self):
        """Manifest-level pruning BEFORE Spark schedules a single task
        (the planning-time file skip), then size-aware bin-packing:
        files group into ~``target_partition_bytes`` (default 128 MB)
        input partitions so TASK COUNT scales with data volume, not
        file count — a million 1 MB files plan as ~8k tasks, not a
        million. Groups never cross a Hive partition boundary. A store-
        resident table (s3:// path) plans from ONE listing pass — file
        sizes come with the keys, no per-file HEADs."""
        import os

        store = self._store
        loader = (
            store.json_loader(self._manifest["root"]) if store else None
        )
        files = _manifest_files(
            self._manifest, self._filter, self._where or None,
            open_json=loader,
        )
        only = self._options.get("only_files")
        if only is not None:
            # internal plan option (delete_snapshot's touched-subset
            # read): restrict to an explicit subset of the version's
            # files, named in manifest space — never a way to read
            # files outside the pinned manifest
            wanted = set(json.loads(only))
            files = [f for f in files if f in wanted]
        base = self._manifest["base"]
        if store:
            root = self._manifest["root"]
            sizes = store.data_sizes()
            base = store.key_for(base, root)
            files = [store.key_for(f, root) for f in files]

            def getsize(f: str) -> int:
                return sizes.get(f, 0)
        else:
            getsize = os.path.getsize
        target = int(
            self._options.get("target_partition_bytes", 128 * 1024 * 1024)
        )
        by_values: dict[tuple, list[str]] = {}
        for f in files:
            pv = _partition_values(f, base)
            by_values.setdefault(tuple(sorted(pv.items())), []).append(f)
        parts = []
        for key, flist in sorted(by_values.items()):
            group: list[str] = []
            size = 0
            for f in sorted(flist):
                fsize = getsize(f)
                if group and size + fsize > target:
                    parts.append(_FileGroupPartition(group, dict(key)))
                    group, size = [], 0
                group.append(f)
                size += fsize
            if group:
                parts.append(_FileGroupPartition(group, dict(key)))
        return parts

    def read(self, partition):
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        target = to_arrow_schema(self._schema)
        files = (
            partition.files
            if isinstance(partition, _FileGroupPartition)
            else [partition.file_path]
        )
        for fpath in files:
            if self._store:  # executor-side object fetch
                tbl = pq.read_table(pa.BufferReader(self._store.fetch(fpath)))
            else:
                tbl = pq.read_table(fpath)
            cols = []
            for field in target:
                if field.name in partition.part_values:
                    # constant Hive path value, cast to the COMMITTED dtype
                    val = pa.array(
                        [partition.part_values[field.name]] * len(tbl), pa.string()
                    ).cast(field.type)
                    cols.append(val)
                else:
                    cols.append(tbl.column(field.name).cast(field.type))
            yield from pa.table(cols, schema=target).to_batches()


class SnapshotPushdownReader(SnapshotReader):
    """``SnapshotReader`` + Spark 4.1 filter pushdown. Split into a
    SUBCLASS because Spark's planning worker hard-errors
    (``[DATA_SOURCE_PUSHDOWN_DISABLED]``) the moment a reader class
    overrides ``pushFilters`` while
    ``spark.sql.python.filterPushdown.enabled`` is false — it refuses
    to silently skip a pushdown the class advertises, and the Python
    planning worker cannot see the session conf to adapt. So the
    contract is: ``register(spark)`` enables the conf (runtime-settable,
    verified on vanilla sessions), making the default pushdown reader
    always valid in any session that can use the format at all; an
    environment whose admin pins the conf false opts out per-read with
    ``.option("pushdown", "false")``, selecting the pushFilters-free
    base reader (identical results — pushdown is pure data skipping).
    CORRECTNESS_r12's one red row was the driver's bare session hitting
    the conf-off + pushFilters-advertised combination."""

    def pushFilters(self, filters):
        """Spark 4.1 filter pushdown → manifest-level DATA SKIPPING: a
        plain ``df.filter("k > 100")`` on a connector read compiles to
        commit-time min/max exclusions, so files (and whole
        manifest-list groups) that provably hold no matching row are
        never planned as input partitions. EVERY filter is yielded
        back (Spark re-applies them row-wise), so the skip is purely
        an optimization — a file without stats scans as before."""
        from pyspark.sql.datasource import (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            LessThan,
            LessThanOrEqual,
        )

        ops = {
            EqualTo: "=",
            GreaterThan: ">",
            GreaterThanOrEqual: ">=",
            LessThan: "<",
            LessThanOrEqual: "<=",
        }
        for f in filters:
            op = ops.get(type(f))
            col = getattr(f, "attribute", None)
            val = getattr(f, "value", None)
            if (
                op
                and col
                and len(col) == 1
                and isinstance(val, (int, float, str))
            ):
                self._where.append((col[0], op, val))
            yield f  # Spark keeps evaluating every filter row-wise


class SnapshotDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> StructType:
        manifest = _resolve_manifest(self.options)
        return StructType.fromJson(json.loads(manifest["schema"]))

    def reader(self, schema: StructType) -> SnapshotReader:
        # pushdown reader by default (register() guarantees the session
        # conf); .option("pushdown", "false") opts into the
        # pushFilters-free base reader for conf-locked environments
        opt = str(self.options.get("pushdown", "true")).lower()
        cls = SnapshotReader if opt == "false" else SnapshotPushdownReader
        return cls(schema, self.options)

    def streamReader(self, schema: StructType) -> "SnapshotStreamReader":
        return SnapshotStreamReader(schema, self.options)

    def writer(self, schema: StructType, overwrite: bool):
        if self._is_s3():
            from tile_processor_spark.sources.s3_snapshot_write import (
                S3SnapshotWriter,
            )

            return S3SnapshotWriter(schema, dict(self.options), overwrite)
        return SnapshotWriter(schema, self.options, overwrite)

    def streamWriter(self, schema: StructType, overwrite: bool):
        if self._is_s3():
            from tile_processor_spark.sources.s3_snapshot_write import (
                S3SnapshotStreamWriter,
            )

            return S3SnapshotStreamWriter(schema, dict(self.options), overwrite)
        return SnapshotStreamWriter(schema, self.options, overwrite)

    def _is_s3(self) -> bool:
        return str(self.options.get("path", "")).startswith("s3://")


def register(spark) -> None:
    """Idempotent format registration for the current session.

    Also enables ``spark.sql.python.filterPushdown.enabled`` (runtime
    SQL conf, default FALSE in Spark 4.1) — UNLESS the session set it
    explicitly: the default reader class advertises ``pushFilters`` for
    manifest min/max data skipping, and Spark's planning worker
    hard-errors rather than silently skipping an advertised pushdown
    when the conf is off. Enabling it here makes
    ``spark.read.format('tps_snapshot')`` work on a vanilla session —
    the exact combination the engine's own session factory masked until
    a bare driver session exposed it (CORRECTNESS_r12) — while an
    admin-pinned value (either way) is respected, never silently
    overridden (ADVICE r13); pinned-false environments read with
    ``.option("pushdown", "false")`` (identical results, no skipping).
    """
    from tile_processor_spark.sources.ds_conf import ensure_python_pushdown_conf

    ensure_python_pushdown_conf(spark)
    spark.dataSource.register(SnapshotDataSource)


class SnapshotStreamReader(DataSourceStreamReader):
    """Version-stream over an append-only snapshot table: offsets are
    COMMITTED VERSION NUMBERS, each micro-batch carries exactly the
    rows of the versions in ``(start, end]`` — read from those
    versions' ``appended_files``, so a batch is the appended delta,
    never a re-emit of table history. Replayable by construction
    (versions are immutable until vacuum), which is what makes the
    offsets real checkpoint currency: a restarted query re-reads the
    same versions and gets the same batches.

    Non-append versions (write_snapshot rewrites, upserts, compaction)
    have no ``appended_files``; streaming across one raises rather
    than silently re-emitting or skipping data — the same contract as
    Delta's streaming source without ``ignoreChanges``."""

    def __init__(self, schema: StructType, options: dict):
        self._schema = schema
        self._path = options.get("path")
        if not self._path:
            raise ValueError("tps_snapshot stream requires .option('path', ...)")
        # s3:// mirrors stream too: offsets and appended files resolve
        # through the store; data fetches happen executor-side
        self._store = _make_store(options)
        starting = options.get("starting_version")
        self._initial = (
            int(starting)
            if starting is not None
            else (self._versions() or [0])[-1] if options.get(
                "latest_only", "false"
            ).lower() == "true" else 0
        )

    def _versions(self) -> list[int]:
        return self._store.versions() if self._store else list_versions(self._path)

    def _manifest(self, v: int) -> dict:
        return (
            self._store.manifest(v) if self._store else _read_manifest(self._path, v)
        )

    def initialOffset(self) -> dict:
        return {"version": self._initial}

    def latestOffset(self) -> dict:
        versions = self._versions()
        return {"version": versions[-1] if versions else self._initial}

    def partitions(self, start: dict, end: dict):
        parts: list[_FilePartition] = []
        for v in range(start["version"] + 1, end["version"] + 1):
            manifest = self._manifest(v)
            appended = manifest.get("appended_files")
            if appended is None:
                # version 1 of a table born by append_snapshot is a
                # plain write: its full file list IS the appended delta
                if manifest.get("version") == 1 and "files" in manifest:
                    appended = manifest["files"]
                else:
                    raise ValueError(
                        f"version {v} is not an append commit; the "
                        "version stream cannot represent a rewrite "
                        "without re-emitting history"
                    )
            base = manifest["base"]
            if self._store:
                root = manifest.get("root")
                if root is None:
                    # same contract as the batch path (_resolve_manifest):
                    # a pre-round-13 manifest has no key-translation root
                    raise ValueError(
                        f"version {v} manifest lacks the table 'root' "
                        "field (committed before round 13) — recommit or "
                        "stream the table from a local path"
                    )
                base = self._store.key_for(base, root)
                appended = [self._store.key_for(f, root) for f in appended]
            parts.extend(
                _FilePartition(f, _partition_values(f, base)) for f in appended
            )
        return parts

    def read(self, partition):
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        target = to_arrow_schema(self._schema)
        if self._store:
            tbl = pq.read_table(
                pa.BufferReader(self._store.fetch(partition.file_path))
            )
        else:
            tbl = pq.read_table(partition.file_path)
        cols = []
        for field in target:
            if field.name in partition.part_values:
                # Hive path value (shared-tree partitioned appends),
                # cast to the committed dtype like the batch reader
                cols.append(
                    pa.array(
                        [partition.part_values[field.name]] * len(tbl),
                        pa.string(),
                    ).cast(field.type)
                )
            else:
                cols.append(tbl.column(field.name).cast(field.type))
        yield from pa.table(cols, schema=target).to_batches()

    def commit(self, end: dict) -> None:
        pass  # versions are retained until vacuum; nothing to ack


class _WriteMessage(WriterCommitMessage):
    def __init__(self, file_path: str | None, rows: int):
        self.file_path = file_path
        self.rows = rows


class _PartWriteMessage(WriterCommitMessage):
    """Partitioned-append commit message: (Hive ``col=val`` dir chain,
    staged file path) pairs — the driver re-homes each staged file into
    the shared tree under its chain at commit time."""

    def __init__(self, files: list[tuple[str, str]], rows: int):
        self.files = files
        self.rows = rows


_HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"

#: exactly Spark's ExternalCatalogUtils.needsEscaping set — escaping
#: MORE than this (e.g. urllib's quote of non-ASCII as UTF-8 %XX pairs)
#: would make Spark's char-wise unescapePathName decode 'café' as
#: mojibake while our byte-wise unquote decodes it correctly, so the
#: two read APIs would disagree on the same directory name
_HIVE_ESCAPE = set('"#%\'*/:=?\\{[]^\x7f') | {chr(i) for i in range(0x20)}


def _hive_escape(s: str) -> str:
    return "".join(
        f"%{ord(ch):02X}" if ch in _HIVE_ESCAPE else ch for ch in s
    )


def _hive_chain(part_cols: list[str], values: dict) -> str:
    """``grp=a/sub=b`` path chain escaped exactly like Spark's own
    ``partitionBy`` writes it (only the Hive special set; non-ASCII
    literal), so Spark's ``unescapePathName``, our byte-wise
    ``_partition_values`` decode, and ``append_snapshot``'s
    Spark-written trees all agree on every directory name."""
    segs = []
    for c in part_cols:
        v = values[c]
        if v is None:
            raise ValueError(
                f"NULL value for partition column {c!r}: the connector "
                f"append does not write {_HIVE_NULL} partitions — filter "
                "nulls or route them to an explicit sentinel value"
            )
        segs.append(f"{_hive_escape(str(c))}={_hive_escape(str(v))}")
    return "/".join(segs)


def _split_by_partitions(tbl, part_cols: list[str]):
    """Yield (values dict, sub-table WITHOUT partition columns) per
    distinct partition-value combination — partition columns live in
    the directory chain, not in the data files (Hive layout). Combo
    discovery stays vectorized in Arrow (a group_by over the partition
    columns), not a per-row Python loop: a 10M-row task pays C-speed
    hashing, then one filter per OCCUPIED combo."""
    import pyarrow.compute as pc

    combos = tbl.select(part_cols).group_by(part_cols).aggregate([]).to_pylist()
    for values in combos:
        mask = None
        for c in part_cols:
            v = values[c]
            m = pc.is_null(tbl[c]) if v is None else pc.equal(tbl[c], v)
            mask = m if mask is None else pc.and_(mask, m)
        yield values, tbl.filter(mask).drop(part_cols)


class SnapshotWriter(DataSourceArrowWriter):
    """The write side of the connector — the real two-phase commit:
    executors each write ONE parquet file into a task-private snap dir
    and return its path as the commit message; the DRIVER then commits
    a manifest referencing exactly the acknowledged files, in one
    atomic rename. A task that fails or is speculated leaves an
    unreferenced file (invisible; vacuum reclaims it) — the same
    crash-safety argument as write_snapshot, now distributed.

    ``mode('append')`` produces an append commit (previous files reused
    untouched, ``appended_files`` recorded — so the version stream can
    consume it); ``mode('overwrite')`` replaces the table state.
    Appending onto a PARTITIONED table works through the shared Hive
    tree (run ``convert_to_shared_layout`` once, same contract as
    ``append_snapshot``): each task writes per-partition-value files
    (partition columns in the directory chain, not the data files)
    into a private staging dir, and the driver re-homes them into the
    tree before the manifest commit — so pruned reads and basePath
    partition discovery keep working as appends accumulate."""

    def __init__(self, schema: StructType, options: dict, overwrite: bool):
        import os
        import uuid

        self._schema = schema
        self._path = options.get("path")
        if not self._path:
            raise ValueError("tps_snapshot write requires .option('path', ...)")
        self._path = os.path.abspath(self._path)
        self._overwrite = overwrite
        self._snap_dir = os.path.join(
            self._path, "data", uuid.uuid4().hex
        )
        self._expected_schema: str | None = None
        self._part_cols: list[str] = []
        self._tree: str | None = None
        if not overwrite:
            versions = list_versions(self._path)
            if versions:
                manifest = _read_manifest(self._path, versions[-1])
                part_cols = manifest.get("partition_by") or []
                if part_cols and manifest.get("layout") != "shared-tree":
                    raise NotImplementedError(
                        "append write on a partitioned snapshot table "
                        "needs the shared Hive tree layout (appended "
                        "files under a second snap dir would break "
                        "basePath partition discovery) — run "
                        "convert_to_shared_layout(table_path) once"
                    )
                committed = json.loads(manifest["schema"])
                want = [(f["name"], f["type"]) for f in committed["fields"]]
                got = [
                    (f.name, f.dataType.jsonValue()) for f in schema.fields
                ]
                if got != want:
                    raise ValueError(
                        f"append schema {got} does not match committed {want}"
                    )
                # re-validated at commit time against the FRESH latest
                # manifest: a rewrite racing this append must raise,
                # not commit files written against the old schema
                self._expected_schema = manifest["schema"]
                self._part_cols = list(part_cols)
                self._tree = manifest["base"] if part_cols else None

    def write(self, iterator):
        import os
        import uuid

        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        batches = list(iterator)
        rows = sum(b.num_rows for b in batches)
        target = to_arrow_schema(self._schema)
        if self._part_cols:
            if rows == 0:
                return _PartWriteMessage([], 0)
            tbl = pa.Table.from_batches(batches).cast(target)
            staged: list[tuple[str, str]] = []
            for values, sub in _split_by_partitions(tbl, self._part_cols):
                chain = _hive_chain(self._part_cols, values)
                subdir = os.path.join(self._snap_dir, *chain.split("/"))
                os.makedirs(subdir, exist_ok=True)
                fpath = os.path.join(
                    subdir, f"part-{uuid.uuid4().hex}.parquet"
                )
                pq.write_table(sub, fpath)
                staged.append((chain, fpath))
            return _PartWriteMessage(staged, rows)
        if rows == 0:
            return _WriteMessage(None, 0)
        os.makedirs(self._snap_dir, exist_ok=True)
        fpath = os.path.join(self._snap_dir, f"part-{uuid.uuid4().hex}.parquet")
        tbl = pa.Table.from_batches(batches).cast(target)
        pq.write_table(tbl, fpath)
        return _WriteMessage(fpath, rows)

    def commit(self, messages) -> None:
        import time

        from tile_processor_spark.sources.snapshots import (
            _commit_manifest,
            commit_append,
        )

        if self._part_cols:
            new_files = _rehome_staged(self._tree, messages)
            commit_append(
                self._path,
                new_files,
                allow_partitioned=True,
                expected_schema=self._expected_schema,
            )
            return
        new_files = sorted(
            m.file_path for m in messages if m is not None and m.file_path
        )
        versions = list_versions(self._path)
        if self._overwrite or not versions:
            version = (versions[-1] + 1) if versions else 1
            manifest = {
                "version": version,
                "committed_at": time.time(),
                "files": new_files,
                "schema": self._schema.json(),
                "base": self._snap_dir,
                "partition_by": [],
            }
            if versions:
                # the streaming replay watermark survives overwrites —
                # a replayed micro-batch landing after a rewrite must
                # still be dropped (same carry as write_snapshot)
                hw = _read_manifest(self._path, versions[-1]).get(
                    "stream_high_water"
                )
                if hw:
                    manifest["stream_high_water"] = hw
            _commit_manifest(self._path, manifest, version)
        else:
            # optimistic-concurrency append: commutes with concurrent
            # appends, retried on a lost version race; schema
            # re-validated against the fresh manifest inside the retry
            commit_append(
                self._path, new_files, expected_schema=self._expected_schema
            )

    def abort(self, messages) -> None:
        _drop_staged(messages)


def _staged_pairs(messages) -> list[tuple[str, str]]:
    out: list[tuple[str, str]] = []
    for m in messages:
        if m is None:
            continue
        if isinstance(m, _PartWriteMessage):
            out.extend(m.files)
        elif m.file_path:
            out.append(("", m.file_path))
    return out


def _rehome_staged(tree: str, messages) -> list[str]:
    """Move each task's staged files into the shared Hive tree under
    their ``col=val`` chain (driver-side, before the manifest commit —
    the staged files are referenced by nothing yet, so no atomicity is
    needed; see ``commit_fs.rehome``)."""
    import os
    import uuid

    from tile_processor_spark.sources.commit_fs import get_commit_fs

    fs = get_commit_fs()
    new_files: list[str] = []
    for chain, f in _staged_pairs(messages):
        subdir = os.path.join(tree, *chain.split("/")) if chain else tree
        os.makedirs(subdir, exist_ok=True)
        dst = os.path.join(subdir, f"{uuid.uuid4().hex}-{os.path.basename(f)}")
        fs.rehome(f, dst)
        new_files.append(dst)
    return sorted(new_files)


def _drop_staged(messages) -> None:
    import os

    for _chain, f in _staged_pairs(messages):
        if os.path.exists(f):
            os.unlink(f)


class SnapshotStreamWriter(DataSourceStreamArrowWriter):
    """Streaming SINK: every micro-batch lands as one append commit, so
    the snapshot table is simultaneously a streaming source and sink —
    a downstream query can stream FROM a table a pipeline streams INTO,
    version by version. Exactly-once across micro-batch RETRIES: every
    commit carries a per-app HIGH-WATER batch id forward
    (``stream_high_water`` in the manifest, keyed by
    ``.option("stream_app_id", ...)`` — default ``"default"``; set it
    per query when several streams feed one table). A replayed batch
    with id <= the stored high-water mark is dropped at commit time
    (its files stay orphans for vacuum) — Delta's txnAppId/txnVersion
    contract. The mark lives in EVERY manifest, carried forward by all
    commit paths, so interleaved appends from other writers between a
    batch's commit and its replay cannot erase the evidence (the
    failure mode of checking only the latest manifest's own marker)."""

    def __init__(self, schema: StructType, options: dict, overwrite: bool):
        import os

        self._schema = schema
        self._path = options.get("path")
        if not self._path:
            raise ValueError("tps_snapshot stream write requires .option('path', ...)")
        self._path = os.path.abspath(self._path)
        self._app_id = options.get("stream_app_id", "default")
        # a PARTITIONED sink table routes batches through the shared
        # Hive tree, exactly like the batch writer (the table must
        # exist and be converted — a stream cannot bootstrap partition
        # metadata out of nothing)
        self._part_cols: list[str] = []
        self._tree: str | None = None
        # capture the committed schema NOW: commit_append re-validates
        # it against the fresh latest manifest on every retry, so a
        # rewrite with a different schema racing a micro-batch raises
        # instead of committing a manifest whose declared schema
        # doesn't match the appended files (mirrors the batch writer)
        self._committed_schema: str | None = None
        versions = list_versions(self._path)
        if versions:
            manifest = _read_manifest(self._path, versions[-1])
            part_cols = manifest.get("partition_by") or []
            if part_cols and manifest.get("layout") != "shared-tree":
                raise NotImplementedError(
                    "streaming into a partitioned snapshot table needs "
                    "the shared Hive tree layout — run "
                    "convert_to_shared_layout(table_path) once"
                )
            self._part_cols = list(part_cols)
            self._tree = manifest["base"] if part_cols else None
            self._committed_schema = manifest.get("schema")
            if self._committed_schema is not None:
                # validate writer-vs-committed NOW, like the batch
                # writer and the s3 sink (round 15): a stream whose
                # query schema drifted from the table must refuse at
                # construction, not append files the manifest's
                # declared schema contradicts — commit_append's
                # expected_schema only guards committed-vs-fresh-latest
                want = [
                    (f["name"], f["type"])
                    for f in json.loads(self._committed_schema)["fields"]
                ]
                got = [
                    (f.name, f.dataType.jsonValue()) for f in schema.fields
                ]
                if got != want:
                    raise ValueError(
                        f"stream write schema {got} does not match "
                        f"committed {want}"
                    )

    def write(self, iterator):
        import os
        import uuid

        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        batches = list(iterator)
        rows = sum(b.num_rows for b in batches)
        target = to_arrow_schema(self._schema)
        snap_dir = os.path.join(self._path, "data", f"stream-{uuid.uuid4().hex}")
        if self._part_cols:
            if rows == 0:
                return _PartWriteMessage([], 0)
            tbl = pa.Table.from_batches(batches).cast(target)
            staged: list[tuple[str, str]] = []
            for values, sub in _split_by_partitions(tbl, self._part_cols):
                chain = _hive_chain(self._part_cols, values)
                subdir = os.path.join(snap_dir, *chain.split("/"))
                os.makedirs(subdir, exist_ok=True)
                fpath = os.path.join(subdir, f"part-{uuid.uuid4().hex}.parquet")
                pq.write_table(sub, fpath)
                staged.append((chain, fpath))
            return _PartWriteMessage(staged, rows)
        if rows == 0:
            return _WriteMessage(None, 0)
        os.makedirs(snap_dir, exist_ok=True)
        fpath = os.path.join(snap_dir, f"part-{uuid.uuid4().hex}.parquet")
        pq.write_table(pa.Table.from_batches(batches).cast(target), fpath)
        return _WriteMessage(fpath, rows)

    def commit(self, messages, batchId: int) -> None:
        import time

        from tile_processor_spark.sources.snapshots import (
            _commit_manifest,
            commit_append,
        )

        if self._part_cols:
            new_files = _rehome_staged(self._tree, messages)
            commit_append(
                self._path,
                new_files,
                extra={"stream_batch_id": batchId},
                stream_mark=(self._app_id, batchId),
                allow_partitioned=True,
                expected_schema=self._committed_schema,
            )
            return
        new_files = sorted(
            m.file_path for m in messages if m is not None and m.file_path
        )
        versions = list_versions(self._path)
        if not versions:
            manifest = {
                "version": 1,
                "committed_at": time.time(),
                "files": new_files,
                "schema": self._schema.json(),
                "base": self._path,
                "appended_files": new_files,
                "stream_batch_id": batchId,
                "stream_high_water": {self._app_id: batchId},
                "partition_by": [],
            }
            _commit_manifest(self._path, manifest, 1)
            return
        # optimistic append; the high-water replay check re-runs on the
        # fresh latest manifest inside every retry, and the mark is
        # carried forward by every other commit path, so intervening
        # appends cannot turn a replay into a duplicate
        commit_append(
            self._path,
            new_files,
            extra={"stream_batch_id": batchId},
            stream_mark=(self._app_id, batchId),
            expected_schema=self._committed_schema,
        )

    def abort(self, messages, batchId: int) -> None:
        _drop_staged(messages)
