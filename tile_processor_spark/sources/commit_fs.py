"""The filesystem contract the snapshot commit protocol stands on —
made explicit, because at 100 TB these tables live on object stores
where the POSIX idioms the local implementation uses (hard links,
atomic rename) do not exist.

The protocol (``sources/snapshots.py``) needs exactly three
primitives, each with a precise, small contract:

- ``publish_exclusive(tmp, final)`` — make the fully-written ``tmp``
  content visible at ``final`` IF AND ONLY IF ``final`` does not exist,
  atomically; raise ``FileExistsError`` otherwise. This is the ONLY
  point where two writers can conflict: of two racing committers of
  the same version number, exactly one wins. Everything else in the
  protocol writes to never-shared, uuid-named paths.
- ``rehome(src, dst)`` — move a staged file to its final home.
  ``src`` is referenced by NO manifest yet (staging dirs are private),
  so this needs no atomicity at all: a crash mid-rehome leaves an
  orphan either side, invisible to every reader, reclaimed by vacuum.
- ``share(src, dst)`` — make ``src``'s content also readable at
  ``dst`` while ``src`` stays valid (layout conversion: old manifests
  keep reading their original paths). Only requires that ``dst`` is
  complete when ``share`` returns; ``dst`` is uuid-named and
  unreferenced until the next manifest commit publishes it.

Object-store mapping (documented, not shipped — this container has no
cloud SDKs): ``publish_exclusive`` is S3 ``PutObject`` with
``If-None-Match: *`` (supported since 2024) or GCS
``ifGenerationMatch=0`` — a server-side conditional create, the same
primitive Delta Lake's S3 commit coordinator and Iceberg's swap rely
on; ``share`` and ``rehome`` are server-side ``CopyObject`` (plus a
delete for ``rehome`` — safe, the source is unreferenced). No rename
and no hard link is required anywhere, which is the entire point of
routing every commit through this interface.

``FaultInjectingCopyFS`` (tests) implements the contract WITHOUT hard
links or rename — copy + exclusive-create only, i.e. the object-store
shape — and can crash at declared points, proving the protocol's
safety argument doesn't silently depend on POSIX extras.
"""

from __future__ import annotations

import os
import shutil


class LocalCommitFS:
    """POSIX implementation: hard link for exclusive publish (atomic,
    create-if-absent, works across every local/NFS filesystem Spark's
    local mode touches), rename for rehome, hard link for share (zero
    copy: the bytes exist once, both paths stay valid, the inode is
    freed when the last manifest referencing it retires)."""

    def publish_exclusive(self, tmp_path: str, final_path: str) -> None:
        # os.link is atomic-exclusive: of two racing committers of the
        # same target, exactly one wins; the loser raises instead of
        # clobbering (os.replace would overwrite silently).
        os.link(tmp_path, final_path)

    def rehome(self, src: str, dst: str) -> None:
        os.replace(src, dst)

    def share(self, src: str, dst: str) -> None:
        os.link(src, dst)


class CopyCommitFS:
    """Object-store-shaped implementation: the PROTOCOL asks only for
    whole-file copy and conditional create — the primitives every store
    (S3/GCS/ABFS) actually offers. ``publish_exclusive`` models
    conditional PUT's OBSERVABLE semantics: ALL-OR-NOTHING
    create-if-absent — on a real store the object body and the
    precondition commit together, so no reader can ever observe a
    partial or empty object at the final path. The local emulation
    reproduces exactly that observable contract (an exclusive claim,
    fully-written content, then one atomic local rename INTERNAL to the
    emulation — the protocol itself never asks the store to rename):
    publishing straight into an ``O_EXCL``-opened final path would
    expose an empty/partial manifest between create and write, a state
    the real primitive cannot produce, and would silently weaken every
    crash-safety test built on this class."""

    def publish_exclusive(self, tmp_path: str, final_path: str) -> None:
        if os.path.exists(final_path):
            raise FileExistsError(final_path)
        claim = final_path + ".claim"
        # exclusivity: one claimant per version. A FileExistsError here
        # means either a concurrent committer in flight or a crashed
        # one (recovery: remove the stale .claim) — never a clobber.
        fd = os.open(claim, os.O_WRONLY | os.O_CREAT | os.O_EXCL)
        try:
            with open(tmp_path, "rb") as src:
                os.write(fd, src.read())
            os.fsync(fd)
        finally:
            os.close(fd)
        if os.path.exists(final_path):
            # raced an already-committed final that landed between the
            # first check and our claim: withdraw, surface the conflict
            os.unlink(claim)
            raise FileExistsError(final_path)
        # atomic visibility: readers see nothing, then the full content
        os.rename(claim, final_path)

    def rehome(self, src: str, dst: str) -> None:
        shutil.copyfile(src, dst)  # CopyObject ...
        os.unlink(src)  # ... + DeleteObject; src is unreferenced, so
        # a crash between the two leaves only an invisible orphan

    def share(self, src: str, dst: str) -> None:
        shutil.copyfile(src, dst)


class FaultInjectingCopyFS(CopyCommitFS):
    """CopyCommitFS that 'crashes' (raises) at declared points, for
    proving the protocol's crash-safety claims hold on an object-store
    FS: set ``crash_at`` to one of 'before_publish', 'mid_rehome'
    (after copy, before delete), 'before_share'."""

    class Crash(RuntimeError):
        pass

    def __init__(self, crash_at: str | None = None):
        self.crash_at = crash_at
        self.calls: list[tuple[str, str, str]] = []

    def publish_exclusive(self, tmp_path: str, final_path: str) -> None:
        self.calls.append(("publish_exclusive", tmp_path, final_path))
        if self.crash_at == "before_publish":
            raise self.Crash("crash before publish")
        if self.crash_at == "mid_publish":
            # claim written, content flushed, atomic rename NOT reached
            # (the central crash window of the emulation): the table
            # head must be unchanged and readers must see nothing
            claim = final_path + ".claim"
            fd = os.open(claim, os.O_WRONLY | os.O_CREAT | os.O_EXCL)
            try:
                with open(tmp_path, "rb") as src:
                    os.write(fd, src.read())
            finally:
                os.close(fd)
            raise self.Crash("crash mid-publish (claim left behind)")
        super().publish_exclusive(tmp_path, final_path)

    def rehome(self, src: str, dst: str) -> None:
        self.calls.append(("rehome", src, dst))
        if self.crash_at == "mid_rehome":
            shutil.copyfile(src, dst)  # copy landed, delete didn't
            raise self.Crash("crash mid-rehome")
        super().rehome(src, dst)

    def share(self, src: str, dst: str) -> None:
        self.calls.append(("share", src, dst))
        if self.crash_at == "before_share":
            raise self.Crash("crash before share")
        super().share(src, dst)


_COMMIT_FS = LocalCommitFS()


def get_commit_fs():
    return _COMMIT_FS


def set_commit_fs(fs) -> object:
    """Install a commit FS (returns the previous one). The snapshot
    module routes every commit-critical operation through this — tests
    swap in ``CopyCommitFS``/``FaultInjectingCopyFS``; a real
    object-store deployment would install an implementation backed by
    conditional PUT + CopyObject."""
    global _COMMIT_FS
    prev = _COMMIT_FS
    _COMMIT_FS = fs
    return prev
