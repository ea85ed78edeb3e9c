"""Scheme-dispatched metadata-file IO: local ``os`` APIs for plain paths,
the Hadoop ``FileSystem`` API (via Spark's JVM gateway) for every URI Spark
itself can reach (``file://``, ``hdfs://``, ``s3a://``, ``gs://``, ...).

Why this exists: the store catalog, CoW manifests, index pointers, bloom
sidecars, and streaming-state ``_CURRENT`` pointers are all tiny JSON files
published with an atomic write-new-then-swap. Parquet data already goes
through Spark (scheme-agnostic), but until round 7 the pointer files used
``open``/``os.replace``/``flock`` directly, so a store rooted at ``hdfs://``
or ``s3a://`` failed at its first publish (the guards in
``streaming/ingest.py`` and DEPLOYMENT.md documented exactly this gap).
Routing the same handful of operations through ``org.apache.hadoop.fs``
closes it without changing any on-disk format: a ``file://``-scheme root
exercises the identical Hadoop code path on local disk, which is how the
tests prove it.

Atomicity by scheme:

- **local / file://** — ``write_text_atomic`` is temp-in-same-dir +
  rename-overwrite (POSIX ``rename(2)``; the Hadoop path issues it via
  ``java.nio.Files.move(ATOMIC_MOVE)``, which ERRORS rather than degrade
  to copy+delete on a mount that cannot rename atomically).
- **hdfs://** — ``FileContext.rename(..., Options.Rename.OVERWRITE)`` is
  atomic in the NameNode; readers see the old or the new pointer, never a
  partial file.
- **s3a:// and friends** — object stores have no rename; the Hadoop client
  implements it as copy-then-delete of a FULLY-WRITTEN object, and a
  single-key PUT is atomic-replace on S3, so readers still only ever
  observe a complete old or new pointer. What object stores canNOT give is
  multi-writer mutual exclusion: :meth:`FS.lock` is a real ``flock`` on
  local roots and a documented no-op elsewhere — remote roots keep the
  single-writer-per-store contract the EntityStore already states.

Only METADATA goes through here (KB-scale JSON, driver-side): bulk data
stays on Spark readers/writers. Directory ops (``listdir``/``rmtree``) are
used on manifest/generation directories whose entry counts are bounded by
partition and version counts, not row counts.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import uuid
from contextlib import contextmanager
from urllib.parse import urlparse

__all__ = ["LocalFS", "HadoopFS", "fs_for", "LOCAL"]

# Destinations whose directory has already been swept for orphan temps in
# this process. Orphans only come from CRASHED (dead) writers, so one sweep
# per (dir, name) per process suffices — later flips of the same pointer
# skip the O(dir-entries) listing that the r9 advice flagged as growing
# with table history. Keyed per destination, not per directory, so each
# pointer's first write still cleans ITS OWN orphans.
_RECLAIMED: set[tuple[str, str]] = set()


def _is_orphan_temp(name: str, base: str) -> bool:
    """True only for this module's own temp shape for destination ``base``:
    ``.{base}.{token}`` where token is a single dotless suffix (mkstemp's
    random tail, HadoopFS's 12-hex uuid, or the checksum layer's ``crc``).
    A prefix match alone would also hit a LIVE temp of a sibling
    destination whose name extends ``base`` with a dot suffix — an atomic
    write of ``x`` must not delete an in-flight writer-of-``x.y`` temp
    ``.x.y.<uuid>`` (r9 advice)."""
    head = f".{base}."
    if not name.startswith(head):
        return False
    rest = name[len(head):]
    return bool(rest) and "." not in rest


class LocalFS:
    """``os``-backed implementation for plain (scheme-less) paths —
    byte-for-byte the behavior the store had before fsio existed."""

    def read_text(self, path: str) -> str:
        with open(path) as f:
            return f.read()

    def write_text_atomic(self, path: str, text: str) -> None:
        d = os.path.dirname(path) or "."
        base = os.path.basename(path)
        # reclaim orphan temps a CRASHED previous writer of THIS destination
        # left behind ('.<name>.<token>') — listdir hides dot-entries, so no
        # other path ever surfaces or cleans them. Exact temp-shape match
        # only (see _is_orphan_temp), and at most once per destination per
        # process: orphans can only predate this process, so re-listing the
        # directory on every flip buys nothing and costs O(dir entries).
        key = (os.path.abspath(d), base)
        if key not in _RECLAIMED:
            _RECLAIMED.add(key)
            try:
                for n in os.listdir(d):
                    if _is_orphan_temp(n, base):
                        try:
                            os.remove(os.path.join(d, n))
                        except OSError:
                            pass
            except OSError:
                pass
        fd, tmp = tempfile.mkstemp(dir=d, prefix="." + base + ".")
        try:
            with os.fdopen(fd, "w") as f:
                f.write(text)
            os.replace(tmp, path)
        except BaseException:
            try:
                os.remove(tmp)
            except OSError:
                pass
            raise

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def isdir(self, path: str) -> bool:
        return os.path.isdir(path)

    def listdir(self, path: str) -> list[str]:
        # hide dot-prefixed entries — the atomic-write temps this module
        # creates ('.<name>.<uuid>') are transient, and a crashed writer's
        # orphan must not surface to manifest/generation consumers
        # (mirrors HadoopFS.listdir)
        return sorted(n for n in os.listdir(path) if not n.startswith("."))

    def makedirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def remove(self, path: str) -> None:
        """Delete one file; missing is not an error (callers treat the
        pointer/manifest as already gone)."""
        try:
            os.remove(path)
        except FileNotFoundError:
            pass

    def rmtree(self, path: str) -> None:
        shutil.rmtree(path, ignore_errors=True)

    @contextmanager
    def lock(self, path: str):
        """Exclusive advisory lock (``flock``) on a sidecar file. Degrades
        to a no-op where flock is unavailable — then the single-writer
        contract is the guarantee (same trade the store always made)."""
        lf = None
        try:
            import fcntl

            lf = open(path, "w")
            fcntl.flock(lf, fcntl.LOCK_EX)
        except (ImportError, OSError):
            if lf is not None:
                lf.close()
            lf = None
        try:
            yield
        finally:
            if lf is not None:
                import fcntl

                fcntl.flock(lf, fcntl.LOCK_UN)
                lf.close()


LOCAL = LocalFS()


class HadoopFS:
    """Metadata IO through ``org.apache.hadoop.fs`` — the same client Spark
    uses for its own reads, so any root Spark can scan, the pointers can
    live on. Driver-side only (py4j), tiny files only by design."""

    def __init__(self, spark, path: str) -> None:
        sc = spark.sparkContext
        self._jvm = sc._jvm
        self._gw = sc._gateway
        self._conf = sc._jsc.hadoopConfiguration()
        self._jPath = self._jvm.org.apache.hadoop.fs.Path
        self._fs = self._jPath(path).getFileSystem(self._conf)
        # file:// roots: unwrap the checksumming LocalFileSystem to the raw
        # local FS. Two reasons, both found by the r8 pointer-flip
        # contention test: (a) FileContext.rename(OVERWRITE) over the local
        # scheme is implemented as delete-then-rename — a reader racing the
        # flip observes a MISSING pointer (~25k torn reads per 1k flips);
        # (b) the .crc sidecars the checksum layer writes cannot rename in
        # lockstep with the data file, so even an atomic data flip would
        # leave a mismatched-checksum window. The raw FS writes no
        # sidecars and its rename is java.io.File.renameTo → POSIX
        # rename(2): readers see the complete old or new pointer, never a
        # gap. HDFS keeps the FileContext path (rename is atomic in the
        # NameNode); object stores keep it too (single-key PUT replace).
        self._local_posix = bool(self._jPath(path).toUri().getScheme() == "file")
        if self._local_posix:
            try:
                self._fs = self._fs.getRawFileSystem()
            except Exception:
                # fs.file.impl configured to a non-checksumming class:
                # already raw, nothing to unwrap
                pass
        # FileContext supplies the public atomic rename-with-OVERWRITE
        # (FileSystem.rename(Path,Path) refuses an existing destination)
        self._fc = self._jvm.org.apache.hadoop.fs.FileContext.getFileContext(
            self._jPath(path).toUri(), self._conf
        )
        Rename = self._jvm.org.apache.hadoop.fs.Options.Rename
        self._overwrite = self._gw.new_array(Rename, 1)
        self._overwrite[0] = Rename.OVERWRITE

    # -- helpers --------------------------------------------------------------

    def _p(self, path: str):
        return self._jPath(path)

    def _nio_atomic_move(self, src: str, dst: str) -> None:
        """POSIX rename(2) via ``java.nio.Files.move(..., ATOMIC_MOVE)`` —
        local-scheme only. Raises (py4j ``AtomicMoveNotSupportedException``
        et al.) instead of ever copying."""
        nio = self._jvm.java.nio.file
        empty = self._gw.new_array(self._jvm.java.lang.String, 0)
        jsrc = nio.Paths.get(self._p(src).toUri().getPath(), empty)
        jdst = nio.Paths.get(self._p(dst).toUri().getPath(), empty)
        opts = self._gw.new_array(nio.CopyOption, 1)
        opts[0] = nio.StandardCopyOption.ATOMIC_MOVE
        nio.Files.move(jsrc, jdst, opts)

    # -- API (matches LocalFS) -------------------------------------------------

    def read_text(self, path: str) -> str:
        p = self._p(path)
        if not self._fs.exists(p):
            raise FileNotFoundError(path)
        stream = self._fs.open(p)
        try:
            reader = self._jvm.java.io.BufferedReader(
                self._jvm.java.io.InputStreamReader(stream, "UTF-8")
            )
            lines = []
            while True:
                line = reader.readLine()
                if line is None:
                    break
                lines.append(line)
            return "\n".join(lines)
        finally:
            stream.close()

    def write_text_atomic(self, path: str, text: str) -> None:
        parent, name = path.rsplit("/", 1)
        # reclaim orphan temps of THIS destination from a crashed previous
        # writer (and any stale '.<name>.crc' — 'crc' is a dotless token so
        # it matches the same exact shape). Exact-shape filter on top of the
        # glob so a live temp of a dot-suffixed sibling destination
        # ('.x.y.<uuid>' while writing 'x') is never touched, and at most
        # once per destination per process (orphans only predate us).
        key = (parent, name)
        if key not in _RECLAIMED:
            _RECLAIMED.add(key)
            try:
                for st in (
                    self._fs.globStatus(self._p(f"{parent}/.{name}.*")) or []
                ):
                    if _is_orphan_temp(st.getPath().getName(), name):
                        self._fs.delete(st.getPath(), False)
            except Exception:
                pass
        tmp = f"{parent}/.{name}.{uuid.uuid4().hex[:12]}"
        out = self._fs.create(self._p(tmp), True)
        try:
            out.write(bytearray(text.encode("utf-8")))
        finally:
            out.close()
        if self._local_posix:
            # java.nio.Files.move(ATOMIC_MOVE) = POSIX rename(2): atomically
            # replaces an existing destination, and — unlike
            # RawLocalFileSystem.rename, whose File.renameTo failure path
            # silently falls back to FileUtil.copy (copy+delete, a reopened
            # torn-read window on exotic mounts) — it ERRORS when the mount
            # cannot rename atomically (r8 advice). Errors beat torn reads
            # for a pointer flip.
            try:
                self._nio_atomic_move(tmp, path)
            except Exception as exc:
                self._fs.delete(self._p(tmp), False)
                raise OSError(
                    f"atomic rename failed: {tmp} -> {path} (the filesystem "
                    "refused an atomic move; refusing to degrade to "
                    "copy+delete for a pointer flip)"
                ) from exc
            # drop any stale checksum sidecar a pre-raw-unwrap writer left
            # next to the destination (the checksummed LocalFileSystem used
            # to write '.<name>.crc'; after this flip it would describe the
            # OLD bytes and poison a future checksummed reader)
            self._fs.delete(self._p(f"{parent}/.{name}.crc"), False)
            return
        # atomic on HDFS (NameNode op); on object stores the Hadoop client
        # copies the fully-written temp object then deletes it — readers
        # see old-or-new because a single-key PUT is atomic-replace
        self._fc.rename(self._p(tmp), self._p(path), self._overwrite)

    def exists(self, path: str) -> bool:
        return bool(self._fs.exists(self._p(path)))

    def isdir(self, path: str) -> bool:
        p = self._p(path)
        return bool(self._fs.exists(p) and self._fs.getFileStatus(p).isDirectory())

    def listdir(self, path: str) -> list[str]:
        # dot-prefixed entries are this module's own atomic-write temps
        # ('.<name>.<uuid>') and the checksum layer's '.<name>.crc'
        # sidecars — transient artifacts, never catalog content. The raw
        # local FS (unlike the checksumming wrapper we unwrapped from) does
        # not hide them, so filter here; LocalFS filters identically
        # (r8 advice: orphaned temps from a crashed writer must not
        # surface to manifest/generation-directory consumers).
        p = self._p(path)
        if not self._fs.exists(p):
            raise FileNotFoundError(path)
        return sorted(
            name
            for s in self._fs.listStatus(p)
            if not (name := s.getPath().getName()).startswith(".")
        )

    def makedirs(self, path: str) -> None:
        self._fs.mkdirs(self._p(path))

    def remove(self, path: str) -> None:
        self._fs.delete(self._p(path), False)

    def rmtree(self, path: str) -> None:
        self._fs.delete(self._p(path), True)

    @contextmanager
    def lock(self, path: str):
        """No cross-process lock exists on HDFS/object stores (no flock, no
        O_EXCL-with-lease) — remote roots run under the store's documented
        single-writer contract; the catalog's read-modify-replace races
        only against other WRITERS, never readers."""
        yield


def fs_for(path: str, spark=None):
    """The right FS for ``path``: plain paths → :data:`LOCAL`; any
    URI scheme → :class:`HadoopFS` (``file://`` included, so tests drive
    the remote code path on local disk). ``spark`` falls back to the
    active session — pointer helpers that predate fsio don't carry one."""
    if urlparse(path).scheme == "":
        return LOCAL
    if spark is None:
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
        if spark is None:
            raise RuntimeError(
                f"no active SparkSession to reach {path!r} via the Hadoop "
                "FileSystem API (remote-scheme metadata IO is JVM-backed)"
            )
    return HadoopFS(spark, path)


def read_json(fs, path: str) -> dict | None:
    """Parsed JSON at ``path`` or None when missing/corrupt — the shared
    pointer-read idiom (a damaged pointer must read as 'absent', the
    caller's guards decide what that means)."""
    try:
        return json.loads(fs.read_text(path))
    except (FileNotFoundError, json.JSONDecodeError, NotADirectoryError):
        return None


def write_json_atomic(fs, path: str, obj: dict) -> None:
    fs.write_text_atomic(path, json.dumps(obj))
