"""Small-file IO through the Hadoop FileSystem API.

The export/maintenance families write MANIFESTS — KB-sized JSON control
files — next to the data they certify. At 100 TB the data lives on
HDFS/object storage, so the control-file side must speak the same
filesystem the Spark writers do: this module resolves the
``org.apache.hadoop.fs.FileSystem`` for a path's scheme through the
session's Hadoop configuration (the exact resolution Spark's own writers
use), so ``file://``, ``hdfs://``, ``s3a://``... all work wherever the
cluster's classpath/credentials allow, with zero new dependencies.

Scope: manifests and directory maintenance only — bounded metadata, one
JVM round trip per call. Bulk data always moves through Spark readers and
writers, never through this module.

Not available under Spark Connect (no ``_jvm`` gateway); the classic-mode
requirement is asserted with a clear error.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def resolve_path(path: str) -> str:
    """Pin scheme-less paths to ``file://`` explicitly: on a real cluster
    a bare path resolves against ``fs.defaultFS`` (hdfs:// typically) —
    a DIFFERENT filesystem than the local one the caller is looking at —
    so the ambiguity is resolved eagerly and identically on the Spark
    read/write side and the manifest side. Scheme-less paths are made
    absolute first: ``"file://" + "out/tbl"`` would parse ``out`` as the
    URI *authority* and misresolve the path. Paths that already carry a
    scheme pass through untouched."""
    if "://" in path:
        return path
    import os

    return "file://" + os.path.abspath(path)


class FsIO:
    """Scheme-aware small-file operations for one filesystem.

    Construct per target root (``FsIO(spark, root_path)``); every method
    takes full URIs under the same scheme. All calls are single JVM round
    trips over py4j — fine for manifests, wrong for row data.
    """

    def __init__(self, spark: SparkSession, path: str):
        jvm = getattr(spark, "_jvm", None)
        jsc = getattr(spark, "_jsc", None)
        if jvm is None or jsc is None:
            raise RuntimeError(
                "FsIO needs a classic (JVM-gateway) SparkSession; Spark "
                "Connect sessions cannot reach the Hadoop FileSystem API"
            )
        self._jvm = jvm
        try:
            # Path(...).getFileSystem, not FileSystem.get(URI.create(...)):
            # URI.create throws on URI-illegal characters legal in paths
            # (space, %, #), while Hadoop's Path constructor percent-quotes
            # them — the same resolution Spark's writers use, and the same
            # parsing _p() already applies to every subsequent call
            # (r8 review)
            self._fs = jvm.org.apache.hadoop.fs.Path(
                resolve_path(path)
            ).getFileSystem(jsc.hadoopConfiguration())
        except Exception as ex:  # missing scheme jar / bad credentials
            raise ValueError(
                f"cannot resolve a Hadoop FileSystem for {path!r}: the "
                "scheme's implementation (e.g. hadoop-aws for s3a://) "
                f"must be on the cluster classpath — {ex}"
            ) from ex

    def _p(self, path: str):
        return self._jvm.org.apache.hadoop.fs.Path(resolve_path(path))

    def exists(self, path: str) -> bool:
        return bool(self._fs.exists(self._p(path)))

    def read_text(self, path: str) -> str:
        stream = self._fs.open(self._p(path))
        try:
            baos = self._jvm.java.io.ByteArrayOutputStream()
            # copyBytes(close=False): the finally owns the stream
            self._jvm.org.apache.hadoop.io.IOUtils.copyBytes(
                stream, baos, 65536, False
            )
            return bytes(baos.toByteArray()).decode("utf-8")
        finally:
            stream.close()

    def write_text_atomic(self, path: str, text: str) -> None:
        """tmp-then-rename control-file write. On HDFS the rename is
        atomic after a non-atomic delete of the previous version — a
        crash in the gap leaves NO file (reads as "incomplete", never a
        torn file). On object stores rename is a copy; same guarantee,
        more latency — manifests are KBs, so irrelevant."""
        tmp = self._p(path + ".tmp")
        out = self._fs.create(tmp, True)
        try:
            out.write(bytearray(text.encode("utf-8")))
        finally:
            out.close()
        dest = self._p(path)
        if self._fs.exists(dest):
            self._fs.delete(dest, False)
        if not self._fs.rename(tmp, dest):
            raise IOError(
                f"rename {path}.tmp -> {path} failed on "
                f"{self._fs.getUri().toString()}"
            )

    def rename(self, src: str, dst: str) -> None:
        """Rename/move; raises on failure AND on an existing destination.
        The existence check is explicit because the underlying contract
        diverges by scheme: HDFS rename refuses to overwrite, but
        RawLocalFileSystem delegates to POSIX rename(2), which silently
        REPLACES an existing destination file — so code tested on
        file:// would destroy data that the same code protects on a real
        cluster (r8 review)."""
        if self._fs.exists(self._p(dst)):
            raise IOError(
                f"rename {src} -> {dst}: destination exists on "
                f"{self._fs.getUri().toString()} (rename never overwrites)"
            )
        if not self._fs.rename(self._p(src), self._p(dst)):
            raise IOError(
                f"rename {src} -> {dst} failed on "
                f"{self._fs.getUri().toString()}"
            )

    def list_files(
        self, path: str, *, suffix: str | None = None
    ) -> list[tuple[str, int]]:
        """Recursive (uri, bytes) listing of the FILES under a directory
        — one round trip per batch on HDFS, one LIST page per 1000 keys
        on object stores."""
        it = self._fs.listFiles(self._p(path), True)
        out = []
        while it.hasNext():
            st = it.next()
            uri = st.getPath().toString()
            if suffix is None or uri.endswith(suffix):
                out.append((uri, int(st.getLen())))
        return out

    def listdir(self, path: str) -> list[str]:
        """Child basenames of a directory (files and dirs)."""
        return [
            st.getPath().getName()
            for st in self._fs.listStatus(self._p(path))
        ]

    def delete(self, path: str, *, recursive: bool = True) -> bool:
        """Delete if present; True when something was removed."""
        return bool(self._fs.delete(self._p(path), recursive))
