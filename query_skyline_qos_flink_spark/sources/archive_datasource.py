"""Custom Python DataSource: ``spark.read.format("archive")``.

The :mod:`.warc_datasource` twin for archive-packaged corpora:

    spark.read.format("archive")
         .option("path", "/data/drop")            # dir or single file
         .option("pattern", "*.tar*")              # glob within a dir
         .option("kind", "auto")                   # auto|zip|tar
         .load()

One ``InputPartition`` per archive file (driver-side listing only);
each task opens its file and runs the strict member walks in
:mod:`.archives` — ZIP central-directory (stored/deflate/bzip2/LZMA/
zstd/XZ members, zip64) or ustar/pax (long names, gzip/bzip2/xz/zstd/
lz4 envelopes) — yielding one row per regular-file member.  ``auto``
dispatches per file on the ZIP local-header magic vs everything-else
(tar's magic sits at byte 257, and compressed-tar envelopes are
sniffed inside the tar path anyway).

Same filesystem seam as the warc datasource: ``open()``-based tasks
need executor-visible paths; object stores stay on the ``binaryFile``
readers (``read_zip`` / ``read_tar``).
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

from .archives import ARCHIVE_SCHEMA
from .warc_datasource import (
    FilePartition,
    FileTailStreamReader,
    list_files,
    require_local_path,
)

_KINDS = ("auto", "zip", "tar")


class ArchiveDataSource(DataSource):
    """Options: path (file or directory), pattern (glob within a
    directory, default ``*``), kind (``auto`` | ``zip`` | ``tar``)."""

    @classmethod
    def name(cls) -> str:
        return "archive"

    def schema(self) -> str:
        return ARCHIVE_SCHEMA

    def reader(self, schema) -> "ArchiveReader":
        return ArchiveReader(self.options)

    def streamReader(self, schema) -> "ArchiveStreamReader":
        return ArchiveStreamReader(self.options)


class ArchiveReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("archive: the 'path' option is required")
        self.path = require_local_path(self.path, "archive")
        self.pattern = options.get("pattern", "*")
        self.kind = options.get("kind", "auto")
        if self.kind not in _KINDS:
            raise ValueError(f"archive: unknown kind {self.kind!r} (auto/zip/tar)")

    def partitions(self):
        files = list_files(self.path, self.pattern)
        if not files:
            raise ValueError(
                f"archive: no files matching {self.pattern!r} under {self.path!r}"
            )
        return [FilePartition(p, os.path.getsize(p)) for p in files]

    def read(self, partition: FilePartition):
        from . import archives as ar

        with open(partition.path, "rb") as fh:
            content = fh.read()
        kind = self.kind
        if kind == "auto":
            # a local header OR a bare EOCD (valid zero-member zip) both
            # mean ZIP — the EOCD-anchored walk handles empty archives
            # the tar path would reject with a misleading header error.
            # Prefixed/self-extracting zips have no sniffable prefix at
            # all: use the explicit kind="zip" override for those.
            kind = "zip" if content[:4] in (b"PK\x03\x04", b"PK\x05\x06") else "tar"
        parse = ar.iter_zip_members if kind == "zip" else ar.iter_tar_any
        for m in parse(content):
            yield (partition.path, m["name"], m["offset"], m["size"], m["body"])


class ArchiveStreamReader(FileTailStreamReader):
    """Directory-tailing archive ingestion for
    ``spark.readStream.format("archive")`` (offset contract in the
    base class): each newly landed archive becomes one partition whose
    members explode through the same strict walks as the batch
    reader."""

    def __init__(self, options):
        self._opts = ArchiveReader(options)  # shares path/pattern/kind checks
        self._path, self._pattern = self._opts.path, self._opts.pattern

    def read(self, partition):
        yield from self._opts.read(partition)


def register(spark) -> None:
    """Register the ``archive`` format on this session."""
    spark.dataSource.register(ArchiveDataSource)
