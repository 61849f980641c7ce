"""Custom Python DataSource: ``spark.read.format("warc")``.

The Spark-4-native connector surface over the WARC layer in
:mod:`.warc` (Python DataSource API, SPARK-44076), so plain SQL/
DataFrame consumers can scan crawls without importing this package's
reader helpers:

    spark.read.format("warc")
         .option("path", "/data/crawl")          # dir or single file
         .option("pattern", "*.warc.gz")          # glob within a dir
         .option("view", "pages")                 # records|responses|pages
         .load()

Partition planning is driver-side from a file LISTING (name + size
only); each task opens exactly its one file and runs the same strict
record walk / HTTP split / charset decode as ``read_warc*`` — one
output batch per file, so record bodies never accumulate across files
(the round-14 memory-shape rule).  The parallel unit is the WARC file,
Common Crawl's own sharding (~100k files/crawl ≫ any cluster's task
slots), exactly like the ``binaryFile`` readers.

Filesystem seam: tasks read with ``open()``, so paths must be visible
to executors (local disk, NFS, fuse mounts).  For object stores keep
using ``read_warc*`` — their ``binaryFile`` scan goes through Hadoop's
filesystem connectors.  This is a deliberate scope line, not an
accident: the Python DataSource API hands partitions a plain Python
runtime with no Hadoop classpath.  The line is ENFORCED at plan time
(round 15): a URL-scheme path (``s3a://`` …) fails reader construction
with a routing hint instead of a task-side FileNotFoundError.
"""

from __future__ import annotations

import fnmatch
import os
import re

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

# one source of truth with the binaryFile readers (round-14 review:
# re-declared schema strings drift silently from the parity promise)
from . import warc as w
from .warc import PAGES_SCHEMA, RESPONSES_SCHEMA, WARC_SCHEMA

_VIEWS = {
    "records": WARC_SCHEMA,
    "responses": RESPONSES_SCHEMA,
    "pages": PAGES_SCHEMA,
}


_URL_SCHEME_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]+://")


# the binaryFile-based fallbacks to name in the routing hint, per format
_BINARYFILE_TWINS = {"warc": "read_warc*", "archive": "read_zip/read_tar"}


def require_local_path(path: str, fmt: str) -> str:
    """Plan-time guard for the documented filesystem seam (module
    docstring): these DataSources read with task-side ``open()``, so a
    URL-scheme path (``s3a://``, ``hdfs://``, ``gs://`` …) must be
    rejected when the query is PLANNED — before r14-15 it surfaced only
    as a confusing task-side FileNotFoundError at first read.  A
    ``file:///`` prefix is unwrapped (it IS the local filesystem); the
    RFC 8089 host-authority form ``file://host/path`` is rejected
    rather than silently misread as a relative path."""
    if path.startswith("file://"):
        rest = path[len("file://"):]
        if rest and not rest.startswith("/"):
            raise ValueError(
                f"{fmt}: path {path!r} is a file URL with a host "
                f"authority — only local file:///absolute/path URLs are "
                f"supported (mount the remote filesystem and pass its "
                f"local mount point)"
            )
        return rest or "/"
    if _URL_SCHEME_RE.match(path):
        twins = _BINARYFILE_TWINS.get(fmt, "read_*")
        raise ValueError(
            f"{fmt}: path {path!r} has a URL scheme, but this Python "
            f"DataSource reads with task-side open() (local/NFS/fuse "
            f"paths only — a deliberate scope line, see the module "
            f"docstring); for object stores use the binaryFile-based "
            f"{twins} readers, which go through Hadoop's filesystem "
            f"connectors"
        )
    return path


def list_files(path: str, pattern: str) -> list[str]:
    """Driver-side listing shared by the batch/stream readers here and
    the archive DataSource: regular FILES matching the glob, sorted —
    subdirectories (checkpoint dirs, nested shards) must never become
    partitions, they would crash task-side ``open()``."""
    if os.path.isfile(path):
        return [path]
    if os.path.isdir(path):
        return sorted(
            p
            for f in os.listdir(path)
            if fnmatch.fnmatch(f, pattern)
            and os.path.isfile(p := os.path.join(path, f))
        )
    raise ValueError(f"path {path!r} is neither file nor dir")


class FilePartition(InputPartition):
    """One file = one partition (shared by the warc and archive
    formats, batch and streaming alike)."""

    def __init__(self, path: str, size: int):
        self.path, self.size = path, size


class WarcDataSource(DataSource):
    """Options: path (file or directory), pattern (glob within a
    directory, default ``*.warc*``), view (``records`` | ``responses``
    | ``pages``, default ``records``)."""

    @classmethod
    def name(cls) -> str:
        return "warc"

    def schema(self) -> str:
        view = self.options.get("view", "records")
        if view not in _VIEWS:
            raise ValueError(f"warc: unknown view {view!r} (records/responses/pages)")
        return _VIEWS[view]

    def reader(self, schema) -> "WarcReader":
        return WarcReader(self.options)

    def streamReader(self, schema) -> "WarcStreamReader":
        return WarcStreamReader(self.options)


class WarcReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("warc: the 'path' option is required")
        self.path = require_local_path(self.path, "warc")
        self.pattern = options.get("pattern", "*.warc*")
        self.view = options.get("view", "records")
        if self.view not in _VIEWS:
            raise ValueError(
                f"warc: unknown view {self.view!r} (records/responses/pages)"
            )

    def partitions(self):
        # listing only — no file bytes move until tasks run
        files = list_files(self.path, self.pattern)
        if not files:
            raise ValueError(
                f"warc: no files matching {self.pattern!r} under {self.path!r}"
            )
        return [FilePartition(p, os.path.getsize(p)) for p in files]

    def read(self, partition: FilePartition):
        yield from _emit_file_rows(partition.path, self.view)


def _emit_file_rows(path: str, view: str):
    """Task-side row emission shared by the batch and stream readers:
    one file, one strict walk, rows per the requested view."""
    with open(path, "rb") as fh:
        content = fh.read()
    if view == "records":
        # streaming walk (round-15 memory shape): record bodies must not
        # all materialize at once on ~GB files — same rule as warc.py
        for r in w.iter_warc_records(content):
            yield (
                path, r["offset"], r["warc_type"], r["record_id"],
                r["target_uri"], r["content_type"], r["content_length"],
                r["body"],
            )
        return
    for _p, r, status, ctype, payload in w._http_responses_in_file(path, content):
        if view == "responses":
            yield (
                path, r["offset"], r["record_id"], r["target_uri"],
                status, ctype, payload,
            )
        else:  # pages — same text step as read_warc_pages (one code path)
            yield (
                path, r["offset"], r["record_id"], r["target_uri"],
                status, ctype, w.page_text(payload, ctype),
            )


class FileTailStreamReader(DataSourceStreamReader):
    """Generic directory-tailing stream reader shared by the ``warc``
    and ``archive`` formats: each micro-batch picks up files that landed
    since the last committed offset, one executor-side partition per
    new file.  Offsets are high-water marks over the lexicographically
    sorted listing — the crawl-drop shape where shard names increase
    monotonically (``part-000…``).  This is a STRICTER contract than
    Spark's built-in file source (which tracks a seen-files map and
    does pick up names that sort below ones already processed): here a
    file landing BELOW an already committed name is never planned —
    producers must write monotone names (atomic-rename with sortable
    shard/timestamp prefixes).  The trade is deliberate: offsets are
    tiny JSON dicts (one filename), so checkpoints stay O(1) regardless
    of how many files ever streamed, where the seen-map design grows
    with file count.  Out-of-order landings are not silent, though —
    ``latestOffset`` WARNs once per offending file when a name appears
    below the watermark that was not in the session's baseline listing.  The watermark is kept MONOTONE within a session (a
    transient empty listing — NFS hiccup — never regresses the offset
    and never re-emits), and ``partitions`` FAILS LOUDLY on a regressed
    range (a regressed end can only come from an offset log poisoned
    before a restart; planning an empty batch would commit it and
    re-emit every file); the contract this O(1) design cannot cover is
    files DELETED across a restart and later re-created below the
    high-water mark — landing directories must be append-only, which
    crawl drops are.  Subclasses set ``_path``/``_pattern`` and
    implement ``read``."""

    _path: str
    _pattern: str
    _high_water: str = ""  # session watermark; instances shadow on write
    # below-watermark names already accounted for (present at baseline,
    # or planned this session) — DRIVER-memory only, never checkpointed,
    # used solely to detect out-of-order landings.  ``None`` until the
    # session's first listing: on checkpoint recovery the committed
    # watermark arrives via partitions() BEFORE any listing, so
    # everything below it at first sight predates the session (committed
    # files, not stragglers) and must baseline silently.  Pruned to the
    # current listing every trigger, so it is O(directory size) — the
    # same order as the listing the design already takes per trigger —
    # not O(every name ever seen); the CHECKPOINT state stays O(1).
    _accounted: set[str] | None = None

    def initialOffset(self) -> dict:
        return {"upto": ""}

    def _listing(self) -> list[str]:
        try:
            return list_files(self._path, self._pattern)
        except ValueError:
            return []  # directory not created yet / transiently absent

    def latestOffset(self) -> dict:
        files = self._listing()
        below = [p for p in files if p <= self._high_water]
        if self._accounted is None:
            self._accounted = set(below)  # session baseline: never warns
        else:
            # out-of-order landing detection: a name at-or-below the
            # current watermark that was not at baseline and was never
            # planned will NEVER be streamed under the monotone contract
            # — say so instead of silence, once per file.
            late = [p for p in below if p not in self._accounted]
            if late:
                import warnings

                warnings.warn(
                    f"{type(self).__name__}: {len(late)} file(s) landed at or "
                    f"below the committed watermark {self._high_water!r} and "
                    f"will not be streamed (monotone-naming contract): "
                    f"{late[:3]}{'…' if len(late) > 3 else ''}",
                    RuntimeWarning,
                    stacklevel=2,
                )
            # monotone UPDATE (a transient partial listing must not drop
            # an accounted name — re-listing it later would false-warn
            # about a file that WAS streamed), with a size horizon so
            # retention-deleted names cannot grow the set unboundedly:
            # prune to the live listing only when the set far exceeds it
            # (after such a prune, a delete+recreate below the watermark
            # may re-warn once — landing dirs are append-only by
            # contract, so that is an anomaly worth re-flagging anyway)
            self._accounted.update(below)
            if len(self._accounted) > 4 * len(files) + 1024:
                self._accounted = set(below)
        # monotone: a transient empty/short listing (NFS hiccup,
        # retention delete) must never REGRESS the offset — a smaller
        # offset would re-plan already-committed files on recovery
        # (round-14 review)
        if files and files[-1] > self._high_water:
            # everything up to the new watermark is about to be planned
            # (or predates the session) — account it
            self._high_water = files[-1]
            self._accounted.update(files)
        return {"upto": self._high_water}

    def partitions(self, start: dict, end: dict):
        lo, hi = start.get("upto", ""), end.get("upto", "")
        # keep the session watermark at least at the batch END (recovery
        # path: partitions() sees the checkpointed range before
        # latestOffset could learn it from a listing).  Seeding from the
        # START would let a transient empty listing right after a
        # recovered batch commits at `hi` hand the engine an offset
        # below the committed one, and the hi<lo guard below would kill
        # the query on a regression that never happened (round-15
        # review).
        if hi > self._high_water:
            self._high_water = hi
        if hi < lo:
            # a REGRESSED end can only come from a pre-session offset
            # log poisoned by a transient empty listing before restart;
            # planning [] would commit the regressed offset and re-emit
            # every file next batch — fail the batch loudly instead
            # (round-14 review, 4th pass)
            raise ValueError(
                f"stream offset regressed ({hi!r} < committed {lo!r}): "
                "the landing directory listing went backwards — restart "
                "the query once the directory is visible again"
            )
        if hi == lo:
            return []  # no-op range
        planned = [p for p in self._listing() if lo < p <= hi]
        # a file can land between latestOffset's listing and this one and
        # still make the batch — account for it so the late-landing
        # warning never fires for a file that WAS streamed
        if self._accounted is not None:
            self._accounted.update(planned)
        return [FilePartition(p, os.path.getsize(p)) for p in planned]

    def commit(self, end: dict) -> None:
        pass  # the offset dict itself is the whole state


class WarcStreamReader(FileTailStreamReader):
    """Directory-tailing crawl ingestion for
    ``spark.readStream.format("warc")`` (see the base class for the
    offset contract)."""

    def __init__(self, options):
        self._opts = WarcReader(options)  # shares path/pattern/view checks
        self._path, self._pattern = self._opts.path, self._opts.pattern

    def read(self, partition: FilePartition):
        yield from _emit_file_rows(partition.path, self._opts.view)


def register(spark) -> None:
    """Register the ``warc`` format on this session."""
    spark.dataSource.register(WarcDataSource)
