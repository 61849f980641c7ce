"""Scan fan-out for per-row-expensive Arrow kernels on under-split inputs.

Spark parallelizes a file scan by SPLITS, but a parquet row group is the
atomic split unit: a small table written as one row group yields byte-range
splits of which only ONE contains the row-group start — so every
``mapInPandas`` phase that rides the scan (local skyline/skyband passes,
dominator counting scans) runs on a single core while the rest idle.
Measured round 16 on the sf0.1 fixtures (every table is a single-row-group
file): ``s30_prob_skyline``'s cached input materialized as partition sizes
``[0, 35645, 0]`` and both counting scans showed a 9:1 straggler
(stage p50 0.2 s vs max 1.8 s, 3 tasks) in the event log.

At real scale this pathology self-heals (a 100 TB table has ~10^5+ row
groups), so the fix must be CONDITIONAL — an unconditional repartition
would put a full shuffle of the projection in front of every kernel.
:func:`fanout_narrow_scan` decides from file metadata, driver-side, with
no Spark job: it fires only when the input's file layout PROVABLY cannot
parallelize (fewer files than cores, their parquet footers sum to fewer
row groups than cores, total bytes small enough that the round-robin
exchange is trivially cheap).  Remote-storage URIs and non-parquet inputs
conservatively no-op — on object-store deployments the same probe would
read footers through the filesystem client; this sandbox has local files
only.

Companion: :func:`..operators.caching.persist_balanced` handles the
cached-input variant of the same pathology (the skew is measured on the
materialized cache instead of estimated from footers).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

# Past this many file bytes the probe never fires: a single row group is
# bounded by the writer's block size (~128 MB-1 GB), so a legitimate scan
# can't be both huge and unsplittable — and the exchange this module adds
# must stay a rounding error next to the kernel work it parallelizes.
_FANOUT_MAX_BYTES = 256 << 20


def _local_path(uri: str) -> str | None:
    if uri.startswith("file:"):
        path = uri[len("file:") :]
        while path.startswith("//"):
            path = path[1:]
        return path
    if uri.startswith("/"):
        return uri
    return None


def _already_repartitioned(df: DataFrame) -> bool:
    """True when the plan already carries an explicit repartition — the
    skyline family composes (prob_skyline hands its balanced cache to
    skyband), and stacking a second exchange on a balanced frame is pure
    waste.  Internal-API peek, guarded: on Connect this reads as False
    and the worst case is one redundant small exchange."""
    try:
        return "Repartition" in df._jdf.queryExecution().analyzed().toString()
    except Exception:  # pragma: no cover - Connect / stopped session
        return False


def fanout_narrow_scan(df: DataFrame) -> DataFrame:
    """Round-robin ``df`` across ``defaultParallelism`` iff its input file
    layout provably cannot parallelize a per-row-expensive kernel.

    Driver-side and job-free: the decision reads at most ``cores - 1``
    local parquet footers.  Any uncertainty (no input files, remote URI,
    unreadable footer, enough row groups, too many bytes) returns ``df``
    unchanged — the probe only ever ADDS parallelism it can prove is
    missing, never a shuffle it can't justify."""
    import pyarrow.parquet as pq

    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if target <= 1:
        return df
    try:
        files = df.inputFiles()
    except Exception:  # pragma: no cover - Connect / non-file source
        return df
    if not files or len(files) >= target:
        return df
    if _already_repartitioned(df):
        return df
    total_bytes = 0
    total_rgs = 0
    for uri in files:
        path = _local_path(uri)
        if path is None:
            return df
        try:
            total_bytes += os.path.getsize(path)
            total_rgs += pq.ParquetFile(path).metadata.num_row_groups
        except Exception:
            return df
        if total_rgs >= target or total_bytes > _FANOUT_MAX_BYTES:
            return df
    return df.repartition(target)
