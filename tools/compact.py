"""Small-file compaction — the table-maintenance pass a 100 TB lake needs.

Long-running ingestion (per-trigger streaming sinks, frequent small
appends) leaves directories with thousands of tiny parquet files; every
downstream scan then pays file-open + footer-read + task-schedule cost per
file, and the driver pays listing cost.  Compaction rewrites a directory
to approximately size-targeted files:

    n_files = clamp(ceil(input_bytes / target_bytes), 1, max_files)

* ``sort_by`` columns → ``repartitionByRange`` + within-partition sort, so
  the rewritten files carry tight min/max column statistics (zone-map
  pruning keeps working; pair with ``layout.zorder_key`` for
  multi-dimensional locality).
* no ``sort_by`` → round-robin ``repartition`` (pure size leveling).

Writes to a NEW directory (never in-place — readers of the old path are
unaffected; swap is the caller's atomic rename/metastore update).  Row
parity is the caller-visible contract: compaction moves bytes, never
changes data. Usage:

    python tools/compact.py <src_dir> <dst_dir> [--target-mb 128]
    [--sort-by col1,col2] [--max-files 10000]
"""

from __future__ import annotations

import argparse
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402


def plan_file_count(input_bytes: int, target_bytes: int, max_files: int = 10_000) -> int:
    return max(1, min(max_files, math.ceil(input_bytes / max(target_bytes, 1))))


def compact(
    spark: SparkSession,
    src: str,
    dst: str,
    target_mb: int = 128,
    sort_by: list[str] | None = None,
    max_files: int = 10_000,
) -> int:
    """Rewrite parquet dir ``src`` into ``dst`` with ~``target_mb`` files.
    Returns the planned output file count."""
    input_bytes = sum(
        os.path.getsize(os.path.join(root, f))
        for root, _, files in os.walk(src)
        for f in files
        if f.endswith(".parquet")
    )
    n = plan_file_count(input_bytes, target_mb << 20, max_files)
    df: DataFrame = spark.read.parquet(src)
    if sort_by:
        out = df.repartitionByRange(n, *sort_by).sortWithinPartitions(*sort_by)
    else:
        out = df.repartition(n)
    out.write.mode("error").parquet(dst)  # refuse to clobber an existing dst
    return n


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("src")
    ap.add_argument("dst")
    ap.add_argument("--target-mb", type=int, default=128)
    ap.add_argument("--sort-by", default=None, help="comma-separated columns")
    ap.add_argument("--max-files", type=int, default=10_000)
    args = ap.parse_args()

    from query_skyline_qos_flink_spark.session import get_spark

    spark = get_spark(app_name="compact")
    n = compact(
        spark,
        args.src,
        args.dst,
        target_mb=args.target_mb,
        sort_by=args.sort_by.split(",") if args.sort_by else None,
        max_files=args.max_files,
    )
    print(f"wrote ~{n} files to {args.dst}")
    spark.stop()


if __name__ == "__main__":
    main()
