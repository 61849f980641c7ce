"""Bucketed parquet tables — the shuffle-amortization story for repeated
big-big joins.

The reference engine re-keys the service stream on every query
(FlinkSkyline.java:104-121 keyBy per topology); at 100 TB the analogous
Spark cost is re-shuffling the same fact table for every join or
aggregation on its key.  Bucketing pays that shuffle ONCE at write time:
``bucketBy(n, key)`` hash-partitions files on disk so any later
equi-join or groupBy on the key between tables with compatible bucket
counts runs with ZERO exchange — Catalyst sees the bucket spec as a
satisfied hash distribution (test-asserted: the joint plan has no
Exchange on either side).

Rules of thumb at scale: pick ``n_buckets`` so one bucket of the LARGER
table is ~100-200 MB (bucket count, unlike shuffle partitions, cannot be
changed without a rewrite); bucket both sides of a recurring join on the
same key with the same count (Spark joins compatible counts by reading
the smaller-count side multiple times, but equal counts keep one task
per bucket); add ``sortBy`` on the key so sort-merge join skips its sort
entirely.  Bucket pruning applies equality filters on the bucket key by
reading only the matching file group.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: Sequence[str],
    n_buckets: int,
    path: str | None = None,
    sort_by: Sequence[str] | None = None,
) -> None:
    """Persist ``df`` as a bucketed parquet table in the session catalog.

    Bucketing is a table-catalog feature (the bucket spec lives in table
    metadata, not in the parquet files), so this goes through
    ``saveAsTable``; pass ``path`` to keep the data at an external
    location.  ``sort_by`` additionally sorts rows inside each bucket
    file, letting sort-merge joins on the key skip their sort phase.
    """
    if n_buckets <= 0:
        raise ValueError(f"n_buckets must be positive, got {n_buckets}")
    keys = list(keys)
    writer = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, *keys)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back (the bucket spec rides along from the
    catalog — plain ``spark.read.parquet`` on the files would lose it)."""
    return spark.table(table)
