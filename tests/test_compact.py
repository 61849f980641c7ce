"""Compaction: row parity, file-count planning, stats-friendly sort."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from tools.compact import compact, plan_file_count


def test_plan_file_count_bounds():
    assert plan_file_count(0, 128 << 20) == 1
    assert plan_file_count(1, 128 << 20) == 1
    assert plan_file_count(10 * (128 << 20), 128 << 20) == 10
    assert plan_file_count(10**15, 128 << 20, max_files=100) == 100


@pytest.fixture()
def fragmented(spark, tmp_path):
    src = str(tmp_path / "frag")
    # 40 tiny files
    spark.range(0, 20_000).select(
        "id", (F.col("id") % 97).alias("k"), F.md5(F.col("id").cast("string")).alias("v")
    ).repartition(40).write.parquet(src)
    assert len(glob.glob(os.path.join(src, "*.parquet"))) >= 40
    return src


def test_compact_row_parity_and_fewer_files(spark, fragmented, tmp_path):
    dst = str(tmp_path / "compacted")
    compact(spark, fragmented, dst, target_mb=128)
    before = spark.read.parquet(fragmented)
    after = spark.read.parquet(dst)
    assert after.count() == before.count() == 20_000
    # order-insensitive content parity (bit_xor: overflow-free under ANSI)
    h = lambda df: df.select(F.bit_xor(F.xxhash64("id", "k", "v"))).first()[0]
    assert h(after) == h(before)
    assert len(glob.glob(os.path.join(dst, "*.parquet"))) < 40


def test_compact_sorted_files_have_disjoint_ranges(spark, tmp_path):
    src = str(tmp_path / "big")
    # ~10 MB so a 1 MB target plans >1 file even after compression
    spark.range(0, 300_000).select(
        "id", F.md5(F.col("id").cast("string")).alias("v")
    ).repartition(20).write.parquet(src)
    dst = str(tmp_path / "sorted")
    compact(spark, src, dst, target_mb=1, sort_by=["id"], max_files=4)
    files = sorted(glob.glob(os.path.join(dst, "*.parquet")))
    assert 1 < len(files) <= 4
    # range partitioning -> per-file id ranges must not overlap
    ranges = []
    for f in files:
        r = spark.read.parquet(f).agg(F.min("id"), F.max("id")).first()
        ranges.append((r[0], r[1]))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2, f"overlapping file ranges: {(lo1, hi1)} vs {(lo2, hi2)}"


def test_compact_refuses_to_clobber(spark, fragmented, tmp_path):
    dst = str(tmp_path / "dst")
    compact(spark, fragmented, dst)
    with pytest.raises(Exception):
        compact(spark, fragmented, dst)  # mode("error") on existing dir
