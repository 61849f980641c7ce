"""Scan fan-out for per-row-expensive kernels on under-split inputs.

Covers both halves of the round-16 single-row-group fix
(``operators/fanout.py`` + ``caching.persist_balanced``): a small table
written as ONE parquet row group yields exactly one effective scan split
(only the byte-range containing the row-group start reads rows), so every
``mapInPandas`` phase riding that scan — and every scan of its cache —
ran on a single core (s30's cached input materialized as ``[0, 35645,
0]`` at sf0.1)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from query_skyline_qos_flink_spark.operators.caching import persist_balanced
from query_skyline_qos_flink_spark.operators.fanout import fanout_narrow_scan


def _write_parquet(path, n_rows: int, row_group_rows: int) -> None:
    tbl = pa.table(
        {
            "id": np.arange(n_rows, dtype=np.int64),
            "x": np.arange(n_rows, dtype=np.float64) % 97,
        }
    )
    pq.write_table(tbl, str(path), row_group_size=row_group_rows)


def _populated_partitions(df) -> list[int]:
    rows = (
        df.groupBy(F.spark_partition_id().alias("p")).count().collect()
    )
    return sorted(r["count"] for r in rows if r["count"] > 0)


def test_single_row_group_scan_fans_out(spark, tmp_path):
    p = tmp_path / "one_rg.parquet"
    _write_parquet(p, 20_000, row_group_rows=20_000)
    df = spark.read.parquet(str(p))
    target = spark.sparkContext.defaultParallelism
    # the pathology: every row in one effective split
    assert max(_populated_partitions(df)) == 20_000
    out = fanout_narrow_scan(df)
    assert out is not df
    pops = _populated_partitions(out)
    assert len(pops) == target  # every core holds rows
    assert sum(pops) == 20_000  # nothing lost or duplicated
    assert max(pops) <= 2 * (20_000 // target)


def test_many_row_group_scan_left_alone(spark, tmp_path):
    p = tmp_path / "many_rg.parquet"
    target = spark.sparkContext.defaultParallelism
    _write_parquet(p, 20_000, row_group_rows=20_000 // (2 * target))
    df = spark.read.parquet(str(p))
    assert fanout_narrow_scan(df) is df  # footer proves enough splits


def test_already_repartitioned_plan_left_alone(spark, tmp_path):
    p = tmp_path / "one_rg2.parquet"
    _write_parquet(p, 20_000, row_group_rows=20_000)
    df = spark.read.parquet(str(p)).repartition(4)
    assert fanout_narrow_scan(df) is df  # no exchange stacking


def test_non_scan_plan_left_alone(spark):
    df = spark.range(1000)  # no input files
    assert fanout_narrow_scan(df) is df


def test_fanout_preserves_operator_results(spark, tmp_path):
    """End-to-end: the d>=3 skyline over a single-row-group file equals
    the same skyline over a well-split read of the identical rows."""
    from query_skyline_qos_flink_spark.operators.skyline import skyline

    rng = np.random.default_rng(7)
    pdf = pd.DataFrame(
        {
            "a": rng.integers(0, 100, 5000).astype(float),
            "b": rng.integers(0, 100, 5000).astype(float),
            "c": rng.integers(0, 100, 5000).astype(float),
        }
    )
    p = tmp_path / "sky.parquet"
    pq.write_table(pa.Table.from_pandas(pdf), str(p), row_group_size=5000)
    narrow = spark.read.parquet(str(p))
    wide = spark.createDataFrame(pdf).repartition(8)
    got = skyline(narrow, ["a", "b", "c"]).toPandas()
    want = skyline(wide, ["a", "b", "c"]).toPandas()
    key = ["a", "b", "c"]
    assert (
        got.sort_values(key).reset_index(drop=True).equals(
            want.sort_values(key).reset_index(drop=True)
        )
    )


def test_persist_balanced_rebalances_skewed_cache(spark):
    target = spark.sparkContext.defaultParallelism
    skewed = spark.range(10_000).coalesce(1)
    bal, n = persist_balanced(skewed)
    assert n == 10_000
    pops = _populated_partitions(bal)
    assert len(pops) == target
    assert sum(pops) == 10_000
    assert bal.count() == 10_000


def test_persist_balanced_keeps_balanced_cache(spark):
    target = spark.sparkContext.defaultParallelism
    even = spark.range(10_000, numPartitions=target)
    bal, n = persist_balanced(even)
    assert n == 10_000
    # no rebalance: the returned frame still reads target partitions and
    # carries no extra exchange
    assert bal.rdd.getNumPartitions() == target
    assert "Repartition" not in bal._jdf.queryExecution().analyzed().toString()


def test_persist_balanced_tiny_input_short_circuits(spark):
    tiny = spark.range(5).coalesce(1)
    bal, n = persist_balanced(tiny)
    assert n == 5
    assert bal.rdd.getNumPartitions() == 1  # not worth an exchange


@pytest.mark.parametrize("sf_table", ["lineitem", "documents"])
def test_sf_fixtures_are_the_pathological_shape(sf_table):
    """Pin the fixture fact the round-16 fix exists for: the driver's
    parquet tables are single-row-group files, so any future fixture
    regeneration that changes this shows up here (and the fan-out's
    bench relevance should be re-checked)."""
    meta = pq.ParquetFile(f"/root/testdata/sf0.001/{sf_table}.parquet").metadata
    assert meta.num_row_groups == 1
