"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``query_skyline_qos_flink_spark``; the query
corpus (SURVEY.md §2.4 + LLM-pipeline extensions) is the registry in
``query_skyline_qos_flink_spark/plans/``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from query_skyline_qos_flink_spark.plans import corpus  # noqa: E402
from query_skyline_qos_flink_spark.plans import pipeline  # noqa: E402, F401  (registers)
from query_skyline_qos_flink_spark.plans import relational  # noqa: E402, F401  (registers)
from query_skyline_qos_flink_spark.plans import streaming_replay  # noqa: E402, F401  (registers)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: S1 2-D skyline of lineitem at sf0.001."""
    return corpus.REGISTRY["s1_skyline_2d"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in corpus.REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in corpus.REGISTRY.items() if spec.oracle is not None
    }
