"""Wire-format codecs — the reference's external schemas (SURVEY.md §1.2).

* data records: CSV ``"ID,v1,v2,…"`` — malformed lines (empty, non-numeric
  dim, lone id) are dropped silently
  (``/root/reference/java/org.main/ServiceTuple.java:84-104``,
  ``FlinkSkyline.java:102-104``).
* query triggers: CSV ``"QueryID,RequiredRecordCount"``; a payload without
  a comma means required_count = 0 -> immediate execution
  (``FlinkSkyline.java:303-305,332-334``).
* result records: one JSON object per completed query
  (``FlinkSkyline.java:625-650``) — including ``query_latency_ms``, which
  the reference computes but never serializes (documented bug, SURVEY.md
  §1.2; we emit it).

All parsing is pure column expressions (codegen'd, scan-parallel).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

TUPLE_SCHEMA = "id bigint, values array<double>"
TRIGGER_SCHEMA = "query_id string, required_count bigint"

RESULT_FIELDS = [
    "query_id",
    "record_count",
    "skyline_size",
    "optimality",
    "ingestion_time_ms",
    "local_processing_time_ms",
    "global_processing_time_ms",
    "total_processing_time_ms",
    "query_latency_ms",
]


def parse_service_tuples(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """``value`` string -> (id bigint, values array<double>); malformed rows
    dropped (DROPMALFORMED semantics, reference O3/O4)."""
    arr = F.split(F.col(value_col).cast("string"), ",")
    parsed = raw.select(
        F.element_at(arr, 1).try_cast("bigint").alias("id"),
        F.transform(F.slice(arr, 2, F.size(arr) - 1), lambda x: x.try_cast("double")).alias("values"),
    )
    return parsed.where(
        F.col("id").isNotNull()
        & (F.size("values") >= 1)
        & ~F.exists("values", lambda v: v.isNull() | F.isnan(v))
    )


def parse_query_triggers(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """``value`` string -> (query_id, required_count); comma-less payload
    => required_count 0 (immediate); blank lines dropped."""
    v = F.col(value_col).cast("string")
    arr = F.split(v, ",")
    return (
        raw.select(
            F.element_at(arr, 1).alias("query_id"),
            F.coalesce(
                F.when(F.size(arr) >= 2, F.element_at(arr, 2).try_cast("bigint")), F.lit(0)
            ).alias("required_count"),
        )
        .where(F.col("query_id").isNotNull() & (F.col("query_id") != ""))
    )


def encode_service_tuples(df: DataFrame) -> DataFrame:
    """(id, values) -> CSV ``value`` strings (producer side, reference P1-P3
    emit format ``unified_producer.py:174``)."""
    return df.select(
        F.concat_ws(
            ",",
            F.col("id").cast("string"),
            F.concat_ws(",", F.transform("values", lambda v: v.cast("string"))),
        ).alias("value")
    )


def result_json(df: DataFrame, emit_points: bool = False) -> DataFrame:
    """Result rows -> the reference's output JSON (O21).  ``emit_points``
    mirrors the reference's OOM-guard flag (points suppressed by default,
    ``FlinkSkyline.java:610-623``)."""
    fields: list[Column] = [F.col(c) for c in RESULT_FIELDS if c in df.columns]
    if emit_points and "skyline_points" in df.columns:
        fields.append(F.col("skyline_points"))
    return df.select(F.to_json(F.struct(*fields)).alias("value"))
