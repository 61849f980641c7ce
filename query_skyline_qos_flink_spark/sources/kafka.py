"""Kafka source/sink builders — the reference's topology endpoints.

Parity targets (``/root/reference/java/org.main/FlinkSkyline.java``):
* O1 data source  (:84-89):  topic ``input-tuples``, EARLIEST offsets.
* O2 query source (:92-97):  topic ``queries``, LATEST offsets (control
  channel — only new triggers matter).
* O22 result sink (:177-183): topic ``output-skyline``, producer
  ``max.request.size`` raised to 10 MB for large skyline payloads (also
  mirrored broker-side in the reference's docker-compose).

These are thin builders over Structured Streaming's kafka connector; this
environment has no broker (and no kafka connector jar), so they are exercised
by the file/memory harness in ``streaming/`` instead — the parse/process
stages are identical either way, which is the point of keeping sources thin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DEFAULT_DATA_TOPIC = "input-tuples"
DEFAULT_QUERY_TOPIC = "queries"
DEFAULT_OUTPUT_TOPIC = "output-skyline"
MAX_REQUEST_SIZE = 10 * 1024 * 1024  # 10 MB, FlinkSkyline.java:179


def kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
) -> DataFrame:
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
        .selectExpr("CAST(value AS STRING) AS value")
    )


def data_source(spark: SparkSession, bootstrap_servers: str,
                topic: str = DEFAULT_DATA_TOPIC) -> DataFrame:
    """O1: unbounded tuple stream, replay from earliest."""
    return kafka_stream(spark, bootstrap_servers, topic, "earliest")


def query_source(spark: SparkSession, bootstrap_servers: str,
                 topic: str = DEFAULT_QUERY_TOPIC) -> DataFrame:
    """O2: control stream, latest offsets only."""
    return kafka_stream(spark, bootstrap_servers, topic, "latest")


def sink_options(
    bootstrap_servers: str,
    topic: str = DEFAULT_OUTPUT_TOPIC,
    max_request_size: int = MAX_REQUEST_SIZE,
) -> dict[str, str]:
    """O22 writer options, exposed as a plain dict so the frame-size
    passthrough is testable without a broker (``kafka.``-prefixed options
    are handed verbatim to the Kafka producer by the connector)."""
    return {
        "kafka.bootstrap.servers": bootstrap_servers,
        "topic": topic,
        "kafka.max.request.size": str(max_request_size),
    }


def result_sink(
    df: DataFrame,
    bootstrap_servers: str,
    checkpoint_dir: str,
    topic: str = DEFAULT_OUTPUT_TOPIC,
    max_request_size: int = MAX_REQUEST_SIZE,
):
    """O22: JSON result writer (df must have a ``value`` string column)."""
    return (
        df.writeStream.format("kafka")
        .options(**sink_options(bootstrap_servers, topic, max_request_size))
        .option("checkpointLocation", checkpoint_dir)
    )
