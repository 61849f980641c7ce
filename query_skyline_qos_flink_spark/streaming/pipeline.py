"""End-to-end streaming pipeline wiring + metrics collector sink.

``run_pipeline`` assembles the full reference topology (parse -> spatial
state -> global phase -> result JSON) over any pair of raw string streams
(Kafka via ``sources/kafka.py`` in production, file/memory streams in CI),
with the global phase inside ``foreachBatch`` — each micro-batch of fired
partials is a complete barrier (every partition answers a trigger within
the batch that releases it in availableNow replays).

``MetricsCollector`` is the reference's Kafka->CSV collector
(``/root/reference/python/metrics_collector.py:60-128``) as a foreachBatch
appender: one CSV row per completed query with the same column order —
plus a real Latency value (the reference always writes 0 there because the
Java job never serializes ``query_latency_ms``; SURVEY.md §1.2)."""

from __future__ import annotations

import os
from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame

from ..sources import wire
from .skyline_stream import build_skyline_stream, finalize_results

COLLECTOR_COLUMNS = [
    "QueryID", "Records", "SkylineSize", "Optimality", "IngestTime(ms)",
    "LocalTime(ms)", "GlobalTime(ms)", "TotalTime(ms)", "Latency(ms)",
    "SkylinePoints",
]


class MetricsCollector:
    """Append one CSV row per completed query (reference P6 parity)."""

    def __init__(self, csv_path: str, emit_points: bool = False) -> None:
        self.csv_path = csv_path
        self.emit_points = emit_points

    def append(self, metrics: pd.DataFrame) -> None:
        rows = pd.DataFrame(
            {
                "QueryID": metrics["query_id"],
                "Records": metrics["record_count"],
                "SkylineSize": metrics["skyline_size"],
                "Optimality": metrics["optimality"],
                "IngestTime(ms)": metrics["ingestion_time_ms"],
                "LocalTime(ms)": metrics["local_processing_time_ms"],
                "GlobalTime(ms)": metrics["global_processing_time_ms"],
                "TotalTime(ms)": metrics["total_processing_time_ms"],
                "Latency(ms)": metrics["query_latency_ms"],
                "SkylinePoints": "" if not self.emit_points else metrics.get("skyline_points", ""),
            }
        )
        header = not os.path.exists(self.csv_path)
        rows.to_csv(self.csv_path, mode="a", header=header, index=False)


def run_pipeline(
    raw_data: DataFrame,
    raw_queries: DataFrame,
    checkpoint_dir: str,
    d: int = 2,
    num_partitions: int = 8,
    strategy: str = "dim",
    domain: float = 10000.0,
    on_result: Callable[[pd.DataFrame], None] | None = None,
    collector_csv: str | None = None,
    available_now: bool = True,
    emit_points: bool = False,
    per_pid_breakdown: bool = False,
):
    """Parse raw string streams, run the stateful skyline, finalize each
    micro-batch of partials, and hand the per-query metrics to
    ``on_result`` / a CSV collector.  Returns the StreamingQuery."""
    data = wire.parse_service_tuples(raw_data)
    trig = wire.parse_query_triggers(raw_queries)
    partials = build_skyline_stream(
        data, trig, d=d, num_partitions=num_partitions, strategy=strategy, domain=domain
    )
    collector = MetricsCollector(collector_csv) if collector_csv else None
    # arrival-countdown latch (reference O17): a query's partials may span
    # micro-batches AND restarts (a trigger can release on different
    # partitions in different batches), so buffer per query until every
    # partition reported — durably, next to the stream's own checkpoint
    os.makedirs(checkpoint_dir, exist_ok=True)
    latch_path = os.path.join(checkpoint_dir, "pending_partials.parquet")
    pending: list[pd.DataFrame] = []
    if os.path.exists(latch_path):
        try:
            pending.append(pd.read_parquet(latch_path))
        except Exception:  # pragma: no cover - corrupt latch: drop, don't crash-loop
            os.remove(latch_path)

    def handle_batch(batch_df: DataFrame, _batch_id: int) -> None:
        pdf = batch_df.toPandas()
        if pdf.empty and not pending:
            return
        allp = pd.concat([*pending, pdf], ignore_index=True) if pending else pdf
        # idempotent under foreachBatch replay: a crashed-then-replayed batch
        # re-delivers partials already buffered durably; each partial point
        # is unique per (query, partition, record id), markers per (query,
        # partition) — drop the duplicates before counting arrivals
        allp = allp.drop_duplicates(subset=["query_id", "pid", "id"], keep="first")
        counts = allp.groupby("query_id")["pid"].nunique()
        done = counts[counts >= num_partitions].index
        complete = allp[allp["query_id"].isin(done)]
        still = allp[~allp["query_id"].isin(done)]
        pending.clear()
        if len(still):
            pending.append(still)
            tmp = latch_path + ".tmp"
            still.to_parquet(tmp, index=False)
            os.replace(tmp, latch_path)  # atomic: a crash mid-write can't
            # leave a truncated latch that poisons every restart
        elif os.path.exists(latch_path):
            os.remove(latch_path)
        if complete.empty:
            return
        metrics = finalize_results(
            complete,
            num_partitions=num_partitions,
            emit_points=emit_points,
            per_pid_breakdown=per_pid_breakdown,
            # continuous mode gets the reference's O20 wall/ingest split;
            # availableNow replays backfill files at full speed, where the
            # wall span measures replay throughput, not ingestion
            replay=available_now,
        )
        if collector is not None:
            collector.append(metrics)
        if on_result is not None:
            on_result(metrics)

    writer = (
        partials.writeStream.foreachBatch(handle_batch)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
