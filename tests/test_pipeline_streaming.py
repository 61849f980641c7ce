"""End-to-end streaming pipeline + metrics collector + plots gating."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from query_skyline_qos_flink_spark.streaming.pipeline import MetricsCollector, run_pipeline


def test_run_pipeline_collects_metrics_csv(spark, tmp_path):
    data_dir, query_dir = tmp_path / "data", tmp_path / "queries"
    data_dir.mkdir(), query_dir.mkdir()
    rng = np.random.default_rng(21)
    with open(data_dir / "b0.csv", "w") as f:
        for i in range(300):
            f.write(f"{i},{rng.integers(0, 1000)},{rng.integers(0, 1000)}\n")
    with open(query_dir / "q.csv", "w") as f:
        f.write("q1,200\nq2\n")

    csv_path = str(tmp_path / "metrics.csv")
    seen: list[pd.DataFrame] = []
    q = run_pipeline(
        spark.readStream.schema("value string").text(str(data_dir)),
        spark.readStream.schema("value string").text(str(query_dir)),
        checkpoint_dir=str(tmp_path / "ckpt"),
        d=2,
        num_partitions=4,
        domain=1000.0,
        on_result=seen.append,
        collector_csv=csv_path,
    )
    q.awaitTermination(120)
    assert seen and set(pd.concat(seen)["query_id"]) == {"q1", "q2"}
    out = pd.read_csv(csv_path)
    assert list(out.columns) == [
        "QueryID", "Records", "SkylineSize", "Optimality", "IngestTime(ms)",
        "LocalTime(ms)", "GlobalTime(ms)", "TotalTime(ms)", "Latency(ms)",
        "SkylinePoints",
    ]
    assert set(out["QueryID"]) == {"q1", "q2"}
    assert (out["SkylineSize"] > 0).all()
    assert (out["Latency(ms)"] > 0).all()  # the reference writes 0 here; we don't


def test_metrics_collector_appends(tmp_path):
    path = str(tmp_path / "m.csv")
    c = MetricsCollector(path)
    row = pd.DataFrame(
        [
            {
                "query_id": "q", "record_count": 1, "skyline_size": 1,
                "optimality": 1.0, "ingestion_time_ms": 0.0,
                "local_processing_time_ms": 1.0, "global_processing_time_ms": 1.0,
                "total_processing_time_ms": 2.0, "query_latency_ms": 2.0,
            }
        ]
    )
    c.append(row), c.append(row)
    assert len(pd.read_csv(path)) == 2


def test_plots_render_without_matplotlib(tmp_path):
    """The plot tooling must import and RENDER without matplotlib (stdlib
    raster fallback); full render-gate assertions live in
    tests/test_plots_render.py."""
    from tools import plots, rasterpng

    out = plots.skyline_staircase_2d(
        pd.DataFrame({"x": [1.0, 2.0], "y": [2.0, 1.0]}), "x", "y", str(tmp_path / "x.png")
    )
    w, h = rasterpng.read_png_size(out)
    assert w > 0 and h > 0
