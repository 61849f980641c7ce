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


def test_write_replay_split_membership_and_order(spark, tmp_path):
    """The distributed replay split must reproduce the old pandas-slicing
    contract exactly: batch 0 = the first ceil(0.8 n) rows in the total
    order, batch 1 = the rest; files sorted within; mtimes pin ingestion
    order; n rows over the cap refuse before writing."""
    import pytest

    import pyspark.sql.functions as F

    from query_skyline_qos_flink_spark.plans import streaming_replay as sr

    df = spark.createDataFrame(
        [(i % 7, i) for i in range(103)], "k long, uid long"
    ).repartition(5)
    d = str(tmp_path / "data")
    total = sr._write_replay_split(df, ["k", "uid"], d, "csv", "unit")
    assert total == 103
    n1 = -(-103 * 8 // 10)  # ceil(0.8 n)

    def read(p):
        with open(p) as f:
            return [tuple(map(int, ln.split(","))) for ln in f.read().splitlines()]

    f0 = read(os.path.join(d, "f0.csv"))
    f1 = read(os.path.join(d, "f1.csv"))
    ordered = sorted(((i % 7, i) for i in range(103)))
    assert f0 == ordered[:n1]          # membership AND intra-file order
    assert f1 == ordered[n1:]
    assert os.path.getmtime(os.path.join(d, "f0.csv")) < os.path.getmtime(
        os.path.join(d, "f1.csv")
    )

    big = spark.range(0, 10).select(F.col("id"))
    old_cap = sr._MAX_REPLAY_ROWS
    sr._MAX_REPLAY_ROWS = 5
    try:
        with pytest.raises(RuntimeError, match="capped at 5"):
            sr._write_replay_split(big, ["id"], str(tmp_path / "d2"), "csv", "unit")
        assert not (tmp_path / "d2").exists()  # refused BEFORE writing
    finally:
        sr._MAX_REPLAY_ROWS = old_cap


def test_write_replay_split_rejects_boundary_tie_spill(spark, tmp_path):
    """`key <= boundary` reproduces the ceil(0.8 n) membership unless the
    boundary key spills past rank k (its ties would be pulled into batch
    0) — that exact condition must fail fast, detected for free from the
    rank-k/rank-k+1 selection.  Ties wholly INSIDE batch 0 are benign
    and must still split exactly."""
    import os as _os

    import pytest

    from query_skyline_qos_flink_spark.plans import streaming_replay as sr

    # 10 rows, k = 8: ranks 8 and 9 share key 9 -> boundary spills
    spill = spark.createDataFrame(
        [(k,) for k in [1, 2, 3, 4, 5, 6, 7, 9, 9, 9]], "k long"
    )
    with pytest.raises(ValueError, match="not a total order at the split"):
        sr._write_replay_split(spill, ["k"], str(tmp_path / "dup"), "csv", "unit")

    # duplicates below the boundary: rank 8 = key 3, rank 9 = key 4 ->
    # `<= 3` pulls exactly the first 8 rows; the split must succeed
    benign = spark.createDataFrame([(i // 2,) for i in range(10)], "k long")
    d = str(tmp_path / "benign")
    assert sr._write_replay_split(benign, ["k"], d, "csv", "unit") == 10
    with open(_os.path.join(d, "f0.csv")) as f:
        assert len(f.read().splitlines()) == 8  # exact ceil(0.8 n) membership
