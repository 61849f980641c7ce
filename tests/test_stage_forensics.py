"""Event-log stage forensics (tools/stage_forensics.py): attribution
arithmetic on synthetic logs, plain and zstd-compressed v2 rolling dirs
(the latter decoded through the repo's own libzstd bridge)."""

from __future__ import annotations

import json
import os

import pytest

from query_skyline_qos_flink_spark.sources import native_codecs as nc
from tools.stage_forensics import analyze


def _log_lines():
    evs = []

    def stage(sid, ntasks, sub, done, name="probe"):
        evs.append(
            {
                "Event": "SparkListenerStageCompleted",
                "Stage Info": {
                    "Stage ID": sid,
                    "Stage Name": name,
                    "Number of Tasks": ntasks,
                    "Submission Time": sub,
                    "Completion Time": done,
                },
            }
        )

    def task(sid, run_ms, cpu_ms, gc_ms=0):
        evs.append(
            {
                "Event": "SparkListenerTaskEnd",
                "Stage ID": sid,
                "Task Metrics": {
                    "Executor Run Time": run_ms,
                    "Executor CPU Time": int(cpu_ms * 1e6),
                    "JVM GC Time": gc_ms,
                    "Input Metrics": {"Bytes Read": 1_000_000},
                },
            }
        )

    # stage 1: python-wait signature (uniform tasks, cpu ~ 0)
    stage(1, 4, 1000, 11000)
    for _ in range(4):
        task(1, 10_000, 50)
    # stage 2: JVM compute (cpu ~= run) with one straggler
    stage(2, 4, 1000, 5000)
    for run in (900, 1000, 1100, 4000):
        task(2, run, run * 0.95)
    return [json.dumps(e).encode() for e in evs]


def test_analyze_plain_file(tmp_path):
    p = tmp_path / "eventlog"
    p.write_bytes(b"\n".join(_log_lines()) + b"\n")
    rows = {r["stage"]: r for r in analyze(str(p))}
    s1, s2 = rows[1], rows[2]
    assert s1["flags"] == ["python-wait"]
    assert s1["cpu_ratio"] < 0.05 and s1["task_p50_s"] == 10.0
    assert "python-wait" not in s2["flags"]
    assert "straggler" in s2["flags"]
    assert s2["cpu_ratio"] > 0.9
    # sorted by wall time descending
    assert [r["stage"] for r in analyze(str(p))] == [1, 2]


@pytest.mark.skipif(not nc.zstd_available(), reason="no libzstd")
def test_analyze_zstd_rolling_dir(tmp_path):
    d = tmp_path / "eventlog_v2_local-123"
    os.makedirs(d)
    lines = _log_lines()
    # two rolled parts, each its own zstd frame (Spark's rolling shape)
    (d / "events_1_local-123.zstd").write_bytes(
        nc.zstd_compress(b"\n".join(lines[: len(lines) // 2]) + b"\n")
    )
    (d / "events_2_local-123.zstd").write_bytes(
        nc.zstd_compress(b"\n".join(lines[len(lines) // 2 :]) + b"\n")
    )
    (d / "appstatus_local-123").write_bytes(b"")
    rows = {r["stage"]: r for r in analyze(str(d))}
    assert set(rows) == {1, 2}
    assert rows[1]["flags"] == ["python-wait"]
