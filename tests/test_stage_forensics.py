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


@pytest.mark.skipif(not nc.zstd_available(), reason="no libzstd")
def test_analyze_handles_gzip_lz4_skippable_and_rejects_unknown(tmp_path):
    """Round-14 review (2nd pass): gzip and lz4 logs decode (bounded),
    a skippable-prefixed zstd log (pzstd shape) decodes, and an
    unsupported binary codec raises instead of yielding zero stages."""
    import gzip as _gzip

    payload = b"\n".join(_log_lines()) + b"\n"
    g = tmp_path / "gz_log"
    g.write_bytes(_gzip.compress(payload))
    assert {r["stage"] for r in analyze(str(g))} == {1, 2}
    skip = b"\x50\x2a\x4d\x18" + (8).to_bytes(4, "little") + b"SEEKTAB!"
    z = tmp_path / "pzstd_log"
    z.write_bytes(skip + nc.zstd_compress(payload))
    assert {r["stage"] for r in analyze(str(z))} == {1, 2}
    if nc.lz4_available():
        l4 = tmp_path / "lz4_log"
        l4.write_bytes(nc.lz4_compress(payload))
        assert {r["stage"] for r in analyze(str(l4))} == {1, 2}
    bad = tmp_path / "snappy_log"
    bad.write_bytes(b"\x82SNAPPY\x00" + payload)
    with pytest.raises(ValueError, match="unsupported"):
        analyze(str(bad))


@pytest.mark.skipif(not nc.zstd_available(), reason="no libzstd")
def test_zstd_reset_mid_frame_rejected():
    d = nc.ZstdDecompressor()
    blob = nc.zstd_compress(b"x" * 100_000)
    d.decompress(blob[:50], 16)  # mid-frame
    with pytest.raises(ValueError, match="only legal after frame end"):
        d.reset()


@pytest.mark.skipif(not nc.zstd_available(), reason="no libzstd")
def test_sniff_truncated_skippable_prefix_stays_codec_routed():
    """A skippable prefix followed by a truncated regular magic must be
    reported by the codec layer, not mis-walked as a plain tar."""
    from query_skyline_qos_flink_spark.sources import archives as ar

    skip = b"\x50\x2a\x4d\x18" + (8).to_bytes(4, "little") + b"SEEKTAB!"
    with pytest.raises(ValueError, match="tar.zst"):
        ar.maybe_decompress_tar(skip + b"\x28\xb5")


def test_concatenated_gzip_members_all_decode(tmp_path):
    """Appended gzip logs (gzip -c >>) carry concatenated members; the
    bounded decode must walk them all, and trailing garbage raises."""
    import gzip as _gzip

    lines = _log_lines()
    half = len(lines) // 2
    p = tmp_path / "appended_log"
    p.write_bytes(
        _gzip.compress(b"\n".join(lines[:half]) + b"\n")
        + _gzip.compress(b"\n".join(lines[half:]) + b"\n")
    )
    assert {r["stage"] for r in analyze(str(p))} == {1, 2}
    bad = tmp_path / "trailing"
    bad.write_bytes(_gzip.compress(b"{}") + b"garbage")
    with pytest.raises(ValueError, match="trailing"):
        analyze(str(bad))
