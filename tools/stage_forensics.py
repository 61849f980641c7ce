"""Spark event-log stage forensics — the attribution tool that cracked
the round-14 ``skyline_anti_3d_1m`` investigation (SCALE.md), productized.

Reads a Spark event log (plain file, or a ``eventlog_v2_*`` rolling
directory whose ``events_*`` parts may be zstd-compressed — decoded
through this repo's own libzstd bridge, no Spark install needed) and
prints one line per stage with the three numbers that attribute where
stage time actually went:

* ``run``   — sum of task Executor Run Time (wall the executor held the
  task, INCLUDING python-worker wait);
* ``cpu``   — sum of task Executor CPU Time (JVM-side cycles only);
* ``gc``    — sum of JVM GC time.

The diagnostic is the ratio: ``cpu/run`` near 1 means JVM compute;
near 0 with low gc means the tasks were WAITING — on python workers
(Arrow UDF kernels, lineage recompute after a cache eviction, a
fork+import storm) or on I/O.  Uniform per-task times (p50 ~= max) with
near-zero cpu is the python-wait signature; a straggler (max >> p50)
is skew.  Flags are printed for both.

Usage::

    python tools/stage_forensics.py /path/to/eventlog[_v2_dir] [--top N]

Scale note: this is a driver-side analysis of an O(stages) summary, not
of task-level data volume — a 1000-executor job's event log parses in
seconds and the output is one line per stage.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from collections import defaultdict


def _iter_lines(path: str):
    """Yield event-log JSON lines from a plain file or a v2 rolling dir
    (parts sorted by index; zstd parts decoded via the repo bridge)."""
    if os.path.isdir(path):
        parts = sorted(
            (f for f in os.listdir(path) if f.startswith("events_")),
            key=lambda f: int(f.split("_")[1]),
        )
        files = [os.path.join(path, f) for f in parts]
    else:
        files = [path]
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from query_skyline_qos_flink_spark.sources import native_codecs as nc

    ceiling = 16 << 30
    for f in files:
        with open(f, "rb") as fh:
            data = fh.read()
        if data[:4] == b"\x28\xb5\x2f\xfd":
            data = nc.zstd_decompress_bounded(data, ceiling, what="eventlog")
        elif data[:4] == b"\x04\x22\x4d\x18":
            data = nc.lz4_decompress_bounded(data, ceiling, what="eventlog")
        elif nc._is_skippable_magic(data[:4]):
            # the 16 skippable-frame magics are shared between the zstd
            # and lz4 frame specs (pzstd prepends one), so try both
            try:
                data = nc.zstd_decompress_bounded(data, ceiling, what="eventlog")
            except ValueError:
                data = nc.lz4_decompress_bounded(data, ceiling, what="eventlog")
        elif data[:2] == b"\x1f\x8b":
            # bounded, like the codec-bridge paths: gzip allows ~1032x
            # inflation, a one-shot gzip.decompress could OOM the box.
            # Concatenated members are legal (appended `gzip -c >>` logs,
            # pigz) and must ALL decode — stopping at the first eof would
            # silently truncate the forensics (round-14 review).
            import zlib

            parts, total, buf = [], 0, data
            while buf:
                d = zlib.decompressobj(wbits=zlib.MAX_WBITS | 16)
                while True:
                    chunk = d.decompress(buf, 1 << 20)
                    total += len(chunk)
                    if total > ceiling:
                        raise ValueError(
                            f"{f}: gzip log inflates past {ceiling} bytes"
                        )
                    parts.append(chunk)
                    if d.eof:
                        break
                    if not d.unconsumed_tail:
                        raise ValueError(f"{f}: truncated gzip event log")
                    buf = d.unconsumed_tail
                buf = d.unused_data
                if buf and buf[:2] != b"\x1f\x8b":
                    raise ValueError(f"{f}: trailing bytes after the gzip log")
            data = b"".join(parts)
        elif data[:1] not in (b"{", b"[", b"", b"\n", b" "):
            # an unsupported compression codec (e.g. snappy) must fail
            # loudly — silently yielding zero parseable lines would read
            # as "no slow stages", the exact failure mode this tool
            # exists to prevent (round-14 review)
            raise ValueError(
                f"{f}: not JSON lines and not a zstd/lz4/gzip stream "
                f"(magic {data[:4].hex()}) — unsupported "
                "spark.eventLog.compression.codec?"
            )
        for line in data.splitlines():
            if line:
                yield line


def analyze(path: str) -> list[dict]:
    """Parse the log into per-stage summaries (sorted by wall time)."""
    stages: dict[int, dict] = {}
    tasks: dict[int, dict] = defaultdict(
        lambda: {"run": [], "cpu": [], "gc": [], "input": 0, "shuffle_r": 0, "shuffle_w": 0}
    )
    for raw in _iter_lines(path):
        try:
            ev = json.loads(raw)
        except json.JSONDecodeError:
            continue
        kind = ev.get("Event")
        if kind == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            sub, done = si.get("Submission Time"), si.get("Completion Time")
            stages[si["Stage ID"]] = {
                "stage": si["Stage ID"],
                "name": si["Stage Name"].split("\n")[0],
                "ntasks": si["Number of Tasks"],
                "wall_s": round((done - sub) / 1000, 2) if sub and done else None,
            }
        elif kind == "SparkListenerTaskEnd":
            m = ev.get("Task Metrics") or {}
            t = tasks[ev["Stage ID"]]
            t["run"].append(m.get("Executor Run Time", 0))
            t["cpu"].append(m.get("Executor CPU Time", 0) / 1e6)  # ns -> ms
            t["gc"].append(m.get("JVM GC Time", 0))
            t["input"] += (m.get("Input Metrics") or {}).get("Bytes Read", 0)
            t["shuffle_r"] += (m.get("Shuffle Read Metrics") or {}).get(
                "Remote Bytes Read", 0
            ) + (m.get("Shuffle Read Metrics") or {}).get("Local Bytes Read", 0)
            t["shuffle_w"] += (m.get("Shuffle Write Metrics") or {}).get(
                "Shuffle Bytes Written", 0
            )
    out = []
    for sid, st in stages.items():
        t = tasks.get(sid)
        if not t or not t["run"]:
            continue
        runs = sorted(t["run"])
        run_sum = sum(runs)
        cpu_sum = sum(t["cpu"])
        p50 = runs[len(runs) // 2]
        mx = runs[-1]
        flags = []
        ratio = cpu_sum / run_sum if run_sum else 1.0
        if run_sum > 2000 and ratio < 0.25 and sum(t["gc"]) < 0.2 * run_sum:
            flags.append("python-wait")
        if len(runs) >= 4 and mx > 3 * max(p50, 1):
            flags.append("straggler")
        out.append(
            {
                **st,
                "run_s": round(run_sum / 1000, 2),
                "cpu_s": round(cpu_sum / 1000, 2),
                "gc_s": round(sum(t["gc"]) / 1000, 2),
                "cpu_ratio": round(ratio, 2),
                "task_p50_s": round(p50 / 1000, 2),
                "task_max_s": round(mx / 1000, 2),
                "input_mb": round(t["input"] / 1e6, 1),
                "shuffle_rw_mb": (
                    round(t["shuffle_r"] / 1e6, 1),
                    round(t["shuffle_w"] / 1e6, 1),
                ),
                "flags": flags,
            }
        )
    out.sort(key=lambda s: -(s["wall_s"] or 0))
    return out


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("path", help="event log file or eventlog_v2_* directory")
    ap.add_argument("--top", type=int, default=20, help="stages to print")
    args = ap.parse_args()
    rows = analyze(args.path)
    for s in rows[: args.top]:
        flags = f"  <<{' '.join(s['flags'])}>>" if s["flags"] else ""
        print(
            f"stage {s['stage']:>4} wall={s['wall_s']}s run={s['run_s']}s "
            f"cpu={s['cpu_s']}s ({s['cpu_ratio']}) gc={s['gc_s']}s "
            f"tasks={s['ntasks']} p50={s['task_p50_s']}s max={s['task_max_s']}s "
            f"in={s['input_mb']}MB shuf={s['shuffle_rw_mb']}MB "
            f"[{s['name'][:60]}]{flags}"
        )


if __name__ == "__main__":
    main()
