"""Per-query BUILD profiler: times `spec.fn(spark, sf_dir)` — plan
construction only, no action — and counts py4j round trips per build.

The round-16 verdict's top lever: ~0.15-0.25 s of per-query eager-analysis
py4j tax across the 46-query suite.  Round-trip counts are contention-
immune (they count protocol commands, not wall time), so this can run on
a loaded box; the wall column is advisory.

Usage: python tools/profile_build.py [sf_dir] [query ...]
       (no query args = the whole bench suite, sorted by round trips)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from py4j import clientserver, java_gateway  # noqa: E402

from query_skyline_qos_flink_spark.plans import corpus  # noqa: E402
from query_skyline_qos_flink_spark.plans import pipeline, relational  # noqa: E402, F401
from query_skyline_qos_flink_spark.session import get_spark  # noqa: E402

_TRIPS = 0


def _count_sends(cls):
    orig = cls.send_command

    def counting(self, *a, **kw):
        global _TRIPS
        _TRIPS += 1
        return orig(self, *a, **kw)

    cls.send_command = counting


# pyspark 4 uses the pinned-thread ClientServer transport; patch both.
_count_sends(clientserver.ClientServerConnection)
_count_sends(java_gateway.GatewayConnection)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:] or list(
        __import__("bench", fromlist=["CORPUS_QUERIES"]).CORPUS_QUERIES
    )
    spark = get_spark(app_name="profile-build")
    rows = []
    for name in names:
        spec = corpus.spec(name)
        spec.fn(spark, sf_dir)  # warm build: session caches, JVM JIT
        global _TRIPS
        tracker = spark.sparkContext.statusTracker()
        best = None
        for _ in range(3):  # min-of-3: build time has no cold/warm split
            j0 = len(tracker.getJobIdsForGroup(None) or [])
            t0, c0 = time.perf_counter(), _TRIPS
            spec.fn(spark, sf_dir)
            dt, dc = time.perf_counter() - t0, _TRIPS - c0
            dj = len(tracker.getJobIdsForGroup(None) or []) - j0
            if best is None or dt < best[0]:
                best = (dt, dc, dj)
        rows.append((best[0], best[1], name, best[2]))
        print(
            f"{name}: build {best[0]:.3f}s, {best[1]} py4j round trips, "
            f"{best[2]} eager jobs",
            flush=True,
        )
    print("\n== sorted by round trips ==")
    for dt, dc, name, dj in sorted(rows, key=lambda r: -r[1]):
        print(f"{dc:6d} trips  {dt:7.3f}s  jobs={dj}  {name}")
    print("\n== sorted by build seconds ==")
    for dt, dc, name, dj in sorted(rows, key=lambda r: -r[0]):
        print(f"{dt:7.3f}s  {dc:6d} trips  jobs={dj}  {name}")
    print(f"TOTAL build: {sum(r[0] for r in rows):.2f}s, {sum(r[1] for r in rows)} trips")
    spark.stop()


if __name__ == "__main__":
    main()
