"""bench.py's driver-facing stdout line must fit the driver's tail capture.

Round-6 postmortem: the full per-query + scaling dump grew past the
driver's 2000-char stdout tail and the round recorded ``parsed: null`` —
no perf signal at all.  ``bench.final_line`` now owns the budget; these
tests pin it for both the real suite size and a pathological one.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench


def test_final_line_fits_at_current_suite_size():
    timings = {name: 1.234 for name in bench.CORPUS_QUERIES}
    line = bench.final_line(sum(timings.values()), 0.1, timings, {})
    assert len(line) <= bench._MAX_STDOUT_LINE
    parsed = json.loads(line)
    assert parsed["metric"] == "headline_suite_total"
    assert parsed["queries"], "per-query map must survive at current size"


def test_final_line_truncates_pathological_suite():
    timings = {f"x_query_with_a_rather_long_name_{i:03d}": float(i) for i in range(200)}
    errors = {f"err_{i}": "Traceback: " + "x" * 500 for i in range(40)}
    line = bench.final_line(sum(timings.values()), 0.1, timings, errors)
    assert len(line) <= bench._MAX_STDOUT_LINE
    parsed = json.loads(line)
    # The slowest queries survive truncation — that's the perf signal.
    assert "x_query_with_a_rather_long_name_199" in parsed["queries"]
    assert parsed["queries_omitted"] + len(parsed["queries"]) == 200


def test_final_line_budget_inside_driver_capture():
    assert bench._MAX_STDOUT_LINE <= 1900  # driver tail is 2000 chars


def test_final_line_truncates_errors_only_run():
    """Regression: an all-queries-failed run (timings == {}) must still fit
    the driver capture — the errors map is truncated on its own."""
    errors = {f"query_with_long_name_{i:03d}": "Boom: " + "y" * 60 for i in range(60)}
    line = bench.final_line(0.0, 0.1, {}, errors)
    assert len(line) <= bench._MAX_STDOUT_LINE
    parsed = json.loads(line)
    assert parsed["errors"] and parsed["errors_omitted"] > 0


def test_final_line_carries_trio_spreads_within_budget():
    """The round artifact itself (the parsed stdout line) records the
    measured variance band for the median-agg 1M trio — compact ratios
    only; full rep lists live in BENCH_DETAIL."""
    timings = {name: 1.234 for name in bench.CORPUS_QUERIES}
    spreads = {
        f"skyline_anti_{d}d_1m": {"reps_s": [1, 2, 3, 4, 5], "agg": "median",
                                  "spread_ratio": 4.02}
        for d in (2, 3, 4)
    }
    spreads["s1_skyline_2d"] = {"reps_s": [1, 1], "agg": "min", "spread_ratio": 9.0}
    spreads["s3_skyline_3d"] = {"reps_s": [1, 1.1, 1], "agg": "median",
                                "spread_ratio": 1.1}
    line = bench.final_line(sum(timings.values()), 0.1, timings, {}, spreads)
    assert len(line) <= bench._MAX_STDOUT_LINE
    parsed = json.loads(line)
    assert parsed["agg"] == "median"
    assert parsed["spread"] == {f"skyline_anti_{d}d_1m": 4.0 for d in (2, 3, 4)}
    # ad-hoc min-agg entries AND tight (<2x) medians stay out of the
    # compact map — with the whole suite median-agg since r12, only the
    # >=2x band is adjudication signal
    assert "s1_skyline_2d" not in parsed["spread"]
    assert "s3_skyline_3d" not in parsed["spread"]


def test_final_line_trims_spread_smallest_first_before_queries():
    """spread is the only other unbounded field — an oversized spread map
    must shrink smallest-ratio-first BEFORE the per-query map is touched
    (r10 ADVICE: the old order let spread evict slow-query entries), and
    the highest-ratio entries — the regression-adjudication signal —
    survive longest."""
    timings = {f"x_query_with_a_rather_long_name_{i:03d}": float(i) for i in range(200)}
    spreads = {
        f"x_query_with_a_rather_long_name_{i:03d}": {
            "reps_s": [1], "agg": "median", "spread_ratio": 2.0 + i / 100}
        for i in range(200)
    }
    errors = {f"err_{i}": "Traceback: " + "x" * 500 for i in range(40)}
    line = bench.final_line(sum(timings.values()), 0.1, timings, errors, spreads)
    assert len(line) <= bench._MAX_STDOUT_LINE
    parsed = json.loads(line)
    if "spread" in parsed:
        # survivors are the HIGHEST ratios
        assert max(spreads[k]["spread_ratio"] for k in spreads) in parsed["spread"].values()
    assert parsed.get("spread_omitted", 0) + len(parsed.get("spread", {})) == 200


def test_final_line_carries_realistic_wide_spread_at_suite_size():
    """At the REAL suite size with every query median-agg (r12), the final
    line must keep the spread ratio of every >=2x-band entry at the r11
    artifact's measured band width (18 suite entries + the 1M trio)
    without trimming — the adjudication signal survives whole."""
    timings = {name: 1.234 for name in bench.CORPUS_QUERIES}
    for d in (2, 3, 4):
        timings[f"skyline_anti_{d}d_1m"] = 9.87
    spreads = {
        name: {
            "reps_s": [1.0, 2.0, 3.0],
            "agg": "median",
            # 21 entries land in the >=2x band, the rest stay tight —
            # the r11-measured shape of a full median-agg suite
            "spread_ratio": 11.63 if i < 18 else 1.3,
        }
        for i, name in enumerate(bench.CORPUS_QUERIES)
    }
    for d in (2, 3, 4):
        spreads[f"skyline_anti_{d}d_1m"] = {
            "reps_s": [1, 2, 3, 4, 5], "agg": "median", "spread_ratio": 11.63}
    line = bench.final_line(sum(timings.values()), 0.1, timings, {}, spreads)
    assert len(line) <= bench._MAX_STDOUT_LINE
    parsed = json.loads(line)
    expect = {k for k, v in spreads.items() if v["spread_ratio"] >= 2.0}
    assert set(parsed["spread"]) == expect  # nothing trimmed
    assert "spread_omitted" not in parsed


def test_bench_query_lists_resolve_in_registry():
    """Retiring a query must not leave a dangling name in bench's suite or
    scaling lists (the x_knn_int8 retirement briefly did): suite names
    must be live registrations; scaling names may also be retired anchors
    (bench resolves them via corpus.spec so their sf-exponent measurement
    survives retirement — x_dedup_clusters since round 12)."""
    from query_skyline_qos_flink_spark.plans import corpus

    missing = [n for n in bench.CORPUS_QUERIES if n not in corpus.REGISTRY]
    missing += [
        n
        for n in bench.SCALING_QUERIES
        if n not in corpus.REGISTRY and n not in corpus.RETIRED_ANCHORS
    ]
    assert not missing, f"bench references unknown queries: {missing}"
