"""Analysis/plot tooling — the reference's matplotlib scripts, re-homed.

Reference surface (SURVEY.md §2.2 P7-P10):
* P7 2-D skyline staircase check (``python/graph_skyline_points_2d.py``):
  scatter + Pareto step line — "no points below-and-left of the staircase"
  is a manual correctness check.
* P8 performance dashboard (``python/graph_ingestion_parallelism.py``).
* P9 per-dimension comparison (``python/graph_performance_by_dimension.py``).
* P10 paper-figure replication (``python/graph_paper_figures.py``).

matplotlib may be absent in headless environments; when it is, every
function falls back to the stdlib raster backend (``tools/rasterpng.py``)
and still writes a real PNG with bitmap-font axis ticks, labels, and
titles, matching the labeled output of the reference's
``python/graph_skyline_points_2d.py:66-77``.  Each function
works on plain pandas frames produced by the engine (collector CSVs,
bench JSON).
"""

from __future__ import annotations

import json
import os
import sys

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools import rasterpng

try:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    HAVE_MPL = True
except Exception:  # pragma: no cover - optional dependency
    HAVE_MPL = False


def skyline_staircase_2d(points_df: pd.DataFrame, x: str, y: str, out_path: str,
                         skyline_df: pd.DataFrame | None = None) -> str:
    """P7: scatter all points, overlay the Pareto staircase (post-step).

    Visual invariant: no point may lie strictly below-and-left of the
    staircase."""
    if not HAVE_MPL:
        sky = skyline_df.sort_values(x) if skyline_df is not None else None
        return rasterpng.scatter_step_png(
            points_df[x].tolist(),
            points_df[y].tolist(),
            out_path,
            step_xs=sky[x].tolist() if sky is not None else (),
            step_ys=sky[y].tolist() if sky is not None else (),
            xlabel=x,
            ylabel=y,
            title="2-D skyline staircase",
        )
    fig, ax = plt.subplots(figsize=(7, 6))
    ax.scatter(points_df[x], points_df[y], s=4, alpha=0.3, label="points")
    if skyline_df is not None and len(skyline_df):
        sky = skyline_df.sort_values(x)
        ax.step(sky[x], sky[y], where="post", color="crimson", lw=2, label="skyline")
        ax.scatter(sky[x], sky[y], s=18, color="crimson")
    ax.set_xlabel(x), ax.set_ylabel(y), ax.legend(), ax.set_title("2-D skyline staircase")
    fig.tight_layout(), fig.savefig(out_path, dpi=120), plt.close(fig)
    return out_path


def performance_dashboard(collector_csv: str, out_path: str) -> str:
    """P8: per-query timing lines + local/global split of the last query."""
    df = pd.read_csv(collector_csv)
    if not HAVE_MPL:
        x = (df["Records"] / 1e6).tolist()
        return rasterpng.multiline_png(
            [
                (x, df["TotalTime(ms)"].tolist(), (30, 80, 200)),
                (x, df["LocalTime(ms)"].tolist(), (30, 160, 60)),
                (x, df["GlobalTime(ms)"].tolist(), (200, 30, 60)),
            ],
            out_path,
            xlabel="Mrecords",
            ylabel="ms",
            title="Phase times",
            legend=("total", "local", "global"),
        )
    fig, axes = plt.subplots(2, 2, figsize=(11, 8))
    x = df["Records"] / 1e6
    axes[0][0].plot(x, df["TotalTime(ms)"], marker="o"); axes[0][0].set_title("TotalTime vs Mrecords")
    axes[0][1].plot(x, df["Optimality"], marker="o", color="green"); axes[0][1].set_title("Optimality")
    axes[1][0].plot(x, df["LocalTime(ms)"], marker="o", label="local")
    axes[1][0].plot(x, df["GlobalTime(ms)"], marker="o", label="global")
    axes[1][0].legend(); axes[1][0].set_title("Phase times")
    last = df.iloc[-1]
    axes[1][1].bar(["local", "global"], [last["LocalTime(ms)"], last["GlobalTime(ms)"]])
    axes[1][1].set_title("Last-query phase split")
    for ax in axes.flat:
        ax.set_xlabel("Mrecords") if ax is not axes[1][1] else None
    fig.tight_layout(), fig.savefig(out_path, dpi=120), plt.close(fig)
    return out_path


def bench_comparison(bench_json_path: str, out_path: str) -> str:
    """P9/P10 analog: our bench vs the reference's published totals."""
    with open(bench_json_path) as f:
        bench = json.loads(f.readline())
    ours = {d: bench["queries"].get(f"skyline_anti_{d}d_1m") for d in (2, 3, 4)}
    # BASELINE.md MR-Dim/Grid/Angle totals (ms -> s), 1M anti-correlated
    ref = {2: [19.544, 17.593, 17.282], 3: [27.264, 26.601, 27.015],
           4: [716.996, 691.882, 766.937]}
    dims = [2, 3, 4]
    if not HAVE_MPL:
        have = [d for d in dims if ours[d] is not None]
        return rasterpng.multiline_png(
            [
                (dims, [min(ref[d]) for d in dims], (30, 80, 200)),
                (have, [ours[d] for d in have], (200, 30, 60)),
            ],
            out_path,
            logy=True,
            xlabel="dimensions",
            ylabel="seconds (log)",
            title="1M anti-correlated skyline",
            legend=("reference", "this engine"),
        )
    fig, ax = plt.subplots(figsize=(8, 5))
    ax.plot(dims, [min(ref[d]) for d in dims], marker="s", label="reference (best strategy)")
    ax.plot(dims, [ours[d] for d in dims], marker="o", label="this engine")
    ax.set_yscale("log"), ax.set_xticks(dims)
    ax.set_xlabel("dimensions"), ax.set_ylabel("seconds (log)")
    ax.set_title("1M anti-correlated skyline: total time"), ax.legend()
    fig.tight_layout(), fig.savefig(out_path, dpi=120), plt.close(fig)
    return out_path


if __name__ == "__main__":  # pragma: no cover
    cmd = sys.argv[1] if len(sys.argv) > 1 else ""
    if cmd == "bench" and len(sys.argv) == 4:
        print(bench_comparison(sys.argv[2], sys.argv[3]))
    elif cmd == "dashboard" and len(sys.argv) == 4:
        print(performance_dashboard(sys.argv[2], sys.argv[3]))
    else:
        print("usage: plots.py bench <bench.json> <out.png> | dashboard <collector.csv> <out.png>")
