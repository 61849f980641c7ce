"""Render gate for P7-P10 plot tooling (SURVEY.md §2.2).

These assert the plots actually rasterize to valid PNGs on disk — parity
with the reference's manual staircase check
(``python/graph_skyline_points_2d.py:50-95``) — using whichever backend is
present (matplotlib, else the stdlib rasterpng fallback).
"""

from __future__ import annotations

import json
import zlib

import pandas as pd

from tools import plots, rasterpng


def _assert_valid_png(path: str, min_bytes: int = 200) -> None:
    w, h = rasterpng.read_png_size(path)  # magic + IHDR
    assert w > 0 and h > 0
    raw = open(path, "rb").read()
    assert len(raw) >= min_bytes
    # IDAT payload must inflate to exactly h * (1 + 3w) filtered bytes when
    # written by the fallback; matplotlib may use other color types, so only
    # structural checks there
    if not plots.HAVE_MPL:
        idat = b"".join(_iter_chunks(raw, b"IDAT"))
        assert len(zlib.decompress(idat)) == h * (1 + 3 * w)


def _iter_chunks(png: bytes, tag: bytes):
    pos = 8
    while pos < len(png):
        (ln,) = (int.from_bytes(png[pos : pos + 4], "big"),)
        if png[pos + 4 : pos + 8] == tag:
            yield png[pos + 8 : pos + 8 + ln]
        pos += 12 + ln


def test_p7_staircase_renders(tmp_path):
    pts = pd.DataFrame({"x": [1.0, 2.0, 3.0, 4.0, 2.5], "y": [4.0, 3.0, 2.5, 1.0, 3.5]})
    sky = pd.DataFrame({"x": [1.0, 2.0, 4.0], "y": [4.0, 3.0, 1.0]})
    out = plots.skyline_staircase_2d(pts, "x", "y", str(tmp_path / "p7.png"), sky)
    _assert_valid_png(out)


def test_p8_dashboard_renders(tmp_path):
    csv = tmp_path / "collector.csv"
    pd.DataFrame(
        {
            "Records": [100000, 200000, 300000],
            "TotalTime(ms)": [120, 260, 350],
            "LocalTime(ms)": [80, 150, 200],
            "GlobalTime(ms)": [40, 110, 150],
            "Optimality": [0.9, 0.92, 0.95],
        }
    ).to_csv(csv, index=False)
    out = plots.performance_dashboard(str(csv), str(tmp_path / "p8.png"))
    _assert_valid_png(out)


def _ink_pixels(c: rasterpng.Canvas) -> int:
    return sum(
        1
        for i in range(0, len(c.buf), 3)
        if c.buf[i : i + 3] != b"\xff\xff\xff"
    )


def test_bitmap_font_renders_ink():
    c = rasterpng.Canvas(120, 20)
    c.text(2, 2, "Latency (ms) = 1.5e+03")
    assert _ink_pixels(c) > 50  # glyphs actually drew
    # vertical text stays in-bounds and draws too
    cv = rasterpng.Canvas(20, 120)
    cv.text(4, 110, "seconds", vertical=True)
    assert _ink_pixels(cv) > 50


def test_axis_tick_labels_present(tmp_path):
    out = rasterpng.scatter_step_png(
        [0.0, 10.0, 20.0], [0.0, 5.0, 9.0], str(tmp_path / "ticks.png"),
        xlabel="x", ylabel="y", title="T",
    )
    _assert_valid_png(out)
    # re-render onto a canvas to count label ink in the bottom margin strip
    c = rasterpng.Canvas(700, 600)
    rasterpng._decorate_axes(c, 0.0, 20.0, 0.0, 9.0, 56, "x", "y", "T")
    strip = [
        c.buf[(y * 700 + x) * 3 : (y * 700 + x) * 3 + 3]
        for y in range(600 - 50, 600 - 40)
        for x in range(56, 700 - 56)
    ]
    assert any(px != b"\xff\xff\xff" for px in strip)  # tick labels below axis


def test_nice_ticks_cover_range():
    ticks = rasterpng._nice_ticks(0.0, 17282.0)
    assert ticks[0] >= 0.0 and ticks[-1] <= 17282.0
    assert 3 <= len(ticks) <= 8
    steps = {round(ticks[i + 1] - ticks[i], 6) for i in range(len(ticks) - 1)}
    assert len(steps) == 1  # uniform step
    assert rasterpng._nice_ticks(5.0, 5.0) == [5.0]  # degenerate span


def test_p9_bench_comparison_renders(tmp_path):
    bench = tmp_path / "bench.json"
    bench.write_text(
        json.dumps(
            {
                "metric": "headline_suite_total",
                "queries": {
                    "skyline_anti_2d_1m": 8.0,
                    "skyline_anti_3d_1m": 12.0,
                    "skyline_anti_4d_1m": 4.0,
                },
            }
        )
        + "\n"
    )
    out = plots.bench_comparison(str(bench), str(tmp_path / "p9.png"))
    _assert_valid_png(out)
