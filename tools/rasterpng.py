"""Minimal pure-stdlib raster canvas + PNG encoder.

The reference's manual correctness check is a rendered 2-D skyline
staircase (``python/graph_skyline_points_2d.py:50-95``); this container
has no matplotlib, so the plot tooling (SURVEY.md §2.2 P7-P10) falls back
to this backend: an RGB byte canvas with scatter/line/step primitives and
a spec-compliant PNG writer (signature + IHDR + zlib IDAT + IEND — only
stdlib ``struct``/``zlib``).  No text rendering — the fallback renders
marks, not labels; use matplotlib when available for publication figures.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Sequence


class Canvas:
    def __init__(self, width: int, height: int, bg: tuple[int, int, int] = (255, 255, 255)):
        self.w, self.h = int(width), int(height)
        self.buf = bytearray(bytes(bg) * (self.w * self.h))

    def set(self, x: int, y: int, rgb: tuple[int, int, int]) -> None:
        if 0 <= x < self.w and 0 <= y < self.h:
            i = (y * self.w + x) * 3
            self.buf[i : i + 3] = bytes(rgb)

    def dot(self, x: int, y: int, rgb: tuple[int, int, int], r: int = 1) -> None:
        for dy in range(-r, r + 1):
            for dx in range(-r, r + 1):
                if dx * dx + dy * dy <= r * r:
                    self.set(x + dx, y + dy, rgb)

    def line(self, x0: int, y0: int, x1: int, y1: int, rgb: tuple[int, int, int]) -> None:
        # Bresenham
        dx, dy = abs(x1 - x0), -abs(y1 - y0)
        sx, sy = (1 if x0 < x1 else -1), (1 if y0 < y1 else -1)
        err = dx + dy
        while True:
            self.set(x0, y0, rgb)
            if x0 == x1 and y0 == y1:
                return
            e2 = 2 * err
            if e2 >= dy:
                err += dy
                x0 += sx
            if e2 <= dx:
                err += dx
                y0 += sy

    def to_png(self) -> bytes:
        def chunk(tag: bytes, data: bytes) -> bytes:
            return (
                struct.pack(">I", len(data))
                + tag
                + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
            )

        ihdr = struct.pack(">IIBBBBB", self.w, self.h, 8, 2, 0, 0, 0)  # 8-bit RGB
        stride = self.w * 3
        raw = b"".join(
            b"\x00" + bytes(self.buf[y * stride : (y + 1) * stride]) for y in range(self.h)
        )
        return (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw, 6))
            + chunk(b"IEND", b"")
        )

    def save(self, path: str) -> str:
        with open(path, "wb") as f:
            f.write(self.to_png())
        return path


def _scale(vals: Sequence[float], lo: float, hi: float, px0: int, px1: int) -> list[int]:
    span = (hi - lo) or 1.0
    return [int(px0 + (v - lo) / span * (px1 - px0)) for v in vals]


def scatter_step_png(
    xs: Sequence[float],
    ys: Sequence[float],
    out_path: str,
    step_xs: Sequence[float] = (),
    step_ys: Sequence[float] = (),
    width: int = 700,
    height: int = 600,
    margin: int = 40,
) -> str:
    """Scatter (xs, ys) in grey; overlay a post-step line through
    (step_xs, step_ys) in red — the 2-D skyline staircase shape."""
    c = Canvas(width, height)
    all_x = list(xs) + list(step_xs)
    all_y = list(ys) + list(step_ys)
    if not all_x:
        return c.save(out_path)
    lox, hix, loy, hiy = min(all_x), max(all_x), min(all_y), max(all_y)
    # axes frame
    c.line(margin, height - margin, width - margin, height - margin, (0, 0, 0))
    c.line(margin, margin, margin, height - margin, (0, 0, 0))
    px = _scale(xs, lox, hix, margin, width - margin)
    py = _scale(ys, loy, hiy, height - margin, margin)  # y grows downward
    for x, y in zip(px, py):
        c.dot(x, y, (140, 140, 140), r=1)
    if len(step_xs):
        order = sorted(range(len(step_xs)), key=lambda i: step_xs[i])
        sx = _scale([step_xs[i] for i in order], lox, hix, margin, width - margin)
        sy = _scale([step_ys[i] for i in order], loy, hiy, height - margin, margin)
        for i in range(len(sx) - 1):  # post-step: horizontal then vertical
            c.line(sx[i], sy[i], sx[i + 1], sy[i], (200, 30, 60))
            c.line(sx[i + 1], sy[i], sx[i + 1], sy[i + 1], (200, 30, 60))
        for x, y in zip(sx, sy):
            c.dot(x, y, (200, 30, 60), r=2)
    return c.save(out_path)


def multiline_png(
    series: Sequence[tuple[Sequence[float], Sequence[float], tuple[int, int, int]]],
    out_path: str,
    width: int = 800,
    height: int = 500,
    margin: int = 40,
    logy: bool = False,
) -> str:
    """Polyline chart: ``series`` is [(xs, ys, rgb), ...] on shared axes."""
    import math

    c = Canvas(width, height)

    def yv(y: float) -> float:
        # clamp below at a tiny positive value: log10(0) from a 0.0 timing
        # must not crash the matplotlib-free bench fallback
        return math.log10(max(y, 1e-9)) if logy else y

    pts = [(x, yv(y)) for xs, ys, _ in series for x, y in zip(xs, ys)]
    if not pts:
        return c.save(out_path)
    lox, hix = min(p[0] for p in pts), max(p[0] for p in pts)
    loy, hiy = min(p[1] for p in pts), max(p[1] for p in pts)
    c.line(margin, height - margin, width - margin, height - margin, (0, 0, 0))
    c.line(margin, margin, margin, height - margin, (0, 0, 0))
    for xs, ys, rgb in series:
        yy = [yv(y) for y in ys]
        px = _scale(xs, lox, hix, margin, width - margin)
        py = _scale(yy, loy, hiy, height - margin, margin)
        for i in range(len(px) - 1):
            c.line(px[i], py[i], px[i + 1], py[i + 1], rgb)
        for x, y in zip(px, py):
            c.dot(x, y, rgb, r=2)
    return c.save(out_path)


def read_png_size(path: str) -> tuple[int, int]:
    """(width, height) from a PNG's IHDR — cheap render-gate validation."""
    with open(path, "rb") as f:
        head = f.read(26)
    if head[:8] != b"\x89PNG\r\n\x1a\n" or head[12:16] != b"IHDR":
        raise ValueError(f"{path} is not a PNG")
    w, h = struct.unpack(">II", head[16:24])
    return w, h
