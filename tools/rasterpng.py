"""Minimal pure-stdlib raster canvas + PNG encoder.

The reference's manual correctness check is a rendered 2-D skyline
staircase (``python/graph_skyline_points_2d.py:50-95``); this container
has no matplotlib, so the plot tooling (SURVEY.md §2.2 P7-P10) falls back
to this backend: an RGB byte canvas with scatter/line/step primitives and
a spec-compliant PNG writer (signature + IHDR + zlib IDAT + IEND — only
stdlib ``struct``/``zlib``).  Text rendering uses a built-in 5×7 bitmap
font (digits, ASCII letters, basic punctuation) so axis ticks and labels
are self-describing, matching the labeled output of the reference's
``python/graph_skyline_points_2d.py:66-77``; use matplotlib when
available for publication figures.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Sequence


# 5×7 bitmap glyphs (row-major, "1" = ink).  Lowercase falls back to the
# uppercase glyph; unknown characters advance as blank space.
_FONT: dict[str, tuple[str, ...]] = {
    "0": ("01110", "10001", "10011", "10101", "11001", "10001", "01110"),
    "1": ("00100", "01100", "00100", "00100", "00100", "00100", "01110"),
    "2": ("01110", "10001", "00001", "00010", "00100", "01000", "11111"),
    "3": ("11111", "00010", "00100", "00010", "00001", "10001", "01110"),
    "4": ("00010", "00110", "01010", "10010", "11111", "00010", "00010"),
    "5": ("11111", "10000", "11110", "00001", "00001", "10001", "01110"),
    "6": ("00110", "01000", "10000", "11110", "10001", "10001", "01110"),
    "7": ("11111", "00001", "00010", "00100", "01000", "01000", "01000"),
    "8": ("01110", "10001", "10001", "01110", "10001", "10001", "01110"),
    "9": ("01110", "10001", "10001", "01111", "00001", "00010", "01100"),
    ".": ("00000", "00000", "00000", "00000", "00000", "01100", "01100"),
    ",": ("00000", "00000", "00000", "00000", "01100", "00100", "01000"),
    "-": ("00000", "00000", "00000", "11111", "00000", "00000", "00000"),
    "+": ("00000", "00100", "00100", "11111", "00100", "00100", "00000"),
    "/": ("00001", "00001", "00010", "00100", "01000", "10000", "10000"),
    "(": ("00010", "00100", "01000", "01000", "01000", "00100", "00010"),
    ")": ("01000", "00100", "00010", "00010", "00010", "00100", "01000"),
    "%": ("11001", "11010", "00010", "00100", "01000", "01011", "10011"),
    "=": ("00000", "00000", "11111", "00000", "11111", "00000", "00000"),
    ":": ("00000", "01100", "01100", "00000", "01100", "01100", "00000"),
    "_": ("00000", "00000", "00000", "00000", "00000", "00000", "11111"),
    " ": ("00000", "00000", "00000", "00000", "00000", "00000", "00000"),
    "A": ("01110", "10001", "10001", "11111", "10001", "10001", "10001"),
    "B": ("11110", "10001", "10001", "11110", "10001", "10001", "11110"),
    "C": ("01110", "10001", "10000", "10000", "10000", "10001", "01110"),
    "D": ("11100", "10010", "10001", "10001", "10001", "10010", "11100"),
    "E": ("11111", "10000", "10000", "11110", "10000", "10000", "11111"),
    "F": ("11111", "10000", "10000", "11110", "10000", "10000", "10000"),
    "G": ("01110", "10001", "10000", "10111", "10001", "10001", "01111"),
    "H": ("10001", "10001", "10001", "11111", "10001", "10001", "10001"),
    "I": ("01110", "00100", "00100", "00100", "00100", "00100", "01110"),
    "J": ("00111", "00010", "00010", "00010", "00010", "10010", "01100"),
    "K": ("10001", "10010", "10100", "11000", "10100", "10010", "10001"),
    "L": ("10000", "10000", "10000", "10000", "10000", "10000", "11111"),
    "M": ("10001", "11011", "10101", "10101", "10001", "10001", "10001"),
    "N": ("10001", "10001", "11001", "10101", "10011", "10001", "10001"),
    "O": ("01110", "10001", "10001", "10001", "10001", "10001", "01110"),
    "P": ("11110", "10001", "10001", "11110", "10000", "10000", "10000"),
    "Q": ("01110", "10001", "10001", "10001", "10101", "10010", "01101"),
    "R": ("11110", "10001", "10001", "11110", "10100", "10010", "10001"),
    "S": ("01111", "10000", "10000", "01110", "00001", "00001", "11110"),
    "T": ("11111", "00100", "00100", "00100", "00100", "00100", "00100"),
    "U": ("10001", "10001", "10001", "10001", "10001", "10001", "01110"),
    "V": ("10001", "10001", "10001", "10001", "10001", "01010", "00100"),
    "W": ("10001", "10001", "10001", "10101", "10101", "10101", "01010"),
    "X": ("10001", "10001", "01010", "00100", "01010", "10001", "10001"),
    "Y": ("10001", "10001", "01010", "00100", "00100", "00100", "00100"),
    "Z": ("11111", "00001", "00010", "00100", "01000", "10000", "11111"),
}

GLYPH_W, GLYPH_H, GLYPH_ADV = 5, 7, 6  # 1px inter-character gap


def text_width(s: str, scale: int = 1) -> int:
    return (len(s) * GLYPH_ADV - 1) * scale if s else 0


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

    def text(self, x: int, y: int, s: str, rgb: tuple[int, int, int] = (0, 0, 0),
             scale: int = 1, vertical: bool = False) -> None:
        """Render ``s`` with the 5×7 font, top-left anchored at (x, y).

        ``vertical=True`` rotates the string 90° counter-clockwise (reads
        bottom-to-top), for y-axis titles."""
        cx = 0
        for ch in s:
            glyph = _FONT.get(ch) or _FONT.get(ch.upper())
            if glyph is not None:
                for gy, row in enumerate(glyph):
                    for gx, bit in enumerate(row):
                        if bit != "1":
                            continue
                        for sy in range(scale):
                            for sx in range(scale):
                                px, py = gx * scale + sx, gy * scale + sy
                                if vertical:
                                    self.set(x + py, y - cx - px, rgb)
                                else:
                                    self.set(x + cx + px, y + py, rgb)
            cx += GLYPH_ADV * scale

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


def _nice_ticks(lo: float, hi: float, n: int = 5) -> list[float]:
    """~n tick values at 1/2/5×10^k steps covering [lo, hi]."""
    import math

    span = hi - lo
    if span <= 0 or not math.isfinite(span):
        return [lo]
    raw = span / max(n - 1, 1)
    mag = 10.0 ** math.floor(math.log10(raw))
    for mult in (1.0, 2.0, 2.5, 5.0, 10.0):
        if raw <= mult * mag:
            step = mult * mag
            break
    first = math.ceil(lo / step) * step
    ticks, t, i = [], first, 0
    while t <= hi + step * 1e-9:
        ticks.append(0.0 if abs(t) < step * 1e-9 else t)
        i += 1
        t = first + i * step
    return ticks or [lo]


def _fmt(v: float) -> str:
    s = f"{v:.4g}"
    return s[:-2] if s.endswith(".0") else s


def _decorate_axes(
    c: Canvas,
    lox: float,
    hix: float,
    loy: float,
    hiy: float,
    margin: int,
    xlabel: str = "",
    ylabel: str = "",
    title: str = "",
    logy: bool = False,
) -> None:
    """Frame + tick marks + tick labels (+ optional axis titles).

    With ``logy`` the y data range is already log10-transformed; tick
    labels are written back in original units (10^t)."""
    w, h = c.w, c.h
    c.line(margin, h - margin, w - margin, h - margin, (0, 0, 0))
    c.line(margin, margin, margin, h - margin, (0, 0, 0))
    for t in _nice_ticks(lox, hix):
        (px,) = _scale([t], lox, hix, margin, w - margin)
        c.line(px, h - margin, px, h - margin + 4, (0, 0, 0))
        lbl = _fmt(t)
        c.text(px - text_width(lbl) // 2, h - margin + 6, lbl)
    for t in _nice_ticks(loy, hiy):
        (py,) = _scale([t], loy, hiy, h - margin, margin)
        c.line(margin - 4, py, margin, py, (0, 0, 0))
        lbl = _fmt(10.0**t) if logy else _fmt(t)
        c.text(margin - 6 - text_width(lbl), py - GLYPH_H // 2, lbl)
    if xlabel:
        c.text((w - text_width(xlabel)) // 2, h - margin + 6 + GLYPH_H + 4, xlabel)
    if ylabel:
        c.text(4, (h + text_width(ylabel)) // 2, ylabel, vertical=True)
    if title:
        c.text((w - text_width(title)) // 2, max(2, margin - GLYPH_H - 6), title)


def scatter_step_png(
    xs: Sequence[float],
    ys: Sequence[float],
    out_path: str,
    step_xs: Sequence[float] = (),
    step_ys: Sequence[float] = (),
    width: int = 700,
    height: int = 600,
    margin: int = 56,
    xlabel: str = "",
    ylabel: str = "",
    title: str = "",
) -> str:
    """Scatter (xs, ys) in grey; overlay a post-step line through
    (step_xs, step_ys) in red — the 2-D skyline staircase shape."""
    c = Canvas(width, height)
    all_x = list(xs) + list(step_xs)
    all_y = list(ys) + list(step_ys)
    if not all_x:
        return c.save(out_path)
    lox, hix, loy, hiy = min(all_x), max(all_x), min(all_y), max(all_y)
    _decorate_axes(c, lox, hix, loy, hiy, margin, xlabel, ylabel, title)
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
    margin: int = 56,
    logy: bool = False,
    xlabel: str = "",
    ylabel: str = "",
    title: str = "",
    legend: Sequence[str] = (),
) -> str:
    """Polyline chart: ``series`` is [(xs, ys, rgb), ...] on shared axes.

    ``legend`` optionally names each series; swatches render top-right."""
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
    _decorate_axes(c, lox, hix, loy, hiy, margin, xlabel, ylabel, title, logy=logy)
    for li, name in enumerate(legend):
        if li >= len(series):
            break
        ly = margin + 4 + li * (GLYPH_H + 4)
        lx = width - margin - 14 - text_width(name)
        for dy in range(3):
            c.line(lx, ly + 2 + dy, lx + 10, ly + 2 + dy, series[li][2])
        c.text(lx + 14, ly, name)
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
