"""Dependency-free raster plotting: NumPy canvas + stdlib-zlib PNG.

The reference's most visible user surface is its nine matplotlib plot
builders (reference diagnostics.py:58-1039). This container has no
matplotlib/Pillow, but a PNG is just zlib-compressed filtered
scanlines (RFC 2083), and the charts the reference draws — line plots
with outlier markers, 4-panel decompositions, box plots — need only
lines, rectangles, markers and a bitmap font. This module provides
exactly that, so tstoken.plots can ship REAL rendered plots instead of
data-half placeholders.

Driver-side by design: plots render from already-aggregated frames
(bounded rows — rollup tiers, per-month stats), never from raw-scale
data, so nothing here touches the 100 TB path.

The 5x7 glyphs are the classic public-domain terminal font (one byte
per column, LSB = top row) that ships with countless embedded
libraries.
"""

from __future__ import annotations

import base64
import struct
import zlib

import numpy as np

# matplotlib's default category colors, for visual familiarity
C0 = (31, 119, 180)     # blue
C1 = (255, 127, 14)     # orange
RED = (214, 39, 40)
GREEN = (44, 160, 44)
BLACK = (0, 0, 0)
GREY = (120, 120, 120)
LIGHTGREY = (220, 220, 220)
WHITE = (255, 255, 255)

# ---------------------------------------------------------------- PNG


def png_encode(rgb: np.ndarray) -> bytes:
    """(H, W, 3) uint8 -> PNG bytes (8-bit RGB, filter 0, one IDAT)."""
    rgb = np.ascontiguousarray(rgb, dtype=np.uint8)
    h, w = rgb.shape[:2]
    scanlines = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), rgb.reshape(h, w * 3)], axis=1)

    def chunk(tag: bytes, data: bytes) -> bytes:
        body = tag + data
        return (struct.pack(">I", len(data)) + body
                + struct.pack(">I", zlib.crc32(body)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(scanlines.tobytes(), 6))
            + chunk(b"IEND", b""))


def png_decode_size(payload: bytes) -> tuple[int, int]:
    """(width, height) from a PNG header — for tests."""
    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    w, h = struct.unpack(">II", payload[16:24])
    return w, h


def to_base64_png(rgb: np.ndarray) -> str:
    """Data-URI base64 string, the reference's transport for plots."""
    return ("data:image/png;base64,"
            + base64.b64encode(png_encode(rgb)).decode("ascii"))


# --------------------------------------------------------------- font

_F = {
    " ": (0x00, 0x00, 0x00, 0x00, 0x00),
    "0": (0x3E, 0x51, 0x49, 0x45, 0x3E),
    "1": (0x00, 0x42, 0x7F, 0x40, 0x00),
    "2": (0x42, 0x61, 0x51, 0x49, 0x46),
    "3": (0x21, 0x41, 0x45, 0x4B, 0x31),
    "4": (0x18, 0x14, 0x12, 0x7F, 0x10),
    "5": (0x27, 0x45, 0x45, 0x45, 0x39),
    "6": (0x3C, 0x4A, 0x49, 0x49, 0x30),
    "7": (0x01, 0x71, 0x09, 0x05, 0x03),
    "8": (0x36, 0x49, 0x49, 0x49, 0x36),
    "9": (0x06, 0x49, 0x49, 0x29, 0x1E),
    "A": (0x7E, 0x11, 0x11, 0x11, 0x7E),
    "B": (0x7F, 0x49, 0x49, 0x49, 0x36),
    "C": (0x3E, 0x41, 0x41, 0x41, 0x22),
    "D": (0x7F, 0x41, 0x41, 0x22, 0x1C),
    "E": (0x7F, 0x49, 0x49, 0x49, 0x41),
    "F": (0x7F, 0x09, 0x09, 0x09, 0x01),
    "G": (0x3E, 0x41, 0x49, 0x49, 0x7A),
    "H": (0x7F, 0x08, 0x08, 0x08, 0x7F),
    "I": (0x00, 0x41, 0x7F, 0x41, 0x00),
    "J": (0x20, 0x40, 0x41, 0x3F, 0x01),
    "K": (0x7F, 0x08, 0x14, 0x22, 0x41),
    "L": (0x7F, 0x40, 0x40, 0x40, 0x40),
    "M": (0x7F, 0x02, 0x0C, 0x02, 0x7F),
    "N": (0x7F, 0x04, 0x08, 0x10, 0x7F),
    "O": (0x3E, 0x41, 0x41, 0x41, 0x3E),
    "P": (0x7F, 0x09, 0x09, 0x09, 0x06),
    "Q": (0x3E, 0x41, 0x51, 0x21, 0x5E),
    "R": (0x7F, 0x09, 0x19, 0x29, 0x46),
    "S": (0x46, 0x49, 0x49, 0x49, 0x31),
    "T": (0x01, 0x01, 0x7F, 0x01, 0x01),
    "U": (0x3F, 0x40, 0x40, 0x40, 0x3F),
    "V": (0x1F, 0x20, 0x40, 0x20, 0x1F),
    "W": (0x3F, 0x40, 0x38, 0x40, 0x3F),
    "X": (0x63, 0x14, 0x08, 0x14, 0x63),
    "Y": (0x07, 0x08, 0x70, 0x08, 0x07),
    "Z": (0x61, 0x51, 0x49, 0x45, 0x43),
    "-": (0x08, 0x08, 0x08, 0x08, 0x08),
    ".": (0x00, 0x60, 0x60, 0x00, 0x00),
    ",": (0x00, 0x40, 0x30, 0x00, 0x00),
    ":": (0x00, 0x36, 0x36, 0x00, 0x00),
    "/": (0x20, 0x10, 0x08, 0x04, 0x02),
    "(": (0x00, 0x1C, 0x22, 0x41, 0x00),
    ")": (0x00, 0x41, 0x22, 0x1C, 0x00),
    "+": (0x08, 0x08, 0x3E, 0x08, 0x08),
    "=": (0x14, 0x14, 0x14, 0x14, 0x14),
    "%": (0x23, 0x13, 0x08, 0x64, 0x62),
    "e": (0x38, 0x54, 0x54, 0x54, 0x18),
}

GLYPH_W, GLYPH_H = 6, 8  # 5x7 plus 1px spacing


def text_width(s: str, scale: int = 1) -> int:
    return len(s) * GLYPH_W * scale


# ------------------------------------------------------------- canvas

class Canvas:
    """(H, W, 3) uint8 raster with the handful of primitives charts
    need. y grows downward (image convention)."""

    def __init__(self, width: int, height: int,
                 bg: tuple[int, int, int] = WHITE):
        self.w, self.h = int(width), int(height)
        self.a = np.empty((self.h, self.w, 3), dtype=np.uint8)
        self.a[:] = bg

    # -- raw pixel ops (vectorized; all clip to bounds)

    def _put(self, xs: np.ndarray, ys: np.ndarray,
             color: tuple[int, int, int]) -> None:
        m = (xs >= 0) & (xs < self.w) & (ys >= 0) & (ys < self.h)
        self.a[ys[m], xs[m]] = color

    def line(self, x0: float, y0: float, x1: float, y1: float,
             color=BLACK, thick: int = 1) -> None:
        n = int(max(abs(x1 - x0), abs(y1 - y0))) + 1
        xs = np.rint(np.linspace(x0, x1, n)).astype(int)
        ys = np.rint(np.linspace(y0, y1, n)).astype(int)
        if thick <= 1:
            self._put(xs, ys, color)
            return
        r = thick // 2
        for dx in range(-r, r + 1):
            for dy in range(-r, r + 1):
                self._put(xs + dx, ys + dy, color)

    def polyline(self, xs, ys, color=BLACK, thick: int = 1) -> None:
        xs = np.asarray(xs, dtype=float)
        ys = np.asarray(ys, dtype=float)
        ok = np.isfinite(xs) & np.isfinite(ys)
        for i in range(len(xs) - 1):
            if ok[i] and ok[i + 1]:
                self.line(xs[i], ys[i], xs[i + 1], ys[i + 1], color, thick)

    def rect(self, x0, y0, x1, y1, color=BLACK) -> None:
        self.line(x0, y0, x1, y0, color)
        self.line(x1, y0, x1, y1, color)
        self.line(x1, y1, x0, y1, color)
        self.line(x0, y1, x0, y0, color)

    def fill_rect(self, x0, y0, x1, y1, color) -> None:
        x0, x1 = sorted((int(round(x0)), int(round(x1))))
        y0, y1 = sorted((int(round(y0)), int(round(y1))))
        self.a[max(y0, 0):min(y1 + 1, self.h),
               max(x0, 0):min(x1 + 1, self.w)] = color

    def marker(self, x: float, y: float, color, r: int = 3) -> None:
        """Filled disc."""
        yy, xx = np.mgrid[-r:r + 1, -r:r + 1]
        m = (yy * yy + xx * xx) <= r * r
        self._put((int(round(x)) + xx[m]).ravel(),
                  (int(round(y)) + yy[m]).ravel(), color)

    def text(self, x: float, y: float, s: str, color=BLACK,
             scale: int = 1) -> None:
        """Top-left anchored; unknown glyphs fall back to uppercase
        then to space (the font is a labeled-axes font, not prose)."""
        cx = int(round(x))
        cy = int(round(y))
        for ch in str(s):
            g = _F.get(ch) or _F.get(ch.upper()) or _F[" "]
            for col, bits in enumerate(g):
                for row in range(7):
                    if bits >> row & 1:
                        self.fill_rect(cx + col * scale,
                                       cy + row * scale,
                                       cx + col * scale + scale - 1,
                                       cy + row * scale + scale - 1,
                                       color)
            cx += GLYPH_W * scale

    def text_right(self, x: float, y: float, s: str, color=BLACK,
                   scale: int = 1) -> None:
        self.text(x - text_width(str(s), scale), y, s, color, scale)

    def text_center(self, x: float, y: float, s: str, color=BLACK,
                    scale: int = 1) -> None:
        self.text(x - text_width(str(s), scale) / 2, y, s, color, scale)


# ---------------------------------------------------------- axes/chart

def nice_ticks(lo: float, hi: float, n: int = 5) -> list[float]:
    """1-2-5 tick positions covering [lo, hi]."""
    if not np.isfinite(lo) or not np.isfinite(hi):
        return [0.0]
    if hi <= lo:
        hi = lo + (abs(lo) if lo else 1.0)
    span = hi - lo
    raw = span / max(n - 1, 1)
    mag = 10.0 ** np.floor(np.log10(raw))
    for mult in (1, 2, 5, 10):
        if raw <= mult * mag:
            step = mult * mag
            break
    t0 = np.ceil(lo / step) * step
    ticks = []
    t = t0
    while t <= hi + step * 1e-9:
        ticks.append(round(t, 10))
        t += step
    return ticks or [lo]


def fmt_num(v: float) -> str:
    if v == 0:
        return "0"
    a = abs(v)
    if a >= 1e6 or a < 1e-3:
        return f"{v:.1e}"
    if a >= 100 or float(v).is_integer():
        return f"{v:.0f}"
    if a >= 1:
        return f"{v:.2f}".rstrip("0").rstrip(".")
    return f"{v:.3f}".rstrip("0").rstrip(".")


class Axes:
    """One data-space panel inside a Canvas: frame, ticks, transform."""

    def __init__(self, canvas: Canvas, left: int, top: int,
                 width: int, height: int):
        self.c = canvas
        self.x0, self.y0 = left, top           # top-left pixel
        self.x1, self.y1 = left + width, top + height
        self.dlo = self.dhi = None             # data ranges
        self.vlo = self.vhi = None

    def set_xlim(self, lo: float, hi: float) -> None:
        if hi <= lo:
            hi = lo + 1.0
        self.dlo, self.dhi = float(lo), float(hi)

    def set_ylim(self, lo: float, hi: float, pad: float = 0.05) -> None:
        if not (np.isfinite(lo) and np.isfinite(hi)):
            lo, hi = 0.0, 1.0
        if hi <= lo:
            lo, hi = lo - 0.5, hi + 0.5
        span = hi - lo
        self.vlo, self.vhi = lo - pad * span, hi + pad * span

    def px(self, x) -> np.ndarray:
        x = np.asarray(x, dtype=float)
        return self.x0 + (x - self.dlo) / (self.dhi - self.dlo) \
            * (self.x1 - self.x0)

    def py(self, v) -> np.ndarray:
        v = np.asarray(v, dtype=float)
        return self.y1 - (v - self.vlo) / (self.vhi - self.vlo) \
            * (self.y1 - self.y0)

    def polyline(self, xs_px, ys_px, color=BLACK, thick: int = 1) -> None:
        self.c.polyline(xs_px, ys_px, color, thick)

    def frame(self, y_ticks: bool = True,
              grid: bool = True) -> None:
        c = self.c
        if y_ticks and self.vlo is not None:
            for t in nice_ticks(self.vlo, self.vhi):
                if not (self.vlo <= t <= self.vhi):
                    continue
                y = float(self.py(t))
                if grid:
                    c.line(self.x0 + 1, y, self.x1 - 1, y, LIGHTGREY)
                c.line(self.x0 - 3, y, self.x0, y, BLACK)
                c.text_right(self.x0 - 5, y - 3, fmt_num(t), GREY)
        c.rect(self.x0, self.y0, self.x1, self.y1, BLACK)

    def x_tick_labels(self, positions, labels) -> None:
        for p, s in zip(positions, labels):
            x = float(self.px(p))
            if self.x0 - 1 <= x <= self.x1 + 1:
                self.c.line(x, self.y1, x, self.y1 + 3, BLACK)
                self.c.text_center(x, self.y1 + 6, s, GREY)

    def legend(self, entries: list[tuple[str, tuple]]) -> None:
        """entries = [(label, color)] drawn top-right inside frame."""
        w = max(text_width(lbl) for lbl, _ in entries) + 26
        h = len(entries) * 12 + 6
        lx, ly = self.x1 - w - 6, self.y0 + 6
        self.c.fill_rect(lx, ly, lx + w, ly + h, WHITE)
        self.c.rect(lx, ly, lx + w, ly + h, GREY)
        for i, (lbl, color) in enumerate(entries):
            yy = ly + 7 + i * 12
            self.c.line(lx + 4, yy + 3, lx + 18, yy + 3, color, thick=2)
            self.c.text(lx + 22, yy, lbl, BLACK)

    def boxplot(self, center_px: float, width_px: float, q1: float,
                med: float, q3: float, wlo: float, whi: float,
                fliers=(), mean: float | None = None,
                horizontal: bool = False) -> None:
        """One box-and-whiskers glyph in data units (values on the y
        axis, or the x axis when horizontal)."""
        half = width_px / 2.0
        if horizontal:
            vy = center_px
            xq1, xq3, xmed = (float(self.px(v)) for v in (q1, q3, med))
            xlo, xhi = (float(self.px(v)) for v in (wlo, whi))
            self.c.rect(xq1, vy - half, xq3, vy + half, C0)
            self.c.line(xmed, vy - half, xmed, vy + half, RED, thick=2)
            self.c.line(xlo, vy, xq1, vy, BLACK)
            self.c.line(xq3, vy, xhi, vy, BLACK)
            self.c.line(xlo, vy - half / 2, xlo, vy + half / 2, BLACK)
            self.c.line(xhi, vy - half / 2, xhi, vy + half / 2, BLACK)
            for f in fliers:
                self.c.marker(float(self.px(f)), vy, GREY, r=2)
            if mean is not None and np.isfinite(mean):
                self.c.marker(float(self.px(mean)), vy, GREEN, r=3)
        else:
            vx = center_px
            yq1, yq3, ymed = (float(self.py(v)) for v in (q1, q3, med))
            ylo, yhi = (float(self.py(v)) for v in (wlo, whi))
            self.c.rect(vx - half, yq3, vx + half, yq1, C0)
            self.c.line(vx - half, ymed, vx + half, ymed, RED, thick=2)
            self.c.line(vx, yq1, vx, ylo, BLACK)
            self.c.line(vx, yhi, vx, yq3, BLACK)
            self.c.line(vx - half / 2, ylo, vx + half / 2, ylo, BLACK)
            self.c.line(vx - half / 2, yhi, vx + half / 2, yhi, BLACK)
            for f in fliers:
                self.c.marker(vx, float(self.py(f)), GREY, r=2)
            if mean is not None and np.isfinite(mean):
                self.c.marker(vx, float(self.py(mean)), GREEN, r=3)


def data_range(*arrays) -> tuple[float, float]:
    vals = np.concatenate([np.asarray(a, dtype=float).ravel()
                           for a in arrays if len(a)])
    vals = vals[np.isfinite(vals)]
    if vals.size == 0:
        return 0.0, 1.0
    return float(vals.min()), float(vals.max())
