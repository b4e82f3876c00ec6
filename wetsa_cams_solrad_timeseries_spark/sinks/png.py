"""Minimal pure-Python PNG encoder + panel rasterizer.

matplotlib is not in this environment, which left the reference's PNG
render hop (solrad-compare.py:94-190) unexecutable. PNG itself is a
simple public format (RFC 2083: zlib-compressed filtered scanlines in
CRC-framed chunks), so a dependency-free encoder covers the fixture-sized
export; the rasterizer draws the same panel content the matplotlib layout
shows — scatter points, fitted/series lines, axes — into an RGB canvas.

This is a fallback RENDERER, not a plotting library: no text, no ticks,
fixed margins. The engine's responsibility (every plotted series and
stat, computed in Spark) lives in plots.plot_inputs; this module only
proves the last hop produces a real, decodable image file.
"""

from __future__ import annotations

import struct
import zlib

WHITE = (255, 255, 255)
BLACK = (0, 0, 0)
BLUE = (31, 119, 180)
ORANGE = (255, 127, 14)


def write_png(path: str, pixels) -> None:
    """Write an H×W×3 uint8 array (nested lists or numpy) as an RGB PNG."""
    import numpy as np

    arr = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = arr.shape
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))  # filter 0

    def chunk(tag: bytes, payload: bytes) -> bytes:
        body = tag + payload
        return struct.pack(">I", len(payload)) + body + struct.pack(
            ">I", zlib.crc32(body) & 0xFFFFFFFF
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    with open(path, "wb") as fh:
        fh.write(b"\x89PNG\r\n\x1a\n")
        fh.write(chunk(b"IHDR", ihdr))
        fh.write(chunk(b"IDAT", zlib.compress(raw, 6)))
        fh.write(chunk(b"IEND", b""))


class PanelCanvas:
    """Vertically stacked data panels on one RGB canvas."""

    def __init__(self, n_panels: int, width: int = 480, panel_height: int = 240,
                 margin: int = 24):
        import numpy as np

        self.w, self.ph, self.m = width, panel_height, margin
        self.h = n_panels * panel_height
        self.img = np.full((self.h, self.w, 3), 255, dtype=np.uint8)

    def _frame(self, panel: int):
        top = panel * self.ph + self.m
        bot = (panel + 1) * self.ph - self.m
        left, right = self.m, self.w - self.m
        return top, bot, left, right

    def draw_axes(self, panel: int) -> None:
        top, bot, left, right = self._frame(panel)
        self.img[bot, left:right + 1] = BLACK
        self.img[top:bot + 1, left] = BLACK

    def _to_px(self, panel, xs, ys, xlim, ylim):
        import numpy as np

        top, bot, left, right = self._frame(panel)
        x0, x1 = xlim
        y0, y1 = ylim
        sx = (right - left) / ((x1 - x0) or 1.0)
        sy = (bot - top) / ((y1 - y0) or 1.0)
        px = np.clip((np.asarray(xs, float) - x0) * sx + left, left, right)
        py = np.clip(bot - (np.asarray(ys, float) - y0) * sy, top, bot)
        return px.astype(int), py.astype(int)

    def scatter(self, panel, xs, ys, xlim, ylim, color=BLUE) -> None:
        import numpy as np

        xs = np.asarray(xs, float)
        ys = np.asarray(ys, float)
        ok = np.isfinite(xs) & np.isfinite(ys)
        px, py = self._to_px(panel, xs[ok], ys[ok], xlim, ylim)
        for dx in (0, 1):
            for dy in (0, 1):
                self.img[
                    np.clip(py + dy, 0, self.h - 1),
                    np.clip(px + dx, 0, self.w - 1),
                ] = color

    def line(self, panel, xs, ys, xlim, ylim, color=ORANGE, samples=512) -> None:
        import numpy as np

        xs = np.asarray(xs, float)
        ys = np.asarray(ys, float)
        ok = np.isfinite(xs) & np.isfinite(ys)
        xs, ys = xs[ok], ys[ok]
        if len(xs) < 2:
            return
        order = np.argsort(xs, kind="stable")
        xs, ys = xs[order], ys[order]
        xi = np.linspace(xs[0], xs[-1], samples)
        yi = np.interp(xi, xs, ys)
        px, py = self._to_px(panel, xi, yi, xlim, ylim)
        self.img[py, px] = color
