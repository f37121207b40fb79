"""PNG rasterization of density tiles — the mapnik-server parity path
(S10; renderer.js:9-57, routes.js:50-79) without Mapnik/PIL.

The reference proxies the MVT endpoint and rasterizes point features as
2 px dots colored by a named CartoCSS style's ``total`` breakpoints
(cartocss/classic-dot.mss etc. — breakpoints reproduced here as data).
This renderer decodes an MVT tile, sums per-pixel totals across layers,
and writes an RGBA PNG with a hand-rolled encoder (zlib + struct — no
imaging dependency). Density scaling ``@1x..@4x,@Hx`` maps to the
``scale`` parameter (renderer.js:12-17).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from maps_spark.functions import mvt

# (upper_bound, rgb) ramps from the reference's CartoCSS
# (classic-dot.mss, purple-yellow-dot.mss; data, not code)
STYLES: dict[str, list[tuple[float, tuple[int, int, int]]]] = {
    "classic.point": [
        (10, (0xFF, 0xFF, 0x00)), (100, (0xFF, 0xCC, 0x00)),
        (1000, (0xFF, 0x99, 0x00)), (10000, (0xFF, 0x66, 0x00)),
        (100000, (0xD6, 0x0A, 0x00)), (float("inf"), (0xC2, 0x00, 0x2D)),
    ],
    "purpleYellow.point": [
        (5, (0x5E, 0x00, 0x63)), (10, (0x85, 0x13, 0x62)),
        (50, (0xA4, 0x2E, 0x61)), (100, (0xBE, 0x4C, 0x60)),
        (500, (0xD2, 0x6B, 0x63)), (1000, (0xE2, 0x8B, 0x6B)),
        (5000, (0xEE, 0xAB, 0x79)), (10000, (0xF7, 0xCB, 0x8E)),
        (float("inf"), (0xFF, 0xEB, 0xAA)),
    ],
    # heat styles (screen-composited markers; styles.js:14-18,50):
    # flat single-colour ramps from the *-heat-dot.mss sheets, plus the
    # breakpointed fire/glacier sheets
    "purpleHeat.point": [(float("inf"), (0xFF, 0x21, 0xFD))],
    "blueHeat.point": [(float("inf"), (0x20, 0x6E, 0xFF))],
    "orangeHeat.point": [(float("inf"), (0xC0, 0x67, 0x19))],
    "greenHeat.point": [(float("inf"), (0x36, 0x96, 0x17))],
    "fire.point": [
        (10, (0x5E, 0x07, 0x00)), (100, (0xEF, 0x47, 0x12)),
        (1000, (0xDC, 0x69, 0x02)), (10000, (0xF0, 0x9C, 0x00)),
        (float("inf"), (0xF2, 0xF7, 0xF0)),
    ],
    "glacier.point": [
        (10, (0x04, 0x5A, 0x8D)), (100, (0x2B, 0x8C, 0xBE)),
        (1000, (0x74, 0xA9, 0xCF)), (10000, (0xBD, 0xC9, 0xE1)),
        (float("inf"), (0xF1, 0xEE, 0xF6)),
    ],
}

HEAT_STYLES = frozenset((
    "purpleHeat.point", "blueHeat.point", "orangeHeat.point",
    "greenHeat.point", "fire.point", "glacier.point"))


def is_heat_style(style: str) -> bool:
    """styles.js:97-99 — heat styles composite 4 z+1 tiles."""
    return style in HEAT_STYLES


def write_png(rgba: np.ndarray) -> bytes:
    """Minimal RGBA PNG encoder (8-bit, filter 0 per scanline)."""
    h, w = rgba.shape[:2]
    raw = np.zeros((h, w * 4 + 1), dtype=np.uint8)
    raw[:, 1:] = rgba.reshape(h, w * 4)

    def chunk(tag: bytes, data: bytes) -> bytes:
        body = tag + data
        return (struct.pack(">I", len(data)) + body +
                struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) +
            chunk(b"IDAT", zlib.compress(raw.tobytes(), 6)) +
            chunk(b"IEND", b""))


def render_density_png(tile_bytes: bytes | None, style: str = "classic.point",
                       tile_size: int = 512, dot_width: int = 2,
                       scale: float = 1.0) -> bytes:
    """MVT density tile -> styled PNG (empty/None tile -> transparent).

    Buffer-region features are dropped (they repeat in the neighbour's
    visible region); ``scale`` renders @0.5x..@4x sizes by scaling both
    the canvas and the dot.
    """
    size = int(tile_size * scale)
    canvas = np.zeros((size, size, 4), dtype=np.uint8)
    ramp = STYLES[style]
    if tile_bytes:
        totals: dict[tuple[int, int], int] = {}
        for _, feats in mvt.decode_tile(tile_bytes).items():
            for x, y, attrs in feats:
                if 0 <= x < tile_size and 0 <= y < tile_size:
                    t = sum(v for k, v in attrs.items()
                            if isinstance(v, int) and k not in ("total",))
                    t = attrs.get("total", t)
                    totals[(x, y)] = totals.get((x, y), 0) + t
        d = max(1, int(round(dot_width * scale)))
        for (x, y), total in totals.items():
            for hi, rgb in ramp:
                if total <= hi:
                    break
            sx, sy = int(x * scale), int(y * scale)
            x0, x1 = max(0, sx), min(size, sx + d)
            y0, y1 = max(0, sy), min(size, sy + d)
            if x0 < x1 and y0 < y1:
                canvas[y0:y1, x0:x1, 0] = rgb[0]
                canvas[y0:y1, x0:x1, 1] = rgb[1]
                canvas[y0:y1, x0:x1, 2] = rgb[2]
                canvas[y0:y1, x0:x1, 3] = 255
    return write_png(canvas)


def _tile_totals(tile_bytes: bytes, tile_size: int) -> dict:
    totals: dict[tuple[int, int], int] = {}
    for _, feats in mvt.decode_tile(tile_bytes).items():
        for x, y, attrs in feats:
            if 0 <= x < tile_size and 0 <= y < tile_size:
                t = sum(v for k, v in attrs.items()
                        if isinstance(v, int) and k not in ("total",))
                t = attrs.get("total", t)
                totals[(x, y)] = totals.get((x, y), 0) + t
    return totals


def render_heat_png(children: list, style: str = "purpleHeat.point",
                    tile_size: int = 512, dot_width: int = 2,
                    scale: float = 1.0) -> bytes:
    """Heat-style raster from the FOUR z+1 child tiles
    (renderer.js:70-100 heatMapRender + routes.js heatVectorRequest).

    ``children`` = [TL, TR, BL, BR] MVT bytes (None for empty): the
    (2x,2y)..(2x+1,2y+1) children of the requested tile, each rendered
    into its quadrant at half resolution, dots accumulated with SCREEN
    blending (marker-comp-op: screen in every heat stylesheet) so
    overlapping markers brighten. ``scale=0.5`` yields the 256 px
    ``@Hx`` tile (routes.js:63).
    """
    size = int(tile_size * scale)
    half = size // 2
    acc = np.zeros((size, size, 3), dtype=np.float64)
    ramp = STYLES[style]
    d = max(1, int(round(dot_width * scale)))
    for qi, tile_bytes in enumerate(children[:4]):
        if not tile_bytes:
            continue
        dx, dy = (qi % 2) * half, (qi // 2) * half
        for (x, y), total in _tile_totals(tile_bytes, tile_size).items():
            for hi, rgb in ramp:
                if total <= hi:
                    break
            sx = dx + int(x * half / tile_size)
            sy = dy + int(y * half / tile_size)
            x0, x1 = max(0, sx), min(size, sx + d)
            y0, y1 = max(0, sy), min(size, sy + d)
            if x0 < x1 and y0 < y1:
                # screen blend: out = 255 - (255-a)(255-b)/255
                a = acc[y0:y1, x0:x1]
                b = np.array(rgb, dtype=np.float64)
                acc[y0:y1, x0:x1] = 255.0 - (255.0 - a) * (255.0 - b) / 255.0
    canvas = np.zeros((size, size, 4), dtype=np.uint8)
    canvas[:, :, :3] = np.clip(np.rint(acc), 0, 255).astype(np.uint8)
    canvas[:, :, 3] = np.where(acc.sum(axis=2) > 0, 255, 0).astype(np.uint8)
    return write_png(canvas)
