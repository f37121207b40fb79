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
    "green.point": [
        (5, (0x4D, 0x7C, 0x40)), (10, (0x60, 0x8A, 0x50)),
        (50, (0x70, 0x95, 0x5E)), (100, (0x85, 0xA3, 0x6F)),
        (500, (0x95, 0xAD, 0x7C)), (1000, (0xAA, 0xBA, 0x8D)),
        (5000, (0xBA, 0xC5, 0x99)), (10000, (0xCC, 0xD0, 0xA8)),
        (100000, (0xDF, 0xDC, 0xB7)), (float("inf"), (0xEF, 0xE6, 0xC4)),
    ],
}

# ramps shared between the dot and poly variants of the same palette
_CLASSIC_RAMP = STYLES["classic.point"]
_PY_RAMP = STYLES["purpleYellow.point"]
_GREEN_RAMP = STYLES["green.point"]
_GREY_BORDER = ((0x7B, 0x7B, 0x7B), 1.0)

#: polygon styles (the *-poly.mss sheets): fill ramp + optional
#: (line_rgb, line_opacity) border + overall fill opacity. Line widths
#: in the sheets are sub-pixel (0.25-0.5 px); rendered as a 1-px edge.
POLY_STYLES: dict[str, dict] = {
    "classic.poly": {"ramp": _CLASSIC_RAMP, "line": _GREY_BORDER,
                     "opacity": 0.9},
    "classic-noborder.poly": {"ramp": _CLASSIC_RAMP, "line": None,
                              "opacity": 1.0},
    "purpleYellow.poly": {"ramp": _PY_RAMP, "line": _GREY_BORDER,
                          "opacity": 1.0},
    "purpleYellow-noborder.poly": {"ramp": _PY_RAMP, "line": None,
                                   "opacity": 1.0},
    "green.poly": {"ramp": _GREEN_RAMP, "line": _GREY_BORDER,
                   "opacity": 1.0},
    "green-noborder.poly": {"ramp": _GREEN_RAMP, "line": None,
                            "opacity": 1.0},
    "green2.poly": {"ramp": [
        (10, (0xED, 0xF8, 0xE9)), (100, (0xBA, 0xE4, 0xB3)),
        (1000, (0x74, 0xC4, 0x76)), (10000, (0x31, 0xA3, 0x54)),
        (float("inf"), (0x00, 0x6D, 0x2C))],
        "line": _GREY_BORDER, "opacity": 1.0},
    "green2-noborder.poly": {"ramp": [
        (10, (0xED, 0xF8, 0xE9)), (100, (0xBA, 0xE4, 0xB3)),
        (1000, (0x74, 0xC4, 0x76)), (10000, (0x31, 0xA3, 0x54)),
        (float("inf"), (0x00, 0x6D, 0x2C))],
        "line": None, "opacity": 1.0},
    "iNaturalist.poly": {"ramp": [
        (10, (0xF7, 0x00, 0x5A)), (100, (0xD5, 0x00, 0x67)),
        (1000, (0xB5, 0x00, 0x6C)), (10000, (0x94, 0x00, 0x6A)),
        (100000, (0x72, 0x00, 0x5F)), (float("inf"), (0x52, 0x03, 0x4E))],
        "line": None, "opacity": 0.9},
    "purpleWhite.poly": {"ramp": [
        (5, (0xA0, 0x00, 0xA0)), (10, (0xAB, 0x1F, 0xAB)),
        (50, (0xB7, 0x3F, 0xB7)), (100, (0xC3, 0x5F, 0xC3)),
        (500, (0xCF, 0x7F, 0xCF)), (1000, (0xDB, 0x9F, 0xDB)),
        (5000, (0xE7, 0xBF, 0xE7)), (10000, (0xF3, 0xDF, 0xF3)),
        (float("inf"), (0xFF, 0xFF, 0xFF))],
        "line": None, "opacity": 1.0},
    "red.poly": {"ramp": [(float("inf"), (0xCC, 0x00, 0x00))],
                 "line": None, "opacity": 1.0},
    "outline.poly": {"ramp": None,  # no fill: border only
                     "line": ((0x7B, 0x7B, 0x7B), 0.8), "opacity": 1.0},
}

#: marker styles (blue/orange-marker.mss, scaled-circles.mss):
#: per-breakpoint circle width (+ per-bin fill/opacity for
#: scaled.circles, whose first bin also carries a 1-px ring).
MARKER_STYLES: dict[str, list[tuple[float, dict]]] = {
    "blue.marker": [
        (hi, {"width": w, "fill": (0x20, 0x9F, 0xFF), "opacity": 0.65,
              "ring": None})
        for hi, w in ((10, 4), (100, 8), (1000, 12), (10000, 14),
                      (100000, 16), (float("inf"), 25))],
    "orange.marker": [
        (hi, {"width": w, "fill": (0xFF, 0x63, 0x47), "opacity": 0.8,
              "ring": None})
        for hi, w in ((10, 4), (100, 8), (1000, 12), (10000, 14),
                      (100000, 16), (float("inf"), 25))],
    "scaled.circles": [
        (10, {"width": 6, "fill": (0xFE, 0xD9, 0x76), "opacity": 1.0,
              "ring": (0xFE, 0x97, 0x24)}),
        (100, {"width": 7, "fill": (0xFD, 0x8D, 0x3C), "opacity": 0.8,
               "ring": None}),
        (1000, {"width": 10, "fill": (0xFD, 0x8D, 0x3C), "opacity": 0.7,
                "ring": None}),
        (10000, {"width": 16, "fill": (0xF0, 0x3B, 0x20), "opacity": 0.6,
                 "ring": None}),
        (float("inf"), {"width": 30, "fill": (0xBD, 0x00, 0x26),
                        "opacity": 0.6, "ring": None}),
    ],
}

HEAT_STYLES = frozenset((
    "purpleHeat.point", "blueHeat.point", "orangeHeat.point",
    "greenHeat.point", "fire.point", "glacier.point"))

#: hard pixel styles: fully-opaque dots, no semi-transparency
#: (styles.js hardPointStyles)
HARD_POINT_STYLES = frozenset((
    "classic.point", "purpleYellow.point", "green.point"))

DEFAULT_STYLE = "classic.point"


def named_styles() -> frozenset[str]:
    """Every style name the catalogue serves (styles.js namedStyles)."""
    return frozenset(STYLES) | frozenset(POLY_STYLES) | \
        frozenset(MARKER_STYLES)


def get_style_name(style: str | None) -> str:
    """styles.js getStyleName: unknown style -> the default."""
    return style if style in named_styles() else DEFAULT_STYLE


def is_heat_style(style: str) -> bool:
    """styles.js:97-99 — heat styles composite 4 z+1 tiles."""
    return style in HEAT_STYLES


def is_hard_pixel_style(style: str) -> bool:
    """styles.js:90-92 — hard pixel styles must not be semitransparent."""
    return style in HARD_POINT_STYLES


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


def _ramp_color(ramp, total):
    for hi, rgb in ramp:
        if total <= hi:
            return rgb
    return ramp[-1][1]


def _blend_over(canvas: np.ndarray, mask: np.ndarray,
                rgb: tuple[int, int, int], alpha: float) -> None:
    """Source-over composite of a flat colour onto the RGBA canvas
    under a boolean mask."""
    if not mask.any():
        return
    sa = float(alpha)
    src = np.array(rgb, dtype=np.float64) * sa
    dst = canvas[mask].astype(np.float64)
    out_a = sa * 255.0 + dst[:, 3] * (1.0 - sa)
    out_rgb = src[None, :] + dst[:, :3] * (dst[:, 3:4] / 255.0) * (1.0 - sa)
    # normalize premultiplied back to straight alpha
    nz = out_a > 0
    res = dst.copy()
    res[nz, :3] = np.clip(out_rgb[nz] / (out_a[nz, None] / 255.0), 0, 255)
    res[:, 3] = np.clip(out_a, 0, 255)
    canvas[mask] = np.rint(res).astype(np.uint8)


def _poly_mask(verts: list[tuple[float, float]], size: int) -> np.ndarray:
    """Boolean inside-mask for a polygon over a size x size canvas:
    even-odd rule against pixel centres, vectorized per edge (the
    standard crossing-number test — handles the convex hex/square cells
    the binning operators emit, and any simple polygon)."""
    ys, xs = np.mgrid[0:size, 0:size]
    px = xs + 0.5
    py = ys + 0.5
    inside = np.zeros((size, size), dtype=bool)
    n = len(verts)
    for i in range(n):
        x0, y0 = verts[i]
        x1, y1 = verts[(i + 1) % n]
        if y0 == y1:
            continue
        crosses = ((y0 > py) != (y1 > py)) & \
            (px < (x1 - x0) * (py - y0) / (y1 - y0) + x0)
        inside ^= crosses
    return inside


def _edge_mask(verts: list[tuple[float, float]], size: int) -> np.ndarray:
    """1-px border: polygon pixels adjacent to a non-polygon pixel."""
    inside = _poly_mask(verts, size)
    eroded = inside.copy()
    eroded[1:, :] &= inside[:-1, :]
    eroded[:-1, :] &= inside[1:, :]
    eroded[:, 1:] &= inside[:, :-1]
    eroded[:, :-1] &= inside[:, 1:]
    # the canvas boundary counts as outside: a cell clipped at the tile
    # edge still strokes its border there
    eroded[0, :] = eroded[-1, :] = False
    eroded[:, 0] = eroded[:, -1] = False
    return inside & ~eroded


def render_poly_png(cells: list[tuple[list[tuple[float, float]], int]],
                    style: str = "classic.poly", tile_size: int = 512,
                    scale: float = 1.0) -> bytes:
    """Polygon-style raster (the *-poly.mss catalogue): each cell is
    (vertex ring in tile pixels, total). Fill colour from the style's
    ``total`` breakpoints with the sheet's opacity; bordered styles
    stroke a 1-px edge (the CartoCSS line widths are sub-pixel).
    ``outline.poly`` strokes only. Cell rings come from the binning
    operators (``binning.hex_polygon`` / square cell corners)."""
    spec = POLY_STYLES[style]
    size = int(tile_size * scale)
    canvas = np.zeros((size, size, 4), dtype=np.uint8)
    for verts, total in cells:
        sv = [(x * scale, y * scale) for x, y in verts]
        if spec["ramp"] is not None:
            _blend_over(canvas, _poly_mask(sv, size),
                        _ramp_color(spec["ramp"], total), spec["opacity"])
        if spec["line"] is not None:
            line_rgb, line_op = spec["line"]
            _blend_over(canvas, _edge_mask(sv, size), line_rgb, line_op)
    return write_png(canvas)


def render_marker_png(markers: list[tuple[float, float, int]],
                      style: str = "blue.marker", tile_size: int = 512,
                      scale: float = 1.0) -> bytes:
    """Marker-style raster (blue/orange-marker.mss, scaled-circles.mss):
    each marker is (centreX, centreY, total) in tile pixels; circle
    width, fill, and opacity follow the style's ``total`` breakpoints
    (markers allow overlap — painted in input order, source-over)."""
    bins = MARKER_STYLES[style]
    size = int(tile_size * scale)
    canvas = np.zeros((size, size, 4), dtype=np.uint8)
    ys, xs = np.mgrid[0:size, 0:size]
    for cx, cy, total in markers:
        spec = None
        for hi, s in bins:
            if total <= hi:
                spec = s
                break
        if spec is None:
            spec = bins[-1][1]
        r = spec["width"] * scale / 2.0
        d2 = (xs + 0.5 - cx * scale) ** 2 + (ys + 0.5 - cy * scale) ** 2
        _blend_over(canvas, d2 <= r * r, spec["fill"], spec["opacity"])
        if spec["ring"] is not None:
            ring = (d2 <= (r + 1.0) ** 2) & (d2 > r * r)
            _blend_over(canvas, ring, spec["ring"], 1.0)
    return write_png(canvas)


def square_cell_polys(cells: dict, square_size: int
                      ) -> list[tuple[list[tuple[float, float]], int]]:
    """(cellX, cellY) -> total dict (binning.square_bin_dict output) to
    the cell-corner rings render_poly_png consumes."""
    out = []
    for (cx, cy), total in cells.items():
        x0, y0 = cx * square_size, cy * square_size
        x1, y1 = x0 + square_size, y0 + square_size
        out.append(([(x0, y0), (x1, y0), (x1, y1), (x0, y1)], total))
    return out


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
