"""Tile projections: WGS84 lat/lng -> global pixel space per zoom.

Four SRS, matching the reference's semantics (behavior pinned against the
golden values in the reference's projection tests):

- EPSG:3857 spherical Mercator (SphericalMercator.java:36-53): 1x1 tile
  at z0, x wraps at the dateline.
- EPSG:4326 Plate Carree (WGS84.java:37-49): 2x1 tiles at z0, x wraps.
- EPSG:3575 North-Pole LAEA Europe (NorthPoleLAEAEurope.java:35-57,
  WGS84Azimuthal.java:44-96): 1x1, no wrap, clipped to lat > -1 (the
  reference's ~100 km buffer past the equator, TileMapBuilder.java:68),
  extent = sqrt(2) * 6_371_007.2 m.
- EPSG:3031 Antarctic Polar Stereographic
  (WGS84AntarcticPolarStereographic.java:36-77): 1x1, no wrap, clipped
  to lat < 1 (TileMapBuilder.java:69), extent = 12_367_396.21845986 m.

Buffer-band records (the sub-equator strip for 3575 / above-equator for
3031) project to rho > extent; those whose floored global pixel still
lands inside the zoom-z canvas are kept, the rest are dropped — the
canvas-bounds filter is part of the pixel semantics and is mirrored
verbatim in the SQL oracle.

Execution strategy (Spark-first):

- ALL four SRS are pure Column arithmetic generated from the
  dual-dialect templates in :mod:`maps_spark.sql.dual` — they run
  inside whole-stage codegen AND are verbatim reproducible in the
  DuckDB oracle. The polar ellipsoidal Snyder/EPSG formulas (the
  reference delegates these to geotools) compile to
  sin/cos/tan/ln/sqrt/pow expression trees, dialect-identical.
- The numpy kernels below are the same formulas vectorized for the
  serving point path, the tile-boundary inverse, and golden tests.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import Column

from maps_spark.sql import dual

TILE_SIZE = dual.TILE_SIZE
MERC_MAX_LAT = 85.0511287798066

# WGS84 ellipsoid
_A = 6378137.0
_F = 1.0 / 298.257223563
_E2 = _F * (2 - _F)
_E = math.sqrt(_E2)

EARTH_RADIUS_AUTHALIC = 6_371_007.2  # AbstractTileProjection.java:23
LAEA_EXTENT = math.sqrt(2.0) * EARTH_RADIUS_AUTHALIC
STEREO_EXTENT = 12_367_396.21845986  # WGS84AntarcticPolarStereographic.java:49


@dataclass(frozen=True)
class TileSchema:
    """Tile grid shape at zoom 0 (TileSchema.java:23-25)."""

    zz_tiles_horizontal: int
    zz_tiles_vertical: int
    wrap_x: bool

    def num_x_tiles(self, z: int) -> int:
        return self.zz_tiles_horizontal * (1 << z)

    def num_y_tiles(self, z: int) -> int:
        return self.zz_tiles_vertical * (1 << z)


SCHEMAS = {
    "EPSG:3857": TileSchema(1, 1, True),
    "EPSG:4326": TileSchema(2, 1, True),
    "EPSG:3575": TileSchema(1, 1, False),
    "EPSG:3031": TileSchema(1, 1, False),
}
SRS_ALL = list(SCHEMAS)


def schema_for(srs: str) -> TileSchema:
    return SCHEMAS[srs.upper() if srs.upper().startswith("EPSG") else f"EPSG:{srs}"]


# ---------------------------------------------------------------------------
# numpy kernels (shared by pandas UDFs and unit tests)
# ---------------------------------------------------------------------------

def merc_global_xy(lat, lng, z: int, tile_size: int = TILE_SIZE):
    """Vectorized EPSG:3857 forward -> fractional global pixel XY."""
    lat = np.asarray(lat, dtype=np.float64)
    lng = np.asarray(lng, dtype=np.float64)
    n = tile_size * (1 << z)
    # mod n wraps lng=+180 onto pixel 0 (same meridian as -180),
    # matching the dual-dialect SQL template (dual.merc_px)
    x = np.mod((lng + 180.0) / 360.0 * n, n)
    siny = np.sin(np.radians(lat))
    y = (0.5 - np.log((1.0 + siny) / (1.0 - siny)) / (4.0 * np.pi)) * n
    return x, y


def wgs84_global_xy(lat, lng, z: int, tile_size: int = TILE_SIZE):
    """Vectorized EPSG:4326 forward (2x1 tiles at z0)."""
    lat = np.asarray(lat, dtype=np.float64)
    lng = np.asarray(lng, dtype=np.float64)
    n = tile_size * (1 << z)
    # world width is 2n; wrap the +180 meridian like dual.wgs84_px
    return np.mod((lng + 180.0) * n / 180.0, 2 * n), \
        (90.0 - lat) * n / 180.0


def _authalic_q(sin_phi):
    e, e2 = _E, _E2
    es = e * sin_phi
    return (1.0 - e2) * (sin_phi / (1.0 - e2 * sin_phi * sin_phi)
                         - (1.0 / (2.0 * e)) * np.log((1.0 - es) / (1.0 + es)))


_QP = float(_authalic_q(np.float64(1.0)))


def laea3575_meters(lat, lng):
    """EPSG:3575 forward (ellipsoidal LAEA, north polar aspect, lon0=10E).

    Snyder (1987) eq. 24-23/24-24 polar aspect: rho = a*sqrt(qp - q),
    x = rho*sin(lam - lam0), y = -rho*cos(lam - lam0).
    """
    lat = np.asarray(lat, dtype=np.float64)
    lng = np.asarray(lng, dtype=np.float64)
    q = _authalic_q(np.sin(np.radians(lat)))
    rho = _A * np.sqrt(np.maximum(_QP - q, 0.0))
    lam = np.radians(lng - 10.0)
    return rho * np.sin(lam), -rho * np.cos(lam)


def stereo3031_meters(lat, lng):
    """EPSG:3031 forward (ellipsoidal polar stereographic, south aspect,
    standard parallel 71S, lon0=0). EPSG Guidance Note 7-2 variant B.
    """
    lat = np.asarray(lat, dtype=np.float64)
    lng = np.asarray(lng, dtype=np.float64)
    e = _E
    phi = np.radians(lat)
    phi_f = math.radians(-71.0)
    # south aspect: t uses +phi/2 with sign-flipped e-term
    t = np.tan(np.pi / 4.0 + phi / 2.0) / (
        (1.0 + e * np.sin(phi)) / (1.0 - e * np.sin(phi))) ** (e / 2.0)
    tf = math.tan(math.pi / 4.0 + phi_f / 2.0) / (
        (1.0 + e * math.sin(phi_f)) / (1.0 - e * math.sin(phi_f))) ** (e / 2.0)
    mf = math.cos(phi_f) / math.sqrt(1.0 - _E2 * math.sin(phi_f) ** 2)
    rho = _A * mf * t / tf
    lam = np.radians(lng)
    return rho * np.sin(lam), rho * np.cos(lam)


def azimuthal_global_xy(srs: str, lat, lng, z: int, tile_size: int = TILE_SIZE):
    """Meters -> global pixel for the two polar projections
    (WGS84Azimuthal.java:79-96: scale by n/(2*extent), mirror y)."""
    if srs == "EPSG:3575":
        mx, my = laea3575_meters(lat, lng)
        extent = LAEA_EXTENT
    elif srs == "EPSG:3031":
        mx, my = stereo3031_meters(lat, lng)
        extent = STEREO_EXTENT
    else:
        raise ValueError(srs)
    n = tile_size * (1 << z)
    ppm = n / extent / 2.0
    return (mx + extent) * ppm, n - (my + extent) * ppm


def global_xy(srs: str, lat, lng, z: int, tile_size: int = TILE_SIZE):
    """Any-SRS fractional global pixel XY (numpy)."""
    srs = _norm(srs)
    if srs == "EPSG:3857":
        return merc_global_xy(lat, lng, z, tile_size)
    if srs == "EPSG:4326":
        return wgs84_global_xy(lat, lng, z, tile_size)
    return azimuthal_global_xy(srs, lat, lng, z, tile_size)


def is_plottable(srs: str, lat, lng):
    """Per-projection domain mask (GlobalPixelUDF.java:48-57 semantics)."""
    srs = _norm(srs)
    lat = np.asarray(lat, dtype=np.float64)
    lng = np.asarray(lng, dtype=np.float64)
    in_range = (np.abs(lat) <= 90) & (lng >= -180) & (lng <= 180)
    if srs == "EPSG:3857":
        return in_range & (np.abs(lat) <= MERC_MAX_LAT)
    if srs == "EPSG:4326":
        return in_range
    if srs == "EPSG:3575":  # 1-degree (~100 km) buffer past the equator
        return in_range & (lat > -1.0)
    if srs == "EPSG:3031":
        return in_range & (lat < 1.0)
    raise ValueError(srs)


def _norm(srs: str) -> str:
    s = srs.upper()
    return s if s.startswith("EPSG:") else f"EPSG:{s}"


# ---------------------------------------------------------------------------
# Spark Column builders
# ---------------------------------------------------------------------------

def pixel_cols(srs: str, lat_col: str, lng_col: str, z: int,
               tile_size: int = TILE_SIZE) -> tuple[Column, Column]:
    """(px, py) integer global-pixel Columns at zoom ``z``.

    All four SRS are pure ``F.expr`` over the dual-dialect templates —
    they stay inside whole-stage codegen AND are verbatim reproducible
    in the DuckDB oracle (the polar ellipsoidal math uses only
    sin/cos/tan/ln/sqrt/pow, dialect-identical). Unplottable rows ->
    NULL (caller filters, TileMapBuilder.java:159); polar buffer-band
    rows whose pixel overshoots the canvas also -> NULL.
    """
    srs = _norm(srs)
    pxe, pye = dual.pixel_exprs(srs, lat_col, lng_col, z, tile_size)
    plot = plottable_expr(srs, lat_col, lng_col)
    return (
        F.when(F.expr(plot), F.expr(pxe)),
        F.when(F.expr(plot), F.expr(pye)),
    )


def plottable_expr(srs: str, lat: str, lng: str) -> str:
    """Dual-dialect SQL boolean: row is plottable in this projection."""
    srs = _norm(srs)
    base = (f"({lat}) IS NOT NULL AND ({lng}) IS NOT NULL AND "
            f"abs({lat}) <= 90.0 AND ({lng}) >= -180.0 AND ({lng}) <= 180.0")
    if srs == "EPSG:3857":
        return f"({base} AND abs({lat}) <= {dual.MERC_MAX_LAT})"
    if srs == "EPSG:4326":
        return f"({base})"
    if srs == "EPSG:3575":
        return f"({base} AND ({lat}) > -1.0)"
    if srs == "EPSG:3031":
        return f"({base} AND ({lat}) < 1.0)"
    raise ValueError(srs)


# -- inverse polar projections (for the ad-hoc tile boundary, C12) -----------


def _invert_lat_for_rho(rho_of_lat, target: float, lo: float,
                        hi: float, iters: int = 60) -> float:
    """Bisection inverse of a monotonic rho(lat) — exactly consistent
    with OUR forward math (no series truncation drift)."""
    f_lo = rho_of_lat(lo)
    f_hi = rho_of_lat(hi)
    increasing = f_hi > f_lo
    t = min(max(target, min(f_lo, f_hi)), max(f_lo, f_hi))
    for _ in range(iters):
        mid = 0.5 * (lo + hi)
        if (rho_of_lat(mid) < t) == increasing:
            lo = mid
        else:
            hi = mid
    return 0.5 * (lo + hi)


def polar_pixel_to_latlng(srs: str, gx: float, gy: float, z: int,
                          tile_size: int = TILE_SIZE
                          ) -> tuple[float, float]:
    """Global pixel -> (lat, lng) for EPSG:3575/3031 (inverse of
    azimuthal_global_xy + the meters formulas)."""
    srs = _norm(srs)
    extent = LAEA_EXTENT if srs == "EPSG:3575" else STEREO_EXTENT
    n = tile_size * (1 << z)
    ppm = n / extent / 2.0
    mx = gx / ppm - extent
    my = (n - gy) / ppm - extent
    rho = math.hypot(mx, my)
    if srs == "EPSG:3575":
        lat = _invert_lat_for_rho(
            lambda p: float(_A * math.sqrt(max(
                _QP - float(_authalic_q(np.float64(math.sin(
                    math.radians(p))))), 0.0))),
            rho, -90.0, 90.0)
        lng = math.degrees(math.atan2(mx, -my)) + 10.0 if rho > 0 else 10.0
    else:
        def rho3031(p: float) -> float:
            x_, _ = stereo3031_meters(np.float64(p), np.float64(90.0))
            return float(math.hypot(float(x_), 0.0))
        lat = _invert_lat_for_rho(rho3031, rho, -90.0, 84.0)
        lng = math.degrees(math.atan2(mx, my)) if rho > 0 else 0.0
    if lng > 180.0:
        lng -= 360.0
    elif lng < -180.0:
        lng += 360.0
    return lat, lng
