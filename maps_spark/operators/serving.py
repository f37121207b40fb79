"""Serving-time query semantics as batch DataFrame queries.

The reference's tile server filters/re-aggregates stored tiles in memory
per request (VectorTileFilters.java:102-242, PointFeatureFilters.java:
65-114). This module expresses the same semantics two ways:

- DataFrame builders over the occurrence table (``density_tile``): the
  engine path the correctness gate checks — for any (mapKey, srs, z, x,
  y, year-range, BOR-set) they produce exactly the feature set a served
  tile would contain (tile containment incl. dateline buffer, year/BOR
  filtering, per-pixel merge, total).
- ``filter_decoded_tile``: the single-tile in-memory path over a decoded
  MVT (for the point-lookup serve flow against the tile store).

Filter semantics (pinned to the reference):

- year range is inclusive, null-unbounded either side (Range.java:50-60);
  a feature is kept if ANY of its year attributes is in range, and only
  in-range year attributes contribute to its counts/total
  (VectorTileFilters.java:211-224, 255-268).
- basisOfRecord filters select source layers (VectorTileFilters.java:52-54);
  the response collapses everything into one layer with per-pixel merge.
- tile containment includes the buffer and wraps at the dateline for
  wrapX schemas (Tiles.java:104-127).
"""

from __future__ import annotations

from collections import defaultdict

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from maps_spark.functions import projections as P
from maps_spark.functions import tiles as T
from maps_spark.sql import dual

TOTAL_KEY = "total"


def year_in_range(year: Column, lo: int | None, hi: int | None) -> Column:
    cond = F.lit(True)
    if lo is not None:
        cond = cond & (year >= lo)
    if hi is not None:
        cond = cond & (year <= hi)
    return cond


def tile_contains_cols(srs: str, z: int, x: int, y: int, px: Column,
                       py: Column, tile_size: int = P.TILE_SIZE,
                       buffer: int = T.DEFAULT_BUFFER) -> Column:
    """Reference Tiles.tileContains incl. dateline wrap (Tiles.java:104-127)."""
    sch = P.schema_for(srs)
    vert = (py >= y * tile_size - buffer) & (py <= y * tile_size + buffer + tile_size)
    horiz = (px >= x * tile_size - buffer) & (px <= x * tile_size + buffer + tile_size)
    contained = horiz & vert
    if sch.wrap_x:
        max_tile = sch.num_x_tiles(z) - 1
        world = sch.num_x_tiles(z) * tile_size
        if x == 0:
            contained = contained | (vert & (px >= world - buffer))
        if x == max_tile:
            contained = contained | (vert & (px < buffer))
    return contained


def local_px_cols(srs: str, z: int, x: int, y: int, px: Column, py: Column,
                  tile_size: int = P.TILE_SIZE,
                  buffer: int = T.DEFAULT_BUFFER) -> tuple[Column, Column]:
    """Tile-local coords incl. dateline re-addressing (Tiles.java:55-74)."""
    sch = P.schema_for(srs)
    lx = px - F.lit(x * tile_size)
    if sch.wrap_x and (sch.zz_tiles_horizontal > 1 or z > 0):
        world = sch.num_x_tiles(z) * tile_size
        if x == 0:
            lx = F.when(px >= world - buffer, px - world).otherwise(lx)
        if x == sch.num_x_tiles(z) - 1:
            lx = F.when(px < buffer, px + world - x * tile_size).otherwise(lx)
    return lx, py - F.lit(y * tile_size)


def density_tile(keyed: DataFrame, map_key: str, srs: str, z: int, x: int,
                 y: int, year_range: tuple[int | None, int | None] = (None, None),
                 bors: list[str] | None = None, verbose: bool = False,
                 tile_size: int = P.TILE_SIZE,
                 buffer: int = T.DEFAULT_BUFFER) -> DataFrame:
    """Feature rows of the served tile, straight from the keyed
    occurrence table. Columns: (px, py, total) or verbose
    (px, py, year, cnt)."""
    pxc, pyc = P.pixel_cols(srs, "lat", "lng", z, tile_size)
    df = (keyed.where(F.col("mapKey") == map_key)
          .select(F.col("borYear"),
                  pxc.alias("gpx"), pyc.alias("gpy"))
          .where(F.col("gpx").isNotNull()))
    if bors:
        codes = [dual.BOR_CODE[b] for b in bors]
        df = df.where((F.col("borYear") % 100).isin(codes))
    lo, hi = year_range
    df = df.where(year_in_range(F.floor(F.col("borYear") / 100), lo, hi))
    df = df.where(tile_contains_cols(srs, z, x, y, F.col("gpx"), F.col("gpy"),
                                     tile_size, buffer))
    lx, ly = local_px_cols(srs, z, x, y, F.col("gpx"), F.col("gpy"),
                           tile_size, buffer)
    df = df.select(lx.alias("px"), ly.alias("py"),
                   F.floor(F.col("borYear") / 100).cast("long").alias("year"))
    if verbose:
        return (df.groupBy("px", "py", "year")
                .agg(F.count("*").alias("cnt")))
    return (df.groupBy("px", "py")
            .agg(F.count("*").cast("long").alias("total")))


def country_masked_tile(keyed: DataFrame, map_key: str, mask_key: str,
                        srs: str, z: int, x: int, y: int,
                        tile_size: int = P.TILE_SIZE,
                        buffer: int = T.DEFAULT_BUFFER) -> DataFrame:
    """J1 country mask (VectorTileFilters.java:83-99,
    TileResource.java:576-583): keep the served tile's pixels that also
    carry features of the mask view (``4:<ISO>``).

    The mask side is one view's single-tile pixel set — small — so it
    broadcasts; the semi-join never shuffles the source."""
    src = density_tile(keyed, map_key, srs, z, x, y,
                       tile_size=tile_size, buffer=buffer)
    mask = density_tile(keyed, mask_key, srs, z, x, y,
                        tile_size=tile_size, buffer=buffer
                        ).select("px", "py")
    return src.join(F.broadcast(mask), ["px", "py"], "left_semi")


# -- single-tile in-memory path (tile-store serve flow) ----------------------


def filter_decoded_tile(layers: dict, srs: str, z: int, x: int, y: int,
                        source: tuple[int, int] | None = None,
                        year_range=(None, None), bors=None,
                        verbose: bool = False, tile_size: int = P.TILE_SIZE,
                        buffer: int = T.DEFAULT_BUFFER):
    """Reference collectInVectorTile over one decoded MVT
    {layer: [(x, y, {year: cnt})]}. ``source`` is the (x, y) address the
    tile was stored under when serving an adjacent/identical address.

    Returns {(px, py): {year: cnt, 'total': n}} (verbose) or
    {(px, py): total}.
    """
    sch = P.schema_for(srs)
    sx, sy = source if source else (x, y)
    lo, hi = year_range
    out_verbose: dict = defaultdict(lambda: defaultdict(int))
    out_simple: dict = defaultdict(int)
    world = sch.num_x_tiles(z) * tile_size
    for layer, feats in layers.items():
        if bors and layer not in bors:
            continue
        for fx, fy, attrs in feats:
            gx = sx * tile_size + fx
            gy = sy * tile_size + fy
            if not _contains(sch, z, x, y, gx, gy, tile_size, buffer):
                continue
            counts = {k: v for k, v in attrs.items()
                      if _is_year(k) and _in_range(int(k), lo, hi)}
            if (lo is not None or hi is not None) and not counts:
                continue
            lx = gx - x * tile_size
            if sch.wrap_x and (sch.zz_tiles_horizontal > 1 or z > 0):
                if x == 0 and gx >= world - buffer:
                    lx = gx - world
                elif x == sch.num_x_tiles(z) - 1 and gx < buffer:
                    lx = gx + world - x * tile_size
            ly = gy - y * tile_size
            if verbose:
                for k, v in counts.items():
                    out_verbose[(lx, ly)][k] += v
            else:
                out_simple[(lx, ly)] += sum(counts.values())
    if verbose:
        final = {}
        for pix, counts in out_verbose.items():
            d = dict(counts)
            d[TOTAL_KEY] = sum(counts.values())
            final[pix] = d
        return final
    return dict(out_simple)


def points_to_tile(features, srs: str, z: int, x: int, y: int,
                   year_range=(None, None), bors=None,
                   verbose: bool = False, tile_size: int = P.TILE_SIZE,
                   buffer: int = T.DEFAULT_BUFFER):
    """A8 point-mode serving (PointFeatureFilters.java:65-114): project
    each point of a view's bundle at request time, keep those on the
    requested tile (+buffer, z0 dateline copy), aggregate per pixel.

    ``features``: iterable of (lat, lng, bor, year, count) from
    :func:`maps_spark.functions.pointpb.decode_features`. In-memory,
    per-request — the reference quotes sub-5 ms for this path.

    Returns the same shapes as :func:`filter_decoded_tile`.
    """
    import math

    sch = P.schema_for(srs)
    lo, hi = year_range
    world = sch.num_x_tiles(z) * tile_size
    world_y = sch.num_y_tiles(z) * tile_size
    # polar SRS: the canvas-bounds filter is part of the pixel
    # semantics (dual._azimuthal_exprs NULLs overshooting buffer-band
    # rows) — the point path must drop the same records or a view
    # served pre-threshold (points) vs post-threshold (tiles) would
    # return different feature sets
    polar = P._norm(srs) in ("EPSG:3575", "EPSG:3031")
    out_verbose: dict = defaultdict(lambda: defaultdict(int))
    out_simple: dict = defaultdict(int)
    for lat, lng, bor, year, cnt in features:
        if bors and bor.upper() not in {b.upper() for b in bors}:
            continue
        if year and not _in_range(year, lo, hi):
            continue
        if (lo is not None or hi is not None) and not year:
            continue
        if not bool(P.is_plottable(srs, lat, lng)):
            continue
        fgx, fgy = P.global_xy(srs, lat, lng, z, tile_size)
        if polar and not (0 <= fgx < world and 0 <= fgy < world_y):
            continue
        gx, gy = int(math.floor(fgx)), int(math.floor(fgy))
        if not _contains(sch, z, x, y, gx, gy, tile_size, buffer):
            continue
        lx = gx - x * tile_size
        if sch.wrap_x and (sch.zz_tiles_horizontal > 1 or z > 0):
            if x == 0 and gx >= world - buffer:
                lx = gx - world
            elif x == sch.num_x_tiles(z) - 1 and gx < buffer:
                lx = gx + world - x * tile_size
        ly = gy - y * tile_size
        if verbose:
            out_verbose[(lx, ly)][str(year)] += cnt
        else:
            out_simple[(lx, ly)] += cnt
    if verbose:
        return {pix: {**dict(c), TOTAL_KEY: sum(c.values())}
                for pix, c in out_verbose.items()}
    return dict(out_simple)


def apply_country_mask(tile: dict, mask: dict) -> dict:
    """J1 at serve time (VectorTileFilters.java:83-99 maskTileByTile):
    keep the served tile's pixels present in the mask view's pixel set.
    Works on either output shape of :func:`filter_decoded_tile`."""
    return {pix: v for pix, v in tile.items() if pix in mask}


def serve_tile(spark, root: str, map_key: str, srs: str, z: int, x: int,
               y: int, year_range=(None, None), bors=None,
               verbose: bool = False, tile_size: int = P.TILE_SIZE,
               buffer: int = T.DEFAULT_BUFFER, reader=None):
    """The getTile router (TileResource.java:552-610): pre-built tile
    hit -> decode + re-filter; miss -> point-bundle fallback projected
    at request time. Returns the filtered per-pixel dict (see
    :func:`filter_decoded_tile`) or None when the view has no data.

    Pass a :class:`maps_spark.sources.tile_store.TileReader` as
    ``reader`` for cached serving (warm lookups skip Spark entirely);
    without one, each lookup is a partition-pruned Spark job."""
    from maps_spark.functions import mvt, pointpb
    from maps_spark.sources import tile_store
    if reader is not None:
        data = reader.get_tile_bytes(map_key, srs, z, x, y)
    else:
        data = tile_store.get_tile_bytes(spark, root, map_key, srs, z, x, y)
    if data is not None:
        return filter_decoded_tile(mvt.decode_tile(data), srs, z, x, y,
                                   year_range=year_range, bors=bors,
                                   verbose=verbose, tile_size=tile_size,
                                   buffer=buffer)
    blob = (reader.get_point_bytes(map_key) if reader is not None
            else tile_store.get_point_bytes(spark, root, map_key))
    if blob is None:
        return None
    return points_to_tile(pointpb.decode_features(blob), srs, z, x, y,
                          year_range=year_range, bors=bors, verbose=verbose,
                          tile_size=tile_size, buffer=buffer)


def serve_binned_tile(spark, root: str, map_key: str, srs: str, z: int,
                      x: int, y: int, bin: str = "hex",
                      hex_per_tile: int | None = None,
                      square_size: int | None = None,
                      year_range=(None, None), bors=None,
                      tile_size: int = P.TILE_SIZE,
                      buffer: int = T.DEFAULT_BUFFER,
                      reader=None) -> bytes | None:
    """The ``bin=hex|square`` density endpoint
    (TileResource.java:552-610 -> HexBin/SquareBin.bin): serve the
    filtered tile, re-bin it at request time, and return ONE MVT
    POLYGON layer "occurrence" with a ``total`` attribute per cell —
    hexagon rings from the aligned grid (HexBin.java:154-161), square
    cell footprints for ``bin="square"`` (SquareBin.java:97-121).
    Returns None when the view has no data on this tile."""
    from maps_spark.functions import mvt
    from maps_spark.operators import binning
    tile = serve_tile(spark, root, map_key, srs, z, x, y,
                      year_range=year_range, bors=bors, verbose=False,
                      tile_size=tile_size, buffer=buffer, reader=reader)
    if tile is None:
        return None
    if bin == "square":
        size = square_size or binning.DEFAULT_SQUARE_SIZE
        cells = binning.square_bin_dict(tile, size, tile_size)
        feats = []
        for (cx, cy), total in sorted(cells.items()):
            x0, y0 = cx * size, cy * size
            ring = [(x0, y0), (x0 + size, y0), (x0 + size, y0 + size),
                    (x0, y0 + size)]
            feats.append((ring, {TOTAL_KEY: int(total)}))
    elif bin == "hex":
        per_tile = hex_per_tile or binning.DEFAULT_HEX_PER_TILE
        cells = binning.hex_bin_dict(tile, z, x, y, tile_size, per_tile)
        feats = []
        for (q, r), total in sorted(cells.items()):
            ring = [(int(round(vx)), int(round(vy))) for vx, vy in
                    binning.hex_polygon(q, r, z, x, y, tile_size,
                                        per_tile)]
            feats.append((ring, {TOTAL_KEY: int(total)}))
    else:
        raise ValueError(f"unknown bin mode: {bin}")
    return mvt.encode_polygon_layer("occurrence", feats, extent=tile_size)


def serve_binned_png(spark, root: str, map_key: str, srs: str, z: int,
                     x: int, y: int, style: str = "classic.poly",
                     bin: str = "hex", scale: float = 1.0,
                     **kwargs) -> bytes | None:
    """Binned tile -> styled polygon PNG (the poly-style raster path:
    mapnik-server renderer.js over a binned MVT). ``kwargs`` pass
    through to :func:`serve_binned_tile`."""
    from maps_spark.functions import mvt, png
    data = serve_binned_tile(spark, root, map_key, srs, z, x, y,
                             bin=bin, **kwargs)
    if data is None:
        return None
    cells = [(ring, attrs.get(TOTAL_KEY, 0))
             for ring, attrs in mvt.decode_polygon_tile(data)
             .get("occurrence", [])]
    if style not in png.POLY_STYLES:
        style = "classic.poly"  # poly endpoint default (styles.js fallback)
    return png.render_poly_png(cells, style, scale=scale)


def _contains(sch, z, x, y, gx, gy, tile_size, buffer):
    vert = (y * tile_size - buffer) <= gy <= (y * tile_size + tile_size + buffer)
    horiz = (x * tile_size - buffer) <= gx <= (x * tile_size + tile_size + buffer)
    if horiz and vert:
        return True
    if sch.wrap_x and vert:
        max_tile = sch.num_x_tiles(z) - 1
        world = sch.num_x_tiles(z) * tile_size
        if x == 0 and gx >= world - buffer:
            return True
        if x == max_tile and gx < buffer:
            return True
    return False


def _is_year(k) -> bool:
    try:
        int(k)
        return True
    except (TypeError, ValueError):
        return False


def _in_range(year: int, lo, hi) -> bool:
    return (lo is None or year >= lo) and (hi is None or year <= hi)
