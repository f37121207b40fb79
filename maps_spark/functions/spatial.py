"""Spatial locality keys: Morton (Z-order) codes and geohashes.

New scope beyond the reference (gbif/maps stores tiles pre-aggregated;
its only layout key is the salted tile key, HBaseKeyUtil.java style) —
a 100 TB POINT corpus needs a layout key so that spatially-close rows
land in the same files and a bounding-box scan prunes at the parquet
row-group level instead of reading the planet.

Everything is dual-dialect integer arithmetic from
:mod:`maps_spark.sql.dual` (bit-interleave after one clamped, NULL-safe
grid quantization), so the keys are oracle-checkable bit-for-bit and
run inside whole-stage codegen.

Two forms:

- :func:`add_morton_key` / :func:`add_geohash` — STAGED DataFrame
  rewrites: quantize once, then one narrow projection per spread step.
  Each step's alias is referenced twice by the next step, so Spark's
  CollapseProject keeps the stages separate and every value is
  computed once. Use these on hot paths.
- :func:`morton_key` / :func:`geohash` — single-Column convenience
  forms of the same arithmetic; their expression TEXT duplicates the
  quantization per spread step (fine ad hoc, wasteful per-row at
  geohash precision 8).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from maps_spark.sql import dual


def morton_key(lat_col: str, lng_col: str, z: int = 16) -> F.Column:
    """Morton code of the 2^z x 2^z WGS84 grid cell containing the
    point — interleaved bits, so nearby points share high bits and a
    z-prefix range covers a square block of cells. NULL coordinates
    yield a NULL key (they sort FIRST under Spark's default null
    ordering and never pollute the (90, 180) corner cell)."""
    return F.expr(dual.morton_interleave(
        dual.grid_x(lng_col, z), dual.grid_y(lat_col, z), z))


def geohash(lat_col: str, lng_col: str, precision: int = 8) -> F.Column:
    """Standard base32 geohash string (prefix-shared by neighbours —
    the human-readable sibling of the Morton key); NULL in, NULL out."""
    return F.expr(dual.geohash_expr(lat_col, lng_col, precision))


def _staged_spread(df: DataFrame, cols: dict[str, str],
                   steps) -> DataFrame:
    """Apply the magic-mask spread one projection per step: ``cols``
    maps working column name -> initial expression. Aliases are reused
    across steps, so each stage computes every value exactly once."""
    d = df.select("*", *[F.expr(e).cast("long").alias(c)
                         for c, e in cols.items()])
    for shift, mask in steps:
        d = d.select(
            *[c for c in d.columns if c not in cols],
            *[F.expr(dual.spread_step(c, shift, mask)).alias(c)
              for c in cols])
    return d


def add_morton_key(df: DataFrame, lat_col: str = "decimalLatitude",
                   lng_col: str = "decimalLongitude", z: int = 16,
                   out: str = "zkey") -> DataFrame:
    """Staged Morton key: quantize once, spread step-by-step, combine.
    Same arithmetic as :func:`morton_key`, evaluated once per step."""
    steps = dual.spread_steps(z)
    d = _staged_spread(df, {"_gx": dual.grid_x(lng_col, z),
                            "_gy": dual.grid_y(lat_col, z)}, steps)
    return (d.withColumn(out, F.expr(dual.morton_combine("_gx", "_gy")))
            .drop("_gx", "_gy"))


def add_geohash(df: DataFrame, lat_col: str = "decimalLatitude",
                lng_col: str = "decimalLongitude", precision: int = 8,
                out: str = "gh") -> DataFrame:
    """Staged geohash: the identical bit stream as :func:`geohash`,
    with the quantization and every spread step computed once."""
    nbits, nlng, nlat = dual.geohash_bit_split(precision)
    d = _staged_spread(
        df, {"_gx": dual.grid_x(lng_col, nlng),
             "_gy": dual.grid_y_south(lat_col, nlat)}, dual._SPREAD32)
    d = (d.withColumn("_g", F.expr(
        dual.geohash_combine("_gx", "_gy", nlng, nlat)))
        .drop("_gx", "_gy"))
    chars = [F.expr(dual.geohash_char("_g", nbits, i))
             for i in range(precision)]
    return d.withColumn(out, F.concat(*chars)).drop("_g")


def zorder_layout(df: DataFrame, lat_col: str = "decimalLatitude",
                  lng_col: str = "decimalLongitude", z: int = 16,
                  num_partitions: int | None = None) -> DataFrame:
    """Rewrite a point table in Z-order: range-partition + sort on the
    Morton key so each output file covers a compact spatial block.

    At scale this is the layout step before writing a curated point
    corpus: parquet keeps per-row-group min/max on ``zkey``, so a
    reader that maps its bounding box to Morton ranges (a handful of
    prefix intervals) skips every non-overlapping row group — the
    poor man's spatial index, no extension required (pushdown is
    plan-audited in tests/test_spatial.py). The sort is
    per-range-partition (never global); rows with NULL coordinates
    get a NULL key, sort first, and stay scannable.
    """
    keyed = add_morton_key(df, lat_col, lng_col, z)
    parts = [F.col("zkey")]
    if num_partitions:
        keyed = keyed.repartitionByRange(num_partitions, *parts)
    else:
        keyed = keyed.repartitionByRange(*parts)
    return keyed.sortWithinPartitions("zkey")


def morton_ranges(lat_min: float, lat_max: float, lng_min: float,
                  lng_max: float, z: int = 16,
                  max_ranges: int = 32) -> list[tuple[int, int]]:
    """Cover a bounding box with at most ``max_ranges`` contiguous
    Morton-key intervals at zoom ``z`` — the driver-side half of the
    poor man's spatial index: quadtree descent emits one full range
    per cell wholly inside the box and recurses on boundary cells,
    then adjacent/nearest intervals merge down to the budget (merging
    only ever ADDS covered keys, so the cover stays correct, just
    looser).

    Use with :func:`bbox_scan` (or directly as ``zkey BETWEEN``
    predicates over a :func:`zorder_layout` table): each interval is a
    contiguous key span, so parquet row-group min/max stats skip
    everything outside the box.

    A dateline-crossing box (``lng_min > lng_max``) is handled by
    covering its west and east halves independently and merging the
    two covers back down to the shared ``max_ranges`` budget.
    Coordinates are clamped to the [-90, 90] x [-180, 180] domain
    FIRST, so an out-of-domain pair (e.g. a 0-360 convention) cannot
    masquerade as a wrap and recurse.
    """
    lat_min, lat_max = (max(lat_min, -90.0), min(lat_max, 90.0))
    lng_min, lng_max = (max(min(lng_min, 180.0), -180.0),
                        max(min(lng_max, 180.0), -180.0))
    if lng_min > lng_max:  # dateline wrap: split at the antimeridian
        west = morton_ranges(lat_min, lat_max, lng_min, 180.0, z,
                             max_ranges)
        east = morton_ranges(lat_min, lat_max, -180.0, lng_max, z,
                             max_ranges)
        return _merge_ranges(sorted(west + east), max_ranges)
    n = 1 << z
    import math

    def cell(v, lo, hi):
        return min(max(int(math.floor(v)), lo), hi)

    qx_lo = cell((lng_min + 180.0) / 360.0 * n, 0, n - 1)
    qx_hi = cell((lng_max + 180.0) / 360.0 * n, 0, n - 1)
    qy_lo = cell((90.0 - lat_max) / 180.0 * n, 0, n - 1)
    qy_hi = cell((90.0 - lat_min) / 180.0 * n, 0, n - 1)
    out: list[tuple[int, int]] = []
    # level-by-level descent with a bounded boundary set: a thin box
    # at high z has O(perimeter) boundary cells, so once refining
    # further would exceed the work budget the remaining boundary
    # cells emit their FULL ranges (over-cover — correct, coarser)
    boundary = [(0, 0, 0)]
    budget = 64 * max_ranges
    for level in range(z + 1):
        span = z - level
        partial = []
        for x, y, m in boundary:
            cx_lo, cx_hi = x << span, ((x + 1) << span) - 1
            cy_lo, cy_hi = y << span, ((y + 1) << span) - 1
            if cx_hi < qx_lo or cx_lo > qx_hi \
                    or cy_hi < qy_lo or cy_lo > qy_hi:
                continue
            if (qx_lo <= cx_lo and cx_hi <= qx_hi
                    and qy_lo <= cy_lo and cy_hi <= qy_hi):
                out.append((m << (2 * span),
                            ((m + 1) << (2 * span)) - 1))
            else:
                partial.append((x, y, m))
        if not partial:
            break
        if level == z or len(partial) * 4 > budget:
            out.extend((m << (2 * span), ((m + 1) << (2 * span)) - 1)
                       for x, y, m in partial)
            break
        boundary = [(2 * x + xbit, 2 * y + ybit,
                     m * 4 + (ybit << 1 | xbit))
                    for x, y, m in partial
                    for ybit in (0, 1) for xbit in (0, 1)]
    out.sort()
    return _merge_ranges(out, max_ranges)


def _merge_ranges(out: list[tuple[int, int]],
                  max_ranges: int) -> list[tuple[int, int]]:
    """Coalesce adjacent/overlapping sorted intervals, then merge the
    smallest gaps down to the budget (only ever ADDS covered keys)."""
    merged: list[list[int]] = []
    for a, b in out:
        if merged and a <= merged[-1][1] + 1:
            merged[-1][1] = max(merged[-1][1], b)
        else:
            merged.append([a, b])
    while len(merged) > max_ranges:
        gaps = [(merged[i + 1][0] - merged[i][1], i)
                for i in range(len(merged) - 1)]
        _, i = min(gaps)
        merged[i][1] = merged[i + 1][1]
        del merged[i + 1]
    return [(a, b) for a, b in merged]


def bbox_scan(df: DataFrame, lat_min: float, lat_max: float,
              lng_min: float, lng_max: float, z: int = 16,
              lat_col: str = "decimalLatitude",
              lng_col: str = "decimalLongitude",
              zkey_col: str = "zkey",
              max_ranges: int = 32) -> DataFrame:
    """Bounding-box query over a Z-ordered table: the Morton range
    cover prunes at the scan (row-group min/max on ``zkey_col``), the
    exact coordinate predicate restores cell-boundary precision —
    results are EXACTLY the box, pruning is just the fast path.
    A dateline-crossing box (``lng_min > lng_max``) covers both
    halves of the seam in one call: the key cover unions the two
    sides and the exact longitude predicate becomes the wrapped
    disjunction."""
    from functools import reduce
    if lat_min > lat_max:
        raise ValueError("inverted latitude interval")
    ranges = morton_ranges(lat_min, lat_max, lng_min, lng_max, z,
                           max_ranges)
    pred = reduce(lambda a, b: a | b,
                  [F.col(zkey_col).between(lo, hi)
                   for lo, hi in ranges])
    if lng_min > lng_max:  # wrapped: west OF the seam OR east of it
        lng_pred = ((F.col(lng_col) >= lng_min)
                    | (F.col(lng_col) <= lng_max))
    else:
        lng_pred = ((F.col(lng_col) >= lng_min)
                    & (F.col(lng_col) <= lng_max))
    return df.where(pred).where(
        (F.col(lat_col) >= lat_min) & (F.col(lat_col) <= lat_max)
        & lng_pred)


def geohash_decode_cell(gh: str) -> tuple[int, int, int, int]:
    """(x, y, nlng, nlat): the integer grid cell a geohash names —
    driver-side inverse of the dual-dialect encoder (x west->east,
    y SOUTH->north, matching the encoder's south-origin latitude
    cell)."""
    nbits = 5 * len(gh)
    nlng, nlat = (nbits + 1) // 2, nbits // 2
    g = 0
    for ch in gh:
        g = (g << 5) | dual.GEOHASH_BASE32.index(ch)
    x = y = 0
    # LSB-first: even total ends on lat[0] (lng odd), odd on lng[0]
    lng_on_odd = (nbits % 2) == 0
    for i in range(nbits):
        bit = (g >> i) & 1
        if (i % 2 == 1) == lng_on_odd:
            x |= bit << (i // 2)
        else:
            y |= bit << (i // 2)
    return x, y, nlng, nlat


def geohash_neighbors(gh: str) -> list[str]:
    """The up-to-8 same-precision geohashes adjacent to ``gh`` —
    what a radius/bbox probe over a geohash-bucketed store expands
    to before the exact distance filter (longitude wraps across the
    dateline; latitude clips at the poles). Driver-side: decode to
    the integer cell, step, re-encode."""
    x, y, nlng, nlat = geohash_decode_cell(gh)
    nbits = nlng + nlat
    nx, ny = 1 << nlng, 1 << nlat
    out = []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dx == 0 and dy == 0:
                continue
            yy = y + dy
            if not 0 <= yy < ny:
                continue  # pole edge: no wrap in latitude
            xx = (x + dx) % nx  # dateline wrap
            g = 0
            lng_on_odd = (nbits % 2) == 0
            for i in range(nbits):
                if (i % 2 == 1) == lng_on_odd:
                    bit = (xx >> (i // 2)) & 1
                else:
                    bit = (yy >> (i // 2)) & 1
                g |= bit << i
            chars = []
            for c in range(len(gh)):
                chars.append(dual.GEOHASH_BASE32[
                    (g >> (nbits - 5 * (c + 1))) & 31])
            out.append("".join(chars))
    return out
