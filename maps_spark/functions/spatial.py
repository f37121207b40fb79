"""Spatial locality keys: Morton (Z-order) codes and geohashes.

New scope beyond the reference (gbif/maps stores tiles pre-aggregated;
its only layout key is the salted tile key, HBaseKeyUtil.java style) —
a 100 TB POINT corpus needs a layout key so that spatially-close rows
land in the same files and a bounding-box scan prunes at the parquet
row-group level instead of reading the planet.

Everything is a pure dual-dialect expression from
:mod:`maps_spark.sql.dual` (integer bit-interleave after one clamped
grid quantization), so the keys are oracle-checkable bit-for-bit and
run inside whole-stage codegen.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from maps_spark.sql import dual


def morton_key(lat_col: str, lng_col: str, z: int = 16) -> F.Column:
    """Morton code of the 2^z x 2^z WGS84 grid cell containing the
    point — interleaved bits, so nearby points share high bits and a
    z-prefix range covers a square block of cells."""
    return F.expr(dual.morton_interleave(
        dual.grid_x(lng_col, z), dual.grid_y(lat_col, z), z))


def geohash(lat_col: str, lng_col: str, precision: int = 8) -> F.Column:
    """Standard base32 geohash string (prefix-shared by neighbours —
    the human-readable sibling of the Morton key)."""
    return F.expr(dual.geohash_expr(lat_col, lng_col, precision))


def zorder_layout(df: DataFrame, lat_col: str = "decimalLatitude",
                  lng_col: str = "decimalLongitude", z: int = 16,
                  num_partitions: int | None = None) -> DataFrame:
    """Rewrite a point table in Z-order: range-partition + sort on the
    Morton key so each output file covers a compact spatial block.

    At scale this is the layout step before writing a curated point
    corpus: parquet keeps per-row-group min/max on ``zkey``, so a
    reader that maps its bounding box to Morton ranges (a handful of
    prefix intervals) skips every non-overlapping row group — the
    poor man's spatial index, no extension required. The sort is
    per-range-partition (never global); rows with NULL coordinates
    sort first and stay scannable.
    """
    keyed = df.withColumn("zkey", morton_key(lat_col, lng_col, z))
    parts = [F.col("zkey")]
    if num_partitions:
        keyed = keyed.repartitionByRange(num_partitions, *parts)
    else:
        keyed = keyed.repartitionByRange(*parts)
    return keyed.sortWithinPartitions("zkey")
