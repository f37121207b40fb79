"""Morton / geohash spatial keys and the Z-order layout rewrite."""

import pyspark.sql.functions as F

from maps_spark.functions.spatial import geohash, morton_key, zorder_layout


def _pts(spark, rows):
    return spark.createDataFrame(rows, "id long, lat double, lng double")


def test_geohash_canonical_values(spark):
    df = _pts(spark, [(1, 57.64911, 10.40744),
                      (2, -25.382708, -49.265506),
                      (3, 0.0, 0.0)])
    got = {r["id"]: r["gh"] for r in df.select(
        "id", geohash("lat", "lng", 8).alias("gh")).collect()}
    assert got == {1: "u4pruydq", 2: "6gkzwgjz", 3: "s0000000"}


def test_geohash_prefix_property(spark):
    """Lower precision is always a prefix of higher precision."""
    df = _pts(spark, [(1, 57.64911, 10.40744), (2, 48.669, -4.329)])
    sel = df.select(
        *[geohash("lat", "lng", p).alias(f"g{p}") for p in range(1, 9)])
    for r in sel.collect():
        full = r["g8"]
        assert all(r[f"g{p}"] == full[:p] for p in range(1, 8))


def test_morton_round_trip_and_locality(spark):
    df = _pts(spark, [(1, 57.64911, 10.40744)])
    m = df.select(morton_key("lat", "lng", 8).alias("m")).first()["m"]
    x = y = 0
    for i in range(16):
        x |= ((m >> (2 * i)) & 1) << i
        y |= ((m >> (2 * i + 1)) & 1) << i
    import math
    assert x == math.floor((10.40744 + 180) / 360 * 256)
    assert y == math.floor((90 - 57.64911) / 180 * 256)
    # neighbours inside one parent cell share the z-1 morton prefix
    eps = 180.0 / 256 / 4
    near = _pts(spark, [(1, 10.0 + eps, 20.0 + eps),
                        (2, 10.0 + 2 * eps, 20.0 + 2 * eps)])
    ms = [r["m"] for r in near.select(
        morton_key("lat", "lng", 8).alias("m")).collect()]
    assert ms[0] >> 2 == ms[1] >> 2


def test_morton_clamps_edges(spark):
    df = _pts(spark, [(1, 90.0, 180.0), (2, -90.0, -180.0)])
    out = {r["id"]: r["m"] for r in df.select(
        "id", morton_key("lat", "lng", 8).alias("m")).collect()}
    # both poles/date-line corners stay inside the 2^16-cell grid
    assert all(0 <= v < (1 << 16) for v in out.values())
    # (-90, -180) is the south-west corner: x=0, y=255 -> odd bits set
    assert out[2] == sum(1 << (2 * i + 1) for i in range(8))


def test_zorder_layout_sorts_within_partitions(spark):
    import random
    rng = random.Random(7)
    rows = [(i, rng.uniform(-90, 90), rng.uniform(-180, 180))
            for i in range(500)]
    out = zorder_layout(_pts(spark, rows), "lat", "lng", z=12,
                        num_partitions=4)
    assert out.schema["zkey"].dataType.typeName() == "long"
    parts = out.select(F.spark_partition_id().alias("p"), "zkey")
    rowsc = parts.collect()
    by_part = {}
    for r in rowsc:
        by_part.setdefault(r["p"], []).append(r["zkey"])
    assert len(rowsc) == 500 and len(by_part) <= 4
    for keys in by_part.values():
        assert keys == sorted(keys)
    # range partitioning: partition key ranges must not overlap
    bounds = sorted((min(k), max(k)) for k in by_part.values())
    for (lo1, hi1), (lo2, hi2) in zip(bounds, bounds[1:]):
        assert hi1 <= lo2


def test_zorder_scan_pushes_range_filter_and_matches_full_scan(
        spark, tmp_path):
    import random
    rng = random.Random(13)
    rows = [(i, rng.uniform(-90, 90), rng.uniform(-180, 180))
            for i in range(2000)]
    out = str(tmp_path / "zpts")
    zorder_layout(_pts(spark, rows), "lat", "lng", z=12,
                  num_partitions=8).write.parquet(out)
    back = spark.read.parquet(out)
    lo, hi = 1 << 20, 1 << 22
    pred = (F.col("zkey") >= lo) & (F.col("zkey") <= hi)
    plan = (back.where(pred).select("id", "zkey")
            ._jdf.queryExecution().executedPlan().toString())
    # the range predicate must reach the parquet scan: with the
    # z-ordered (range-partitioned, sorted) layout those pushed
    # min/max filters are what lets the reader skip whole files /
    # row groups whose zkey interval misses the query box
    assert "PushedFilters" in plan
    assert "GreaterThanOrEqual(zkey" in plan
    assert "LessThanOrEqual(zkey" in plan
    got = {r["id"] for r in back.where(pred).collect()}
    want = {r["id"] for r in back.collect()
            if lo <= r["zkey"] <= hi}
    assert got == want and got


def test_null_and_out_of_range_coords(spark):
    df = spark.createDataFrame(
        [(1, None, 10.0), (2, 20.0, None), (3, 95.0, 200.0),
         (4, -95.0, -200.0)],
        "id long, lat double, lng double")
    out = {r["id"]: (r["m"], r["gh"]) for r in df.select(
        "id", morton_key("lat", "lng", 8).alias("m"),
        geohash("lat", "lng", 4).alias("gh")).collect()}
    # NULL coordinates yield NULL keys (least/greatest skip nulls, so
    # without the CASE guard they'd land in the corner cell)
    assert out[1] == (None, None) and out[2] == (None, None)
    # out-of-range coordinates clamp to edge cells, never negative
    assert out[3][0] == sum(1 << (2 * i) for i in range(8))  # x=255,y=0
    assert out[4][0] == sum(1 << (2 * i + 1) for i in range(8))
    # staged helpers agree with the single-expression forms
    from maps_spark.functions.spatial import add_geohash, add_morton_key
    staged = add_morton_key(add_geohash(df, "lat", "lng", 4),
                            "lat", "lng", 8)
    for r in staged.collect():
        assert (r["zkey"], r["gh"]) == out[r["id"]]


def test_bbox_scan_exact_and_pruned(spark, tmp_path):
    import random

    from maps_spark.functions.spatial import bbox_scan, morton_ranges
    rng = random.Random(17)
    rows = [(i, rng.uniform(-90, 90), rng.uniform(-180, 180))
            for i in range(3000)]
    out = str(tmp_path / "zpts2")
    zorder_layout(_pts(spark, rows), "lat", "lng", z=16,
                  num_partitions=8).write.parquet(out)
    back = spark.read.parquet(out)
    box = (10.0, 35.0, -40.0, -5.0)
    got = {r["id"] for r in bbox_scan(back, *box, z=16, lat_col="lat",
                                      lng_col="lng").collect()}
    want = {i for i, la, lo in rows
            if box[0] <= la <= box[1] and box[2] <= lo <= box[3]}
    assert got == want and got
    # the range cover is sane: bounded count, sorted, disjoint
    ranges = morton_ranges(*box, z=16)
    assert 1 <= len(ranges) <= 32
    assert all(a <= b for a, b in ranges)
    assert all(ranges[i][1] < ranges[i + 1][0]
               for i in range(len(ranges) - 1))
    # dateline-crossing box in ONE call: exactly the wrapped points
    wbox = (-20.0, 20.0, 170.0, -165.0)
    wgot = {r["id"] for r in bbox_scan(back, *wbox, z=16,
                                       lat_col="lat",
                                       lng_col="lng").collect()}
    wwant = {i for i, la, lo in rows
             if wbox[0] <= la <= wbox[1]
             and (lo >= wbox[2] or lo <= wbox[3])}
    assert wgot == wwant and wgot
    wr = morton_ranges(*wbox, z=16)
    assert 1 <= len(wr) <= 32 and all(a <= b for a, b in wr)
    assert all(wr[i][1] < wr[i + 1][0] for i in range(len(wr) - 1))
    # out-of-domain longitudes clamp instead of recursing: a 0-360
    # convention box must terminate and equal its clamped twin
    assert morton_ranges(0.0, 10.0, 350.0, 10.0, z=8) == \
        morton_ranges(0.0, 10.0, 180.0, 10.0, z=8)


def test_morton_ranges_cover_never_misses(spark):
    """Any point inside the box has its z16 morton key inside some
    interval of the cover (the property bbox_scan's pruning relies
    on)."""
    import random

    from maps_spark.functions.spatial import morton_ranges
    rng = random.Random(29)
    for trial in range(16):
        la = sorted((rng.uniform(-90, 90), rng.uniform(-90, 90)))
        lo = sorted((rng.uniform(-180, 180), rng.uniform(-180, 180)))
        if trial % 2:  # wrapped box: swap so lng_min > lng_max and
            lo = [lo[1], lo[0]]  # sample points across the seam
            pts = [(rng.uniform(la[0], la[1]),
                    rng.uniform(lo[0], 180.0) if i % 2
                    else rng.uniform(-180.0, lo[1]))
                   for i in range(50)]
        else:
            pts = [(rng.uniform(la[0], la[1]),
                    rng.uniform(lo[0], lo[1])) for _ in range(50)]
        ranges = morton_ranges(la[0], la[1], lo[0], lo[1], z=16,
                               max_ranges=16)
        assert len(ranges) <= 16
        df = spark.createDataFrame(pts, "lat double, lng double")
        keys = [r["m"] for r in df.select(
            morton_key("lat", "lng", 16).alias("m")).collect()]
        for k in keys:
            assert any(a <= k <= b for a, b in ranges)


def test_geohash_neighbors_and_decode(spark):
    from maps_spark.functions.spatial import (geohash_decode_cell,
                                              geohash_neighbors)
    # canonical 8-neighborhood of a mid-latitude cell
    assert sorted(geohash_neighbors("u4pruyd")) == [
        "u4pruy3", "u4pruy6", "u4pruy7", "u4pruy9",
        "u4pruyc", "u4pruye", "u4pruyf", "u4pruyg"]
    # neighbors differ by exactly one cell step
    x, y, nlng, nlat = geohash_decode_cell("u4pruyd")
    for n in geohash_neighbors("u4pruyd"):
        nx_, ny_, _, _ = geohash_decode_cell(n)
        assert max(abs(nx_ - x), abs(ny_ - y)) == 1
    # pole edge clips (no latitude wrap), dateline wraps
    import duckdb

    from maps_spark.sql import dual
    con = duckdb.connect()
    top = con.execute(
        f"SELECT {dual.geohash_expr('89.99', '0.0', 4)}").fetchone()[0]
    assert len(geohash_neighbors(top)) == 5
    west = con.execute(
        f"SELECT {dual.geohash_expr('0.0', '-179.999', 4)}"
    ).fetchone()[0]
    ns = geohash_neighbors(west)
    assert len(ns) == 8
    xw, _, nlng4, _ = geohash_decode_cell(west)
    assert xw == 0
    assert any(geohash_decode_cell(n)[0] == (1 << nlng4) - 1
               for n in ns)  # dateline-wrapped side present
