"""Cached serving reader: correctness vs the per-lookup Spark path and
the warm-latency envelope (the cache2k-equivalent, HBaseMaps.java:109-144)."""

import time

import pytest

from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    from maps_spark.plans.backfill import run_backfill
    root = str(tmp_path_factory.mktemp("tilestore"))
    run_backfill(spark, SF_SMALL, root, srs_list=("EPSG:3857",),
                 max_zoom=4, threshold=500)
    return root


class TestTileReader:
    def test_reader_matches_spark_path(self, spark, store):
        from maps_spark.operators.serving import serve_tile
        from maps_spark.sources.tile_store import TileReader
        reader = TileReader(spark, store)
        for z, x, y in ((0, 0, 0), (1, 1, 0), (2, 1, 1), (4, 7, 7)):
            direct = serve_tile(spark, store, "0:0", "EPSG:3857", z, x, y)
            cached = serve_tile(spark, store, "0:0", "EPSG:3857", z, x, y,
                                reader=reader)
            assert cached == direct

    def test_warm_lookups_fast(self, spark, store):
        from maps_spark.sources.tile_store import TileReader
        reader = TileReader(spark, store)
        reader.get_tile_bytes("0:0", "EPSG:3857", 2, 1, 1)  # cold load
        t0 = time.time()
        n = 50
        for i in range(n):
            reader.get_tile_bytes("0:0", "EPSG:3857", 2, i % 4, (i // 4) % 4)
        per_lookup = (time.time() - t0) / n
        assert per_lookup < 0.05, f"warm lookup {per_lookup * 1e3:.1f} ms"

    def test_slice_load_plan_stays_partition_pruned(self, spark, store):
        """The cold slice load behind every warm point-get must prune
        to one (srs, checklist, z) directory and push mapKey to
        row-group stats — the scan shape the sub-ms warm envelope
        (bench serving_point_get_warm_1000x) rests on."""
        from maps_spark.sources.tile_store import TileReader
        reader = TileReader(spark, store)
        df = reader.slice_df("0:0", "EPSG:3857", 2)
        plan = df._jdf.queryExecution().executedPlan().toString()
        part = [ln for ln in plan.splitlines()
                if "PartitionFilters" in ln]
        assert part, plan
        for col in ("srs", "checklist", "z"):
            assert col in part[0], (col, part[0])
        assert "EqualTo(mapKey,0:0)" in plan
        # and the reader really serves from that plan
        assert reader.get_tile_bytes("0:0", "EPSG:3857", 2, 1, 1) == \
            {(r.x, r.y): bytes(r.tile)
             for r in df.collect()}.get((1, 1))

    def test_point_bundle_fallback_via_reader(self, spark, store):
        import pyspark.sql.functions as F
        from maps_spark.operators.serving import serve_tile
        from maps_spark.sources.tile_store import TileReader, read_points
        reader = TileReader(spark, store)
        small_key = read_points(spark, store).select("mapKey").first()[0]
        direct = serve_tile(spark, store, small_key, "EPSG:3857", 0, 0, 0)
        cached = serve_tile(spark, store, small_key, "EPSG:3857", 0, 0, 0,
                            reader=reader)
        assert cached == direct
        # second call never touches Spark (cache hit) and is identical
        again = serve_tile(spark, store, small_key, "EPSG:3857", 0, 0, 0,
                           reader=reader)
        assert again == direct

    def test_missing_view_returns_none(self, spark, store):
        from maps_spark.operators.serving import serve_tile
        from maps_spark.sources.tile_store import TileReader
        reader = TileReader(spark, store)
        assert serve_tile(spark, store, "9:nope", "EPSG:3857", 0, 0, 0,
                          reader=reader) is None

    def test_build_swap_invalidates(self, spark, store):
        from maps_spark.sources.tile_store import (TileReader,
                                                   read_manifest,
                                                   write_manifest)
        reader = TileReader(spark, store)
        reader.get_tile_bytes("0:0", "EPSG:3857", 0, 0, 0)
        assert len(reader._slices) == 1
        m = read_manifest(store)
        write_manifest(store, {**m, "build_id": m["build_id"]})  # same build
        reader.get_tile_bytes("0:0", "EPSG:3857", 0, 0, 0)
        assert len(reader._slices) == 1  # same key, no reload


def test_tile_diff_between_builds(spark, tmp_path):
    from maps_spark.sources import tile_store as TS
    rows_a = [("0:0", "EPSG_3857", 0, 0, 0, bytearray(b"\x1a\x02")),
              ("0:0", "EPSG_3857", 1, 0, 0, bytearray(b"\x1a\x03")),
              ("3:DK", "EPSG_3857", 0, 0, 0, bytearray(b"\x1a\x04"))]
    rows_b = [("0:0", "EPSG_3857", 0, 0, 0, bytearray(b"\x1a\x02")),
              ("0:0", "EPSG_3857", 1, 0, 0, bytearray(b"\x1a\x09")),
              ("2:ds1", "EPSG_3857", 0, 0, 0, bytearray(b"\x1a\x05"))]
    schema = ("mapKey string, srs string, z int, x long, y long, "
              "tile binary")
    ra, rb = str(tmp_path / "a"), str(tmp_path / "b")
    TS.write_tiles(spark.createDataFrame(rows_a, schema), ra)
    TS.write_tiles(spark.createDataFrame(rows_b, schema), rb)
    out = {(r.mapKey, r.z): r.change
           for r in TS.tile_diff(spark, ra, rb).collect()}
    # unchanged (0:0, z0) omitted; changed/removed/added all present
    assert out == {("0:0", 1): "changed",
                   ("3:DK", 0): "removed",
                   ("2:ds1", 0): "added"}


def test_pyramid_invariant_detects_lost_tile(spark, tmp_path):
    """The conservation canary: clean build -> every view shows one
    distinct cross-zoom total; surgically deleting one z-partition's
    files must surface as a missing zoom / divergent total."""
    import os
    import shutil

    from maps_spark.plans.backfill import run_backfill
    from maps_spark.sources.tile_store import (pyramid_invariant,
                                               resolve_root)
    root = str(tmp_path / "inv")
    run_backfill(spark, SF_SMALL, root, max_zoom=3, threshold=500,
                 srs_list=("EPSG:3857",), skew_report=False)
    clean = pyramid_invariant(spark, root).collect()
    assert clean and all(r.n_distinct_totals == 1 and r.n_zooms == 4
                         for r in clean)
    # drop one zoom's partition directory inside the active build
    tiles_dir = f"{resolve_root(root)}/tiles"
    victims = [p for p, _, files in os.walk(tiles_dir)
               if p.endswith("z=2") and files]
    assert victims
    for v in victims:
        shutil.rmtree(v)
    broken = pyramid_invariant(spark, root).collect()
    assert all(r.n_zooms == 3 for r in broken)  # z=2 gone everywhere
