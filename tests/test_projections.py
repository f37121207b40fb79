"""Projection golden tests.

Golden values pinned from the reference's behavior
(SphericalMercatorTest.java:42-66, WGS84Test.java:24-41,
NorthPoleLAEAEuropeTest.java:26-45, AntarcticPolarStereographicTest.java:29-42).
"""

import numpy as np
import pytest

from maps_spark.functions import projections as P

EPS = 1e-5
L85 = 85.0511287798066


def xy(srs, lat, lng, z):
    x, y = P.global_xy(srs, [lat], [lng], z)
    return float(x[0]), float(y[0])


class TestMercator:
    @pytest.mark.parametrize("lat,lng,z,ex,ey", [
        (0, 0, 0, 256, 256),
        (0, -180, 0, 0, 256),
        (0, 180, 0, 0, 256),  # +180 wraps to the -180 meridian
        (L85, 0, 0, 256, 0),
        (-L85, 0, 0, 256, 512),
        (0, 0, 2, 1024, 1024),
        (0, 180, 2, 0, 1024),  # +180 wraps
        (60.170833, 24.9375, 0, 291.46666, 148.19743),  # Helsinki
        (60.170833, 24.9375, 1, 582.93333, 296.39486),
        (60.170833, 24.9375, 2, 1165.86666, 592.78972),
    ])
    def test_golden(self, lat, lng, z, ex, ey):
        x, y = xy("EPSG:3857", lat, lng, z)
        assert x == pytest.approx(ex, abs=EPS)
        assert y == pytest.approx(ey, abs=EPS)

    def test_plottable(self):
        ok = P.is_plottable("EPSG:3857", [L85, -L85, L85 + 1e-5, -L85 - 1e-5],
                            [0, 0, 0, 0])
        assert list(ok) == [True, True, False, False]


class TestWGS84:
    @pytest.mark.parametrize("lat,lng,z,ex,ey", [
        (90, -180, 0, 0, 0),
        (-90, 180, 0, 0, 512),  # +180 wraps
        (0, 0, 0, 512, 256),
        (0, 0, 1, 1024, 512),
    ])
    def test_golden(self, lat, lng, z, ex, ey):
        x, y = xy("EPSG:4326", lat, lng, z)
        assert (x, y) == pytest.approx((ex, ey), abs=EPS)


class TestLAEA3575:
    @pytest.mark.parametrize("lat,lng,z,ex,ey", [
        (90, 0, 0, 256, 256),
        (0, -80, 0, 0, 256),
        (0, 100, 0, 512, 256),
        (0, -170, 0, 256, 0),
        (0, 10, 0, 256, 512),
        (90, 0, 2, 1024, 1024),
        (0, -80, 2, 0, 1024),
        (0, 100, 2, 2048, 1024),
        (0, -170, 2, 1024, 0),
        (0, 10, 2, 1024, 2048),
    ])
    def test_golden(self, lat, lng, z, ex, ey):
        x, y = xy("EPSG:3575", lat, lng, z)
        # the reference's goldens tolerate 1e-5 px; our independent
        # ellipsoidal implementation should agree well within a pixel
        assert (x, y) == pytest.approx((ex, ey), abs=1e-2)

    def test_plottable_buffer_past_equator(self):
        # reference keeps decimalLatitude > -1 (TileMapBuilder.java:68)
        ok = P.is_plottable("EPSG:3575", [0.0, -0.5, -0.999, -1.0, -1.01],
                            [0, 0, 0, 0, 0])
        assert list(ok) == [True, True, True, False, False]


class TestStereo3031:
    @pytest.mark.parametrize("lat,lng,z,ex,ey", [
        (-90, 0, 0, 256, 256),
        (0, -90, 0, 0, 256),
        (0, 90, 0, 512, 256),
        (0, 0, 0, 256, 0),
        (0, 180, 0, 256, 512),
        (-90, 0, 2, 1024, 1024),
        (0, 180, 2, 1024, 2048),
    ])
    def test_golden(self, lat, lng, z, ex, ey):
        x, y = xy("EPSG:3031", lat, lng, z)
        assert (x, y) == pytest.approx((ex, ey), abs=1e-2)

    def test_extent_constant(self):
        # the reference derived its extent as x(lat=0, lng=90)
        # (WGS84AntarcticPolarStereographic.java:45-49)
        mx, _ = P.stereo3031_meters([0.0], [90.0])
        assert float(mx[0]) == pytest.approx(P.STEREO_EXTENT, abs=1e-4)

    def test_plottable_buffer_past_equator(self):
        # reference keeps decimalLatitude < 1 (TileMapBuilder.java:69)
        ok = P.is_plottable("EPSG:3031", [0.0, 0.5, 0.999, 1.0, 1.01],
                            [0, 0, 0, 0, 0])
        assert list(ok) == [True, True, True, False, False]


class TestPolarBufferBand:
    """Records in the 1-degree buffer past the equator are kept when
    their floored pixel lands on the canvas, dropped otherwise."""

    def test_buffer_band_pixed(self, spark):
        import pyspark.sql.functions as F
        from maps_spark.functions.projections import pixel_cols

        n = P.TILE_SIZE * (1 << 4)
        df = spark.createDataFrame(
            [(-0.5, 55.0), (-0.5, 10.0), (-1.5, 55.0)], "lat double, lng double")
        px, py = pixel_cols("EPSG:3575", "lat", "lng", 4)
        rows = {(r["lat"], r["lng"]): (r["px"], r["py"])
                for r in df.select("lat", "lng", px.alias("px"),
                                   py.alias("py")).collect()}
        # diagonal buffer-band point: on canvas, kept
        got = rows[(-0.5, 55.0)]
        assert got[0] is not None and 0 <= got[0] < n and 0 <= got[1] < n
        # straight-down buffer-band point: overshoots canvas, dropped
        assert rows[(-0.5, 10.0)] == (None, None)
        # beyond the buffer: not plottable at all
        assert rows[(-1.5, 55.0)] == (None, None)

    def test_numpy_matches_spark_semantics(self):
        fx, fy = P.azimuthal_global_xy("EPSG:3575", [-0.5], [55.0], 4)
        n = P.TILE_SIZE * (1 << 4)
        assert 0 <= fx[0] < n and 0 <= fy[0] < n


class TestPyramidShift:
    def test_shift_consistency(self):
        # pixel address at z-1 == pixel address at z >> 1 (same point)
        rng = np.random.default_rng(7)
        lat = rng.uniform(-85, 85, 200)
        lng = rng.uniform(-180, 180, 200)
        for srs in P.SRS_ALL:
            mask = P.is_plottable(srs, lat, lng)
            hx, hy = P.global_xy(srs, lat[mask], lng[mask], 6)
            lx, ly = P.global_xy(srs, lat[mask], lng[mask], 5)
            assert (np.floor(hx).astype(np.int64) >> 1 ==
                    np.floor(lx).astype(np.int64)).all()
            assert (np.floor(hy).astype(np.int64) >> 1 ==
                    np.floor(ly).astype(np.int64)).all()


class TestPolarInverse:
    def test_roundtrip(self):
        import numpy as np
        from maps_spark.functions import projections as P
        for srs in ("EPSG:3575", "EPSG:3031"):
            for lat, lng in ((80.0, 10.0), (45.0, -120.0), (10.0, 179.0),
                             (-60.0, 5.0), (-85.0, 100.0)):
                if srs == "EPSG:3031" and lat > 80:
                    continue
                gx, gy = P.azimuthal_global_xy(srs, lat, lng, 4)
                rl, rg = P.polar_pixel_to_latlng(srs, float(gx),
                                                 float(gy), 4)
                assert abs(rl - lat) < 1e-6
                assert min(abs(rg - lng), abs(abs(rg - lng) - 360)) < 1e-6

    def test_pole_tile_expands_to_quadrants(self):
        from maps_spark.functions.tiles import tile_boundaries
        boxes = tile_boundaries("EPSG:3575", 0, 0, 0)
        assert len(boxes) == 4
        assert all(hi == 90.0 for (_, _, _, hi) in boxes)
        lngs = sorted(b[0] for b in boxes)
        assert lngs == [-180.0, -90.0, 0.0, 90.0]

    def test_off_pole_tile_single_bbox(self):
        from maps_spark.functions.tiles import tile_boundaries
        boxes = tile_boundaries("EPSG:3031", 2, 1, 3, 0.125)
        assert len(boxes) == 1
        (min_lng, min_lat, max_lng, max_lat) = boxes[0]
        assert min_lat < max_lat
