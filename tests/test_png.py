"""PNG raster parity path (S10, renderer.js semantics)."""

import struct
import zlib

import numpy as np

from maps_spark.functions import mvt, png


def _decode_png(data: bytes) -> np.ndarray:
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    pos, idat, w = 8, b"", 0
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + ln]
        if tag == b"IHDR":
            w, h = struct.unpack(">II", body[:8])
        elif tag == b"IDAT":
            idat += body
        pos += 12 + ln
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8)
    rows = raw.reshape(h, w * 4 + 1)
    assert (rows[:, 0] == 0).all()  # filter 0
    return rows[:, 1:].reshape(h, w, 4)


def _tile() -> bytes:
    return mvt.encode_tile({
        "HUMAN_OBSERVATION": [
            (10, 10, {"2000": 5, "total": 5}),        # lowest bucket
            (100, 100, {"2000": 500000, "total": 500000}),  # top bucket
            (-5, 5, {"2000": 3, "total": 3}),         # buffer: dropped
        ]}, extent=512)


class TestRenderPng:
    def test_classic_breakpoints_and_buffer_drop(self):
        img = _decode_png(png.render_density_png(_tile()))
        assert img.shape == (512, 512, 4)
        assert tuple(img[10, 10]) == (0xFF, 0xFF, 0x00, 255)   # <=10
        assert tuple(img[100, 100]) == (0xC2, 0x00, 0x2D, 255)  # >100k
        assert img[5, 507, 3] == 0  # buffer feature not painted
        # dot-width 2: neighbour pixel painted too
        assert tuple(img[11, 11]) == (0xFF, 0xFF, 0x00, 255)

    def test_empty_tile_transparent(self):
        img = _decode_png(png.render_density_png(None))
        assert img[:, :, 3].max() == 0

    def test_density_scaling(self):
        img = _decode_png(png.render_density_png(_tile(), scale=0.5))
        assert img.shape == (256, 256, 4)
        assert tuple(img[5, 5]) == (0xFF, 0xFF, 0x00, 255)

    def test_purple_yellow_style(self):
        img = _decode_png(png.render_density_png(
            _tile(), style="purpleYellow.point"))
        assert tuple(img[10, 10]) == (0x5E, 0x00, 0x63, 255)
        assert tuple(img[100, 100]) == (0xFF, 0xEB, 0xAA, 255)


def _child(x, y, total):
    return mvt.encode_tile({
        "HUMAN_OBSERVATION": [(x, y, {"2000": total, "total": total})]},
        extent=512)


class TestHeatRender:
    def test_quadrant_compositing(self):
        # four z+1 children, one dot each at (100, 100): the composite
        # places them at quadrant_offset + 100/2
        children = [_child(100, 100, 5)] * 4
        img = _decode_png(png.render_heat_png(children, "fire.point"))
        assert img.shape == (512, 512, 4)
        for dx in (0, 256):
            for dy in (0, 256):
                assert tuple(img[dy + 50, dx + 50]) == (0x5E, 0x07, 0x00, 255)
        # nothing outside the dots
        assert img[0, 0, 3] == 0

    def test_hx_256px(self):
        img = _decode_png(png.render_heat_png(
            [_child(100, 100, 5), None, None, None], "purpleHeat.point",
            scale=0.5))
        assert img.shape == (256, 256, 4)
        assert tuple(img[25, 25]) == (0xFF, 0x21, 0xFD, 255)

    def test_screen_blend_brightens_overlap(self):
        # two coincident dots in the SAME child: screen blend must give
        # 255 - (255-c)^2/255 > c for a non-saturated colour
        t = mvt.encode_tile({
            "HUMAN_OBSERVATION": [(100, 100, {"2000": 5, "total": 5})],
            "OBSERVATION": [(100, 100, {"2000": 5, "total": 5})],
        }, extent=512)
        # same pixel across layers is summed pre-ramp (one dot), so use
        # two children mapping to the same canvas pixel instead:
        img = _decode_png(png.render_heat_png(
            [t, None, None, None], "purpleHeat.point"))
        base = (0xFF, 0x21, 0xFD)
        assert tuple(img[50, 50, :3]) == base  # single dot: flat colour

        # overlapping dots from adjacent source pixels (dot width 2)
        t2 = mvt.encode_tile({
            "HUMAN_OBSERVATION": [(100, 100, {"total": 5}),
                                  (101, 101, {"total": 5})]}, extent=512)
        img2 = _decode_png(png.render_heat_png(
            [t2, None, None, None], "purpleHeat.point"))
        g = img2[50, 50, 1]
        expected = round(255 - (255 - 0x21) * (255 - 0x21) / 255)
        assert g == expected and g > 0x21

    def test_is_heat_style(self):
        assert png.is_heat_style("purpleHeat.point")
        assert png.is_heat_style("fire.point")
        assert not png.is_heat_style("classic.point")
