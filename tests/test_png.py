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
