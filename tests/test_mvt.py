"""Round-trip tests for the pure-Python MVT codec."""

from maps_spark.functions import mvt


def test_roundtrip_single_layer():
    layers = {"HUMAN_OBSERVATION": [
        (10, 20, {"2012": 3, "2013": 5}),
        (-5, 500, {"0": 1}),            # buffer pixel, unknown year
        (511, 511, {"1999": 2}),
    ]}
    data = mvt.encode_tile(layers)
    out = mvt.decode_tile(data)
    assert set(out) == {"HUMAN_OBSERVATION"}
    assert sorted(out["HUMAN_OBSERVATION"]) == sorted(layers["HUMAN_OBSERVATION"])


def test_roundtrip_multi_layer_and_value_types():
    layers = {
        "OBSERVATION": [(0, 0, {"total": 7, "neg": -3})],
        "PRESERVED_SPECIMEN": [(100, 200, {"2020": 1})],
    }
    out = mvt.decode_tile(mvt.encode_tile(layers))
    assert out["OBSERVATION"] == [(0, 0, {"total": 7, "neg": -3})]
    assert out["PRESERVED_SPECIMEN"] == [(100, 200, {"2020": 1})]


def test_value_dedup_and_large_counts():
    feats = [(i, i, {"2000": 123456789012}) for i in range(100)]
    data = mvt.encode_tile({"L": feats})
    out = mvt.decode_tile(data)
    assert len(out["L"]) == 100
    assert all(a == {"2000": 123456789012} for _, _, a in out["L"])


def test_tile_totals_excludes_buffer():
    layers = {"L": [(10, 10, {"2000": 5}), (-1, 10, {"2000": 7})]}
    data = mvt.encode_tile(layers)
    assert mvt.tile_totals(data) == {"L": 12}
    assert mvt.tile_totals(data, exclude_buffer=True) == {"L": 5}


def test_empty_tile():
    assert mvt.decode_tile(b"") == {}
    assert mvt.encode_tile({}) == b""
