"""Real-codec multimodal tests: P6 PPM decode is NOT a stub."""

import numpy as np
import pytest


def test_ppm_roundtrip():
    from maps_spark.operators.multimodal import decode_ppm, encode_ppm
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, size=(7, 5, 3), dtype=np.uint8)
    assert np.array_equal(decode_ppm(encode_ppm(img)), img)


def test_ppm_header_comments_and_errors():
    from maps_spark.operators.multimodal import decode_ppm, encode_ppm
    img = np.zeros((2, 2, 3), dtype=np.uint8)
    raw = encode_ppm(img)
    with_comment = raw.replace(b"P6\n", b"P6\n# a comment\n")
    assert decode_ppm(with_comment).shape == (2, 2, 3)
    with pytest.raises(ValueError):
        decode_ppm(b"P5\n2 2\n255\n" + b"\x00" * 12)
    with pytest.raises(ValueError):
        decode_ppm(raw[:-1])  # truncated pixels


def test_resize_nearest_blocks():
    from maps_spark.operators.multimodal import resize_nearest
    img = np.arange(16, dtype=np.uint8).reshape(4, 4)[..., None].repeat(
        3, axis=-1)
    out = resize_nearest(img, 2, 2)
    assert out.shape == (2, 2, 3)
    assert out[0, 0, 0] == 0 and out[1, 1, 0] == 10


def test_extract_image_features_real_decode(spark):
    import pyspark.sql.functions as F
    from maps_spark.operators.multimodal import (extract_image_features,
                                                 synthesize_ppm_media)
    media = synthesize_ppm_media(spark, n=12, width=16, height=8)
    out = extract_image_features(media).collect()
    assert len(out) == 12 and all(r["decode_ok"] for r in out)
    by_id = {r["media_id"]: np.array(r["feat"]) for r in out}
    # channel 0 is an x-gradient: mean_r == 0.5 for every image
    for v in by_id.values():
        assert abs(v[0] - 127.5 / 255) < 0.02
    # channel 2 encodes the id -> feature differs per id
    assert abs(by_id[0][2] - by_id[11][2]) > 0.03
    # a corrupt payload degrades, not crashes
    bad = media.withColumn(
        "payload",
        F.when(F.col("media_id") == 0,
               F.lit(b"nonsense")).otherwise(F.col("payload")))
    rows = {r["media_id"]: r["decode_ok"]
            for r in extract_image_features(bad).collect()}
    assert rows[0] is False and rows[1] is True
