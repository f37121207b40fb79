"""Media-curation driver: decode -> features -> near-dup -> store,
with planted duplicates and undecodable payloads."""

import pyspark.sql.functions as F


def _mixed_media(spark):
    # PPM + PNG images (decodable), plus corrupt payloads; ids 0 and
    # 100 are pixel-identical (same gradient parameters) -> near-dups
    from maps_spark.operators.multimodal import (synthesize_jpeg_media,
                                                 synthesize_png_media,
                                                 synthesize_ppm_media)
    ppm = synthesize_ppm_media(spark, n=8, width=16, height=8)
    # duplicate of ppm id 0 under a new id: identical pixels
    dup = (synthesize_ppm_media(spark, n=1, width=16, height=8)
           .withColumn("media_id", F.col("media_id") + 100))
    png = (synthesize_png_media(spark, n=4, width=16, height=8)
           .withColumn("media_id", F.col("media_id") + 200))
    jpg = (synthesize_jpeg_media(spark, n=2)
           .withColumn("media_id", F.col("media_id") + 300))
    bad = spark.createDataFrame(
        [(900, "image", bytearray(b"not an image"), 16, 8, 0, 0)],
        "media_id long, kind string, payload binary, width int, "
        "height int, sample_rate int, n_frames int")
    return (ppm.unionByName(dup).unionByName(png).unionByName(jpg)
            .unionByName(bad))


def test_media_curation_e2e(spark, tmp_path):
    from maps_spark.plans.media import (read_media_features,
                                        run_media_curation)
    media = _mixed_media(spark)
    root = str(tmp_path / "media")
    m = run_media_curation(spark, media, root, dup_threshold=0.9999)
    f = m["funnel"]
    assert f["media_in"] == 16
    assert f["undecodable"] == 1 and f["decoded"] == 15
    # the planted duplicate (id 100 == id 0 pixels) drops; id 0 stays
    kept_ids = {r.media_id for r in
                read_media_features(spark, root).collect()}
    assert 0 in kept_ids and 100 not in kept_ids
    # the JPEG media decoded through the same dispatch
    assert {300, 301} & kept_ids
    assert f["near_dups_dropped"] >= 1
    # PNG id 200 and PPM id 0 share gradient pixels at the same size:
    # cross-codec near-dup also collapses
    assert not {100, 200} & kept_ids or f["near_dups_dropped"] >= 1
    # rerun rotates builds, manifest stays consistent
    m2 = run_media_curation(spark, media, root, dup_threshold=0.9999)
    assert m2["funnel"]["media_in"] == 16
    import os
    assert len(os.listdir(f"{root}/builds")) <= 2


def test_pair_curation_e2e(spark, tmp_path):
    """Image-text pair curation: planted cross-modal duplicate drops,
    same image with NEW text survives, short captions and undecodable
    media leave through the funnel."""
    from maps_spark.operators.multimodal import synthesize_ppm_media
    from maps_spark.plans.media import read_pairs, run_pair_curation

    base = synthesize_ppm_media(spark, n=6, width=16, height=8)
    # id 100: pixel-identical to id 0 (same gradient params)
    dup_img = (synthesize_ppm_media(spark, n=1, width=16, height=8)
               .withColumn("media_id", F.col("media_id") + 100))
    dup_img2 = (synthesize_ppm_media(spark, n=1, width=16, height=8)
                .withColumn("media_id", F.col("media_id") + 200))
    bad = spark.createDataFrame(
        [(900, "image", bytearray(b"junk"), 16, 8, 0, 0)],
        "media_id long, kind string, payload binary, width int, "
        "height int, sample_rate int, n_frames int")
    media = (base.unionByName(dup_img).unionByName(dup_img2)
             .unionByName(bad))

    cap = "a scenic mountain lake at golden hour with pine trees"
    captions = spark.createDataFrame(
        [(0, cap),                          # kept (canonical)
         (1, "another distinct caption describing something else"),
         (2, "too short"),                  # caption gate drops (2 toks)
         (3, "a third caption with plenty of descriptive words here"),
         # 4, 5 have no caption -> alignment drops them
         (100, cap),                        # same image AND caption as 0
         (200, "same picture but newly written words about the lake"),
         (900, "caption for the undecodable payload")],
        "doc_id long, text string")

    root = str(tmp_path / "pairs")
    m = run_pair_curation(spark, media, captions, root,
                          img_threshold=0.9999, min_tokens=4)
    f = m["funnel"]
    assert f["media_in"] == 9
    assert f["decoded"] == 8            # 900 undecodable
    assert f["captions_ok"] == 6        # doc 2 too short
    assert f["aligned"] == 5            # ids 0,1,3,100,200
    kept = {r.media_id for r in read_pairs(spark, root).collect()}
    assert kept == {0, 1, 3, 200}       # 100 = same image + same text
    assert f["cross_modal_dups_dropped"] == 1


def test_cross_format_dedup_collapses_all_codecs(spark, tmp_path):
    """The SAME pixels stored as PPM, plain PNG, Adam7-interlaced
    PNG, and (near-lossless q=1) progressive JPEG all collapse to
    ONE survivor: feature extraction is format-invariant because
    every decoder feeds the same decode_image dispatch."""
    import numpy as np
    import pandas as pd

    from maps_spark.operators.multimodal import (MEDIA_SCHEMA,
                                                 encode_png,
                                                 encode_ppm)
    from maps_spark.functions.jpeg import encode_jpeg_progressive
    from maps_spark.plans.media import (read_media_features,
                                        run_media_curation)
    yy, xx = np.mgrid[0:16, 0:24]
    base = np.stack([xx * 10 % 256, yy * 13 % 256,
                     (xx + yy) * 7 % 256], axis=-1).astype(np.uint8)
    other = (base + 96).astype(np.uint8)  # a distinct second image
    payloads = [
        (0, encode_ppm(base)),
        (1, encode_png(base)),
        (2, encode_png(base, interlace=True)),
        (3, encode_jpeg_progressive(base, q_luma=1, q_chroma=1)),
        (10, encode_ppm(other)),
    ]

    def gen(it):
        for pdf in it:
            rows = [payloads[int(i)] for i in pdf["id"]]
            yield pd.DataFrame({
                "media_id": [r[0] for r in rows], "kind": "image",
                "payload": [r[1] for r in rows],
                "width": 24, "height": 16,
                "sample_rate": 0, "n_frames": 0})

    media = spark.range(5).mapInPandas(gen, MEDIA_SCHEMA)
    root = str(tmp_path / "xfmt")
    m = run_media_curation(spark, media, root, dup_threshold=0.999)
    kept = {r.media_id for r in
            read_media_features(spark, root).collect()}
    # the lowest id of the four-format cluster survives; the
    # unrelated image is untouched
    assert kept == {0, 10}
    assert m["funnel"]["near_dups_dropped"] == 3
