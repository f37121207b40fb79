"""Named engine queries: the operator inventory as runnable queries.

Each entry is ``(spark, sf_dir) -> DataFrame`` and has a matching DuckDB
oracle in :mod:`maps_spark.sql.oracle` (referenced from
``__spark_entry__``). Column names/aliases are kept identical on both
sides — the driver's comparator sorts columns by name before hashing.

These run the engine's production code paths (explode fan-out, Column
pixel math, cascade rollup) — not re-implementations.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from maps_spark.functions import projections as P
from maps_spark.functions import tiles as T
from maps_spark.operators import adhoc as AH
from maps_spark.operators import binning as B
from maps_spark.operators import capabilities as C
from maps_spark.operators import pyramid as PY
from maps_spark.operators import regression as R
from maps_spark.operators import serving as SV
from maps_spark.sources.occurrence import occurrence_df

PIXEL_VIEWS = ["0:0", "2:ds-7", "4:NATION_17"]
ROLLUP_VIEWS = ["0:0"]
ASSEMBLY_VIEWS = ["0:0", "3:org-3"]
TREND_SPECIES, TREND_GROUP = "1:c0|s42", "1:c0|g8"


def _keyed(spark: SparkSession, sf_dir: str) -> DataFrame:
    return PY.keyed_occurrence(occurrence_df(spark, sf_dir))


def q_occ_country_counts(spark, sf_dir):
    return (occurrence_df(spark, sf_dir)
            .groupBy("countryCode").agg(F.count("*").alias("n_occ")))


def q_map_view_counts(spark, sf_dir):
    return _keyed(spark, sf_dir).groupBy("mapKey").agg(
        F.count("*").alias("n_occ"))


def q_pixel_agg_3857_z6(spark, sf_dir):
    keyed = _keyed(spark, sf_dir).where(F.col("mapKey").isin(PIXEL_VIEWS))
    return PY.pixel_table(keyed, "EPSG:3857", 6)


def q_pixel_agg_4326_z6(spark, sf_dir):
    keyed = _keyed(spark, sf_dir).where(F.col("mapKey").isin(PIXEL_VIEWS))
    return PY.pixel_table(keyed, "EPSG:4326", 6)


def q_pixel_agg_3575_z4(spark, sf_dir):
    keyed = _keyed(spark, sf_dir).where(F.col("mapKey") == "0:0")
    return PY.pixel_table(keyed, "EPSG:3575", 4)


def q_pixel_agg_3031_z4(spark, sf_dir):
    keyed = _keyed(spark, sf_dir).where(F.col("mapKey") == "0:0")
    return PY.pixel_table(keyed, "EPSG:3031", 4)


def q_spatial_zorder(spark, sf_dir):
    from maps_spark.functions.spatial import add_morton_key
    return (add_morton_key(occurrence_df(spark, sf_dir), z=8)
            .groupBy("zkey").agg(F.count("*").alias("n_occ")))


def q_geohash_counts(spark, sf_dir):
    from maps_spark.functions.spatial import add_geohash
    return (add_geohash(occurrence_df(spark, sf_dir), precision=4)
            .groupBy("gh").agg(F.count("*").alias("n_occ")))


def q_streaming_refresh_pixels(spark, sf_dir):
    """Streaming refresh promoted to a hash gate (VERDICT r4 #6): the
    events table is split into 8 landing files so availableNow
    processes TWO micro-batches (maxFilesPerTrigger=4); the merged
    bucketed pixel store must then hash-match the batch pixel_select
    oracle over the UNION of the batches — proving the foreachBatch
    delta/merge path is exactly additive across batches."""
    import tempfile

    from maps_spark.streaming.refresh import (read_pixel_store,
                                              run_refresh)
    land = tempfile.mkdtemp(prefix="maps-spark-refresh-land-")
    (spark.read.parquet(f"{sf_dir}/events.parquet").repartition(8)
     .write.mode("overwrite").parquet(land))
    store = tempfile.mkdtemp(prefix="maps-spark-refresh-") + "/pixels"
    q = run_refresh(spark, land, f"{sf_dir}/nation.parquet", store,
                    srs="EPSG:3857", zoom=6)
    q.awaitTermination(600)
    return _detach(read_pixel_store(spark, store).select(
        "mapKey", "px", "py", "borYear", "cnt"),
        land, os.path.dirname(store))


def _detach(df, *tmp_dirs):
    """Eagerly localCheckpoint a gate result, then remove the /tmp
    dirs it was computed from — gate/replica/bench runs must not leak
    a store (or a copy of an input table) per invocation."""
    import shutil
    out = df.localCheckpoint()
    for d in tmp_dirs:
        shutil.rmtree(d, ignore_errors=True)
    return out


def q_streaming_touch_join(spark, sf_dir):
    """TRUE stream-stream join promoted to a hash gate: the events
    table lands as 8 unordered files (two availableNow micro-batches
    per side), both sides watermarked, and the joined (touch,
    conversion) interval pairs must hash-match DuckDB's batch
    interval join over the full table — proving the watermarked
    stream-stream join machinery loses and fabricates nothing when
    draining a backlog. The generous watermark keeps the gate
    deterministic (the data spans 30 days of event time; unordered
    arrival must not cross the lateness bound)."""
    import shutil
    import tempfile

    from maps_spark.streaming.joins import run_touch_conversion_join
    land = tempfile.mkdtemp(prefix="maps-spark-ssj-land-")
    out = tempfile.mkdtemp(prefix="maps-spark-ssj-")
    try:
        (spark.read.parquet(f"{sf_dir}/events.parquet").repartition(8)
         .write.mode("overwrite").parquet(land))
        q = run_touch_conversion_join(spark, land, out,
                                      horizon_s=6 * 3600,
                                      watermark="90 days")
        q.awaitTermination(600)
        # localCheckpoint (eager) detaches the result from the /tmp
        # files so both dirs can be removed before returning — every
        # gate/replica run otherwise leaked a copy of the events table
        return (spark.read.parquet(f"{out}/pairs").select(
            "conversion_id", "user_id", "conv_tus", "touch_id",
            "touch_type", "touch_tus", "lag_us").localCheckpoint())
    finally:
        shutil.rmtree(land, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)


def q_pyramid_invariant(spark, sf_dir):
    """Build-sanity canary as a hash gate: run a real z4 build, then
    the distributed cross-zoom conservation check over its tile
    store; the oracle recomputes every view's plottable count from
    the RAW data, so the hash match proves count conservation through
    the entire pipeline (snapshot -> pixels -> spans -> fan-out ->
    MVT encode -> store -> decode)."""
    import tempfile

    from maps_spark.plans.backfill import run_backfill
    from maps_spark.sources.tile_store import pyramid_invariant
    root = tempfile.mkdtemp(prefix="maps-spark-pyrinv-") + "/build"
    run_backfill(spark, sf_dir, root, max_zoom=4, threshold=500,
                 srs_list=("EPSG:3857",), skew_report=False)
    return _detach(pyramid_invariant(spark, root),
                   os.path.dirname(root))


def q_pyramid_invariant_3575(spark, sf_dir):
    """The conservation canary on a POLAR SRS (EPSG:3575, z4): the
    buffer-band NULLing of the LAEA-North projection
    (sql/dual.py laea_pixel_exprs, projections.py polar clip) is
    exactly where a conservation bug would hide — the reference's
    trickiest path (NorthPoleLAEAEurope.java:67-201). Same raw-data
    oracle shape as the EPSG:3857 gate."""
    import tempfile

    from maps_spark.plans.backfill import run_backfill
    from maps_spark.sources.tile_store import pyramid_invariant
    root = tempfile.mkdtemp(prefix="maps-spark-pyrinv3575-") + "/build"
    run_backfill(spark, sf_dir, root, max_zoom=4, threshold=500,
                 srs_list=("EPSG:3575",), skew_report=False)
    return _detach(pyramid_invariant(spark, root),
                   os.path.dirname(root))


def q_points_invariant(spark, sf_dir):
    """Point-store conservation canary: real build, then the
    distributed bundle decode vs raw-data recomputation."""
    import tempfile

    from maps_spark.plans.backfill import run_backfill
    from maps_spark.sources.tile_store import points_invariant
    root = tempfile.mkdtemp(prefix="maps-spark-ptsinv-") + "/build"
    run_backfill(spark, sf_dir, root, max_zoom=2, threshold=500,
                 srs_list=("EPSG:3857",), skew_report=False)
    return _detach(points_invariant(spark, root),
                   os.path.dirname(root))


def q_pyramid_rollup_z6_to_z2(spark, sf_dir):
    keyed = _keyed(spark, sf_dir).where(F.col("mapKey").isin(ROLLUP_VIEWS))
    return PY.rollup(PY.pixel_table(keyed, "EPSG:3857", 6), levels=4)


def q_pyramid_span_z6_to_z2(spark, sf_dir):
    # the ~3-shuffle span strategy must equal the per-level rollup
    keyed = _keyed(spark, sf_dir).where(F.col("mapKey").isin(ROLLUP_VIEWS))
    for z, pixels in PY.pyramid_pixels_spans(keyed, "EPSG:3857", 6,
                                             min_zoom=2, span=2):
        if z == 2:
            return pixels
    raise AssertionError("span generator did not reach z2")


def q_tile_assembly_3857_z2(spark, sf_dir):
    keyed = _keyed(spark, sf_dir).where(F.col("mapKey").isin(ASSEMBLY_VIEWS))
    pix = PY.pixel_table(keyed, "EPSG:3857", 2)
    return PY.tile_rows(pix, "EPSG:3857", 2).select(
        "mapKey", "borYear", "cnt", "tileX", "tileY", "pixelX", "pixelY")


def q_tile_assembly_4326_z1(spark, sf_dir):
    keyed = _keyed(spark, sf_dir).where(F.col("mapKey").isin(ROLLUP_VIEWS))
    pix = PY.pixel_table(keyed, "EPSG:4326", 1)
    return PY.tile_rows(pix, "EPSG:4326", 1).select(
        "mapKey", "borYear", "cnt", "tileX", "tileY", "pixelX", "pixelY")


DENSITY_PARAMS = dict(map_key="0:0", srs="EPSG:3857", z=1, x=1, y=0)


def q_density_tile_simple(spark, sf_dir):
    return SV.density_tile(_keyed(spark, sf_dir), **DENSITY_PARAMS)


def q_density_tile_filtered(spark, sf_dir):
    return SV.density_tile(
        _keyed(spark, sf_dir), verbose=True,
        year_range=(1900, 1980),
        bors=["HUMAN_OBSERVATION", "OBSERVATION"], **DENSITY_PARAMS)


def q_capabilities(spark, sf_dir):
    return C.capabilities(_keyed(spark, sf_dir))


def q_lng_spread(spark, sf_dir):
    return C.lng_spread_df(spark, _keyed(spark, sf_dir), view="4:NATION_17")


def q_square_bin_z2(spark, sf_dir):
    tile = SV.density_tile(_keyed(spark, sf_dir),
                           map_key="0:0", srs="EPSG:3857", z=2, x=1, y=1)
    return B.square_bin(tile)


def q_hex_bin_z2(spark, sf_dir):
    tile = SV.density_tile(_keyed(spark, sf_dir),
                           map_key="0:0", srs="EPSG:3857", z=2, x=1, y=1)
    return B.hex_bin(tile, z=2, x=1, y=1)


def q_country_mask_z2(spark, sf_dir):
    return SV.country_masked_tile(_keyed(spark, sf_dir), map_key="0:0",
                                  mask_key="4:NATION_17", srs="EPSG:3857",
                                  z=2, x=1, y=1)


def q_hex_trend_z0(spark, sf_dir):
    return R.hex_trend(spark, _keyed(spark, sf_dir),
                       species_view="1:c0|g8", group_view="1:c0|f2",
                       srs="EPSG:3857", z=0, x=0, y=0)


def q_media_features(spark, sf_dir):
    from maps_spark.operators import multimodal as MM
    feats = MM.extract_features(MM.synthesize_media(spark, n=64))
    return (feats.groupBy("kind")
            .agg(F.count("*").alias("n"),
                 F.sum(F.col("decode_ok").cast("int")).alias("n_decoded"),
                 F.round(F.sum(F.element_at("feat", 1)), 6)
                 .alias("sum_feat0")))


def q_media_frame_sample(spark, sf_dir):
    from maps_spark.operators import multimodal as MM
    frames = MM.frame_sample(MM.synthesize_media(spark, n=64), every_n=30)
    return (frames.groupBy("media_id")
            .agg(F.count("*").alias("n_frames_sampled"),
                 F.max("frame_idx").alias("last_frame")))


def q_media_ppm_decode(spark, sf_dir):
    from maps_spark.operators.multimodal import (ppm_channel_sums,
                                                 synthesize_ppm_media)
    return ppm_channel_sums(synthesize_ppm_media(spark, n=64))


def q_media_dhash(spark, sf_dir):
    from maps_spark.operators.multimodal import (image_dhash,
                                                 synthesize_ppm_media)
    return image_dhash(synthesize_ppm_media(spark, n=64,
                                            pattern="mod"))


def q_media_dhash_pairs(spark, sf_dir):
    from maps_spark.operators.multimodal import (dhash_near_pairs,
                                                 image_dhash,
                                                 synthesize_ppm_media)
    return dhash_near_pairs(image_dhash(
        synthesize_ppm_media(spark, n=64, pattern="mod")))


def q_media_png_decode(spark, sf_dir):
    from maps_spark.operators.multimodal import (png_channel_sums,
                                                 synthesize_png_media)
    return png_channel_sums(synthesize_png_media(spark, n=64))


def q_media_png_interlaced(spark, sf_dir):
    """Adam7 decode gate: the same 31x17 gradient pixels, but stored
    as seven independently-filtered interlace passes — the shared
    closed-form oracle proves the scatter geometry reassembles every
    pixel at its original coordinate."""
    from maps_spark.operators.multimodal import (png_channel_sums,
                                                 synthesize_png_media)
    return png_channel_sums(
        synthesize_png_media(spark, n=64, interlace=True))


def q_media_gif_decode(spark, sf_dir):
    """GIF/LZW decode gate: variable-width LZW expansion of the
    palette images against the closed-form channel-sum oracle."""
    from maps_spark.operators.multimodal import (gif_channel_sums,
                                                 synthesize_gif_media)
    return gif_channel_sums(synthesize_gif_media(spark, n=64))


def q_media_gif_frames(spark, sf_dir):
    """Animated-GIF gate: per-frame channel sums vary by frame, so a
    hash match proves the image-descriptor walk and disposal
    compositing, not just one decode (the MJPEG gate's regime)."""
    from maps_spark.operators.multimodal import (gif_frame_sums,
                                                 synthesize_gif_anim_media)
    return gif_frame_sums(synthesize_gif_anim_media(spark, n=64))


def q_media_gif_interlaced(spark, sf_dir):
    """GIF 4-pass interlace gate: the same pixels stored in pass row
    order, checked with COORDINATE-WEIGHTED channel sums — plain
    sums are permutation-invariant (any bijective but WRONG pass
    reassembly would still match them); weighting each pixel by
    ``x + width*y`` makes the oracle position-sensitive, so the hash
    match proves the de-interlace puts every pixel back at its
    original coordinate."""
    from maps_spark.operators.multimodal import (gif_coord_weighted_sums,
                                                 synthesize_gif_media)
    return gif_coord_weighted_sums(
        synthesize_gif_media(spark, n=64, interlace=True))


def q_media_wav_decode(spark, sf_dir):
    from maps_spark.operators.multimodal import (synthesize_wav_media,
                                                 wav_stats)
    return wav_stats(synthesize_wav_media(spark, n=64))


def q_media_video_decode(spark, sf_dir):
    from maps_spark.operators.multimodal import (synthesize_y4m_media,
                                                 y4m_frame_sums)
    return y4m_frame_sums(synthesize_y4m_media(spark, n=64))


def q_event_anomalies(spark, sf_dir):
    from maps_spark.operators.sessions import event_anomalies
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return event_anomalies(ev)


def q_containment_pairs(spark, sf_dir):
    from maps_spark.operators.dedup import containment_pairs
    return containment_pairs(_docs(spark, sf_dir), threshold=0.5)


def q_geo_radius_pairs(spark, sf_dir):
    from maps_spark.operators.binning import radius_pairs
    occ = occurrence_df(spark, sf_dir).select(
        F.col("occurrenceId").alias("id"),
        F.col("decimalLatitude").alias("lat"),
        F.col("decimalLongitude").alias("lng"))
    return radius_pairs(occ, radius_deg=0.5)


def q_point_in_polygon(spark, sf_dir):
    """Integer ray-casting containment gate: occurrence points (in
    microdegrees) against 24 closed-form star polygons — both
    engines run the same division-free int64 crossing test, so the
    (id, poly_id) containment set hash-matches exactly."""
    from maps_spark.operators.binning import (point_in_polygon,
                                              synthesize_polygons)
    occ = occurrence_df(spark, sf_dir)
    pts = occ.select(
        F.col("occurrenceId").alias("id"),
        F.round(F.col("decimalLongitude") * 1_000_000)
        .cast("long").alias("px"),
        F.round(F.col("decimalLatitude") * 1_000_000)
        .cast("long").alias("py"))
    return point_in_polygon(pts, synthesize_polygons(spark, 24))


def q_polygon_metrics(spark, sf_dir):
    """Shoelace gate: twice-area (exact int64), vertex count, and
    integer bbox of the 24 star polygons — both engines fold the
    identical cross-product sum."""
    from maps_spark.operators.binning import (polygon_metrics,
                                              synthesize_polygons)
    return polygon_metrics(synthesize_polygons(spark, 24))


def q_hot_keys(spark, sf_dir):
    from maps_spark.operators.adhoc import hot_keys
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return hot_keys(ev, ["user_id"], k=20)


def q_media_jpeg_decode(spark, sf_dir):
    from maps_spark.operators.multimodal import (jpeg_pixel_sums,
                                                 synthesize_jpeg_media)
    return jpeg_pixel_sums(synthesize_jpeg_media(spark, n=64))


def q_media_jpeg_progressive(spark, sf_dir):
    """SOF2 multi-scan decode gate: same flat-block closed form as
    the baseline gate, but the payloads are progressive streams (DC
    first/refine + banded AC first/refine with EOBRUN spans), so the
    hash proves the full Annex G scan accumulation path."""
    from maps_spark.operators.multimodal import (jpeg_pixel_sums,
                                                 synthesize_jpeg_media)
    return jpeg_pixel_sums(
        synthesize_jpeg_media(spark, n=64, progressive=True))


def q_media_adpcm_decode(spark, sf_dir):
    """Compressed-audio decode gate: IMA ADPCM payloads built from
    deterministic nibble streams; the oracle re-runs the full step-
    table state machine in a recursive CTE (see adpcm_stats_select)."""
    from maps_spark.operators.multimodal import (adpcm_stats,
                                                 synthesize_adpcm_media)
    return adpcm_stats(synthesize_adpcm_media(spark, n=64))


def q_media_mjpeg_decode(spark, sf_dir):
    """Compressed-video decode gate: MJPEG frames in a RIFF/AVI
    container, each a flat-block JPEG whose level varies per frame —
    the per-(media, frame) hash proves the chunk walk + frame order."""
    from maps_spark.operators.multimodal import (mjpeg_frame_sums,
                                                 synthesize_mjpeg_media)
    return mjpeg_frame_sums(synthesize_mjpeg_media(spark, n=64))


def q_audio_fingerprints(spark, sf_dir):
    from maps_spark.operators.multimodal import (audio_fingerprint,
                                                 synthesize_wav_media,
                                                 wav_frame_features)
    return audio_fingerprint(wav_frame_features(
        synthesize_wav_media(spark, n=64), frame=64))


def q_audio_near_pairs(spark, sf_dir):
    from maps_spark.operators.multimodal import (audio_fingerprint,
                                                 audio_near_pairs,
                                                 synthesize_wav_media,
                                                 wav_frame_features)
    return audio_near_pairs(audio_fingerprint(wav_frame_features(
        synthesize_wav_media(spark, n=64), frame=64)))


def q_video_scene_cuts(spark, sf_dir):
    from maps_spark.operators.multimodal import (scene_cuts,
                                                 synthesize_y4m_scene_media,
                                                 y4m_frame_features)
    return scene_cuts(y4m_frame_features(
        synthesize_y4m_scene_media(spark, n=64)))


def q_media_wav_frames(spark, sf_dir):
    from maps_spark.operators.multimodal import (synthesize_wav_media,
                                                 wav_frame_features)
    return wav_frame_features(synthesize_wav_media(spark, n=64),
                              frame=256)


def q_adhoc_grid_bounds_z5(spark, sf_dir):
    return AH.geo_grid(occurrence_df(spark, sf_dir), z=5, mode="bounds")


def q_adhoc_grid_centroid_z5(spark, sf_dir):
    return AH.geo_grid(occurrence_df(spark, sf_dir), z=5, mode="centroid")


def q_adhoc_tile_z2(spark, sf_dir):
    return AH.adhoc_tile(occurrence_df(spark, sf_dir), z=2, x=1, y=1,
                         mode="bounds")


def q_year_facet(spark, sf_dir):
    return AH.year_facet(occurrence_df(spark, sf_dir))


def q_species_trend(spark, sf_dir):
    return R.species_trend(spark, _keyed(spark, sf_dir),
                           TREND_SPECIES, TREND_GROUP)


# -- training-data pipeline queries -----------------------------------------


def _docs(spark, sf_dir):
    from maps_spark.sources.occurrence import spread
    return spread(spark, spark.read.parquet(f"{sf_dir}/documents.parquet"))


def _emb(spark, sf_dir):
    from maps_spark.sources.occurrence import spread
    return spread(spark, spark.read.parquet(f"{sf_dir}/embeddings.parquet"))


def q_event_sessions(spark, sf_dir):
    from maps_spark.operators.sessions import sessionize_batch
    return sessionize_batch(spark.read.parquet(f"{sf_dir}/events.parquet"))


def q_event_adhoc_search(spark, sf_dir):
    from maps_spark.operators.adhoc import adhoc_event_search
    return adhoc_event_search(
        spark.read.parquet(f"{sf_dir}/events.parquet"),
        params={"eventType": ["click", "view"], "year": "2024"})


def q_event_funnel(spark, sf_dir):
    from maps_spark.operators.sessions import funnel_stages
    return funnel_stages(spark.read.parquet(f"{sf_dir}/events.parquet"))


def q_cohort_retention(spark, sf_dir):
    from maps_spark.operators.sessions import cohort_retention
    return cohort_retention(spark.read.parquet(f"{sf_dir}/events.parquet"))


def q_user_distinct_sketch(spark, sf_dir):
    # the HLL sketch is in exact coupon mode at gate-scale cardinality
    # (150 users), so the estimate hash-matches the exact oracle; the
    # large-cardinality ~1-2%-error regime is pinned in pytest instead
    from maps_spark.operators.sessions import user_sketches
    return (user_sketches(
        spark.read.parquet(f"{sf_dir}/events.parquet"))
        .select("event_type", "n_events",
                F.col("est_users").cast("long").alias("est_users")))


def q_event_windows(spark, sf_dir):
    from maps_spark.operators.sessions import event_windows
    return event_windows(spark.read.parquet(f"{sf_dir}/events.parquet"))


def q_funnel_counts(spark, sf_dir):
    from maps_spark.operators.sessions import funnel_counts
    return funnel_counts(spark.read.parquet(f"{sf_dir}/events.parquet"))


def q_event_transitions(spark, sf_dir):
    from maps_spark.operators.sessions import event_transitions
    return event_transitions(
        spark.read.parquet(f"{sf_dir}/events.parquet"))


def q_session_paths(spark, sf_dir):
    from maps_spark.operators.sessions import session_paths
    return session_paths(
        spark.read.parquet(f"{sf_dir}/events.parquet"))


def q_range_join_sessions(spark, sf_dir):
    import pyspark.sql.functions as FF
    from maps_spark.operators.sessions import (TS_US_SPARK, range_join,
                                               sessionize_batch)
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    sess = sessionize_batch(events)
    pts = events.select("user_id",
                        FF.expr(TS_US_SPARK).cast("long").alias("tus"))
    j = range_join(pts, sess, "tus", "session_start", "session_end",
                   on=("user_id",))
    return (j.groupBy("user_id", "session_start", "session_end")
            .agg(FF.count("*").alias("n_inside")))


def q_asof_join(spark, sf_dir):
    import pyspark.sql.functions as FF
    from maps_spark.operators.sessions import TS_US_SPARK, asof_join
    ev = (spark.read.parquet(f"{sf_dir}/events.parquet")
          .select("user_id", "event_id", "event_type",
                  FF.expr(TS_US_SPARK).cast("long").alias("tus"),
                  FF.floor(FF.col("value") * 1000).cast("long")
                  .alias("vm")))
    left = (ev.where("event_type = 'purchase'")
            .select("user_id", FF.col("event_id").alias("purchase_id"),
                    "tus"))
    right = ev.where("event_type = 'click'").select("user_id", "tus", "vm")
    return asof_join(left, right, on="user_id", ts_col="tus",
                     right_cols=("vm",))


def q_rolling_active(spark, sf_dir):
    from maps_spark.operators.sessions import rolling_active_users
    return rolling_active_users(
        spark.read.parquet(f"{sf_dir}/events.parquet"), window_days=7)


def q_kmv_distinct(spark, sf_dir):
    """KMV bottom-k distinct sketch gate: per-event-type user
    sketches with integer-exact theta/estimate arithmetic."""
    from maps_spark.operators.sessions import kmv_sketch
    return kmv_sketch(
        spark.read.parquet(f"{sf_dir}/events.parquet"), k=64)


def q_kmv_overlap(spark, sf_dir):
    """KMV set-operation gate: pairwise audience overlap between
    event types from merged bottom-k sketches — the intersection/
    union capability HLL lacks."""
    from maps_spark.operators.sessions import kmv_overlap
    return kmv_overlap(
        spark.read.parquet(f"{sf_dir}/events.parquet"), k=64)


def q_time_gapfill(spark, sf_dir):
    """time_bucket_gapfill/LOCF gate: hourly per-user grid with gap
    buckets present (n_events = 0) and the last event id carried
    forward across them — integer-only, hash-exact."""
    from maps_spark.operators.sessions import time_gapfill
    return time_gapfill(
        spark.read.parquet(f"{sf_dir}/events.parquet"), bucket_s=3600)


def q_attribution(spark, sf_dir):
    from maps_spark.operators.sessions import attribute_conversions
    return attribute_conversions(
        spark.read.parquet(f"{sf_dir}/events.parquet"))


def q_event_crosstab(spark, sf_dir):
    from maps_spark.operators.adhoc import event_type_crosstab
    return event_type_crosstab(
        spark.read.parquet(f"{sf_dir}/events.parquet"))


def q_event_rollup(spark, sf_dir):
    from maps_spark.operators.adhoc import event_rollup
    return event_rollup(spark.read.parquet(f"{sf_dir}/events.parquet"))


def q_top_events_per_user(spark, sf_dir):
    from maps_spark.operators.adhoc import top_events_per_user
    return top_events_per_user(
        spark.read.parquet(f"{sf_dir}/events.parquet"), k=3)


def q_event_props_facet(spark, sf_dir):
    from maps_spark.operators.adhoc import event_props_facet
    return event_props_facet(spark.read.parquet(f"{sf_dir}/events.parquet"))


def q_point_locations(spark, sf_dir):
    keyed = _keyed(spark, sf_dir).where(F.col("mapKey").startswith("3:"))
    return PY.point_locations(keyed)


def _para_docs(spark, sf_dir):
    """The synthetic corpus is a flat token stream; derive a paragraph
    structure deterministically (8-token chunks joined on blank lines)
    so the paragraph-dedup gates run over real multi-paragraph docs.
    Mirrored exactly by the oracle CTE (oracle_training._para_docs_cte)."""
    docs = _docs(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    n_chunks = F.floor((F.size(toks) - 1) / 8).cast("int")
    text = F.array_join(
        F.transform(F.sequence(F.lit(0), n_chunks),
                    lambda i: F.array_join(
                        F.slice(toks, i * 8 + 1, 8), " ")),
        "\n\n")
    return docs.select("doc_id", text.alias("text"))


def q_para_dedup(spark, sf_dir):
    from maps_spark.operators import dedup as DD
    return DD.paragraph_dedup(_para_docs(spark, sf_dir))


def q_para_clean(spark, sf_dir):
    from maps_spark.operators import dedup as DD
    return DD.drop_dup_paragraphs(_para_docs(spark, sf_dir))


def q_dup_ngram_coverage(spark, sf_dir):
    from maps_spark.operators import dedup as DD
    return DD.dup_ngram_coverage(_docs(spark, sf_dir), k=8)


def q_source_divergence(spark, sf_dir):
    from maps_spark.operators import corpus as CP
    return CP.source_divergence(_docs(spark, sf_dir))


def q_dedup_exact(spark, sf_dir):
    # The synthetic corpus has no byte-identical documents, so the raw
    # gate would hash-match on an empty result — certifying only the
    # negative path (VERDICT r9 #4). Seed three deterministic
    # byte-identical pairs (doc_id+10M copies of docs 0-2) so the
    # oracle must reproduce real clusters; the oracle SQL unions the
    # same copies.
    import pyspark.sql.functions as F

    from maps_spark.operators import dedup as DD
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    seeded = docs.unionByName(
        docs.where(F.col("doc_id") < 3)
        .withColumn("doc_id", F.col("doc_id") + F.lit(10_000_000)))
    return DD.exact_duplicates(seeded)


def q_dedup_prefix(spark, sf_dir):
    from maps_spark.operators import dedup as DD
    return DD.prefix_duplicates(_docs(spark, sf_dir), n_tokens=10)


def q_text_stats(spark, sf_dir):
    from maps_spark.operators import text as TX
    return TX.text_features(_docs(spark, sf_dir))


def q_quality_score(spark, sf_dir):
    from maps_spark.operators import text as TX
    return TX.quality_score(_docs(spark, sf_dir))


def q_token_count(spark, sf_dir):
    from maps_spark.operators import text as TX
    return TX.token_count(_docs(spark, sf_dir))


def q_lang_id(spark, sf_dir):
    from maps_spark.operators import text as TX
    return TX.lang_id(_docs(spark, sf_dir))


def q_nb_classify(spark, sf_dir):
    from maps_spark.operators.classify import nb_classify
    docs = _docs(spark, sf_dir)
    return nb_classify(docs, docs, label_col="source")


def q_domain_reputation(spark, sf_dir):
    from maps_spark.operators.html import (domain_reputation,
                                           synthesize_html)
    return domain_reputation(synthesize_html(_docs(spark, sf_dir)))


def q_frontier_candidates(spark, sf_dir):
    from maps_spark.operators.html import (frontier_candidates,
                                           synthesize_html)
    return frontier_candidates(synthesize_html(_docs(spark, sf_dir)))


def q_frontier_shards(spark, sf_dir):
    from maps_spark.operators.html import (frontier_candidates,
                                           frontier_shards,
                                           synthesize_html)
    return frontier_shards(
        frontier_candidates(synthesize_html(_docs(spark, sf_dir))))


def q_robots_filter(spark, sf_dir):
    from maps_spark.operators.html import (apply_robots,
                                           frontier_candidates,
                                           synthesize_html,
                                           synthesize_robots)
    pages = synthesize_html(_docs(spark, sf_dir))
    return apply_robots(frontier_candidates(pages),
                        synthesize_robots(pages))


def q_expectation_report(spark, sf_dir):
    from maps_spark.operators.expectations import (GATE_CONDITIONS,
                                                   GATE_UNIQUE,
                                                   expectation_report)
    return expectation_report(_docs(spark, sf_dir), GATE_CONDITIONS,
                              GATE_UNIQUE)


def q_hybrid_rrf(spark, sf_dir):
    from maps_spark.operators import similarity as SIM
    from maps_spark.operators.retrieval import (GATE_K, GATE_N_QUERIES,
                                                bm25_topk, probe_queries,
                                                rrf_fuse)
    docs = _docs(spark, sf_dir)
    emb = _emb(spark, sf_dir)
    bm = bm25_topk(docs, probe_queries(docs), k=GATE_K)
    an = (SIM.brute_force_topk(
        emb, emb.where(F.col("vec_id") < GATE_N_QUERIES), k=GATE_K)
        .withColumnRenamed("neighbor_id", "doc_id"))
    return rrf_fuse([bm, an])


def q_frontier_sitemap_merge(spark, sf_dir):
    from maps_spark.operators.crawl import (frontier_with_sitemaps,
                                            synthesize_sitemaps)
    from maps_spark.operators.html import synthesize_html
    docs = _docs(spark, sf_dir)
    return frontier_with_sitemaps(synthesize_html(docs),
                                  synthesize_sitemaps(docs))


def q_robots_parse(spark, sf_dir):
    from maps_spark.operators.crawl import (parse_robots_txt,
                                            synthesize_robots_txt)
    return parse_robots_txt(synthesize_robots_txt(_docs(spark, sf_dir)))


def q_sitemap_parse(spark, sf_dir):
    from maps_spark.operators.crawl import (parse_sitemaps,
                                            synthesize_sitemaps)
    return parse_sitemaps(synthesize_sitemaps(_docs(spark, sf_dir)))


def q_redirect_resolve(spark, sf_dir):
    from maps_spark.operators.crawl import (resolve_redirects,
                                            synthesize_redirects)
    return resolve_redirects(synthesize_redirects(_docs(spark, sf_dir)))


def q_fetch_schedule(spark, sf_dir):
    from maps_spark.operators.crawl import (fetch_schedule,
                                            synthesize_fetch_log)
    return fetch_schedule(synthesize_fetch_log(_docs(spark, sf_dir)))


def q_recrawl_candidates(spark, sf_dir):
    from maps_spark.operators.crawl import (recrawl_candidates,
                                            synthesize_fetch_dates,
                                            synthesize_sitemaps)
    docs = _docs(spark, sf_dir)
    return recrawl_candidates(synthesize_sitemaps(docs),
                              synthesize_fetch_dates(docs))


def q_numeric_drift(spark, sf_dir):
    from maps_spark.operators.expectations import (numeric_stats,
                                                   snapshot_drift)
    ev = (spark.read.parquet(f"{sf_dir}/events.parquet")
          .select("event_id", "user_id"))
    drifted = (ev.where(F.col("event_id") % 9 != 0)
               .withColumn("user_id", F.col("user_id") + 1000))
    cols = ["event_id", "user_id"]
    return snapshot_drift(numeric_stats(ev, cols),
                          numeric_stats(drifted, cols),
                          metrics=("n_rows", "sum_v", "min_v",
                                   "max_v"))


def q_redirect_frontier(spark, sf_dir):
    from maps_spark.operators.crawl import apply_redirects
    from maps_spark.operators.html import (frontier_candidates,
                                           page_urls, synthesize_html)
    pages = synthesize_html(_docs(spark, sf_dir))
    cand = frontier_candidates(pages)
    last = F.substring("norm_href", -1, 1)
    edges = (cand.where(last.isin(*"13579"))
             .select(F.col("norm_href").alias("src_url"),
                     F.concat("norm_href", F.lit("/r"))
                     .alias("dst_url"))
             .unionByName(
                 cand.where(last == "0")
                 .select(F.col("norm_href").alias("src_url"),
                         F.col("norm_href").alias("dst_url"))))
    return apply_redirects(cand, edges, page_urls(pages))


def q_snapshot_drift(spark, sf_dir):
    from maps_spark.operators.expectations import (column_stats,
                                                   snapshot_drift)
    docs = _docs(spark, sf_dir).select("doc_id", "source", "text")
    drifted = (docs.where(F.col("doc_id") % 10 != 0)
               .withColumn("text", F.when(F.col("doc_id") % 7 == 0,
                                          F.lit(None))
                           .otherwise(F.col("text"))))
    return snapshot_drift(column_stats(docs), column_stats(drifted))


def q_snapshot_delta(spark, sf_dir):
    """Row-level CDC gate: documents vs a deterministic prior
    snapshot — every 5th doc missing from the prior (added), every
    7th survivor's text reversed (changed, with the column named),
    synthetic prior-only ids (removed)."""
    from maps_spark.operators.expectations import keyed_delta
    docs = _docs(spark, sf_dir).select("doc_id", "source", "text")
    prev = (docs.where(F.col("doc_id") % 5 != 0)
            .withColumn("text", F.when(F.col("doc_id") % 7 == 0,
                                       F.reverse(F.col("text")))
                        .otherwise(F.col("text")))
            .unionByName(docs.where(F.col("doc_id") % 11 == 0)
                         .withColumn("doc_id",
                                     F.col("doc_id") + 10_000_000)))
    return keyed_delta(docs, prev, ["doc_id"])


def q_fetch_timeline(spark, sf_dir):
    from maps_spark.operators.crawl import fetch_timeline
    from maps_spark.operators.html import (frontier_candidates,
                                           frontier_shards,
                                           synthesize_html)
    plan = frontier_shards(frontier_candidates(
        synthesize_html(_docs(spark, sf_dir))))
    # one planted corpus-wide crawl delay exercises the spacing
    # arithmetic; the helper column drops so the schema matches the
    # oracle's
    return fetch_timeline(plan.withColumn("crawl_delay_s", F.lit(3)),
                          default_gap_s=1).drop("crawl_delay_s")


def q_robots_v2_decisions(spark, sf_dir):
    from maps_spark.operators.crawl import (parse_robots_v2,
                                            robots_decisions_v2,
                                            synthesize_robots_v2,
                                            synthesize_v2_urls)
    docs = _docs(spark, sf_dir)
    return robots_decisions_v2(synthesize_v2_urls(docs),
                               parse_robots_v2(
                                   synthesize_robots_v2(docs)))


def q_site_boilerplate(spark, sf_dir):
    from maps_spark.operators.html import (site_boilerplate,
                                           synthesize_html)
    return site_boilerplate(synthesize_html(_docs(spark, sf_dir)))


def q_site_clean_extract(spark, sf_dir):
    from maps_spark.operators.html import (extract_site_clean,
                                           synthesize_html)
    return extract_site_clean(synthesize_html(_docs(spark, sf_dir)))


def q_url_canonical(spark, sf_dir):
    from maps_spark.operators.html import with_canon_href
    docs = _docs(spark, sf_dir)
    i = F.col("doc_id").cast("string")
    variants = F.array(
        F.concat(F.lit("http://t"), (F.col("doc_id") % 4)
                 .cast("string"),
                 F.lit(".example/p/"), i,
                 F.lit("?utm_source=feed&id="), i,
                 F.lit("&utm_medium=rss")),
        F.concat(F.lit("HTTPS://T.Example:443/q?gclid=abc"), i),
        F.concat(F.lit("/rel/"), i, F.lit("?a=1&fbclid=zz&b=2")),
        F.concat(F.lit("http://plain"), (F.col("doc_id") % 3)
                 .cast("string"), F.lit(".example/x?keep="), i))
    messy = docs.select(
        "doc_id", F.posexplode(variants).alias("variant", "href"))
    return with_canon_href(messy, "href")


def q_link_hits(spark, sf_dir):
    from maps_spark.operators.graph import hits
    from maps_spark.operators.html import (site_domain_edges,
                                           synthesize_html)
    return hits(site_domain_edges(synthesize_html(
        _docs(spark, sf_dir))))


def q_url_normalize(spark, sf_dir):
    from maps_spark.operators.html import norm_url_sql
    docs = _docs(spark, sf_dir)
    i = F.col("doc_id").cast("string")
    variants = F.array(
        F.concat(F.lit("HTTP://Site"), (F.col("doc_id") % 5)
                 .cast("string"),
                 F.lit(".Example:80/p/"), i, F.lit("?q=1#frag")),
        F.concat(F.lit("HTTPS://Host"), (F.col("doc_id") % 3)
                 .cast("string"), F.lit(".example:443#x")),
        F.concat(F.lit("/rel/"), i, F.lit("#frag")))
    messy = docs.select(
        "doc_id", F.posexplode(variants).alias("variant", "href"))
    return messy.withColumn("norm_href",
                            F.expr(norm_url_sql("href")))


def q_link_pagerank(spark, sf_dir):
    from maps_spark.operators.graph import pagerank
    from maps_spark.operators.html import (site_domain_edges,
                                           synthesize_html)
    edges = site_domain_edges(synthesize_html(_docs(spark, sf_dir)))
    return pagerank(edges).select(
        F.col("node").alias("domain"), "rank_scaled")


def q_bm25_topk(spark, sf_dir):
    from maps_spark.operators.retrieval import (GATE_K, bm25_topk,
                                                probe_queries)
    docs = _docs(spark, sf_dir)
    return bm25_topk(docs, probe_queries(docs), k=GATE_K)


def q_classifier_eval(spark, sf_dir):
    from maps_spark.operators.classify import classifier_eval, nb_classify
    docs = _docs(spark, sf_dir)
    scored = nb_classify(docs, docs, label_col="source")
    return classifier_eval(scored, docs.select(
        "doc_id", F.col("source").alias("label")))


def q_dup_spans(spark, sf_dir):
    from maps_spark.operators.dedup import dup_spans
    return dup_spans(_docs(spark, sf_dir), gram_hasher="reproducible")


def q_dup_span_stats(spark, sf_dir):
    from maps_spark.operators.dedup import dup_span_stats
    return dup_span_stats(_docs(spark, sf_dir),
                      gram_hasher="reproducible")


def q_scrub_dup_spans(spark, sf_dir):
    from maps_spark.operators.dedup import scrub_dup_spans
    return scrub_dup_spans(_docs(spark, sf_dir),
                       gram_hasher="reproducible")


def q_domain_cap(spark, sf_dir):
    from maps_spark.operators.corpus import domain_cap
    return (domain_cap(_docs(spark, sf_dir), cap=20)
            .select("doc_id", "source"))


def q_grouped_split(spark, sf_dir):
    from maps_spark.operators.corpus import grouped_split
    return grouped_split(_docs(spark, sf_dir), val_frac=0.2)


def q_normalize_text(spark, sf_dir):
    from maps_spark.operators.text import normalize_text
    return normalize_text(_docs(spark, sf_dir))


def q_html_extract(spark, sf_dir):
    from maps_spark.operators.html import (extract_main_text,
                                           synthesize_html)
    return extract_main_text(synthesize_html(_docs(spark, sf_dir)))


def q_html_block_stats(spark, sf_dir):
    from maps_spark.operators.html import (html_block_stats,
                                           synthesize_html)
    return html_block_stats(synthesize_html(_docs(spark, sf_dir)))


def q_html_meta(spark, sf_dir):
    from maps_spark.operators.html import (extract_page_meta,
                                           synthesize_html)
    return extract_page_meta(synthesize_html(_docs(spark, sf_dir)))


def q_anchor_texts(spark, sf_dir):
    from maps_spark.operators.html import extract_anchors, synthesize_html
    return extract_anchors(synthesize_html(_docs(spark, sf_dir)))


def q_anchor_index(spark, sf_dir):
    from maps_spark.operators.html import (anchor_text_index,
                                           extract_anchors,
                                           synthesize_html)
    return anchor_text_index(
        extract_anchors(synthesize_html(_docs(spark, sf_dir))))


def q_html_links(spark, sf_dir):
    from maps_spark.operators.html import extract_links, synthesize_html
    return extract_links(synthesize_html(_docs(spark, sf_dir)))


def q_link_stats(spark, sf_dir):
    from maps_spark.operators.html import link_stats, synthesize_html
    return link_stats(synthesize_html(_docs(spark, sf_dir)))


def q_link_domain_counts(spark, sf_dir):
    from maps_spark.operators.html import (link_domain_counts,
                                           synthesize_html)
    return link_domain_counts(synthesize_html(_docs(spark, sf_dir)))


def q_embedding_profile(spark, sf_dir):
    from maps_spark.operators.similarity import embedding_profile
    return embedding_profile(_emb(spark, sf_dir))


def q_embedding_outliers(spark, sf_dir):
    from maps_spark.operators.similarity import embedding_outliers
    return embedding_outliers(_emb(spark, sf_dir))


def q_ngram_jaccard(spark, sf_dir):
    from maps_spark.operators import dedup as DD
    return DD.ngram_jaccard_pairs(_docs(spark, sf_dir), threshold=0.25)


def q_jaccard_prefix(spark, sf_dir):
    # lossless prefix-filtered exact similarity join: the oracle is
    # brute-force all-pairs Jaccard with NO cap, so this gate proves
    # the pruned candidate generation drops nothing
    from maps_spark.operators import dedup as DD
    return DD.jaccard_prefix_pairs(_docs(spark, sf_dir), threshold=0.25)


def q_quality_ensemble(spark, sf_dir):
    from maps_spark.operators.text import quality_ensemble, text_features
    docs = _docs(spark, sf_dir)
    sigs = (text_features(docs)
            .join(docs.select("doc_id", "source"), "doc_id")
            .select("doc_id", "source", "n_tokens", "n_stopwords"))
    return quality_ensemble(sigs, {"n_tokens": 600_000,
                                   "n_stopwords": 400_000})


def q_compression_signals(spark, sf_dir):
    """The LAST rows-only gate, by design: zlib deflate has no DuckDB
    twin; correctness pins via pytest ordering/accounting invariants
    instead of a value hash. Its hash-gated sibling is
    q_lz_complexity (the LZ78 parse is pure integer/string logic)."""
    from maps_spark.operators.text import compression_signals
    return compression_signals(_docs(spark, sf_dir))


def q_random_walks(spark, sf_dir):
    """DeepWalk corpus generation over the customer<->supplier
    interaction graph (orders x lineitem, ids disambiguated onto
    even/odd longs, both directions): deterministic mixer-driven
    walks, replayed bitwise by the recursive-CTE twin."""
    from maps_spark.operators.graph import random_walks
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    fwd = (orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
           .select((F.col("o_custkey") * 2).alias("src"),
                   (F.col("l_suppkey") * 2 + 1).alias("dst")))
    edges = fwd.unionByName(
        fwd.select(F.col("dst").alias("src"),
                   F.col("src").alias("dst")))
    return random_walks(edges, walk_len=5, walks_per_node=2)


def q_node2vec_walks(spark, sf_dir):
    """Second-order biased walks over the same interaction graph:
    return/BFS/DFS integer weights, cumulative-draw picks — replayed
    bitwise by the unrolled-CTE twin."""
    from maps_spark.operators.graph import node2vec_walks
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    fwd = (orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
           .select((F.col("o_custkey") * 2).alias("src"),
                   (F.col("l_suppkey") * 2 + 1).alias("dst")))
    edges = fwd.unionByName(
        fwd.select(F.col("dst").alias("src"),
                   F.col("src").alias("dst")))
    return node2vec_walks(edges, walk_len=4, walks_per_node=2)


def q_skipgram_pairs(spark, sf_dir):
    """word2vec-style (center, context) pairs from the same walks —
    counted with multiplicity, so the hash also pins pair ORDER
    structure inside every walk."""
    from maps_spark.operators.graph import random_walks, skipgram_pairs
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    fwd = (orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
           .select((F.col("o_custkey") * 2).alias("src"),
                   (F.col("l_suppkey") * 2 + 1).alias("dst")))
    edges = fwd.unionByName(
        fwd.select(F.col("dst").alias("src"),
                   F.col("src").alias("dst")))
    pairs = skipgram_pairs(
        random_walks(edges, walk_len=5, walks_per_node=2), window=2)
    return (pairs.groupBy("center", "context", "dist")
            .agg(F.count("*").alias("n_pairs")))


def q_negative_samples(spark, sf_dir):
    """Contrastive-training negative sampling over same-source
    positives: bucket-probe draws with the shared two-round mixer —
    deterministic, cross-joins nothing, replayed bitwise in SQL."""
    from pyspark.sql import Window
    from maps_spark.operators.mixture import negative_samples
    docs = _docs(spark, sf_dir)
    pos = docs.select(
        F.col("doc_id").alias("doc_a"),
        F.min("doc_id").over(Window.partitionBy("source"))
        .alias("doc_b"))
    return negative_samples(pos, docs, k=4)


def q_group_sample(spark, sf_dir):
    """Balanced per-group sampling: the k smallest (mix(id), id) per
    source — exact despite the scale prefilter (the oracle is the
    straight window definition; the prefilter/rescue is a speedup)."""
    from maps_spark.operators.corpus import group_sample
    return group_sample(_docs(spark, sf_dir), ["source"], k=20)


def q_lz_complexity(spark, sf_dir):
    """Lempel-Ziv (LZ78) phrase-count compressibility — the
    oracle-hashable repetitiveness signal beside zlib's rows-only
    gate; the oracle replays the parse as a recursive CTE."""
    from maps_spark.operators.text import lz_complexity
    return lz_complexity(_docs(spark, sf_dir))


def q_winnow_fingerprints(spark, sf_dir):
    from maps_spark.operators.text import winnow_fingerprints
    return winnow_fingerprints(_docs(spark, sf_dir))


def q_ann_recall_index(spark, sf_dir):
    """Recall of the SERVED IVF path: brute force vs the persisted
    cluster-partitioned index read back through the pruned reader —
    must hash-match the on-the-fly ann_recall_ivf oracle, proving
    the serving path loses nothing over the in-memory plan."""
    import tempfile

    from maps_spark.operators.similarity import (brute_force_topk,
                                                 recall_counts)
    from maps_spark.sources.ann_index import (build_ivf_index,
                                              query_ivf_index)
    emb = _emb(spark, sf_dir)
    queries = emb.where(F.col("vec_id") < 16)
    root = tempfile.mkdtemp(prefix="maps-spark-ivfrec-") + "/index"
    build_ivf_index(emb, root, n_clusters=16, kmeans_iters=2)
    approx = query_ivf_index(spark, root, queries, k=10, n_probe=4)
    return _detach(
        recall_counts(brute_force_topk(emb, queries, k=10), approx),
        os.path.dirname(root))


def q_winnow_contamination(spark, sf_dir):
    from maps_spark.operators.text import winnow_contamination
    docs = _docs(spark, sf_dir)
    return winnow_contamination(
        docs.where(F.col("doc_id") % BENCH_MOD != 0),
        docs.where(F.col("doc_id") % BENCH_MOD == 0))


def q_winnow_pairs(spark, sf_dir):
    from maps_spark.operators.text import winnow_pairs
    return winnow_pairs(_docs(spark, sf_dir))


def q_ann_topk(spark, sf_dir):
    from maps_spark.operators import similarity as SIM
    emb = _emb(spark, sf_dir)
    return SIM.brute_force_topk(emb, emb.where(F.col("vec_id") < 16), k=10)


def q_minhash_lsh(spark, sf_dir):
    from maps_spark.operators import dedup as DD
    # gate query: the oracle SQL recomputes the signatures, so the
    # dual-reproducible polynomial hasher is passed explicitly (the
    # production default is the fast crc32+splitmix64 backend)
    return DD.minhash_lsh_pairs(_docs(spark, sf_dir),
                                hasher="reproducible")


def q_minhash_verify(spark, sf_dir):
    from maps_spark.operators import dedup as DD
    docs = _docs(spark, sf_dir)
    return DD.minhash_verify(
        DD.minhash_lsh_pairs(docs, hasher="reproducible"),
        DD.minhash_signatures(docs, hasher="reproducible"),
        threshold=0.25)


def q_simhash_pairs(spark, sf_dir):
    from maps_spark.operators import dedup as DD
    return DD.simhash_near_pairs(_docs(spark, sf_dir),
                                 hasher="reproducible")


def q_embedding_near_dupes(spark, sf_dir):
    from maps_spark.operators import similarity as SIM
    # synthetic embeddings are near-orthogonal (max cos ~0.51);
    # 0.3 marks the top ~1% as "near-dup" so the operator has signal
    return SIM.embedding_near_dupes(_emb(spark, sf_dir), threshold=0.3)


def q_ann_lsh_topk(spark, sf_dir):
    from maps_spark.operators import similarity as SIM
    emb = _emb(spark, sf_dir)
    return SIM.lsh_topk(emb, emb.where(F.col("vec_id") < 16), k=10)


def q_ann_ivf_topk(spark, sf_dir):
    from maps_spark.operators import similarity as SIM
    emb = _emb(spark, sf_dir)
    return SIM.ivf_topk(emb, emb.where(F.col("vec_id") < 16), k=10,
                        n_clusters=16, n_probe=4)


def q_ann_recall_ivf(spark, sf_dir):
    from maps_spark.operators import similarity as SIM
    emb = _emb(spark, sf_dir)
    return SIM.ann_recall(emb, emb.where(F.col("vec_id") < 16), k=10,
                          method="ivf", n_clusters=16, n_probe=4)


def q_ann_recall_lsh(spark, sf_dir):
    from maps_spark.operators import similarity as SIM
    emb = _emb(spark, sf_dir)
    return SIM.ann_recall(emb, emb.where(F.col("vec_id") < 16), k=10,
                          method="lsh")


def q_ann_ivf_index(spark, sf_dir):
    """Build-then-serve split of the IVF path: persist the cluster-
    partitioned index, then answer the same top-k through the pruned
    reader — must hash-match the on-the-fly ivf_topk oracle."""
    import tempfile

    from maps_spark.sources.ann_index import (build_ivf_index,
                                              query_ivf_index)
    emb = _emb(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="maps-spark-ivf-") + "/index"
    build_ivf_index(emb, root, n_clusters=16, kmeans_iters=2)
    return _detach(query_ivf_index(spark, root,
                                   emb.where(F.col("vec_id") < 16),
                                   k=10, n_probe=4),
                   os.path.dirname(root))


def q_doc_fingerprint(spark, sf_dir):
    from maps_spark.operators import text as TX
    return TX.fingerprint(_docs(spark, sf_dir))


def q_dedup_clusters(spark, sf_dir):
    from maps_spark.operators import dedup as DD
    pairs = DD.ngram_jaccard_pairs(_docs(spark, sf_dir), threshold=0.25)
    return DD.dedup_clusters(pairs)


def q_geo_radius_haversine(spark, sf_dir):
    """Was rows-only for five rounds (cross-engine trig differs in
    the last ulp); now hash-gated on the FIXED sf0.01 compare set,
    where the measured boundary margins (64 m to the radius cut,
    12 mm to the nearest flooring boundary) dwarf ulp noise by ten
    orders of magnitude — see radius_haversine_select."""
    from maps_spark.operators.binning import radius_pairs_haversine
    occ = occurrence_df(spark, sf_dir)
    pts = (occ.where("occurrenceId % 7 = 0")
           .select(F.col("occurrenceId").alias("id"),
                   F.col("decimalLatitude").alias("lat"),
                   F.col("decimalLongitude").alias("lng")))
    return radius_pairs_haversine(pts, radius_km=25.0)


def q_soft_dedup_weights(spark, sf_dir):
    from maps_spark.operators import dedup as DD
    docs = _docs(spark, sf_dir)
    pairs = DD.ngram_jaccard_pairs(docs, threshold=0.25)
    return DD.soft_dedup_weights(docs, DD.dedup_clusters(pairs))


def q_conversion_latency_sketch(spark, sf_dir):
    from maps_spark.operators.sessions import conversion_latency_sketch
    return conversion_latency_sketch(
        spark.read.parquet(f"{sf_dir}/events.parquet"))


def q_value_sketch(spark, sf_dir):
    from maps_spark.operators.sessions import value_sketch
    return value_sketch(spark.read.parquet(f"{sf_dir}/events.parquet"))


def q_value_sketch_quantiles(spark, sf_dir):
    from maps_spark.operators.sessions import (sketch_quantiles,
                                               value_sketch)
    sk = value_sketch(spark.read.parquet(f"{sf_dir}/events.parquet"))
    return sketch_quantiles(sk, [0.5, 0.9, 0.99])


def q_event_cube(spark, sf_dir):
    from maps_spark.operators.sessions import event_cube
    return event_cube(spark.read.parquet(f"{sf_dir}/events.parquet"))


def q_cms_counters(spark, sf_dir):
    from maps_spark.operators.sessions import cms_build
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    return cms_build(events)


def q_cms_estimate(spark, sf_dir):
    from maps_spark.operators.sessions import cms_build, cms_estimate
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    return cms_estimate(cms_build(events),
                        events.where(F.col("user_id") < 128))


def q_weighted_sample(spark, sf_dir):
    from maps_spark.operators import dedup as DD
    from maps_spark.operators.mixture import weighted_sample
    docs = _docs(spark, sf_dir)
    pairs = DD.ngram_jaccard_pairs(docs, threshold=0.25)
    w = DD.soft_dedup_weights(docs, DD.dedup_clusters(pairs))
    return weighted_sample(w, rate=0.5)


BENCH_MOD = 25  # doc_id % 25 == 0 -> the held-out "benchmark" set


def q_contamination(spark, sf_dir):
    from maps_spark.operators import corpus as CP
    docs = _docs(spark, sf_dir)
    return CP.contamination_check(
        docs.where(F.col("doc_id") % BENCH_MOD != 0),
        docs.where(F.col("doc_id") % BENCH_MOD == 0))


def q_fuzzy_title_pairs(spark, sf_dir):
    from maps_spark.operators.dedup import fuzzy_pairs
    titles = _docs(spark, sf_dir).select(
        "doc_id", F.lower(F.substring("text", 1, 40)).alias("title"))
    return fuzzy_pairs(titles)


def q_kmeans_clusters(spark, sf_dir):
    from maps_spark.operators.similarity import kmeans_assign
    return kmeans_assign(_emb(spark, sf_dir))


PQ_TRAIN = 256  # bounded-sample codebook training (id-ordered rule)


def q_pq_codes(spark, sf_dir):
    from maps_spark.operators.similarity import pq_encode
    return pq_encode(_emb(spark, sf_dir), train_sample=PQ_TRAIN)[1]


def q_ann_pq_topk(spark, sf_dir):
    from maps_spark.operators.similarity import pq_topk
    emb = _emb(spark, sf_dir)
    return pq_topk(emb, emb.where(F.col("vec_id") < 16),
                   train_sample=PQ_TRAIN)


def q_ann_recall_pq(spark, sf_dir):
    from maps_spark.operators import similarity as SIM
    emb = _emb(spark, sf_dir)
    return SIM.ann_recall(emb, emb.where(F.col("vec_id") < 16), k=10,
                          method="pq", train_sample=PQ_TRAIN)


def q_ann_ivfpq_topk(spark, sf_dir):
    from maps_spark.operators.similarity import ivfpq_topk
    emb = _emb(spark, sf_dir)
    return ivfpq_topk(emb, emb.where(F.col("vec_id") < 16),
                      pq_train_sample=PQ_TRAIN)


def q_ann_pq_index(spark, sf_dir):
    """Build-then-serve split of the PQ path: persist the compressed
    codes + codebooks, then answer the same ADC top-k from the store —
    must hash-match the on-the-fly pq_topk oracle."""
    import tempfile

    from maps_spark.sources.ann_index import (build_pq_index,
                                              query_pq_index)
    emb = _emb(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="maps-spark-pq-") + "/index"
    build_pq_index(emb, root, train_sample=PQ_TRAIN)
    return _detach(query_pq_index(spark, root,
                                  emb.where(F.col("vec_id") < 16)),
                   os.path.dirname(root))


def q_dedup_method_overlap(spark, sf_dir):
    from maps_spark.operators.dedup import dedup_method_overlap
    return dedup_method_overlap(_docs(spark, sf_dir),
                                hasher="reproducible")


def q_cluster_topics(spark, sf_dir):
    from maps_spark.operators.corpus import cluster_topics
    return cluster_topics(_docs(spark, sf_dir))


def q_bloom_contamination(spark, sf_dir):
    from maps_spark.operators import corpus as CP
    docs = _docs(spark, sf_dir)
    return CP.bloom_contamination(
        docs.where(F.col("doc_id") % BENCH_MOD != 0),
        docs.where(F.col("doc_id") % BENCH_MOD == 0))


def q_stratified_sample(spark, sf_dir):
    from maps_spark.operators import corpus as CP
    return CP.stratified_sample(_docs(spark, sf_dir), strata_col="lang",
                                n_per_stratum=20)


def q_doc_repetition(spark, sf_dir):
    from maps_spark.operators import text as TX
    return TX.repetition_signals(_docs(spark, sf_dir))


def q_tfidf_topk(spark, sf_dir):
    from maps_spark.operators import text as TX
    return TX.tf_idf(_docs(spark, sf_dir), top_k=5)


def q_corpus_top_ngrams(spark, sf_dir):
    from maps_spark.operators import corpus as CP
    return CP.top_ngrams(_docs(spark, sf_dir), n=2, k=50)


def q_vocab_build(spark, sf_dir):
    from maps_spark.operators import corpus as CP
    return CP.build_vocab(_docs(spark, sf_dir), min_count=2)


def q_pii_scrub(spark, sf_dir):
    from maps_spark.operators import text as TX
    return TX.pii_scrub(_docs(spark, sf_dir))


def q_curate_corpus(spark, sf_dir):
    from maps_spark.operators import corpus as CP
    return CP.curate_corpus(_docs(spark, sf_dir), hasher="reproducible")


def q_collocations(spark, sf_dir):
    from maps_spark.operators import corpus as CP
    return CP.collocations(_docs(spark, sf_dir))


def q_sentence_split(spark, sf_dir):
    from maps_spark.operators.text import sentence_split, synthesize_prose
    return sentence_split(synthesize_prose(_docs(spark, sf_dir)))


def q_readability(spark, sf_dir):
    from maps_spark.operators.text import readability, synthesize_prose
    return readability(synthesize_prose(_docs(spark, sf_dir)))


def q_novelty_score(spark, sf_dir):
    from maps_spark.operators import corpus as CP
    return CP.novelty_score(_docs(spark, sf_dir))


def q_cross_source_dups(spark, sf_dir):
    from maps_spark.operators import dedup as DD
    return DD.cross_source_dup_matrix(_docs(spark, sf_dir),
                                      hasher="reproducible")


def q_lm_score(spark, sf_dir):
    from maps_spark.operators import corpus as CP
    return CP.lm_score(_docs(spark, sf_dir))


def q_source_reputation(spark, sf_dir):
    from maps_spark.operators import corpus as CP
    return CP.source_stats(_docs(spark, sf_dir), keep_threshold=0.5)


PACK_BUDGET = 512


def q_pack_sequences(spark, sf_dir):
    from maps_spark.operators import packing as PK
    return PK.pack_sequences(_docs(spark, sf_dir), budget=PACK_BUDGET)


def q_pack_stats(spark, sf_dir):
    from maps_spark.operators import packing as PK
    return PK.pack_stats(
        PK.pack_sequences(_docs(spark, sf_dir), budget=PACK_BUDGET),
        budget=PACK_BUDGET)


def q_chunk_documents(spark, sf_dir):
    from maps_spark.operators import packing as PK
    return PK.chunk_documents(_docs(spark, sf_dir), chunk=64, stride=48)


def q_tokenize_docs(spark, sf_dir):
    from maps_spark.operators import corpus as CP
    docs = _docs(spark, sf_dir)
    return CP.tokenize_docs(docs, CP.build_vocab(docs, min_count=2))


def q_corpus_profile(spark, sf_dir):
    from maps_spark.operators import corpus as CP
    return CP.corpus_profile(_docs(spark, sf_dir))


def q_corpus_diff(spark, sf_dir):
    from maps_spark.operators import corpus as CP
    docs = _docs(spark, sf_dir)
    old = docs.where("doc_id % 7 <> 0")
    new = (docs.where("doc_id % 5 <> 0")
           .withColumn("text", F.when(F.col("doc_id") % 11 == 0,
                                      F.concat(F.col("text"), F.lit(" v2")))
                       .otherwise(F.col("text"))))
    return CP.corpus_diff(old, new)


def q_shard_assign(spark, sf_dir):
    from maps_spark.operators import packing as PK
    return PK.shard_assign(_docs(spark, sf_dir), n_shards=8)


def q_semantic_dedup(spark, sf_dir):
    from maps_spark.operators import similarity as SIM
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return SIM.semantic_dedup(emb, threshold=0.3)


MIX_WEIGHTS = {"src0": 0.4, "src1": 0.3, "src2": 0.2, "src3": 0.1}
MIX_BUDGET = 2_000
DSIR_TARGET = "lang = 'en'"
DSIR_N = 100


def q_bpe_merges(spark, sf_dir):
    from maps_spark.operators.bpe import train_bpe_distributed
    return train_bpe_distributed(_docs(spark, sf_dir), n_merges=4)


def q_bpe_tokenize(spark, sf_dir):
    """Was rows-only for seven rounds ("sequential merge loop is not
    SQL-expressible") — now hash-gated: the oracle replays encode_word
    as a RECURSIVE CTE over merges from the same unrolled trainer
    (one-merge-at-a-time is provably equivalent to batch BPE because
    pairs created by a merge always rank later)."""
    from maps_spark.operators.bpe import bpe_encode, train_bpe
    docs = _docs(spark, sf_dir)
    return bpe_encode(docs, train_bpe(docs, n_merges=100))


def q_doc_hash_vectors(spark, sf_dir):
    from maps_spark.operators.similarity import doc_vector_buckets
    return doc_vector_buckets(_docs(spark, sf_dir), dim=64)


def q_mix_plan(spark, sf_dir):
    from maps_spark.operators import mixture as MX
    return MX.mix_plan(_docs(spark, sf_dir), MIX_WEIGHTS, MIX_BUDGET)


def q_mix_sample(spark, sf_dir):
    from maps_spark.operators import mixture as MX
    return MX.mix_sample(_docs(spark, sf_dir), MIX_WEIGHTS, MIX_BUDGET)


def q_quality_tiers(spark, sf_dir):
    from maps_spark.operators import corpus as CP
    from maps_spark.operators.mixture import quality_tiers
    return quality_tiers(CP.lm_score(_docs(spark, sf_dir)),
                         "avg_nll_scaled", n_tiers=4)


def q_dsir_importance(spark, sf_dir):
    from maps_spark.operators import mixture as MX
    docs = _docs(spark, sf_dir)
    return MX.dsir_importance(docs, docs.where(DSIR_TARGET))


def q_dsir_select(spark, sf_dir):
    from maps_spark.operators import mixture as MX
    docs = _docs(spark, sf_dir)
    return MX.dsir_select(docs, docs.where(DSIR_TARGET), DSIR_N)


MAPS_QUERIES = {
    "occ_country_counts": q_occ_country_counts,
    "map_view_counts": q_map_view_counts,
    "pixel_agg_3857_z6": q_pixel_agg_3857_z6,
    "pixel_agg_4326_z6": q_pixel_agg_4326_z6,
    "pixel_agg_3575_z4": q_pixel_agg_3575_z4,
    "pixel_agg_3031_z4": q_pixel_agg_3031_z4,
    "streaming_refresh_pixels": q_streaming_refresh_pixels,
    "streaming_touch_join": q_streaming_touch_join,
    "pyramid_invariant": q_pyramid_invariant,
    "pyramid_invariant_3575": q_pyramid_invariant_3575,
    "points_invariant": q_points_invariant,
    "pyramid_rollup_z6_to_z2": q_pyramid_rollup_z6_to_z2,
    "pyramid_span_z6_to_z2": q_pyramid_span_z6_to_z2,
    "tile_assembly_3857_z2": q_tile_assembly_3857_z2,
    "tile_assembly_4326_z1": q_tile_assembly_4326_z1,
    "density_tile_simple": q_density_tile_simple,
    "density_tile_filtered": q_density_tile_filtered,
    "capabilities": q_capabilities,
    "lng_spread": q_lng_spread,
    "square_bin_z2": q_square_bin_z2,
    "hex_bin_z2": q_hex_bin_z2,
    "country_mask_z2": q_country_mask_z2,
    "hex_trend_z0": q_hex_trend_z0,
    "media_features": q_media_features,
    "media_frame_sample": q_media_frame_sample,
    "media_ppm_decode": q_media_ppm_decode,
    "media_dhash": q_media_dhash,
    "media_dhash_pairs": q_media_dhash_pairs,
    "media_png_decode": q_media_png_decode,
    "media_wav_decode": q_media_wav_decode,
    "media_wav_frames": q_media_wav_frames,
    "audio_fingerprints": q_audio_fingerprints,
    "audio_near_pairs": q_audio_near_pairs,
    "video_scene_cuts": q_video_scene_cuts,
    "media_video_decode": q_media_video_decode,
    "media_jpeg_decode": q_media_jpeg_decode,
    "media_jpeg_progressive": q_media_jpeg_progressive,
    "media_adpcm_decode": q_media_adpcm_decode,
    "media_mjpeg_decode": q_media_mjpeg_decode,
    "media_png_interlaced": q_media_png_interlaced,
    "media_gif_decode": q_media_gif_decode,
    "media_gif_interlaced": q_media_gif_interlaced,
    "media_gif_frames": q_media_gif_frames,
    "hot_keys": q_hot_keys,
    "geo_radius_pairs": q_geo_radius_pairs,
    "point_in_polygon": q_point_in_polygon,
    "polygon_metrics": q_polygon_metrics,
    "containment_pairs": q_containment_pairs,
    "event_anomalies": q_event_anomalies,
    "adhoc_grid_bounds_z5": q_adhoc_grid_bounds_z5,
    "adhoc_grid_centroid_z5": q_adhoc_grid_centroid_z5,
    "adhoc_tile_z2": q_adhoc_tile_z2,
    "year_facet": q_year_facet,
    "species_trend": q_species_trend,
    "point_locations": q_point_locations,
    "event_sessions": q_event_sessions,
    "event_adhoc_search": q_event_adhoc_search,
    "event_props_facet": q_event_props_facet,
    "event_crosstab": q_event_crosstab,
    "event_rollup": q_event_rollup,
    "top_events_per_user": q_top_events_per_user,
    "event_funnel": q_event_funnel,
    "user_distinct_sketch": q_user_distinct_sketch,
    "event_windows": q_event_windows,
    "attribution": q_attribution,
    "rolling_active_users": q_rolling_active,
    "time_gapfill": q_time_gapfill,
    "kmv_distinct": q_kmv_distinct,
    "kmv_overlap": q_kmv_overlap,
    "asof_join": q_asof_join,
    "range_join_sessions": q_range_join_sessions,
    "funnel_counts": q_funnel_counts,
    "cohort_retention": q_cohort_retention,
    "event_transitions": q_event_transitions,
    "session_paths": q_session_paths,
    # training-data pipeline
    "dedup_exact": q_dedup_exact,
    "dedup_prefix": q_dedup_prefix,
    "para_dedup": q_para_dedup,
    "para_clean": q_para_clean,
    "source_divergence": q_source_divergence,
    "dup_ngram_coverage": q_dup_ngram_coverage,
    "text_stats": q_text_stats,
    "lang_id": q_lang_id,
    "nb_classify": q_nb_classify,
    "classifier_eval": q_classifier_eval,
    "bm25_topk": q_bm25_topk,
    "link_pagerank": q_link_pagerank,
    "link_hits": q_link_hits,
    "frontier_candidates": q_frontier_candidates,
    "frontier_shards": q_frontier_shards,
    "robots_filter": q_robots_filter,
    "hybrid_rrf": q_hybrid_rrf,
    "expectation_report": q_expectation_report,
    "robots_parse": q_robots_parse,
    "sitemap_parse": q_sitemap_parse,
    "frontier_sitemap_merge": q_frontier_sitemap_merge,
    "redirect_resolve": q_redirect_resolve,
    "fetch_schedule": q_fetch_schedule,
    "recrawl_candidates": q_recrawl_candidates,
    "robots_v2_decisions": q_robots_v2_decisions,
    "fetch_timeline": q_fetch_timeline,
    "snapshot_drift": q_snapshot_drift,
    "snapshot_delta": q_snapshot_delta,
    "redirect_frontier": q_redirect_frontier,
    "numeric_drift": q_numeric_drift,
    "site_boilerplate": q_site_boilerplate,
    "site_clean_extract": q_site_clean_extract,
    "url_normalize": q_url_normalize,
    "url_canonical": q_url_canonical,
    "domain_reputation": q_domain_reputation,
    "dup_spans": q_dup_spans,
    "dup_span_stats": q_dup_span_stats,
    "scrub_dup_spans": q_scrub_dup_spans,
    "domain_cap": q_domain_cap,
    "grouped_split": q_grouped_split,
    "normalize_text": q_normalize_text,
    "html_extract": q_html_extract,
    "html_block_stats": q_html_block_stats,
    "html_meta": q_html_meta,
    "html_links": q_html_links,
    "anchor_texts": q_anchor_texts,
    "anchor_index": q_anchor_index,
    "link_stats": q_link_stats,
    "link_domain_counts": q_link_domain_counts,
    "embedding_profile": q_embedding_profile,
    "embedding_outliers": q_embedding_outliers,
    "token_count_bpe": q_token_count,
    "quality_score": q_quality_score,
    "ngram_jaccard_pairs": q_ngram_jaccard,
    "jaccard_prefix_pairs": q_jaccard_prefix,
    "ann_topk": q_ann_topk,
    "minhash_lsh_pairs": q_minhash_lsh,
    "minhash_verify": q_minhash_verify,
    "simhash_pairs": q_simhash_pairs,
    "embedding_near_dupes": q_embedding_near_dupes,
    "ann_lsh_topk": q_ann_lsh_topk,
    "ann_ivf_topk": q_ann_ivf_topk,
    "ann_ivf_index": q_ann_ivf_index,
    "ann_recall_ivf": q_ann_recall_ivf,
    "ann_recall_lsh": q_ann_recall_lsh,
    "ann_recall_index": q_ann_recall_index,
    "doc_fingerprint": q_doc_fingerprint,
    "winnow_fingerprints": q_winnow_fingerprints,
    "compression_signals": q_compression_signals,
    "lz_complexity": q_lz_complexity,
    "group_sample": q_group_sample,
    "negative_samples": q_negative_samples,
    "random_walks": q_random_walks,
    "skipgram_pairs": q_skipgram_pairs,
    "node2vec_walks": q_node2vec_walks,
    "quality_ensemble": q_quality_ensemble,
    "winnow_pairs": q_winnow_pairs,
    "winnow_contamination": q_winnow_contamination,
    "dedup_clusters": q_dedup_clusters,
    "soft_dedup_weights": q_soft_dedup_weights,
    "geo_radius_haversine": q_geo_radius_haversine,
    "weighted_sample": q_weighted_sample,
    "cms_counters": q_cms_counters,
    "event_cube": q_event_cube,
    "value_sketch": q_value_sketch,
    "conversion_latency_sketch": q_conversion_latency_sketch,
    "value_sketch_quantiles": q_value_sketch_quantiles,
    "cms_estimate": q_cms_estimate,
    "contamination": q_contamination,
    "bloom_contamination": q_bloom_contamination,
    "fuzzy_title_pairs": q_fuzzy_title_pairs,
    "spatial_zorder": q_spatial_zorder,
    "kmeans_clusters": q_kmeans_clusters,
    "pq_codes": q_pq_codes,
    "ann_pq_topk": q_ann_pq_topk,
    "ann_recall_pq": q_ann_recall_pq,
    "cluster_topics": q_cluster_topics,
    "ann_pq_index": q_ann_pq_index,
    "ann_ivfpq_topk": q_ann_ivfpq_topk,
    "dedup_method_overlap": q_dedup_method_overlap,
    "geohash_counts": q_geohash_counts,
    "stratified_sample": q_stratified_sample,
    "doc_repetition": q_doc_repetition,
    "tfidf_topk": q_tfidf_topk,
    "corpus_top_ngrams": q_corpus_top_ngrams,
    "vocab_build": q_vocab_build,
    "pii_scrub": q_pii_scrub,
    "curate_corpus": q_curate_corpus,
    "lm_score": q_lm_score,
    "collocations": q_collocations,
    "sentence_split": q_sentence_split,
    "readability": q_readability,
    "novelty_score": q_novelty_score,
    "cross_source_dups": q_cross_source_dups,
    "source_reputation": q_source_reputation,
    "pack_sequences": q_pack_sequences,
    "pack_stats": q_pack_stats,
    "chunk_documents": q_chunk_documents,
    "tokenize_docs": q_tokenize_docs,
    "corpus_profile": q_corpus_profile,
    "corpus_diff": q_corpus_diff,
    "semantic_dedup": q_semantic_dedup,
    "shard_assign": q_shard_assign,
    "bpe_tokenize": q_bpe_tokenize,
    "bpe_merges": q_bpe_merges,
    "doc_hash_vectors": q_doc_hash_vectors,
    "mix_plan": q_mix_plan,
    "mix_sample": q_mix_sample,
    "quality_tiers": q_quality_tiers,
    "dsir_importance": q_dsir_importance,
    "dsir_select": q_dsir_select,
}


def _url_canonical_oracle() -> str:
    from maps_spark.operators.html import canon_href_sql
    return f"""WITH messy AS (
  SELECT doc_id, 0 AS variant,
         'http://t' || CAST(doc_id % 4 AS VARCHAR)
         || '.example/p/' || CAST(doc_id AS VARCHAR)
         || '?utm_source=feed&id=' || CAST(doc_id AS VARCHAR)
         || '&utm_medium=rss' AS href
  FROM documents
  UNION ALL
  SELECT doc_id, 1,
         'HTTPS://T.Example:443/q?gclid=abc' || CAST(doc_id AS VARCHAR)
  FROM documents
  UNION ALL
  SELECT doc_id, 2,
         '/rel/' || CAST(doc_id AS VARCHAR) || '?a=1&fbclid=zz&b=2'
  FROM documents
  UNION ALL
  SELECT doc_id, 3,
         'http://plain' || CAST(doc_id % 3 AS VARCHAR)
         || '.example/x?keep=' || CAST(doc_id AS VARCHAR)
  FROM documents)
SELECT doc_id, CAST(variant AS INT) AS variant, href,
       {canon_href_sql('href')} AS canon_href
FROM messy"""


def _url_normalize_oracle() -> str:
    from maps_spark.operators.html import norm_url_sql
    return f"""WITH messy AS (
  SELECT doc_id, 0 AS variant,
         'HTTP://Site' || CAST(doc_id % 5 AS VARCHAR)
         || '.Example:80/p/' || CAST(doc_id AS VARCHAR)
         || '?q=1#frag' AS href
  FROM documents
  UNION ALL
  SELECT doc_id, 1,
         'HTTPS://Host' || CAST(doc_id % 3 AS VARCHAR)
         || '.example:443#x'
  FROM documents
  UNION ALL
  SELECT doc_id, 2, '/rel/' || CAST(doc_id AS VARCHAR) || '#frag'
  FROM documents)
SELECT doc_id, CAST(variant AS INT) AS variant, href,
       {norm_url_sql('href')} AS norm_href
FROM messy"""


def _pagerank_oracle() -> str:
    from maps_spark.operators.graph import pagerank_select
    from maps_spark.operators.html import site_domain_edges_select
    pr = pagerank_select(site_domain_edges_select())
    return f"""WITH pr AS ({pr})
SELECT node AS domain, rank_scaled FROM pr"""


def _hits_oracle() -> str:
    from maps_spark.operators.graph import hits_select
    from maps_spark.operators.html import site_domain_edges_select
    return hits_select(site_domain_edges_select())


def _bm25_oracle() -> str:
    from maps_spark.operators.retrieval import (GATE_K, GATE_N_QUERIES,
                                                GATE_Q_WORDS,
                                                bm25_topk_select)
    return bm25_topk_select(k=GATE_K, n_queries=GATE_N_QUERIES,
                            q_words=GATE_Q_WORDS)


def _html_oracle(which: str) -> str:
    from maps_spark.operators import html as H
    return {"extract": H.html_extract_select,
            "meta": H.html_meta_select,
            "anchors": H.extract_anchors_select,
            "anchor_index": H.anchor_text_index_select,
            "domain_reputation": H.domain_reputation_select,
            "frontier": H.frontier_candidates_select,
            "frontier_shards": H.frontier_shards_select,
            "robots": H.robots_filter_select,
            "site_bp": H.site_boilerplate_select,
            "site_clean": H.extract_site_clean_select,
            "block_stats": H.html_block_stats_select,
            "links": H.html_links_select,
            "link_stats": H.link_stats_select,
            "domain_counts": H.link_domain_counts_select}[which]()


def _expectation_oracle() -> str:
    from maps_spark.operators.expectations import \
        expectation_report_select
    return expectation_report_select()


def _snapshot_drift_oracle() -> str:
    from maps_spark.operators.expectations import snapshot_drift_select
    return snapshot_drift_select()


def _numeric_drift_oracle() -> str:
    from maps_spark.operators.expectations import numeric_drift_select
    return numeric_drift_select()


def _hybrid_rrf_oracle() -> str:
    from maps_spark.operators.retrieval import hybrid_rrf_select
    return hybrid_rrf_select()


def _crawl_oracle(which: str) -> str:
    from maps_spark.operators import crawl as CR
    return {"robots_parse": CR.robots_parse_select,
            "sitemap_parse": CR.sitemap_parse_select,
            "frontier_sitemap": CR.frontier_sitemap_merge_select,
            "redirect_resolve": CR.redirect_resolve_select,
            "fetch_schedule": CR.fetch_schedule_select,
            "recrawl_candidates": CR.recrawl_candidates_select,
            "robots_v2_decisions": CR.robots_v2_select,
            "fetch_timeline": CR.fetch_timeline_select,
            "redirect_frontier": CR.redirect_frontier_select}[which]()


def _pip_oracle() -> str:
    from maps_spark.operators.binning import point_in_polygon_select
    from maps_spark.sources.occurrence import occurrence_cte
    return (occurrence_cte() + """,
pts AS (SELECT occurrenceId AS id,
         CAST(round(decimalLongitude * 1000000) AS BIGINT) AS px,
         CAST(round(decimalLatitude * 1000000) AS BIGINT) AS py
        FROM occ),
""" + point_in_polygon_select(24))


def maps_oracles() -> dict[str, str]:
    from maps_spark.sql import oracle as O
    from maps_spark.sql import oracle_training as OT
    from maps_spark.operators import expectations as EX
    from maps_spark.operators import graph as GR
    from maps_spark.operators import corpus as CO
    from maps_spark.operators import sessions as SN
    return {
        "occ_country_counts": O.occ_country_counts_select(),
        "map_view_counts": O.map_view_counts_select(),
        "pixel_agg_3857_z6": O.pixel_select("EPSG:3857", 6, PIXEL_VIEWS),
        "pixel_agg_4326_z6": O.pixel_select("EPSG:4326", 6, PIXEL_VIEWS),
        "streaming_refresh_pixels": O.pixel_select("EPSG:3857", 6, None),
        "streaming_touch_join": """WITH ev AS (
  SELECT event_id, user_id, event_type, epoch_us(ts) AS tus
  FROM events),
conv AS (SELECT user_id, event_id AS conversion_id, tus AS conv_tus
         FROM ev WHERE event_type = 'purchase'),
touch AS (SELECT user_id AS t_user, event_id AS touch_id,
                 event_type AS touch_type, tus AS touch_tus
          FROM ev WHERE event_type IN ('click', 'view'))
SELECT conversion_id, user_id, conv_tus, touch_id, touch_type,
       touch_tus, conv_tus - touch_tus AS lag_us
FROM conv JOIN touch ON user_id = t_user
  AND touch_tus <= conv_tus
  AND touch_tus >= conv_tus - 21600000000""",
        "pyramid_invariant": O.pyramid_invariant_select(
            "EPSG:3857", max_zoom=4, threshold=500),
        "pyramid_invariant_3575": O.pyramid_invariant_select(
            "EPSG:3575", max_zoom=4, threshold=500),
        "points_invariant": O.points_invariant_select(threshold=500),
        "pyramid_rollup_z6_to_z2": O.rollup_select("EPSG:3857", 6, 2,
                                                   ROLLUP_VIEWS),
        "pyramid_span_z6_to_z2": O.rollup_select("EPSG:3857", 6, 2,
                                                 ROLLUP_VIEWS),
        "tile_assembly_3857_z2": O.tile_assembly_select("EPSG:3857", 2,
                                                        ASSEMBLY_VIEWS),
        "tile_assembly_4326_z1": O.tile_assembly_select("EPSG:4326", 1,
                                                        ROLLUP_VIEWS),
        "density_tile_simple": O.density_tile_select(
            "EPSG:3857", 1, 1, 0, "0:0"),
        "density_tile_filtered": O.density_tile_select(
            "EPSG:3857", 1, 1, 0, "0:0", year_lo=1900, year_hi=1980,
            bors=["HUMAN_OBSERVATION", "OBSERVATION"], verbose=True),
        "capabilities": O.capabilities_select(),
        "lng_spread": O.lng_spread_select("4:NATION_17"),
        "square_bin_z2": O.square_bin_select("EPSG:3857", 2, 1, 1, "0:0"),
        "hex_bin_z2": O.hex_bin_select("EPSG:3857", 2, 1, 1, "0:0"),
        "country_mask_z2": O.country_mask_select("EPSG:3857", 2, 1, 1,
                                                 "0:0", "4:NATION_17"),
        "hex_trend_z0": O.hex_trend_select("EPSG:3857", 0, 0, 0,
                                           "1:c0|g8", "1:c0|f2"),
        "adhoc_grid_bounds_z5": O.adhoc_grid_select(5, "bounds"),
        "adhoc_grid_centroid_z5": O.adhoc_grid_select(5, "centroid"),
        "adhoc_tile_z2": O.adhoc_grid_select(
            8, "bounds", T.tile_boundary("EPSG:3857", 2, 1, 1, 0.125)),
        "year_facet": O.year_facet_select(),
        "point_locations": O.point_locations_select("3:"),
        "event_sessions": __import__(
            "maps_spark.operators.sessions",
            fromlist=["sessionize_sql"]).sessionize_sql(),
        "event_adhoc_search": O.event_adhoc_select(
            ("click", "view"), 2024, 2024),
        "event_props_facet": OT.event_props_facet_select(),
        "event_crosstab": OT.event_type_crosstab_select(),
        "event_rollup": OT.event_rollup_select(),
        "top_events_per_user": OT.top_events_per_user_select(k=3),
        "event_funnel": OT.funnel_stages_select(),
        "user_distinct_sketch": OT.user_distinct_sketch_select(),
        "event_windows": OT.event_windows_select(),
        "attribution": OT.attribute_conversions_select(),
        "rolling_active_users": OT.rolling_active_users_select(),
        "time_gapfill": SN.time_gapfill_select(bucket_s=3600),
        "kmv_distinct": SN.kmv_sketch_select(k=64),
        "kmv_overlap": SN.kmv_overlap_select(k=64),
        "asof_join": OT.asof_join_select(),
        "range_join_sessions": OT.session_events_range_select(),
        "funnel_counts": OT.funnel_counts_select(),
        "cohort_retention": OT.cohort_retention_select(),
        "event_transitions": OT.event_transitions_select(
            gap_us=__import__(
                "maps_spark.operators.sessions",
                fromlist=["GAP_US_DEFAULT"]).GAP_US_DEFAULT),
        "session_paths": OT.session_paths_select(
            gap_us=__import__(
                "maps_spark.operators.sessions",
                fromlist=["GAP_US_DEFAULT"]).GAP_US_DEFAULT),
        "species_trend": O.species_trend_select(TREND_SPECIES, TREND_GROUP),
        "pixel_agg_3575_z4": O.pixel_select("EPSG:3575", 4, ["0:0"]),
        "pixel_agg_3031_z4": O.pixel_select("EPSG:3031", 4, ["0:0"]),
        "dedup_exact": OT.dedup_exact_select(),
        "dedup_prefix": OT.dedup_prefix_select(n_tokens=10),
        "para_dedup": OT.para_dedup_select(),
        "para_clean": OT.para_clean_select(),
        "source_divergence": OT.source_divergence_select(),
        "dup_ngram_coverage": OT.dup_ngram_coverage_select(k=8),
        "text_stats": OT.text_stats_select(),
        "lang_id": OT.lang_id_select(),
        "nb_classify": OT.nb_classify_select(),
        "classifier_eval": OT.classifier_eval_select(),
        "bm25_topk": _bm25_oracle(),
        "link_pagerank": _pagerank_oracle(),
        "link_hits": _hits_oracle(),
        "frontier_candidates": _html_oracle("frontier"),
        "frontier_shards": _html_oracle("frontier_shards"),
        "robots_filter": _html_oracle("robots"),
        "hybrid_rrf": _hybrid_rrf_oracle(),
        "expectation_report": _expectation_oracle(),
        "robots_parse": _crawl_oracle("robots_parse"),
        "sitemap_parse": _crawl_oracle("sitemap_parse"),
        "frontier_sitemap_merge": _crawl_oracle("frontier_sitemap"),
        "redirect_resolve": _crawl_oracle("redirect_resolve"),
        "fetch_schedule": _crawl_oracle("fetch_schedule"),
        "recrawl_candidates": _crawl_oracle("recrawl_candidates"),
        "robots_v2_decisions": _crawl_oracle("robots_v2_decisions"),
        "fetch_timeline": _crawl_oracle("fetch_timeline"),
        "snapshot_drift": _snapshot_drift_oracle(),
        "snapshot_delta": EX.keyed_delta_select(),
        "redirect_frontier": _crawl_oracle("redirect_frontier"),
        "numeric_drift": _numeric_drift_oracle(),
        "site_boilerplate": _html_oracle("site_bp"),
        "site_clean_extract": _html_oracle("site_clean"),
        "url_normalize": _url_normalize_oracle(),
        "url_canonical": _url_canonical_oracle(),
        "domain_reputation": _html_oracle("domain_reputation"),
        "dup_spans": OT.dup_spans_select(),
        "dup_span_stats": OT.dup_span_stats_select(),
        "scrub_dup_spans": OT.scrub_dup_spans_select(),
        "domain_cap": OT.domain_cap_select(cap=20),
        "grouped_split": OT.grouped_split_select(val_frac=0.2),
        "normalize_text": OT.normalize_text_select(),
        "html_extract": _html_oracle("extract"),
        "html_block_stats": _html_oracle("block_stats"),
        "html_meta": _html_oracle("meta"),
        "html_links": _html_oracle("links"),
        "anchor_texts": _html_oracle("anchors"),
        "anchor_index": _html_oracle("anchor_index"),
        "link_stats": _html_oracle("link_stats"),
        "link_domain_counts": _html_oracle("domain_counts"),
        "embedding_profile": OT.embedding_profile_select(),
        "embedding_outliers": OT.embedding_outliers_select(),
        "token_count_bpe": OT.token_count_select(),
        "quality_score": OT.quality_score_select(),
        "ngram_jaccard_pairs": OT.ngram_jaccard_select(threshold=0.25),
        "jaccard_prefix_pairs": OT.jaccard_prefix_select(threshold=0.25),
        "ann_topk": OT.ann_topk_select(k=10, n_queries=16),
        "minhash_lsh_pairs": OT.minhash_lsh_select(),
        "minhash_verify": OT.minhash_verify_select(threshold=0.25),
        "ann_lsh_topk": OT.ann_lsh_select(k=10, n_queries=16),
        "ann_ivf_topk": OT.ann_ivf_select(k=10, n_queries=16,
                                          n_clusters=16, n_probe=4),
        "ann_ivf_index": OT.ann_ivf_select(k=10, n_queries=16,
                                           n_clusters=16, n_probe=4),
        "ann_recall_ivf": OT.ann_recall_select(k=10, n_queries=16,
                                               method="ivf"),
        "ann_recall_lsh": OT.ann_recall_select(k=10, n_queries=16,
                                               method="lsh"),
        "ann_recall_index": OT.ann_recall_select(k=10, n_queries=16,
                                                 method="ivf"),
        "embedding_near_dupes": OT.embedding_near_dupes_select(
            threshold=0.3),
        "simhash_pairs": OT.simhash_pairs_select(),
        "doc_fingerprint": OT.doc_fingerprint_select(),
        "winnow_fingerprints": OT.winnow_fingerprints_select(),
        "quality_ensemble": OT.quality_ensemble_select(
            {"n_tokens": 600_000, "n_stopwords": 400_000}),
        "soft_dedup_weights": OT.soft_dedup_weights_select(),
        "weighted_sample": OT.weighted_sample_select(rate=0.5),
        "cms_counters": OT.cms_build_select(),
        "event_cube": OT.event_cube_select(),
        "value_sketch": OT.value_sketch_select(),
        "conversion_latency_sketch":
            OT.conversion_latency_sketch_select(),
        "value_sketch_quantiles": OT.sketch_quantiles_select(
            [0.5, 0.9, 0.99]),
        "cms_estimate": OT.cms_estimate_select(max_key=128),
        "winnow_pairs": OT.winnow_pairs_select(),
        "winnow_contamination": OT.winnow_contamination_select(
            bench_mod=BENCH_MOD),
        "dedup_clusters": OT.dedup_clusters_select(threshold=0.25),
        "contamination": OT.contamination_select(bench_mod=BENCH_MOD),
        "bloom_contamination": OT.bloom_contamination_select(
            bench_mod=BENCH_MOD),
        "fuzzy_title_pairs": OT.fuzzy_pairs_select(),
        "spatial_zorder": O.spatial_zorder_select(z=8),
        "kmeans_clusters": OT.kmeans_assign_select(),
        "pq_codes": OT.pq_codes_select(train_limit=PQ_TRAIN),
        "ann_pq_topk": OT.pq_topk_select(n_queries=16,
                                         train_limit=PQ_TRAIN),
        "ann_recall_pq": OT.ann_recall_pq_select(
            k=10, n_queries=16, train_limit=PQ_TRAIN),
        "cluster_topics": OT.cluster_topics_select(),
        # the serving gate reuses the in-memory PQ oracle: a hash
        # match proves the persisted codes/codebooks round-trip is
        # lossless (same pattern as ann_ivf_index)
        "ann_pq_index": OT.pq_topk_select(n_queries=16,
                                          train_limit=PQ_TRAIN),
        "ann_ivfpq_topk": OT.ivfpq_topk_select(
            n_queries=16, pq_train_limit=PQ_TRAIN),
        "dedup_method_overlap": OT.dedup_method_overlap_select(),
        "geohash_counts": O.geohash_counts_select(precision=4),
        "stratified_sample": OT.stratified_sample_select(),
        "doc_repetition": OT.repetition_select(),
        "tfidf_topk": OT.tf_idf_select(top_k=5),
        "corpus_top_ngrams": OT.top_ngrams_select(n=2, k=50),
        "vocab_build": OT.build_vocab_select(min_count=2),
        "pii_scrub": OT.pii_scrub_select(),
        "curate_corpus": OT.curate_corpus_select(),
        "lm_score": OT.lm_score_select(),
        "collocations": OT.collocations_select(),
        "bpe_merges": OT.bpe_merges_select(n_merges=4),
        "bpe_tokenize": OT.bpe_tokenize_select(n_merges=100),
        "geo_radius_haversine": OT.radius_haversine_select(25.0),
        "lz_complexity": OT.lz_complexity_select(),
        "group_sample": CO.group_sample_select(k=20),
        "negative_samples": OT.negative_samples_select(k=4),
        "skipgram_pairs": ("SELECT center, context, dist, "
            "CAST(count(*) AS BIGINT) AS n_pairs FROM ("
            + GR.skipgram_pairs_select(
                """SELECT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
  UNION ALL
  SELECT l_suppkey * 2 + 1, o_custkey * 2
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey""", walk_len=5,
                walks_per_node=2, window=2)
            + ") GROUP BY 1, 2, 3"),
        "node2vec_walks": GR.node2vec_walks_select(
            """SELECT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
  UNION ALL
  SELECT l_suppkey * 2 + 1, o_custkey * 2
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey""", walk_len=4,
            walks_per_node=2),
        "random_walks": GR.random_walks_select(
            """SELECT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
  UNION ALL
  SELECT l_suppkey * 2 + 1, o_custkey * 2
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey""", walk_len=5,
            walks_per_node=2),
        "sentence_split": OT.sentence_split_select(),
        "readability": OT.readability_select(),
        "novelty_score": OT.novelty_score_select(),
        "cross_source_dups": OT.cross_source_dup_select(),
        "source_reputation": OT.source_stats_select(keep_threshold=0.5),
        "pack_sequences": OT.pack_sequences_select(budget=PACK_BUDGET),
        "pack_stats": OT.pack_stats_select(budget=PACK_BUDGET),
        "chunk_documents": OT.chunk_documents_select(chunk=64, stride=48),
        "tokenize_docs": OT.tokenize_docs_select(min_count=2),
        "corpus_profile": OT.corpus_profile_select(),
        "corpus_diff": OT.corpus_diff_select(),
        "media_frame_sample": OT.media_frame_sample_select(),
        "media_ppm_decode": OT.ppm_channel_sums_select(n=64),
        "media_dhash": OT.media_dhash_select(n=64),
        "media_dhash_pairs": OT.media_dhash_pairs_select(n=64),
        # same closed-form oracle as PPM: pixels are the same gradient,
        # only the container codec differs (31x17 stresses odd strides)
        "media_png_decode": OT.ppm_channel_sums_select(
            n=64, width=31, height=17),
        # Adam7 stores the SAME pixels in pass order; the shared
        # closed form proves the scatter reassembly
        "media_png_interlaced": OT.ppm_channel_sums_select(
            n=64, width=31, height=17),
        # LZW expansion must read every pixel at its coordinate; the
        # interlaced twin additionally proves the 4-pass reassembly
        "media_gif_decode": OT.gif_channel_sums_select(n=64),
        "media_gif_interlaced": OT.gif_coord_sums_select(n=64),
        "media_gif_frames": OT.gif_frame_sums_select(n=64),
        "media_wav_decode": OT.wav_stats_select(n=64),
        "media_wav_frames": OT.wav_frame_features_select(n=64),
        "audio_fingerprints": OT.audio_fingerprint_select(n=64),
        "audio_near_pairs": OT.audio_near_pairs_select(n=64),
        "video_scene_cuts": OT.scene_cuts_select(n=64),
        "media_video_decode": OT.y4m_frame_sums_select(n=64),
        "media_jpeg_decode": OT.jpeg_pixel_sums_select(n=64),
        # progressive coder quantizes through the same _quantize_block,
        # so the flat-block closed form is shared with the baseline gate
        "media_jpeg_progressive": OT.jpeg_pixel_sums_select(n=64),
        "media_adpcm_decode": OT.adpcm_stats_select(n=64),
        "media_mjpeg_decode": OT.mjpeg_frame_sums_select(n=64),
        "hot_keys": OT.hot_keys_select(k=20),
        "geo_radius_pairs": OT.radius_pairs_select(0.5),
        "point_in_polygon": _pip_oracle(),
        "polygon_metrics": B.polygon_metrics_select(24),
        "containment_pairs": OT.containment_pairs_select(threshold=0.5),
        "event_anomalies": OT.event_anomalies_select(),
        "media_features": OT.media_features_select(),
        "semantic_dedup": OT.semantic_dedup_select(threshold=0.3),
        "shard_assign": OT.shard_assign_select(n_shards=8),
        "doc_hash_vectors": OT.doc_vector_buckets_select(dim=64),
        "mix_plan": OT.mix_plan_select(MIX_WEIGHTS, MIX_BUDGET),
        "mix_sample": OT.mix_sample_select(MIX_WEIGHTS, MIX_BUDGET),
        "quality_tiers": OT.quality_tiers_select(n_tiers=4),
        "dsir_importance": OT.dsir_importance_select(DSIR_TARGET),
        "dsir_select": OT.dsir_select_select(DSIR_TARGET, DSIR_N),
    }
