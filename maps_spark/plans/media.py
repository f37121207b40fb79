"""The media-curation driver: raw media binaries -> deduplicated
feature store, end to end — the multimodal counterpart of
:mod:`maps_spark.plans.training` (same versioned-build / manifest-swap
lifecycle, reusing the tile store's manifest helpers).

Pipeline (each stage is an engine operator tested on its own; this
driver only composes them):

1. **decode + features** — :func:`operators.multimodal
   .extract_image_features` runs the REAL codecs (PPM/PNG via
   magic-byte dispatch) in one Arrow-batched ``mapInPandas`` stage;
   undecodable payloads get ``decode_ok = false``, they are counted
   and dropped, never crash the run.
2. **near-dup** — :func:`operators.similarity.embedding_near_dupes`
   over the feature vectors (bucketed candidate generation, exact
   cosine verify) marks visually-duplicate media; lowest media_id per
   duplicate pair survives (the SemDeDup keep rule applied to pixels).
3. **store** — survivors write as a feature table partitioned for
   downstream ANN indexing (:mod:`maps_spark.sources.ann_index` can
   build directly over it).

The manifest records the funnel (media in -> decoded -> kept) so a
run is auditable; ``versioned=True`` builds into
``out_root/builds/<ts>/`` with atomic manifest swap + keep-2 rotation.

At 100 TB the expensive stage is the decode — it scales with input
partitions and never leaves the executor (Arrow batches, no
driver traffic); the dedup stage works on feature vectors (a few
hundred bytes each), not pixels.
"""

from __future__ import annotations

import time

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from maps_spark.sources.tile_store import (finalise_build, read_manifest,
                                           write_manifest)


def run_media_curation(spark: SparkSession, media: DataFrame,
                       out_root: str, grid: int = 3,
                       dup_threshold: float = 0.995,
                       max_bucket: int = 256,
                       versioned: bool = True,
                       keep_builds: int = 2) -> dict:
    """Run decode -> features -> near-dup -> feature store; returns
    the manifest dict. ``media`` follows MEDIA_SCHEMA (binary payload
    + typed metadata)."""
    from maps_spark.operators.multimodal import extract_image_features
    from maps_spark.operators.similarity import embedding_near_dupes

    t0 = time.time()
    build_id = time.strftime("%Y%m%d_%H%M%S") if versioned else None
    out_dir = f"{out_root}/builds/{build_id}" if versioned else out_root

    n_in = media.count()
    feats = extract_image_features(media, grid=grid).localCheckpoint()
    decoded = feats.where(F.col("decode_ok"))
    n_decoded = decoded.count()

    vecs = decoded.select(F.col("media_id").alias("vec_id"),
                          F.col("feat").alias("embedding"))
    pairs = embedding_near_dupes(vecs, threshold=dup_threshold,
                                 dim=3 + grid * grid * 3,
                                 max_bucket=max_bucket)
    # keep rule: the lower id of every near-dup pair survives; any
    # media that appears as the HIGHER id of a pair drops
    drops = (pairs.select(F.greatest("doc_a", "doc_b").alias("media_id"))
             .distinct())
    kept = decoded.join(drops, "media_id", "left_anti")
    n_kept = kept.count()

    (kept.repartition("kind")
     .write.mode("overwrite").partitionBy("kind")
     .parquet(f"{out_dir}/features"))

    manifest = {
        "stage": "media_curation", "grid": grid,
        "dup_threshold": dup_threshold,
        "funnel": {"media_in": int(n_in), "decoded": int(n_decoded),
                   "undecodable": int(n_in - n_decoded),
                   "kept": int(n_kept),
                   "near_dups_dropped": int(n_decoded - n_kept)},
        "build_sec": round(time.time() - t0, 2),
    }
    if versioned:
        finalise_build(out_root, build_id, manifest, keep=keep_builds)
    else:
        write_manifest(out_root, manifest)
    return read_manifest(out_root)


def read_media_features(spark: SparkSession, out_root: str) -> DataFrame:
    """The active build's feature table (resolved through the manifest
    pointer, like the tile store)."""
    from maps_spark.sources.tile_store import resolve_root
    return spark.read.parquet(f"{resolve_root(out_root)}/features")
