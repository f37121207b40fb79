"""Multimodal column plumbing: image/audio/video as opaque binary.

The Spark-side contract for a 100 TB multimodal pipeline: media rides in
``binary`` columns with typed metadata structs; decode/feature steps are
Arrow-batched ``mapInPandas`` stages so bytes never round-trip through
Python row objects. The actual codecs (PIL/ffmpeg/...) are not in this
container, so the decode kernels are STUBBED — deterministic fakes
clearly marked below — while the engine-side plumbing (schemas,
batching, partition sizing, UDF signatures) is real and tested.

Partitioning note: media tables should be written with
``maxRecordsPerFile`` tuned so row groups stay ~128 MB despite wide
binary cells; the synthesize helper models that.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

MEDIA_SCHEMA = ("media_id long, kind string, payload binary, "
                "width int, height int, sample_rate int, n_frames int")

FEATURE_SCHEMA = ("media_id long, kind string, feat array<float>, "
                  "decode_ok boolean")


def synthesize_media(spark: SparkSession, n: int = 64,
                     partitions: int = 4) -> DataFrame:
    """Deterministic fake media table (binary payload + typed metadata)."""
    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf["id"].to_numpy()
            kinds = np.where(ids % 3 == 0, "image",
                             np.where(ids % 3 == 1, "audio", "video"))
            # payload = repeated sha256 digest: opaque binary that any
            # engine with a sha256 builtin can re-derive, so the decode
            # stub downstream is cross-engine verifiable (DuckDB oracle)
            payloads = [hashlib.sha256(f"media-{i}".encode()).digest() * 32
                        for i in ids]
            yield pd.DataFrame({
                "media_id": ids, "kind": kinds, "payload": payloads,
                "width": np.where(kinds == "image", 640, 0),
                "height": np.where(kinds == "image", 480, 0),
                "sample_rate": np.where(kinds == "audio", 16000, 0),
                "n_frames": np.where(kinds == "video", 300, 0),
            })

    return (spark.range(n).repartition(partitions)
            .mapInPandas(gen, MEDIA_SCHEMA))


def _decode_image(payload: bytes, width: int, height: int) -> np.ndarray:
    """STUB: real implementation would be PIL/turbojpeg decode + resize.

    Raises NotImplementedError if real decoding is requested; the
    deterministic fake derives a pseudo-"pixel" array from the payload
    hash so downstream shapes/aggregations are exercised honestly. The
    hash runs over the payload's hex text (not raw bytes) so the value
    is reproducible in SQL engines whose sha256 builtin is string-only.
    """
    digest = hashlib.sha256(payload.hex().encode()).digest()
    arr = np.frombuffer((digest * ((width * 3 // len(digest)) + 1))
                        [: width * 3], dtype=np.uint8)
    return arr.astype(np.float32) / 255.0


def extract_features(media: DataFrame, feat_dim: int = 32) -> DataFrame:
    """Decode + feature-extract as a single mapInPandas stage.

    Real pipelines put the expensive decode here precisely because
    mapInPandas streams Arrow batches — no collect, no driver traffic,
    and the stage scales with input partitions.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            oks = []
            for payload, w, h in zip(pdf["payload"], pdf["width"],
                                     pdf["height"]):
                try:
                    raw = _decode_image(bytes(payload), max(int(w), 16),
                                        max(int(h), 16))
                    vec = np.resize(raw, feat_dim).astype(np.float32)
                    feats.append(vec)
                    oks.append(True)
                except NotImplementedError:
                    feats.append(np.zeros(feat_dim, dtype=np.float32))
                    oks.append(False)
            yield pd.DataFrame({"media_id": pdf["media_id"],
                                "kind": pdf["kind"],
                                "feat": feats, "decode_ok": oks})

    return media.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled frame
    index (the decode itself is the stub above)."""
    vids = media.where(F.col("kind") == "video")
    return (vids.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1,
                             F.lit(every_n))).alias("frame_idx")))
