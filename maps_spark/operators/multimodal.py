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


# -- real codec path: PPM (P6) ------------------------------------------
# Compressed codecs (JPEG/PNG/ffmpeg) stay stubbed — their decoders are
# not in this container. Uncompressed P6 PPM needs only numpy, so this
# path is REAL: header parse, pixel decode, resize, features.

def encode_ppm(arr: np.ndarray) -> bytes:
    """P6 PPM bytes from a (h, w, 3) uint8 array."""
    h, w = arr.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + \
        np.ascontiguousarray(arr, dtype=np.uint8).tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """REAL image decode for binary P6 PPM: returns (h, w, 3) uint8.
    Raises ValueError on malformed input (truncated pixel data,
    non-255 maxval, bad header)."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    # header = magic + 3 whitespace-separated ints (comments allowed)
    fields: list[bytes] = []
    i = 2
    while len(fields) < 3:
        while i < len(payload) and payload[i:i + 1].isspace():
            i += 1
        if payload[i:i + 1] == b"#":  # comment to end of line
            while i < len(payload) and payload[i:i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j:j + 1].isspace():
            j += 1
        fields.append(payload[i:j])
        i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = (int(f) for f in fields)
    if maxval != 255:
        raise ValueError(f"unsupported maxval {maxval}")
    data = payload[i:i + w * h * 3]
    if len(data) != w * h * 3:
        raise ValueError("truncated pixel data")
    return np.frombuffer(data, dtype=np.uint8).reshape(h, w, 3)


def resize_nearest(arr: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbour resize, pure numpy index maps."""
    h, w = arr.shape[:2]
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return arr[ys][:, xs]


def synthesize_ppm_media(spark: SparkSession, n: int = 64,
                         width: int = 32, height: int = 24,
                         partitions: int = 4) -> DataFrame:
    """Media table whose payloads are REAL P6 images (deterministic
    per-id gradients), exercising the true decode path end-to-end."""
    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for i in pdf["id"]:
                yy, xx = np.mgrid[0:height, 0:width]
                img = np.stack([
                    (xx * 255 // max(width - 1, 1)),
                    (yy * 255 // max(height - 1, 1)),
                    np.full_like(xx, int(i) % 256),
                ], axis=-1).astype(np.uint8)
                rows.append(encode_ppm(img))
            yield pd.DataFrame({
                "media_id": pdf["id"], "kind": "image",
                "payload": rows,
                "width": width, "height": height,
                "sample_rate": 0, "n_frames": 0})

    return (spark.range(n).repartition(partitions)
            .mapInPandas(gen, MEDIA_SCHEMA))


def extract_image_features(media: DataFrame, grid: int = 3) -> DataFrame:
    """REAL feature extraction over P6 payloads: decode, per-channel
    means, and a ``grid x grid`` nearest-resized thumbnail — all in one
    Arrow-batched mapInPandas stage (bytes never cross into Python row
    objects). Non-PPM payloads yield decode_ok = false with a zero
    vector, mirroring :func:`extract_features`' stub contract.

    feat layout: [mean_r, mean_g, mean_b, grid*grid*3 thumbnail].
    """
    dim = 3 + grid * grid * 3

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, oks = [], []
            for payload in pdf["payload"]:
                try:
                    img = decode_ppm(bytes(payload))
                    thumb = resize_nearest(img, grid, grid)
                    vec = np.concatenate([
                        img.reshape(-1, 3).mean(axis=0),
                        thumb.astype(np.float64).ravel(),
                    ]).astype(np.float32) / 255.0
                    feats.append(vec)
                    oks.append(True)
                except ValueError:
                    feats.append(np.zeros(dim, dtype=np.float32))
                    oks.append(False)
            yield pd.DataFrame({"media_id": pdf["media_id"],
                                "kind": pdf["kind"],
                                "feat": feats, "decode_ok": oks})

    return media.mapInPandas(run, FEATURE_SCHEMA)


def ppm_channel_sums(media: DataFrame) -> DataFrame:
    """Integer per-channel pixel sums from the REAL PPM decode — the
    cross-engine check of the codec: for :func:`synthesize_ppm_media`
    payloads the sums have a closed form the SQL oracle recomputes
    (gradient arithmetic), so a hash match proves the binary decoder
    read every pixel correctly. Output: (media_id, sum_r, sum_g,
    sum_b) as exact BIGINTs."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": pdf["media_id"], "sum_r": [], "sum_g": [],
                   "sum_b": []}
            for payload in pdf["payload"]:
                img = decode_ppm(bytes(payload)).astype(np.int64)
                s = img.reshape(-1, 3).sum(axis=0)
                out["sum_r"].append(int(s[0]))
                out["sum_g"].append(int(s[1]))
                out["sum_b"].append(int(s[2]))
            yield pd.DataFrame(out)

    return media.mapInPandas(
        run, "media_id long, sum_r long, sum_g long, sum_b long")
