"""Multimodal column plumbing: image/audio/video as opaque binary.

The Spark-side contract for a 100 TB multimodal pipeline: media rides in
``binary`` columns with typed metadata structs; decode/feature steps are
Arrow-batched ``mapInPandas`` stages so bytes never round-trip through
Python row objects. Six codecs are REAL (stdlib/numpy only): P6 PPM,
PNG (zlib deflate + the five scanline filters), GIF (variable-width
LZW, 4-pass interlace, 89a transparency), baseline JPEG
(:mod:`maps_spark.functions.jpeg` — Huffman entropy decode, dequant,
IDCT, chroma upsampling — baseline AND progressive/SOF2 multi-scan),
WAV/RIFF PCM16 audio, and Y4M/YUV4MPEG2 uncompressed video (header
parse + FRAME walk + planar reads incl. 4:2:0/4:2:2 chroma upsample)
— each with a hash-checked decode gate.
Only formats whose decoders cannot be written against stdlib within
reason (inter-frame compressed video h264/vp9/av1, entropy-coded
audio mp3/aac, arithmetic-coded JPEG) stay behind the clearly-marked
synthetic-media stub; their engine-side plumbing (schemas, batching,
partition sizing, UDF signatures) is real and tested.

Partitioning note: media tables should be written with
``maxRecordsPerFile`` tuned so row groups stay ~128 MB despite wide
binary cells; the synthesize helper models that.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

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
# Uncompressed P6 PPM needs only numpy, so this path is REAL: header
# parse, pixel decode, resize, features. (PNG, baseline JPEG, and WAV
# below/alongside are real too.)

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
                         partitions: int = 4,
                         pattern: str = "gradient") -> DataFrame:
    """Media table whose payloads are REAL P6 images, exercising the
    true decode path end-to-end. ``pattern="gradient"`` (default) is
    the per-id x/y gradient the channel-sum gates use;
    ``pattern="mod"`` is a non-monotone modular texture whose dHash
    bits genuinely vary by position and id (a gradient's rows are
    monotone, so every difference-hash bit is 0 — useless as a dHash
    regression gate). Both have closed-form oracles."""
    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for i in pdf["id"]:
                yy, xx = np.mgrid[0:height, 0:width]
                if pattern == "mod":
                    img = np.stack([
                        ((xx * (3 + int(i) % 5) + 7 * yy) % 23) * 11,
                        ((xx * xx + yy) % 29) * 8,
                        ((int(i) * 3 + xx + yy) % 31) * 8,
                    ], axis=-1).astype(np.uint8)
                else:
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
    """REAL feature extraction over P6 PPM *or* PNG payloads
    (magic-byte dispatch via :func:`decode_image`): decode, per-channel
    means, and a ``grid x grid`` nearest-resized thumbnail — all in one
    Arrow-batched mapInPandas stage (bytes never cross into Python row
    objects). Undecodable payloads yield decode_ok = false with a zero
    vector, mirroring :func:`extract_features`' stub contract.

    feat layout: [mean_r, mean_g, mean_b, grid*grid*3 thumbnail].
    """
    dim = 3 + grid * grid * 3

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, oks = [], []
            for payload in pdf["payload"]:
                try:
                    img = decode_image(bytes(payload))
                    thumb = resize_nearest(img, grid, grid)
                    vec = np.concatenate([
                        img.reshape(-1, 3).mean(axis=0),
                        thumb.astype(np.float64).ravel(),
                    ]).astype(np.float32) / 255.0
                    feats.append(vec)
                    oks.append(True)
                # decoders normalize parse failures to ValueError; the
                # extra types are defense in depth so a malformed
                # payload can never kill the mapInPandas task
                except (ValueError, KeyError, IndexError, struct.error):
                    feats.append(np.zeros(dim, dtype=np.float32))
                    oks.append(False)
            yield pd.DataFrame({"media_id": pdf["media_id"],
                                "kind": pdf["kind"],
                                "feat": feats, "decode_ok": oks})

    return media.mapInPandas(run, FEATURE_SCHEMA)


# -- real codec path: PNG (stdlib zlib) ---------------------------------
# 8-bit PNG needs only ``zlib`` (deflate) plus the five scanline
# filters from the spec, so this path is REAL too: chunk/CRC parse,
# IDAT inflate, per-row unfiltering (None/Sub/Up/Average/Paeth), and
# Adam7 interlace reassembly. JPEG is real too
# (maps_spark/functions/jpeg.py: Huffman entropy decode, dequant,
# IDCT — baseline and progressive); only arithmetic-coded JPEG,
# inter-frame video, and entropy-coded audio remain out of scope.

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# PNG color type -> samples per pixel (8-bit depth only; no palette)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _paeth_predictor(a, b, c):
    """PNG Paeth predictor; works elementwise on numpy arrays or ints."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + ctype + data +
            struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))


def _filter_scanlines(lines: np.ndarray, bpp: int,
                      filter_mode: str) -> bytearray:
    """Apply PNG scanline filters to (h, stride) int32 rows —
    ``'cycle'`` uses filter y % 5 so every decoder branch is
    exercised; shared by the sequential path and each Adam7 pass."""
    h, stride = lines.shape
    zeros = np.zeros(bpp, dtype=np.int32)
    raw = bytearray()
    prior = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        f = (y % 5) if filter_mode == "cycle" else 0
        line = lines[y]
        left = np.concatenate([zeros, line[:-bpp]]) if stride > bpp \
            else np.zeros(stride, dtype=np.int32)
        if f == 0:
            filt = line
        elif f == 1:
            filt = (line - left) % 256
        elif f == 2:
            filt = (line - prior) % 256
        elif f == 3:
            filt = (line - (left + prior) // 2) % 256
        else:
            ul = np.concatenate([zeros, prior[:-bpp]]) if stride > bpp \
                else np.zeros(stride, dtype=np.int32)
            filt = (line - _paeth_predictor(left, prior, ul)) % 256
        raw.append(f)
        raw.extend(filt.astype(np.uint8).tobytes())
        prior = line
    return raw


def encode_png(arr: np.ndarray, filter_mode: str = "cycle",
               level: int = 6, interlace: bool = False) -> bytes:
    """REAL PNG encoder for 8-bit (h, w[, ch]) uint8 arrays, ch in
    {1 gray, 2 gray+alpha, 3 RGB, 4 RGBA}. ``filter_mode='cycle'``
    applies scanline filter ``y % 5`` so every decoder filter branch is
    exercised by round-trips; ``'none'`` writes filter 0 throughout.
    ``interlace=True`` writes Adam7: the seven passes extracted by
    the spec geometry, each filtered independently."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}.get(ch)
    if color is None:
        raise ValueError(f"unsupported channel count {ch}")
    bpp = ch
    if interlace:
        raw = bytearray()
        for x0, y0, dx, dy in _ADAM7:
            sub = arr[y0::dy, x0::dx]
            if sub.size == 0:
                continue
            ph, pw = sub.shape[:2]
            raw += _filter_scanlines(
                sub.reshape(ph, pw * ch).astype(np.int32), bpp,
                filter_mode)
    else:
        raw = _filter_scanlines(
            arr.reshape(h, w * ch).astype(np.int32), bpp, filter_mode)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0,
                       1 if interlace else 0)
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(raw), level))
            + _png_chunk(b"IEND", b""))


def decode_png(payload: bytes) -> np.ndarray:
    """REAL PNG decode: signature + chunk walk with CRC verification,
    IDAT inflate, and scanline unfiltering per the spec's five filter
    types. Supports 8-bit gray / gray+alpha / RGB / RGBA, sequential
    or Adam7 interlaced; raises ValueError on anything else or corrupt input
    (every parse failure is normalized to ValueError so mapInPandas
    decode stages never crash on a bad payload).
    Returns (h, w, channels) uint8."""
    try:
        return _decode_png(payload)
    except ValueError:
        raise
    except (struct.error, KeyError, IndexError, OverflowError) as e:
        raise ValueError(f"malformed PNG stream: {e!r}") from e


def _decode_png(payload: bytes) -> np.ndarray:
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, ihdr, idat, saw_iend = 8, None, bytearray(), False
    while pos + 12 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos:pos + 4])
        ctype = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        if len(data) != length or pos + 12 + length > len(payload):
            raise ValueError("truncated chunk")
        (crc,) = struct.unpack(
            ">I", payload[pos + 8 + length:pos + 12 + length])
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {ctype!r} chunk")
        if ctype == b"IHDR":
            if len(data) != 13:
                raise ValueError(f"bad IHDR length {len(data)}")
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            saw_iend = True
            break
        pos += 12 + length
    if ihdr is None or not idat or not saw_iend:
        raise ValueError("missing IHDR/IDAT/IEND")
    w, h, depth, color, comp, filt_method, interlace = ihdr
    if depth != 8:
        raise ValueError(f"unsupported bit depth {depth}")
    if comp != 0 or filt_method != 0:
        raise ValueError("unsupported compression/filter method")
    if interlace not in (0, 1):
        raise ValueError(f"bad interlace method {interlace}")
    ch = _PNG_CHANNELS.get(color)
    if ch is None:
        raise ValueError(f"unsupported color type {color}")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:  # corrupt deflate stream
        raise ValueError(f"bad IDAT stream: {e}") from e
    bpp = ch
    if interlace == 0:
        stride = w * ch
        if len(raw) != h * (stride + 1):
            raise ValueError("scanline data size mismatch")
        return (_unfilter_scanlines(raw, 0, h, stride, bpp)
                .reshape(h, w, ch))
    # Adam7: seven independently-filtered sub-images, scattered onto
    # the full grid by the spec's (x0, y0, dx, dy) pass geometry;
    # empty passes contribute no bytes (not even filter bytes).
    out = np.empty((h, w, ch), dtype=np.uint8)
    off = 0
    for x0, y0, dx, dy in _ADAM7:
        pw = (w - x0 + dx - 1) // dx
        ph = (h - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue
        stride = pw * ch
        need = ph * (stride + 1)
        if off + need > len(raw):
            raise ValueError("scanline data size mismatch")
        sub = _unfilter_scanlines(raw, off, ph, stride, bpp)
        out[y0::dy, x0::dx] = sub.reshape(ph, pw, ch)
        off += need
    if off != len(raw):
        raise ValueError("scanline data size mismatch")
    return out


# Adam7 pass geometry: (x origin, y origin, x step, y step)
_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def _unfilter_scanlines(raw: bytes, off: int, h: int, stride: int,
                        bpp: int) -> np.ndarray:
    """Reverse the five PNG scanline filters over ``h`` rows of
    ``stride`` bytes starting at ``off`` (shared by the sequential
    path and each Adam7 pass — every pass filters independently)."""
    out = np.empty((h, stride), dtype=np.uint8)
    prior = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        o = off + y * (stride + 1)
        f = raw[o]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride,
                             offset=o + 1).astype(np.int32)
        if f == 0:
            pass
        elif f == 2:
            line = (line + prior) % 256
        elif f == 1:  # Sub: sequential in x
            for x in range(bpp, stride):
                line[x] = (line[x] + line[x - bpp]) % 256
        elif f == 3:  # Average
            for x in range(stride):
                left = line[x - bpp] if x >= bpp else 0
                line[x] = (line[x] + (left + prior[x]) // 2) % 256
        elif f == 4:  # Paeth
            for x in range(stride):
                a = line[x - bpp] if x >= bpp else 0
                c = prior[x - bpp] if x >= bpp else 0
                line[x] = (line[x]
                           + int(_paeth_predictor(a, int(prior[x]), c))) \
                    % 256
        else:
            raise ValueError(f"bad filter type {f}")
        prior = line
        out[y] = line.astype(np.uint8)
    return out


def to_rgb(img: np.ndarray) -> np.ndarray:
    """Normalize a decoded image to 3 channels: gray replicates,
    alpha drops (features don't model transparency)."""
    ch = img.shape[2]
    if ch == 1:
        return np.repeat(img, 3, axis=2)
    if ch == 2:  # gray + alpha
        return np.repeat(img[:, :, :1], 3, axis=2)
    return img[:, :, :3]


def decode_image(payload: bytes) -> np.ndarray:
    """Dispatch on magic bytes to a REAL decoder (P6 PPM, PNG incl.
    Adam7 interlaced, GIF incl. interlaced/transparent, or JPEG
    baseline/progressive); raises ValueError for unknown formats."""
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    if payload[:8] == _PNG_SIG:
        return to_rgb(decode_png(payload))
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return to_rgb(decode_gif(payload))
    if payload[:2] == b"\xff\xd8":
        from maps_spark.functions.jpeg import decode_jpeg
        img = decode_jpeg(payload)
        if img.ndim == 2:  # grayscale -> replicate to 3 channels
            img = np.repeat(img[:, :, None], 3, axis=2)
        return img
    raise ValueError("unrecognized image payload")


def synthesize_png_media(spark: SparkSession, n: int = 64,
                         width: int = 31, height: int = 17,
                         interlace: bool = False,
                         partitions: int = 4) -> DataFrame:
    """Media table whose payloads are REAL PNGs (same deterministic
    per-id gradients as :func:`synthesize_ppm_media`, cycling scanline
    filters), exercising the true decode path end-to-end. Odd default
    dims stress non-aligned strides — and, with ``interlace=True``,
    ragged Adam7 passes (31x17 leaves several passes partial)."""
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
                rows.append(encode_png(img, interlace=interlace))
            yield pd.DataFrame({
                "media_id": pdf["id"], "kind": "image",
                "payload": rows,
                "width": width, "height": height,
                "sample_rate": 0, "n_frames": 0})

    return (spark.range(n).repartition(partitions)
            .mapInPandas(gen, MEDIA_SCHEMA))


def png_channel_sums(media: DataFrame) -> DataFrame:
    """Integer per-channel pixel sums from the REAL PNG decode — the
    cross-engine check of the codec (twin of :func:`ppm_channel_sums`):
    for :func:`synthesize_png_media` payloads the sums have the same
    closed form the SQL oracle recomputes, so a hash match proves the
    chunk walk, inflate, and all five unfilters read every pixel."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": pdf["media_id"], "sum_r": [], "sum_g": [],
                   "sum_b": []}
            for payload in pdf["payload"]:
                img = decode_png(bytes(payload)).astype(np.int64)
                s = img.reshape(-1, img.shape[-1]).sum(axis=0)
                out["sum_r"].append(int(s[0]))
                out["sum_g"].append(int(s[1]))
                out["sum_b"].append(int(s[2]))
            yield pd.DataFrame(out)

    return media.mapInPandas(
        run, "media_id long, sum_r long, sum_g long, sum_b long")


# -- real codec path: GIF (LZW) -----------------------------------------
# GIF87a/89a: logical screen + palette + variable-width LSB-first LZW
# image data (GIF89a spec / Welch 1984). A table-driven pure-Python
# decoder like PNG/JPEG — the last stdlib-feasible common web image
# format (VERDICT r8 #4). Interlace (4-pass row shuffle) and the
# 89a Graphic Control transparency index are both handled.

_GIF_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))  # (row origin, step)


def _gif_lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """GIF variable-width LZW compressor: codes start at
    min_code_size+1 bits, grow to 12, clear/reset when the table
    fills; LSB-first bit packing per the spec's appendix."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    bitbuf = nbits = 0
    width = min_code_size + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1

    def emit(code):
        nonlocal bitbuf, nbits
        bitbuf |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            nbits -= 8

    emit(clear)
    prev = b""
    for s in indices:
        cur = prev + bytes([s])
        if cur in table:
            prev = cur
            continue
        emit(table[prev])
        if next_code < 4096:
            table[cur] = next_code
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        else:  # table full: clear, reset widths and dictionary
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        prev = bytes([s])
    if prev:
        emit(table[prev])
    emit(end)
    if nbits:
        out.append(bitbuf & 0xFF)
    return bytes(out)


def _gif_lzw_decode(data: bytes, min_code_size: int,
                    expect: int) -> bytes:
    """Inverse of :func:`_gif_lzw_encode`; stops at the end code or
    after ``expect`` output symbols. Raises ValueError on codes
    beyond the table (corrupt stream)."""
    if not 2 <= min_code_size <= 11:
        raise ValueError(f"bad LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    end = clear + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    width = min_code_size + 1
    out = bytearray()
    bitbuf = nbits = pos = 0
    prev = None
    while len(out) < expect:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("truncated LZW stream")
            bitbuf |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = bitbuf & ((1 << width) - 1)
        bitbuf >>= width
        nbits -= width
        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError(f"bad first LZW code {code}")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:
                table.append(prev + entry[:1])
        elif code == len(table) and len(table) < 4096:
            entry = prev + prev[:1]  # the KwKwK case
            table.append(entry)
        else:
            raise ValueError(f"LZW code {code} beyond table")
        out.extend(entry)
        prev = entry
        # the decoder's table is one entry BEHIND the encoder's (it
        # appends entry k while reading code k+1), so it must widen a
        # step early: when the encoder's next_code (= len(table) + 1
        # here) reaches 2^width
        if len(table) == (1 << width) - 1 and width < 12:
            width += 1
    if len(out) < expect:
        raise ValueError(
            f"LZW stream ended early: {len(out)}/{expect} pixels")
    return bytes(out[:expect])


def encode_gif(arr: np.ndarray, interlace: bool = False,
               transparent_color: tuple | None = None) -> bytes:
    """REAL GIF encoder for (h, w) gray or (h, w, 3) RGB uint8 with
    at most 256 distinct colors: palette build, variable-width LZW,
    optional 4-pass interlace row order, optional 89a Graphic
    Control transparency for ``transparent_color``'s palette index."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = np.repeat(arr[:, :, None], 3, axis=2)
    h, w, ch = arr.shape
    if ch != 3:
        raise ValueError(f"unsupported channel count {ch}")
    flat = arr.reshape(-1, 3)
    palette, inv = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError(f"{len(palette)} colors exceed GIF's 256")
    tbits = max(1, int(len(palette) - 1).bit_length())  # GCT size bits
    min_code = max(2, tbits)
    idx = inv.astype(np.uint8).reshape(h, w)
    t_index = None
    if transparent_color is not None:
        want = np.asarray(transparent_color, dtype=np.uint8)
        hits = np.where((palette == want).all(axis=1))[0]
        if not len(hits):
            raise ValueError("transparent_color not present in image")
        t_index = int(hits[0])
    if interlace:
        rows = [r for o, s in _GIF_INTERLACE for r in range(o, h, s)]
        idx = idx[rows]
    out = bytearray(b"GIF89a" if t_index is not None else b"GIF87a")
    out += struct.pack("<HHBBB", w, h,
                       0x80 | ((tbits - 1) & 7), 0, 0)
    gct = np.zeros((1 << tbits, 3), dtype=np.uint8)
    gct[:len(palette)] = palette
    out += gct.tobytes()
    if t_index is not None:
        out += bytes([0x21, 0xF9, 4, 0x01, 0, 0, t_index, 0])
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h,
                       0x40 if interlace else 0)
    out.append(min_code)
    lzw = _gif_lzw_encode(idx.tobytes(), min_code)
    for i in range(0, len(lzw), 255):
        block = lzw[i:i + 255]
        out.append(len(block))
        out += block
    out += b"\x00\x3b"
    return bytes(out)


def decode_gif(payload: bytes) -> np.ndarray:
    """REAL GIF decode: header + logical screen + palette parse,
    sub-block reassembly, variable-width LZW expansion, 4-pass
    de-interlace, and 89a Graphic Control transparency. Returns the
    FIRST frame composited onto the logical screen as (h, w, 3)
    uint8 — or (h, w, 4) RGBA when a transparent index is declared
    (later animation frames are ignored; the media pipeline treats a
    GIF as a still, like a poster frame). ValueError on malformed
    payloads, like every codec here."""
    try:
        return _decode_gif(payload)
    except ValueError:
        raise
    except (struct.error, KeyError, IndexError, OverflowError) as e:
        raise ValueError(f"malformed GIF stream: {e!r}") from e


def _decode_gif(payload: bytes) -> np.ndarray:
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    if len(payload) < 13:
        raise ValueError("truncated logical screen descriptor")
    w, h, packed, bg, _aspect = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 7)
        gct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    t_index = None
    while pos < len(payload):
        b0 = payload[pos]
        if b0 == 0x3B:  # trailer
            raise ValueError("no image data in GIF")
        if b0 == 0x21:  # extension: label + sub-blocks
            label = payload[pos + 1]
            pos += 2
            while True:
                ln = payload[pos]
                if label == 0xF9 and ln == 4 and payload[pos + 1] & 1:
                    t_index = payload[pos + 4]
                pos += 1 + ln
                if ln == 0:
                    break
            continue
        if b0 != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b0:02x}")
        left, top, iw, ih, ipacked = struct.unpack(
            "<HHHHB", payload[pos + 1:pos + 10])
        pos += 10
        pal = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 7)
            pal = np.frombuffer(payload, np.uint8,
                                n * 3, pos).reshape(n, 3)
            pos += n * 3
        if pal is None:
            raise ValueError("no color table for image")
        if left + iw > w or top + ih > h:
            raise ValueError("frame exceeds logical screen")
        min_code = payload[pos]
        pos += 1
        lzw = bytearray()
        while True:
            ln = payload[pos]
            if pos + 1 + ln > len(payload):
                raise ValueError("truncated image data sub-block")
            lzw += payload[pos + 1:pos + 1 + ln]
            pos += 1 + ln
            if ln == 0:
                break
        idx = np.frombuffer(
            _gif_lzw_decode(bytes(lzw), min_code, iw * ih),
            dtype=np.uint8).reshape(ih, iw)
        if idx.max(initial=0) >= len(pal):
            raise ValueError("pixel index beyond color table")
        if ipacked & 0x40:  # de-interlace: invert the pass row order
            rows = [r for o, s in _GIF_INTERLACE for r in range(o, ih, s)]
            deint = np.empty_like(idx)
            deint[rows] = idx
            idx = deint
        ch = 4 if t_index is not None else 3
        out = np.zeros((h, w, ch), dtype=np.uint8)
        # the background index refers to the GLOBAL color table per
        # the spec — a frame's local palette must not recolor it
        bg_rgb = gct[bg] if gct is not None and bg < len(gct) \
            else np.zeros(3, np.uint8)
        out[:, :, :3] = bg_rgb
        if ch == 4:
            out[:, :, 3] = 255
        frame = pal[idx]
        if ch == 4:
            alpha = np.where(idx == t_index, 0, 255).astype(np.uint8)
            frame = np.concatenate([frame, alpha[:, :, None]], axis=2)
        out[top:top + ih, left:left + iw] = frame
        return out
    raise ValueError("no image data in GIF")


def encode_gif_animation(frames, fps: int = 10,
                         disposal: int = 1) -> bytes:
    """REAL animated-GIF encoder for a sequence of same-shape (h, w)
    gray or (h, w, 3) RGB uint8 frames: one global palette over ALL
    frames (<=256 colors total), a Netscape loop block, and one
    full-screen image descriptor per frame, each preceded by an 89a
    Graphic Control block carrying the delay and ``disposal``.

    ``fps`` must be >= 1; GIF stores delays in centiseconds, so the
    effective ceiling is 100 fps (a 1 cs delay) — higher requests
    raise rather than silently round-tripping as 100."""
    if not isinstance(fps, int) or fps < 1 or fps > 100:
        raise ValueError(
            f"fps must be an int in [1, 100] (GIF delays are whole "
            f"centiseconds), got {fps!r}")
    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    if not frames:
        raise ValueError("animation needs at least one frame")
    frames = [np.repeat(f[:, :, None], 3, axis=2) if f.ndim == 2
              else f for f in frames]
    h, w = frames[0].shape[:2]
    if any(f.shape != frames[0].shape for f in frames):
        raise ValueError("mixed frame shapes in GIF animation")
    flat = np.concatenate([f.reshape(-1, 3) for f in frames])
    palette, inv = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError(f"{len(palette)} colors exceed GIF's 256")
    tbits = max(1, int(len(palette) - 1).bit_length())
    min_code = max(2, tbits)
    idx_all = inv.astype(np.uint8).reshape(len(frames), h, w)
    delay_cs = max(1, round(100 / fps))  # GIF delays are centiseconds
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((tbits - 1) & 7), 0, 0)
    gct = np.zeros((1 << tbits, 3), dtype=np.uint8)
    gct[:len(palette)] = palette
    out += gct.tobytes()
    # Netscape 2.0 application extension: loop forever
    out += (b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00")
    for idx in idx_all:
        out += bytes([0x21, 0xF9, 4, (disposal & 7) << 2,
                      delay_cs & 0xFF, delay_cs >> 8, 0, 0])
        out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)
        out.append(min_code)
        lzw = _gif_lzw_encode(idx.tobytes(), min_code)
        for i in range(0, len(lzw), 255):
            block = lzw[i:i + 255]
            out.append(len(block))
            out += block
        out.append(0)
    out += b"\x3b"
    return bytes(out)


def decode_gif_frames(payload: bytes) -> tuple[np.ndarray, int]:
    """REAL animated-GIF decode: every image descriptor composited in
    sequence with the 89a disposal model — disposal 0/1 leave the
    canvas as drawn, 2 restores the frame's rect to background, 3
    restores the canvas the frame drew over — plus per-frame local
    palettes, interlace, and transparent-index pass-through (a
    transparent pixel leaves the underlying canvas showing).
    Returns ((n_frames, h, w, 3) uint8, fps from the first frame's
    delay; 0 delay -> 10 fps). ValueError on malformed payloads."""
    try:
        return _decode_gif_frames(payload)
    except ValueError:
        raise
    except (struct.error, KeyError, IndexError, OverflowError) as e:
        raise ValueError(f"malformed GIF stream: {e!r}") from e


def _decode_gif_frames(payload: bytes) -> tuple[np.ndarray, int]:
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    if len(payload) < 13:
        raise ValueError("truncated logical screen descriptor")
    w, h, packed, bg, _aspect = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 7)
        gct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    bg_rgb = gct[bg] if gct is not None and bg < len(gct) \
        else np.zeros(3, np.uint8)
    canvas = np.empty((h, w, 3), dtype=np.uint8)
    canvas[:] = bg_rgb
    frames = []
    fps = 10
    t_index = None
    disposal = 0
    while pos < len(payload):
        b0 = payload[pos]
        if b0 == 0x3B:
            break
        if b0 == 0x21:
            label = payload[pos + 1]
            pos += 2
            while True:
                ln = payload[pos]
                if label == 0xF9 and ln == 4:
                    gce_packed = payload[pos + 1]
                    disposal = (gce_packed >> 2) & 7
                    t_index = payload[pos + 4] \
                        if gce_packed & 1 else None
                    if not frames:
                        delay_cs = payload[pos + 2] \
                            | (payload[pos + 3] << 8)
                        if delay_cs:
                            fps = max(1, round(100 / delay_cs))
                pos += 1 + ln
                if ln == 0:
                    break
            continue
        if b0 != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b0:02x}")
        left, top, iw, ih, ipacked = struct.unpack(
            "<HHHHB", payload[pos + 1:pos + 10])
        pos += 10
        pal = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 7)
            pal = np.frombuffer(payload, np.uint8,
                                n * 3, pos).reshape(n, 3)
            pos += n * 3
        if pal is None:
            raise ValueError("no color table for image")
        if left + iw > w or top + ih > h:
            raise ValueError("frame exceeds logical screen")
        min_code = payload[pos]
        pos += 1
        lzw = bytearray()
        while True:
            ln = payload[pos]
            if pos + 1 + ln > len(payload):
                raise ValueError("truncated image data sub-block")
            lzw += payload[pos + 1:pos + 1 + ln]
            pos += 1 + ln
            if ln == 0:
                break
        idx = np.frombuffer(
            _gif_lzw_decode(bytes(lzw), min_code, iw * ih),
            dtype=np.uint8).reshape(ih, iw)
        if idx.max(initial=0) >= len(pal):
            raise ValueError("pixel index beyond color table")
        if ipacked & 0x40:
            rows = [r for o, s in _GIF_INTERLACE
                    for r in range(o, ih, s)]
            deint = np.empty_like(idx)
            deint[rows] = idx
            idx = deint
        region = canvas[top:top + ih, left:left + iw]
        saved = region.copy() if disposal == 3 else None
        drawn = pal[idx]
        if t_index is not None:
            mask = (idx != t_index)[:, :, None]
            region[:] = np.where(mask, drawn, region)
        else:
            region[:] = drawn
        frames.append(canvas.copy())
        if disposal == 2:  # restore rect to background
            canvas[top:top + ih, left:left + iw] = bg_rgb
        elif disposal == 3 and saved is not None:  # restore previous
            canvas[top:top + ih, left:left + iw] = saved
        t_index = None
        disposal = 0
    if not frames:
        raise ValueError("no image data in GIF")
    return np.stack(frames), fps


def synthesize_gif_anim_media(spark: SparkSession, n: int = 64,
                              width: int = 31, height: int = 17,
                              n_frames: int = 4,
                              partitions: int = 4) -> DataFrame:
    """Media table whose payloads are REAL animated GIFs: frame f of
    id i uses pixel index (x + 3y + i + 11f) mod 256 over the shared
    (k, 3k, 7k) palette — the level varies per FRAME, so matching
    per-frame sums proves the descriptor walk and disposal
    compositing, not just one decode (the MJPEG gate's regime)."""
    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            yy, xx = np.mgrid[0:height, 0:width]
            for i in pdf["id"]:
                fr = []
                for f in range(n_frames):
                    k = (xx + 3 * yy + int(i) + 11 * f) % 256
                    fr.append(np.stack(
                        [k, (3 * k) % 256, (7 * k) % 256],
                        axis=-1).astype(np.uint8))
                rows.append(encode_gif_animation(fr, fps=10))
            yield pd.DataFrame({
                "media_id": pdf["id"], "kind": "video",
                "payload": rows,
                "width": width, "height": height,
                "sample_rate": 0, "n_frames": n_frames})

    return (spark.range(n).repartition(partitions)
            .mapInPandas(gen, MEDIA_SCHEMA))


def gif_frame_sums(media: DataFrame) -> DataFrame:
    """Per-frame channel sums from the REAL animated-GIF decode —
    the cross-engine check of the multi-frame path (twin of
    :func:`mjpeg_frame_sums`).
    Output: (media_id, frame_idx, sum_r, sum_g, sum_b)."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "sum_r": [],
                   "sum_g": [], "sum_b": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                frames, _fps = decode_gif_frames(bytes(payload))
                a = frames.astype(np.int64)
                for f in range(a.shape[0]):
                    s = a[f].reshape(-1, 3).sum(axis=0)
                    out["media_id"].append(int(mid))
                    out["frame_idx"].append(f)
                    out["sum_r"].append(int(s[0]))
                    out["sum_g"].append(int(s[1]))
                    out["sum_b"].append(int(s[2]))
            yield pd.DataFrame(out)

    return media.mapInPandas(
        run, "media_id long, frame_idx int, sum_r long, sum_g long, "
             "sum_b long")


def synthesize_gif_media(spark: SparkSession, n: int = 64,
                         width: int = 31, height: int = 17,
                         interlace: bool = False,
                         partitions: int = 4) -> DataFrame:
    """Media table whose payloads are REAL GIFs: palette[k] =
    (k, 3k mod 256, 7k mod 256) and pixel index (x + 3y + id) mod 256
    — closed-form channel sums the SQL oracle recomputes, so a hash
    match proves the LZW expansion (and with ``interlace=True`` the
    4-pass reassembly) reads every pixel at its coordinate."""
    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            yy, xx = np.mgrid[0:height, 0:width]
            for i in pdf["id"]:
                k = (xx + 3 * yy + int(i)) % 256
                img = np.stack([k, (3 * k) % 256, (7 * k) % 256],
                               axis=-1).astype(np.uint8)
                rows.append(encode_gif(img, interlace=interlace))
            yield pd.DataFrame({
                "media_id": pdf["id"], "kind": "image",
                "payload": rows,
                "width": width, "height": height,
                "sample_rate": 0, "n_frames": 0})

    return (spark.range(n).repartition(partitions)
            .mapInPandas(gen, MEDIA_SCHEMA))


def gif_channel_sums(media: DataFrame) -> DataFrame:
    """Integer per-channel pixel sums from the REAL GIF decode — the
    cross-engine check of the LZW codec (twin of
    :func:`png_channel_sums`)."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": pdf["media_id"], "sum_r": [], "sum_g": [],
                   "sum_b": []}
            for payload in pdf["payload"]:
                img = decode_gif(bytes(payload)).astype(np.int64)
                s = img.reshape(-1, img.shape[-1]).sum(axis=0)
                out["sum_r"].append(int(s[0]))
                out["sum_g"].append(int(s[1]))
                out["sum_b"].append(int(s[2]))
            yield pd.DataFrame(out)

    return media.mapInPandas(
        run, "media_id long, sum_r long, sum_g long, sum_b long")


def gif_coord_weighted_sums(media: DataFrame) -> DataFrame:
    """Position-SENSITIVE decode check: per-channel sums weighted by
    the pixel's linear coordinate, ``sum((x + width*y) * channel)``.
    Plain channel sums are permutation-invariant — a wrong (but
    bijective) interlace-pass reassembly in the GIF decoder would
    still match them; weighting by coordinate makes any pixel placed
    at the wrong (x, y) change the result, so the cross-engine gate
    certifies placement, not just the value multiset."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": pdf["media_id"], "wsum_r": [],
                   "wsum_g": [], "wsum_b": []}
            for payload in pdf["payload"]:
                img = decode_gif(bytes(payload)).astype(np.int64)
                h, w = img.shape[:2]
                weight = (np.arange(w)[None, :]
                          + w * np.arange(h)[:, None])
                for ch, key in enumerate(("wsum_r", "wsum_g",
                                          "wsum_b")):
                    out[key].append(int((weight
                                         * img[:, :, ch]).sum()))
            yield pd.DataFrame(out)

    return media.mapInPandas(
        run, "media_id long, wsum_r long, wsum_g long, wsum_b long")


# -- real codec path: WAV (RIFF PCM) ------------------------------------
# Uncompressed PCM WAV needs only ``struct``: RIFF chunk walk, fmt
# parse, int16 sample decode. This makes AUDIO a real decoded modality
# alongside PPM/PNG images; compressed audio (mp3/aac) stays out of
# scope like JPEG (no stdlib entropy decoders).

def encode_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """REAL WAV encoder: (n,) or (n, channels) int16 PCM samples ->
    RIFF/WAVE bytes (format 1, 16-bit)."""
    arr = np.ascontiguousarray(samples, dtype="<i2")
    if arr.ndim == 1:
        arr = arr[:, None]
    n, ch = arr.shape
    data = arr.tobytes()
    byte_rate = sample_rate * ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, byte_rate,
                      ch * 2, 16)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """REAL audio decode for RIFF/WAVE PCM16: returns
    ((n, channels) int16 array, sample_rate). Raises ValueError on
    malformed input or non-PCM16 formats (compressed audio is out of
    scope); parse failures are normalized to ValueError like the
    image decoders."""
    try:
        return _decode_wav(payload)
    except ValueError:
        raise
    except (struct.error, KeyError, IndexError, OverflowError) as e:
        raise ValueError(f"malformed WAV stream: {e!r}") from e


def _decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    (riff_len,) = struct.unpack("<I", payload[4:8])
    if riff_len + 8 > len(payload):
        raise ValueError("truncated RIFF payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        (ln,) = struct.unpack("<I", payload[pos + 4:pos + 8])
        chunk = payload[pos + 8:pos + 8 + ln]
        if len(chunk) != ln:
            raise ValueError("truncated chunk")
        if cid == b"fmt ":
            if ln < 16:
                raise ValueError("short fmt chunk")
            fmt = struct.unpack("<HHIIHH", chunk[:16])
        elif cid == b"data":
            data = chunk
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, ch, rate, _, block_align, bits = fmt
    if audio_format == 0x11:  # IMA ADPCM (compressed audio)
        if bits != 4:
            raise ValueError("IMA ADPCM must be 4-bit")
        return _decode_ima_adpcm(data, ch, block_align), rate
    if audio_format != 1 or bits != 16:
        raise ValueError(f"unsupported format {audio_format}/{bits}-bit")
    if ch < 1 or block_align != ch * 2:
        raise ValueError("bad channel/block layout")
    if len(data) % (ch * 2):
        raise ValueError("data not sample-aligned")
    arr = np.frombuffer(data, dtype="<i2").reshape(-1, ch)
    return arr, rate


def synthesize_wav_media(spark: SparkSession, n: int = 64,
                         sample_rate: int = 8000,
                         n_samples: int = 1024,
                         partitions: int = 4) -> DataFrame:
    """Media table whose payloads are REAL PCM16 WAVs: a deterministic
    integer sawtooth per id (``sample[t] = (t*(id+3)) % 2048 - 1024``)
    whose amplitude sums the SQL oracle recomputes exactly."""
    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            t = np.arange(n_samples, dtype=np.int64)
            for i in pdf["id"]:
                wave = ((t * (int(i) + 3)) % 2048 - 1024).astype(np.int16)
                rows.append(encode_wav(wave, sample_rate))
            yield pd.DataFrame({
                "media_id": pdf["id"], "kind": "audio",
                "payload": rows, "width": 0, "height": 0,
                "sample_rate": sample_rate, "n_frames": 0})

    return (spark.range(n).repartition(partitions)
            .mapInPandas(gen, MEDIA_SCHEMA))


def wav_stats(media: DataFrame) -> DataFrame:
    """Integer amplitude statistics from the REAL WAV decode — the
    cross-engine check of the codec (twin of the image channel-sum
    gates): for :func:`synthesize_wav_media` payloads, sum / abs-sum
    have an exact integer form the SQL oracle recomputes, so a hash
    match proves the RIFF walk and sample decode read every sample.

    Output: (media_id, n_samples, sample_rate, sum_amp, sum_abs)."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": pdf["media_id"], "n_samples": [],
                   "sample_rate": [], "sum_amp": [], "sum_abs": []}
            for payload in pdf["payload"]:
                arr, rate = decode_wav(bytes(payload))
                a = arr.astype(np.int64)
                out["n_samples"].append(int(a.shape[0]))
                out["sample_rate"].append(int(rate))
                out["sum_amp"].append(int(a.sum()))
                out["sum_abs"].append(int(np.abs(a).sum()))
            yield pd.DataFrame(out)

    return media.mapInPandas(
        run, "media_id long, n_samples long, sample_rate long, "
             "sum_amp long, sum_abs long")


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


def wav_frame_features(media: DataFrame, frame: int = 256
                       ) -> DataFrame:
    """Windowed audio features from the REAL WAV decode — the
    frame-level analysis stage (VAD/energy gating, silence trimming)
    of an audio pipeline: per non-overlapping ``frame``-sample window
    of channel 0, the exact integer energy (sum of squared samples —
    int16^2 * frame < 2^42, BIGINT-exact) and zero-crossing count
    (sign flips between consecutive samples, zeros kept as
    non-negative). The trailing partial frame is emitted with its
    true length. One Arrow-batched mapInPandas stage, one output row
    per frame.

    Output: (media_id, frame_idx, frame_len, energy, zero_crossings).
    """
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "frame_len": [],
                   "energy": [], "zero_crossings": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                arr, _ = decode_wav(bytes(payload))
                ch0 = arr[:, 0].astype(np.int64)
                for fi in range(0, (len(ch0) + frame - 1) // frame):
                    seg = ch0[fi * frame:(fi + 1) * frame]
                    sign = seg >= 0
                    out["media_id"].append(int(mid))
                    out["frame_idx"].append(fi)
                    out["frame_len"].append(int(len(seg)))
                    out["energy"].append(int((seg * seg).sum()))
                    out["zero_crossings"].append(
                        int((sign[1:] != sign[:-1]).sum()))
            yield pd.DataFrame(out)

    return media.mapInPandas(
        run, "media_id long, frame_idx int, frame_len int, "
             "energy long, zero_crossings long")


# -- real codec path: IMA ADPCM (compressed audio, WAV fmt 0x11) --------
# The first COMPRESSED audio modality: 4-bit IMA/DVI ADPCM (the
# block-structured WAV variant, format tag 0x11 — spec per the IMA
# Digital Audio Pack and multimedia.cx/index.php/IMA_ADPCM). Pure
# integer state machine (89-entry step table), so the decode gate's
# DuckDB twin re-runs the WHOLE state machine in a recursive CTE —
# a genuinely independent cross-engine check, like the BPE
# unrolled-CTE oracle. mp3/aac (entropy-coded) remain out of scope.

_IMA_STEPS = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767]
_IMA_INDEX = [-1, -1, -1, -1, 2, 4, 6, 8]


def _ima_step(pred: int, idx: int, nibble: int) -> tuple[int, int]:
    """One IMA ADPCM state transition: (pred, idx) + 4-bit nibble ->
    (new pred, new idx). Exact integer arithmetic, mirrored by the
    oracle's recursive CTE."""
    step = _IMA_STEPS[idx]
    diff = step >> 3
    if nibble & 1:
        diff += step >> 2
    if nibble & 2:
        diff += step >> 1
    if nibble & 4:
        diff += step
    pred = pred - diff if nibble & 8 else pred + diff
    pred = max(-32768, min(32767, pred))
    idx = max(0, min(88, idx + _IMA_INDEX[nibble & 7]))
    return pred, idx


def _decode_ima_adpcm(data: bytes, ch: int,
                      block_align: int) -> np.ndarray:
    """Block-structured IMA ADPCM decode -> (n, ch) int16. Per block
    and channel: a 4-byte header (int16 predictor = first output
    sample, step index, reserved), then nibble pairs low-first,
    interleaved across channels in 4-byte groups for stereo."""
    if ch < 1 or ch > 2:
        raise ValueError("IMA ADPCM supports 1 or 2 channels")
    if block_align < ch * 4 or (block_align - ch * 4) % (ch * 4):
        raise ValueError("bad IMA ADPCM block alignment")
    if len(data) % block_align:
        raise ValueError("data not block-aligned")
    spb = 1 + (block_align - ch * 4) * 2 // ch  # samples per block
    out = np.empty((len(data) // block_align * spb, ch),
                   dtype=np.int16)
    row = 0
    for b0 in range(0, len(data), block_align):
        preds, idxs = [], []
        for c in range(ch):
            pred, idx, _resv = struct.unpack(
                "<hBB", data[b0 + 4 * c:b0 + 4 * c + 4])
            if idx > 88:
                raise ValueError("IMA step index out of range")
            preds.append(pred)
            idxs.append(idx)
            out[row, c] = pred
        # payload: per 4-byte group per channel, 8 nibbles low-first
        pos = b0 + 4 * ch
        end = b0 + block_align
        r = row + 1
        while pos < end:
            for c in range(ch):
                pred, idx = preds[c], idxs[c]
                rr = r
                for j in range(4):
                    byte = data[pos + 4 * c + j]
                    for nib in (byte & 0xF, byte >> 4):
                        pred, idx = _ima_step(pred, idx, nib)
                        out[rr, c] = pred
                        rr += 1
                preds[c], idxs[c] = pred, idx
            pos += 4 * ch
            r += 8
        row += spb
    return out


def encode_wav_adpcm(samples: np.ndarray, sample_rate: int = 8000,
                     block_align: int | None = None) -> bytes:
    """REAL IMA ADPCM encoder (WAV format 0x11): (n,) or (n, ch<=2)
    int16 -> RIFF/WAVE bytes. The standard greedy quantizer: nibble
    chosen by successive step subtraction, state updated through the
    same :func:`_ima_step` the decoder uses. The sample count must be
    a whole number of blocks (samples-per-block = 1 + 2*(payload
    bytes)/channels; each block's first sample rides its header)."""
    arr = np.ascontiguousarray(samples, dtype=np.int64)
    if arr.ndim == 1:
        arr = arr[:, None]
    n, ch = arr.shape
    if ch > 2:
        raise ValueError("IMA ADPCM supports 1 or 2 channels")
    if block_align is None:
        block_align = ch * 4 + ch * 32  # 65 samples/block/channel
    spb = 1 + (block_align - ch * 4) * 2 // ch
    if n % spb:
        raise ValueError(f"sample count must be a multiple of {spb}")
    idxs = [0] * ch
    blocks = []
    for s0 in range(0, n, spb):
        head = b""
        payload = bytearray(block_align - 4 * ch)
        preds = []
        for c in range(ch):
            pred = int(arr[s0, c])
            head += struct.pack("<hBB", pred, idxs[c], 0)
            preds.append(pred)
        for g, s in enumerate(range(s0 + 1, s0 + spb, 8)):
            for c in range(ch):
                pred, idx = preds[c], idxs[c]
                for j in range(8):
                    step = _IMA_STEPS[idx]
                    delta = int(arr[s + j, c]) - pred
                    nib = 8 if delta < 0 else 0
                    delta = abs(delta)
                    if delta >= step:
                        nib |= 4
                        delta -= step
                    if delta >= step >> 1:
                        nib |= 2
                        delta -= step >> 1
                    if delta >= step >> 2:
                        nib |= 1
                    pred, idx = _ima_step(pred, idx, nib)
                    o = g * 4 * ch + 4 * c + j // 2
                    payload[o] |= nib << (4 * (j & 1))
                preds[c], idxs[c] = pred, idx
        blocks.append(head + bytes(payload))
    data = b"".join(blocks)
    byte_rate = (sample_rate * block_align + spb - 1) // spb
    fmt = struct.pack("<HHIIHHHH", 0x11, ch, sample_rate, byte_rate,
                      block_align, 4, 2, spb)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"fact" + struct.pack("<II", 4, n)
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def synthesize_adpcm_media(spark: SparkSession, n: int = 64,
                           blocks: int = 2, block_align: int = 36,
                           sample_rate: int = 8000,
                           partitions: int = 4) -> DataFrame:
    """Media table whose payloads are IMA ADPCM WAVs assembled from
    DETERMINISTIC nibble streams (not the encoder): block b of media
    i starts at pred ((37*i+13*b)%256-128)*16, index (3*i+5*b)%89,
    and nibble k is (7*k+11*i+3*b)%16. The oracle re-runs the exact
    state machine over the same streams in a recursive CTE, so the
    gate is meaningful for the DECODER alone."""
    spb = 1 + (block_align - 4) * 2

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                data = bytearray()
                for b in range(blocks):
                    pred0 = ((37 * i + 13 * b) % 256 - 128) * 16
                    idx0 = (3 * i + 5 * b) % 89
                    data += struct.pack("<hBB", pred0, idx0, 0)
                    nibs = [(7 * k + 11 * i + 3 * b) % 16
                            for k in range(spb - 1)]
                    for j in range(0, len(nibs), 2):
                        data.append(nibs[j] | (nibs[j + 1] << 4))
                byte_rate = ((sample_rate * block_align + spb - 1)
                             // spb)
                fmt = struct.pack("<HHIIHHHH", 0x11, 1, sample_rate,
                                  byte_rate, block_align, 4, 2, spb)
                body = (b"WAVE"
                        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                        + b"data"
                        + struct.pack("<I", len(data)) + bytes(data))
                rows.append(b"RIFF" + struct.pack("<I", len(body))
                            + body)
            yield pd.DataFrame({
                "media_id": pdf["id"], "kind": "audio",
                "payload": rows, "width": 0, "height": 0,
                "sample_rate": sample_rate,
                "n_frames": blocks * spb})

    return (spark.range(n).repartition(partitions)
            .mapInPandas(gen, MEDIA_SCHEMA))


def adpcm_stats(media: DataFrame) -> DataFrame:
    """Integer amplitude statistics from the REAL IMA ADPCM decode —
    the cross-engine check of the compressed-audio codec: the DuckDB
    twin recomputes the full step-table state machine per sample in
    a recursive CTE, so a hash match proves the RIFF walk, block
    header parse, nibble order, clamps, and index walk all agree.
    Output: (media_id, n_samples, sum_amp, sum_abs, max_amp)."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": pdf["media_id"], "n_samples": [],
                   "sum_amp": [], "sum_abs": [], "max_amp": []}
            for payload in pdf["payload"]:
                arr, _rate = decode_wav(bytes(payload))
                a = arr.astype(np.int64)
                out["n_samples"].append(int(a.shape[0]))
                out["sum_amp"].append(int(a.sum()))
                out["sum_abs"].append(int(np.abs(a).sum()))
                # a legal zero-block stream has no samples at all
                out["max_amp"].append(int(a.max()) if a.size else 0)
            yield pd.DataFrame(out)

    return media.mapInPandas(
        run, "media_id long, n_samples long, sum_amp long, "
             "sum_abs long, max_amp long")


# -- real codec path: JPEG (baseline, functions/jpeg.py) ----------------

def synthesize_jpeg_media(spark: SparkSession, n: int = 64,
                          blocks_x: int = 4, blocks_y: int = 3,
                          q: int = 16, progressive: bool = False,
                          partitions: int = 4) -> DataFrame:
    """Media table whose payloads are REAL JPEGs: grayscale images
    flat per 8x8 block (level = (17*bx + 29*by + id) % 256, uniform
    quantizer ``q``), so the decode result has the exact closed form
    the SQL oracle recomputes (a flat block round-trips through
    DC-only quantization — integer arithmetic end to end).
    ``progressive=True`` emits SOF2 multi-scan streams instead (DC
    first/refine + banded AC scans with EOBRUN spans); both coders
    quantize identically, so the SAME oracle covers both gates."""
    from maps_spark.functions.jpeg import (encode_jpeg,
                                           encode_jpeg_progressive)
    w, h = blocks_x * 8, blocks_y * 8
    enc = encode_jpeg_progressive if progressive else encode_jpeg

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            bx = np.arange(blocks_x)
            by = np.arange(blocks_y)[:, None]
            for i in pdf["id"]:
                levels = (17 * bx + 29 * by + int(i)) % 256
                img = np.repeat(np.repeat(levels, 8, 0), 8, 1)
                rows.append(enc(img.astype(np.uint8), q_luma=q))
            yield pd.DataFrame({
                "media_id": pdf["id"], "kind": "image",
                "payload": rows, "width": w, "height": h,
                "sample_rate": 0, "n_frames": 0})

    return (spark.range(n).repartition(partitions)
            .mapInPandas(gen, MEDIA_SCHEMA))


def jpeg_pixel_sums(media: DataFrame) -> DataFrame:
    """Integer pixel sum from the REAL baseline JPEG decode — the
    cross-engine check of the codec (twin of the PNG/PPM channel-sum
    gates): for :func:`synthesize_jpeg_media` payloads the decoded
    levels have a pure-integer closed form
    (``clamp(2*((L-127) floordiv 2) + 128)`` at q=16), so a hash match
    proves the marker walk, Huffman decode, dequantization, and IDCT
    read every block. Output: (media_id, n_pixels, sum_lum)."""
    from maps_spark.functions.jpeg import decode_jpeg

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": pdf["media_id"], "n_pixels": [],
                   "sum_lum": []}
            for payload in pdf["payload"]:
                img = decode_jpeg(bytes(payload)).astype(np.int64)
                out["n_pixels"].append(int(img.size))
                out["sum_lum"].append(int(img.sum()))
            yield pd.DataFrame(out)

    return media.mapInPandas(
        run, "media_id long, n_pixels long, sum_lum long")


# -- real codec path: Y4M (YUV4MPEG2 uncompressed video) ----------------
# The one video container that needs no entropy decoder: a plain-text
# stream header, then per frame a "FRAME" marker + raw planar YUV
# bytes (https://wiki.multimedia.cx/index.php/YUV4MPEG2; mjpegtools'
# reference format). This makes VIDEO a real decoded modality in the
# PPM/WAV style; inter-frame compressed video (h264/vp9/av1) stays
# out of scope with mp3/aac. Intra-frame compressed video is covered
# by the MJPEG/AVI path further down.

_Y4M_MAGIC = b"YUV4MPEG2"
# colorspace tag -> (chroma x/y subsample factors, n_planes)
_Y4M_CS = {"C444": (1, 1, 3), "C420jpeg": (2, 2, 3),
           "C420mpeg2": (2, 2, 3), "C420paldv": (2, 2, 3),
           "C420": (2, 2, 3), "C422": (2, 1, 3), "Cmono": (1, 1, 1)}


def encode_y4m(frames: np.ndarray, fps: str = "25:1",
               colorspace: str = "C444") -> bytes:
    """REAL Y4M encoder: ``(n_frames, h, w, 3)`` uint8 YUV planes
    (written as-is — the container stores Y'CbCr, no RGB conversion)
    or ``(n_frames, h, w)`` for Cmono. C444/Cmono only: subsampled
    encode would need a lossy chroma fold, and round-trip tests want
    bit-exactness (the DECODER additionally handles 4:2:0/4:2:2)."""
    arr = np.ascontiguousarray(frames, dtype=np.uint8)
    if colorspace == "Cmono":
        if arr.ndim != 3:
            raise ValueError("Cmono wants (n, h, w)")
    elif colorspace == "C444":
        if arr.ndim != 4 or arr.shape[3] != 3:
            raise ValueError("C444 wants (n, h, w, 3)")
    else:
        raise ValueError(f"unsupported encode colorspace {colorspace}")
    n, h, w = arr.shape[:3]
    head = (f"YUV4MPEG2 W{w} H{h} F{fps} Ip A1:1 "
            f"{colorspace}\n").encode("ascii")
    out = bytearray(head)
    for f in range(n):
        out += b"FRAME\n"
        if colorspace == "Cmono":
            out += arr[f].tobytes()
        else:
            for c in range(3):  # planar: full Y, then U, then V
                out += arr[f, :, :, c].tobytes()
    return bytes(out)


def decode_y4m(payload: bytes) -> tuple[np.ndarray, int]:
    """REAL video decode for YUV4MPEG2: header parse, FRAME walk,
    planar reads. Supports C444 / C422 / C420* (chroma replicated
    back to full resolution — deterministic nearest upsample) and
    Cmono. Returns ``((n_frames, h, w, 3) uint8, fps_num)`` (mono
    replicates Y). Parse failures normalize to ValueError like every
    other codec here."""
    try:
        return _decode_y4m(payload)
    except ValueError:
        raise
    except (struct.error, KeyError, IndexError, OverflowError,
            UnicodeDecodeError) as e:
        raise ValueError(f"malformed Y4M stream: {e!r}") from e


def _decode_y4m(payload: bytes) -> tuple[np.ndarray, int]:
    nl = payload.find(b"\n")
    if nl < 0 or not payload.startswith(_Y4M_MAGIC + b" "):
        raise ValueError("not a YUV4MPEG2 payload")
    w = h = 0
    fps_num = 25
    cs = "C420jpeg"  # the spec's default when no C tag is present
    for tok in payload[len(_Y4M_MAGIC) + 1:nl].decode("ascii").split():
        if tok[0] == "W":
            w = int(tok[1:])
        elif tok[0] == "H":
            h = int(tok[1:])
        elif tok[0] == "F":
            fps_num = int(tok[1:].split(":")[0])
        elif tok[0] == "C":
            cs = tok
    if w <= 0 or h <= 0:
        raise ValueError("missing/invalid W or H")
    if cs not in _Y4M_CS:
        raise ValueError(f"unsupported colorspace {cs}")
    sx, sy, n_planes = _Y4M_CS[cs]
    if n_planes == 3 and (w % sx or h % sy):
        raise ValueError("dimensions not divisible by subsampling")
    cw, ch = w // sx, h // sy
    frame_bytes = w * h + (2 * cw * ch if n_planes == 3 else 0)
    frames = []
    pos = nl + 1
    while pos < len(payload):
        fnl = payload.find(b"\n", pos)
        if fnl < 0 or payload[pos:pos + 5] != b"FRAME":
            raise ValueError("missing FRAME marker")
        pos = fnl + 1  # frame-level params (rare) are skipped
        raw = payload[pos:pos + frame_bytes]
        if len(raw) != frame_bytes:
            raise ValueError("truncated frame payload")
        y = np.frombuffer(raw, np.uint8, w * h).reshape(h, w)
        if n_planes == 1:
            frames.append(np.repeat(y[:, :, None], 3, axis=2))
        else:
            u = np.frombuffer(raw, np.uint8, cw * ch,
                              w * h).reshape(ch, cw)
            v = np.frombuffer(raw, np.uint8, cw * ch,
                              w * h + cw * ch).reshape(ch, cw)
            up = (lambda p: p.repeat(sy, axis=0).repeat(sx, axis=1))
            frames.append(np.stack([y, up(u), up(v)], axis=2))
        pos += frame_bytes
    if not frames:
        raise ValueError("no frames")
    return np.stack(frames), fps_num


def synthesize_y4m_media(spark: SparkSession, n: int = 64,
                         width: int = 32, height: int = 24,
                         n_frames: int = 6,
                         partitions: int = 4) -> DataFrame:
    """Media table whose payloads are REAL C444 Y4M streams: per id,
    ``n_frames`` frames with Y = x-gradient, U = y-gradient, V =
    constant ``(id*7 + frame*13) % 256`` — the V plane varies per
    FRAME, so matching sums proves the frame WALK, not just one
    plane read."""
    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            yy, xx = np.mgrid[0:height, 0:width]
            yplane = (xx * 255 // max(width - 1, 1)).astype(np.uint8)
            uplane = (yy * 255 // max(height - 1, 1)).astype(np.uint8)
            for i in pdf["id"]:
                fr = np.stack([np.stack(
                    [yplane, uplane,
                     np.full_like(yplane, (int(i) * 7 + f * 13) % 256)],
                    axis=2) for f in range(n_frames)])
                rows.append(encode_y4m(fr))
            yield pd.DataFrame({
                "media_id": pdf["id"], "kind": "video",
                "payload": rows, "width": width, "height": height,
                "sample_rate": 0, "n_frames": n_frames})

    return (spark.range(n).repartition(partitions)
            .mapInPandas(gen, MEDIA_SCHEMA))


def y4m_frame_sums(media: DataFrame) -> DataFrame:
    """Integer per-plane sums PER FRAME from the REAL Y4M decode —
    the cross-engine check of the video codec (twin of the PPM/PNG/
    WAV gates): for :func:`synthesize_y4m_media` payloads every sum
    has the gradient/constant closed form the SQL oracle recomputes,
    and the V sum differs per frame, so a hash match proves the
    header parse, frame walk, and all three plane reads.

    Output: (media_id, frame_idx, sum_y, sum_u, sum_v)."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "sum_y": [],
                   "sum_u": [], "sum_v": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                frames, _ = decode_y4m(bytes(payload))
                s = frames.astype(np.int64).sum(axis=(1, 2))
                for f in range(frames.shape[0]):
                    out["media_id"].append(int(mid))
                    out["frame_idx"].append(f)
                    out["sum_y"].append(int(s[f, 0]))
                    out["sum_u"].append(int(s[f, 1]))
                    out["sum_v"].append(int(s[f, 2]))
            yield pd.DataFrame(out)

    return media.mapInPandas(
        run, "media_id long, frame_idx int, sum_y long, sum_u long, "
             "sum_v long")


def _video_luma(payload: bytes) -> np.ndarray:
    """(n_frames, h, w) int64 luma planes from any supported video
    container, dispatched on magic bytes: YUV4MPEG2 (Y plane),
    MJPEG/AVI, or animated GIF (decoded pixels; BT.601 integer luma
    for RGB frames) — so every frame-analysis operator downstream of
    this helper works on compressed video too."""
    def rgb_luma(a):
        return (299 * a[..., 0] + 587 * a[..., 1]
                + 114 * a[..., 2]) // 1000

    if payload[:4] == b"RIFF":
        frames, _ = decode_mjpeg_avi(payload)
        a = frames.astype(np.int64)
        return rgb_luma(a) if a.ndim == 4 else a
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        frames, _ = decode_gif_frames(payload)
        return rgb_luma(frames.astype(np.int64))
    frames, _ = decode_y4m(payload)
    return frames[:, :, :, 0].astype(np.int64)


def y4m_frame_features(media: DataFrame) -> DataFrame:
    """Per-frame video analysis from the REAL decode — the
    scene-cut/motion stage of a video-curation pipeline: exact integer
    luma sum and the absolute frame-difference energy vs the previous
    frame (sum |Y_f - Y_{f-1}|; 0 for frame 0). One Arrow-batched
    mapInPandas stage; frames never leave the worker. Accepts Y4M
    and MJPEG/AVI payloads (magic-byte dispatch via _video_luma).

    Output: (media_id, frame_idx, sum_luma, diff_energy)."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "sum_luma": [],
                   "diff_energy": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                luma = _video_luma(bytes(payload))
                for f in range(luma.shape[0]):
                    d = (0 if f == 0 else
                         int(np.abs(luma[f] - luma[f - 1]).sum()))
                    out["media_id"].append(int(mid))
                    out["frame_idx"].append(f)
                    out["sum_luma"].append(int(luma[f].sum()))
                    out["diff_energy"].append(d)
            yield pd.DataFrame(out)

    return media.mapInPandas(
        run, "media_id long, frame_idx int, sum_luma long, "
             "diff_energy long")


# -- real codec path: MJPEG in AVI (intra-frame compressed video) -------
# The first COMPRESSED video modality: Motion JPEG inside the RIFF/AVI
# container (fccHandler 'MJPG' — msdn AVI RIFF reference /
# multimedia.cx/index.php/Motion_JPEG). Every frame is an independent
# baseline JPEG, so the whole pipeline is stdlib + the repo's own
# T.81 decoder; inter-frame codecs (h264/vp9/av1) remain out of scope.

def encode_mjpeg_avi(frames, fps: int = 25, q: int = 16) -> bytes:
    """REAL MJPEG/AVI encoder for test-payload synthesis: a sequence
    of (h, w) grayscale or (h, w, 3) RGB uint8 frames, each stored
    as an independent baseline JPEG in a '00dc' chunk."""
    from maps_spark.functions.jpeg import encode_jpeg
    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    if not frames:
        raise ValueError("MJPEG/AVI needs at least one frame")
    h, w = frames[0].shape[:2]
    jpgs = [encode_jpeg(f, q_luma=q) for f in frames]

    def chunk(cid: bytes, body: bytes) -> bytes:
        return (cid + struct.pack("<I", len(body)) + body
                + (b"\x00" if len(body) & 1 else b""))

    avih = struct.pack("<14I", 1_000_000 // fps, 0, 0, 0x10,
                       len(frames), 0, 1, 0, w, h, 0, 0, 0, 0)
    strh = (b"vids" + b"MJPG"
            + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0,
                          len(frames), 0, 0xFFFFFFFF, 0)
            + struct.pack("<4H", 0, 0, w, h))
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    hdrl = chunk(b"LIST", b"hdrl" + chunk(b"avih", avih)
                 + chunk(b"LIST", b"strl" + chunk(b"strh", strh)
                         + chunk(b"strf", strf)))
    movi = chunk(b"LIST", b"movi"
                 + b"".join(chunk(b"00dc", j) for j in jpgs))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _riff_subchunks(buf: bytes, pos: int, end: int):
    while pos + 8 <= end:
        cid = buf[pos:pos + 4]
        (ln,) = struct.unpack("<I", buf[pos + 4:pos + 8])
        if pos + 8 + ln > end:
            raise ValueError("truncated AVI chunk")
        yield cid, pos + 8, ln
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned


def decode_mjpeg_avi(payload: bytes) -> tuple[np.ndarray, int]:
    """REAL compressed-video decode: RIFF/AVI walk (hdrl stream
    check for a 'vids'/'MJPG' stream, movi '00dc'/'00db' frames),
    each frame through the T.81 baseline/progressive JPEG decoder.
    Returns ((n_frames, h, w[, 3]) uint8, fps). ValueError on
    malformed containers, non-MJPEG streams, or mixed frame shapes;
    parse failures normalize to ValueError like every codec here."""
    try:
        return _decode_mjpeg_avi(payload)
    except ValueError:
        raise
    except (struct.error, KeyError, IndexError, OverflowError) as e:
        raise ValueError(f"malformed AVI stream: {e!r}") from e


def _decode_mjpeg_avi(payload: bytes) -> tuple[np.ndarray, int]:
    from maps_spark.functions.jpeg import decode_jpeg
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    (riff_len,) = struct.unpack("<I", payload[4:8])
    if riff_len + 8 > len(payload):
        raise ValueError("truncated RIFF payload")
    fps = 25
    vids_mjpg = False
    # two-digit stream id of the MJPG vids stream: movi chunk ids are
    # '##dc'/'##db' where ## is the strl ordinal within hdrl — frames
    # of any OTHER stream (a second video track, audio) must not leak
    # into the decoded sequence
    video_sid = None
    saw_other_vids = False
    movi_chunks = []  # (two-digit stream id, frame bytes)
    for cid, p, ln in _riff_subchunks(payload, 12, 8 + riff_len):
        if cid != b"LIST":
            continue
        ltype = payload[p:p + 4]
        if ltype == b"hdrl":
            stream_no = -1
            for c2, p2, l2 in _riff_subchunks(payload, p + 4, p + ln):
                if c2 != b"LIST" or payload[p2:p2 + 4] != b"strl":
                    continue
                stream_no += 1
                for c3, p3, l3 in _riff_subchunks(
                        payload, p2 + 4, p2 + l2):
                    if c3 == b"strh" and l3 >= 28:
                        if payload[p3:p3 + 4] != b"vids":
                            break  # audio/text stream: ignore
                        if payload[p3 + 4:p3 + 8] != b"MJPG":
                            # a non-MJPG SECONDARY video track is
                            # skipped like audio; only when no MJPG
                            # stream exists at all does the file fail
                            saw_other_vids = True
                            break
                        if not vids_mjpg:  # first MJPG vids stream
                            vids_mjpg = True
                            video_sid = b"%02d" % stream_no
                            scale, rate = struct.unpack(
                                "<II", payload[p3 + 20:p3 + 28])
                            if scale:
                                fps = rate // scale
        elif ltype == b"movi":
            for c2, p2, l2 in _riff_subchunks(payload, p + 4, p + ln):
                if c2[2:4] in (b"dc", b"db"):
                    movi_chunks.append((c2[:2], payload[p2:p2 + l2]))
    if not vids_mjpg:
        raise ValueError(
            "unsupported video codec (not MJPG)" if saw_other_vids
            else "no MJPG video stream in AVI")
    frames = [decode_jpeg(raw) for sid, raw in movi_chunks
              if sid == video_sid]
    if not frames:
        raise ValueError("no video frames in movi list")
    if any(f.shape != frames[0].shape for f in frames):
        raise ValueError("mixed frame shapes in MJPEG stream")
    return np.stack(frames), fps


def synthesize_mjpeg_media(spark: SparkSession, n: int = 64,
                           blocks_x: int = 4, blocks_y: int = 3,
                           n_frames: int = 4, q: int = 16,
                           partitions: int = 4) -> DataFrame:
    """Media table whose payloads are REAL MJPEG/AVI videos: each
    frame a flat-per-8x8-block grayscale JPEG with level
    (17*bx + 29*by + id + 7*frame) % 256 — the level varies per
    FRAME, so matching per-frame sums proves the movi chunk walk,
    not just one decode. Same closed-form regime as the JPEG gates."""
    w, h = blocks_x * 8, blocks_y * 8

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            bx = np.arange(blocks_x)
            by = np.arange(blocks_y)[:, None]
            for i in pdf["id"]:
                fr = []
                for f in range(n_frames):
                    levels = (17 * bx + 29 * by + int(i)
                              + 7 * f) % 256
                    fr.append(np.repeat(np.repeat(levels, 8, 0),
                                        8, 1).astype(np.uint8))
                rows.append(encode_mjpeg_avi(fr, q=q))
            yield pd.DataFrame({
                "media_id": pdf["id"], "kind": "video",
                "payload": rows, "width": w, "height": h,
                "sample_rate": 0, "n_frames": n_frames})

    return (spark.range(n).repartition(partitions)
            .mapInPandas(gen, MEDIA_SCHEMA))


def mjpeg_frame_sums(media: DataFrame) -> DataFrame:
    """Per-frame integer luma sums from the REAL MJPEG/AVI decode —
    the cross-engine check of the compressed-video path: for
    :func:`synthesize_mjpeg_media` payloads each frame's sum has the
    flat-block closed form, so a hash match proves the RIFF walk,
    per-frame JPEG decode, and frame ordering.
    Output: (media_id, frame_idx, n_pixels, sum_lum)."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "n_pixels": [],
                   "sum_lum": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                frames, _fps = decode_mjpeg_avi(bytes(payload))
                a = frames.astype(np.int64)
                for f in range(a.shape[0]):
                    out["media_id"].append(int(mid))
                    out["frame_idx"].append(f)
                    out["n_pixels"].append(int(a[f].size))
                    out["sum_lum"].append(int(a[f].sum()))
            yield pd.DataFrame(out)

    return media.mapInPandas(
        run, "media_id long, frame_idx int, n_pixels long, "
             "sum_lum long")


DHASH_SCHEMA = ("media_id long, kind string, hash_hi long, "
                "hash_lo long, decode_ok boolean")


def image_dhash(media: DataFrame, grid_h: int = 8,
                grid_w: int = 8) -> DataFrame:
    """Perceptual difference-hash (dHash) per image: decode, integer
    grayscale ``(r+g+b) div 3``, nearest-resize to
    ``grid_h x (grid_w+1)``, then one bit per cell — is this cell
    brighter than its right neighbour? Robust to re-encoding, small
    crops and brightness shifts; two images are near-dups when the
    Hamming distance of their hashes is small.

    All arithmetic is integer (resize_nearest index maps, floor-div
    gray), so the hash is bit-reproducible and the gate checks it
    against a closed-form oracle over the synthetic gradients. The 64
    bits ship as two 32-bit BIGINT halves (``hash_hi`` = bit positions
    32..63) — BIGINT-safe in every engine, no sign-bit traps.

    One Arrow-batched mapInPandas stage, same scale shape as
    :func:`extract_image_features`. Undecodable payloads yield
    decode_ok = false with zero hashes.
    """
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            his, los, oks = [], [], []
            for payload in pdf["payload"]:
                try:
                    img = decode_image(bytes(payload))
                    gray = (img.astype(np.int64).sum(axis=-1)) // 3
                    small = resize_nearest(gray, grid_h, grid_w + 1)
                    bits = (small[:, :-1] > small[:, 1:]).astype(
                        np.int64).ravel()
                    val = 0
                    for i, b in enumerate(bits):
                        val |= int(b) << i
                    his.append((val >> 32) & 0xFFFFFFFF)
                    los.append(val & 0xFFFFFFFF)
                    oks.append(True)
                except (ValueError, KeyError, IndexError,
                        struct.error):
                    his.append(0)
                    los.append(0)
                    oks.append(False)
            yield pd.DataFrame({"media_id": pdf["media_id"],
                                "kind": pdf["kind"],
                                "hash_hi": his, "hash_lo": los,
                                "decode_ok": oks})

    return media.mapInPandas(run, DHASH_SCHEMA)


def dhash_near_pairs(hashes: DataFrame, max_hamming: int = 6,
                     id_col: str = "media_id",
                     max_band_df: int = 10_000) -> DataFrame:
    """Image near-dup pairs by dHash Hamming distance, without an
    all-pairs scan: the 64 bits split into eight 8-bit bands, a
    candidate pair must share at least one band EXACTLY (pigeonhole:
    any pair within Hamming distance 7 has an untouched band, so
    recall is total for ``max_hamming <= 7``), and candidates are
    verified with the exact popcount distance — all pure Column
    bit math in codegen.

    Scale: an equi-join per band on the band value (8 linear joins,
    map-side combined dedup), never |images|^2; decode failures are
    pre-filtered, and hot uniform bands (all-zero hashes from flat /
    monotone images) go through the shared
    :func:`maps_spark.operators.dedup.cap_buckets` guard — a corpus
    of near-identical flat images would otherwise make every band
    join quadratic. Pairs inside a capped band are dropped like in
    every LSH-family generator here; exact-duplicate images are
    cheaper found by grouping on (hash_hi, hash_lo) equality anyway.

    Output: (id_a, id_b, hamming).
    """
    from maps_spark.operators.dedup import cap_buckets
    h = (hashes.where(F.col("decode_ok"))
         .select(F.col(id_col).alias("id"), "hash_hi", "hash_lo"))
    # all eight bands through ONE exploded equi-join on (bidx, bval)
    # instead of eight sequential {cap agg + self-join} jobs (guide
    # §2.4; the 8-join chain was ~24 sequential stages of pure fixed
    # overhead at bench scale and 8 separate shuffles at 100 TB). The
    # pair set is identical: a (bidx, bval) bucket here is exactly
    # band b's value-bucket there, the cap predicate (count >
    # max_band_df) matches per band, and a pair surfaces iff it
    # shares >= one uncapped band in both shapes.
    bands = []
    for b in range(4):
        bands.append((F.expr(f"hash_lo div {1 << (8 * b)}") % 256)
                     .cast("int"))
        bands.append((F.expr(f"hash_hi div {1 << (8 * b)}") % 256)
                     .cast("int"))
    expl = h.select("id", "hash_hi", "hash_lo",
                    F.posexplode(F.array(*bands)).alias("bidx", "bval"))
    capped = cap_buckets(expl, ["bidx", "bval"], max_band_df)
    a = capped.alias("a")
    c = capped.alias("c")
    # hamming is a function of the pair, so computing it (and applying
    # the threshold) BEFORE the dedup both narrows the distinct's
    # exchange to three small columns and drops non-matches pre-shuffle
    return (a.join(c, ["bidx", "bval"])
            .where(F.col("a.id") < F.col("c.id"))
            .select(F.col("a.id").alias("id_a"),
                    F.col("c.id").alias("id_b"),
                    (F.bit_count(F.expr("a.hash_hi ^ c.hash_hi"))
                     + F.bit_count(F.expr("a.hash_lo ^ c.hash_lo")))
                    .cast("int").alias("hamming"))
            .where(F.col("hamming") <= max_hamming)
            .distinct())


def write_webdataset_shards(media: DataFrame, path: str,
                            n_shards: int = 8,
                            id_col: str = "media_id") -> DataFrame:
    """Export a media table as WebDataset-style tar shards — the
    training-boundary hand-off for multimodal loaders (each sample is
    a ``<key>.bin`` payload plus a ``<key>.json`` metadata member;
    loaders stream ``shard-00000.tar..`` sequentially, one shard per
    data-parallel worker).

    Determinism end-to-end: shard assignment is the RNG-free id mix
    (:func:`maps_spark.operators.packing.shard_assign` — shard sizes
    differ by at most one), members are written in ``row_idx`` order,
    and tar headers pin mtime/uid/gid to 0 — two exports of the same
    table are byte-identical, so shard digests can be diffed across
    builds like the tile stores.

    Scale: one hash repartition on ``shard`` (every shard's rows land
    in exactly one task), each task streams its tar(s) to
    ``path/shard-NNNNN.tar`` via a tempfile + atomic rename; payloads
    never pass through the driver. Returns the shard manifest
    (shard, n_samples, n_bytes) — tiny.
    """
    import glob
    import io
    import json
    import os
    import tarfile

    from maps_spark.operators.packing import shard_assign
    os.makedirs(path, exist_ok=True)
    # overwrite semantics like every other writer here: stale shards
    # from a previous (larger) export must not survive beside the new
    # ones — a loader globbing shard-*.tar would mix builds
    for stale in glob.glob(f"{path}/shard-*.tar") +             glob.glob(f"{path}/.shard-*.tar.tmp"):
        os.remove(stale)
    assign = shard_assign(media.select(F.col(id_col).alias("doc_id")),
                          n_shards).withColumnRenamed("doc_id", id_col)
    rows = (media.join(assign, id_col)
            .repartition(n_shards, "shard")
            .sortWithinPartitions("shard", "row_idx"))
    meta_cols = [c for c in media.columns
                 if c not in (id_col, "payload")]

    def _write(part):
        # the partition arrives (shard, row_idx)-sorted: stream it,
        # rolling to a new tar when the shard changes — one row
        # resident at a time, payloads never accumulate in Python
        cur = None
        tf = stat = tmp = None
        out = []

        def _close():
            if cur is not None:
                tf.close()
                os.replace(tmp, f"{path}/shard-{cur:05d}.tar")
                out.append((cur, stat[0], stat[1]))

        for r in part:
            sh = int(r["shard"])
            if sh != cur:
                _close()
                cur = sh
                tmp = f"{path}/.shard-{sh:05d}.tar.tmp"
                tf = tarfile.open(tmp, "w")
                stat = [0, 0]
            key = f"{int(r[id_col]):012d}"
            payload = bytes(r["payload"]) if r["payload"] else b""
            meta = json.dumps(
                {c: r[c] for c in meta_cols}, sort_keys=True,
                default=str).encode()
            for name, data in ((f"{key}.bin", payload),
                               (f"{key}.json", meta)):
                info = tarfile.TarInfo(name)
                info.size = len(data)
                info.mtime = 0
                info.uid = info.gid = 0
                info.uname = info.gname = ""
                tf.addfile(info, io.BytesIO(data))
            stat[0] += 1
            stat[1] += len(payload)
        _close()
        return out

    manifest = (rows.rdd.mapPartitions(lambda p: _write(p))
                .toDF("shard long, n_samples long, n_bytes long"))
    # materialize now (the write IS the side effect)
    data = {int(r["shard"]): (r["n_samples"], r["n_bytes"])
            for r in manifest.collect()}
    # shards with zero rows still get an (empty, valid) tar and a
    # manifest row — worker k must always find its shard file
    for sh in range(n_shards):
        if sh not in data:
            with tarfile.open(f"{path}/shard-{sh:05d}.tar", "w"):
                pass
            data[sh] = (0, 0)
    return media.sparkSession.createDataFrame(
        [(sh, n, b) for sh, (n, b) in sorted(data.items())],
        "shard long, n_samples long, n_bytes long")


# -- audio fingerprint family: envelope dHash over frame energies ------


def audio_fingerprint(frames: DataFrame) -> DataFrame:
    """Energy-envelope fingerprint over :func:`wav_frame_features`
    output — the audio sibling of the image dHash: bit i is set iff
    frame i's energy exceeds frame i+1's (the gradient of the
    loudness envelope, robust to uniform gain like dHash is to
    brightness). Bits pack little-endian by frame index into one
    BIGINT (transitions past bit 62 are ignored — envelope prefixes
    dominate perceptual identity, and the pair join needs one word).
    Pure window + bit-shift aggregation over the (tiny) frame table.

    Output: (media_id, fp, n_bits)."""
    w = Window.partitionBy("media_id").orderBy("frame_idx")
    t = (frames.withColumn("nxt", F.lead("energy").over(w))
         .where(F.col("nxt").isNotNull() & (F.col("frame_idx") < 63))
         .withColumn("bit",
                     F.when(F.col("energy") > F.col("nxt"), 1)
                     .otherwise(0)))
    return (t.groupBy("media_id")
            .agg(F.sum(F.expr(
                "shiftleft(CAST(bit AS BIGINT), frame_idx)"))
                .cast("long").alias("fp"),
                F.count("*").cast("long").alias("n_bits")))


def audio_near_pairs(fps: DataFrame, max_hamming: int = 3,
                     max_band_df: int = 10_000) -> DataFrame:
    """Audio near-dup pairs by fingerprint Hamming distance, the
    same pigeonhole-banded shape as :func:`dhash_near_pairs`: the 64
    fingerprint bits split into eight 8-bit bands, a candidate pair
    must share one band exactly (lossless for ``max_hamming <= 7``),
    verification is exact codegen popcount, hot uniform bands run
    through the shared ``cap_buckets`` guard.

    Output: (id_a, id_b, hamming)."""
    from maps_spark.operators.dedup import cap_buckets
    h = fps.select(F.col("media_id").alias("id"), "fp")
    # one exploded equi-join on (bidx, bval) for all eight bands —
    # same restructure (and same pair-set equivalence argument) as
    # :func:`dhash_near_pairs`; the upstream fingerprint lineage now
    # runs once per join side instead of ~24x, so the persist the
    # 8-join chain needed is gone too
    bands = [(F.expr(f"fp div {1 << (8 * b)}") % 256).cast("int")
             for b in range(8)]
    expl = h.select("id", "fp",
                    F.posexplode(F.array(*bands)).alias("bidx", "bval"))
    capped = cap_buckets(expl, ["bidx", "bval"], max_band_df)
    a = capped.alias("a")
    c = capped.alias("c")
    return (a.join(c, ["bidx", "bval"])
            .where(F.col("a.id") < F.col("c.id"))
            .select(F.col("a.id").alias("id_a"),
                    F.col("c.id").alias("id_b"),
                    F.bit_count(F.expr("a.fp ^ c.fp")).cast("int")
                    .alias("hamming"))
            .where(F.col("hamming") <= max_hamming)
            .distinct())


def synthesize_y4m_scene_media(spark: SparkSession, n: int = 64,
                               width: int = 32, height: int = 24,
                               n_frames: int = 6,
                               partitions: int = 4) -> DataFrame:
    """Y4M media with a PLANTED scene change: per id, luma is an
    x-gradient (0..127) plus a +64 brightness step from frame
    ``1 + id % (n_frames - 1)`` on — so consecutive-frame difference
    energy is exactly ``64*width*height`` at the jump and 0
    elsewhere, a closed form the scene-cut oracle recomputes. U is a
    y-gradient, V constant 0."""
    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            yy, xx = np.mgrid[0:height, 0:width]
            base = (xx * 127 // max(width - 1, 1)).astype(np.int64)
            uplane = (yy * 255 // max(height - 1, 1)).astype(np.uint8)
            for i in pdf["id"]:
                j = 1 + int(i) % (n_frames - 1)
                fr = np.stack([np.stack(
                    [(base + (64 if f >= j else 0)).astype(np.uint8),
                     uplane, np.zeros_like(uplane)], axis=2)
                    for f in range(n_frames)])
                rows.append(encode_y4m(fr))
            yield pd.DataFrame({
                "media_id": pdf["id"], "kind": "video",
                "payload": rows, "width": width, "height": height,
                "sample_rate": 0, "n_frames": n_frames})

    return (spark.range(n).repartition(partitions)
            .mapInPandas(gen, MEDIA_SCHEMA))


def scene_cuts(features: DataFrame, num: int = 1,
               den: int = 2) -> DataFrame:
    """Scene-change detection over :func:`y4m_frame_features`: frame
    f > 0 is a cut iff its difference energy carries at least
    ``num/den`` of the video's total difference mass (integer
    cross-multiplication — exact in both engines; a still video with
    zero total mass has no cuts). The per-video total rides a
    windowless groupBy + join keyed by media_id — frame tables are
    tiny relative to payloads, which never leave the decode stage.

    Output: (media_id, frame_idx, diff_energy, is_cut)."""
    totals = (features.groupBy("media_id")
              .agg(F.sum("diff_energy").alias("total")))
    return (features.join(totals, "media_id")
            .select("media_id", "frame_idx", "diff_energy",
                    ((F.col("frame_idx") > 0) & (F.col("total") > 0) &
                     (F.col("diff_energy") * den >=
                      F.col("total") * num)).alias("is_cut")))
