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


# -- PNG (stdlib zlib) ---------------------------------------------------

def _handmade_png(pixels, filters):
    """Build a PNG by-spec-by-hand, independent of encode_png, so a
    symmetric encoder/decoder bug cannot hide: filters are applied with
    straight python ints here, chunks assembled inline."""
    import struct
    import zlib
    h = len(pixels)
    w = len(pixels[0])
    ch = len(pixels[0][0])
    bpp = ch

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        if pa <= pb and pa <= pc:
            return a
        return b if pb <= pc else c

    flat = [[v for px in row for v in px] for row in pixels]
    raw = bytearray()
    prior = [0] * (w * ch)
    for y, line in enumerate(flat):
        f = filters[y]
        raw.append(f)
        for x, v in enumerate(line):
            left = line[x - bpp] if x >= bpp else 0
            up = prior[x]
            ul = prior[x - bpp] if x >= bpp else 0
            pred = {0: 0, 1: left, 2: up, 3: (left + up) // 2,
                    4: paeth(left, up, ul)}[f]
            raw.append((v - pred) % 256)
        prior = line

    def chunk(t, d):
        return (struct.pack(">I", len(d)) + t + d
                + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF))

    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))


def test_png_decode_against_handmade_spec_bytes():
    """Decode a PNG assembled by an independent in-test implementation
    of the spec — one row per filter type — and demand exact pixels."""
    from maps_spark.operators.multimodal import decode_png
    rng = np.random.RandomState(7)
    arr = rng.randint(0, 256, size=(5, 4, 3), dtype=np.uint8)
    pixels = [[list(map(int, arr[y, x])) for x in range(4)]
              for y in range(5)]
    payload = _handmade_png(pixels, filters=[0, 1, 2, 3, 4])
    assert np.array_equal(decode_png(payload), arr)


@pytest.mark.parametrize("ch", [1, 2, 3, 4])
@pytest.mark.parametrize("mode", ["none", "cycle"])
def test_png_roundtrip_all_color_types(ch, mode):
    from maps_spark.operators.multimodal import decode_png, encode_png
    rng = np.random.RandomState(11 + ch)
    img = rng.randint(0, 256, size=(9, 6, ch), dtype=np.uint8)
    out = decode_png(encode_png(img, filter_mode=mode))
    assert out.shape == (9, 6, ch)
    assert np.array_equal(out, img)


def test_png_roundtrip_single_column():
    # stride == bpp: the left/upper-left neighbourhood is empty
    from maps_spark.operators.multimodal import decode_png, encode_png
    img = np.arange(18, dtype=np.uint8).reshape(6, 1, 3)
    assert np.array_equal(decode_png(encode_png(img)), img)


def test_png_rejects_malformed():
    import struct
    from maps_spark.operators.multimodal import decode_png, encode_png
    img = np.zeros((3, 3, 3), dtype=np.uint8)
    good = encode_png(img)
    with pytest.raises(ValueError):
        decode_png(b"\x89PNJ" + good[4:])  # bad signature
    corrupt = bytearray(good)
    corrupt[40] ^= 0xFF  # flip a byte inside IDAT -> CRC mismatch
    with pytest.raises(ValueError):
        decode_png(bytes(corrupt))
    with pytest.raises(ValueError):
        decode_png(good[:-6])  # truncated
    # invalid interlace METHOD (2) -> explicit error; method 1 is
    # Adam7 and supported (rebuild IHDR CRC either way)
    import zlib as _z
    ihdr = bytearray(good[8:8 + 25])
    ihdr[8 + 12] = 2  # interlace byte of IHDR data
    body = bytes(ihdr[4:8 + 13])
    ihdr[-4:] = struct.pack(">I", _z.crc32(body) & 0xFFFFFFFF)
    with pytest.raises(ValueError, match="interlace"):
        decode_png(good[:8] + bytes(ihdr) + good[8 + 25:])
    # method 1 with a non-interlaced payload: wrong stream layout
    ihdr[8 + 12] = 1
    ihdr[-4:] = struct.pack(
        ">I", _z.crc32(bytes(ihdr[4:8 + 13])) & 0xFFFFFFFF)
    with pytest.raises(ValueError, match="size mismatch"):
        decode_png(good[:8] + bytes(ihdr) + good[8 + 25:])


def test_png_wrong_length_ihdr_valid_crc_is_valueerror():
    """Round-4 ADVICE regression: an IHDR whose data is the wrong
    length but whose CRC is valid must raise ValueError, not
    struct.error."""
    import struct
    import zlib as _z
    from maps_spark.operators.multimodal import decode_png, encode_png
    good = encode_png(np.zeros((3, 3, 3), dtype=np.uint8))
    data = good[8 + 8:8 + 8 + 13][:12]  # drop one IHDR byte
    chunk = (struct.pack(">I", len(data)) + b"IHDR" + data
             + struct.pack(">I", _z.crc32(b"IHDR" + data) & 0xFFFFFFFF))
    with pytest.raises(ValueError):
        decode_png(good[:8] + chunk + good[8 + 25:])


def test_wav_parse_failures_normalize_to_valueerror():
    """fmt chunks long enough to pass the ln<16 check but with
    truncated payload bytes must raise ValueError, not struct.error."""
    import struct
    from maps_spark.operators.multimodal import decode_wav
    body = (b"WAVE" + b"fmt " + struct.pack("<I", 16) + b"\x01\x00")
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(ValueError):
        decode_wav(payload)


def test_extract_image_features_never_crashes_on_malformed(spark):
    """The decode_ok=false contract end-to-end: the exact ADVICE repro
    payloads (short DRI, non-interleaved SOS, wrong-length IHDR) flow
    through extract_image_features as decode_ok=false rows."""
    import struct
    import zlib as _z
    import pandas as pd
    from maps_spark.functions.jpeg import encode_jpeg
    from maps_spark.operators.multimodal import (MEDIA_SCHEMA,
                                                 encode_png,
                                                 extract_image_features)
    jg = encode_jpeg(np.zeros((8, 16, 3), dtype=np.uint8))
    i = jg.index(b"\xff\xda")
    dri_seg = b"\xff\xdd" + struct.pack(">H", 3) + b"\x01"
    bad_jpeg = jg[:i] + dri_seg + jg[i:]
    pg = encode_png(np.zeros((3, 3, 3), dtype=np.uint8))
    data = pg[8 + 8:8 + 8 + 13][:12]
    chunk = (struct.pack(">I", len(data)) + b"IHDR" + data
             + struct.pack(">I", _z.crc32(b"IHDR" + data) & 0xFFFFFFFF))
    bad_png = pg[:8] + chunk + pg[8 + 25:]
    rows = pd.DataFrame({
        "media_id": [1, 2, 3], "kind": ["image"] * 3,
        "payload": [bad_jpeg, bad_png, pg],
        "width": 0, "height": 0, "sample_rate": 0, "n_frames": 0})
    media = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
    out = {r["media_id"]: r["decode_ok"]
           for r in extract_image_features(media).collect()}
    assert out == {1: False, 2: False, 3: True}


def test_png_channel_sums_matches_closed_form(spark):
    from maps_spark.operators.multimodal import (png_channel_sums,
                                                 synthesize_png_media)
    w, h = 31, 17
    rows = png_channel_sums(
        synthesize_png_media(spark, n=6, width=w, height=h)).collect()
    sum_x = sum(x * 255 // (w - 1) for x in range(w))
    sum_y = sum(y * 255 // (h - 1) for y in range(h))
    for r in rows:
        assert r["sum_r"] == h * sum_x
        assert r["sum_g"] == w * sum_y
        assert r["sum_b"] == w * h * (r["media_id"] % 256)


def test_extract_image_features_decodes_png_too(spark):
    from maps_spark.operators.multimodal import (extract_image_features,
                                                 synthesize_png_media)
    out = extract_image_features(
        synthesize_png_media(spark, n=6, width=16, height=8)).collect()
    assert len(out) == 6 and all(r["decode_ok"] for r in out)
    for r in out:
        assert abs(np.array(r["feat"])[0] - 127.5 / 255) < 0.02


# -- WAV (RIFF PCM) ------------------------------------------------------

def test_wav_roundtrip_mono_and_stereo():
    from maps_spark.operators.multimodal import decode_wav, encode_wav
    rng = np.random.RandomState(5)
    mono = rng.randint(-32768, 32767, size=300, dtype=np.int16)
    arr, rate = decode_wav(encode_wav(mono, 16000))
    assert rate == 16000 and arr.shape == (300, 1)
    assert np.array_equal(arr[:, 0], mono)
    stereo = rng.randint(-32768, 32767, size=(200, 2), dtype=np.int16)
    arr, rate = decode_wav(encode_wav(stereo, 44100))
    assert rate == 44100 and np.array_equal(arr, stereo)


def test_wav_decode_skips_extra_chunks_and_pads_odd_lengths():
    import struct
    from maps_spark.operators.multimodal import decode_wav, encode_wav
    samples = np.arange(-10, 10, dtype=np.int16)
    good = encode_wav(samples, 8000)
    # splice a LIST metadata chunk with an ODD length (word-padded)
    # between WAVE and fmt — decoders must skip it per the RIFF spec
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    spliced = good[:12] + extra + good[12:]
    spliced = (b"RIFF" + struct.pack("<I", len(spliced) - 8)
               + spliced[8:])
    arr, rate = decode_wav(spliced)
    assert np.array_equal(arr[:, 0], samples)


def test_wav_rejects_malformed():
    import struct
    from maps_spark.operators.multimodal import decode_wav, encode_wav
    samples = np.zeros(8, dtype=np.int16)
    good = encode_wav(samples, 8000)
    with pytest.raises(ValueError):
        decode_wav(b"RIFX" + good[4:])  # bad magic
    with pytest.raises(ValueError):
        decode_wav(good[:-3])  # truncated data chunk
    # 8-bit / non-PCM formats are declared unsupported, not garbage
    bad_fmt = bytearray(good)
    bad_fmt[20:22] = struct.pack("<H", 3)  # IEEE float
    with pytest.raises(ValueError, match="unsupported"):
        decode_wav(bytes(bad_fmt))


def test_wav_stats_matches_closed_form(spark):
    from maps_spark.operators.multimodal import (synthesize_wav_media,
                                                 wav_stats)
    rows = wav_stats(
        synthesize_wav_media(spark, n=5, n_samples=256)).collect()
    t = np.arange(256, dtype=np.int64)
    for r in rows:
        wave = (t * (r["media_id"] + 3)) % 2048 - 1024
        assert r["n_samples"] == 256 and r["sample_rate"] == 8000
        assert r["sum_amp"] == int(wave.sum())
        assert r["sum_abs"] == int(np.abs(wave).sum())


def test_wav_frame_features_semantics(spark):
    from maps_spark.operators.multimodal import (encode_wav,
                                                 wav_frame_features)
    # 5 samples, frame=4: frame 0 = [3,-3,3,-3] (3 flips, e=36),
    # frame 1 = [0] partial (len 1, 0 flips, e=0)
    samples = np.array([3, -3, 3, -3, 0], dtype=np.int16)
    media = spark.createDataFrame(
        [(7, "audio", bytearray(encode_wav(samples, 8000)), 0, 0,
          8000, 0)],
        "media_id long, kind string, payload binary, width int, "
        "height int, sample_rate int, n_frames int")
    rows = {r.frame_idx: r for r in
            wav_frame_features(media, frame=4).collect()}
    assert rows[0].frame_len == 4 and rows[0].energy == 36
    assert rows[0].zero_crossings == 3
    assert rows[1].frame_len == 1 and rows[1].energy == 0
    assert rows[1].zero_crossings == 0


# -- Y4M video codec ----------------------------------------------------

def test_y4m_roundtrip_c444_and_mono():
    from maps_spark.operators.multimodal import decode_y4m, encode_y4m
    rng = np.random.RandomState(1)
    fr = rng.randint(0, 256, size=(4, 6, 8, 3)).astype(np.uint8)
    dec, fps = decode_y4m(encode_y4m(fr, fps="30:1"))
    assert fps == 30 and np.array_equal(dec, fr)
    mono = rng.randint(0, 256, size=(3, 4, 6)).astype(np.uint8)
    dm, _ = decode_y4m(encode_y4m(mono, colorspace="Cmono"))
    for c in range(3):
        assert np.array_equal(dm[:, :, :, c], mono)


def test_y4m_decode_handmade_420_and_default_colorspace():
    """Spec-independent check: a hand-assembled 4:2:0 stream (Y plane
    4 bytes, U/V one byte each for a 2x2 frame), plus the spec's
    default C420jpeg when no C tag is present."""
    from maps_spark.operators.multimodal import decode_y4m
    head = b"YUV4MPEG2 W2 H2 F25:1 Ip A1:1 C420jpeg\n"
    frame = (b"FRAME\n" + bytes([10, 20, 30, 40])
             + bytes([100]) + bytes([200]))
    d, _ = decode_y4m(head + frame)
    assert d.shape == (1, 2, 2, 3)
    assert d[0, :, :, 0].tolist() == [[10, 20], [30, 40]]
    assert (d[0, :, :, 1] == 100).all() and (d[0, :, :, 2] == 200).all()
    d2, _ = decode_y4m(b"YUV4MPEG2 W2 H2 F25:1\n" + frame)
    assert np.array_equal(d2, d)


def test_y4m_rejects_malformed():
    from maps_spark.operators.multimodal import decode_y4m
    head = b"YUV4MPEG2 W2 H2 F25:1 Ip A1:1 C420jpeg\n"
    bads = (b"YUV4MPEG3 W2 H2\n",
            head + b"FRAME\n" + b"\x00" * 3,       # truncated frame
            head + b"FRAM!\n" + b"\x00" * 6,       # bad marker
            b"YUV4MPEG2 W0 H2 C444\n",             # invalid dims
            b"YUV4MPEG2 W3 H2 C420jpeg\nFRAME\n",  # odd w for 4:2:0
            b"YUV4MPEG2 W2 H2 C999\nFRAME\n" + b"\x00" * 6,
            b"YUV4MPEG2 W2 Hx C444\nFRAME\n" + b"\x00" * 12,
            head)                                  # no frames
    for bad in bads:
        with pytest.raises(ValueError):
            decode_y4m(bad)


def test_y4m_frame_sums_match_closed_form(spark):
    from maps_spark.operators.multimodal import (synthesize_y4m_media,
                                                 y4m_frame_sums)
    w, h, nf = 16, 12, 4
    media = synthesize_y4m_media(spark, n=8, width=w, height=h,
                                 n_frames=nf)
    rows = {(r.media_id, r.frame_idx): (r.sum_y, r.sum_u, r.sum_v)
            for r in y4m_frame_sums(media).collect()}
    assert len(rows) == 8 * nf
    sy = h * sum(x * 255 // (w - 1) for x in range(w))
    su = w * sum(y * 255 // (h - 1) for y in range(h))
    for (mid, f), (a, b, c) in rows.items():
        assert (a, b, c) == (sy, su, w * h * ((mid * 7 + f * 13) % 256))


def test_y4m_frame_features_detects_scene_cut(spark):
    """Planted scene cut: constant frames, then a jump — diff_energy
    must be 0 within the scene and exactly |delta|*pixels at the cut."""
    import pandas as pd
    from maps_spark.operators.multimodal import (MEDIA_SCHEMA,
                                                 encode_y4m,
                                                 y4m_frame_features)
    h, w = 4, 6
    fr = np.zeros((4, h, w, 3), dtype=np.uint8)
    fr[:2] = 10
    fr[2:] = 200  # cut between frame 1 and 2
    payload = encode_y4m(fr)
    media = spark.createDataFrame(pd.DataFrame({
        "media_id": [1], "kind": ["video"], "payload": [payload],
        "width": w, "height": h, "sample_rate": 0, "n_frames": 4}),
        schema=MEDIA_SCHEMA)
    out = {r.frame_idx: (r.sum_luma, r.diff_energy)
           for r in y4m_frame_features(media).collect()}
    assert out[0] == (10 * h * w, 0)
    assert out[1] == (10 * h * w, 0)
    assert out[2] == (200 * h * w, 190 * h * w)
    assert out[3] == (200 * h * w, 0)


# -- cross-codec robustness fuzz ----------------------------------------

def _valid_payloads():
    """One representative valid payload per real codec."""
    import struct
    from maps_spark.functions.jpeg import encode_jpeg
    from maps_spark.operators.multimodal import (encode_png, encode_ppm,
                                                 encode_wav, encode_y4m)
    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, size=(9, 7, 3), dtype=np.uint8)
    wav = rng.randint(-2000, 2000, size=(300, 2)).astype(np.int16)
    vid = rng.randint(0, 256, size=(3, 6, 8, 3), dtype=np.uint8)
    return {
        "ppm": encode_ppm(img),
        "png": encode_png(img),
        "jpeg": encode_jpeg(img),
        "wav": encode_wav(wav),
        "y4m": encode_y4m(vid),
    }


def test_codec_mutation_fuzz_never_raises_foreign_exceptions():
    """The decode_ok=false contract, systematically: single-byte
    corruptions and truncations of every codec's valid payload must
    either decode or raise ValueError — never struct.error / KeyError
    / IndexError / UnicodeDecodeError, which would kill a mapInPandas
    task. Deterministic positions (stride walk), no RNG."""
    from maps_spark.functions.jpeg import decode_jpeg
    from maps_spark.operators.multimodal import (decode_png, decode_ppm,
                                                 decode_wav, decode_y4m)
    decoders = {"ppm": decode_ppm, "png": decode_png, "jpeg": decode_jpeg,
                "wav": decode_wav, "y4m": decode_y4m}
    for name, payload in _valid_payloads().items():
        dec = decoders[name]
        n = len(payload)
        # byte flips on a prime-stride walk (covers header + body)
        for i in range(60):
            pos = (i * 97) % n
            mutated = bytearray(payload)
            mutated[pos] ^= 0x5A
            try:
                dec(bytes(mutated))
            except ValueError:
                pass
            except Exception as e:  # pragma: no cover
                raise AssertionError(
                    f"{name}: byte {pos} flip raised {type(e).__name__}: "
                    f"{e}") from e
        # truncations at a coarse grid
        for cut in range(0, n, max(n // 23, 1)):
            try:
                dec(bytes(payload[:cut]))
            except ValueError:
                pass
            except Exception as e:  # pragma: no cover
                raise AssertionError(
                    f"{name}: truncation at {cut} raised "
                    f"{type(e).__name__}: {e}") from e


class TestImageDhash:
    def _media(self, spark, imgs, bad_ids=()):
        import pandas as pd
        from maps_spark.operators.multimodal import (MEDIA_SCHEMA,
                                                     encode_ppm)
        rows = []
        for i, img in enumerate(imgs):
            payload = (b"garbage" if i in bad_ids
                       else encode_ppm(img))
            rows.append((i, "image", bytearray(payload),
                         img.shape[1], img.shape[0], 0, 0))
        return spark.createDataFrame(
            pd.DataFrame(rows, columns=["media_id", "kind", "payload",
                                        "width", "height",
                                        "sample_rate", "n_frames"]),
            schema=MEDIA_SCHEMA)

    def test_dhash_flags_noisy_duplicate_not_unrelated(self, spark):
        import numpy as np
        from maps_spark.operators.multimodal import (dhash_near_pairs,
                                                     image_dhash)
        rng = np.random.default_rng(3)
        base = rng.integers(0, 256, (24, 32, 3)).astype(np.uint8)
        noisy = np.clip(base.astype(int)
                        + rng.integers(-4, 5, base.shape), 0,
                        255).astype(np.uint8)
        other = rng.integers(0, 256, (24, 32, 3)).astype(np.uint8)
        media = self._media(spark, [base, noisy, other])
        hashes = image_dhash(media)
        rows = {r.media_id: r for r in hashes.collect()}
        assert all(rows[i].decode_ok for i in (0, 1, 2))

        def ham(a, b):
            return (bin((a.hash_hi ^ b.hash_hi)
                        & 0xFFFFFFFF).count("1")
                    + bin((a.hash_lo ^ b.hash_lo)
                          & 0xFFFFFFFF).count("1"))
        assert ham(rows[0], rows[1]) <= 6
        assert ham(rows[0], rows[2]) > 6
        pairs = {(r.id_a, r.id_b): r.hamming
                 for r in dhash_near_pairs(hashes).collect()}
        assert (0, 1) in pairs and (0, 2) not in pairs
        assert pairs[(0, 1)] == ham(rows[0], rows[1])

    def test_dhash_undecodable_yields_not_ok_and_is_excluded(self,
                                                            spark):
        import numpy as np
        from maps_spark.operators.multimodal import (dhash_near_pairs,
                                                     image_dhash)
        img = np.zeros((24, 32, 3), dtype=np.uint8)
        media = self._media(spark, [img, img, img], bad_ids=(2,))
        hashes = image_dhash(media)
        rows = {r.media_id: r for r in hashes.collect()}
        assert rows[2].decode_ok is False
        assert rows[2].hash_hi == 0 and rows[2].hash_lo == 0
        pairs = {(r.id_a, r.id_b)
                 for r in dhash_near_pairs(hashes).collect()}
        # identical flat images pair up; the broken payload never does
        assert (0, 1) in pairs
        assert not any(2 in p for p in pairs)


def test_webdataset_export_deterministic_and_complete(spark, tmp_path):
    import hashlib
    import json
    import os
    import tarfile

    from maps_spark.operators.multimodal import (synthesize_ppm_media,
                                                 write_webdataset_shards)
    media = synthesize_ppm_media(spark, n=40)
    out1 = str(tmp_path / "wds1")
    man = {r.shard: (r.n_samples, r.n_bytes)
           for r in write_webdataset_shards(media, out1,
                                            n_shards=4).collect()}
    # every shard written, sizes differ by at most one, totals right
    assert set(man) == {0, 1, 2, 3}
    sizes = [man[s][0] for s in range(4)]
    assert sum(sizes) == 40 and max(sizes) - min(sizes) <= 1
    seen, payloads = set(), {}
    for s in range(4):
        with tarfile.open(f"{out1}/shard-{s:05d}.tar") as tf:
            names = tf.getnames()
            bins = [n for n in names if n.endswith(".bin")]
            metas = [n for n in names if n.endswith(".json")]
            assert len(bins) == len(metas) == man[s][0]
            for n in bins:
                seen.add(int(n.split(".")[0]))
                payloads[int(n.split(".")[0])] = \
                    tf.extractfile(n).read()
            m = json.load(tf.extractfile(metas[0]))
            assert m["kind"] == "image" and m["width"] == 32
    assert seen == set(range(40))
    # payloads are the actual PPM bytes
    rows = {r.media_id: bytes(r.payload) for r in media.collect()}
    assert all(payloads[i] == rows[i] for i in payloads)
    # byte-identical re-export (pinned tar headers)
    out2 = str(tmp_path / "wds2")
    write_webdataset_shards(media, out2, n_shards=4).collect()

    def digest(root):
        return {f: hashlib.md5(open(f"{root}/{f}", "rb").read())
                .hexdigest() for f in sorted(os.listdir(root))}
    assert digest(out1) == digest(out2)


def test_webdataset_empty_shards_and_overwrite(spark, tmp_path):
    import tarfile

    from maps_spark.operators.multimodal import (synthesize_ppm_media,
                                                 write_webdataset_shards)
    out = str(tmp_path / "wds3")
    # 3 rows into 8 shards: shards 3..7 get EMPTY (but present) tars
    small = synthesize_ppm_media(spark, n=3)
    man = {r.shard: r.n_samples for r in
           write_webdataset_shards(small, out, n_shards=8).collect()}
    assert set(man) == set(range(8)) and sum(man.values()) == 3
    for s in range(8):
        with tarfile.open(f"{out}/shard-{s:05d}.tar") as tf:
            assert len(tf.getnames()) == 2 * man[s]
    # re-export with fewer shards removes the stale high shards
    import os
    write_webdataset_shards(small, out, n_shards=2).collect()
    tars = sorted(f for f in os.listdir(out) if f.endswith(".tar"))
    assert tars == ["shard-00000.tar", "shard-00001.tar"]


def test_bbox_scan_handles_dateline_box_in_one_call(spark):
    """Round-6 semantics change: a lng_min > lng_max box no longer
    raises — it covers both sides of the seam in one call (the full
    ground-truth comparison lives in test_spatial.py); an inverted
    LATITUDE interval still raises."""
    import pytest as _pytest

    from maps_spark.functions.spatial import add_morton_key, bbox_scan
    df = add_morton_key(spark.createDataFrame(
        [(1, 15.0, 179.5), (2, 15.0, -179.5), (3, 15.0, 0.0)],
        "id long, lat double, lng double"), "lat", "lng", z=16)
    got = {r.id for r in bbox_scan(df, 10.0, 20.0, 170.0, -170.0,
                                   lat_col="lat",
                                   lng_col="lng").collect()}
    assert got == {1, 2}
    with _pytest.raises(ValueError, match="latitude"):
        bbox_scan(df, 20.0, 10.0, 0.0, 1.0, lat_col="lat",
                  lng_col="lng")


def test_audio_fingerprint_gain_invariance_and_pairs(spark):
    """The envelope fingerprint is exact on a hand-set frame table,
    invariant under uniform gain (energies scale together), and the
    banded pair join finds the duplicate while rejecting a different
    envelope."""
    from maps_spark.operators.multimodal import (audio_fingerprint,
                                                 audio_near_pairs)
    rows = [(1, 0, 10), (1, 1, 5), (1, 2, 8), (1, 3, 2),
            (2, 0, 40), (2, 1, 20), (2, 2, 32), (2, 3, 8),  # 4x gain
            (3, 0, 1), (3, 1, 2), (3, 2, 3), (3, 3, 4)]
    frames = spark.createDataFrame(
        rows, "media_id long, frame_idx int, energy long")
    fps = audio_fingerprint(frames)
    got = {r.media_id: (r.fp, r.n_bits) for r in fps.collect()}
    assert got[1] == (0b101, 3)      # 10>5, 5<8, 8>2
    assert got[2] == got[1]          # gain-invariant
    assert got[3] == (0, 3)          # monotone rise
    pairs = {(r.id_a, r.id_b): r.hamming
             for r in audio_near_pairs(fps, max_hamming=1).collect()}
    assert pairs == {(1, 2): 0}      # popcount(0b101)=2 excluded


def test_scene_cuts_planted_jump(spark):
    """The planted +64 luma step is the single cut per video (through
    the REAL Y4M encode/decode path); a still video yields no cuts."""
    from maps_spark.operators.multimodal import (scene_cuts,
                                                 synthesize_y4m_media,
                                                 synthesize_y4m_scene_media,
                                                 y4m_frame_features)
    feats = y4m_frame_features(
        synthesize_y4m_scene_media(spark, n=8, n_frames=6))
    cuts = scene_cuts(feats).collect()
    per = {}
    for r in cuts:
        if r.is_cut:
            per.setdefault(r.media_id, []).append(r.frame_idx)
    assert per == {i: [1 + i % 5] for i in range(8)}
    # luma is constant across frames in the standard synthesis -> a
    # still video: zero total diff mass, no cuts anywhere
    still = scene_cuts(y4m_frame_features(
        synthesize_y4m_media(spark, n=4))).collect()
    assert all(not r.is_cut for r in still)


# -- IMA ADPCM (compressed audio, WAV format 0x11) -----------------------

def test_adpcm_roundtrip_bounded_error_mono_and_stereo():
    """ADPCM is lossy; for a smooth signal the greedy quantizer must
    track within a small bound (worst at block starts, where the
    step index resets). Header predictors are carried verbatim, so
    the first sample of every block is EXACT."""
    import struct

    import numpy as np

    from maps_spark.operators.multimodal import (decode_wav,
                                                 encode_wav_adpcm)
    t = np.arange(130)
    sig = (800 * np.sin(t / 9)).astype(np.int16)  # 2 blocks of 65
    dec, rate = decode_wav(encode_wav_adpcm(sig, 8000))
    assert rate == 8000 and dec.shape == (130, 1)
    assert np.abs(dec[:, 0].astype(int) - sig.astype(int)).max() < 256
    assert dec[0, 0] == sig[0] and dec[65, 0] == sig[65]
    st = np.stack([sig, (-sig).astype(np.int16)], axis=1)
    d2, _ = decode_wav(encode_wav_adpcm(st, 8000))
    assert d2.shape == (130, 2)
    assert np.abs(d2.astype(int) - st.astype(int)).max() < 256
    # fmt tag is 0x11 with a 4-bit sample size
    p = encode_wav_adpcm(sig, 8000)
    i = p.index(b"fmt ")
    tag, ch, _, _, _, bits = struct.unpack("<HHIIHH", p[i + 8:i + 24])
    assert (tag, ch, bits) == (0x11, 1, 4)


def test_adpcm_synthesis_matches_pure_state_machine():
    """Decode of synthesize_adpcm_media's deterministic payloads ==
    a from-scratch replay of the IMA state machine (the same
    arithmetic the gate's recursive-CTE oracle re-expresses)."""
    import struct

    import numpy as np

    from maps_spark.operators.multimodal import (_IMA_STEPS,
                                                 decode_wav)
    blocks, block_align = 2, 36
    spb = 1 + (block_align - 4) * 2
    idx_adj = [-1, -1, -1, -1, 2, 4, 6, 8]
    for i in (0, 7, 63):
        data = bytearray()
        want = []
        for b in range(blocks):
            pred = ((37 * i + 13 * b) % 256 - 128) * 16
            idx = (3 * i + 5 * b) % 89
            data += struct.pack("<hBB", pred, idx, 0)
            want.append(pred)
            nibs = [(7 * k + 11 * i + 3 * b) % 16
                    for k in range(spb - 1)]
            for j in range(0, len(nibs), 2):
                data.append(nibs[j] | (nibs[j + 1] << 4))
            for nb in nibs:  # independent replay
                step = _IMA_STEPS[idx]
                diff = (step >> 3) + (step >> 2 if nb & 1 else 0) \
                    + (step >> 1 if nb & 2 else 0) \
                    + (step if nb & 4 else 0)
                pred = pred - diff if nb & 8 else pred + diff
                pred = max(-32768, min(32767, pred))
                idx = max(0, min(88, idx + idx_adj[nb & 7]))
                want.append(pred)
        fmt = struct.pack("<HHIIHHHH", 0x11, 1, 8000, 8000,
                          block_align, 4, 2, spb)
        body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                + b"data" + struct.pack("<I", len(data)) + bytes(data))
        dec, _ = decode_wav(b"RIFF" + struct.pack("<I", len(body))
                            + body)
        assert np.array_equal(dec[:, 0], np.array(want, np.int16))


def test_adpcm_malformed_normalizes_to_valueerror():
    import struct

    import numpy as np
    import pytest

    from maps_spark.operators.multimodal import (decode_wav,
                                                 encode_wav_adpcm)
    sig = np.zeros(65, dtype=np.int16)
    good = encode_wav_adpcm(sig, 8000)
    # step index > 88 in a block header
    i = good.index(b"data") + 8
    bad = bytearray(good)
    bad[i + 2] = 89
    with pytest.raises(ValueError, match="step index"):
        decode_wav(bytes(bad))
    # 3 channels is out of the format's scope
    with pytest.raises(ValueError, match="channels"):
        encode_wav_adpcm(np.zeros((65, 3), np.int16))
    # partial final block
    j = good.index(b"data")
    ln = struct.unpack("<I", good[j + 4:j + 8])[0]
    clipped = good[:j + 4] + struct.pack("<I", ln - 1) \
        + good[j + 8:j + 8 + ln - 1]
    with pytest.raises(ValueError):
        decode_wav(clipped)


# -- MJPEG in AVI (intra-frame compressed video) -------------------------

def test_mjpeg_avi_roundtrip_and_frame_order():
    """RIFF/AVI walk + per-frame baseline JPEG decode: q=1 keeps the
    per-pixel error <= 1; frame ORDER is pinned by giving each frame
    a distinct mean level."""
    import numpy as np

    from maps_spark.operators.multimodal import (decode_mjpeg_avi,
                                                 encode_mjpeg_avi)
    rng = np.random.RandomState(3)
    frames = [np.clip(rng.randint(0, 64, (24, 32)) + 48 * f,
                      0, 255).astype(np.uint8) for f in range(4)]
    out, fps = decode_mjpeg_avi(encode_mjpeg_avi(frames, fps=30,
                                                 q=1))
    assert out.shape == (4, 24, 32) and fps == 30
    for f in range(4):
        assert np.abs(out[f].astype(int)
                      - frames[f].astype(int)).max() <= 1
    means = out.reshape(4, -1).mean(axis=1)
    assert list(np.argsort(means)) == [0, 1, 2, 3]
    # color frames stack to (n, h, w, 3)
    cf = [rng.randint(0, 256, (16, 16, 3)).astype(np.uint8)
          for _ in range(2)]
    o2, _ = decode_mjpeg_avi(encode_mjpeg_avi(cf, q=1))
    assert o2.shape == (2, 16, 16, 3)


def test_mjpeg_avi_rejects_malformed():
    import struct

    import numpy as np
    import pytest

    from maps_spark.operators.multimodal import (decode_mjpeg_avi,
                                                 encode_mjpeg_avi)
    good = encode_mjpeg_avi(
        [np.zeros((8, 8), np.uint8) for _ in range(2)])
    with pytest.raises(ValueError, match="RIFF/AVI"):
        decode_mjpeg_avi(b"RIFF" + good[4:8] + b"WAVE" + good[12:])
    with pytest.raises(ValueError, match="not MJPG"):
        decode_mjpeg_avi(good.replace(b"MJPG", b"H264"))
    with pytest.raises(ValueError):
        decode_mjpeg_avi(good[:len(good) // 2])  # truncated
    # a corrupted frame chunk must surface as ValueError, not a
    # foreign exception from the JPEG layer
    i = good.index(b"00dc")
    bad = bytearray(good)
    bad[i + 10] ^= 0xFF
    try:
        decode_mjpeg_avi(bytes(bad))
    except ValueError:
        pass
    # mutation fuzz across the container
    rng = np.random.RandomState(5)
    for _ in range(150):
        j = int(rng.randint(0, len(good)))
        b = bytearray(good)
        b[j] ^= 1 << int(rng.randint(8))
        try:
            decode_mjpeg_avi(bytes(b))
        except ValueError:
            pass
    _ = struct  # keep the import style consistent with siblings


def test_mjpeg_avi_second_stream_ignored():
    """An AVI with a second stream (audio strl + '01dc'/'01wb' movi
    chunks) must decode ONLY the validated MJPG stream 00's frames —
    a second track must neither interleave into the sequence nor
    trip the mixed-frame-shapes check."""
    import struct

    import numpy as np

    from maps_spark.functions.jpeg import encode_jpeg
    from maps_spark.operators.multimodal import (decode_mjpeg_avi,
                                                 encode_mjpeg_avi)

    def chunk(cid, body):
        return (cid + struct.pack("<I", len(body)) + body
                + (b"\x00" if len(body) & 1 else b""))

    frames = [np.full((8, 8), 10 * (i + 1), np.uint8)
              for i in range(3)]
    base = encode_mjpeg_avi(frames, fps=25, q=1)
    # append an 'auds' strl to hdrl and alien 01-stream chunks
    # (one with a different-shape JPEG) to movi
    strh_a = (b"auds" + b"\x00" * 4
              + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, 8000, 0,
                            16, 0, 0xFFFFFFFF, 0)
              + struct.pack("<4H", 0, 0, 0, 0))
    strl_a = chunk(b"LIST", b"strl" + chunk(b"strh", strh_a)
                   + chunk(b"strf", b"\x00" * 16))
    alien_jpg = encode_jpeg(np.zeros((16, 16), np.uint8), q_luma=1)
    alien = chunk(b"01dc", alien_jpg) + chunk(b"01wb", b"\x01\x02")

    # LIST layout: b"LIST" | <u32 size> | b"hdrl"/b"movi" | children;
    # the size field is the 4 bytes just before the list-type tag
    i_hdrl = base.index(b"hdrl")
    (hdrl_len,) = struct.unpack("<I", base[i_hdrl - 4:i_hdrl])
    hdrl_end = i_hdrl + hdrl_len
    i_movi = base.index(b"movi")
    (movi_len,) = struct.unpack("<I", base[i_movi - 4:i_movi])
    movi_end = i_movi + movi_len
    two = (base[:i_hdrl - 4]
           + struct.pack("<I", hdrl_len + len(strl_a))
           + base[i_hdrl:hdrl_end] + strl_a
           + base[hdrl_end:i_movi - 4]
           + struct.pack("<I", movi_len + len(alien))
           + base[i_movi:movi_end] + alien
           + base[movi_end:])
    two = bytearray(two)
    struct.pack_into("<I", two, 4, len(two) - 8)  # RIFF size
    out, fps = decode_mjpeg_avi(bytes(two))
    assert out.shape == (3, 8, 8) and fps == 25
    for i in range(3):
        assert abs(int(out[i].mean()) - 10 * (i + 1)) <= 2

    # a non-MJPG SECONDARY video track must be skipped like audio,
    # not fail the whole file
    strh_v = (b"vids" + b"H264"
              + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, 25, 0,
                            3, 0, 0xFFFFFFFF, 0)
              + struct.pack("<4H", 0, 0, 8, 8))
    strl_v = chunk(b"LIST", b"strl" + chunk(b"strh", strh_v)
                   + chunk(b"strf", b"\x00" * 40))
    mixed = (base[:i_hdrl - 4]
             + struct.pack("<I", hdrl_len + len(strl_v))
             + base[i_hdrl:hdrl_end] + strl_v
             + base[hdrl_end:])
    mixed = bytearray(mixed)
    struct.pack_into("<I", mixed, 4, len(mixed) - 8)
    out2, _ = decode_mjpeg_avi(bytes(mixed))
    assert out2.shape == (3, 8, 8)


# -- Adam7 interlaced PNG -------------------------------------------------

def test_adam7_handmade_spec_figure():
    """Build an interlaced PNG by hand where every pass-p pixel
    carries the value p, then demand the decode reproduce the PNG
    spec's classic 8x8 Adam7 figure — fully independent of
    encode_png, so a symmetric pass-geometry bug cannot hide."""
    import struct
    import zlib as _z

    import numpy as np

    from maps_spark.operators.multimodal import decode_png
    passes = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
              (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]
    raw = bytearray()
    for p, (x0, y0, dx, dy) in enumerate(passes, start=1):
        pw = (8 - x0 + dx - 1) // dx
        ph = (8 - y0 + dy - 1) // dy
        for _ in range(ph):
            raw += bytes([0]) + bytes([p] * pw)  # filter None

    def chunk(t, d):
        return (struct.pack(">I", len(d)) + t + d
                + struct.pack(">I", _z.crc32(t + d) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", 8, 8, 8, 0, 0, 0, 1)  # gray, Adam7
    payload = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
               + chunk(b"IDAT", _z.compress(bytes(raw)))
               + chunk(b"IEND", b""))
    out = decode_png(payload)[:, :, 0]
    want = np.array([
        [1, 6, 4, 6, 2, 6, 4, 6],
        [7, 7, 7, 7, 7, 7, 7, 7],
        [5, 6, 5, 6, 5, 6, 5, 6],
        [7, 7, 7, 7, 7, 7, 7, 7],
        [3, 6, 4, 6, 3, 6, 4, 6],
        [7, 7, 7, 7, 7, 7, 7, 7],
        [5, 6, 5, 6, 5, 6, 5, 6],
        [7, 7, 7, 7, 7, 7, 7, 7]], dtype=np.uint8)
    assert np.array_equal(out, want)


@pytest.mark.parametrize("ch", [1, 2, 3, 4])
def test_adam7_roundtrip_ragged_dims(ch):
    """Interlaced round-trips across dims that leave passes empty or
    partial (1x1 has ONLY pass 1; 3x5 skips several)."""
    from maps_spark.operators.multimodal import decode_png, encode_png
    rng = np.random.RandomState(23 + ch)
    for shape in [(1, 1), (3, 5), (8, 8), (17, 31), (2, 2)]:
        img = rng.randint(0, 256,
                          size=(*shape, ch)).astype(np.uint8)
        for fm in ("cycle", "none"):
            out = decode_png(encode_png(img, filter_mode=fm,
                                        interlace=True))
            assert np.array_equal(out, img), (shape, ch, fm)


def test_adam7_truncated_pass_data_is_valueerror():
    from maps_spark.operators.multimodal import decode_png, encode_png
    img = np.zeros((8, 8, 3), dtype=np.uint8)
    good = encode_png(img, interlace=True)
    # recompress a clipped raw stream so only the CRC-valid IDAT
    # layout differs: drop the last pass's final scanline
    import struct
    import zlib as _z
    i = good.index(b"IDAT") - 4
    (ln,) = struct.unpack(">I", good[i:i + 4])
    raw = _z.decompress(good[i + 8:i + 8 + ln])
    clipped = _z.compress(raw[:-25])
    chunk = (struct.pack(">I", len(clipped)) + b"IDAT" + clipped
             + struct.pack(
                 ">I", _z.crc32(b"IDAT" + clipped) & 0xFFFFFFFF))
    with pytest.raises(ValueError, match="size mismatch"):
        decode_png(good[:i] + chunk + good[i + 12 + ln:])


def test_scene_cuts_work_on_mjpeg_video(spark):
    """Compressed video is first-class in the frame-analysis family:
    a planted luma jump inside an MJPEG/AVI stream surfaces as the
    single scene cut, through the same y4m_frame_features path."""
    import pandas as pd

    from maps_spark.operators.multimodal import (MEDIA_SCHEMA,
                                                 encode_mjpeg_avi,
                                                 scene_cuts,
                                                 y4m_frame_features)

    def gen(it):
        for pdf in it:
            rows = []
            for i in pdf["id"]:
                level = [40] * 3 + [200] * 3  # jump at frame 3
                fr = [np.full((16, 16), lv, np.uint8)
                      for lv in level]
                rows.append(encode_mjpeg_avi(fr, q=1))
            yield pd.DataFrame({
                "media_id": pdf["id"], "kind": "video",
                "payload": rows, "width": 16, "height": 16,
                "sample_rate": 0, "n_frames": 6})

    media = spark.range(4).mapInPandas(gen, MEDIA_SCHEMA)
    cuts = scene_cuts(y4m_frame_features(media)).collect()
    per = {}
    for r in cuts:
        if r.is_cut:
            per.setdefault(r.media_id, []).append(r.frame_idx)
    assert per == {i: [3] for i in range(4)}


def test_audio_pipeline_accepts_adpcm_payloads(spark):
    """Compressed audio is first-class downstream: ADPCM WAVs flow
    through decode_wav into wav_frame_features + audio_fingerprint
    unchanged, and a near-identical signal pairs with its original."""
    import pandas as pd

    from maps_spark.operators.multimodal import (MEDIA_SCHEMA,
                                                 audio_fingerprint,
                                                 encode_wav_adpcm,
                                                 wav_frame_features)

    def gen(it):
        for pdf in it:
            rows = []
            for i in pdf["id"]:
                t = np.arange(520)
                sig = (600 * np.sin(t / (7 + int(i) % 3))
                       ).astype(np.int16)
                rows.append(encode_wav_adpcm(sig[:520], 8000,
                                             block_align=36))
            yield pd.DataFrame({
                "media_id": pdf["id"], "kind": "audio",
                "payload": rows, "width": 0, "height": 0,
                "sample_rate": 8000, "n_frames": 8})

    media = spark.range(6).mapInPandas(gen, MEDIA_SCHEMA)
    feats = wav_frame_features(media, frame=64)
    fps = audio_fingerprint(feats).collect()
    assert len(fps) == 6
    assert all(r.n_bits > 0 for r in fps)
    # same period -> same envelope -> identical fingerprints
    by_id = {r.media_id: r.fp for r in fps}
    assert by_id[0] == by_id[3]  # periods 7 and 7
    assert by_id[0] != by_id[1]  # periods 7 and 8


def test_codec_gate_plans_are_shuffle_free(spark):
    """Scale shape of the decode gates: synthesis and decode fuse
    into ONE stage pair — exactly one Exchange (the explicit
    synthesis repartition) and two Arrow-batched MapInPandas stages,
    no hidden shuffle between them. At 100 TB the decode path is
    embarrassingly parallel; a stray Exchange here would serialize
    payload bytes through a shuffle."""
    from maps_spark.operators.multimodal import (
        adpcm_stats, jpeg_pixel_sums, mjpeg_frame_sums,
        png_channel_sums, synthesize_adpcm_media,
        synthesize_jpeg_media, synthesize_mjpeg_media,
        synthesize_png_media)
    gates = {
        "prog_jpeg": jpeg_pixel_sums(
            synthesize_jpeg_media(spark, n=8, progressive=True)),
        "adpcm": adpcm_stats(synthesize_adpcm_media(spark, n=8)),
        "mjpeg": mjpeg_frame_sums(synthesize_mjpeg_media(spark, n=8)),
        "png_adam7": png_channel_sums(
            synthesize_png_media(spark, n=8, interlace=True)),
    }
    for name, df in gates.items():
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1, (name, plan)
        assert plan.count("MapInPandas") == 2, (name, plan)


def test_gif_roundtrip_all_modes():
    """GIF/LZW codec: encode->decode identity for few-color and
    full-256-palette images, sequential and 4-pass interlaced, gray
    input replication, and a payload large enough to force the LZW
    code width to 12 bits and a mid-stream clear/reset."""
    import numpy as np

    from maps_spark.operators.multimodal import (decode_gif,
                                                 decode_image,
                                                 encode_gif)
    rng = np.random.default_rng(3)
    img = (rng.integers(0, 6, (17, 31)) * 40).astype(np.uint8)
    img3 = np.repeat(img[:, :, None], 3, axis=2)
    for il in (False, True):
        out = decode_gif(encode_gif(img3, interlace=il))
        assert out.shape == (17, 31, 3) and (out == img3).all()
    # 256 colors + 101x211 pixels: width grows to 12, table fills,
    # clear code resets the dictionary mid-stream
    big = rng.integers(0, 256, (101, 211)).astype(np.uint8)
    pal = np.stack([big, (3 * big) % 256, (7 * big) % 256],
                   axis=-1).astype(np.uint8)
    assert (decode_gif(encode_gif(pal)) == pal).all()
    assert (decode_gif(encode_gif(pal, interlace=True)) == pal).all()
    # gray input replicates to RGB
    g = decode_gif(encode_gif(img))
    assert (g[:, :, 0] == img).all() and (g[:, :, 2] == img).all()
    # LZW actually compresses the smooth palette image
    assert len(encode_gif(pal)) < pal.size
    # magic-byte dispatch reaches the GIF decoder
    assert decode_image(encode_gif(img3)).shape == (17, 31, 3)


def test_gif_transparency_and_malformed():
    """89a Graphic Control transparency yields RGBA with alpha 0 at
    the transparent index; malformed payloads raise ValueError (never
    a foreign exception) under targeted corruption and bit-flip fuzz."""
    import numpy as np
    import pytest

    from maps_spark.operators.multimodal import decode_gif, encode_gif
    t = np.zeros((8, 8, 3), np.uint8)
    t[2:4, 2:4] = (255, 0, 0)
    payload = encode_gif(t, transparent_color=(0, 0, 0))
    assert payload[:6] == b"GIF89a"
    d = decode_gif(payload)
    assert d.shape == (8, 8, 4)
    assert d[0, 0, 3] == 0 and d[2, 2, 3] == 255
    assert tuple(d[2, 2, :3]) == (255, 0, 0)
    # a color not in the image can't be declared transparent
    with pytest.raises(ValueError, match="transparent_color"):
        encode_gif(t, transparent_color=(1, 2, 3))
    # >256 colors cannot be palettized
    rng = np.random.default_rng(5)
    noisy = rng.integers(0, 256, (32, 32, 3)).astype(np.uint8)
    with pytest.raises(ValueError, match="256"):
        encode_gif(noisy)
    good = encode_gif(np.repeat(
        (rng.integers(0, 5, (16, 16)) * 50).astype(np.uint8)
        [:, :, None], 3, axis=2))
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"JIF87a" + good[6:])
    with pytest.raises(ValueError):
        decode_gif(good[:len(good) // 2])  # truncated
    gct_end = 13 + 3 * (2 << (good[10] & 7))  # header + GCT
    with pytest.raises(ValueError, match="no image data"):
        decode_gif(good[:gct_end] + b"\x3b")  # straight to trailer
    for _ in range(300):  # mutation fuzz across the container
        j = int(rng.integers(0, len(good)))
        b = bytearray(good)
        b[j] ^= 1 << int(rng.integers(8))
        try:
            decode_gif(bytes(b))
        except ValueError:
            pass


def test_gif_lzw_stream_level():
    """The LZW layer alone: arbitrary byte streams round-trip at every
    legal min code size, and the decoder rejects codes beyond the
    table instead of misreading them."""
    import numpy as np
    import pytest

    from maps_spark.operators.multimodal import (_gif_lzw_decode,
                                                 _gif_lzw_encode)
    rng = np.random.default_rng(11)
    for mcs in (2, 3, 5, 8):
        hi = 1 << mcs
        for n in (0, 1, 7, 4096, 20000):
            data = bytes(rng.integers(0, hi, n).astype(np.uint8))
            enc = _gif_lzw_encode(data, mcs)
            assert _gif_lzw_decode(enc, mcs, n) == data
    # repetitive input (the KwKwK case) round-trips too
    rep = bytes([1, 1, 1, 1, 2, 2, 2, 2] * 500)
    assert _gif_lzw_decode(_gif_lzw_encode(rep, 2), 2, len(rep)) == rep
    with pytest.raises(ValueError, match="truncated"):
        _gif_lzw_decode(b"", 4, 10)
    with pytest.raises(ValueError, match="min code size"):
        _gif_lzw_decode(b"\x00", 1, 1)


def test_gif_animation_roundtrip_and_first_frame():
    """Animated GIF: encode_gif_animation -> decode_gif_frames is
    frame-exact; the still decoder reads frame 0 of an animation;
    fps round-trips from the per-frame delay."""
    import numpy as np

    from maps_spark.operators.multimodal import (decode_gif,
                                                 decode_gif_frames,
                                                 encode_gif_animation)
    yy, xx = np.mgrid[0:17, 0:31]
    frames = []
    for f in range(4):
        k = (xx + 3 * yy + 5 + 11 * f) % 256
        frames.append(np.stack([k, (3 * k) % 256, (7 * k) % 256],
                               axis=-1).astype(np.uint8))
    pay = encode_gif_animation(frames, fps=20)
    out, fps = decode_gif_frames(pay)
    assert out.shape == (4, 17, 31, 3) and fps == 20
    for f in range(4):
        assert (out[f] == frames[f]).all()
    assert (decode_gif(pay) == frames[0]).all()
    import pytest
    with pytest.raises(ValueError, match="mixed frame shapes"):
        encode_gif_animation([frames[0], frames[0][:5]])
    # fps contract: GIF delays are whole centiseconds, so fps is an
    # int in [1, 100] — 0 must raise ValueError (not
    # ZeroDivisionError) and >100 must raise (not silently clamp to
    # a 1 cs delay that round-trips as 100)
    for bad in (0, -5, 101, 1000):
        with pytest.raises(ValueError, match="fps"):
            encode_gif_animation(frames, fps=bad)
    pay100 = encode_gif_animation(frames, fps=100)
    assert decode_gif_frames(pay100)[1] == 100


def test_gif_animation_disposal_model():
    """The 89a disposal model, from a hand-assembled multi-descriptor
    stream: disposal 1 leaves the canvas as drawn (next frame's
    transparent pixels show it), disposal 2 restores the frame's rect
    to background, disposal 3 restores what the frame drew over."""
    import struct

    import numpy as np

    from maps_spark.operators.multimodal import (_gif_lzw_encode,
                                                 decode_gif_frames)

    # palette: 0=bg black, 1=red, 2=blue, 3=green; screen 6x6
    pal = b"\x00\x00\x00\xff\x00\x00\x00\x00\xff\x00\xff\x00"
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", 6, 6, 0x80 | 1, 0, 0)  # 4-color GCT
    out += pal

    def img(left, top, w, h, indices, disposal, transparent=None):
        b = bytearray()
        t_flag = 1 if transparent is not None else 0
        b += bytes([0x21, 0xF9, 4, ((disposal & 7) << 2) | t_flag,
                    10, 0, transparent or 0, 0])
        b += struct.pack("<BHHHHB", 0x2C, left, top, w, h, 0)
        b.append(2)  # min code size
        lzw = _gif_lzw_encode(bytes(indices), 2)
        for i in range(0, len(lzw), 255):
            blk = lzw[i:i + 255]
            b.append(len(blk))
            b += blk
        b.append(0)
        return b

    # f0: full screen red, disposal 1 (keep)
    out += img(0, 0, 6, 6, [1] * 36, disposal=1)
    # f1: blue 2x2 at (1,1), disposal 2 (restore rect to bg black)
    out += img(1, 1, 2, 2, [2] * 4, disposal=2)
    # f2: green 2x2 at (3,3), disposal 3 (restore previous)
    out += img(3, 3, 2, 2, [3] * 4, disposal=3)
    # f3: full screen, all transparent -> shows the composited canvas
    out += img(0, 0, 6, 6, [0] * 36, disposal=1, transparent=0)
    out += b"\x3b"

    frames, _fps = decode_gif_frames(bytes(out))
    assert frames.shape == (4, 6, 6, 3)
    RED, BLUE, GREEN, BLACK = ((255, 0, 0), (0, 0, 255),
                               (0, 255, 0), (0, 0, 0))
    # f0 all red
    assert (frames[0] == RED).all()
    # f1: red canvas with blue box
    assert tuple(frames[1][1, 1]) == BLUE and \
        tuple(frames[1][0, 0]) == RED
    # f2: blue box's rect was restored to BACKGROUND (disposal 2),
    # green box drawn at (3,3)
    assert tuple(frames[2][1, 1]) == BLACK
    assert tuple(frames[2][3, 3]) == GREEN
    assert tuple(frames[2][0, 0]) == RED
    # f3: fully transparent frame -> green box's rect was restored to
    # PREVIOUS (disposal 3): red at (3,3) again? no — previous content
    # at (3,3) before f2 drew was RED (from f0, untouched by f1's
    # disposal-2 rect), so disposal 3 restores RED there
    assert tuple(frames[3][3, 3]) == RED
    assert tuple(frames[3][1, 1]) == BLACK  # still bg from disposal 2
    assert tuple(frames[3][0, 0]) == RED
