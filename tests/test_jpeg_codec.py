"""Baseline JPEG codec: real Huffman/dequant/IDCT decode, pinned by a
closed-form flat-block contract, bounded-error round-trips, and a
bitstream assembled by-spec-by-hand (independent of the encoder)."""

import struct

import numpy as np
import pytest


def test_flat_block_closed_form_across_quantizers():
    from maps_spark.functions.jpeg import (decode_jpeg, encode_jpeg,
                                           flat_block_roundtrip_value)
    rng = np.random.RandomState(2)
    levels = rng.randint(0, 256, size=(2, 3))
    img = np.repeat(np.repeat(levels, 8, 0), 8, 1).astype(np.uint8)
    for q in (1, 5, 16, 32, 255):
        dec = decode_jpeg(encode_jpeg(img, q_luma=q))
        for by in range(2):
            for bx in range(3):
                want = flat_block_roundtrip_value(
                    int(levels[by, bx]), q)
                assert (dec[by * 8:by * 8 + 8,
                            bx * 8:bx * 8 + 8] == want).all(), (q, by, bx)


def test_general_roundtrip_bounded_error():
    from maps_spark.functions.jpeg import decode_jpeg, encode_jpeg
    rng = np.random.RandomState(4)
    g = rng.randint(0, 256, size=(29, 37)).astype(np.uint8)  # non-multiple of 8
    d = decode_jpeg(encode_jpeg(g, q_luma=1))
    assert d.shape == g.shape
    assert np.abs(d.astype(int) - g.astype(int)).max() <= 1
    c = rng.randint(0, 256, size=(24, 16, 3)).astype(np.uint8)
    dc = decode_jpeg(encode_jpeg(c, q_luma=1, q_chroma=1))
    assert dc.shape == c.shape
    assert np.abs(dc.astype(int) - c.astype(int)).max() <= 2


def _seg(marker, body):
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def test_decode_handmade_bitstream():
    """A one-block grayscale JPEG assembled by hand with CUSTOM trivial
    Huffman tables (single length-1 codes) — a codepath the encoder
    never produces, so a symmetric encoder/decoder bug cannot hide.
    DC category 3, bits 101 -> DC=5; all-16 quant -> dequant 80;
    flat IDCT 80/8 + 128 = 138."""
    from maps_spark.functions.jpeg import decode_jpeg
    dqt = bytes([0x00]) + bytes([16] * 64)
    sof = struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
    dc_counts = bytes([1] + [0] * 15)   # one length-1 code: '0'
    dht_dc = bytes([0x00]) + dc_counts + bytes([3])     # -> category 3
    dht_ac = bytes([0x10]) + dc_counts + bytes([0x00])  # -> EOB
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    # bits: DC code '0', magnitude '101', AC EOB '0' -> 01010 + 1-pad
    entropy = bytes([0b01010111])
    payload = (b"\xff\xd8" + _seg(0xDB, dqt) + _seg(0xC0, sof)
               + _seg(0xC4, dht_dc) + _seg(0xC4, dht_ac)
               + _seg(0xDA, sos) + entropy + b"\xff\xd9")
    out = decode_jpeg(payload)
    assert out.shape == (8, 8)
    assert (out == 138).all()


def test_rejects_unsupported_and_malformed():
    from maps_spark.functions.jpeg import decode_jpeg, encode_jpeg
    img = np.zeros((8, 8), dtype=np.uint8)
    good = encode_jpeg(img)
    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG" + good[4:])
    with pytest.raises(ValueError, match="unsupported SOF"):
        # flip SOF0 -> SOF9 (arithmetic coding); find the marker
        i = good.index(b"\xff\xc0")
        decode_jpeg(good[:i] + b"\xff\xc9" + good[i + 2:])
    with pytest.raises(ValueError):
        # SOF0 -> SOF2 makes the baseline SOS (Ss=0, Se=63) an
        # invalid progressive scan header: DC scans must have Se=0
        i = good.index(b"\xff\xc0")
        decode_jpeg(good[:i] + b"\xff\xc2" + good[i + 2:])
    with pytest.raises(ValueError):
        decode_jpeg(good[: len(good) // 2])  # truncated mid-stream
    # a DRI declaring restarts the stream does not contain
    multi = encode_jpeg(np.zeros((8, 32), dtype=np.uint8))
    dri = _seg(0xDD, struct.pack(">H", 1))
    i = multi.index(b"\xff\xda")
    with pytest.raises(ValueError, match="restart"):
        decode_jpeg(multi[:i] + dri + multi[i:])


def test_malformed_streams_normalize_to_valueerror():
    """Round-4 ADVICE regressions: structurally-malformed streams must
    raise ValueError (never struct.error/KeyError) so the mapInPandas
    decode_ok=false contract holds."""
    from maps_spark.functions.jpeg import decode_jpeg, encode_jpeg
    good = encode_jpeg(np.zeros((8, 16, 3), dtype=np.uint8))
    i = good.index(b"\xff\xda")
    # 1-byte DRI segment (spec needs 2) -> was struct.error
    with pytest.raises(ValueError):
        decode_jpeg(good[:i] + _seg(0xDD, b"\x01") + good[i:])
    # SOS selecting fewer components than the SOF declares (legal
    # non-interleaved baseline) -> declared unsupported, was KeyError
    sos_len = struct.unpack(">H", good[i + 2:i + 4])[0]
    short_sos = _seg(0xDA, bytes([1]) + good[i + 5:i + 7]
                     + good[i + 2 + sos_len - 3:i + 2 + sos_len])
    with pytest.raises(ValueError, match="non-interleaved"):
        decode_jpeg(good[:i] + short_sos + good[i + 2 + sos_len:])
    # zero sampling factor in SOF (was ZeroDivisionError)
    j = good.index(b"\xff\xc0")
    with pytest.raises(ValueError, match="sampling"):
        decode_jpeg(good[:j + 11] + b"\x00" + good[j + 12:])
    # SOS whose component ids do not match the SOF's
    full_sos = bytearray(good[i:i + 2 + sos_len])
    full_sos[5] = 77  # first scan component id -> bogus
    with pytest.raises(ValueError):
        decode_jpeg(good[:i] + bytes(full_sos) + good[i + 2 + sos_len:])


def test_restart_interval_roundtrip():
    """DRI/RSTn support (real-world baseline files): markers every N
    MCUs, DC prediction resets, bit-exact vs the marker-free path."""
    from maps_spark.functions.jpeg import decode_jpeg, encode_jpeg
    rng = np.random.RandomState(6)
    g = rng.randint(0, 256, size=(16, 40)).astype(np.uint8)  # 10 MCUs
    plain = decode_jpeg(encode_jpeg(g, q_luma=1))
    for interval in (1, 3, 4):
        with_rst = encode_jpeg(g, q_luma=1, restart_interval=interval)
        assert b"\xff\xd0" in with_rst or interval > 9
        assert np.array_equal(decode_jpeg(with_rst), plain)
    c = rng.randint(0, 256, size=(16, 24, 3)).astype(np.uint8)
    plain_c = decode_jpeg(encode_jpeg(c, q_luma=1, q_chroma=1))
    with_rst = encode_jpeg(c, q_luma=1, q_chroma=1, restart_interval=2)
    assert np.array_equal(decode_jpeg(with_rst), plain_c)


def test_chroma_420_subsampled_decode():
    """Hand-build a 4:2:0 frame via the encoder's tables? The encoder
    only writes 4:4:4, so synthesize 4:2:0 by re-tagging a 16x16
    one-color image: encode 4:4:4, decode; then check the decoder
    accepts sampling factors 2x2 via a manually assembled frame."""
    from maps_spark.functions import jpeg as J
    # flat color image through the normal 4:4:4 path first
    img = np.full((16, 16, 3), 90, dtype=np.uint8)
    out = J.decode_jpeg(J.encode_jpeg(img, q_luma=1, q_chroma=1))
    assert np.abs(out.astype(int) - 90).max() <= 1
    # manual 4:2:0: luma 2x2 blocks + 1 cb + 1 cr per MCU, flat gray
    dqt = bytes([0x00]) + bytes([16] * 64)
    sof = (struct.pack(">BHHB", 8, 16, 16, 3)
           + bytes([1, 0x22, 0]) + bytes([2, 0x11, 0])
           + bytes([3, 0x11, 0]))
    dc_counts = bytes([1] + [0] * 15)
    dht_dc = bytes([0x00]) + dc_counts + bytes([0])  # category 0: DC=0
    dht_ac = bytes([0x10]) + dc_counts + bytes([0x00])
    sos = bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0])
    # 6 blocks x (DC '0' + EOB '0') = 12 zero bits -> two 0x00 bytes?
    # '0'*12 padded with 1s -> 0b00000000 0b00001111
    entropy = bytes([0b00000000, 0b00001111])
    payload = (b"\xff\xd8" + _seg(0xDB, dqt) + _seg(0xC0, sof)
               + _seg(0xC4, dht_dc) + _seg(0xC4, dht_ac)
               + _seg(0xDA, sos) + entropy + b"\xff\xd9")
    out = J.decode_jpeg(payload)
    # all-zero coefficients: Y=128, Cb=Cr=128 -> gray 128 RGB
    assert out.shape == (16, 16, 3)
    assert (out == 128).all()


def test_extract_image_features_decodes_jpeg(spark):
    from maps_spark.operators.multimodal import (extract_image_features,
                                                 synthesize_jpeg_media)
    out = extract_image_features(
        synthesize_jpeg_media(spark, n=6)).collect()
    assert len(out) == 6 and all(r["decode_ok"] for r in out)


def test_jpeg_pixel_sums_closed_form(spark):
    from maps_spark.operators.multimodal import (jpeg_pixel_sums,
                                                 synthesize_jpeg_media)
    rows = jpeg_pixel_sums(
        synthesize_jpeg_media(spark, n=5)).collect()
    for r in rows:
        want = 0
        for by in range(3):
            for bx in range(4):
                L = (17 * bx + 29 * by + r["media_id"]) % 256
                want += max(0, min(255, 2 * ((L - 127) // 2) + 128))
        assert r["sum_lum"] == 64 * want
        assert r["n_pixels"] == 768


# -- progressive (SOF2, T.81 Annex G) ------------------------------------

def test_progressive_matches_baseline_exactly():
    """The progressive encoder quantizes through the same
    _quantize_block as baseline, so decode must be PIXEL-IDENTICAL —
    across spectral-selection splits, successive-approximation
    depths, and per-scan restart intervals."""
    from maps_spark.functions.jpeg import (decode_jpeg, encode_jpeg,
                                           encode_jpeg_progressive)
    rng = np.random.RandomState(7)
    configs = [
        dict(al_dc=1, al_ac=1, bands=((1, 5), (6, 63))),
        dict(al_dc=0, al_ac=0, bands=((1, 63),)),
        dict(al_dc=2, al_ac=2, bands=((1, 2), (3, 20), (21, 63))),
        dict(al_dc=1, al_ac=1, bands=((1, 5), (6, 63)),
             restart_interval=2),
        dict(al_dc=3, al_ac=2, bands=((1, 63),), restart_interval=3),
    ]
    for shape in [(8, 8), (17, 23), (40, 48)]:
        g = rng.randint(0, 256, size=shape).astype(np.uint8)
        for q in (16, 4):
            base = decode_jpeg(encode_jpeg(g, q_luma=q))
            for cfg in configs:
                prog = decode_jpeg(
                    encode_jpeg_progressive(g, q_luma=q, **cfg))
                assert np.array_equal(base, prog), (shape, q, cfg)
    c = rng.randint(0, 256, size=(33, 41, 3)).astype(np.uint8)
    base = decode_jpeg(encode_jpeg(c, q_luma=16, q_chroma=24))
    for cfg in configs[:3]:
        prog = decode_jpeg(
            encode_jpeg_progressive(c, q_luma=16, q_chroma=24, **cfg))
        assert np.array_equal(base, prog), cfg


def test_progressive_eobrun_spans():
    """A mostly-flat strip forces EOBRUN > 1 in both the AC first
    pass (runs of all-zero-band blocks) and the refinement pass
    (EOB spans carrying correction bits): decode must still be
    pixel-identical to baseline."""
    from maps_spark.functions.jpeg import (decode_jpeg, encode_jpeg,
                                           encode_jpeg_progressive)
    g = np.full((8, 64 * 8), 128, dtype=np.uint8)
    g[3, 8 * 63 + 2] = 255  # AC energy only in the very last block
    g[5, 4] = 96            # ... and the very first
    base = decode_jpeg(encode_jpeg(g, q_luma=8))
    prog = decode_jpeg(encode_jpeg_progressive(g, q_luma=8))
    assert np.array_equal(base, prog)
    # EOBn symbols with r > 0 only exist in the flat _PROG_AC table;
    # the 62-block gap cannot be expressed without EOBRUN > 1, so a
    # byte-identical re-decode through the spans is the proof.


def test_progressive_handmade_bitstream():
    """A progressive stream assembled by-spec-by-hand (independent
    of encode_jpeg_progressive): one 8x8 block, quantized DC=6 at
    q=16 split across DC-first(Al=1) + DC-refine + AC-first +
    AC-refine scans. Dequant 96 -> every pixel rhu(96/8+128)=140."""
    from maps_spark.functions.jpeg import _STD_DC, decode_jpeg
    dqt = bytes([0x00]) + bytes([16] * 64)
    sof = struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
    dht_dc = bytes([0x00]) + bytes(_STD_DC[0]) + bytes(_STD_DC[1])
    # flat AC table: symbols 0..254 at 9 bits, 255 at 10 (EOB0 = sym
    # 0x00 -> code 000000000)
    counts = [0] * 16
    counts[8], counts[9] = 255, 1
    dht_ac = bytes([0x10]) + bytes(counts) + bytes(range(256))

    def sos(ss, se, ah, al):
        return (bytes([1, 1, 0x00])
                + bytes([ss, se, (ah << 4) | al]))

    payload = (b"\xff\xd8" + _seg(0xDB, dqt) + _seg(0xC2, sof)
               + _seg(0xC4, dht_dc) + _seg(0xC4, dht_ac)
               # DC first, Al=1: v=6>>1=3, cat 2 ('011') + bits '11',
               # 1-padded -> 0111 1111
               + _seg(0xDA, sos(0, 0, 0, 1)) + b"\x7f"
               # AC first 1..63, Al=1: EOB0 = 9 zero bits, 1-padded
               + _seg(0xDA, sos(1, 63, 0, 1)) + b"\x00\x7f"
               # DC refine Ah=1,Al=0: bit (6>>0)&1 = 0, 1-padded
               + _seg(0xDA, sos(0, 0, 1, 0)) + b"\x7f"
               # AC refine Ah=1,Al=0: EOB0 again
               + _seg(0xDA, sos(1, 63, 1, 0)) + b"\x00\x7f"
               + b"\xff\xd9")
    out = decode_jpeg(payload)
    assert out.shape == (8, 8)
    assert (out == 140).all()


def test_progressive_malformed_streams_normalize():
    """Mutation fuzz over a progressive payload: every truncation or
    byte flip either decodes (possibly to different pixels) or
    raises ValueError — never any other exception type."""
    from maps_spark.functions.jpeg import (decode_jpeg,
                                           encode_jpeg_progressive)
    rng = np.random.RandomState(11)
    g = rng.randint(0, 256, size=(16, 24)).astype(np.uint8)
    good = encode_jpeg_progressive(g, q_luma=8)
    for cut in range(2, len(good), max(1, len(good) // 60)):
        try:
            decode_jpeg(good[:cut])
        except ValueError:
            pass
    for _ in range(200):
        i = int(rng.randint(2, len(good)))
        b = bytearray(good)
        b[i] ^= 1 << int(rng.randint(8))
        try:
            decode_jpeg(bytes(b))
        except ValueError:
            pass
    # structural rejects with clear messages
    import pytest as _pytest
    with _pytest.raises(ValueError, match="spectral"):
        i = good.index(b"\xff\xda")
        ln = struct.unpack(">H", good[i + 2:i + 4])[0]
        bad = bytearray(good)
        bad[i + 2 + ln - 2] = 64  # Se = 64 in the first (DC) scan
        bad[i + 2 + ln - 3] = 1   # Ss = 1 so the band check trips
        decode_jpeg(bytes(bad))


def test_progressive_420_subsampled_handmade():
    """Hand-assembled 4:2:0 PROGRESSIVE stream (the encoder only
    writes 4:4:4, so this pins the decoder-only path): the DC scan
    is MCU-interleaved (4 luma + 1 Cb + 1 Cr blocks), while each AC
    scan walks the COMPONENT's own grid — 2x2 blocks for luma but
    1x1 for chroma (T.81 A.2.2), which nothing 4:4:4 can cover.
    Luma DC diffs of +5 per block at q=16 give quadrant means
    138/148/158/168; chroma stays 128, so RGB == replicated luma."""
    from maps_spark.functions.jpeg import decode_jpeg
    dqt = bytes([0x00]) + bytes([16] * 64)
    sof = (struct.pack(">BHHB", 8, 16, 16, 3)
           + bytes([1, 0x22, 0]) + bytes([2, 0x11, 0])
           + bytes([3, 0x11, 0]))
    one = bytes([1] + [0] * 15)           # a single length-1 code
    dht_dc0 = bytes([0x00]) + one + bytes([3])     # category 3
    dht_dc1 = bytes([0x01]) + one + bytes([0])     # category 0
    dht_ac0 = bytes([0x10]) + one + bytes([0x00])  # EOB

    def sos(comps, ss, se, ah, al):
        body = bytes([len(comps)])
        for cid, tt in comps:
            body += bytes([cid, tt])
        return _seg(0xDA, body + bytes([ss, se, (ah << 4) | al]))

    payload = (b"\xff\xd8" + _seg(0xDB, dqt) + _seg(0xC2, sof)
               + _seg(0xC4, dht_dc0) + _seg(0xC4, dht_dc1)
               + _seg(0xC4, dht_ac0)
               # DC scan, interleaved: 4x ('0'+'101') + Cb '0' + Cr
               # '0' = 18 bits, 1-padded to 0x55 0x55 0x3F
               + sos([(1, 0x00), (2, 0x10), (3, 0x10)], 0, 0, 0, 0)
               + b"\x55\x55\x3f"
               # AC luma: component grid 2x2 -> 4 EOB bits
               + sos([(1, 0x00)], 1, 63, 0, 0) + b"\x0f"
               # AC chroma: component grid 1x1 -> 1 EOB bit each
               + sos([(2, 0x00)], 1, 63, 0, 0) + b"\x7f"
               + sos([(3, 0x00)], 1, 63, 0, 0) + b"\x7f"
               + b"\xff\xd9")
    out = decode_jpeg(payload)
    assert out.shape == (16, 16, 3)
    want = np.zeros((16, 16), dtype=np.uint8)
    want[:8, :8], want[:8, 8:] = 138, 148
    want[8:, :8], want[8:, 8:] = 158, 168
    for c in range(3):  # chroma flat at 128 -> RGB == luma
        assert np.array_equal(out[:, :, c], want), c
