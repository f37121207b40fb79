"""Baseline sequential JPEG codec (ITU-T T.81), pure numpy/stdlib.

Closes the engine's last multimodal stub: the decoder implements the
real baseline pipeline — marker parse, DQT/DHT table load, canonical
Huffman entropy decode with byte-unstuffing, DC prediction + EXTEND,
zigzag dequantization, 2-D IDCT, chroma upsampling and YCbCr->RGB —
for 8-bit grayscale and 3-component YCbCr at any sampling factors
h,v in {1,2} (covers 4:4:4, 4:2:2, 4:2:0), including DRI/RSTn restart
intervals (DC prediction resets, sequence-checked markers).
Progressive, arithmetic coding, and 12-bit raise ValueError (declared
out of scope, like interlaced PNG).

The encoder exists to synthesize test payloads engine-side (grayscale
and 4:4:4 color, standard Annex K style flow with caller-supplied
quantization tables). JPEG is lossy, so unlike PNG/WAV the round-trip
is approximate — EXCEPT for images that are flat per 8x8 block: a
flat block's DCT is a single DC coefficient, so quantization has a
closed form (``round(8v/q)*q / 8``) any SQL engine can recompute.
That is what the ``media_jpeg_decode`` gate checks; general images
are pinned by bounded-error round-trips and an independently
hand-assembled bitstream in the tests.

Rounding contract: every float->pixel step uses floor(x + 0.5)
(round-half-up) and clamps to [0, 255], so the oracle can mirror the
arithmetic exactly.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag scan order: index k -> linear position row*8+col
ZIGZAG = np.array([
    0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], dtype=np.int64)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix M: F = M f M^T, f = M^T F M."""
    x = np.arange(8)
    u = np.arange(8)[:, None]
    m = np.cos((2 * x + 1) * u * np.pi / 16) / 2.0
    m[0] *= 1.0 / np.sqrt(2.0)
    return m


_M = _dct_matrix()


def _round_half_up(x: np.ndarray) -> np.ndarray:
    return np.floor(x + 0.5)


# -- Huffman ------------------------------------------------------------

def _canonical_codes(counts: list[int], symbols: list[int]) -> dict:
    """{(length, code): symbol} from the DHT 16-count + symbol list."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment with FF00
    byte-unstuffing; raises ValueError on markers/exhaustion."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bit = 0

    def read_bit(self) -> int:
        d = self.data
        if self.pos >= len(d):
            raise ValueError("entropy data exhausted")
        byte = d[self.pos]
        if byte == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else None
            if nxt != 0x00:
                raise ValueError("marker inside entropy data")
        b = (byte >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
            if byte == 0xFF:  # skip the stuffed 0x00
                self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table: dict) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.pos += 1
            if (self.pos <= len(self.data)
                    and self.data[self.pos - 1] == 0xFF):
                self.pos += 1

    def read_restart(self) -> int:
        """Consume an RSTn marker at an MCU boundary (T.81 restart):
        discard padding bits, then expect FFD0..FFD7."""
        self.align()
        d = self.data
        if (self.pos + 2 > len(d) or d[self.pos] != 0xFF
                or not 0xD0 <= d[self.pos + 1] <= 0xD7):
            raise ValueError("expected restart marker")
        m = d[self.pos + 1] & 7
        self.pos += 2
        return m


def _extend(bits: int, s: int) -> int:
    """T.81 EXTEND: map s magnitude bits to a signed value."""
    if s == 0:
        return 0
    return bits if bits >= (1 << (s - 1)) else bits - (1 << s) + 1


# -- decoder ------------------------------------------------------------

def decode_jpeg(payload: bytes) -> np.ndarray:
    """REAL baseline JPEG decode: (h, w) uint8 for grayscale, (h, w, 3)
    RGB for YCbCr. ValueError on non-baseline or malformed input —
    including structurally-malformed streams (short segments, scans
    referencing undefined tables): every parse failure is normalized to
    ValueError so mapInPandas decode stages honor the
    "undecodable yields decode_ok=false, never crash" contract."""
    try:
        return _decode_jpeg(payload)
    except ValueError:
        raise
    except (struct.error, KeyError, IndexError, OverflowError,
            ZeroDivisionError) as e:
        raise ValueError(f"malformed JPEG stream: {e!r}") from e


def _decode_jpeg(payload: bytes) -> np.ndarray:
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (no SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}  # (class, id) -> codes
    frame = None
    restart_interval = 0
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise ValueError("expected marker")
        marker = payload[pos + 1]
        if marker == 0xD8:
            pos += 2
            continue
        (seglen,) = struct.unpack(">H", payload[pos + 2:pos + 4])
        seg = payload[pos + 4:pos + 2 + seglen]
        if len(seg) != seglen - 2:
            raise ValueError("truncated segment")
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                q = np.frombuffer(seg[i + 1:i + 65], dtype=np.uint8)
                if len(q) != 64:
                    raise ValueError("short quant table")
                qtables[tq] = q.astype(np.int64)
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0xF
                counts = list(seg[i + 1:i + 17])
                nsym = sum(counts)
                symbols = list(seg[i + 17:i + 17 + nsym])
                htables[(tc, th)] = _canonical_codes(counts, symbols)
                i += 17 + nsym
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise ValueError("only 8-bit baseline supported")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                if (hv >> 4) == 0 or (hv & 0xF) == 0:
                    raise ValueError("zero sampling factor in SOF")
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF,
                              "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("non-baseline JPEG unsupported")
        elif marker == 0xDD:  # DRI
            if len(seg) < 2:
                raise ValueError("short DRI segment")
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS -> entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            if ns != len(frame["comps"]):
                # Legal per T.81, but this decoder only handles the
                # single interleaved scan baseline encoders emit.
                raise ValueError("non-interleaved scans unsupported")
            sel = {}
            for c in range(ns):
                cs, tt = seg[1 + 2 * c:3 + 2 * c]
                sel[cs] = (tt >> 4, tt & 0xF)
            if any(c["id"] not in sel for c in frame["comps"]):
                raise ValueError("SOS component ids do not match SOF")
            data_pos = pos + 2 + seglen
            return _decode_scan(payload, data_pos, frame, sel,
                                qtables, htables, restart_interval)
        pos += 2 + seglen
    raise ValueError("no SOS marker")


def _decode_block(br: _BitReader, dc_tab: dict, ac_tab: dict,
                  q: np.ndarray, pred: int) -> tuple[np.ndarray, int]:
    """One 8x8 block: returns (spatial block float64, new DC pred)."""
    s = br.decode_symbol(dc_tab)
    if s > 15:  # T.81 F.1.2.1.1: DC categories are 0..11 (16 in 12-bit)
        raise ValueError(f"invalid DC category {s}")
    diff = _extend(br.read_bits(s), s)
    dc = pred + diff
    coeff = np.zeros(64, dtype=np.int64)
    coeff[0] = dc
    k = 1
    while k < 64:
        rs = br.decode_symbol(ac_tab)
        r, size = rs >> 4, rs & 0xF
        if size == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC index overflow")
        coeff[k] = _extend(br.read_bits(size), size)
        k += 1
    dq = np.zeros(64, dtype=np.float64)
    dq[ZIGZAG] = coeff * q  # zigzag k -> natural position
    spatial = _M.T @ dq.reshape(8, 8) @ _M
    # snap values within 1e-6 of the half-integer grid (DC-only blocks
    # land exactly on it in exact arithmetic) so the final
    # round-half-up boundary is deterministic and oracle-matchable
    near2 = np.round(spatial * 2.0)
    spatial = np.where(np.abs(spatial * 2.0 - near2) < 1e-6,
                       near2 / 2.0, spatial)
    return spatial, dc


def _decode_scan(payload, pos, frame, sel, qtables, htables,
                 restart_interval=0):
    comps = frame["comps"]
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = []
    for c in comps:
        planes.append(np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8),
                               dtype=np.float64))
    preds = [0] * len(comps)
    br = _BitReader(payload, pos)
    mcu_i = 0
    expect_rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if (restart_interval and mcu_i
                    and mcu_i % restart_interval == 0):
                got = br.read_restart()
                if got != expect_rst:
                    raise ValueError("restart marker out of sequence")
                expect_rst = (expect_rst + 1) & 7
                preds = [0] * len(comps)  # DC prediction resets
            mcu_i += 1
            for ci, c in enumerate(comps):
                dc_tab = htables.get((0, sel[c["id"]][0]))
                ac_tab = htables.get((1, sel[c["id"]][1]))
                q = qtables.get(c["tq"])
                if dc_tab is None or ac_tab is None or q is None:
                    raise ValueError("missing table for component")
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        blk, preds[ci] = _decode_block(
                            br, dc_tab, ac_tab, q, preds[ci])
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = blk
    out_planes = []
    for ci, c in enumerate(comps):
        p = planes[ci] + 128.0
        # upsample to full resolution by pixel replication
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        out_planes.append(p[:h, :w])
    if len(out_planes) == 1:
        g = np.clip(_round_half_up(out_planes[0]), 0, 255)
        return g.astype(np.uint8)
    if len(out_planes) != 3:
        raise ValueError(f"unsupported component count {len(out_planes)}")
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(_round_half_up(rgb), 0, 255).astype(np.uint8)


# -- encoder (test-payload synthesis) -----------------------------------

# Annex K style Huffman specs (the standard tables): (counts, symbols)
_STD_DC = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
           list(range(12)))
_STD_AC_COUNTS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
_STD_AC_SYMBOLS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]
_STD_AC = (_STD_AC_COUNTS, _STD_AC_SYMBOLS)


def _encode_codes(counts, symbols) -> dict:
    """{symbol: (code, length)} for the encoder."""
    inv = {}
    for (length, code), sym in _canonical_codes(counts, symbols).items():
        inv[sym] = (code, length)
    return inv


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | code
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
            self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-pad per spec


def _category(v: int) -> int:
    return 0 if v == 0 else int(abs(v)).bit_length()


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def encode_jpeg(img: np.ndarray,
                q_luma: np.ndarray | int = 16,
                q_chroma: np.ndarray | int = 16,
                restart_interval: int = 0) -> bytes:
    """Baseline JPEG encoder for (h, w) grayscale or (h, w, 3) RGB
    uint8 (4:4:4, standard Huffman tables). ``q_*`` is a scalar
    (uniform quantization — the closed-form gate regime) or a full
    64-entry table in zigzag order. ``restart_interval`` > 0 emits
    DRI + RSTn markers every that many MCUs (and the decoder resets
    its DC prediction there), matching real-world baseline files."""
    img = np.asarray(img, dtype=np.uint8)
    gray = img.ndim == 2
    h, w = img.shape[:2]

    def qtab(q):
        t = (np.full(64, int(q), dtype=np.int64)
             if np.isscalar(q) else np.asarray(q, dtype=np.int64))
        if t.shape != (64,):
            raise ValueError("quant table must have 64 entries")
        return t

    ql, qc = qtab(q_luma), qtab(q_chroma)
    if gray:
        planes = [img.astype(np.float64) - 128.0]
        qs = [ql]
    else:
        rgb = img.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y - 128.0, cb - 128.0, cr - 128.0]
        qs = [ql, qc, qc]

    dc_codes = _encode_codes(*_STD_DC)
    ac_codes = _encode_codes(*_STD_AC)
    bw = _BitWriter()
    preds = [0] * len(planes)
    # pad planes to block multiples by edge replication
    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    padded = []
    for p in planes:
        pp = np.empty((ph, pw), dtype=np.float64)
        pp[:h, :w] = p
        pp[h:, :w] = p[h - 1:h, :]
        pp[:, w:] = pp[:, w - 1:w]
        padded.append(pp)
    mcu_i = 0
    rst_n = 0
    for my in range(ph // 8):
        for mx in range(pw // 8):
            if (restart_interval and mcu_i
                    and mcu_i % restart_interval == 0):
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + rst_n])
                rst_n = (rst_n + 1) & 7
                preds = [0] * len(planes)
            mcu_i += 1
            for ci, p in enumerate(padded):
                f = p[my * 8:my * 8 + 8, mx * 8:mx * 8 + 8]
                coef = _M @ f @ _M.T
                zz = coef.reshape(-1)[ZIGZAG]
                # snap near-integer coefficients (flat blocks give
                # exactly-integer DCs in exact arithmetic): keeps the
                # round-half-up quantization boundary deterministic
                # and matching the closed-form oracle
                near = np.round(zz)
                zz = np.where(np.abs(zz - near) < 1e-6, near, zz)
                qv = _round_half_up(zz / qs[ci]).astype(np.int64)
                # DC
                diff = int(qv[0]) - preds[ci]
                preds[ci] = int(qv[0])
                s = _category(diff)
                code, ln = dc_codes[s]
                bw.write(code, ln)
                if s:
                    bits = diff if diff >= 0 else diff + (1 << s) - 1
                    bw.write(bits & ((1 << s) - 1), s)
                # AC
                run = 0
                for k in range(1, 64):
                    v = int(qv[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = ac_codes[0xF0]
                        bw.write(code, ln)
                        run -= 16
                    s = _category(v)
                    code, ln = ac_codes[(run << 4) | s]
                    bw.write(code, ln)
                    bits = v if v >= 0 else v + (1 << s) - 1
                    bw.write(bits & ((1 << s) - 1), s)
                    run = 0
                if run:
                    code, ln = ac_codes[0x00]  # EOB
                    bw.write(code, ln)
    bw.flush()

    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0x00]) + bytes(ql.astype(np.uint8)))
    if not gray:
        out += _seg(0xDB, bytes([0x01]) + bytes(qc.astype(np.uint8)))
    nc = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for c in range(nc):
        sof += bytes([c + 1, 0x11, 0 if c == 0 else 1])
    out += _seg(0xC0, sof)
    out += _seg(0xC4, bytes([0x00]) + bytes(_STD_DC[0])
                + bytes(_STD_DC[1]))
    out += _seg(0xC4, bytes([0x10]) + bytes(_STD_AC[0])
                + bytes(_STD_AC[1]))
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([nc])
    for c in range(nc):
        sos += bytes([c + 1, 0x00])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


def flat_block_roundtrip_value(v: int, q: int) -> int:
    """Closed form for a flat 8x8 block through encode+decode with a
    uniform quantizer q: DC = 8*(v-128); quantized = rhu(DC/q);
    decoded = clamp(rhu(quantized*q/8 + 128)). rhu = floor(x+0.5).
    This is the arithmetic the media_jpeg_decode oracle recomputes."""
    import math
    dc = 8.0 * (v - 128.0)
    qdc = math.floor(dc / q + 0.5)
    rec = math.floor(qdc * q / 8.0 + 128.0 + 0.5)
    return max(0, min(255, rec))
