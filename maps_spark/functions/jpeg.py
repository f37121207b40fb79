"""Baseline + progressive JPEG codec (ITU-T T.81), pure numpy/stdlib.

Closes the engine's last multimodal stub: the decoder implements the
real baseline pipeline — marker parse, DQT/DHT table load, canonical
Huffman entropy decode with byte-unstuffing, DC prediction + EXTEND,
zigzag dequantization, 2-D IDCT, chroma upsampling and YCbCr->RGB —
for 8-bit grayscale and 3-component YCbCr at any sampling factors
h,v in {1,2} (covers 4:4:4, 4:2:2, 4:2:0), including DRI/RSTn restart
intervals (DC prediction resets, sequence-checked markers).

Progressive JPEG (SOF2) is decoded too — the full T.81 Annex G
Huffman path: multi-scan coefficient accumulation, spectral selection
(Ss/Se bands, non-interleaved AC scans over each component's own
block grid), successive approximation (DC first/refine at any Al, AC
first with EOBRUN spans, the AC refinement correction-bit algorithm
of G.7.2 incl. ZRL-over-nonzero-history and EOB-span correction
bits), DHT redefinition between scans, and per-scan restart
intervals (DC prediction + EOBRUN reset). Arithmetic coding and
12-bit precision raise ValueError (no public-stdlib arithmetic
decoder; the only remaining JPEG descope).

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
    """REAL JPEG decode — baseline (SOF0) and progressive (SOF2):
    (h, w) uint8 for grayscale, (h, w, 3) RGB for YCbCr. ValueError
    on arithmetic/lossless/12-bit variants or malformed input —
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
    coefs = None  # progressive: per-component (by, bx, 64) zigzag
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise ValueError("expected marker")
        marker = payload[pos + 1]
        if marker == 0xD8:
            pos += 2
            continue
        if marker == 0xD9:  # EOI: progressive decode finishes here
            break
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
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                if (hv >> 4) == 0 or (hv & 0xF) == 0:
                    raise ValueError("zero sampling factor in SOF")
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF,
                              "tq": tq})
            frame = {"h": h, "w": w, "comps": comps,
                     "progressive": marker == 0xC2}
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("unsupported SOF type (arithmetic/"
                             "lossless/hierarchical)")
        elif marker == 0xDD:  # DRI
            if len(seg) < 2:
                raise ValueError("short DRI segment")
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS -> entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            data_pos = pos + 2 + seglen
            if frame.get("progressive"):
                if coefs is None:
                    coefs = _alloc_coefs(frame)
                pos = _decode_progressive_scan(
                    payload, data_pos, seg, frame, qtables, htables,
                    restart_interval, coefs)
                continue
            ns = seg[0]
            if ns != len(frame["comps"]):
                # Legal per T.81, but the sequential path only handles
                # the single interleaved scan baseline encoders emit.
                raise ValueError("non-interleaved scans unsupported")
            sel = {}
            for c in range(ns):
                cs, tt = seg[1 + 2 * c:3 + 2 * c]
                sel[cs] = (tt >> 4, tt & 0xF)
            if any(c["id"] not in sel for c in frame["comps"]):
                raise ValueError("SOS component ids do not match SOF")
            return _decode_scan(payload, data_pos, frame, sel,
                                qtables, htables, restart_interval)
        pos += 2 + seglen
    if coefs is not None:
        return _finish_progressive(frame, coefs, qtables)
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
    return _planes_to_image(planes, comps, h, w, hmax, vmax)


def _planes_to_image(planes, comps, h, w, hmax, vmax) -> np.ndarray:
    """Shared decode tail: level-shift, chroma upsample by pixel
    replication, crop, and (for 3 components) YCbCr->RGB with the
    round-half-up contract. ``planes`` are centered (pre +128)."""
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


# -- progressive decoder (T.81 Annex G, Huffman path) -------------------

def _alloc_coefs(frame) -> list:
    """Per-component MCU-padded (block_y, block_x, 64) zigzag-order
    coefficient accumulators shared by every scan of the image."""
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    frame["mcux"] = (frame["w"] + 8 * hmax - 1) // (8 * hmax)
    frame["mcuy"] = (frame["h"] + 8 * vmax - 1) // (8 * vmax)
    return [np.zeros((frame["mcuy"] * c["v"], frame["mcux"] * c["h"],
                      64), dtype=np.int64) for c in comps]


def _comp_grid(frame, c) -> tuple[int, int]:
    """(blocks_x, blocks_y) of a component's OWN grid — the block
    count of a non-interleaved scan (T.81 A.2.2: ceil of the scaled
    component dimensions, NOT the MCU-padded grid)."""
    hmax = max(x["h"] for x in frame["comps"])
    vmax = max(x["v"] for x in frame["comps"])
    cw = (frame["w"] * c["h"] + hmax - 1) // hmax
    ch = (frame["h"] * c["v"] + vmax - 1) // vmax
    return (cw + 7) // 8, (ch + 7) // 8


def _decode_progressive_scan(payload, pos, seg, frame, qtables,
                             htables, restart_interval, coefs) -> int:
    """Decode one progressive scan into ``coefs``; returns the
    payload offset of the marker that follows the entropy data."""
    comps = frame["comps"]
    ns = seg[0]
    if len(seg) < 1 + 2 * ns + 3:
        raise ValueError("short SOS segment")
    scomps = []
    for i in range(ns):
        cs, tt = seg[1 + 2 * i:3 + 2 * i]
        ci = next((j for j, c in enumerate(comps) if c["id"] == cs),
                  None)
        if ci is None:
            raise ValueError("SOS component id not in SOF")
        scomps.append((ci, tt >> 4, tt & 0xF))
    ss, se, ahal = seg[1 + 2 * ns:4 + 2 * ns]
    ah, al = ahal >> 4, ahal & 0xF
    if ss > se or se > 63:
        raise ValueError("invalid spectral band")
    if ss == 0 and se != 0:
        raise ValueError("DC scan must have Se=0")
    if ss > 0 and ns != 1:
        raise ValueError("AC scans must be non-interleaved")
    br = _BitReader(payload, pos)
    if ss == 0:
        _scan_dc(br, frame, scomps, htables, restart_interval,
                 coefs, ah, al)
    else:
        _scan_ac(br, frame, scomps[0], htables, restart_interval,
                 coefs, ss, se, ah, al)
    br.align()
    return br.pos


def _scan_units(frame, scomps):
    """Restart-unit block coordinates for a scan: MCU-interleaved
    when Ns > 1, the component's own raster grid when Ns == 1."""
    comps = frame["comps"]
    if len(scomps) > 1:
        for my in range(frame["mcuy"]):
            for mx in range(frame["mcux"]):
                unit = []
                for ci, _, _ in scomps:
                    c = comps[ci]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            unit.append((ci, my * c["v"] + by,
                                         mx * c["h"] + bx))
                yield unit
    else:
        ci = scomps[0][0]
        bw, bh = _comp_grid(frame, comps[ci])
        for by in range(bh):
            for bx in range(bw):
                yield [(ci, by, bx)]


def _scan_dc(br, frame, scomps, htables, ri, coefs, ah, al):
    """DC scan: first pass (Ah=0) Huffman-decodes point-transformed
    DC differences; refinement passes read one bit per block."""
    tabs = {}
    if ah == 0:
        for ci, td, _ in scomps:
            t = htables.get((0, td))
            if t is None:
                raise ValueError("missing DC table")
            tabs[ci] = t
    preds = {ci: 0 for ci, _, _ in scomps}
    unit_i = 0
    rst = 0
    for unit in _scan_units(frame, scomps):
        if ri and unit_i and unit_i % ri == 0:
            got = br.read_restart()
            if got != rst:
                raise ValueError("restart marker out of sequence")
            rst = (rst + 1) & 7
            preds = dict.fromkeys(preds, 0)
        unit_i += 1
        for ci, by, bx in unit:
            blk = coefs[ci][by, bx]
            if ah == 0:
                s = br.decode_symbol(tabs[ci])
                if s > 15:
                    raise ValueError(f"invalid DC category {s}")
                preds[ci] += _extend(br.read_bits(s), s)
                blk[0] = preds[ci] << al
            elif br.read_bit():
                blk[0] |= 1 << al


def _scan_ac(br, frame, scomp, htables, ri, coefs, ss, se, ah, al):
    """AC scan over one component's band [Ss, Se]: first pass with
    EOBRUN spans, or the G.7.2 refinement correction-bit pass."""
    ci, _, ta = scomp
    tab = htables.get((1, ta))
    if tab is None:
        raise ValueError("missing AC table")
    bw, bh = _comp_grid(frame, frame["comps"][ci])
    eobrun = 0
    unit_i = 0
    rst = 0
    for by in range(bh):
        for bx in range(bw):
            if ri and unit_i and unit_i % ri == 0:
                got = br.read_restart()
                if got != rst:
                    raise ValueError("restart marker out of sequence")
                rst = (rst + 1) & 7
                eobrun = 0
            unit_i += 1
            blk = coefs[ci][by, bx]
            if ah == 0:
                eobrun = _first_ac_block(br, tab, blk, ss, se, al,
                                         eobrun)
            else:
                eobrun = _refine_ac_block(br, tab, blk, ss, se, al,
                                          eobrun)


def _first_ac_block(br, tab, blk, ss, se, al, eobrun) -> int:
    """First AC pass for one block: run/size symbols with the point
    transform applied on write; EOBn symbols start a run of blocks
    whose band is entirely zero at this precision."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = br.decode_symbol(tab)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:  # ZRL: skip 16 zeros
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += br.read_bits(r)
            break
        k += r
        if k > se:
            raise ValueError("AC index outside spectral band")
        blk[k] = _extend(br.read_bits(s), s) << al
        k += 1
    return eobrun


def _refine_ac_block(br, tab, blk, ss, se, al, eobrun) -> int:
    """AC refinement (T.81 G.7.2): newly-significant coefficients
    arrive as ±1<<Al; every nonzero-history coefficient passed on the
    way — including the EOB span — contributes one correction bit."""
    p1, m1 = 1 << al, -(1 << al)
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = br.decode_symbol(tab)
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r < 15:  # EOBn: the span handler below refines
                    # this block's tail, then decrements (unlike the
                    # first pass, no -1 here — T.81 G.7.2)
                    eobrun = 1 << r
                    if r:
                        eobrun += br.read_bits(r)
                    break
                newval = 0  # ZRL: 16 zero-history positions, no coef
            elif s == 1:
                newval = p1 if br.read_bit() else m1
            else:
                raise ValueError("invalid AC refinement magnitude")
            # advance over r zero-history positions, reading
            # correction bits for nonzero-history coefficients passed
            while k <= se:
                if blk[k] != 0:
                    if br.read_bit() and (blk[k] & p1) == 0:
                        blk[k] += p1 if blk[k] >= 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if s and k <= se:
                blk[k] = newval
            k += 1
    if eobrun > 0:
        while k <= se:  # EOB span: correction bits only
            if blk[k] != 0 and br.read_bit() and (blk[k] & p1) == 0:
                blk[k] += p1 if blk[k] >= 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _finish_progressive(frame, coefs, qtables) -> np.ndarray:
    """EOI: dequantize + IDCT every accumulated block (vectorized
    over the whole component), then the shared upsample/color tail —
    same snap + round-half-up contract as the sequential path."""
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    planes = []
    for ci, c in enumerate(comps):
        q = qtables.get(c["tq"])
        if q is None:
            raise ValueError("missing quant table for component")
        arr = coefs[ci]
        bv, bh = arr.shape[:2]
        dq = np.zeros((bv, bh, 64), dtype=np.float64)
        dq[..., ZIGZAG] = arr * q
        spatial = np.einsum("ij,abjk,kl->abil", _M.T,
                            dq.reshape(bv, bh, 8, 8), _M)
        near2 = np.round(spatial * 2.0)
        spatial = np.where(np.abs(spatial * 2.0 - near2) < 1e-6,
                           near2 / 2.0, spatial)
        planes.append(spatial.transpose(0, 2, 1, 3)
                      .reshape(bv * 8, bh * 8))
    return _planes_to_image(planes, comps, frame["h"], frame["w"],
                            hmax, vmax)


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


def _qtab(q) -> np.ndarray:
    t = (np.full(64, int(q), dtype=np.int64)
         if np.isscalar(q) else np.asarray(q, dtype=np.int64))
    if t.shape != (64,):
        raise ValueError("quant table must have 64 entries")
    return t


def _quantize_block(f: np.ndarray, q: np.ndarray) -> np.ndarray:
    """DCT + zigzag + near-integer snap + round-half-up quantize of
    one centered 8x8 block: the single source of truth for the
    baseline AND progressive encoders (the progressive-vs-baseline
    pixel-identical twin test depends on both quantizing alike)."""
    coef = _M @ f @ _M.T
    zz = coef.reshape(-1)[ZIGZAG]
    # snap near-integer coefficients (flat blocks give exactly-
    # integer DCs in exact arithmetic): keeps the round-half-up
    # quantization boundary deterministic and oracle-matchable
    near = np.round(zz)
    zz = np.where(np.abs(zz - near) < 1e-6, near, zz)
    return _round_half_up(zz / q).astype(np.int64)


def _encoder_planes(img: np.ndarray, ql: np.ndarray,
                    qc: np.ndarray):
    """Shared encoder front: RGB->YCbCr (or grayscale), level shift,
    and edge-replication padding to 8x8 block multiples. Returns
    (padded planes, per-plane quant tables, gray flag, h, w)."""
    img = np.asarray(img, dtype=np.uint8)
    gray = img.ndim == 2
    h, w = img.shape[:2]
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
    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    padded = []
    for p in planes:
        pp = np.empty((ph, pw), dtype=np.float64)
        pp[:h, :w] = p
        pp[h:, :w] = p[h - 1:h, :]
        pp[:, w:] = pp[:, w - 1:w]
        padded.append(pp)
    return padded, qs, gray, h, w


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
    ql, qc = _qtab(q_luma), _qtab(q_chroma)
    padded, qs, gray, h, w = _encoder_planes(img, ql, qc)
    ph, pw = padded[0].shape

    dc_codes = _encode_codes(*_STD_DC)
    ac_codes = _encode_codes(*_STD_AC)
    bw = _BitWriter()
    preds = [0] * len(padded)
    mcu_i = 0
    rst_n = 0
    for my in range(ph // 8):
        for mx in range(pw // 8):
            if (restart_interval and mcu_i
                    and mcu_i % restart_interval == 0):
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + rst_n])
                rst_n = (rst_n + 1) & 7
                preds = [0] * len(padded)
            mcu_i += 1
            for ci, p in enumerate(padded):
                f = p[my * 8:my * 8 + 8, mx * 8:mx * 8 + 8]
                qv = _quantize_block(f, qs[ci])
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


# Progressive AC Huffman spec: all 256 run/size symbols, 255 at 9
# bits + 0xFF at 10 (a DHT count byte caps at 255 per length). The
# Annex K table lacks the EOBn symbols (0x10..0xE0) progressive
# scans need for EOBRUN > 1, so the progressive encoder carries its
# own flat canonical table (decoders rebuild it from the DHT counts
# like any other; code space 255/512 + 1/1024 is prefix-free).
_PROG_AC = ([0, 0, 0, 0, 0, 0, 0, 0, 255, 1, 0, 0, 0, 0, 0, 0],
            list(range(256)))


def _pt_toward_zero(v: int, al: int) -> int:
    """AC point transform: divide by 2^Al truncating toward zero
    (T.81 G.1.2.2 — DC uses an arithmetic shift instead)."""
    return v >> al if v >= 0 else -((-v) >> al)


def encode_jpeg_progressive(img: np.ndarray,
                            q_luma: np.ndarray | int = 16,
                            q_chroma: np.ndarray | int = 16,
                            al_dc: int = 1, al_ac: int = 1,
                            bands: tuple = ((1, 5), (6, 63)),
                            restart_interval: int = 0) -> bytes:
    """Progressive JPEG encoder (SOF2) for (h, w) grayscale or
    (h, w, 3) RGB uint8 at 4:4:4 — the test-payload twin of
    :func:`encode_jpeg`, quantizing through the same
    :func:`_quantize_block`, so a progressive decode must be
    pixel-identical to the baseline decode of the same image.

    Scan script: interleaved DC first at ``Al=al_dc``; per-component
    AC first scans over each ``bands`` entry at ``Al=al_ac``; DC
    refinement passes down to 0; AC refinement passes down to 0 —
    exercising spectral selection, successive approximation, EOBRUN
    spans (via the flat ``_PROG_AC`` table), and the G.7.2
    correction-bit algorithm. ``restart_interval`` > 0 emits RSTn
    every that many MCUs/blocks inside every scan."""
    ql, qc = _qtab(q_luma), _qtab(q_chroma)
    padded, qs, gray, h, w = _encoder_planes(img, ql, qc)
    ph, pw = padded[0].shape
    by_n, bx_n = ph // 8, pw // 8
    nc = len(padded)
    lo_prev = 0
    for lo, hi in bands:
        if not (1 <= lo <= hi <= 63 and lo > lo_prev):
            raise ValueError("bands must be increasing within 1..63")
        lo_prev = hi

    # quantize every block once; scans re-read slices of this
    qv = np.empty((nc, by_n, bx_n, 64), dtype=np.int64)
    for ci, p in enumerate(padded):
        for my in range(by_n):
            for mx in range(bx_n):
                qv[ci, my, mx] = _quantize_block(
                    p[my * 8:my * 8 + 8, mx * 8:mx * 8 + 8], qs[ci])

    dc_codes = _encode_codes(*_STD_DC)
    ac_codes = _encode_codes(*_PROG_AC)

    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0x00]) + bytes(ql.astype(np.uint8)))
    if not gray:
        out += _seg(0xDB, bytes([0x01]) + bytes(qc.astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for c in range(nc):
        sof += bytes([c + 1, 0x11, 0 if c == 0 else 1])
    out += _seg(0xC2, sof)
    out += _seg(0xC4, bytes([0x00]) + bytes(_STD_DC[0])
                + bytes(_STD_DC[1]))
    out += _seg(0xC4, bytes([0x10]) + bytes(_PROG_AC[0])
                + bytes(_PROG_AC[1]))
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))

    def sos_header(comp_ids, ss, se, ah, al) -> bytes:
        body = bytes([len(comp_ids)])
        for cid in comp_ids:
            body += bytes([cid + 1, 0x00])
        return _seg(0xDA, body + bytes([ss, se, (ah << 4) | al]))

    def emit_scan(kind, comp_ids, ss, se, ah, al):
        out.extend(sos_header(comp_ids, ss, se, ah, al))
        bw = _BitWriter()
        rst = [0]

        def restart():
            bw.flush()
            bw.out += bytes([0xFF, 0xD0 + rst[0]])
            rst[0] = (rst[0] + 1) & 7

        if kind == "dc":
            preds = dict.fromkeys(comp_ids, 0)
            unit_i = 0
            for my in range(by_n):
                for mx in range(bx_n):
                    if (restart_interval and unit_i
                            and unit_i % restart_interval == 0):
                        restart()
                        preds = dict.fromkeys(preds, 0)
                    unit_i += 1
                    for ci in comp_ids:
                        v = int(qv[ci, my, mx, 0]) >> al
                        if ah == 0:
                            diff = v - preds[ci]
                            preds[ci] = v
                            s = _category(diff)
                            code, ln = dc_codes[s]
                            bw.write(code, ln)
                            if s:
                                bits = (diff if diff >= 0
                                        else diff + (1 << s) - 1)
                                bw.write(bits & ((1 << s) - 1), s)
                        else:
                            bw.write(v & 1, 1)
        elif kind == "ac_first":
            ci = comp_ids[0]
            eobrun = [0]

            def flush_eob():
                if eobrun[0] > 0:
                    r = eobrun[0].bit_length() - 1
                    code, ln = ac_codes[r << 4]
                    bw.write(code, ln)
                    if r:
                        bw.write(eobrun[0] - (1 << r), r)
                    eobrun[0] = 0

            unit_i = 0
            for my in range(by_n):
                for mx in range(bx_n):
                    if (restart_interval and unit_i
                            and unit_i % restart_interval == 0):
                        flush_eob()
                        restart()
                    unit_i += 1
                    vals = [_pt_toward_zero(int(v), al)
                            for v in qv[ci, my, mx, ss:se + 1]]
                    if not any(vals):
                        eobrun[0] += 1
                        if eobrun[0] == 0x7FFF:
                            flush_eob()
                        continue
                    flush_eob()
                    run = 0
                    for v in vals:
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
                        eobrun[0] = 1
            flush_eob()
        else:  # ac_refine — mirror of the decoder's G.7.2 algorithm
            ci = comp_ids[0]
            eobrun = [0]
            be_bits: list[int] = []

            def flush_eob():
                if eobrun[0] > 0:
                    r = eobrun[0].bit_length() - 1
                    code, ln = ac_codes[r << 4]
                    bw.write(code, ln)
                    if r:
                        bw.write(eobrun[0] - (1 << r), r)
                    eobrun[0] = 0
                    for b in be_bits:
                        bw.write(b, 1)
                    be_bits.clear()

            unit_i = 0
            for my in range(by_n):
                for mx in range(bx_n):
                    if (restart_interval and unit_i
                            and unit_i % restart_interval == 0):
                        flush_eob()
                        restart()
                    unit_i += 1
                    blk = qv[ci, my, mx]
                    absv = [abs(int(v)) >> al
                            for v in blk[ss:se + 1]]
                    negs = [int(v) < 0 for v in blk[ss:se + 1]]
                    eob_pos = ss - 1
                    for i, t in enumerate(absv):
                        if t == 1:
                            eob_pos = ss + i
                    r = 0
                    brb: list[int] = []
                    for i, t in enumerate(absv):
                        k = ss + i
                        if t == 0:
                            r += 1
                            continue
                        while r > 15 and k <= eob_pos:
                            flush_eob()
                            code, ln = ac_codes[0xF0]
                            bw.write(code, ln)
                            r -= 16
                            for b in brb:
                                bw.write(b, 1)
                            brb = []
                        if t > 1:  # old-significant: correction bit
                            brb.append(t & 1)
                            continue
                        flush_eob()
                        code, ln = ac_codes[(r << 4) | 1]
                        bw.write(code, ln)
                        bw.write(0 if negs[i] else 1, 1)
                        for b in brb:
                            bw.write(b, 1)
                        brb = []
                        r = 0
                    if r > 0 or brb:
                        eobrun[0] += 1
                        be_bits.extend(brb)
                        if eobrun[0] == 0x7FFF:
                            flush_eob()
            flush_eob()
        bw.flush()
        out.extend(bw.out)

    allc = list(range(nc))
    emit_scan("dc", allc, 0, 0, 0, al_dc)
    for lo, hi in bands:
        for ci in range(nc):
            emit_scan("ac_first", [ci], lo, hi, 0, al_ac)
    for lvl in range(al_dc - 1, -1, -1):
        emit_scan("dc", allc, 0, 0, lvl + 1, lvl)
    for lvl in range(al_ac - 1, -1, -1):
        for lo, hi in bands:
            for ci in range(nc):
                emit_scan("ac_refine", [ci], lo, hi, lvl + 1, lvl)
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
