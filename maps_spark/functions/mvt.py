"""Minimal Mapbox Vector Tile (MVT 2.1) codec, pure Python.

The container has no protobuf/mapbox libraries, so this implements the
MVT protobuf wire format directly (public spec:
https://github.com/mapbox/vector-tile-spec/tree/master/2.1).

Shape mirrors the reference's tiles (VectorTiles.java:38-82):
one layer per basisOfRecord, one POINT feature per pixel, attributes
``{str(year): count}`` with year "0" = unknown. Extent = tile size (512),
coordinates may lie outside [0, extent) — buffer pixels are encoded
as-is (autoScale=false in the reference encoder).

Used from Arrow-batched pandas UDFs (grouped encode) — this is the
deliberate Python slow path at the very end of the pipeline, matching
the reference's own SQL->RDD encode boundary (TileMapBuilder.java:216-229).
"""

from __future__ import annotations

from collections import defaultdict

# -- protobuf wire helpers ---------------------------------------------------


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _tag(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _len_delim(field: int, payload: bytes) -> bytes:
    return _tag(field, 2) + _varint(len(payload)) + payload


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


# Varints below 2^14 cover nearly every value the batch encoder writes
# (tag/value table indices, zigzag pixel coords within the buffered
# extent, feature/tag byte lengths) — the cache turns the hot-loop
# bytearray builds into list lookups (measured ~40% of encode time).
_VARINT_CACHE = tuple(_varint(i) for i in range(1 << 14))


def _v(n: int) -> bytes:
    return _VARINT_CACHE[n] if 0 <= n < 16384 else _varint(n)


# -- encode ------------------------------------------------------------------


def _encode_value(v) -> bytes:
    """MVT Value message. ints -> int_value(4), str -> string_value(1),
    float -> double_value(3), bool -> bool_value(7)."""
    if isinstance(v, bool):
        return _tag(7, 0) + _varint(1 if v else 0)
    if isinstance(v, int):
        if v >= 0:
            return b"\x20" + _v(v)                       # tag(4, 0)
        return b"\x30" + _v(_zigzag(v))                  # tag(6, 0)
    if isinstance(v, float):
        import struct
        return _tag(3, 1) + struct.pack("<d", v)
    s = str(v).encode("utf-8")
    return b"\x0a" + _v(len(s)) + s                      # tag(1, 2)


def encode_layer(name: str, features: list[tuple[int, int, dict]],
                 extent: int = 512) -> bytes:
    """One layer: ``features`` is [(x, y, {attr_key: attr_val}), ...]."""
    keys: list[str] = []
    key_idx: dict[str, int] = {}
    vals: list[bytes] = []
    val_idx: dict[bytes, int] = {}

    body = bytearray()
    body += b"\x78\x02"                               # version = 2 (tag 15)
    nm = name.encode("utf-8")
    body += b"\x0a" + _v(len(nm)) + nm                # name (tag 1)
    feats = bytearray()
    v_ = _v                                           # local binds: hot loop
    zz = _zigzag
    enc_val = _encode_value
    for x, y, attrs in features:
        tags = bytearray()
        for k, v in attrs.items():
            ki = key_idx.get(k)
            if ki is None:
                ki = key_idx[k] = len(keys)
                keys.append(k)
            enc = enc_val(v)
            vi = val_idx.get(enc)
            if vi is None:
                vi = val_idx[enc] = len(vals)
                vals.append(enc)
            tags += v_(ki) + v_(vi)
        geom = b"\x09" + v_(zz(x)) + v_(zz(y))        # MoveTo(1), coords
        f = b"\x12" + v_(len(tags)) + tags            # tags packed (tag 2)
        f += b"\x18\x01"                              # type = POINT (tag 3)
        f += b"\x22" + v_(len(geom)) + geom           # geometry (tag 4)
        feats += b"\x12" + v_(len(f)) + f             # feature (tag 2)
    body += feats
    for k in keys:
        kb = k.encode("utf-8")
        body += b"\x1a" + v_(len(kb)) + kb            # key (tag 3)
    for v in vals:
        body += b"\x22" + v_(len(v)) + v              # value (tag 4)
    body += b"\x28" + _v(extent)                      # extent (tag 5)
    return b"\x1a" + _v(len(body)) + bytes(body)      # layer (tag 3)


def encode_tile(layers: dict[str, list[tuple[int, int, dict]]],
                extent: int = 512) -> bytes:
    """Encode {layer_name: [(x, y, attrs)]} into MVT bytes."""
    return b"".join(encode_layer(n, f, extent) for n, f in layers.items())


def encode_polygon_layer(name: str,
                         features: list[tuple[list[tuple[int, int]], dict]],
                         extent: int = 512) -> bytes:
    """One POLYGON layer: ``features`` is [(ring, attrs), ...] with
    ``ring`` an exterior vertex list (closing vertex optional — MVT
    closes with ClosePath). The binned-tile wire shape
    (HexBin.java:154-161 / SquareBin.java:97-99: one polygon per cell,
    attrs ``{"total": n}``, layer "occurrence")."""
    keys: list[str] = []
    key_idx: dict[str, int] = {}
    vals: list[bytes] = []
    val_idx: dict[bytes, int] = {}

    body = bytearray()
    body += _tag(15, 0) + _varint(2)
    nm = name.encode("utf-8")
    body += _tag(1, 2) + _varint(len(nm)) + nm
    for ring, attrs in features:
        pts = list(ring)
        if len(pts) > 1 and pts[0] == pts[-1]:
            pts = pts[:-1]  # ClosePath supplies the closing edge
        if len(pts) < 3:
            continue
        tags = bytearray()
        for k, v in attrs.items():
            if k not in key_idx:
                key_idx[k] = len(keys)
                keys.append(k)
            enc = _encode_value(v)
            if enc not in val_idx:
                val_idx[enc] = len(vals)
                vals.append(enc)
            tags += _varint(key_idx[k]) + _varint(val_idx[enc])
        geom = bytearray()
        x0, y0 = pts[0]
        geom += _varint((1 << 3) | 1)                      # MoveTo x1
        geom += _varint(_zigzag(x0)) + _varint(_zigzag(y0))
        geom += _varint((len(pts) - 1) << 3 | 2)           # LineTo n-1
        cx, cy = x0, y0
        for x, y in pts[1:]:
            geom += _varint(_zigzag(x - cx)) + _varint(_zigzag(y - cy))
            cx, cy = x, y
        geom += _varint((1 << 3) | 7)                      # ClosePath
        f = bytearray()
        f += _tag(2, 2) + _varint(len(tags)) + bytes(tags)
        f += _tag(3, 0) + _varint(3)                       # type = POLYGON
        f += _tag(4, 2) + _varint(len(geom)) + bytes(geom)
        body += _len_delim(2, bytes(f))
    for k in keys:
        kb = k.encode("utf-8")
        body += _tag(3, 2) + _varint(len(kb)) + kb
    for v in vals:
        body += _len_delim(4, v)
    body += _tag(5, 0) + _varint(extent)
    return _len_delim(3, bytes(body))


# -- decode ------------------------------------------------------------------


def _decode_value(buf: bytes):
    pos = 0
    while pos < len(buf):
        key, pos = _read_varint(buf, pos)
        field, wire = key >> 3, key & 0x7
        if field == 1:      # string
            ln, pos = _read_varint(buf, pos)
            return buf[pos:pos + ln].decode("utf-8")
        if field == 3:      # double
            import struct
            return struct.unpack("<d", buf[pos:pos + 8])[0]
        if field == 2:      # float
            import struct
            return struct.unpack("<f", buf[pos:pos + 4])[0]
        if field in (4, 5):  # int/uint
            v, pos = _read_varint(buf, pos)
            return v
        if field == 6:      # sint
            v, pos = _read_varint(buf, pos)
            return _unzigzag(v)
        if field == 7:      # bool
            v, pos = _read_varint(buf, pos)
            return bool(v)
        pos = _skip(buf, pos, wire)
    return None


def _skip(buf: bytes, pos: int, wire: int) -> int:
    if wire == 0:
        _, pos = _read_varint(buf, pos)
    elif wire == 1:
        pos += 8
    elif wire == 2:
        ln, pos = _read_varint(buf, pos)
        pos += ln
    elif wire == 5:
        pos += 4
    else:
        raise ValueError(f"bad wire type {wire}")
    return pos


def _decode_feature(buf: bytes, keys: list[str], vals: list):
    pos = 0
    tags: list[int] = []
    geom: list[int] = []
    while pos < len(buf):
        key, pos = _read_varint(buf, pos)
        field, wire = key >> 3, key & 0x7
        if field == 2 and wire == 2:
            ln, pos = _read_varint(buf, pos)
            end = pos + ln
            while pos < end:
                v, pos = _read_varint(buf, pos)
                tags.append(v)
        elif field == 4 and wire == 2:
            ln, pos = _read_varint(buf, pos)
            end = pos + ln
            while pos < end:
                v, pos = _read_varint(buf, pos)
                geom.append(v)
        else:
            pos = _skip(buf, pos, wire)
    # decode point geometry (possibly multipoint with cumulative deltas)
    pts = []
    i = 0
    cx = cy = 0
    while i < len(geom):
        cmd = geom[i]
        cid, cnt = cmd & 0x7, cmd >> 3
        i += 1
        if cid == 1:
            for _ in range(cnt):
                cx += _unzigzag(geom[i])
                cy += _unzigzag(geom[i + 1])
                i += 2
                pts.append((cx, cy))
        else:  # lines/polys not produced by this engine
            i += cnt * 2
    attrs = {keys[tags[j]]: vals[tags[j + 1]] for j in range(0, len(tags), 2)}
    return pts, attrs


def decode_polygon_tile(data: bytes
                        ) -> dict[str, list[tuple[list, dict]]]:
    """MVT bytes -> {layer: [(exterior ring pts, attrs), ...]} for
    POLYGON layers (the binned-tile decode twin). Rings are returned
    open (no duplicated closing vertex)."""
    out: dict[str, list] = {}
    pos = 0
    while pos < len(data):
        key, pos = _read_varint(data, pos)
        field, wire = key >> 3, key & 0x7
        if field == 3 and wire == 2:
            ln, pos = _read_varint(data, pos)
            name, polys = _decode_layer_polys(data[pos:pos + ln])
            pos += ln
            out.setdefault(name, []).extend(polys)
        else:
            pos = _skip(data, pos, wire)
    return out


def _decode_layer_polys(buf: bytes):
    pos = 0
    name = ""
    raw_feats: list[bytes] = []
    keys: list[str] = []
    vals: list = []
    while pos < len(buf):
        key, pos = _read_varint(buf, pos)
        field, wire = key >> 3, key & 0x7
        if field == 1 and wire == 2:
            ln, pos = _read_varint(buf, pos)
            name = buf[pos:pos + ln].decode("utf-8")
            pos += ln
        elif field == 2 and wire == 2:
            ln, pos = _read_varint(buf, pos)
            raw_feats.append(buf[pos:pos + ln])
            pos += ln
        elif field == 3 and wire == 2:
            ln, pos = _read_varint(buf, pos)
            keys.append(buf[pos:pos + ln].decode("utf-8"))
            pos += ln
        elif field == 4 and wire == 2:
            ln, pos = _read_varint(buf, pos)
            vals.append(_decode_value(buf[pos:pos + ln]))
            pos += ln
        else:
            pos = _skip(buf, pos, wire)
    polys = []
    for rf in raw_feats:
        tags: list[int] = []
        geom: list[int] = []
        pos2 = 0
        while pos2 < len(rf):
            key, pos2 = _read_varint(rf, pos2)
            field, wire = key >> 3, key & 0x7
            if field in (2, 4) and wire == 2:
                ln, pos2 = _read_varint(rf, pos2)
                end = pos2 + ln
                dest = tags if field == 2 else geom
                while pos2 < end:
                    v, pos2 = _read_varint(rf, pos2)
                    dest.append(v)
            else:
                pos2 = _skip(rf, pos2, wire)
        attrs = {keys[tags[j]]: vals[tags[j + 1]]
                 for j in range(0, len(tags), 2)}
        ring: list[tuple[int, int]] = []
        i = 0
        cx = cy = 0
        while i < len(geom):
            cmd = geom[i]
            cid, cnt = cmd & 0x7, cmd >> 3
            i += 1
            if cid in (1, 2):  # MoveTo / LineTo
                for _ in range(cnt):
                    cx += _unzigzag(geom[i])
                    cy += _unzigzag(geom[i + 1])
                    i += 2
                    ring.append((cx, cy))
            elif cid == 7:     # ClosePath: ring complete
                polys.append((ring, attrs))
                ring = []
        if ring:
            polys.append((ring, attrs))
    return name, polys


def decode_tile(data: bytes) -> dict[str, list[tuple[int, int, dict]]]:
    """MVT bytes -> {layer_name: [(x, y, attrs), ...]}."""
    layers: dict[str, list] = {}
    pos = 0
    while pos < len(data):
        key, pos = _read_varint(data, pos)
        field, wire = key >> 3, key & 0x7
        if field == 3 and wire == 2:
            ln, pos = _read_varint(data, pos)
            layer_buf = data[pos:pos + ln]
            pos += ln
            name, feats = _decode_layer(layer_buf)
            layers.setdefault(name, []).extend(feats)
        else:
            pos = _skip(data, pos, wire)
    return layers


def _decode_layer(buf: bytes):
    pos = 0
    name = ""
    raw_feats: list[bytes] = []
    keys: list[str] = []
    vals: list = []
    while pos < len(buf):
        key, pos = _read_varint(buf, pos)
        field, wire = key >> 3, key & 0x7
        if field == 1 and wire == 2:
            ln, pos = _read_varint(buf, pos)
            name = buf[pos:pos + ln].decode("utf-8")
            pos += ln
        elif field == 2 and wire == 2:
            ln, pos = _read_varint(buf, pos)
            raw_feats.append(buf[pos:pos + ln])
            pos += ln
        elif field == 3 and wire == 2:
            ln, pos = _read_varint(buf, pos)
            keys.append(buf[pos:pos + ln].decode("utf-8"))
            pos += ln
        elif field == 4 and wire == 2:
            ln, pos = _read_varint(buf, pos)
            vals.append(_decode_value(buf[pos:pos + ln]))
            pos += ln
        else:
            pos = _skip(buf, pos, wire)
    feats = []
    for rf in raw_feats:
        pts, attrs = _decode_feature(rf, keys, vals)
        for (x, y) in pts:
            feats.append((x, y, attrs))
    return name, feats


# -- convenience for tests/serving -------------------------------------------


def tile_totals(data: bytes, exclude_buffer: bool = False,
                tile_size: int = 512) -> dict[str, int]:
    """Sum of year counts per layer (optionally visible-region only)."""
    out: dict[str, int] = defaultdict(int)
    for layer, feats in decode_tile(data).items():
        for x, y, attrs in feats:
            if exclude_buffer and not (0 <= x < tile_size and 0 <= y < tile_size):
                continue
            out[layer] += sum(v for k, v in attrs.items() if _is_year(k))
    return dict(out)


def _is_year(k: str) -> bool:
    try:
        int(k)
        return True
    except ValueError:
        return False
