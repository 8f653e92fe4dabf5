"""Mapbox Vector Tile (MVT v2) encoder — hand-rolled protobuf.

Mirrors the reference's vtzero usage in
/root/reference/src/tile_worker.cpp:96-269:
- per-layer key/value tables deduplicated in first-seen order
- attribute values are string / float(float_value) / bool, with
  per-attribute minzoom filtering applied at write time
  (output_object.cpp writeAttributes)
- zero-length segments suppressed (consecutive identical scaled points
  dropped; lines need >=2 distinct points, rings >=4 incl. closure)
- geometry command stream: MoveTo/LineTo/ClosePath with zigzag deltas,
  cursor persisting across parts of one feature

No protobuf library: varints are encoded by hand (wire format is
public). Output is byte-stable for a given feature order.
"""

from __future__ import annotations

import zlib

import numpy as np

MOVE_TO = 1
LINE_TO = 2
CLOSE_PATH = 7

GEOM_POINT = 1
GEOM_LINESTRING = 2
GEOM_POLYGON = 3


def _varint(buf: bytearray, v: int) -> None:
    if v < 0x80:  # fast path: the overwhelming majority of wire ints
        buf.append(v)
        return
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            buf.append(b | 0x80)
        else:
            buf.append(b)
            return


def _tag(buf: bytearray, field: int, wire: int) -> None:
    _varint(buf, (field << 3) | wire)


def _bytes_field(buf: bytearray, field: int, payload: bytes) -> None:
    _tag(buf, field, 2)
    _varint(buf, len(payload))
    buf += payload


def _zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63)


# (class, value)-keyed memo: attr values repeat heavily ACROSS tiles
# (layer dicts dedup only within one tile). Class in the key keeps
# bool(True) distinct from int(1) — they encode differently.
_VALUE_MEMO: dict = {}
_VALUE_MEMO_MAX = 65536


def _encode_value_memo(v) -> bytes:
    if v != v:                  # float NaN: NaN != NaN means the memo
        return _encode_value(v)  # key never hits — don't grow dead entries
    try:
        k = (v.__class__, v)
        enc = _VALUE_MEMO.get(k)
    except TypeError:           # unhashable value: encode directly
        return _encode_value(v)
    if enc is None:
        enc = _encode_value(v)
        if len(_VALUE_MEMO) >= _VALUE_MEMO_MAX:
            _VALUE_MEMO.clear()
        _VALUE_MEMO[k] = enc
    return enc


def _encode_value(v) -> bytes:
    out = bytearray()
    if isinstance(v, bool):
        _tag(out, 7, 0)
        _varint(out, 1 if v else 0)
    elif isinstance(v, str):
        _bytes_field(out, 1, v.encode("utf-8"))
    elif isinstance(v, bytes):
        _bytes_field(out, 1, v)
    elif isinstance(v, (int, np.integer)):
        # tilemaker only emits string/float/bool; ints come through
        # AttributeNumeric as floats — accept ints as float for parity
        _tag(out, 2, 5)
        out += np.float32(v).tobytes()
    elif isinstance(v, (float, np.floating)):
        _tag(out, 2, 5)
        out += np.float32(v).tobytes()
    else:
        raise TypeError(f"unsupported MVT value type {type(v)}")
    return bytes(out)


class LayerBuilder:
    """vtzero::layer_builder equivalent."""

    def __init__(self, name: str, version: int = 2, extent: int = 4096):
        self.name = name
        self.version = version
        self.extent = extent
        self.keys: list[str] = []
        self._key_idx: dict[str, int] = {}
        self.values: list[bytes] = []
        self._val_idx: dict[bytes, int] = {}
        self.features: list[bytes] = []

    def key_index(self, k: str) -> int:
        i = self._key_idx.get(k)
        if i is None:
            i = len(self.keys)
            self.keys.append(k)
            self._key_idx[k] = i
        return i

    def value_index(self, v) -> int:
        enc = _encode_value_memo(v)
        i = self._val_idx.get(enc)
        if i is None:
            i = len(self.values)
            self.values.append(enc)
            self._val_idx[enc] = i
        return i

    def add_feature(self, geom_type: int, geometry: bytes,
                    tags: list[tuple[str, object]], fid: int | None = None) -> None:
        f = bytearray()
        if fid is not None:
            _tag(f, 1, 0)
            _varint(f, int(fid))
        if tags:
            t = bytearray()
            for k, v in tags:
                _varint(t, self.key_index(k))
                _varint(t, self.value_index(v))
            _bytes_field(f, 2, bytes(t))
        _tag(f, 3, 0)
        _varint(f, geom_type)
        _bytes_field(f, 4, geometry)
        self.features.append(bytes(f))

    # --- geometry builders (tile-local int coords) ---

    @staticmethod
    def encode_points(pts: list[tuple[int, int]]) -> bytes:
        g = bytearray()
        _varint(g, (MOVE_TO & 0x7) | (len(pts) << 3))
        LayerBuilder._encode_run(g, pts, 0, 0)
        return bytes(g)

    @staticmethod
    def _encode_run(g: bytearray, pts, cx: int, cy: int) -> tuple[int, int]:
        """Delta-encode a vertex run (inlined zigzag+varint)."""
        ap = g.append
        for x, y in pts:
            for d in (x - cx, y - cy):
                v = (d << 1) ^ (d >> 63)
                if v < 0x80:
                    ap(v)
                else:
                    while True:
                        b = v & 0x7F
                        v >>= 7
                        if v:
                            ap(b | 0x80)
                        else:
                            ap(b)
                            break
            cx, cy = x, y
        return cx, cy

    @staticmethod
    def encode_multilinestring(parts: list[list[tuple[int, int]]]) -> bytes:
        """Each part: >=2 distinct consecutive points (caller dedups)."""
        g = bytearray()
        cx = cy = 0
        for pts in parts:
            _varint(g, (MOVE_TO & 0x7) | (1 << 3))
            cx, cy = LayerBuilder._encode_run(g, pts[:1], cx, cy)
            _varint(g, (LINE_TO & 0x7) | ((len(pts) - 1) << 3))
            cx, cy = LayerBuilder._encode_run(g, pts[1:], cx, cy)
        return bytes(g)

    @staticmethod
    def encode_polygon(rings: list[list[tuple[int, int]]]) -> bytes:
        """Rings given closed (last == first); closing point becomes
        ClosePath, as vtzero does."""
        g = bytearray()
        cx = cy = 0
        for pts in rings:
            body = pts[:-1] if pts[0] == pts[-1] else pts
            _varint(g, (MOVE_TO & 0x7) | (1 << 3))
            cx, cy = LayerBuilder._encode_run(g, body[:1], cx, cy)
            _varint(g, (LINE_TO & 0x7) | ((len(body) - 1) << 3))
            cx, cy = LayerBuilder._encode_run(g, body[1:], cx, cy)
            _varint(g, (CLOSE_PATH & 0x7) | (1 << 3))
        return bytes(g)

    def serialize(self) -> bytes:
        out = bytearray()
        _tag(out, 15, 0)
        _varint(out, self.version)
        _bytes_field(out, 1, self.name.encode("utf-8"))
        for f in self.features:
            _bytes_field(out, 2, f)
        for k in self.keys:
            _bytes_field(out, 3, k.encode("utf-8"))
        for v in self.values:
            _bytes_field(out, 4, v)
        _tag(out, 5, 0)
        _varint(out, self.extent)
        return bytes(out)


# --- batch (cross-feature) geometry encoding -----------------------------
#
# Per-feature numpy varint encoding is a measured 10x LOSS (a typical
# feature is ~18 varints; np dispatch dominates — BASELINE.md negative
# results).  Encoding EVERY feature of a tile in ONE numpy pass
# amortizes the dispatch over the tile's whole vertex set, which is
# where the real CPU lives (vertex-heavy low/mid-zoom tiles).  Output
# is byte-identical to encode_points/encode_multilinestring/
# encode_polygon (golden suite + randomized equivalence test).

FEAT_POINTS, FEAT_LINE, FEAT_POLYGON = 0, 1, 2


def _varint_encode_tokens(tok: np.ndarray):
    """Vectorized LEB128 for an int64 array of non-negative tokens.
    Returns (buf uint8 array, byte_off exclusive-prefix offsets with a
    final total-bytes entry)."""
    nb = np.ones(len(tok), dtype=np.int64)
    if len(tok) and int(tok.min()) < 0:
        # callers zigzag first; a negative token would arithmetic-shift
        # to -1 forever below — fail loudly instead of hanging
        raise ValueError("negative varint token (missing zigzag?)")
    rem = tok >> 7
    while rem.any():
        nb += rem > 0
        rem >>= 7
    byte_off = np.empty(len(tok) + 1, dtype=np.int64)
    byte_off[0] = 0
    np.cumsum(nb, out=byte_off[1:])
    buf = np.empty(byte_off[-1], dtype=np.uint8)
    cur, pos, left = tok, byte_off[:-1].copy(), nb
    while len(cur):
        more = left > 1
        buf[pos] = (cur & 0x7F) | np.where(more, 0x80, 0)
        cur = cur[more] >> 7
        pos = pos[more] + 1
        left = left[more] - 1
    return buf, byte_off


def encode_features_np(specs: list) -> list[bytes]:
    """Geometry bytes for a LIST of features in one vectorized pass.
    specs: (kind, parts) per feature — kind in {FEAT_POINTS, FEAT_LINE,
    FEAT_POLYGON}, parts a list of point sequences (list-of-[x,y] or
    (m,2) int arrays): one run for points, parts for lines, closed
    rings for polygons (closing point dropped → ClosePath, as the
    scalar encoders do)."""
    arrs: list[np.ndarray] = []
    m_l: list[int] = []
    kind_l: list[int] = []
    close_l: list[bool] = []
    fstart_l: list[bool] = []
    feat_nparts: list[int] = []
    for kind, parts in specs:
        np_count = 0
        for p in parts:
            a = np.ascontiguousarray(p, dtype=np.int64).reshape(-1, 2)
            if (kind == FEAT_POLYGON and len(a) > 1
                    and a[0, 0] == a[-1, 0] and a[0, 1] == a[-1, 1]):
                a = a[:-1]
            arrs.append(a)
            m_l.append(len(a))
            kind_l.append(kind)
            close_l.append(kind == FEAT_POLYGON)
            fstart_l.append(np_count == 0)
            np_count += 1
        feat_nparts.append(np_count)
    if not arrs:
        return [b"" for _ in specs]
    m = np.asarray(m_l, dtype=np.int64)
    kinds = np.asarray(kind_l, dtype=np.int64)
    close = np.asarray(close_l)
    fstart = np.asarray(fstart_l)
    is_path = kinds != FEAT_POINTS

    tok_count = np.where(is_path, 2 + 2 * m + close, 1 + 2 * m)
    tok_start = np.empty(len(m) + 1, dtype=np.int64)
    tok_start[0] = 0
    np.cumsum(tok_count, out=tok_start[1:])
    tokens = np.empty(tok_start[-1], dtype=np.int64)

    # command tokens
    tokens[tok_start[:-1]] = np.where(
        is_path, (1 << 3) | MOVE_TO, (m << 3) | MOVE_TO)
    path_idx = np.nonzero(is_path)[0]
    tokens[tok_start[path_idx] + 3] = ((m[path_idx] - 1) << 3) | LINE_TO
    close_idx = np.nonzero(close)[0]
    tokens[tok_start[close_idx] + tok_count[close_idx] - 1] = \
        (1 << 3) | CLOSE_PATH

    # vertex tokens: zigzag deltas with cursor persisting across parts
    # of one feature, reset at feature starts
    verts = np.concatenate(arrs, axis=0)
    pt_start = np.empty(len(m) + 1, dtype=np.int64)
    pt_start[0] = 0
    np.cumsum(m, out=pt_start[1:])
    prev = np.empty_like(verts)
    prev[0] = 0
    prev[1:] = verts[:-1]
    reset = pt_start[:-1][fstart]
    prev[reset[reset < len(verts)]] = 0
    d = verts - prev
    zz = (d << 1) ^ (d >> 63)
    part_of = np.repeat(np.arange(len(m)), m)
    j = np.arange(len(verts)) - pt_start[part_of]
    pos_x = tok_start[part_of] + 1 + 2 * j + (is_path[part_of] & (j > 0))
    tokens[pos_x] = zz[:, 0]
    tokens[pos_x + 1] = zz[:, 1]

    buf, byte_off = _varint_encode_tokens(tokens)
    raw = buf.tobytes()
    out: list[bytes] = []
    p0 = 0
    for nparts in feat_nparts:
        if nparts == 0:
            out.append(b"")
            continue
        b0 = byte_off[tok_start[p0]]
        b1 = byte_off[tok_start[p0 + nparts]]
        out.append(raw[b0:b1])
        p0 += nparts
    return out


class TileBuilder:
    def __init__(self):
        self.layers: list[LayerBuilder] = []

    def layer(self, name: str, version: int = 2, extent: int = 4096) -> LayerBuilder:
        lb = LayerBuilder(name, version, extent)
        self.layers.append(lb)
        return lb

    def serialize(self) -> bytes:
        out = bytearray()
        for lb in self.layers:
            if lb.features:
                _bytes_field(out, 3, lb.serialize())
        return bytes(out)


def compress_tile(data: bytes, gzip_fmt: bool = True, level: int = 6) -> bytes:
    """helpers.cpp:103-126 — gzip (or raw deflate) at level 6."""
    if gzip_fmt:
        co = zlib.compressobj(level, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
    else:
        co = zlib.compressobj(level, zlib.DEFLATED, zlib.MAX_WBITS)
    return co.compress(data) + co.flush()


def decompress_tile(data: bytes) -> bytes:
    """Inverse of compress_tile for either wrapper: wbits=32+15 lets
    zlib auto-detect gzip vs raw-zlib (deflate) headers."""
    return zlib.decompress(data, 32 + zlib.MAX_WBITS)


def merge_tiles(old_data: bytes, new_data: bytes) -> bytes:
    """Per-tile outer merge (J8, the reference's --merge: existing
    features copied first, new appended — tile_worker.cpp:405-417,
    ProcessLayer existingTile loop). Inputs/outputs are UNcompressed
    tile bytes; layers matched by name, old layers with no new
    counterpart preserved."""
    old = decode_tile(old_data)
    new = decode_tile(new_data)
    tb = TileBuilder()
    done = set()
    # keep the new tile's layer order, injecting old features first
    for name, nl in new.items():
        lb = tb.layer(name, nl["version"] or 2, nl["extent"] or 4096)
        for src in (old.get(name), nl):
            if src is None:
                continue
            for f in src["features"]:
                _reencode_feature(lb, f)
        done.add(name)
    for name, ol in old.items():
        if name in done:
            continue
        lb = tb.layer(name, ol["version"] or 2, ol["extent"] or 4096)
        for f in ol["features"]:
            _reencode_feature(lb, f)
    return tb.serialize()


def _reencode_feature(lb: "LayerBuilder", f: dict) -> None:
    tags = list(f["tags"].items())
    if f["type"] == GEOM_POINT:
        geom = lb.encode_points(f["parts"])
    elif f["type"] == GEOM_LINESTRING:
        geom = lb.encode_multilinestring(f["parts"])
    else:
        geom = lb.encode_polygon(f["parts"])
    lb.add_feature(f["type"], geom, tags, f["id"])


# --- minimal decoder (for tests / the merge join) -----------------------

def decode_tile(data: bytes) -> dict:
    """Decode enough of an MVT for round-trip tests: layers → features
    with geom_type, raw geometry ints decoded to coordinate parts, and
    tag key/values."""
    layers = {}
    for field, wire, payload, _ in _iter_fields(data):
        if field == 3:
            lay = _decode_layer(payload)
            layers[lay["name"]] = lay
    return layers


def _iter_fields(data: bytes):
    i = 0
    n = len(data)
    while i < n:
        key, i = _read_varint(data, i)
        field, wire = key >> 3, key & 0x7
        if wire == 2:
            ln, i = _read_varint(data, i)
            yield field, wire, data[i:i + ln], None
            i += ln
        elif wire == 0:
            v, i = _read_varint(data, i)
            yield field, wire, b"", v
        elif wire == 5:
            yield field, wire, data[i:i + 4], None
            i += 4
        else:
            raise ValueError(f"wire {wire}")


def _read_varint(data: bytes, i: int) -> tuple[int, int]:
    shift = 0
    v = 0
    while True:
        b = data[i]
        i += 1
        v |= (b & 0x7F) << shift
        if not (b & 0x80):
            return v, i
        shift += 7


def _decode_layer(data: bytes) -> dict:
    name = ""
    version = extent = 0
    keys: list[str] = []
    values: list[object] = []
    feats = []
    for field, wire, payload, v in _iter_fields(data):
        if field == 1:
            name = payload.decode()
        elif field == 15:
            version = v
        elif field == 5:
            extent = v
        elif field == 3:
            keys.append(payload.decode())
        elif field == 4:
            values.append(_decode_value(payload))
        elif field == 2:
            feats.append(payload)
    features = [_decode_feature(f, keys, values) for f in feats]
    return {"name": name, "version": version, "extent": extent,
            "keys": keys, "values": values, "features": features}


def _decode_value(data: bytes):
    for field, wire, payload, v in _iter_fields(data):
        if field == 1:
            return payload.decode()
        if field == 2:
            return float(np.frombuffer(payload, dtype=np.float32)[0])
        if field == 7:
            return bool(v)
        if field == 3:
            return float(np.frombuffer(payload, dtype=np.float64)[0])
        if field in (4, 5):
            return v
        if field == 6:
            return (v >> 1) ^ -(v & 1)
    return None


def _decode_feature(data: bytes, keys, values) -> dict:
    out = {"id": None, "type": 0, "tags": {}, "parts": []}
    geom = []
    tag_ints = []
    for field, wire, payload, v in _iter_fields(data):
        if field == 1:
            out["id"] = v
        elif field == 3:
            out["type"] = v
        elif field == 2:
            i = 0
            while i < len(payload):
                t, i = _read_varint(payload, i)
                tag_ints.append(t)
        elif field == 4:
            i = 0
            while i < len(payload):
                g, i = _read_varint(payload, i)
                geom.append(g)
    for j in range(0, len(tag_ints), 2):
        out["tags"][keys[tag_ints[j]]] = values[tag_ints[j + 1]]
    # decode command stream
    i = 0
    cx = cy = 0
    cur = []
    while i < len(geom):
        cmd = geom[i] & 0x7
        count = geom[i] >> 3
        i += 1
        if cmd == MOVE_TO:
            for _ in range(count):
                cx += (geom[i] >> 1) ^ -(geom[i] & 1)
                cy += (geom[i + 1] >> 1) ^ -(geom[i + 1] & 1)
                i += 2
                if out["type"] == GEOM_POINT:
                    out["parts"].append((cx, cy))
                else:
                    if cur:
                        out["parts"].append(cur)
                    cur = [(cx, cy)]
        elif cmd == LINE_TO:
            for _ in range(count):
                cx += (geom[i] >> 1) ^ -(geom[i] & 1)
                cy += (geom[i + 1] >> 1) ^ -(geom[i + 1] & 1)
                i += 2
                cur.append((cx, cy))
        elif cmd == CLOSE_PATH:
            cur.append(cur[0])
            out["parts"].append(cur)
            cur = []
    if cur:
        out["parts"].append(cur)
    return out
