"""Pure-numpy WebP lossless (VP8L) codec.

Decoder implements the published WebP Lossless Bitstream Specification
(the `VP8L` chunk of the RIFF/WEBP container): LSB-first bit packing,
canonical prefix codes (DEFLATE-style code-length coding with the
16/17/18 repeat codes and the 1-2 symbol "simple" form), the color
cache, meta prefix codes (entropy image), LZ77 backward references
with the 120-entry two-dimensional distance map, and all four
transforms — predictor (14 modes), cross-color, subtract-green, and
color indexing with sub-byte pixel bundling.  Lossy `VP8 ` streams and
`VP8X` animation frames raise NotImplementedError (the marked swap-in
point for PIL/libwebp, neither of which ships in this container).

Encoder (fixture/synth path) emits spec-valid VP8L: literal, color
cache and run-length LZ77 tokens under any combination of
subtract-green, fixed-mode predictor, fixed-element cross-color and
palette transforms — enough to exercise every decoder path with exact
lossless round-trips.

Two interop notes, since no second implementation exists in this
sandbox to cross-check byte streams against: prefix-code bits are
written/read most-significant-bit first (the DEFLATE convention the
spec's code-length coding is borrowed from) while all other fields are
LSB-first, and the 2D distance-map tie-break is (distance², then
larger y, then positive x) over the {y∈[0,7], x∈[-7,8]} neighborhood,
which reproduces the spec's printed 120-entry table.

Reference parity: the reference engine (cldellow/tilemaker) has no
image path; this module supports the LLM-pipeline multimodal brief
(SURVEY.md §2 extensions), like ops/jpeg.py and ops/png.py.
"""
from __future__ import annotations

import struct

import numpy as np

# --- bit I/O ---------------------------------------------------------------


class _BitReader:
    """LSB-first bit reader (VP8L convention for non-prefix fields)."""

    __slots__ = ("d", "i", "acc", "n")

    def __init__(self, data: bytes):
        self.d = data
        self.i = 0
        self.acc = 0
        self.n = 0

    def read(self, k: int) -> int:
        while self.n < k:
            self.acc |= (self.d[self.i] if self.i < len(self.d) else 0) << self.n
            self.i += 1
            self.n += 8
        v = self.acc & ((1 << k) - 1)
        self.acc >>= k
        self.n -= k
        return v


class _BitWriter:
    __slots__ = ("out", "acc", "n")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, v: int, k: int) -> None:
        self.acc |= (v & ((1 << k) - 1)) << self.n
        self.n += k
        while self.n >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def write_code(self, code: int, length: int) -> None:
        """Prefix-code bits go MSB-first (DEFLATE convention)."""
        for i in range(length - 1, -1, -1):
            self.write((code >> i) & 1, 1)

    def bytes(self) -> bytes:
        if self.n:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.n = 0
        return bytes(self.out)


# --- canonical prefix codes ------------------------------------------------

# Order the 19 code-length code lengths are transmitted in.
_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)
_MAX_CODE_LEN = 15


def _canonical_codes(lengths) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical assignment by (length, symbol)."""
    pairs = sorted((l, s) for s, l in enumerate(lengths) if l > 0)
    codes = {}
    code = 0
    prev_len = 0
    for l, s in pairs:
        code <<= (l - prev_len)
        codes[s] = (code, l)
        code += 1
        prev_len = l
    return codes


class _PrefixCode:
    """Canonical prefix decoder: bit-at-a-time walk over (len, code)."""

    __slots__ = ("table", "single")

    def __init__(self, lengths=None, single: int | None = None):
        # `single` (the simple 1-symbol form) decodes with 0 bits; a
        # normal-coded table with one symbol still consumes its declared
        # length per the canonical walk.
        self.single = single
        self.table = {}
        if lengths is not None:
            for s, (code, l) in _canonical_codes(lengths).items():
                self.table[(l, code)] = s

    def decode(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for length in range(1, _MAX_CODE_LEN + 1):
            code = (code << 1) | br.read(1)
            sym = self.table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid prefix code in VP8L stream")


def _read_prefix_code(br: _BitReader, alphabet_size: int) -> _PrefixCode:
    if br.read(1):  # simple code: 1 or 2 symbols
        num_symbols = br.read(1) + 1
        first_8bits = br.read(1)
        sym0 = br.read(8 if first_8bits else 1)
        if num_symbols == 1:
            return _PrefixCode(single=sym0)
        sym1 = br.read(8)
        lengths = [0] * alphabet_size
        lengths[sym0] = 1
        lengths[sym1] = 1
        return _PrefixCode(lengths)
    # normal: code lengths are themselves prefix-coded
    num_cl = 4 + br.read(4)
    cl_lengths = [0] * 19
    for i in range(num_cl):
        cl_lengths[_CL_ORDER[i]] = br.read(3)
    cl_code = _PrefixCode(cl_lengths)
    if br.read(1):  # explicit max symbol
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev_len = 8
    symbol = 0
    while symbol < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        cl = cl_code.decode(br)
        if cl < 16:
            lengths[symbol] = cl
            symbol += 1
            if cl:
                prev_len = cl
        elif cl == 16:
            for _ in range(3 + br.read(2)):
                if symbol >= alphabet_size:
                    break
                lengths[symbol] = prev_len
                symbol += 1
        elif cl == 17:
            symbol += 3 + br.read(3)
        else:  # 18
            symbol += 11 + br.read(7)
    return _PrefixCode(lengths)


# --- LZ77 helpers ----------------------------------------------------------


def _copy_value(prefix_code: int, br: _BitReader) -> int:
    """Length/distance prefix value + extra bits (spec GetCopyLength)."""
    if prefix_code < 4:
        return prefix_code + 1
    extra_bits = (prefix_code - 2) >> 1
    offset = (2 + (prefix_code & 1)) << extra_bits
    return offset + br.read(extra_bits) + 1


def _copy_symbol(value: int) -> tuple[int, int, int]:
    """Inverse of _copy_value: value -> (prefix_code, extra, extra_bits)."""
    if value <= 4:
        return value - 1, 0, 0
    v = value - 1
    extra_bits = v.bit_length() - 2
    rem = v - (2 << extra_bits)
    if rem >= (1 << extra_bits):
        code = 2 * extra_bits + 3
        rem -= 1 << extra_bits
    else:
        code = 2 * extra_bits + 2
    return code, rem, extra_bits


def _distance_map() -> list[tuple[int, int]]:
    """The 120 short-distance (x, y) plane offsets: neighborhood
    y∈[0,7], x∈[-7,8] (x≥1 on row 0), ordered by distance² then larger
    y then positive-before-negative x."""
    cands = [(x, y) for y in range(8) for x in range(-7, 9)
             if not (y == 0 and x <= 0)]
    cands.sort(key=lambda p: (p[0] * p[0] + p[1] * p[1], -p[1], -p[0]))
    return cands


_DIST_MAP = _distance_map()
_DIST_CODE = {xy: i + 1 for i, xy in enumerate(_DIST_MAP)}


def _plane_to_distance(dist_code: int, xsize: int) -> int:
    if dist_code > 120:
        return dist_code - 120
    dx, dy = _DIST_MAP[dist_code - 1]
    return max(1, dy * xsize + dx)


def _distance_to_plane(dist: int, xsize: int) -> int:
    if dist <= 8 * xsize + 8:
        dy, dx = divmod(dist, xsize)
        if dx > 8:
            dx -= xsize
            dy += 1
        code = _DIST_CODE.get((dx, dy))
        if code is not None:
            return code
    return dist + 120


# --- color cache -----------------------------------------------------------


class _ColorCache:
    __slots__ = ("bits", "vals")

    def __init__(self, bits: int):
        self.bits = bits
        self.vals = [0] * (1 << bits)

    def key(self, argb: int) -> int:
        return ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> (32 - self.bits)

    def insert(self, argb: int) -> None:
        self.vals[self.key(argb)] = argb

    def lookup(self, idx: int) -> int:
        return self.vals[idx]


# --- transforms ------------------------------------------------------------

_PREDICTOR, _CROSS_COLOR, _SUBTRACT_GREEN, _COLOR_INDEXING = 0, 1, 2, 3


def _sub_size(size: int, bits: int) -> int:
    return (size + (1 << bits) - 1) >> bits


def _avg2(a: int, b: int) -> int:
    """Per-channel (a+b)//2 on packed ARGB."""
    return (((a ^ b) & 0xFEFEFEFE) >> 1) + (a & b)


def _clip255(v: int) -> int:
    return 0 if v < 0 else (255 if v > 255 else v)


def _predict(mode: int, left: int, top: int, topleft: int, topright: int) -> int:
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return left
    if mode == 2:
        return top
    if mode == 3:
        return topright
    if mode == 4:
        return topleft
    if mode == 5:
        return _avg2(_avg2(left, topright), top)
    if mode == 6:
        return _avg2(left, topleft)
    if mode == 7:
        return _avg2(left, top)
    if mode == 8:
        return _avg2(topleft, top)
    if mode == 9:
        return _avg2(top, topright)
    if mode == 10:
        return _avg2(_avg2(left, topleft), _avg2(top, topright))
    if mode == 11:  # Select
        # libwebp Sub3: pa_minus_pb = Σ(|p-top| - |p-left|); return TOP
        # when <= 0 — ties go to TOP (spec/libwebp; review finding: the
        # previous <= on the negated sum sent ties to LEFT)
        p_sum = 0
        for sh in (24, 16, 8, 0):
            p = ((left >> sh) & 0xFF) + ((top >> sh) & 0xFF) - ((topleft >> sh) & 0xFF)
            p_sum += abs(p - ((left >> sh) & 0xFF)) - abs(p - ((top >> sh) & 0xFF))
        return top if p_sum >= 0 else left
    if mode == 12:  # ClampAddSubtractFull
        out = 0
        for sh in (24, 16, 8, 0):
            c = _clip255(((left >> sh) & 0xFF) + ((top >> sh) & 0xFF)
                         - ((topleft >> sh) & 0xFF))
            out |= c << sh
        return out
    if mode == 13:  # ClampAddSubtractHalf
        ave = _avg2(left, top)
        out = 0
        for sh in (24, 16, 8, 0):
            a = (ave >> sh) & 0xFF
            b = (topleft >> sh) & 0xFF
            c = _clip255(a + int((a - b) / 2))  # C truncating division
            out |= c << sh
        return out
    raise ValueError(f"predictor mode {mode}")


def _add_pixels(a: int, b: int) -> int:
    """Per-channel (a+b) & 0xff on packed ARGB."""
    out = 0
    for sh in (24, 16, 8, 0):
        out |= ((((a >> sh) & 0xFF) + ((b >> sh) & 0xFF)) & 0xFF) << sh
    return out


def _sub_pixels(a: int, b: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        out |= ((((a >> sh) & 0xFF) - ((b >> sh) & 0xFF)) & 0xFF) << sh
    return out


def _pred_mode_at(pred_img, pred_bits: int, pred_xsize: int, x: int, y: int) -> int:
    return (pred_img[(y >> pred_bits) * pred_xsize + (x >> pred_bits)] >> 8) & 0xFF


def _inverse_predictor(data, xsize: int, ysize: int, bits: int, pred_img) -> None:
    """In-place inverse predictor transform (residuals -> pixels)."""
    pxs = _sub_size(xsize, bits)
    for y in range(ysize):
        row = y * xsize
        for x in range(xsize):
            pos = row + x
            if y == 0:
                pred = 0xFF000000 if x == 0 else data[pos - 1]  # L
            elif x == 0:
                pred = data[pos - xsize]  # T
            else:
                mode = _pred_mode_at(pred_img, bits, pxs, x, y)
                # linear-array neighbors; TR of the last column wraps to
                # the current row's first pixel, matching the spec's
                # one-dimensional indexing
                pred = _predict(mode, data[pos - 1], data[pos - xsize],
                                data[pos - xsize - 1], data[pos - xsize + 1])
            data[pos] = _add_pixels(data[pos], pred)


def _forward_predictor(argb, xsize: int, ysize: int, bits: int, mode: int):
    """Residual image for a fixed predictor mode (encoder fixture path)."""
    out = [0] * (xsize * ysize)
    for y in range(ysize):
        row = y * xsize
        for x in range(xsize):
            pos = row + x
            if y == 0:
                pred = 0xFF000000 if x == 0 else argb[pos - 1]
            elif x == 0:
                pred = argb[pos - xsize]
            else:
                pred = _predict(mode, argb[pos - 1], argb[pos - xsize],
                                argb[pos - xsize - 1], argb[pos - xsize + 1])
            out[pos] = _sub_pixels(argb[pos], pred)
    return out


def _ct_delta(t: int, c: int) -> int:
    """ColorTransformDelta: (int8(t) * int8(c)) >> 5, arithmetic shift."""
    ts = t - 256 if t >= 128 else t
    cs = c - 256 if c >= 128 else c
    return (ts * cs) >> 5


def _inverse_cross_color(data, xsize: int, ysize: int, bits: int, ct_img) -> None:
    cxs = _sub_size(xsize, bits)
    for y in range(ysize):
        row = y * xsize
        crow = (y >> bits) * cxs
        for x in range(xsize):
            elem = ct_img[crow + (x >> bits)]
            g2r = elem & 0xFF
            g2b = (elem >> 8) & 0xFF
            r2b = (elem >> 16) & 0xFF
            p = data[row + x]
            green = (p >> 8) & 0xFF
            red = ((p >> 16) & 0xFF)
            blue = p & 0xFF
            red = (red + _ct_delta(g2r, green)) & 0xFF
            blue = (blue + _ct_delta(g2b, green) + _ct_delta(r2b, red)) & 0xFF
            data[row + x] = (p & 0xFF00FF00) | (red << 16) | blue


def _forward_cross_color(argb, g2r: int, g2b: int, r2b: int):
    out = []
    for p in argb:
        green = (p >> 8) & 0xFF
        red = (p >> 16) & 0xFF
        blue = p & 0xFF
        new_red = (red - _ct_delta(g2r, green)) & 0xFF
        new_blue = (blue - _ct_delta(g2b, green) - _ct_delta(r2b, red)) & 0xFF
        out.append((p & 0xFF00FF00) | (new_red << 16) | new_blue)
    return out


def _inverse_subtract_green(data) -> None:
    for i, p in enumerate(data):
        g = (p >> 8) & 0xFF
        r = (((p >> 16) & 0xFF) + g) & 0xFF
        b = ((p & 0xFF) + g) & 0xFF
        data[i] = (p & 0xFF00FF00) | (r << 16) | b


def _forward_subtract_green(argb):
    out = []
    for p in argb:
        g = (p >> 8) & 0xFF
        r = (((p >> 16) & 0xFF) - g) & 0xFF
        b = ((p & 0xFF) - g) & 0xFF
        out.append((p & 0xFF00FF00) | (r << 16) | b)
    return out


def _palette_width_bits(num_colors: int) -> int:
    if num_colors > 16:
        return 0
    if num_colors > 4:
        return 1
    if num_colors > 2:
        return 2
    return 3


def _inverse_color_indexing(data, xsize: int, ysize: int, palette):
    """Un-bundle sub-pixels and map indices through the palette.
    Returns a new pixel list at full width."""
    n = len(palette)
    wbits = _palette_width_bits(n)
    if wbits == 0:
        out = [0] * (xsize * ysize)
        for i, p in enumerate(data):
            idx = (p >> 8) & 0xFF
            out[i] = palette[idx] if idx < n else 0
        return out
    packed_x = _sub_size(xsize, wbits)
    per = 1 << wbits
    ibits = 8 >> wbits
    mask = (1 << ibits) - 1
    out = [0] * (xsize * ysize)
    for y in range(ysize):
        for px in range(packed_x):
            g = (data[y * packed_x + px] >> 8) & 0xFF
            base = y * xsize + (px << wbits)
            for k in range(per):
                x = (px << wbits) + k
                if x >= xsize:
                    break
                idx = (g >> (k * ibits)) & mask
                out[base + k] = palette[idx] if idx < n else 0
    return out


# --- image-stream decode ---------------------------------------------------

_NUM_LENGTH_CODES = 24
_NUM_DIST_CODES = 40


def _read_prefix_group(br: _BitReader, cache_size: int) -> list[_PrefixCode]:
    sizes = (256 + _NUM_LENGTH_CODES + cache_size, 256, 256, 256, _NUM_DIST_CODES)
    return [_read_prefix_code(br, s) for s in sizes]


def _decode_pixels(br: _BitReader, xsize: int, ysize: int, cache_bits: int,
                   groups, meta, meta_bits: int, meta_xsize: int) -> list[int]:
    num_pixels = xsize * ysize
    data = [0] * num_pixels
    cache = _ColorCache(cache_bits) if cache_bits else None
    pos = 0
    x = 0
    y = 0
    group = groups[0]
    single_group = meta is None
    while pos < num_pixels:
        if not single_group:
            gi = (meta[(y >> meta_bits) * meta_xsize + (x >> meta_bits)] >> 8) & 0xFFFF
            group = groups[gi]
        sym = group[0].decode(br)
        if sym < 256:  # literal: green, red, blue, alpha
            red = group[1].decode(br)
            blue = group[2].decode(br)
            alpha = group[3].decode(br)
            pix = (alpha << 24) | (red << 16) | (sym << 8) | blue
            data[pos] = pix
            if cache:
                cache.insert(pix)
            pos += 1
            x += 1
            if x == xsize:
                x = 0
                y += 1
        elif sym < 256 + _NUM_LENGTH_CODES:  # backward reference
            length = _copy_value(sym - 256, br)
            dist_code = _copy_value(group[4].decode(br), br)
            dist = _plane_to_distance(dist_code, xsize)
            if dist > pos or pos + length > num_pixels:
                raise ValueError("VP8L backref out of range")
            for _ in range(length):
                pix = data[pos - dist]
                data[pos] = pix
                if cache:
                    cache.insert(pix)
                pos += 1
                x += 1
                if x == xsize:
                    x = 0
                    y += 1
        else:  # color-cache hit
            if cache is None:
                raise ValueError("cache symbol without color cache")
            pix = cache.lookup(sym - 256 - _NUM_LENGTH_CODES)
            data[pos] = pix
            pos += 1
            x += 1
            if x == xsize:
                x = 0
                y += 1
    return data


def _decode_image_stream(br: _BitReader, xsize: int, ysize: int,
                         is_level0: bool) -> list[int]:
    transforms = []  # (type, payload) in read order
    if is_level0:
        seen = set()
        while br.read(1):
            ttype = br.read(2)
            if ttype in seen:
                raise ValueError("duplicate VP8L transform")
            seen.add(ttype)
            if ttype in (_PREDICTOR, _CROSS_COLOR):
                bits = br.read(3) + 2
                sub = _decode_image_stream(br, _sub_size(xsize, bits),
                                           _sub_size(ysize, bits), False)
                transforms.append((ttype, (bits, sub, xsize)))
            elif ttype == _SUBTRACT_GREEN:
                transforms.append((ttype, None))
            else:  # color indexing
                num_colors = br.read(8) + 1
                pal_deltas = _decode_image_stream(br, num_colors, 1, False)
                palette = []
                prev = 0
                for d in pal_deltas:
                    prev = _add_pixels(prev, d)
                    palette.append(prev)
                transforms.append((ttype, (palette, xsize)))
                xsize = _sub_size(xsize, _palette_width_bits(num_colors))

    cache_bits = br.read(4) if br.read(1) else 0
    if cache_bits and not 1 <= cache_bits <= 11:
        raise ValueError(f"color cache bits {cache_bits}")
    cache_size = (1 << cache_bits) if cache_bits else 0

    meta = None
    meta_bits = 0
    meta_xsize = 0
    num_groups = 1
    if is_level0 and br.read(1):  # meta prefix codes
        meta_bits = br.read(3) + 2
        meta_xsize = _sub_size(xsize, meta_bits)
        meta = _decode_image_stream(br, meta_xsize,
                                    _sub_size(ysize, meta_bits), False)
        num_groups = max(((p >> 8) & 0xFFFF) for p in meta) + 1

    groups = [_read_prefix_group(br, cache_size) for _ in range(num_groups)]
    data = _decode_pixels(br, xsize, ysize, cache_bits, groups,
                          meta, meta_bits, meta_xsize)

    for ttype, payload in reversed(transforms):
        if ttype == _SUBTRACT_GREEN:
            _inverse_subtract_green(data)
        elif ttype == _PREDICTOR:
            bits, sub, full_x = payload
            _inverse_predictor(data, full_x, ysize, bits, sub)
        elif ttype == _CROSS_COLOR:
            bits, sub, full_x = payload
            _inverse_cross_color(data, full_x, ysize, bits, sub)
        else:
            palette, full_x = payload
            data = _inverse_color_indexing(data, full_x, ysize, palette)
            xsize = full_x
    return data


# --- container + public decode API ----------------------------------------


def decode_webp(payload: bytes) -> np.ndarray:
    """WebP bytes -> (h, w, 4) uint8 RGBA (lossless VP8L streams)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("not a RIFF/WEBP payload")
    i = 12
    vp8l = None
    while i + 8 <= len(payload):
        fourcc = payload[i:i + 4]
        (sz,) = struct.unpack_from("<I", payload, i + 4)
        body = payload[i + 8:i + 8 + sz]
        if fourcc == b"VP8L":
            vp8l = body
            break
        if fourcc == b"VP8 ":
            raise NotImplementedError(
                "lossy VP8 WebP: install PIL/libwebp and extend decode_webp")
        i += 8 + sz + (sz & 1)
    if vp8l is None:
        raise NotImplementedError("no VP8L chunk (animated/lossy WebP)")
    if vp8l[0] != 0x2F:
        raise ValueError("bad VP8L signature byte")
    br = _BitReader(vp8l[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha hint
    if br.read(3) != 0:
        raise ValueError("unknown VP8L version")
    data = _decode_image_stream(br, w, h, True)
    arr = np.array(data, dtype=np.uint32).reshape(h, w)
    out = np.empty((h, w, 4), dtype=np.uint8)
    out[..., 0] = (arr >> 16) & 0xFF  # R
    out[..., 1] = (arr >> 8) & 0xFF   # G
    out[..., 2] = arr & 0xFF          # B
    out[..., 3] = (arr >> 24) & 0xFF  # A
    return out


def decode_webp_gray(payload: bytes) -> np.ndarray:
    """WebP bytes -> (h, w) uint8 grayscale (BT.601 luma, matching the
    other image codecs' decode_image convention)."""
    rgba = decode_webp(payload).astype(np.float64)
    return np.clip(np.rint(0.299 * rgba[..., 0] + 0.587 * rgba[..., 1]
                           + 0.114 * rgba[..., 2]), 0, 255).astype(np.uint8)


# --- encoder (fixture path) ------------------------------------------------


def _huffman_lengths(freqs: dict[int, int], max_len: int) -> dict[int, int]:
    """Huffman code lengths; falls back to a flat code if the depth
    limit is exceeded (fixture-grade, not rate-optimal)."""
    syms = [s for s, f in freqs.items() if f > 0]
    if not syms:
        return {}
    if len(syms) == 1:
        return {syms[0]: 1}
    import heapq
    heap = [(freqs[s], (s,)) for s in syms]
    heapq.heapify(heap)
    depth = {s: 0 for s in syms}
    while len(heap) > 1:
        fa, ga = heapq.heappop(heap)
        fb, gb = heapq.heappop(heap)
        for s in ga + gb:
            depth[s] += 1
        heapq.heappush(heap, (fa + fb, ga + gb))
    if max(depth.values()) > max_len:
        flat = max(1, (len(syms) - 1).bit_length())
        if flat > max_len:
            raise ValueError("alphabet too large for depth limit")
        return {s: flat for s in syms}
    return depth


def _write_prefix_code(bw: _BitWriter, lengths: dict[int, int],
                       alphabet_size: int) -> dict[int, tuple[int, int]]:
    """Emit a prefix code and return symbol -> (code, length)."""
    syms = sorted(lengths)
    if not syms:
        syms, lengths = [0], {0: 1}  # unused code: 1-symbol placeholder
    if len(syms) <= 2 and max(syms) < 256:
        bw.write(1, 1)  # simple
        bw.write(len(syms) - 1, 1)
        if syms[0] < 2 and len(syms) == 1:
            bw.write(0, 1)
            bw.write(syms[0], 1)
        else:
            bw.write(1, 1)
            bw.write(syms[0], 8)
        if len(syms) == 2:
            bw.write(syms[1], 8)
        if len(syms) == 1:
            return {syms[0]: (0, 0)}
        return {syms[0]: (0, 1), syms[1]: (1, 1)}
    bw.write(0, 1)  # normal
    # the decoder reads code-length tokens until every alphabet symbol
    # has a length (no max_symbol shortcut here), so cover the full
    # alphabet — trailing zeros compress to a few 18-runs
    full = [lengths.get(s, 0) for s in range(alphabet_size)]
    # code-length tokens: literals + 17/18 zero runs
    tokens: list[tuple[int, int, int]] = []  # (symbol, extra, extra_bits)
    i = 0
    while i < len(full):
        if full[i] == 0:
            j = i
            while j < len(full) and full[j] == 0:
                j += 1
            run = j - i
            while run >= 11:
                r = min(run, 138)
                tokens.append((18, r - 11, 7))
                run -= r
            while run >= 3:
                r = min(run, 10)
                tokens.append((17, r - 3, 3))
                run -= r
            for _ in range(run):
                tokens.append((0, 0, 0))
            i = j
        else:
            tokens.append((full[i], 0, 0))
            i += 1
    cl_freq: dict[int, int] = {}
    for s, _, _ in tokens:
        cl_freq[s] = cl_freq.get(s, 0) + 1
    cl_lengths = _huffman_lengths(cl_freq, 7)
    cl_codes = _canonical_codes(
        [cl_lengths.get(s, 0) for s in range(19)])
    if len(cl_lengths) == 1:  # canonical 1-symbol code is 0 bits here;
        only = next(iter(cl_lengths))  # give it length 1 so it round-trips
        cl_lengths = {only: 1}
        cl_codes = {only: (0, 1)}
    bw.write(15, 4)  # num_code_lengths = 19
    for s in _CL_ORDER:
        bw.write(cl_lengths.get(s, 0), 3)
    bw.write(0, 1)  # no explicit max_symbol
    for s, extra, ebits in tokens:
        code, clen = cl_codes[s]
        bw.write_code(code, clen)
        if ebits:
            bw.write(extra, ebits)
    return _canonical_codes([lengths.get(s, 0) for s in range(alphabet_size)])


def _tokenize(argb, cache_bits: int, use_rle: bool):
    """Pixels -> (kind, payload) tokens; kind in {'lit','cache','copy'}."""
    cache = _ColorCache(cache_bits) if cache_bits else None
    tokens = []
    n = len(argb)
    i = 0
    while i < n:
        p = argb[i]
        if use_rle and i > 0 and p == argb[i - 1]:
            run = 1
            while i + run < n and argb[i + run] == p and run < 4096:
                run += 1
            if run >= 3:
                tokens.append(("copy", (run, 1)))
                if cache:
                    for _ in range(run):
                        cache.insert(p)
                i += run
                continue
        if cache is not None:
            k = cache.key(p)
            if cache.vals[k] == p and tokens:
                tokens.append(("cache", k))
                cache.insert(p)
                i += 1
                continue
        tokens.append(("lit", p))
        if cache:
            cache.insert(p)
        i += 1
    return tokens


def _encode_image_stream(bw: _BitWriter, argb, xsize: int,
                         cache_bits: int = 0, use_rle: bool = False,
                         is_level0: bool = False,
                         meta_bits: int | None = None,
                         num_meta_groups: int = 2) -> None:
    """Entropy-coded image data: optional color cache, dist=1 RLE
    backrefs, and (level-0 only) meta prefix codes — the entropy image
    assigns prefix-code group ``(bx + by) % num_meta_groups`` to each
    ``2^meta_bits`` block, each group coded from its own histogram."""
    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
    else:
        bw.write(0, 1)

    ngroups = 1
    group_of_token = None
    if is_level0:
        if meta_bits is not None:
            if use_rle:
                raise ValueError("meta-prefix fixture mode is literal/cache only")
            bw.write(1, 1)
            bw.write(meta_bits - 2, 3)
            mxs = _sub_size(xsize, meta_bits)
            mys = _sub_size((len(argb) + xsize - 1) // xsize, meta_bits)
            ngroups = min(num_meta_groups, mxs * mys)
            meta_img = [0xFF000000 |
                        ((((px + py) % ngroups) & 0xFF) << 8)
                        for py in range(mys) for px in range(mxs)]
            _encode_image_stream(bw, meta_img, mxs)

            def group_of_token(i):
                y, x = divmod(i, xsize)
                return ((x >> meta_bits) + (y >> meta_bits)) % ngroups
        else:
            bw.write(0, 1)  # no meta prefix codes

    tokens = _tokenize(argb, cache_bits, use_rle)
    cache_size = (1 << cache_bits) if cache_bits else 0
    sizes = (256 + _NUM_LENGTH_CODES + cache_size, 256, 256, 256, _NUM_DIST_CODES)
    freqs = [[dict() for _ in range(5)] for _ in range(ngroups)]

    def bump(d, s):
        d[s] = d.get(s, 0) + 1

    # token index -> pixel position (tokens are 1 pixel except copies)
    pos = 0
    token_group = []
    for kind, payload in tokens:
        g = group_of_token(pos) if group_of_token else 0
        token_group.append(g)
        f = freqs[g]
        if kind == "lit":
            p = payload
            bump(f[0], (p >> 8) & 0xFF)
            bump(f[1], (p >> 16) & 0xFF)
            bump(f[2], p & 0xFF)
            bump(f[3], (p >> 24) & 0xFF)
            pos += 1
        elif kind == "cache":
            bump(f[0], 256 + _NUM_LENGTH_CODES + payload)
            pos += 1
        else:
            length, dist = payload
            lcode, _, _ = _copy_symbol(length)
            bump(f[0], 256 + lcode)
            dcode, _, _ = _copy_symbol(_distance_to_plane(dist, xsize))
            bump(f[4], dcode)
            pos += length
    group_codes = []
    for g in range(ngroups):
        codes = []
        for d, size in zip(freqs[g], sizes):
            lengths = _huffman_lengths(d, _MAX_CODE_LEN)
            codes.append(_write_prefix_code(bw, lengths, size))
        group_codes.append(codes)
    for (kind, payload), g in zip(tokens, token_group):
        codes = group_codes[g]
        if kind == "lit":
            p = payload
            for ci, sh in ((0, 8), (1, 16), (2, 0), (3, 24)):
                code, clen = codes[ci][(p >> sh) & 0xFF]
                bw.write_code(code, clen)
        elif kind == "cache":
            code, clen = codes[0][256 + _NUM_LENGTH_CODES + payload]
            bw.write_code(code, clen)
        else:
            length, dist = payload
            lcode, extra, ebits = _copy_symbol(length)
            code, clen = codes[0][256 + lcode]
            bw.write_code(code, clen)
            if ebits:
                bw.write(extra, ebits)
            dcode, dextra, debits = _copy_symbol(_distance_to_plane(dist, xsize))
            code, clen = codes[4][dcode]
            bw.write_code(code, clen)
            if debits:
                bw.write(dextra, debits)


def _to_argb(img: np.ndarray) -> tuple[list[int], int, int]:
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        h, w = img.shape
        rgb = np.repeat(img[..., None], 3, axis=2)
        a = np.full((h, w), 255, np.uint8)
    elif img.ndim == 3 and img.shape[2] == 3:
        h, w = img.shape[:2]
        rgb = img
        a = np.full((h, w), 255, np.uint8)
    elif img.ndim == 3 and img.shape[2] == 4:
        h, w = img.shape[:2]
        rgb = img[..., :3]
        a = img[..., 3]
    else:
        raise ValueError(f"image shape {img.shape}")
    packed = ((a.astype(np.uint32) << 24) | (rgb[..., 0].astype(np.uint32) << 16)
              | (rgb[..., 1].astype(np.uint32) << 8) | rgb[..., 2])
    return [int(v) for v in packed.ravel()], w, h


def encode_webp(img: np.ndarray, *, palette: bool = False,
                subtract_green: bool = False, predictor: int | None = None,
                cross_color: tuple[int, int, int] | None = None,
                cache_bits: int = 0, use_rle: bool = False,
                meta_bits: int | None = None) -> bytes:
    """Lossless VP8L encoder (fixture/synth path).

    img: (h, w) gray, (h, w, 3) RGB or (h, w, 4) RGBA uint8.  The
    transform flags select which decoder paths the stream exercises;
    output is always an exact lossless encoding.
    """
    argb, w, h = _to_argb(img)
    if w > 1 << 14 or h > 1 << 14:
        raise ValueError("VP8L dimension limit is 16384")
    bw = _BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # alpha hint
    bw.write(0, 3)  # version

    coded_xsize = w
    if palette:
        if subtract_green or predictor is not None or cross_color is not None:
            raise ValueError("palette mode composes with no other transform here")
        colors = sorted(set(argb))
        if len(colors) > 256:
            raise ValueError("more than 256 colors: palette mode unavailable")
        index = {c: i for i, c in enumerate(colors)}
        bw.write(1, 1)
        bw.write(_COLOR_INDEXING, 2)
        bw.write(len(colors) - 1, 8)
        deltas = []
        prev = 0
        for c in colors:
            deltas.append(_sub_pixels(c, prev))
            prev = c
        _encode_image_stream(bw, deltas, len(colors))
        wbits = _palette_width_bits(len(colors))
        if wbits == 0:
            argb = [(0xFF000000 | (index[p] << 8)) for p in argb]
        else:
            packed_x = _sub_size(w, wbits)
            per = 1 << wbits
            ibits = 8 >> wbits
            packed = [0] * (packed_x * h)
            for y in range(h):
                for x in range(w):
                    g = index[argb[y * w + x]]
                    packed[y * packed_x + (x >> wbits)] |= g << ((x % per) * ibits)
            argb = [0xFF000000 | (g << 8) for g in packed]
            coded_xsize = packed_x
    else:
        if subtract_green:
            bw.write(1, 1)
            bw.write(_SUBTRACT_GREEN, 2)
            argb = _forward_subtract_green(argb)
        if cross_color is not None:
            g2r, g2b, r2b = (v & 0xFF for v in cross_color)
            bits = 4
            bw.write(1, 1)
            bw.write(_CROSS_COLOR, 2)
            bw.write(bits - 2, 3)
            elem = 0xFF000000 | (r2b << 16) | (g2b << 8) | g2r
            sub = [elem] * (_sub_size(w, bits) * _sub_size(h, bits))
            _encode_image_stream(bw, sub, _sub_size(w, bits))
            argb = _forward_cross_color(argb, g2r, g2b, r2b)
        if predictor is not None:
            if not 0 <= predictor <= 13:
                raise ValueError("predictor mode 0..13")
            bits = 4
            bw.write(1, 1)
            bw.write(_PREDICTOR, 2)
            bw.write(bits - 2, 3)
            sub = [0xFF000000 | (predictor << 8)] * (
                _sub_size(w, bits) * _sub_size(h, bits))
            _encode_image_stream(bw, sub, _sub_size(w, bits))
            argb = _forward_predictor(argb, w, h, bits, predictor)
    bw.write(0, 1)  # end of transforms

    _encode_image_stream(bw, argb, coded_xsize, cache_bits=cache_bits,
                         use_rle=use_rle, is_level0=True, meta_bits=meta_bits)
    stream = b"\x2f" + bw.bytes()
    chunk = b"VP8L" + struct.pack("<I", len(stream)) + stream
    if len(stream) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff
