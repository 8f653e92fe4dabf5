"""S2 cell-id spatial index, vectorized in numpy over uint64.

The reference indexes features with a two-level z-order tile grid
(/root/reference/include/tile_data.h:319-498: z6 buckets + per-bucket
index); the north rule asks for the H3/S2 cell analogue on the Ray
side.  This is an independent implementation of the *published* S2
geometry cell scheme (s2geometry.io/devguide/s2cell_hierarchy):

    lat/lng -> unit xyz -> cube face + (u,v) -> quadratic (s,t)
            -> 30-bit (i,j) -> Hilbert position
    cell id = face(3 bits) | hilbert position (2*level bits) | lsb

All hot paths (lat/lng -> leaf id, parent, token, range) are numpy
kernels over whole Arrow batches; only the small-side covering BFS
(run once per broadcast build geometry) is scalar Python.

Used by ops/s2ops.py:
  - `s2_cells` query (leaf + level-k ids/tokens per point), with an
    exact DuckDB oracle (the same per-level Hilbert descent written as
    a recursive CTE)
  - `s2_pip_join`: covering-prefiltered point-in-polygon join whose
    result (after the exact verify) is identical to pip_join's.
"""

from __future__ import annotations

import functools
import math

import numpy as np

MAX_LEVEL = 30
_LOOKUP_BITS = 4
_SWAP = 1
_INVERT = 2

# Canonical public tables (s2geometry s2coords.cc).
POS_TO_IJ = np.array(
    [[0, 1, 3, 2], [0, 2, 3, 1], [3, 2, 0, 1], [3, 1, 0, 2]], dtype=np.int64)
POS_TO_ORIENT = np.array([_SWAP, 0, 0, _INVERT | _SWAP], dtype=np.int64)
# ij -> pos, derived (not hand-copied) from POS_TO_IJ
IJ_TO_POS = np.zeros((4, 4), dtype=np.int64)
for _o in range(4):
    for _p in range(4):
        IJ_TO_POS[_o, POS_TO_IJ[_o, _p]] = _p

# 4-bits-at-a-time lookup tables for the vectorized Hilbert transform.
_LOOKUP_POS = np.zeros(1 << (2 * _LOOKUP_BITS + 2), dtype=np.uint64)
_LOOKUP_IJ = np.zeros(1 << (2 * _LOOKUP_BITS + 2), dtype=np.uint64)


def _init_lookup(level: int, i: int, j: int, orig: int, pos: int, orient: int) -> None:
    if level == _LOOKUP_BITS:
        ij = (i << _LOOKUP_BITS) + j
        _LOOKUP_POS[(ij << 2) + orig] = (pos << 2) + orient
        _LOOKUP_IJ[(pos << 2) + orig] = (ij << 2) + orient
        return
    level += 1
    i <<= 1
    j <<= 1
    pos <<= 2
    r = POS_TO_IJ[orient]
    for d in range(4):
        _init_lookup(level, i + (int(r[d]) >> 1), j + (int(r[d]) & 1),
                     orig, pos + d, orient ^ int(POS_TO_ORIENT[d]))


for _o in range(4):
    _init_lookup(0, 0, 0, _o, 0, _o)


# --- coordinate transforms (all vectorized) -----------------------------

def xyz_from_latlng(lat_deg, lng_deg):
    phi = np.radians(np.asarray(lat_deg, dtype=np.float64))
    theta = np.radians(np.asarray(lng_deg, dtype=np.float64))
    cp = np.cos(phi)
    return cp * np.cos(theta), cp * np.sin(theta), np.sin(phi)


def latlng_from_xyz(x, y, z):
    lat = np.degrees(np.arctan2(z, np.hypot(x, y)))
    lng = np.degrees(np.arctan2(y, x))
    return lat, lng


def face_uv_from_xyz(x, y, z):
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    axis = np.where(ax > ay, np.where(ax > az, 0, 2), np.where(ay > az, 1, 2))
    comp = np.where(axis == 0, x, np.where(axis == 1, y, z))
    face = np.where(comp < 0, axis + 3, axis)
    with np.errstate(divide="ignore", invalid="ignore"):
        # unused branches of the select may divide by zero; discarded
        u = np.select(
            [face == 0, face == 1, face == 2, face == 3, face == 4],
            [y / x, -x / y, -x / z, z / x, z / y], default=-y / z)
        v = np.select(
            [face == 0, face == 1, face == 2, face == 3, face == 4],
            [z / x, z / y, -y / z, y / x, -x / y], default=-x / z)
    return face.astype(np.int64), u, v


def xyz_from_face_uv(face, u, v):
    face = np.asarray(face)
    u = np.asarray(u, dtype=np.float64)
    v = np.asarray(v, dtype=np.float64)
    one = np.ones_like(u)
    x = np.select([face == 0, face == 1, face == 2, face == 3, face == 4],
                  [one, -u, -u, -one, v], default=v)
    y = np.select([face == 0, face == 1, face == 2, face == 3, face == 4],
                  [u, one, -v, -v, -one], default=u)
    z = np.select([face == 0, face == 1, face == 2, face == 3, face == 4],
                  [v, v, one, -u, -u], default=-one)
    n = np.sqrt(x * x + y * y + z * z)
    return x / n, y / n, z / n


def uv_to_st(u):
    u = np.asarray(u, dtype=np.float64)
    with np.errstate(invalid="ignore"):
        # each branch is evaluated for all u; the out-of-domain side of
        # the sqrt is discarded by the where
        return np.where(u >= 0.0, 0.5 * np.sqrt(1.0 + 3.0 * u),
                        1.0 - 0.5 * np.sqrt(1.0 - 3.0 * u))


def st_to_uv(s):
    s = np.asarray(s, dtype=np.float64)
    return np.where(s >= 0.5, (1.0 / 3.0) * (4.0 * s * s - 1.0),
                    (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - s) * (1.0 - s)))


def st_to_ij(s):
    lim = (1 << MAX_LEVEL) - 1
    return np.clip(np.floor(np.asarray(s) * (1 << MAX_LEVEL)), 0, lim).astype(np.int64)


# --- cell ids -----------------------------------------------------------

def cell_from_face_ij(face, i, j):
    """Leaf (level-30) cell ids from face + 30-bit (i, j), 4 lookup bits
    per step (8 vectorized iterations over the whole array)."""
    face = np.asarray(face, dtype=np.uint64)
    i = np.asarray(i, dtype=np.uint64)
    j = np.asarray(j, dtype=np.uint64)
    n = face << np.uint64(60)
    bits = face & np.uint64(_SWAP)
    mask = np.uint64((1 << _LOOKUP_BITS) - 1)
    for k in range(7, -1, -1):
        s = np.uint64(k * _LOOKUP_BITS)
        bits += ((i >> s) & mask) << np.uint64(_LOOKUP_BITS + 2)
        bits += ((j >> s) & mask) << np.uint64(2)
        bits = _LOOKUP_POS[bits]
        n |= (bits >> np.uint64(2)) << np.uint64(k * 2 * _LOOKUP_BITS)
        bits &= np.uint64(_SWAP | _INVERT)
    return n * np.uint64(2) + np.uint64(1)


def cell_from_latlng(lat_deg, lng_deg, level: int = MAX_LEVEL):
    x, y, z = xyz_from_latlng(lat_deg, lng_deg)
    face, u, v = face_uv_from_xyz(x, y, z)
    ids = cell_from_face_ij(face, st_to_ij(uv_to_st(u)), st_to_ij(uv_to_st(v)))
    if level < MAX_LEVEL:
        ids = cell_parent(ids, level)
    return ids


def cell_to_face_ij(ids):
    """face, leaf i, leaf j for the cell's decoded position."""
    ids = np.asarray(ids, dtype=np.uint64)
    face = (ids >> np.uint64(61)).astype(np.int64)
    bits = (face & _SWAP).astype(np.uint64)
    i = np.zeros_like(ids)
    j = np.zeros_like(ids)
    ij_mask = np.uint64((1 << _LOOKUP_BITS) - 1)
    for k in range(7, -1, -1):
        nbits = MAX_LEVEL - 7 * _LOOKUP_BITS if k == 7 else _LOOKUP_BITS
        pos_mask = np.uint64((1 << (2 * nbits)) - 1)
        bits += ((ids >> np.uint64(k * 2 * _LOOKUP_BITS + 1)) & pos_mask) << np.uint64(2)
        bits = _LOOKUP_IJ[bits]
        i += (bits >> np.uint64(_LOOKUP_BITS + 2)) << np.uint64(k * _LOOKUP_BITS)
        j += ((bits >> np.uint64(2)) & ij_mask) << np.uint64(k * _LOOKUP_BITS)
        bits &= np.uint64(_SWAP | _INVERT)
    return face, i.astype(np.int64), j.astype(np.int64)


def cell_lsb(ids):
    ids = np.asarray(ids, dtype=np.uint64)
    return ids & (~ids + np.uint64(1))


def cell_level(ids):
    lsb = cell_lsb(ids).astype(np.float64)  # exact for powers of two
    return (MAX_LEVEL - (np.log2(lsb).astype(np.int64) >> 1)).astype(np.int64)


def cell_parent(ids, level: int):
    ids = np.asarray(ids, dtype=np.uint64)
    lsb = np.uint64(1) << np.uint64(2 * (MAX_LEVEL - level))
    return (ids & ~((lsb << np.uint64(1)) - np.uint64(1))) | lsb


def cell_range(ids):
    """(range_min, range_max): the leaf-id interval the cell spans."""
    ids = np.asarray(ids, dtype=np.uint64)
    off = cell_lsb(ids) - np.uint64(1)
    return ids - off, ids + off


def cell_children(cid: int):
    lsb = int(cid) & -int(cid)
    nl = lsb >> 2
    base = int(cid) - lsb
    return [base + nl * (2 * k + 1) for k in range(4)]


def face_cell(face: int) -> int:
    return (face << 61) | (1 << 60)


def cell_token(ids) -> list[str]:
    ids = np.asarray(ids, dtype=np.uint64)
    return [format(int(v), "016x").rstrip("0") or "0" for v in ids]


def token_to_cell(tok: str) -> int:
    return int(tok.ljust(16, "0"), 16)


# --- lat/lng rect bound of a cell (scalar; covering-side only) ----------
# Pure-Python scalar math: the covering BFS calls this thousands of
# times on single cells, where numpy's per-call dispatch on length-1
# arrays costs ~100x the arithmetic.

def _st_to_uv_s(s: float) -> float:
    if s >= 0.5:
        return (1.0 / 3.0) * (4.0 * s * s - 1.0)
    return (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - s) * (1.0 - s))


def _xyz_from_face_uv_s(face: int, u: float, v: float):
    if face == 0:
        x, y, z = 1.0, u, v
    elif face == 1:
        x, y, z = -u, 1.0, v
    elif face == 2:
        x, y, z = -u, -v, 1.0
    elif face == 3:
        x, y, z = -1.0, -v, -u
    elif face == 4:
        x, y, z = v, -1.0, -u
    else:
        x, y, z = v, u, -1.0
    n = math.sqrt(x * x + y * y + z * z)
    return (x / n, y / n, z / n)


def _cross_s(a, b):
    return (a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0])


def _dot_s(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _cell_uv_rect(cid: int):
    cid = int(cid)
    face = cid >> 61
    tz = (cid & -cid).bit_length() - 1
    level = MAX_LEVEL - (tz >> 1)
    # scalar per-4-bit Hilbert inverse (same tables as the batch kernel)
    bits = face & _SWAP
    i = j = 0
    for k in range(7, -1, -1):
        nbits = MAX_LEVEL - 7 * _LOOKUP_BITS if k == 7 else _LOOKUP_BITS
        bits += ((cid >> (k * 2 * _LOOKUP_BITS + 1)) & ((1 << (2 * nbits)) - 1)) << 2
        bits = int(_LOOKUP_IJ[bits])
        i += (bits >> (_LOOKUP_BITS + 2)) << (k * _LOOKUP_BITS)
        j += ((bits >> 2) & ((1 << _LOOKUP_BITS) - 1)) << (k * _LOOKUP_BITS)
        bits &= _SWAP | _INVERT
    size = 1 << (MAX_LEVEL - level)
    i0, j0 = i & ~(size - 1), j & ~(size - 1)
    scale = 1.0 / (1 << MAX_LEVEL)
    return (face, level,
            _st_to_uv_s(i0 * scale), _st_to_uv_s(j0 * scale),
            _st_to_uv_s((i0 + size) * scale), _st_to_uv_s((j0 + size) * scale))


def _on_arc(a, b, n, p) -> bool:
    return _dot_s(_cross_s(a, p), n) >= 0.0 and \
        _dot_s(_cross_s(p, b), n) >= 0.0


_PAD = 1e-11  # float-safety pad, radians/degree-scale


@functools.lru_cache(maxsize=1 << 16)
def cell_rect_bound(cid: int):
    """(lat_lo, lat_hi, lng_lo, lng_hi) in degrees, conservative
    (superset of the cell).  lng_lo > lng_hi encodes an antimeridian
    wrap; (-180, 180) with full=True encodes all longitudes.

    Latitude extremes are exact: vertex latitudes plus, per edge, the
    great-circle z-extreme point (±sqrt(1-nz^2) for unit normal n) when
    it lies on the arc.  Longitude is monotonic along any great-circle
    arc not through a pole, so the lng span is the union of the
    direction-resolved vertex-to-vertex intervals; pole-touching or
    pole-containing cells get full longitude."""
    face, level, u0, v0, u1, v1 = _cell_uv_rect(cid)
    polar = face in (2, 5) and u0 <= 0.0 <= u1 and v0 <= 0.0 <= v1
    corners_uv = [(u0, v0), (u1, v0), (u1, v1), (u0, v1)]
    vs = [_xyz_from_face_uv_s(face, u, v) for u, v in corners_uv]
    deg = 180.0 / math.pi
    lat = [deg * math.atan2(p[2], math.hypot(p[0], p[1])) for p in vs]
    lat_lo, lat_hi = min(lat), max(lat)
    full_lng = polar
    lng_ints = []
    for k in range(4):
        a, b = vs[k], vs[(k + 1) % 4]
        n = _cross_s(a, b)
        nrm = math.sqrt(_dot_s(n, n))
        if nrm < 1e-15:
            full_lng = True
            continue
        hxy = math.hypot(n[0], n[1]) / nrm
        if hxy > 1e-15:
            # z-extreme points of the edge's great circle
            nu = (n[0] / nrm, n[1] / nrm, n[2] / nrm)
            s = (nu[0] * nu[0] + nu[1] * nu[1])
            pp = (-nu[0] * nu[2] / hxy, -nu[1] * nu[2] / hxy, s / hxy)
            if _on_arc(a, b, n, pp):
                lat_hi = max(lat_hi, deg * math.asin(min(1.0, pp[2])))
            pm = (-pp[0], -pp[1], -pp[2])
            if _on_arc(a, b, n, pm):
                lat_lo = min(lat_lo, deg * math.asin(max(-1.0, pm[2])))
        if math.hypot(a[0], a[1]) < 1e-14 or math.hypot(b[0], b[1]) < 1e-14:
            full_lng = True  # edge endpoint at a pole: lng undefined
            continue
        la = deg * math.atan2(a[1], a[0])
        lb = deg * math.atan2(b[1], b[0])
        vel = _cross_s(n, a)  # tangent at a toward b
        d = a[0] * vel[1] - a[1] * vel[0]  # sign of dlng at a
        delta = (lb - la + 180.0) % 360.0 - 180.0
        if delta != 0.0 and d != 0.0 and (delta > 0) != (d > 0):
            full_lng = True  # arc goes the long way round (near-pole)
            continue
        lng_ints.append((la, lb) if delta >= 0 else (lb, la))
    if polar:
        if face == 2:
            lat_hi = 90.0
        else:
            lat_lo = -90.0
    lat_lo = max(-90.0, lat_lo - _PAD)
    lat_hi = min(90.0, lat_hi + _PAD)
    if full_lng or not lng_ints:
        return (lat_lo, lat_hi, -180.0, 180.0)
    # union in coordinates unwrapped around the first interval's start
    ref = lng_ints[0][0]
    lo, hi = 0.0, 0.0
    for a, b in lng_ints:
        ra = (a - ref + 180.0) % 360.0 - 180.0
        rb = ra + ((b - a + 180.0) % 360.0 - 180.0)
        lo, hi = min(lo, ra), max(hi, rb)
    lng_lo, lng_hi = ref + lo - _PAD, ref + hi + _PAD
    if lng_lo < -180.0:
        lng_lo += 360.0  # wrapped interval: lo > hi
    if lng_hi > 180.0:
        lng_hi -= 360.0
    return (lat_lo, lat_hi, lng_lo, lng_hi)


def _lng_intersects(lo, hi, q0, q1) -> bool:
    if lo <= hi:
        return lo <= q1 and q0 <= hi
    return q1 >= lo or q0 <= hi  # wrapped cell interval


def _lng_contained(lo, hi, q0, q1) -> bool:
    """cell lng interval [lo, hi] fully inside query [q0, q1] (q0<=q1)."""
    if lo <= hi:
        return q0 <= lo and hi <= q1
    return False


def covering_for_rect(lon0: float, lat0: float, lon1: float, lat1: float,
                      max_level: int = 8) -> np.ndarray:
    """Disjoint cells (mixed levels <= max_level) covering the lat/lng
    rectangle: BFS from the 6 face cells, pruning on the conservative
    cell_rect_bound, early-emitting cells whose bound is fully inside
    the rect.  Conservative => no false negatives for prefilter use
    (tested empirically in tests/test_s2.py)."""
    out: list[int] = []
    stack = [face_cell(f) for f in range(6)]
    while stack:
        cid = stack.pop()
        la0, la1, lo, hi = cell_rect_bound(cid)
        if la1 < lat0 or la0 > lat1 or not _lng_intersects(lo, hi, lon0, lon1):
            continue
        level = int(cell_level(np.array([cid], dtype=np.uint64))[0])
        if level >= max_level or (
                lat0 <= la0 and la1 <= lat1 and _lng_contained(lo, hi, lon0, lon1)):
            out.append(cid)
            continue
        stack.extend(cell_children(cid))
    return np.array(sorted(out), dtype=np.uint64)
