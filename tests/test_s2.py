"""S2 cell index tests: cross-check the vectorized lookup-table
transform against an independent per-level Hilbert descent, plus
hierarchy/token/rect-bound/covering properties."""

import numpy as np
import pytest

from tilemaker_ray.geom import s2


def slow_cell_id(lat: float, lng: float, level: int = 30) -> int:
    """Independent scalar implementation: per-level descent using the
    ij->pos table directly (no 4-bit lookup, opposite loop direction)."""
    x, y, z = s2.xyz_from_latlng(np.array([lat]), np.array([lng]))
    face, u, v = s2.face_uv_from_xyz(x, y, z)
    face = int(face[0])
    i = int(s2.st_to_ij(s2.uv_to_st(u))[0])
    j = int(s2.st_to_ij(s2.uv_to_st(v))[0])
    pos = 0
    orient = face & 1
    for k in range(1, level + 1):
        bi = (i >> (30 - k)) & 1
        bj = (j >> (30 - k)) & 1
        p = int(s2.IJ_TO_POS[orient, bi * 2 + bj])
        pos = pos * 4 + p
        orient ^= int(s2.POS_TO_ORIENT[p])
    lsb = 4 ** (30 - level)
    return face * 2 ** 61 + pos * 2 * lsb + lsb


def _rand_latlng(n, seed=7):
    rng = np.random.default_rng(seed)
    lat = rng.uniform(-89.9, 89.9, n)
    lng = rng.uniform(-180.0, 180.0, n)
    return lat, lng


def test_vectorized_matches_independent_descent():
    lat, lng = _rand_latlng(500)
    fast = s2.cell_from_latlng(lat, lng)
    for k in range(len(lat)):
        assert int(fast[k]) == slow_cell_id(float(lat[k]), float(lng[k]))


def test_vectorized_matches_independent_descent_at_levels():
    lat, lng = _rand_latlng(100, seed=11)
    for level in (0, 1, 5, 12, 29):
        fast = s2.cell_from_latlng(lat, lng, level)
        for k in range(0, len(lat), 7):
            assert int(fast[k]) == slow_cell_id(float(lat[k]), float(lng[k]), level)


def test_poles_and_face_centers():
    # face centers map to the center leaf of each face; poles are valid
    lat = np.array([90.0, -90.0, 0.0, 0.0])
    lng = np.array([0.0, 0.0, 0.0, 90.0])
    ids = s2.cell_from_latlng(lat, lng)
    assert list((ids >> np.uint64(61)).astype(int)) == [2, 5, 0, 1]
    assert (s2.cell_level(ids) == 30).all()


def test_level_parent_range():
    lat, lng = _rand_latlng(200, seed=3)
    leaf = s2.cell_from_latlng(lat, lng)
    assert (s2.cell_level(leaf) == 30).all()
    for level in (0, 4, 10, 20):
        par = s2.cell_parent(leaf, level)
        assert (s2.cell_level(par) == level).all()
        lo, hi = s2.cell_range(par)
        assert (lo <= leaf).all() and (leaf <= hi).all()
        # parent-of-parent consistent
        if level > 0:
            assert (s2.cell_parent(par, level - 1) ==
                    s2.cell_parent(leaf, level - 1)).all()


def test_children_partition_parent():
    cid = int(s2.cell_parent(s2.cell_from_latlng(
        np.array([42.0]), np.array([7.0])), 6)[0])
    kids = s2.cell_children(cid)
    lo_p, hi_p = s2.cell_range(np.array([cid], dtype=np.uint64))
    ranges = sorted(
        (int(s2.cell_range(np.array([k], dtype=np.uint64))[0][0]),
         int(s2.cell_range(np.array([k], dtype=np.uint64))[1][0]))
        for k in kids)
    assert ranges[0][0] == int(lo_p[0]) and ranges[-1][1] == int(hi_p[0])
    for a, b in zip(ranges, ranges[1:]):
        # adjacent cells' leaf ranges differ by 2 (leaf ids are odd)
        assert b[0] == a[1] + 2


def test_token_roundtrip():
    lat, lng = _rand_latlng(50, seed=9)
    for level in (3, 14, 30):
        ids = s2.cell_from_latlng(lat, lng, level)
        toks = s2.cell_token(ids)
        for t, i in zip(toks, ids):
            assert s2.token_to_cell(t) == int(i)
            assert len(t) <= 16 and not t.endswith("0") or t == "0"


def test_cell_center_within_own_rect_bound():
    lat, lng = _rand_latlng(60, seed=13)
    for level in (2, 5, 9):
        ids = s2.cell_parent(s2.cell_from_latlng(lat, lng), level)
        for k in range(len(lat)):
            la0, la1, lo, hi = s2.cell_rect_bound(int(ids[k]))
            assert la0 <= lat[k] <= la1
            assert s2._lng_intersects(lo, hi, lng[k], lng[k])


def test_rect_bound_contains_sampled_cell_points():
    # sample interior points of cells via uv jitter; bound must contain them
    rng = np.random.default_rng(5)
    lat, lng = _rand_latlng(25, seed=21)
    ids = s2.cell_parent(s2.cell_from_latlng(lat, lng), 4)
    for cid in ids:
        face, level, u0, v0, u1, v1 = s2._cell_uv_rect(int(cid))
        uu = rng.uniform(u0, u1, 40)
        vv = rng.uniform(v0, v1, 40)
        x, y, z = s2.xyz_from_face_uv(np.full(40, face), uu, vv)
        pl, pg = s2.latlng_from_xyz(x, y, z)
        la0, la1, lo, hi = s2.cell_rect_bound(int(cid))
        assert (pl >= la0 - 1e-9).all() and (pl <= la1 + 1e-9).all()
        for g in pg:
            assert s2._lng_intersects(lo - 1e-9 if lo > -180 else lo,
                                      hi + 1e-9 if hi < 180 else hi, g, g)


def test_polar_cells_full_longitude():
    pole_cell = s2.cell_parent(
        s2.cell_from_latlng(np.array([89.99]), np.array([123.0])), 3)
    la0, la1, lo, hi = s2.cell_rect_bound(int(pole_cell[0]))
    assert la1 == 90.0 and lo == -180.0 and hi == 180.0


def test_covering_no_false_negatives():
    """Any point inside the rect has its leaf id inside some covering
    cell's range — the conservative-prefilter guarantee."""
    rects = [(-10.0, -5.0, 25.0, 20.0), (160.0, 50.0, 179.0, 70.0),
             (-179.0, -85.0, -100.0, -60.0), (100.0, 70.0, 140.0, 85.0)]
    rng = np.random.default_rng(17)
    for lon0, lat0, lon1, lat1 in rects:
        cover = s2.covering_for_rect(lon0, lat0, lon1, lat1, max_level=7)
        assert len(cover) > 0
        lo, hi = s2.cell_range(cover)
        lat = rng.uniform(lat0, lat1, 400)
        lng = rng.uniform(lon0, lon1, 400)
        leaf = s2.cell_from_latlng(lat, lng)
        idx = np.searchsorted(lo, leaf, side="right") - 1
        ok = (idx >= 0) & (leaf <= hi[np.clip(idx, 0, len(hi) - 1)])
        assert ok.all()


def test_covering_cells_disjoint():
    cover = s2.covering_for_rect(-30.0, -20.0, 40.0, 35.0, max_level=6)
    lo, hi = s2.cell_range(cover)
    order = np.argsort(lo)
    lo, hi = lo[order], hi[order]
    assert (lo[1:] > hi[:-1]).all()


def test_hilbert_locality():
    """Any leaf id inside a level-L cell's range shares that parent."""
    lat, lng = _rand_latlng(30, seed=29)
    leaf = s2.cell_from_latlng(lat, lng)
    par = s2.cell_parent(leaf, 10)
    lo, hi = s2.cell_range(par)
    mid = lo + (hi - lo) // np.uint64(2)
    # any leaf id inside the parent's range shares that parent
    mid_leaf = mid | np.uint64(1)
    assert (s2.cell_parent(mid_leaf, 10) == par).all()
