"""Martinez–Rueda boolean ops: unit cases + randomized identities.

Mirrors the reference's geometry expectations: union_many dissolve
(geom.cpp:150-169), make_valid (geometry/correct.hpp), exact clip
fallback (tile_data.cpp:330-346)."""

import numpy as np

from tilemaker_ray.geom import boolops as B


def sq(x0, y0, x1, y1):
    return [[[(x0, y0), (x1, y0), (x1, y1), (x0, y1)]]]


class TestBasics:
    def test_disjoint_union(self):
        r = B.union(sq(0, 0, 1, 1), sq(2, 2, 3, 3))
        assert len(r) == 2
        assert abs(B.multipolygon_area(r) - 2) < 1e-12

    def test_overlap_union(self):
        r = B.union(sq(0, 0, 2, 2), sq(1, 1, 3, 3))
        assert len(r) == 1
        assert abs(B.multipolygon_area(r) - 7) < 1e-12

    def test_intersection(self):
        r = B.intersection(sq(0, 0, 2, 2), sq(1, 1, 3, 3))
        assert abs(B.multipolygon_area(r) - 1) < 1e-12

    def test_difference_makes_hole(self):
        r = B.difference(sq(0, 0, 4, 4), sq(1, 1, 2, 2))
        assert [len(p) for p in r] == [2]  # exterior + hole
        assert abs(B.multipolygon_area(r) - 15) < 1e-12
        # exterior CCW, hole CW
        assert B._ring_signed_area(r[0][0]) > 0
        assert B._ring_signed_area(r[0][1]) < 0

    def test_collinear_overlap_union(self):
        r = B.union(sq(0, 0, 1, 1), sq(0.5, 0, 1.5, 1))
        assert len(r) == 1
        assert abs(B.multipolygon_area(r) - 1.5) < 1e-12

    def test_adjacent_squares_merge(self):
        r = B.union(sq(0, 0, 1, 1), sq(1, 0, 2, 1))
        assert len(r) == 1
        assert abs(B.multipolygon_area(r) - 2) < 1e-12

    def test_identical_union(self):
        r = B.union(sq(0, 0, 1, 1), sq(0, 0, 1, 1))
        assert abs(B.multipolygon_area(r) - 1) < 1e-12

    def test_empty_operands(self):
        assert B.union([], []) == []
        assert B.intersection(sq(0, 0, 1, 1), []) == []
        assert abs(B.multipolygon_area(B.difference(sq(0, 0, 1, 1), []))
                   - 1) < 1e-12

    def test_exact_clip_concave(self):
        # concave U-shape clipped by a box spanning its mouth: exact
        # intersection must produce two disjoint prongs (fast_clip's
        # Sutherland–Hodgman would bridge them — the reference falls
        # back to exact intersection, tile_data.cpp:330-346)
        u = [[[(0, 0), (5, 0), (5, 4), (4, 4), (4, 1), (1, 1), (1, 4), (0, 4)]]]
        box = sq(-1, 2, 6, 5)
        r = B.intersection(u, box)
        assert len(r) == 2
        assert abs(B.multipolygon_area(r) - 4) < 1e-9


class TestMakeValid:
    def test_bowtie(self):
        r = B.make_valid([[[(0, 0), (2, 2), (2, 0), (0, 2)]]])
        assert len(r) == 2
        assert abs(B.multipolygon_area(r) - 2) < 1e-12

    def test_spike_removed(self):
        r = B.make_valid([[[(0, 0), (2, 0), (2, 1), (3, 1),
                            (2, 1), (2, 2), (0, 2)]]])
        assert abs(B.multipolygon_area(r) - 4) < 1e-12

    def test_duplicate_points(self):
        r = B.make_valid([[[(0, 0), (0, 0), (1, 0), (1, 1), (1, 1), (0, 1)]]])
        assert abs(B.multipolygon_area(r) - 1) < 1e-12

    def test_valid_input_roundtrip(self):
        r = B.make_valid(sq(0, 0, 3, 2))
        assert len(r) == 1
        assert abs(B.multipolygon_area(r) - 6) < 1e-12

    def test_cw_input_normalized(self):
        r = B.make_valid([[[(0, 0), (0, 1), (1, 1), (1, 0)]]])  # CW ring
        assert B._ring_signed_area(r[0][0]) > 0


class TestUnionMany:
    def test_chain_dissolve(self):
        mps = [sq(i * 0.5, 0, i * 0.5 + 1, 1) for i in range(8)]
        r = B.union_many(mps)
        assert len(r) == 1
        assert abs(B.multipolygon_area(r) - 4.5) < 1e-12

    def test_empty_and_single(self):
        assert B.union_many([]) == []
        r = B.union_many([sq(0, 0, 1, 1)])
        assert abs(B.multipolygon_area(r) - 1) < 1e-12

    def test_enclosed_hole(self):
        # four rectangles forming a picture frame: union has a hole
        frame = [sq(0, 0, 4, 1), sq(0, 3, 4, 4), sq(0, 0, 1, 4), sq(3, 0, 4, 4)]
        r = B.union_many(frame)
        assert len(r) == 1
        assert len(r[0]) == 2
        assert abs(B.multipolygon_area(r) - 12) < 1e-9


class TestEngineIntegration:
    def test_covered_by_concave_exit(self):
        """VERDICT r1 #9: a line whose vertices are inside a concave
        region but whose segment exits it must NOT be covered."""
        from tilemaker_ray.geom import core as gc
        u = np.array([(0, 0), (5, 0), (5, 4), (4, 4), (4, 1),
                      (1, 1), (1, 4), (0, 4), (0, 0)], dtype=np.float64)
        # both endpoints inside the prongs; segment crosses the mouth
        line = np.array([(0.5, 3.0), (4.5, 3.0)], dtype=np.float64)
        assert not gc.polyline_covered_by_polygon(line, [u])
        # a line within one prong stays covered
        line2 = np.array([(0.2, 1.5), (0.8, 3.5)], dtype=np.float64)
        assert gc.polyline_covered_by_polygon(line2, [u])

    def test_clip_fallback_concave_bridge(self):
        """Sutherland–Hodgman bridges the two prongs of a U across the
        clip edge; the exact fallback must yield two disjoint pieces
        (tile_data.cpp:330-346)."""
        from tilemaker_ray.geom.clip import clip_multipolygon
        u = np.array([(0, 0), (0, 4), (1, 4), (1, 1), (4, 1), (4, 4),
                      (5, 4), (5, 0), (0, 0)], dtype=np.float64)
        out = clip_multipolygon([[u]], -1.0, 2.0, 6.0, 5.0)
        area = sum(abs(B._ring_signed_area([tuple(p) for p in r[0]]))
                   for r in out)
        assert len(out) == 2
        assert abs(area - 4.0) < 1e-9

    def test_correct_geometry_dissolves_bowtie(self):
        from tilemaker_ray.geom import core as gc
        bow = [np.array([(0, 0), (2, 2), (2, 0), (0, 2), (0, 0)],
                        dtype=np.float64)]
        out = gc.correct_geometry([bow])
        assert len(out) == 2
        # engine convention: outer ring CW (negative shoelace, y-up)
        for poly in out:
            assert gc.ring_signed_area(poly[0]) < 0

    def test_assembler_combine_dissolves_overlap(self):
        """Golden A4 case: two overlapping same-attr tile polygons must
        dissolve into one feature whose rings union the area."""
        from tilemaker_ray.stages.salted import _dissolve_int_rings
        a = [[(0, 0), (100, 0), (100, 100), (0, 100), (0, 0)]]
        b = [[(50, 50), (150, 50), (150, 150), (50, 150), (50, 50)]]
        rings = _dissolve_int_rings([a, b])
        assert len(rings) == 1
        area = abs(sum(x0 * y1 - x1 * y0 for (x0, y0), (x1, y1)
                       in zip(rings[0], rings[0][1:]))) / 2
        assert area == 100 * 100 + 100 * 100 - 50 * 50

    def test_area_intersecting_concave_region(self):
        """J5 general case: concave region clips exactly."""
        from tilemaker_ray.stages.spatial_join import PolygonIndex
        from tilemaker_ray.geom import core as gc
        u = np.array([(0, 0), (5, 0), (5, 4), (4, 4), (4, 1),
                      (1, 1), (1, 4), (0, 4), (0, 0)], dtype=np.float64)
        idx = PolygonIndex([{"ring": u, "id": 0}])
        subj = [np.array([(-1, 2), (6, 2), (6, 5), (-1, 5), (-1, 2)],
                         dtype=np.float64)]
        got = idx.area_intersecting(subj)
        # expected: two 1x2 prong pieces, in spherical m² — compare
        # against the convex-rect equivalent computed the same way
        want = abs(gc.spherical_area([[np.array(
            [(0, 2), (1, 2), (1, 4), (0, 4), (0, 2)], dtype=np.float64)]]))
        want += abs(gc.spherical_area([[np.array(
            [(4, 2), (5, 2), (5, 4), (4, 4), (4, 2)], dtype=np.float64)]]))
        assert abs(got - want) / want < 1e-9


def _star(rng, cx, cy, rmax, n):
    ang = np.sort(rng.uniform(0, 2 * np.pi, n))
    rad = rng.uniform(0.2 * rmax, rmax, n)
    return [(cx + r * np.cos(a), cy + r * np.sin(a))
            for a, r in zip(ang, rad)]


def _dist_to_edges(p, mps):
    best = 1e9
    for mp in mps:
        for poly in mp:
            for ring in poly:
                m = len(ring) - (1 if ring[0] == ring[-1] else 0)
                for i in range(m):
                    a = np.array(ring[i])
                    b = np.array(ring[(i + 1) % m])
                    x = np.array(p)
                    ab = b - a
                    t = np.clip(np.dot(x - a, ab) / max(np.dot(ab, ab), 1e-12),
                                0, 1)
                    best = min(best, float(np.linalg.norm(x - (a + t * ab))))
    return best


class TestRandomizedIdentities:
    def test_boolean_identities(self):
        """Area identities + point-membership agreement on random
        star polygons (made valid first — boost's contract too)."""
        rng = np.random.default_rng(7)
        for _ in range(12):
            a = B.make_valid([[_star(rng, rng.uniform(0, 4), rng.uniform(0, 4),
                                     rng.uniform(1, 3), rng.integers(4, 12))]])
            b = B.make_valid([[_star(rng, rng.uniform(0, 4), rng.uniform(0, 4),
                                     rng.uniform(1, 3), rng.integers(4, 12))]])
            if not a or not b:
                continue
            u = B.union(a, b)
            i = B.intersection(a, b)
            d = B.difference(a, b)
            x = B.symmetric_difference(a, b)
            aa, ab_ = B.multipolygon_area(a), B.multipolygon_area(b)
            au, ai = B.multipolygon_area(u), B.multipolygon_area(i)
            assert abs(aa + ab_ - (au + ai)) < 1e-7
            assert abs(B.multipolygon_area(d) - (aa - ai)) < 1e-7
            assert abs(B.multipolygon_area(x) - (au - ai)) < 1e-7
            for _ in range(40):
                p = (rng.uniform(-4, 8), rng.uniform(-4, 8))
                if _dist_to_edges(p, [a, b]) < 1e-6:
                    continue
                in_a = B.point_in_multipolygon(p, a)
                in_b = B.point_in_multipolygon(p, b)
                assert B.point_in_multipolygon(p, u) == (in_a or in_b)
                assert B.point_in_multipolygon(p, i) == (in_a and in_b)
                assert B.point_in_multipolygon(p, d) == (in_a and not in_b)
                assert B.point_in_multipolygon(p, x) == (in_a != in_b)

    def test_make_valid_even_odd(self):
        """make_valid output must match even-odd membership of the raw
        self-intersecting ring."""
        rng = np.random.default_rng(42)
        for _ in range(12):
            n = int(rng.integers(4, 10))
            raw = [[[tuple(x) for x in rng.uniform(0, 10, (n, 2))]]]
            mv = B.make_valid(raw)
            for _ in range(40):
                p = (rng.uniform(-1, 11), rng.uniform(-1, 11))
                if _dist_to_edges(p, [raw]) < 1e-6:
                    continue
                assert B.point_in_multipolygon(p, mv) == \
                    B.point_in_multipolygon(p, raw)
