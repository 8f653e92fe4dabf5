import numpy as np
import pytest

from tilemaker_ray.geom import core, clip, simplify, strtree


def ring(*pts):
    return np.array(list(pts) + [pts[0]], dtype=np.float64)


SQUARE = ring((0, 0), (0, 10), (10, 10), (10, 0))  # CW in y-up? shoelace:
# (0,0)->(0,10)->(10,10)->(10,0): signed area = +100? compute in test.


class TestCore:
    def test_pack_roundtrip_mls(self):
        parts = [np.array([[0.0, 1.0], [2.0, 3.0]]), np.array([[4.0, 5.0], [6.0, 7.0], [8.0, 9.0]])]
        blob = core.pack_mls(parts)
        kind, out = core.unpack(blob)
        assert kind == core.KIND_MLS
        assert len(out) == 2
        np.testing.assert_array_equal(out[1], parts[1])

    def test_pack_roundtrip_mp(self):
        polys = [[SQUARE, ring((2, 2), (2, 4), (4, 4), (4, 2))]]
        blob = core.pack_mp(polys)
        kind, out = core.unpack(blob)
        assert kind == core.KIND_MP
        np.testing.assert_array_equal(out[0][0], SQUARE)

    def test_signed_area_and_correct(self):
        sa = core.ring_signed_area(SQUARE)
        assert abs(abs(sa) - 100.0) < 1e-12
        fixed = core.correct_polygon([SQUARE, ring((2, 2), (2, 4), (4, 4), (4, 2))])
        assert core.ring_signed_area(fixed[0]) < 0  # outer CW (boost default)
        assert core.ring_signed_area(fixed[1]) > 0  # inner CCW

    def test_points_in_polygon(self):
        rings = core.correct_polygon([SQUARE, ring((2, 2), (2, 4), (4, 4), (4, 2))])
        px = np.array([5.0, 3.0, 15.0, 1.0])
        py = np.array([5.0, 3.0, 5.0, 1.0])
        got = core.points_in_polygon(px, py, rings)
        np.testing.assert_array_equal(got, [True, False, False, True])

    def test_points_in_concave(self):
        # L-shape
        r = ring((0, 0), (4, 0), (4, 1), (1, 1), (1, 4), (0, 4))
        got = core.points_in_polygon([0.5, 2.0, 3.0], [3.0, 2.0, 0.5], [r])
        np.testing.assert_array_equal(got, [True, False, True])

    def test_spherical_area_vs_known(self):
        # ~1 degree square at the equator ≈ (111.32 km)^2
        from tilemaker_ray.tilemath import lat2latp
        r = ring((0, 0), (0, lat2latp(1.0)), (1, lat2latp(1.0)), (1, 0))
        rings = core.correct_polygon([r])
        a = abs(core.spherical_area([rings]))
        assert a == pytest.approx(111.19e3 * 111.19e3, rel=0.02)

    def test_haversine_length(self):
        from tilemaker_ray.tilemath import lat2latp
        ls = np.array([[0.0, 0.0], [1.0, 0.0]])  # 1 deg lon at equator
        assert core.haversine_length(ls) == pytest.approx(111319.49, rel=1e-3)
        ls2 = np.array([[0.0, lat2latp(0.0)], [0.0, lat2latp(1.0)]])
        assert core.haversine_length(ls2) == pytest.approx(111319.49, rel=1e-3)

    def test_centroid_polygon(self):
        c = core.centroid(core.correct_polygon([SQUARE]))
        assert c == pytest.approx((5.0, 5.0))

    def test_centroid_linestring(self):
        c = core.centroid(np.array([[0.0, 0.0], [10.0, 0.0]]))
        assert c == pytest.approx((5.0, 0.0))

    def test_intersects(self):
        sq = core.correct_polygon([SQUARE])
        line_in = np.array([[-5.0, 5.0], [15.0, 5.0]])
        line_out = np.array([[-5.0, -5.0], [-1.0, 15.0]])
        assert core.polyline_intersects_polygon(line_in, sq)
        assert not core.polyline_intersects_polygon(line_out, sq)
        other = core.correct_polygon([ring((8, 8), (8, 12), (12, 12), (12, 8))])
        far = core.correct_polygon([ring((20, 20), (20, 22), (22, 22), (22, 20))])
        assert core.polygon_intersects_polygon(sq, other)
        assert not core.polygon_intersects_polygon(sq, far)


class TestClip:
    def test_fast_clip_inside(self):
        out = clip.fast_clip_ring(SQUARE, -1, -1, 11, 11)
        np.testing.assert_array_equal(out, SQUARE)

    def test_fast_clip_corner(self):
        out = clip.fast_clip_ring(SQUARE, 5, 5, 20, 20)
        # clipped to the [5,10]x[5,10] quarter
        assert out[:, 0].min() == 5 and out[:, 0].max() == 10
        assert out[:, 1].min() == 5 and out[:, 1].max() == 10

    def test_fast_clip_outside(self):
        out = clip.fast_clip_ring(SQUARE, 20, 20, 30, 30)
        assert len(out) == 0

    def test_clip_polygon_drops_hole_outside(self):
        rings = core.correct_polygon([SQUARE, ring((1, 1), (1, 3), (3, 3), (3, 1))])
        out = clip.clip_polygon(rings, 5, 5, 20, 20)
        assert out is not None and len(out) == 1  # hole clipped away

    def test_clip_multipolygon(self):
        mp = [core.correct_polygon([SQUARE]),
              core.correct_polygon([ring((100, 100), (100, 110), (110, 110), (110, 100))])]
        out = clip.clip_multipolygon(mp, -1, -1, 50, 50)
        assert len(out) == 1

    def test_clip_linestring_split(self):
        ls = np.array([[-5.0, 5.0], [5.0, 5.0], [5.0, 15.0], [15.0, 15.0]])
        parts = clip.clip_linestring(ls, 0, 0, 10, 10)
        assert len(parts) == 1
        p = parts[0]
        assert p[0][0] == 0.0 and p[-1][1] == 10.0

    def test_clip_linestring_two_parts(self):
        # enters, exits, re-enters
        ls = np.array([[-5.0, 2.0], [5.0, 2.0], [5.0, 20.0], [8.0, 20.0], [8.0, 5.0]])
        parts = clip.clip_linestring(ls, 0, 0, 10, 10)
        assert len(parts) == 2

    def test_clip_linestring_tilemaker_presplit(self):
        # middle segment entirely misses the clip box → split into 2 runs
        ls = np.array([[1.0, 1.0], [2.0, 2.0], [100.0, 100.0], [101.0, 100.0], [3.0, 1.0], [1.0, 3.0]])
        parts = clip.clip_linestring_tilemaker(ls, (0, 0, 10, 10), (-1, -1, 11, 11))
        assert len(parts) >= 2


class TestSimplify:
    def test_dp_collinear(self):
        ls = np.array([[0.0, 0.0], [1.0, 0.001], [2.0, 0.0], [3.0, -0.001], [4.0, 0.0]])
        out = simplify.douglas_peucker(ls, 0.01)
        assert len(out) == 2

    def test_dp_keeps_corner(self):
        ls = np.array([[0.0, 0.0], [5.0, 5.0], [10.0, 0.0]])
        out = simplify.douglas_peucker(ls, 0.5)
        assert len(out) == 3

    def test_visvalingam_line(self):
        ls = np.array([[0.0, 0.0], [1.0, 0.001], [2.0, 0.0], [3.0, 5.0], [4.0, 0.0]])
        out = simplify.simplify_vis_linestring(ls, 0.1)
        # tiny triangle at index 1 removed, big spike kept
        assert len(out) == 4
        assert [3.0, 5.0] in out.tolist()

    def test_visvalingam_retain_ring(self):
        r = ring((0, 0), (1, 0.0001), (2, 0), (2, 2), (0, 2))
        out = simplify.visvalingam(r, 1e9, 4)
        assert len(out) == 4  # retains minimum 4 points

    def test_simplify_polygon_drops_small(self):
        r = ring((0, 0), (0.1, 0), (0.1, 0.1), (0, 0.1))
        assert simplify.simplify_polygon([r], 1.0) is None

    def test_simplify_polygon_straightens(self):
        r = ring((0, 0), (5, 0.001), (10, 0), (10, 10), (0, 10))
        out = simplify.simplify_polygon([r], 0.1)
        assert out is not None
        assert len(out[0]) == 5  # midpoint dropped, ring stays closed


class TestSTRtree:
    def test_query(self):
        rng = np.random.default_rng(7)
        pts = rng.uniform(0, 100, size=(500, 2))
        boxes = np.column_stack([pts, pts + 1.0])
        t = strtree.STRtree(boxes)
        got = set(t.query(10, 10, 20, 20).tolist())
        brute = set(np.nonzero((boxes[:, 0] <= 20) & (boxes[:, 2] >= 10) &
                               (boxes[:, 1] <= 20) & (boxes[:, 3] >= 10))[0].tolist())
        assert got == brute

    def test_query_empty(self):
        t = strtree.STRtree(np.empty((0, 4)))
        assert len(t.query(0, 0, 1, 1)) == 0

    def test_nearest(self):
        rng = np.random.default_rng(3)
        pts = rng.uniform(0, 100, size=(200, 2))
        boxes = np.column_stack([pts, pts])
        t = strtree.STRtree(boxes)
        got = t.nearest_point(50.0, 50.0, 5)
        d = np.hypot(pts[:, 0] - 50, pts[:, 1] - 50)
        brute = np.argsort(d, kind="stable")[:5]
        assert set(got.tolist()) == set(brute.tolist())


class TestMVT:
    def test_roundtrip(self):
        from tilemaker_ray import mvt
        tb = mvt.TileBuilder()
        lb = tb.layer("poi", 2, 4096)
        lb.add_feature(mvt.GEOM_POINT, lb.encode_points([(100, 200), (150, 250)]),
                       [("name", "x"), ("rank", 3.0), ("flag", True)], fid=42)
        lb2 = tb.layer("roads", 2, 4096)
        lb2.add_feature(mvt.GEOM_LINESTRING,
                        lb2.encode_multilinestring([[(0, 0), (10, 10), (20, 5)]]),
                        [("class", "major")])
        lb3 = tb.layer("water", 2, 4096)
        lb3.add_feature(mvt.GEOM_POLYGON,
                        lb3.encode_polygon([[(0, 0), (0, 100), (100, 100), (100, 0), (0, 0)]]),
                        [])
        data = tb.serialize()
        out = mvt.decode_tile(data)
        assert set(out) == {"poi", "roads", "water"}
        poi = out["poi"]["features"][0]
        assert poi["id"] == 42
        assert poi["tags"] == {"name": "x", "rank": 3.0, "flag": True}
        assert poi["parts"] == [(100, 200), (150, 250)]
        road = out["roads"]["features"][0]
        assert road["parts"] == [[(0, 0), (10, 10), (20, 5)]]
        water = out["water"]["features"][0]
        assert water["parts"][0][0] == water["parts"][0][-1]
        assert len(water["parts"][0]) == 5

    def test_key_value_dedup(self):
        from tilemaker_ray import mvt
        lb = mvt.LayerBuilder("l")
        lb.add_feature(mvt.GEOM_POINT, lb.encode_points([(0, 0)]), [("a", "v"), ("b", "v")])
        lb.add_feature(mvt.GEOM_POINT, lb.encode_points([(1, 1)]), [("a", "w")])
        assert lb.keys == ["a", "b"]
        assert len(lb.values) == 2  # "v" deduped

    def test_compress(self):
        from tilemaker_ray import mvt
        import gzip
        raw = b"x" * 1000
        gz = mvt.compress_tile(raw, gzip_fmt=True)
        assert gzip.decompress(gz) == raw

    def test_value_memo_type_safety(self):
        """The (class,value) memo must keep bool(True) and int(1)
        distinct (different wire encodings), and be transparent for
        repeated values."""
        from tilemaker_ray import mvt
        assert mvt._encode_value_memo(True) != mvt._encode_value_memo(1)
        assert mvt._encode_value_memo("x") == mvt._encode_value(("x")[0])
        assert mvt._encode_value_memo(3.5) == mvt._encode_value(3.5)

    def test_varint_negative_and_large_deltas(self):
        """Inlined zigzag+varint path: negative deltas and >1-byte
        varints decode back exactly."""
        from tilemaker_ray import mvt
        pts = [(0, 0), (-5000, 7000), (100000, -100000), (1, 1)]
        lb = mvt.LayerBuilder("l")
        lb.add_feature(mvt.GEOM_LINESTRING,
                       lb.encode_multilinestring([pts]), [])
        tb = mvt.TileBuilder()
        tb.layers.append(lb)
        out = mvt.decode_tile(tb.serialize())
        assert out["l"]["features"][0]["parts"] == [pts]


class TestPolylabel:
    def test_square_center(self):
        from tilemaker_ray.geom.polylabel import polylabel
        sq = ring((0, 0), (10, 0), (10, 10), (0, 10))
        x, y = polylabel([sq], precision=0.01)
        assert abs(x - 5.0) < 0.1 and abs(y - 5.0) < 0.1

    def test_with_hole_avoids_hole(self):
        from tilemaker_ray.geom.polylabel import polylabel
        outer = ring((0, 0), (10, 0), (10, 10), (0, 10))
        hole = ring((4, 4), (6, 4), (6, 6), (4, 6))
        x, y = polylabel([outer, hole], precision=0.01)
        # best point is NOT inside the hole
        assert not (4 < x < 6 and 4 < y < 6)
        assert core.points_in_polygon([x], [y], [outer, hole])[0]

    def test_l_shape_inside(self):
        from tilemaker_ray.geom.polylabel import polylabel
        L = ring((0, 0), (10, 0), (10, 2), (2, 2), (2, 10), (0, 10))
        x, y = polylabel([L], precision=0.01)
        assert core.points_in_polygon([x], [y], [L])[0]

    def test_emitter_layer_as_centroid(self):
        from tilemaker_ray.profile import Emitter
        e = Emitter({"places"})
        outer = ring((0, 0), (4, 0), (4, 4), (0, 4))
        e.LayerAsCentroid("places", [[outer]], algo="polylabel")
        f = e.features[0]
        assert 1.0 < f.lon < 3.0 and 1.0 < f.latp < 3.0


class TestRemoveSpikes:
    def test_spike_removed(self):
        # square with a zero-area spike sticking out of the top edge
        r = np.array([[0., 0.], [10., 0.], [10., 10.], [5., 10.],
                      [5., 15.], [5., 10.], [0., 10.], [0., 0.]])
        out = core.remove_spikes_ring(r)
        assert [5.0, 15.0] not in out.tolist()
        assert abs(abs(core.ring_signed_area(out)) - 100.0) < 1e-9

    def test_clean_ring_unchanged(self):
        r = ring((0, 0), (10, 0), (10, 10), (0, 10))
        out = core.remove_spikes_ring(r)
        np.testing.assert_array_equal(out, r)

    def test_cascading_spikes(self):
        # spike whose removal exposes a second collinear reversal
        r = np.array([[0., 0.], [10., 0.], [10., 10.], [5., 10.],
                      [5., 14.], [5., 15.], [5., 10.], [0., 10.], [0., 0.]])
        out = core.remove_spikes_ring(r)
        assert abs(abs(core.ring_signed_area(out)) - 100.0) < 1e-9


def test_encode_features_np_byte_identical():
    """The vectorized cross-feature geometry encoder must be
    byte-identical to the scalar per-feature encoders over randomized
    point/line/polygon features (open/closed rings, multi-part,
    negative deltas, >2^14 LineTo counts)."""
    import numpy as np
    from tilemaker_ray import mvt
    rng = np.random.default_rng(42)
    specs, expected = [], []
    for _ in range(200):
        kind = int(rng.integers(0, 3))
        if kind == mvt.FEAT_POINTS:
            pts = rng.integers(-9000, 9000, (int(rng.integers(1, 30)), 2)).tolist()
            specs.append((mvt.FEAT_POINTS, [pts]))
            expected.append(mvt.LayerBuilder.encode_points(pts))
        elif kind == mvt.FEAT_LINE:
            parts = [rng.integers(-9000, 9000, (int(rng.integers(2, 40)), 2)).tolist()
                     for _ in range(int(rng.integers(1, 5)))]
            specs.append((mvt.FEAT_LINE, parts))
            expected.append(mvt.LayerBuilder.encode_multilinestring(parts))
        else:
            rings = []
            for _ in range(int(rng.integers(1, 4))):
                r = rng.integers(-9000, 9000, (int(rng.integers(3, 30)), 2)).tolist()
                if rng.random() < 0.7:
                    r = r + [r[0]]
                rings.append(r)
            specs.append((mvt.FEAT_POLYGON, rings))
            expected.append(mvt.LayerBuilder.encode_polygon(rings))
    assert mvt.encode_features_np(specs) == expected
    # array inputs (the assembler's fast path) and a long line
    big = rng.integers(-9000, 9000, (30000, 2))
    assert (mvt.encode_features_np([(mvt.FEAT_LINE, [big])])[0]
            == mvt.LayerBuilder.encode_multilinestring([big.tolist()]))
