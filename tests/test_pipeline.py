import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from tilemaker_ray import mvt
from tilemaker_ray import tilemath as tm
from tilemaker_ray.geom import core as gc
from tilemaker_ray.profile import WebProfile, extract_text, hash_url
from tilemaker_ray.sources.pages import generate_block, pages_path
from tilemaker_ray.stages.extract import PageFeatureExtractor
from tilemaker_ray.stages.render import TileRenderer
from tilemaker_ray.stages.tiles import LOWZOOM, assign_tiles_batch


@pytest.fixture(scope="module")
def small_pages():
    return generate_block(42, 0, 500)


@pytest.fixture(scope="module")
def features(small_pages):
    return PageFeatureExtractor()(small_pages)


class TestSource:
    def test_deterministic(self):
        a = generate_block(42, 0, 100)
        b = generate_block(42, 0, 100)
        assert a.equals(b)

    def test_schema(self, small_pages):
        assert small_pages.schema.names == ["url", "warc_ts", "html", "text", "lang"]
        assert small_pages.schema.field("html").type == pa.binary()

    def test_text_invariant(self, small_pages):
        for h, t in zip(small_pages["html"].to_pylist()[:50],
                        small_pages["text"].to_pylist()[:50]):
            assert extract_text(h) == t


class TestExtract:
    def test_features_emitted(self, features):
        assert features.num_rows > 200
        layers = set(features["layer"].to_pylist())
        assert layers <= {"places", "routes", "areas"}
        assert "places" in layers

    def test_point_rows_have_coords(self, features):
        df = features.to_pandas()
        pts = df[df.geom_type == gc.POINT_]
        assert np.isfinite(pts.lon).all()
        assert (pts.geom.str.len() == 0).all()
        lines = df[df.geom_type != gc.POINT_]
        assert (lines.geom.str.len() > 0).all()

    def test_deterministic_feature_ids(self, small_pages):
        a = PageFeatureExtractor()(small_pages).to_pandas().fillna(0.0)
        b = PageFeatureExtractor()(small_pages).to_pandas().fillna(0.0)
        assert a.equals(b)

    def test_invariant_violation_raises(self, small_pages):
        bad = small_pages.set_column(
            small_pages.schema.get_field_index("text"),
            "text", pa.array(["tampered"] * small_pages.num_rows))
        with pytest.raises(ValueError, match="invariant"):
            PageFeatureExtractor()(bad)


class TestAssign:
    def test_point_assignment(self, features):
        out = assign_tiles_batch(features)
        df = out.to_pandas()
        pts = df[(df.geom_type == gc.POINT_) & (df.z6x != LOWZOOM)]
        expect_x = tm.lon2tilex(pts.lon.to_numpy(), 14)
        np.testing.assert_array_equal(pts.tile_x.to_numpy(), expect_x)
        np.testing.assert_array_equal(pts.z6x.to_numpy(), expect_x >> np.uint32(8))

    def test_lowzoom_rows(self, features):
        df = assign_tiles_batch(features).to_pandas()
        low = df[df.z6x == LOWZOOM]
        assert (low.min_zoom <= 5).all()
        # every min_zoom<=5 feature has at least one lowzoom row
        want = df[(df.min_zoom <= 5) & (df.z6x != LOWZOOM)].feature_id.unique()
        assert set(want) == set(low.feature_id.unique())

    def test_large_feature_routing(self):
        # a polygon spanning many z14 tiles -> large rows, one per z6 tile
        ring = np.array([[0.0, 0.0], [0.0, 3.0], [3.0, 3.0], [3.0, 0.0], [0.0, 0.0]])
        t = pa.table({
            "url": ["u"], "feature_id": pa.array([1], pa.uint64()),
            "layer": ["areas"], "geom_type": pa.array([gc.POLYGON_], pa.uint8()),
            "min_zoom": pa.array([8], pa.uint8()), "z_order": pa.array([0], pa.int16()),
            "attrs": ["[]"], "lon": [float("nan")], "latp": [float("nan")],
            "geom": [gc.pack_mp([[ring]])],
        })
        df = assign_tiles_batch(t).to_pandas()
        assert df.large.all()
        # 3 degrees at z6 (5.6 deg/tile) -> 1-2 z6 tiles per axis
        assert 1 <= len(df) <= 9
        assert (df.max_tx - df.min_tx >= 16).all()


class TestRenderE2E:
    def test_tiles_render_and_decode(self, features):
        assigned = assign_tiles_batch(features).to_pandas()
        r = TileRenderer()
        total_feats = 0
        seen = set()
        for key, gdf in assigned.groupby(["z6x", "z6y"]):
            out = r(gdf)
            for _, row in out.iterrows():
                k = (row.zoom, row.tile_x, row.tile_y)
                assert k not in seen
                seen.add(k)
                total_feats += row.n_features
        assert total_feats > 0
        assert len(seen) > 50

    def test_single_point_tile_bytes(self):
        # one point at a known position; decode the z14 tile and check
        lon, lat = 7.42, 43.73
        latp = float(tm.lat2latp(lat))
        t = pa.table({
            "url": ["u"], "feature_id": pa.array([7], pa.uint64()),
            "layer": ["places"], "geom_type": pa.array([gc.POINT_], pa.uint8()),
            "min_zoom": pa.array([14], pa.uint8()), "z_order": pa.array([0], pa.int16()),
            "attrs": ['[["name",0,0,"x"]]'], "lon": [lon], "latp": [latp],
            "geom": [b""],
        })
        df = assign_tiles_batch(t).to_pandas()
        r = TileRenderer(compress=False)
        out = r(df)
        z14 = out[out.zoom == 14].iloc[0]
        assert (z14.tile_x, z14.tile_y) == (8529, 5974)
        dec = mvt.decode_tile(z14.mvt)
        f = dec["places"]["features"][0]
        assert f["tags"] == {"name": "x"}
        bb = tm.TileBbox(8529, 5974, 14)
        ex, ey = bb.scale_latplon(latp, lon)
        assert f["parts"] == [(int(ex), int(ey))]

    def test_attr_minzoom_filtering(self):
        lon, latp = 7.42, float(tm.lat2latp(43.73))
        t = pa.table({
            "url": ["u"], "feature_id": pa.array([7], pa.uint64()),
            "layer": ["places"], "geom_type": pa.array([gc.POINT_], pa.uint8()),
            "min_zoom": pa.array([6], pa.uint8()), "z_order": pa.array([0], pa.int16()),
            "attrs": ['[["host",0,10,"h"],["lang",0,0,"en"]]'],
            "lon": [lon], "latp": [latp], "geom": [b""],
        })
        df = assign_tiles_batch(t).to_pandas()
        r = TileRenderer(compress=False)
        out = r(df)
        z8 = out[out.zoom == 8].iloc[0]
        z12 = out[out.zoom == 12].iloc[0]
        f8 = mvt.decode_tile(z8.mvt)["places"]["features"][0]
        f12 = mvt.decode_tile(z12.mvt)["places"]["features"][0]
        assert "host" not in f8["tags"] and f8["tags"]["lang"] == "en"
        assert f12["tags"]["host"] == "h"

    def test_polygon_clipped_to_tile(self):
        # polygon crossing a tile boundary: decoded coords within margin
        ring = gc.close_ring(np.array([
            [7.40, 54.0], [7.46, 54.0], [7.46, 54.04], [7.40, 54.04]]))
        # use latp coords directly around a z14 tile near latp 54
        t = pa.table({
            "url": ["u"], "feature_id": pa.array([9], pa.uint64()),
            "layer": ["areas"], "geom_type": pa.array([gc.POLYGON_], pa.uint8()),
            "min_zoom": pa.array([14], pa.uint8()), "z_order": pa.array([0], pa.int16()),
            "attrs": ["[]"], "lon": [float("nan")], "latp": [float("nan")],
            "geom": [gc.pack_mp([[ring]])],
        })
        df = assign_tiles_batch(t).to_pandas()
        r = TileRenderer(compress=False)
        for key, gdf in df[df.z6x != LOWZOOM].groupby(["z6x", "z6y"]):
            out = r(gdf)
            for _, row in out[out.zoom == 14].iterrows():
                dec = mvt.decode_tile(row.mvt)
                for f in dec["areas"]["features"]:
                    for part in f["parts"]:
                        for (x, y) in part:
                            # clip margin is extent/200 ≈ 20.5 + rounding
                            assert -21 <= x <= 4096 + 21
                            assert -21 <= y <= 4096 + 21


@pytest.mark.usefixtures("ray_session")
class TestRayPipeline:
    def test_flagship(self):
        from tilemaker_ray.pipelines.flagship import tile_dataset
        d = pages_path(2000)
        df = tile_dataset(d, concurrency=2).to_pandas()
        assert len(df) > 1000
        assert not df.duplicated(subset=["zoom", "tile_x", "tile_y"]).any()
        assert (df.n_bytes > 0).all()
        # deterministic across runs
        df2 = tile_dataset(d, concurrency=2).to_pandas()
        a = df.sort_values(["zoom", "tile_x", "tile_y"]).reset_index(drop=True)
        b = df2.sort_values(["zoom", "tile_x", "tile_y"]).reset_index(drop=True)
        assert a.equals(b)


class TestZ15Lossy:
    def test_point_beyond_base_zoom(self):
        from tilemaker_ray.config import Config, LayerDef
        cfg = Config(layers=[LayerDef(name="places", minzoom=0, maxzoom=16)],
                     base_zoom=14, end_zoom=16)
        lon, lat = 7.42, 43.73
        latp = float(tm.lat2latp(lat))
        t = pa.table({
            "url": ["u"], "feature_id": pa.array([7], pa.uint64()),
            "layer": ["places"], "geom_type": pa.array([gc.POINT_], pa.uint8()),
            "min_zoom": pa.array([14], pa.uint8()), "z_order": pa.array([0], pa.int16()),
            "attrs": ["[]"], "lon": [lon], "latp": [latp], "geom": [b""],
        })
        df = assign_tiles_batch(t).to_pandas()
        r = TileRenderer(cfg, compress=False)
        out = r(df)
        # exactly one tile per zoom 14..16 (empty z15/z16 siblings dropped)
        for z in (14, 15, 16):
            zt = out[out.zoom == z]
            assert len(zt) == 1, f"z{z}: {len(zt)}"
            # the child tile contains the point per direct tile math
            assert int(zt.iloc[0].tile_x) == int(tm.lon2tilex(lon, z))
            assert int(zt.iloc[0].tile_y) == int(tm.latp2tiley(latp, z))

    def test_area_clips_at_z15(self):
        from tilemaker_ray.config import Config, LayerDef
        from tilemaker_ray.mvt import decode_tile
        cfg = Config(layers=[LayerDef(name="areas", minzoom=0, maxzoom=15)],
                     base_zoom=14, end_zoom=15)
        # small polygon inside one z14 tile
        lon0, lat0 = 7.42, 43.73
        latp0 = float(tm.lat2latp(lat0))
        ring = gc.close_ring(np.array([
            [lon0, latp0], [lon0 + 0.004, latp0],
            [lon0 + 0.004, latp0 + 0.004], [lon0, latp0 + 0.004]]))
        t = pa.table({
            "url": ["u"], "feature_id": pa.array([9], pa.uint64()),
            "layer": ["areas"], "geom_type": pa.array([gc.POLYGON_], pa.uint8()),
            "min_zoom": pa.array([14], pa.uint8()), "z_order": pa.array([0], pa.int16()),
            "attrs": ["[]"], "lon": [float("nan")], "latp": [float("nan")],
            "geom": [gc.pack_mp([[ring]])],
        })
        df = assign_tiles_batch(t).to_pandas()
        r = TileRenderer(cfg, compress=False)
        out = r(df[df.z6x != LOWZOOM])
        z15 = out[out.zoom == 15]
        assert 1 <= len(z15) <= 9  # only children actually touched
        for _, row in z15.iterrows():
            dec = decode_tile(row.mvt)
            assert dec["areas"]["features"]


@pytest.mark.usefixtures("ray_session")
class TestStageBSizing:
    def test_data_num_partitions_bounds_group_bytes(self):
        """VERDICT r2 #4: stage-B partition count derives from data
        volume — estimated per-group bytes stay ~constant as the input
        grows 10x/100x (until the macro-block cap, where feature_limit
        bounds groups instead)."""
        from tilemaker_ray.stages.salted import (EXPLODE_FACTOR,
                                                 MAX_PARTITIONS,
                                                 TARGET_GROUP_BYTES,
                                                 data_num_partitions)
        floor = data_num_partitions(None)
        sizes = [1 << 30, 10 << 30, 100 << 30]  # 1/10/100 GiB inputs
        per_group = []
        for s in sizes:
            p = data_num_partitions(s)
            assert floor <= p <= MAX_PARTITIONS
            per_group.append(s * EXPLODE_FACTOR / p)
        # past the CPU floor, group size pins to the target
        for g in per_group:
            assert g <= TARGET_GROUP_BYTES * 1.01
        assert abs(per_group[1] - per_group[2]) / per_group[2] < 0.01
        # tiny inputs fall back to the CPU floor
        assert data_num_partitions(1000) == floor

    def test_pk_respects_derived_count(self):
        from tilemaker_ray.stages.salted import add_partition_key
        df = pd.DataFrame({
            "zoom": np.random.default_rng(0).integers(0, 15, 5000),
            "mx": np.random.default_rng(1).integers(0, 1024, 5000),
            "my": np.random.default_rng(2).integers(0, 1024, 5000),
        })
        out = add_partition_key(df, 777)
        assert out["pk"].between(0, 776).all()
        # hash spreads: no partition holds a gross share
        assert out["pk"].value_counts().max() < 5000 * 0.05


class TestGeomMapFastPoints:
    """The cross-tile vectorized point path (GeomMap._emit_points_fast)
    must be row-set identical to the generic per-tile path — including
    the (fid, layer) dedup and the low-zoom feature_limit fallback
    (places exceeds its 200-feature limit in the z0-z4 tiles here)."""

    def test_fast_points_equals_scalar(self):
        import pyarrow.parquet as pq
        from tilemaker_ray.config import default_config
        from tilemaker_ray.stages.salted import GeomMap

        cfg = default_config()
        t = pq.read_table(pages_path(2000),
                          columns=["url", "html", "text", "lang"])
        ext = PageFeatureExtractor(known_layers={l.name for l in cfg.layers})
        feats = [ext(t.slice(i, 512)) for i in range(0, t.num_rows, 512)]

        fast = GeomMap(cfg)
        scalar = GeomMap(cfg)
        scalar._emit_points_fast = lambda df: df  # force generic path

        def canon(frames):
            df = pd.concat(frames, ignore_index=True)
            return sorted(map(tuple, df.itertuples(index=False, name=None)))

        a = canon([fast(f) for f in feats])
        b = canon([scalar(f) for f in feats])
        assert len(a) > 10_000
        assert a == b
