"""S8 GeoJSON debug writer + S9 tile server (stdlib http.server)."""

import gzip
import json
import threading
import urllib.request

import numpy as np


def _tile_blob(name: str) -> bytes:
    from tilemaker_ray import mvt
    tb = mvt.TileBuilder()
    lb = tb.layer("poi")
    lb.add_feature(mvt.GEOM_POINT, lb.encode_points([(10, 10)]),
                   [("name", name)])
    return gzip.compress(tb.serialize())


class TestGeojsonDebugWriter:
    def test_roundtrip_rows(self, tmp_path):
        from tilemaker_ray.geom import core as gc
        from tilemaker_ray.sinks.geojson_debug import write_geojson
        from tilemaker_ray import tilemath as tm
        rows = [
            {"geom_type": gc.POINT_, "layer": "poi",
             "attrs": json.dumps([["name", 0, 0, "x"], ["ele", 1, 0, 12.5]]),
             "min_zoom": 9, "lon": 7.5, "latp": float(tm.lat2latp(43.5)),
             "geom": b""},
            {"geom_type": gc.LINESTRING_, "layer": "roads",
             "attrs": "[]", "min_zoom": 0, "lon": 0.0, "latp": 0.0,
             "geom": gc.pack_mls([np.array(
                 [[7.0, float(tm.lat2latp(43.0))],
                  [7.1, float(tm.lat2latp(43.1))]])])},
            {"geom_type": gc.POLYGON_, "layer": "landuse",
             "attrs": "[]", "min_zoom": 0, "lon": 0.0, "latp": 0.0,
             "geom": gc.pack_mp([[np.array(
                 [[7.0, float(tm.lat2latp(43.0))],
                  [7.0, float(tm.lat2latp(43.2))],
                  [7.2, float(tm.lat2latp(43.2))],
                  [7.0, float(tm.lat2latp(43.0))]])]])},
        ]
        out = str(tmp_path / "debug.geojson")
        n = write_geojson(rows, out)
        assert n == 3
        fc = json.load(open(out))
        assert fc["type"] == "FeatureCollection"
        pt, ls, pg = fc["features"]
        assert pt["geometry"]["type"] == "Point"
        assert abs(pt["geometry"]["coordinates"][1] - 43.5) < 1e-9
        assert pt["properties"] == {"layer": "poi", "name": "x",
                                    "ele": 12.5, "_minzoom": 9}
        assert ls["geometry"]["type"] == "LineString"
        assert abs(ls["geometry"]["coordinates"][1][1] - 43.1) < 1e-9
        assert pg["geometry"]["type"] == "Polygon"


class TestTileServer:
    def _roundtrip(self, container, tmp_path):
        from tilemaker_ray import serve as srv
        server = srv.serve(container, port=0)  # ephemeral port
        port = server.server_address[1]
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        try:
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/5/1/2.pbf") as r:
                assert r.status == 200
                assert r.headers["Content-Encoding"] == "gzip"
                from tilemaker_ray.mvt import decode_tile
                dec = decode_tile(gzip.decompress(r.read()))
                assert dec["poi"]["features"][0]["tags"]["name"] == "a"
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/5/9/9.pbf") as r:
                assert r.status == 204
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/metadata.json") as r:
                assert r.status == 200
                json.loads(r.read())
        finally:
            server.shutdown()

    def test_mbtiles_backend(self, tmp_path):
        from tilemaker_ray.config import default_config
        from tilemaker_ray.sinks import mbtiles
        p = str(tmp_path / "t.mbtiles")
        mbtiles.write_mbtiles(p, [(5, 1, 2, _tile_blob("a"))],
                              mbtiles.default_metadata(default_config()))
        self._roundtrip(p, tmp_path)

    def test_pmtiles_backend(self, tmp_path):
        from tilemaker_ray.sinks import pmtiles as pmt
        p = str(tmp_path / "t.pmtiles")
        pmt.write_pmtiles(p, [(5, 1, 2, _tile_blob("a"))], {"name": "t"})
        self._roundtrip(p, tmp_path)

    def test_zxy_backend(self, tmp_path):
        import os
        root = str(tmp_path / "tiles")
        os.makedirs(os.path.join(root, "5", "1"))
        with open(os.path.join(root, "5", "1", "2.pbf"), "wb") as f:
            f.write(_tile_blob("a"))
        with open(os.path.join(root, "metadata.json"), "w") as f:
            json.dump({"name": "t"}, f)
        self._roundtrip(root, tmp_path)


def test_metadata_alias(tmp_path):
    """Reference server route: /metadata (server.cpp:96) answers like
    /metadata.json."""
    import json
    import os
    import threading
    import urllib.request

    from tilemaker_ray.serve import serve

    root = str(tmp_path / "tiles")
    os.makedirs(os.path.join(root, "0", "0"))
    with open(os.path.join(root, "0", "0", "0.pbf"), "wb") as f:
        f.write(b"x")
    with open(os.path.join(root, "metadata.json"), "w") as f:
        json.dump({"name": "t"}, f)
    srv = serve(root, port=0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        a = urllib.request.urlopen(f"{base}/metadata").read()
        b = urllib.request.urlopen(f"{base}/metadata.json").read()
        assert a == b and b"t" in a
    finally:
        srv.shutdown()


def test_static_dir_serving(tmp_path):
    import threading
    import urllib.error
    import urllib.request

    from tilemaker_ray.serve import serve
    from tilemaker_ray.sinks.zxy import write_zxy  # noqa: F401 (import check)

    tiles_dir = tmp_path / "tiles"
    (tiles_dir / "0" / "0").mkdir(parents=True)
    (tiles_dir / "0" / "0" / "0.pbf").write_bytes(b"x")
    (tmp_path / "static").mkdir()
    (tmp_path / "static" / "index.html").write_text("<html>hi</html>")
    (tmp_path / "secret.txt").write_text("nope")

    srv = serve(str(tiles_dir), port=0, static_dir=str(tmp_path / "static"))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        body = urllib.request.urlopen(f"{base}/index.html").read()
        assert b"hi" in body
        root = urllib.request.urlopen(f"{base}/").read()  # → index.html
        assert b"hi" in root
        try:
            urllib.request.urlopen(f"{base}/../secret.txt")
            got = 200
        except urllib.error.HTTPError as e:
            got = e.code
        assert got == 404
    finally:
        srv.shutdown()
