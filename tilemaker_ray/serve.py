"""Minimal tile server (S9) — serve an .mbtiles / .pmtiles archive or
a z/x/y directory over HTTP with the standard slippy URL scheme:

    python -m tilemaker_ray.serve tiles.mbtiles --port 8080
    GET /{z}/{x}/{y}.pbf       → tile bytes (Content-Encoding: gzip)
    GET /metadata.json         → container metadata

Mirrors the reference's dev-server role (SURVEY S9) with only the
standard library: a read-only sqlite/pmtiles/dir backend behind
http.server.ThreadingHTTPServer."""

from __future__ import annotations

import argparse
import json
import os
import re
import sqlite3
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

TILE_RE = re.compile(r"^/(\d+)/(\d+)/(\d+)\.(pbf|mvt)$")


class TileBackend:
    def get_tile(self, z: int, x: int, y: int) -> bytes | None:
        raise NotImplementedError

    def metadata(self) -> dict:
        return {}


class MbtilesBackend(TileBackend):
    def __init__(self, path: str):
        self.path = path

    def get_tile(self, z, x, y):
        con = sqlite3.connect(f"file:{self.path}?mode=ro", uri=True)
        try:
            tms_y = (1 << z) - 1 - y
            row = con.execute(
                "SELECT tile_data FROM tiles WHERE zoom_level=? AND "
                "tile_column=? AND tile_row=?", (z, x, tms_y)).fetchone()
            return bytes(row[0]) if row else None
        finally:
            con.close()

    def metadata(self):
        con = sqlite3.connect(f"file:{self.path}?mode=ro", uri=True)
        try:
            return {k: v for k, v in
                    con.execute("SELECT name, value FROM metadata")}
        finally:
            con.close()


class PmtilesBackend(TileBackend):
    def __init__(self, path: str):
        from .sinks.pmtiles import read_pmtiles, tileid_to_zxy
        rd = read_pmtiles(path)
        self.tiles = {tileid_to_zxy(t): d for t, d in rd["tiles"].items()}
        self.meta = rd["metadata"]

    def get_tile(self, z, x, y):
        return self.tiles.get((z, x, y))

    def metadata(self):
        return self.meta


class ZxyBackend(TileBackend):
    def __init__(self, root: str):
        self.root = root

    def get_tile(self, z, x, y):
        p = os.path.join(self.root, str(z), str(x), f"{y}.pbf")
        if not os.path.realpath(p).startswith(os.path.realpath(self.root)):
            return None
        if os.path.exists(p):
            with open(p, "rb") as f:
                return f.read()
        return None

    def metadata(self):
        p = os.path.join(self.root, "metadata.json")
        if os.path.exists(p):
            with open(p) as f:
                return json.load(f)
        return {}


def open_backend(path: str) -> TileBackend:
    if path.endswith(".mbtiles"):
        return MbtilesBackend(path)
    if path.endswith(".pmtiles"):
        return PmtilesBackend(path)
    if os.path.isdir(path):
        return ZxyBackend(path)
    raise ValueError(f"unsupported tile container: {path}")


def make_handler(backend: TileBackend, compressed: bool = True,
                 static_dir: str | None = None):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send_static(self) -> bool:
            """Serve a file under static_dir (reference server.cpp
            default_resource) — canonical-path check blocks traversal."""
            if static_dir is None:
                return False
            rel = self.path.lstrip("/") or "index.html"
            root = os.path.realpath(static_dir)
            full = os.path.realpath(os.path.join(root, rel))
            if not full.startswith(root + os.sep) or not os.path.isfile(full):
                return False
            body = open(full, "rb").read()
            ctype = {"html": "text/html", "js": "text/javascript",
                     "css": "text/css", "json": "application/json",
                     "png": "image/png"}.get(full.rsplit(".", 1)[-1],
                                             "application/octet-stream")
            self.send_response(200)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
            return True

        def do_GET(self):
            # /metadata = the reference server route (server.cpp:96);
            # /metadata.json kept for compatibility with earlier rounds
            if self.path in ("/metadata.json", "/metadata"):
                body = json.dumps(backend.metadata()).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            m = TILE_RE.match(self.path)
            if not m:
                if not self._send_static():
                    self.send_response(404)
                    self.end_headers()
                return
            z, x, y = int(m.group(1)), int(m.group(2)), int(m.group(3))
            data = backend.get_tile(z, x, y)
            if data is None:
                self.send_response(204)
                self.end_headers()
                return
            self.send_response(200)
            self.send_header("Content-Type",
                             "application/vnd.mapbox-vector-tile")
            if compressed:
                self.send_header("Content-Encoding", "gzip")
            self.send_header("Content-Length", str(len(data)))
            self.send_header("Access-Control-Allow-Origin", "*")
            self.end_headers()
            self.wfile.write(data)

    return Handler


def serve(path: str, host: str = "127.0.0.1", port: int = 8080,
          compressed: bool = True,
          static_dir: str | None = None) -> ThreadingHTTPServer:
    """Build (but don't run) the server — call .serve_forever()."""
    return ThreadingHTTPServer((host, port),
                               make_handler(open_backend(path), compressed,
                                            static_dir))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="tilemaker_ray.serve")
    ap.add_argument("container", help=".mbtiles, .pmtiles or z/x/y dir")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--no-gzip-header", action="store_true",
                    help="tiles stored uncompressed")
    ap.add_argument("--static", default=None,
                    help="path of static files (reference server flag)")
    args = ap.parse_args(argv)
    srv = serve(args.container, args.host, args.port,
                compressed=not args.no_gzip_header,
                static_dir=args.static)
    print(f"serving {args.container} on http://{args.host}:{args.port}"
          f"/{{z}}/{{x}}/{{y}}.pbf")
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
