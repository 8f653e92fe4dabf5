"""MBTiles sink — single-writer pack step.

Mirrors /root/reference/src/mbtiles.cpp: schema `tiles(zoom_level,
tile_column, tile_row, tile_data)` + `metadata(name, value)`, TMS
y-flip (mbtiles.cpp:60), gzip'd MVT blobs, unique tile index.

The parallel pipeline writes (z,x,y,mvt) parquet partitions; this pack
runs once on the driver (sqlite is inherently single-file —
SURVEY §2.1 S5). `merge=True` reproduces --merge read-modify-write
(mbtiles.cpp:127-151): existing tiles are kept unless replaced.
"""

from __future__ import annotations

import json
import os
import sqlite3
from collections.abc import Iterable


def write_mbtiles(path: str, tiles: Iterable[tuple[int, int, int, bytes]],
                  metadata: dict[str, str], merge: bool = False) -> int:
    """tiles: iterable of (zoom, x, y, mvt_bytes, ...) — slippy y, gzip
    blobs. Returns number of tiles written."""
    if os.path.exists(path) and not merge:
        os.remove(path)
    con = sqlite3.connect(path)
    cur = con.cursor()
    cur.execute("PRAGMA synchronous = OFF")
    cur.execute("PRAGMA application_id = 0x4d504258")
    cur.execute("CREATE TABLE IF NOT EXISTS metadata (name text, value text, UNIQUE(name))")
    cur.execute("CREATE TABLE IF NOT EXISTS tiles "
                "(zoom_level integer, tile_column integer, tile_row integer, tile_data blob)")
    cur.execute("CREATE UNIQUE INDEX IF NOT EXISTS tile_index ON tiles "
                "(zoom_level, tile_column, tile_row)")
    n = 0
    for row in tiles:
        z, x, y, data = row[0], row[1], row[2], row[3]
        tms_y = (1 << z) - 1 - y  # mbtiles.cpp:60
        cur.execute("REPLACE INTO tiles (zoom_level, tile_column, tile_row, tile_data) "
                    "VALUES (?, ?, ?, ?)", (int(z), int(x), int(tms_y), sqlite3.Binary(data)))
        n += 1
    for k, v in metadata.items():
        cur.execute("REPLACE INTO metadata (name, value) VALUES (?, ?)",
                    (k, v if isinstance(v, str) else json.dumps(v)))
    con.commit()
    con.close()
    return n


def read_mbtiles(path: str) -> dict[tuple[int, int, int], bytes]:
    """Read all tiles back (slippy y) — used by tests and the merge
    join (J8)."""
    con = sqlite3.connect(path)
    out = {}
    for z, x, tms_y, data in con.execute(
            "SELECT zoom_level, tile_column, tile_row, tile_data FROM tiles"):
        out[(z, x, (1 << z) - 1 - tms_y)] = data
    con.close()
    return out


def read_metadata(path: str) -> dict[str, str]:
    con = sqlite3.connect(path)
    out = dict(con.execute("SELECT name, value FROM metadata"))
    con.close()
    return out


def merge_tiles_into(path: str, tiles, metadata: dict[str, str],
                     compress: str = "gzip") -> int:
    """--merge semantics (mbtiles.cpp:127-151 + tile_worker.cpp:487-490):
    for each incoming tile, if the container already has (z,x,y), the
    existing features are merged in (old first) instead of replaced.
    `compress` is the blob encoding ("gzip" | "deflate" | "none");
    incoming tiles stream through one at a time (the existing container
    is held in memory — merge reads the whole target by design)."""
    from .. import mvt as _mvt
    packed = compress != "none"
    existing = read_mbtiles(path) if os.path.exists(path) else {}

    def merged():
        for row in tiles:
            z, x, y, data = row[0], row[1], row[2], row[3]
            old = existing.get((int(z), int(x), int(y)))
            if old is not None:
                old_raw = _mvt.decompress_tile(old) if packed else old
                new_raw = _mvt.decompress_tile(data) if packed else data
                out = _mvt.merge_tiles(old_raw, new_raw)
                data = _mvt.compress_tile(out, gzip_fmt=compress == "gzip") \
                    if packed else out
            yield (z, x, y, data)

    return write_mbtiles(path, merged(), metadata, merge=True)


def default_metadata(config, bounds=(-180.0, -85.06, 180.0, 85.06)) -> dict[str, str]:
    """shared_data.cpp:70-104-style metadata incl. vector_layers json."""
    layers = [{"id": config.physical_layer(l.name), "minzoom": l.minzoom,
               "maxzoom": l.maxzoom} for l in config.layers]
    seen = {}
    for l in layers:
        if l["id"] in seen:
            seen[l["id"]]["minzoom"] = min(seen[l["id"]]["minzoom"], l["minzoom"])
            seen[l["id"]]["maxzoom"] = max(seen[l["id"]]["maxzoom"], l["maxzoom"])
        else:
            seen[l["id"]] = l
    return {
        "name": config.project_name,
        "version": config.project_version,
        "description": config.project_description,
        "format": "pbf",
        "minzoom": str(config.start_zoom),
        "maxzoom": str(config.end_zoom),
        "bounds": ",".join(str(b) for b in bounds),
        "type": "baselayer",
        "json": json.dumps({"vector_layers": list(seen.values())}),
    }
