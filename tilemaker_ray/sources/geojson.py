"""GeoJSON external-source reader (S4) — the join build side loader.

Reference: /root/reference/src/geojson_processor.cpp:17-77 (modes:
FeatureCollection or line-delimited GeoJSON features; JSONL is
byte-range-chunked on newlines for parallel parse — getNewlineChunks
:48-77), :80-174 (feature parse), attribute path :213-256 with the
`attribute_function(attrs, layer)` Lua remap (M11) and the `_minzoom`
special key; column selection via `source_columns`
(docs/CONFIGURATION.md:199-244).

Output layer records: {"name", "cls"?, "ring"/"rings"/"line"/"point",
"attrs", "minzoom"} with coordinates converted to (lon, latp) — ready
for stages/spatial_join.PolygonIndex or direct feature emission.
"""

from __future__ import annotations

import json
import os

import numpy as np

from .. import tilemath as tm
from ..geom import core as gc


def get_newline_chunks(path: str, n_chunks: int) -> list[tuple[int, int]]:
    """Split a JSONL file into ~equal byte ranges aligned to newlines
    (helpers.cpp getNewlineChunks; vectors in test/helpers.test.cpp):
    boundary k is the offset OF the first newline at/after
    max(k*size/n, prev_boundary+1), so each later chunk begins with its
    leading newline and asking for more chunks than lines devolves to
    one chunk per line. Parallel-parse-safe: every line belongs to
    exactly one chunk."""
    size = os.path.getsize(path)
    if size == 0:
        return []
    approx = size // n_chunks if n_chunks > 0 else size
    starts = [0]
    with open(path, "rb") as f:
        for k in range(1, n_chunks):
            pos = max(k * approx, starts[-1] + 1)
            if pos >= size:
                break
            f.seek(pos)
            chunk = f.read(1 << 16)
            nl = -1
            while chunk:
                nl = chunk.find(b"\n")
                if nl >= 0:
                    nl += f.tell() - len(chunk)
                    break
                chunk = f.read(1 << 16)
            if nl < 0:
                break
            if nl > starts[-1]:
                starts.append(nl)
    return [(s, (starts[i + 1] if i + 1 < len(starts) else size))
            for i, s in enumerate(starts)]


def _coords_to_lonlatp(coords) -> np.ndarray:
    a = np.asarray(coords, dtype=np.float64)
    return np.column_stack([a[:, 0], tm.lat2latp(a[:, 1])])


def _parse_feature(feat: dict, source_columns, attribute_function,
                   layer_name: str) -> dict | None:
    geom = feat.get("geometry") or {}
    props = feat.get("properties") or {}
    if source_columns not in (None, True):
        props = {k: v for k, v in props.items() if k in source_columns}
    minzoom = 0
    if attribute_function is not None:
        props = attribute_function(dict(props), layer_name)
        minzoom = int(props.pop("_minzoom", 0))
    rec = {"attrs": props, "minzoom": minzoom,
           "name": str(props.get("name", ""))}
    t = geom.get("type")
    c = geom.get("coordinates")
    if t == "Point":
        rec["point"] = (float(c[0]), float(tm.lat2latp(c[1])))
    elif t == "MultiPoint":
        rec["points"] = [(float(p[0]), float(tm.lat2latp(p[1]))) for p in c]
    elif t == "LineString":
        rec["lines"] = [_coords_to_lonlatp(c)]
    elif t == "MultiLineString":
        rec["lines"] = [_coords_to_lonlatp(p) for p in c]
    elif t == "Polygon":
        rec["rings"] = gc.correct_polygon([_coords_to_lonlatp(r) for r in c])
        rec["ring"] = rec["rings"][0]
    elif t == "MultiPolygon":
        polys = [gc.correct_polygon([_coords_to_lonlatp(r) for r in poly])
                 for poly in c]
        rec["polys"] = polys
        rec["rings"] = polys[0]
        rec["ring"] = polys[0][0]
    else:
        return None
    return rec


def read_geojson_layer(path: str, source_columns=None,
                       attribute_function=None,
                       layer_name: str = "") -> list[dict]:
    """FeatureCollection (.geojson) or JSONL (one feature per line)."""
    with open(path, "rb") as f:
        head = f.read(64)
    if b'"FeatureCollection"' in head or head.lstrip().startswith(b"{") and _is_collection(path):
        with open(path) as f:
            fc = json.load(f)
        feats = fc.get("features", [])
    else:
        feats = []
        with open(path) as f:
            for line in f:
                line = line.strip().rstrip(",")
                if not line or line in ("[", "]"):
                    continue
                feats.append(json.loads(line))
    out = []
    for ft in feats:
        rec = _parse_feature(ft, source_columns, attribute_function, layer_name)
        if rec is not None:
            out.append(rec)
    return out


def read_geojsonl_chunk(path: str, start: int, end: int, source_columns=None,
                        attribute_function=None, layer_name: str = "") -> list[dict]:
    """Parse one newline-aligned byte range of a JSONL file — the unit
    of parallelism for a big build side (each Ray read task takes one
    chunk)."""
    out = []
    with open(path, "rb") as f:
        f.seek(start)
        data = f.read(end - start)
    for line in data.splitlines():
        line = line.strip()
        if not line:
            continue
        rec = _parse_feature(json.loads(line), source_columns,
                             attribute_function, layer_name)
        if rec is not None:
            out.append(rec)
    return out


def _is_collection(path: str) -> bool:
    with open(path, "rb") as f:
        blob = f.read(4096)
    return b'"FeatureCollection"' in blob
