"""Shapefile external-source reader (S3) — pure Python .shp/.dbf
parser (no shapelib in the environment; the formats are public ESRI /
dBase specs).

Mirrors /root/reference/src/shp_processor.cpp semantics:
- column selection via ``source_columns`` (:126-141)
- bbox prefilter against a clipping box (:151-158)
- geometry handling (:181-262): points / multipoints as individual
  points, polylines per part, polygons grouped by ring orientation
  (first part exterior; later parts start a new polygon when clockwise
  — positive boost area, i.e. NEGATIVE y-up shoelace — else attach as
  interior ring), then spike removal + make_valid
- ``attribute_function(attrs, layer)`` remap with ``_minzoom`` (M11),
  ``index_name`` → feature name, like the GeoJSON reader

Output records use the same shape as sources/geojson.py
(_parse_feature): {"attrs", "minzoom", "name", and one of
"point"/"points"/"lines"/"rings"+"ring"/"polys"} with coordinates in
(lon, latp).
"""

from __future__ import annotations

import os
import struct

import numpy as np

from .. import tilemath as tm
from ..geom import core as gc

SHP_NULL = 0
SHP_POINT = (1, 11, 21)
SHP_POLYLINE = (3, 13, 23)
SHP_POLYGON = (5, 15, 25)
SHP_MULTIPOINT = (8, 18, 28)


def read_shp_geometries(path: str) -> list[dict]:
    """Sequential .shp scan → [{type, points, parts, bbox}] (xy only;
    Z/M payloads of the 3D variants are skipped)."""
    with open(path, "rb") as f:
        data = f.read()
    (code,) = struct.unpack_from(">i", data, 0)
    if code != 9994:
        raise ValueError(f"not a shapefile: {path}")
    (file_words,) = struct.unpack_from(">i", data, 24)
    end = min(len(data), file_words * 2)
    out = []
    off = 100
    while off + 8 <= end:
        _recno, content_words = struct.unpack_from(">ii", data, off)
        off += 8
        rec_end = off + content_words * 2
        (stype,) = struct.unpack_from("<i", data, off)
        if stype == SHP_NULL:
            off = rec_end
            continue
        if stype in SHP_POINT:
            x, y = struct.unpack_from("<2d", data, off + 4)
            out.append({"type": stype, "points": np.array([[x, y]]),
                        "parts": [0], "bbox": (x, y, x, y)})
        elif stype in SHP_MULTIPOINT:
            bbox = struct.unpack_from("<4d", data, off + 4)
            (npts,) = struct.unpack_from("<i", data, off + 36)
            pts = np.frombuffer(data, dtype="<f8", count=npts * 2,
                                offset=off + 40).reshape(npts, 2)
            out.append({"type": stype, "points": pts.copy(),
                        "parts": [0], "bbox": bbox})
        elif stype in SHP_POLYLINE or stype in SHP_POLYGON:
            bbox = struct.unpack_from("<4d", data, off + 4)
            nparts, npts = struct.unpack_from("<2i", data, off + 36)
            parts = list(struct.unpack_from(f"<{nparts}i", data, off + 44))
            pts_off = off + 44 + nparts * 4
            pts = np.frombuffer(data, dtype="<f8", count=npts * 2,
                                offset=pts_off).reshape(npts, 2)
            out.append({"type": stype, "points": pts.copy(),
                        "parts": parts, "bbox": bbox})
        # unknown types skipped
        off = rec_end
    return out


def read_dbf(path: str) -> tuple[list[str], list[str], list[dict]]:
    """dBase III scan → (field_names, field_types, records)."""
    with open(path, "rb") as f:
        data = f.read()
    n_records = struct.unpack_from("<I", data, 4)[0]
    header_size = struct.unpack_from("<H", data, 8)[0]
    record_size = struct.unpack_from("<H", data, 10)[0]
    fields = []
    off = 32
    while off < header_size - 1 and data[off] != 0x0D:
        raw_name = data[off:off + 11].split(b"\x00")[0]
        ftype = chr(data[off + 11])
        flen = data[off + 16]
        fdec = data[off + 17]
        fields.append((raw_name.decode("ascii", "replace"), ftype, flen, fdec))
        off += 32
    records = []
    pos = header_size
    for _ in range(n_records):
        if pos + record_size > len(data):
            break
        row = data[pos:pos + record_size]
        pos += record_size
        if row[:1] == b"*":  # deleted
            records.append(None)
            continue
        rec = {}
        fo = 1
        for name, ftype, flen, fdec in fields:
            raw = row[fo:fo + flen]
            fo += flen
            try:
                txt = raw.decode("utf-8").strip()
            except UnicodeDecodeError:
                txt = raw.decode("latin-1").strip()
            if not txt:
                continue
            if ftype in ("N", "F"):
                try:
                    rec[name] = float(txt) if (fdec > 0 or "." in txt) \
                        else int(txt)
                except ValueError:
                    continue
            elif ftype == "L":
                rec[name] = txt.upper() in ("Y", "T")
            else:  # C, D and friends: strings
                rec[name] = txt
        records.append(rec)
    return ([f[0] for f in fields], [f[1] for f in fields], records)


def _group_polygon_parts(rings: list[np.ndarray]) -> list[list[np.ndarray]]:
    """shp_processor.cpp:220-255: first part is an exterior; a later
    clockwise part (negative y-up shoelace) starts a new polygon,
    anti-clockwise parts attach as interior rings."""
    polys: list[list[np.ndarray]] = []
    cur: list[np.ndarray] = []
    for j, ring in enumerate(rings):
        if j == 0:
            cur = [ring]
        elif gc.ring_signed_area(ring) < 0:  # clockwise → new exterior
            polys.append(cur)
            cur = [ring]
        else:
            cur.append(ring)
    if cur:
        polys.append(cur)
    return polys


def read_shapefile_layer(path: str, source_columns=None,
                         attribute_function=None, layer_name: str = "",
                         index_name: str | None = None,
                         clipping_box=None) -> list[dict]:
    """Load <path>.shp + <path>.dbf into external-layer records (the
    same structure the GeoJSON reader emits)."""
    base = path[:-4] if path.lower().endswith(".shp") else path
    shapes = read_shp_geometries(base + ".shp")
    if os.path.exists(base + ".dbf"):
        _names, _types, attrs_rows = read_dbf(base + ".dbf")
    else:
        attrs_rows = [{} for _ in shapes]

    out = []
    for i, shape in enumerate(shapes):
        if clipping_box is not None:
            minx, miny, maxx, maxy = shape["bbox"]
            cminx, cminy, cmaxx, cmaxy = clipping_box
            if minx > cmaxx or maxx < cminx or \
                    tm.lat2latp(miny) > cmaxy or tm.lat2latp(maxy) < cminy:
                continue
        props = attrs_rows[i] if i < len(attrs_rows) and attrs_rows[i] else {}
        if source_columns not in (None, True):
            props = {k: v for k, v in props.items() if k in source_columns}
        name = str(props.get(index_name, "")) if index_name else \
            str(props.get("name", ""))
        minzoom = 0
        if attribute_function is not None:
            props = attribute_function(dict(props), layer_name)
            minzoom = int(props.pop("_minzoom", 0))
        rec = {"attrs": props, "minzoom": minzoom, "name": name}

        pts = shape["points"]
        lonlatp = np.column_stack([pts[:, 0], tm.lat2latp(pts[:, 1])])
        stype = shape["type"]
        if stype in SHP_POINT:
            rec["point"] = (float(lonlatp[0, 0]), float(lonlatp[0, 1]))
        elif stype in SHP_MULTIPOINT:
            rec["points"] = [(float(x), float(y)) for x, y in lonlatp]
        elif stype in SHP_POLYLINE:
            parts = list(shape["parts"]) + [len(pts)]
            rec["lines"] = [lonlatp[parts[j]:parts[j + 1]]
                            for j in range(len(parts) - 1)
                            if parts[j + 1] - parts[j] >= 2]
            if not rec["lines"]:
                continue
        elif stype in SHP_POLYGON:
            parts = list(shape["parts"]) + [len(pts)]
            rings = [gc.close_ring(lonlatp[parts[j]:parts[j + 1]])
                     for j in range(len(parts) - 1)
                     if parts[j + 1] - parts[j] >= 3]
            if not rings:
                continue
            polys = [gc.correct_polygon([gc.remove_spikes_ring(r)
                                         for r in poly])
                     for poly in _group_polygon_parts(rings)]
            polys = gc.correct_geometry(polys)   # make_valid if needed
            if not polys:
                continue
            rec["polys"] = polys
            rec["rings"] = polys[0]
            rec["ring"] = polys[0][0]
        else:
            continue
        out.append(rec)
    return out
