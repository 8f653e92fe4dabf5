"""The user-extension surface — Python equivalent of the reference's
Lua profile (API registered at
/root/reference/src/osm_lua_processing.cpp:237-273; entry points
:274-286; docs /root/reference/docs/CONFIGURATION.md:119-188).

A Profile is a class with a `page_function(page, emit)` hook (the
web-page graft analogue of node_function/way_function). `emit` exposes
the same verbs the Lua API exposes: Layer, LayerAsCentroid, Attribute,
AttributeNumeric, AttributeBoolean, MinZoom, ZOrder. Geometry accessors
(Area/Length/Centroid/IsClosed) are provided on the emitted geometry.

Attribute values are exactly string | float | bool with a per-attribute
minzoom (attribute_store.h:45-51); repeated keys on one feature are
deduplicated, last write wins (osm_lua_processing.cpp:881-892).
"""

from __future__ import annotations

import json
import re

import numpy as np

from .geom import core as gc
from . import tilemath as tm

KIND_STRING = 0
KIND_FLOAT = 1
KIND_BOOL = 2


class Feature:
    __slots__ = ("layer", "geom_type", "lon", "latp", "geom_parts", "min_zoom",
                 "z_order", "attrs")

    def __init__(self, layer: str, geom_type: int):
        self.layer = layer
        self.geom_type = geom_type
        self.lon = float("nan")
        self.latp = float("nan")
        self.geom_parts = None  # list[np.ndarray] (mls) or list[list[np.ndarray]] (mp)
        self.min_zoom = 0
        self.z_order = 0
        self.attrs: dict[str, tuple[object, int, int]] = {}  # key -> (value, kind, minzoom)

    def canonical_attrs(self) -> str:
        """Canonical serialization — the dedup/merge identity of the
        attribute set (replaces the reference's global AttributeSet
        index, attribute_store.h:229-398)."""
        items = sorted((k, kind, mz, v) for k, (v, kind, mz) in self.attrs.items())
        return json.dumps(items, separators=(",", ":"))


class Emitter:
    """Collects features for one page; the Lua-API verbs. `joins`
    exposes the spatial-join verbs (Intersects/FindIntersecting/
    CoveredBy/FindCovering/AreaIntersecting/Nearest) over the indexed
    external layers, mirroring osm_lua_processing.cpp:377-470."""

    def __init__(self, known_layers: set[str], joins=None):
        self.known_layers = known_layers
        self.joins = joins
        self.features: list[Feature] = []
        self._cur: Feature | None = None

    # --- Layer(name, is_area)  (osm_lua_processing.cpp:571-686) ---
    def Layer(self, name: str, geom) -> None:
        if name not in self.known_layers:
            raise ValueError(f"unknown layer {name}")
        if isinstance(geom, tuple):
            f = Feature(name, gc.POINT_)
            f.lon, f.latp = float(geom[0]), float(geom[1])
        elif isinstance(geom, np.ndarray):
            f = Feature(name, gc.LINESTRING_)
            f.geom_parts = [geom]
        elif geom and isinstance(geom[0], np.ndarray):
            f = Feature(name, gc.MULTILINESTRING_)
            f.geom_parts = list(geom)
        else:
            f = Feature(name, gc.POLYGON_)
            f.geom_parts = [gc.correct_polygon(rings) for rings in geom]
        self._cur = f
        self.features.append(f)

    # --- LayerAsCentroid(name, algo)  (osm_lua_processing.cpp:697-802) ---
    def LayerAsCentroid(self, name: str, geom, algo: str = "polylabel") -> None:
        if isinstance(geom, tuple):
            c = geom
        elif isinstance(geom, np.ndarray):
            c = gc.centroid(geom)
        else:
            rings = geom[0] if geom and isinstance(geom[0], list) else geom
            if algo == "polylabel":
                from .geom.polylabel import polylabel
                c = polylabel(rings)
            else:
                c = gc.centroid(rings)
        f = Feature(name, gc.POINT_)
        f.lon, f.latp = float(c[0]), float(c[1])
        self._cur = f
        self.features.append(f)

    # --- attributes (osm_lua_processing.cpp:895-914) ---
    def Attribute(self, key: str, value: str, minzoom: int = 0) -> None:
        self._cur.attrs[key] = (str(value), KIND_STRING, int(minzoom))

    def AttributeNumeric(self, key: str, value: float, minzoom: int = 0) -> None:
        self._cur.attrs[key] = (float(value), KIND_FLOAT, int(minzoom))

    def AttributeBoolean(self, key: str, value: bool, minzoom: int = 0) -> None:
        self._cur.attrs[key] = (bool(value), KIND_BOOL, int(minzoom))

    # --- MinZoom / ZOrder (osm_lua_processing.cpp:917-926) ---
    def MinZoom(self, z: float) -> None:
        self._cur.min_zoom = max(0, int(z)) if np.isfinite(z) else 0

    def ZOrder(self, z: float) -> None:
        self._cur.z_order = int(tm.zorder_encode(z))


class Page:
    """Row view handed to page_function."""
    __slots__ = ("url", "warc_ts", "html", "text", "lang")

    def __init__(self, url, warc_ts, html, text, lang):
        self.url = url
        self.warc_ts = warc_ts
        self.html = html
        self.text = text
        self.lang = lang


def extract_text(html: bytes) -> str:
    """Byte-identical text extraction per url — the graft's per-row
    invariant (BASELINE.json input_hint). Deterministic tag-strip."""
    s = html.decode("utf-8", errors="strict")
    return re.sub(r"<[^>]+>", "", s).strip()


class WebProfile:
    """Default flagship profile: parse geo/route/area mentions out of
    page text into places / routes / areas layers."""

    GEO = re.compile(r"geo:(-?\d+\.\d+),(-?\d+\.\d+)")
    ROUTE = re.compile(r"route:((?:-?\d+\.\d+,-?\d+\.\d+;?)+)")
    AREA = re.compile(r"area:((?:-?\d+\.\d+,-?\d+\.\d+;?)+)")

    def __init__(self):
        self._host = re.compile(r"https?://([^/]+)/")

    @staticmethod
    def _coords(blob: str) -> np.ndarray:
        pts = [p.split(",") for p in blob.split(";") if p]
        lat = np.array([float(a) for a, b in pts])
        lon = np.array([float(b) for a, b in pts])
        return np.column_stack([lon, tm.lat2latp(lat)])

    def page_function(self, page: Page, emit: Emitter) -> None:
        host_m = self._host.match(page.url)
        host = host_m.group(1) if host_m else ""
        # deterministic importance from the url (stable across runs)
        h = np.uint64(hash_url(page.url))
        importance = int(h % np.uint64(100))

        for m in self.GEO.finditer(page.text):
            lat, lon = float(m.group(1)), float(m.group(2))
            emit.Layer("places", (lon, float(tm.lat2latp(lat))))
            emit.Attribute("lang", page.lang)
            emit.Attribute("host", host, minzoom=10)
            emit.AttributeNumeric("rank", float(importance), minzoom=8)
            emit.MinZoom(min(14, 4 + importance // 10))
            emit.ZOrder(importance)
        for m in self.ROUTE.finditer(page.text):
            ls = self._coords(m.group(1))
            emit.Layer("routes", ls)
            emit.Attribute("lang", page.lang)
            emit.AttributeNumeric("length_m", round(gc.haversine_length(ls), 1), minzoom=12)
            emit.MinZoom(6)
            emit.ZOrder(importance)
        for m in self.AREA.finditer(page.text):
            ring = self._coords(m.group(1))
            ring = gc.close_ring(ring)
            emit.Layer("areas", [[ring]])
            emit.Attribute("lang", page.lang)
            emit.AttributeBoolean("verified", importance % 2 == 0, minzoom=12)
            emit.MinZoom(8)
            emit.ZOrder(-importance)


class PointsProfile(WebProfile):
    """WebProfile restricted to the `geo:` point mentions — the
    SQL-oracled flagship path (every verb it exercises — Layer,
    Attribute minzooms, MinZoom from url-hash importance, ZOrder — is
    reproducible in DuckDB, so the full extract→assign→shuffle→assemble
    engine run gets an exact per-tile feature-count oracle)."""

    def page_function(self, page: Page, emit: Emitter) -> None:
        host_m = self._host.match(page.url)
        host = host_m.group(1) if host_m else ""
        h = np.uint64(hash_url(page.url))
        importance = int(h % np.uint64(100))
        for m in self.GEO.finditer(page.text):
            lat, lon = float(m.group(1)), float(m.group(2))
            emit.Layer("places", (lon, float(tm.lat2latp(lat))))
            emit.Attribute("lang", page.lang)
            emit.Attribute("host", host, minzoom=10)
            emit.AttributeNumeric("rank", float(importance), minzoom=8)
            emit.MinZoom(min(14, 4 + importance // 10))
            emit.ZOrder(importance)


class JoinedWebProfile(WebProfile):
    """WebProfile + spatial joins against the indexed `regions` layer:
    places get their containing region (J3 semi-join → attribute),
    areas get a covered_by flag and the intersection area (J5), routes
    get the nearest region (kNN)."""

    def page_function(self, page: Page, emit: Emitter) -> None:
        super().page_function(page, emit)
        j = emit.joins
        if j is None:
            return
        import numpy as np
        from .geom import core as gc
        for f in emit.features:
            emit._cur = f
            if f.geom_type == gc.POINT_:
                names = j.FindIntersecting("regions", gc.POINT_, (f.lon, f.latp))
                if names:
                    emit.Attribute("region", names[0])
            elif f.geom_type in (gc.LINESTRING_, gc.MULTILINESTRING_):
                near = j.Nearest("regions", float(f.geom_parts[0][0, 0]),
                                 float(f.geom_parts[0][0, 1]), 1)
                if near:
                    emit.Attribute("near_region", near[0], minzoom=10)
            else:
                rings = f.geom_parts[0]
                if j.CoveredBy("regions", gc.POLYGON_, rings[0]):
                    emit.AttributeBoolean("in_region", True)
                area = j.AreaIntersecting("regions", rings)
                if area > 0:
                    emit.AttributeNumeric("region_overlap_m2", round(area, 1),
                                          minzoom=12)


def hash_url(url: str) -> int:
    """Deterministic 64-bit FNV-1a (Python's hash() is salted)."""
    h = 0xCBF29CE484222325
    for b in url.encode():
        h ^= b
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h
