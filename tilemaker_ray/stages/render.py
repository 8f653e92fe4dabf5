"""Per-tile collation + render (A3-A5) — the groupby((z6x,z6y)) stage.

Reference pipeline being reproduced (Ray-Data-first, not a port of the
thread pool):
- collate + sort + dedup: tile_data.cpp:397-424 (layer, z_order
  asc/desc per layer, geomType, attributes, objectID; then unique)
- per-layer zoom-scaled simplify/filter params: tile_worker.cpp:428-442
- per-feature merge/simplify/clip/encode: tile_worker.cpp:271-370
- multipoint coalescing (combine_points): tile_worker.cpp:291-321
- linestring merge + endpoint stitching: tile_worker.cpp:27-75, 338-348
- feature_limit top-k: tile_worker.cpp:446-448
- attribute minzoom filtering at write time: output_object.cpp:34-56

One group = one z6 subtree: all zooms 6..end are rendered inside the
group, ascending, so the per-group clip cache gets the reference's
parent-zoom reuse (clip_cache.h:12-77) by construction. Large features
ride the same shuffle keyed by z6 range (stages/tiles.py) and are
probed per tile by tile-range intersection (J7); clipping cleans bbox
false positives. The sentinel LOWZOOM group renders zooms 0..5.

Hot-path note: per-tile work uses numpy run-slicing over a lexsorted
(tile_x, tile_y) order — no per-tile pandas filtering.

combine_polygons_below (polygon union dissolve, geom.cpp:150-169) is
implemented in the two-stage assembler (salted._dissolve_int_rings via
geom/boolops.union_many) — the production path for both pipelines; this
one-stage renderer leaves polygon groups un-combined.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd

from .. import mvt
from ..config import Config, LayerDef, VISVALINGAM
from ..geom import core as gc
from ..geom.clip import clip_linestring_tilemaker, clip_multipolygon
from ..geom.simplify import (douglas_peucker, simplify_multipolygon,
                             simplify_vis_linestring, simplify_vis_multipolygon)
from ..tilemath import TileBbox, meter2degp, tiley2latp

OUT_COLUMNS = ["zoom", "tile_x", "tile_y", "mvt", "n_features", "n_bytes"]

FEATURE_COLS = ("feature_id", "layer", "geom_type", "min_zoom", "z_order",
                "attrs", "lon", "latp", "geom")


class RenderState:
    """Per-group scratch: clip cache keyed (fid, zoom, x, y, kind)."""

    def __init__(self):
        self.clip_cache: dict[tuple, object] = {}

    def lookup_parent(self, fid, zoom, x, y, tag):
        """ClipCache::get (clip_cache.h:21-57): look for a clip at z-1…z6."""
        z, cx, cy = zoom - 1, x >> 1, y >> 1
        while z >= 6:
            hit = self.clip_cache.get((fid, z, cx, cy, tag))
            if hit is not None:
                return hit
            z -= 1
            cx >>= 1
            cy >>= 1
        return None


class _Group:
    """Columnar view of one shuffle group."""

    def __init__(self, df: pd.DataFrame):
        self.fid = df["feature_id"].to_numpy(dtype=np.uint64)
        self.layer = df["layer"].to_numpy(dtype=object)
        self.geom_type = df["geom_type"].to_numpy(dtype=np.int64)
        self.min_zoom = df["min_zoom"].to_numpy(dtype=np.int64)
        self.z_order = df["z_order"].to_numpy(dtype=np.int64)
        self.attrs = df["attrs"].to_numpy(dtype=object)
        self.lon = df["lon"].to_numpy(dtype=np.float64)
        self.latp = df["latp"].to_numpy(dtype=np.float64)
        self.geom = df["geom"].to_numpy(dtype=object)
        self.tx = df["tile_x"].to_numpy(dtype=np.int64)
        self.ty = df["tile_y"].to_numpy(dtype=np.int64)
        self.large = df["large"].to_numpy(dtype=bool)
        self.rng = df[["min_tx", "max_tx", "min_ty", "max_ty"]].to_numpy(dtype=np.int64)


class TileRenderer:
    """map_groups callable: rows of one z6 subtree → (zoom,x,y,mvt) rows."""

    def __init__(self, config: Config | None = None,
                 zmin: int = 6, zmax: int | None = None, compress: bool | None = None):
        self.config = config or _default()
        self.layer_defs = self.config.layer_map()
        self.layer_order = {name: i for i, name in
                            enumerate(l.name for l in self.config.layers)}
        self.zmin = zmin
        self.zmax = self.config.end_zoom if zmax is None else zmax
        self.base_zoom = self.config.base_zoom
        self.compress = (self.config.compress != "none") if compress is None else compress
        self._attr_cache: dict[str, list] = {}  # attrs json -> parsed
        # precomputed physical-layer plan (hot: consulted per tile)
        self.phys_order = self.config.physical_layer_order()
        self.sub_by_phys = {
            phys: [l for l in self.config.layers
                   if self.config.physical_layer(l.name) == phys]
            for phys in self.phys_order}

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        from .tiles import LOWZOOM
        if len(df) and np.uint32(df["z6x"].iloc[0]) == LOWZOOM:
            return self.render_range(df, self.config.start_zoom,
                                     min(5, self.config.end_zoom))
        gx, gy = int(df["z6x"].iloc[0]), int(df["z6y"].iloc[0])
        return self.render_range(df, self.zmin, self.zmax, subtree=(gx, gy))

    # ------------------------------------------------------------------
    def render_range(self, df: pd.DataFrame, zmin: int, zmax: int,
                     subtree: tuple[int, int] | None = None) -> pd.DataFrame:
        state = RenderState()
        g = _Group(df)
        out = {k: [] for k in OUT_COLUMNS}
        base = self.base_zoom
        # large-feature tile enumeration is clamped to this group's z6
        # subtree so a tile is emitted by exactly one group
        if subtree is not None:
            gshift = base - 6
            glo = (subtree[0] << gshift, subtree[1] << gshift)
            ghi = (((subtree[0] + 1) << gshift) - 1, ((subtree[1] + 1) << gshift) - 1)
        else:
            glo = (0, 0)
            ghi = ((1 << base) - 1, (1 << base) - 1)
        small_idx = np.nonzero(~g.large)[0]
        large_idx = np.nonzero(g.large)[0]
        for zoom in range(zmin, zmax + 1):
            vis_small = small_idx[g.min_zoom[small_idx] <= zoom]
            if zoom <= base:
                shift = base - zoom
                up = 0
                ztx = g.tx[vis_small] >> shift
                zty = g.ty[vis_small] >> shift
            else:
                # zoom > base: LOSSY derivation from the base-zoom cover
                # (tile_coordinates_set.h:31-45 z15+ semantics) — every
                # child of a covered base tile is a candidate; tiles
                # whose features clip to nothing are dropped below
                shift = 0
                up = zoom - base
                ztx = g.tx[vis_small]
                zty = g.ty[vis_small]
            # run-slicing: lexsort by (ztx, zty), contiguous runs = tiles
            order = np.lexsort((zty, ztx))
            ztx, zty = ztx[order], zty[order]
            vis_sorted = vis_small[order]
            tile_map = {}
            if len(ztx):
                boundary = np.nonzero((np.diff(ztx) != 0) | (np.diff(zty) != 0))[0] + 1
                starts = np.concatenate([[0], boundary])
                ends = np.concatenate([boundary, [len(ztx)]])
                if up == 0:
                    tile_map = {(int(ztx[s]), int(zty[s])): vis_sorted[s:e]
                                for s, e in zip(starts, ends)}
                else:
                    kk = 1 << up
                    for s, e in zip(starts, ends):
                        bx, by = int(ztx[s]) << up, int(zty[s]) << up
                        idxs = vis_sorted[s:e]
                        for dx in range(kk):
                            for dy in range(kk):
                                tile_map[(bx + dx, by + dy)] = idxs
            # large features: add their covered tiles (range ∩ subtree)
            vis_large = large_idx[g.min_zoom[large_idx] <= zoom]
            for i in vis_large:
                if up == 0:
                    x0 = max(g.rng[i, 0], glo[0]) >> shift
                    x1 = min(g.rng[i, 1], ghi[0]) >> shift
                    y0 = max(g.rng[i, 2], glo[1]) >> shift
                    y1 = min(g.rng[i, 3], ghi[1]) >> shift
                else:
                    kk = 1 << up
                    x0 = max(g.rng[i, 0], glo[0]) << up
                    x1 = ((min(g.rng[i, 1], ghi[0]) + 1) << up) - 1
                    y0 = max(g.rng[i, 2], glo[1]) << up
                    y1 = ((min(g.rng[i, 3], ghi[1]) + 1) << up) - 1
                for xx in range(x0, x1 + 1):
                    for yy in range(y0, y1 + 1):
                        key = (xx, yy)
                        cur = tile_map.get(key)
                        tile_map[key] = (np.concatenate([cur, [i]]) if cur is not None
                                         else np.asarray([i], dtype=np.int64))
            for (x, y) in sorted(tile_map):
                blob, nfeat = self._render_tile_idx(g, tile_map[(x, y)], zoom, x, y, state)
                if blob is None:
                    continue
                out["zoom"].append(zoom)
                out["tile_x"].append(x)
                out["tile_y"].append(y)
                out["mvt"].append(blob)
                out["n_features"].append(nfeat)
                out["n_bytes"].append(len(blob))
        return pd.DataFrame({
            "zoom": np.array(out["zoom"], dtype=np.uint8),
            "tile_x": np.array(out["tile_x"], dtype=np.uint32),
            "tile_y": np.array(out["tile_y"], dtype=np.uint32),
            "mvt": pd.Series(out["mvt"], dtype=object),
            "n_features": np.array(out["n_features"], dtype=np.int64),
            "n_bytes": np.array(out["n_bytes"], dtype=np.int64),
        })

    # ------------------------------------------------------------------
    def render_tile_df(self, df: pd.DataFrame, zoom: int, x: int, y: int):
        """Convenience for tests: render one tile from feature rows."""
        g = _Group(df)
        return self._render_tile_idx(g, np.arange(len(df)), zoom, x, y, RenderState())

    def _collate(self, g: _Group, idx: np.ndarray, zoom: int):
        """getObjectsForTile sort+dedup (tile_data.cpp:397-424)."""
        recs = []
        seen = set()
        for i in idx.tolist():
            key = (int(g.fid[i]), g.layer[i])
            if key in seen:
                continue
            seen.add(key)
            recs.append(i)
        def sort_key(i):
            lname = g.layer[i]
            lo = self.layer_order.get(lname, 255)
            ld = self.layer_defs.get(lname)
            zo = g.z_order[i] if (ld and ld.z_order_ascending) else -g.z_order[i]
            return (lo, zo, g.geom_type[i], g.attrs[i], g.fid[i])
        recs.sort(key=sort_key)
        return recs

    def _render_tile_idx(self, g: _Group, idx: np.ndarray, zoom: int,
                         x: int, y: int, state: RenderState):
        recs = self._collate(g, idx, zoom)
        bbox = TileBbox(x, y, zoom, self.config.high_resolution)
        tb = mvt.TileBuilder()
        nfeat = 0
        by_layer: dict[str, list[int]] = {}
        for i in recs:
            by_layer.setdefault(g.layer[i], []).append(i)
        for phys in self.phys_order:
            lb = tb.layer(phys, self.config.mvt_version, bbox.extent)
            for ld in self.sub_by_phys[phys]:
                if zoom < ld.minzoom or zoom > ld.maxzoom:
                    continue
                sel = by_layer.get(ld.name, [])
                if not sel:
                    continue
                if 0 < ld.feature_limit < len(sel) and zoom < ld.feature_limit_below:
                    sel = sel[:ld.feature_limit]
                simplify_level, filter_area = self._zoom_params(ld, zoom, y)
                nfeat += self._process_objects(g, sel, ld, zoom, bbox, lb, state,
                                               simplify_level, filter_area)
        if nfeat == 0:
            return None, 0
        blob = tb.serialize()
        if self.compress:
            blob = mvt.compress_tile(blob, gzip_fmt=self.config.compress == "gzip")
        return blob, nfeat

    def _zoom_params(self, ld: LayerDef, zoom: int, tile_y: int):
        """tile_worker.cpp:428-442 (scalar math — hot per tile/layer)."""
        import math
        simplify_level = 0.0
        filter_area = 0.0
        latp = 0.0
        if zoom < ld.simplify_below or zoom < ld.filter_below:
            latp = ((180.0 - math.ldexp(tile_y, -zoom) * 360.0)
                    + (180.0 - math.ldexp(tile_y + 1, -zoom) * 360.0)) / 2.0
        if zoom < ld.simplify_below:
            if ld.simplify_length > 0:
                simplify_level = float(meter2degp(ld.simplify_length, latp))
            else:
                simplify_level = ld.simplify_level
            simplify_level *= ld.simplify_ratio ** ((ld.simplify_below - 1) - zoom)
        if zoom < ld.filter_below:
            filter_area = float(meter2degp(ld.filter_area, latp)) * 2.0 ** ((ld.filter_below - 1) - zoom)
        return simplify_level, filter_area

    # ------------------------------------------------------------------
    def _process_objects(self, g: _Group, sel: list[int], ld: LayerDef, zoom: int,
                         bbox: TileBbox, lb: mvt.LayerBuilder, state: RenderState,
                         simplify_level: float, filter_area: float) -> int:
        """ProcessObjects (tile_worker.cpp:271-370)."""
        n = 0
        k = 0
        while k < len(sel):
            i = sel[k]
            if zoom < g.min_zoom[i]:
                k += 1
                continue
            gt = g.geom_type[i]
            if gt == gc.POINT_:
                # clip-box check: cleans the z>base lossy index's false
                # positives (tile_data.h:28-39 semantics); at z<=base a
                # point's own tile always contains it
                if not (bbox.clip_minx <= g.lon[i] <= bbox.clip_maxx
                        and bbox.clip_miny <= g.latp[i] <= bbox.clip_maxy):
                    k += 1
                    continue
                pts = [self._scale_point(g, i, bbox)]
                while (k + 1 < len(sel) and ld.combine_points
                       and _compatible(g, i, sel[k + 1])):
                    k += 1
                    pts.append(self._scale_point(g, sel[k], bbox))
                lb.add_feature(mvt.GEOM_POINT, lb.encode_points(pts),
                               self._tags(g.attrs[i], zoom),
                               int(g.fid[i]) if self.config.include_ids else None)
                n += 1
            elif gt in (gc.LINESTRING_, gc.MULTILINESTRING_):
                mls = self._clipped_mls(g, i, bbox, state)
                if zoom < self.config.combine_below:
                    while k + 1 < len(sel) and _compatible(g, i, sel[k + 1]):
                        k += 1
                        mls = mls + self._clipped_mls(g, sel[k], bbox, state)
                    mls = reorder_multilinestring(mls)
                n += 1 if self._write_mls(lb, g, i, mls, bbox, zoom,
                                          simplify_level, ld.simplify_algo) else 0
            else:
                mp = self._clipped_mp(g, i, bbox, state)
                if filter_area > 0.0:
                    mp = _remove_parts_below(mp, filter_area)
                n += 1 if self._write_mp(lb, g, i, mp, bbox, zoom,
                                         simplify_level, ld.simplify_algo) else 0
            k += 1
        return n

    def _scale_point(self, g: _Group, i: int, bbox: TileBbox) -> tuple[int, int]:
        return bbox.scale_pt(g.latp[i], g.lon[i])

    def _clipped_mls(self, g: _Group, i: int, bbox: TileBbox, state: RenderState):
        fid = int(g.fid[i])
        key = (fid, bbox.zoom, bbox.x, bbox.y, "l")
        hit = state.clip_cache.get(key)
        if hit is not None:
            return hit
        parent = state.lookup_parent(fid, bbox.zoom, bbox.x, bbox.y, "l")
        parts = parent if parent is not None else gc.unpack(g.geom[i])[1]
        clip_box = (bbox.clip_minx, bbox.clip_miny, bbox.clip_maxx, bbox.clip_maxy)
        ext = _extend_box(bbox)
        out: list[np.ndarray] = []
        for ls in parts:
            out.extend(clip_linestring_tilemaker(np.asarray(ls), clip_box, ext))
        state.clip_cache[key] = out
        return out

    def _clipped_mp(self, g: _Group, i: int, bbox: TileBbox, state: RenderState):
        fid = int(g.fid[i])
        key = (fid, bbox.zoom, bbox.x, bbox.y, "p")
        hit = state.clip_cache.get(key)
        if hit is not None:
            return hit
        parent = state.lookup_parent(fid, bbox.zoom, bbox.x, bbox.y, "p")
        polys = parent if parent is not None else gc.unpack(g.geom[i])[1]
        out = clip_multipolygon(polys, bbox.clip_minx, bbox.clip_miny,
                                bbox.clip_maxx, bbox.clip_maxy)
        state.clip_cache[key] = out
        return out

    def _write_mls(self, lb, g: _Group, i: int, mls, bbox: TileBbox, zoom,
                   simplify_level, algo) -> bool:
        """writeMultiLinestring (tile_worker.cpp:96-171)."""
        if simplify_level > 0:
            if algo == VISVALINGAM:
                mls = [simplify_vis_linestring(ls, simplify_level) for ls in mls]
            else:
                mls = [douglas_peucker(ls, simplify_level) for ls in mls]
        parts = []
        for ls in mls:
            if len(ls) <= 1:
                continue
            xs, ys = bbox.scale_latplon(ls[:, 1], ls[:, 0])
            pts = _dedup_consecutive(xs, ys)
            if len(pts) > 1:
                parts.append(pts)
        if not parts:
            return False
        lb.add_feature(mvt.GEOM_LINESTRING, lb.encode_multilinestring(parts),
                       self._tags(g.attrs[i], zoom),
                       int(g.fid[i]) if self.config.include_ids else None)
        return True

    def _write_mp(self, lb, g: _Group, i: int, mp, bbox: TileBbox, zoom,
                  simplify_level, algo) -> bool:
        """writeMultiPolygon (tile_worker.cpp:206-269): scale to the int
        grid (with scaleRing backtracking), simplify in scaled units."""
        scaled: list[list[np.ndarray]] = []
        for rings in mp:
            outer = bbox.scale_ring(rings[0][:, 0], rings[0][:, 1])
            if len(outer) < 4:
                continue
            poly = [gc.close_ring(outer.astype(np.float64))]
            for r in rings[1:]:
                rr = bbox.scale_ring(r[:, 0], r[:, 1])
                if len(rr) >= 4:
                    poly.append(gc.close_ring(rr.astype(np.float64)))
            scaled.append(poly)
        if simplify_level > 0 and scaled:
            lvl = simplify_level / bbox.xscale
            if algo == VISVALINGAM:
                scaled = simplify_vis_multipolygon(scaled, lvl)
            else:
                scaled = simplify_multipolygon(scaled, lvl)
            # writeMultiPolygon runs remove_spikes after simplify
            scaled = gc.remove_spikes_mp(scaled)
        rings_out = []
        for poly in scaled:
            outer_pts = _ring_pts(poly[0])
            if outer_pts is None:
                continue
            rings_out.append(outer_pts)
            for r in poly[1:]:
                pts = _ring_pts(r)
                if pts is not None:
                    rings_out.append(pts)
        if not rings_out:
            return False
        lb.add_feature(mvt.GEOM_POLYGON, lb.encode_polygon(rings_out),
                       self._tags(g.attrs[i], zoom),
                       int(g.fid[i]) if self.config.include_ids else None)
        return True

    def _tags(self, attrs_json: str, zoom: int) -> list[tuple[str, object]]:
        """writeAttributes: per-attribute minzoom filter at write time.
        Parsed attr lists are cached per distinct json (hot: once per
        feature per tile per zoom)."""
        parsed = self._attr_cache.get(attrs_json)
        if parsed is None:
            parsed = json.loads(attrs_json)
            if len(self._attr_cache) > 65536:
                self._attr_cache.clear()
            self._attr_cache[attrs_json] = parsed
        out = []
        for k, kind, mz, v in parsed:
            if mz > zoom:
                continue
            if kind == 2:
                out.append((k, bool(v)))
            elif kind == 1:
                out.append((k, float(v)))
            else:
                out.append((k, str(v)))
        return out


def _default() -> Config:
    from ..config import default_config
    return default_config()


def _compatible(g: _Group, i: int, j: int) -> bool:
    """OutputObject::compatible (output_object.cpp:58-62) + same layer."""
    return (g.layer[i] == g.layer[j] and g.geom_type[i] == g.geom_type[j]
            and g.z_order[i] == g.z_order[j] and g.attrs[i] == g.attrs[j])


def _dedup_consecutive(xs: np.ndarray, ys: np.ndarray) -> list[tuple[int, int]]:
    pts = []
    last = None
    for x, y in zip(xs.tolist(), ys.tolist()):
        p = (int(x), int(y))
        if last is None or p != last:
            pts.append(p)
            last = p
    return pts


def _ring_pts(ring: np.ndarray) -> list[tuple[int, int]] | None:
    """writeRing (tile_worker.cpp:174-204): dedup consecutive; a ring has
    at least 4 points (3 distinct + closure)."""
    pts = _dedup_consecutive(ring[:, 0], ring[:, 1])
    if pts[0] != pts[-1]:
        pts.append(pts[0])
    if len(pts) < 4:
        return None
    return pts


def _remove_parts_below(mp, filter_area: float):
    """RemovePartsBelowSize (tile_worker.cpp:77-94): drop polygons whose
    area < filterArea; drop inner rings likewise."""
    out = []
    for rings in mp:
        outer_area = abs(gc.ring_signed_area(rings[0]))
        hole_area = sum(abs(gc.ring_signed_area(r)) for r in rings[1:])
        if outer_area - hole_area < filter_area:
            continue
        kept = [rings[0]] + [r for r in rings[1:]
                             if abs(gc.ring_signed_area(r)) >= filter_area]
        out.append(kept)
    return out


def reorder_multilinestring(parts: list[np.ndarray]) -> list[np.ndarray]:
    """ReorderMultiLinestring (tile_worker.cpp:27-75): stitch linestrings
    that share endpoints (cap 6000 points)."""
    if len(parts) <= 1:
        return parts
    start_points = {}
    end_points = {}
    for i, ls in enumerate(parts):
        start_points[(ls[0, 0], ls[0, 1])] = i
        end_points[(ls[-1, 0], ls[-1, 1])] = i
    added = [False] * len(parts)
    out = []
    for i in range(len(parts)):
        if added[i]:
            continue
        ls = parts[i]
        added[i] = True
        while True:
            j = start_points.get((ls[-1, 0], ls[-1, 1]))
            if j is not None and not added[j] and len(parts[j]) + len(ls) < 6000:
                ls = np.vstack([ls, parts[j][1:]])
                added[j] = True
                continue
            j = end_points.get((ls[0, 0], ls[0, 1]))
            if j is not None and not added[j] and len(parts[j]) + len(ls) < 6000:
                ls = np.vstack([parts[j][:-1], ls])
                added[j] = True
                continue
            break
        out.append(ls)
    return out


def _extend_box(bbox: TileBbox):
    """TileBbox::getExtendBox (coordinates_geom.cpp:95-99)."""
    w = bbox.max_lon - bbox.min_lon
    h = bbox.max_latp - bbox.min_latp
    return (bbox.min_lon - w * 2.0, bbox.min_latp - h * (8191.0 / 8192.0),
            bbox.max_lon + w * (8191.0 / 8192.0), bbox.max_latp + h * 2.0)
