"""Exact ports of tilemaker's coordinate / tile math.

Reference: /root/reference/src/coordinates.cpp:23-67 (projection, tile
conversions, metre conversions, fillCoveredTiles),
/root/reference/src/coordinates_geom.cpp:9-52 (TileBbox, scaleLatpLon,
scaleRing), :101-189 (supercover line walk),
/root/reference/include/output_object.h:50-67 (z_order lossy encode).

All functions are numpy-vectorized where that matters (they accept
scalars or ndarrays); the supercover walk is per-segment Python over
integer tile deltas (tile deltas are small for non-large features — the
large-feature bypass in stages/tiles.py keeps this bounded).

Coordinates convention (same as the reference): "latp" is
spherical-Mercator-projected latitude in degrees; geometry is carried as
(lon, latp) float64 degrees; fixed-point int32 storage is value*1e7.
"""

from __future__ import annotations

import math

import numpy as np

RADIUS_METER = 6378137.0  # reference: coordinates.h RadiusMeter


# --- projection (coordinates.cpp:23-24) ---------------------------------

def lat2latp(lat):
    lat = np.clip(lat, -85.06, 85.06)
    return np.degrees(np.log(np.tan(np.radians(lat + 90.0) / 2.0)))


def latp2lat(latp):
    return np.degrees(np.arctan(np.exp(np.radians(latp))) * 2.0) - 90.0


# --- tile conversions (coordinates.cpp:27-41) ---------------------------

def lon2tilexf(lon, z):
    return np.ldexp((np.asarray(lon, dtype=np.float64) + 180.0) * (1.0 / 360.0), z)


def latp2tileyf(latp, z):
    return np.ldexp((180.0 - np.asarray(latp, dtype=np.float64)) * (1.0 / 360.0), z)


def lat2tileyf(lat, z):
    return latp2tileyf(lat2latp(lat), z)


def lon2tilex(lon, z):
    # C++ casts double->uint32 (truncation toward zero; values >= 0 in range)
    return np.floor(lon2tilexf(lon, z)).astype(np.uint32)


def latp2tiley(latp, z):
    return np.floor(latp2tileyf(latp, z)).astype(np.uint32)


def lat2tiley(lat, z):
    return latp2tiley(lat2latp(lat), z)


def tilex2lon(x, z):
    return np.ldexp(np.asarray(x, dtype=np.float64), -int(z)) * 360.0 - 180.0


def tiley2latp(y, z):
    return 180.0 - np.ldexp(np.asarray(y, dtype=np.float64), -int(z)) * 360.0


def tiley2lat(y, z):
    return latp2lat(tiley2latp(y, z))


def latplon2index(latp_e7, lon_e7, base_zoom):
    """coordinates.cpp:38-41 — tile index of fixed-point (latp,lon)*1e7."""
    x = lon2tilex(np.asarray(lon_e7, dtype=np.float64) / 1e7, base_zoom)
    y = latp2tiley(np.asarray(latp_e7, dtype=np.float64) / 1e7, base_zoom)
    return x, y


# --- metre conversions (coordinates.cpp:44-49) --------------------------

def bbox_tile_ranges(bbox, start_zoom: int, end_zoom: int) -> dict:
    """Per-zoom inclusive tile ranges covering a (minlon, minlat,
    maxlon, maxlat) clipping box — the reference's --bbox semantics
    (options_parser.cpp bbox → tile_coordinates_set coverage): a tile
    is generated iff it INTERSECTS the box. Returns
    {zoom: (x0, x1, y0, y1)}."""
    minlon, minlat, maxlon, maxlat = (float(v) for v in bbox)
    out = {}
    for z in range(start_zoom, end_zoom + 1):
        n = (1 << z) - 1
        x0 = int(np.clip(np.floor(lon2tilexf(minlon, z)), 0, n))
        x1 = int(np.clip(np.floor(lon2tilexf(maxlon, z)), 0, n))
        # y grows southward: maxlat → smallest y
        y0 = int(np.clip(np.floor(lat2tileyf(maxlat, z)), 0, n))
        y1 = int(np.clip(np.floor(lat2tileyf(minlat, z)), 0, n))
        out[z] = (x0, x1, y0, y1)
    return out


def degp2meter(degp, latp):
    return RADIUS_METER * np.radians(degp) * np.cos(np.radians(latp2lat(latp)))


def meter2degp(meter, latp):
    return np.degrees((1.0 / RADIUS_METER) * (meter / np.cos(np.radians(latp2lat(latp)))))


# --- z_order lossy encode (output_object.h:50-67) -----------------------

def zorder_encode(z):
    """setZOrder: z*10 within ±1000, sqrt-compressed beyond; floor; int16.

    Non-finite input encodes to 0 (finite_cast).
    """
    z = np.asarray(z, dtype=np.float64)
    with np.errstate(invalid="ignore"):
        out = np.where(
            z > 1000.0,
            np.sqrt((z - 1000.0) * 10.0) + 10000.0,
            np.where(z < -1000.0, -10000.0 - np.sqrt((np.abs(z) - 1000.0) * 10.0), z * 10.0),
        )
    out = np.floor(out)
    out = np.where(np.isfinite(out), out, 0.0)
    return np.clip(out, -32768, 32767).astype(np.int16)


def _lat2latp_s(lat: float) -> float:
    lat = -85.06 if lat < -85.06 else (85.06 if lat > 85.06 else lat)
    return math.degrees(math.log(math.tan(math.radians(lat + 90.0) / 2.0)))


def _latp2lat_s(latp: float) -> float:
    return math.degrees(math.atan(math.exp(math.radians(latp))) * 2.0) - 90.0


# --- TileBbox (coordinates_geom.cpp:9-52) -------------------------------

class TileBbox:
    """Per-tile clipping box, scale factors and int-coordinate scaling.

    Mirrors TileBbox exactly: 1/200 margins on the clipping box, 4096
    (or 8192 hires) extent grid, floor-based scaling.
    """

    __slots__ = (
        "zoom", "x", "y", "hires", "min_lon", "max_lon", "min_lat", "max_lat",
        "min_latp", "max_latp", "xmargin", "ymargin", "xscale", "yscale",
        "clip_minx", "clip_miny", "clip_maxx", "clip_maxy", "extent",
    )

    def __init__(self, x: int, y: int, zoom: int, hires: bool = False):
        # scalar math (not numpy): this runs once per rendered tile and
        # numpy scalar ufunc dispatch is ~10x slower than libm here
        self.zoom = zoom
        self.x = x
        self.y = y
        self.hires = hires
        self.min_lon = math.ldexp(x, -zoom) * 360.0 - 180.0
        self.max_lon = math.ldexp(x + 1, -zoom) * 360.0 - 180.0
        # reference computes latp via lat (tiley2lat then lat2latp with
        # the ±85.06 clamp) — keep that exact roundtrip
        self.min_lat = _latp2lat_s(180.0 - math.ldexp(y + 1, -zoom) * 360.0)
        self.max_lat = _latp2lat_s(180.0 - math.ldexp(y, -zoom) * 360.0)
        self.min_latp = _lat2latp_s(self.min_lat)
        self.max_latp = _lat2latp_s(self.max_lat)
        self.xmargin = (self.max_lon - self.min_lon) / 200.0
        self.ymargin = (self.max_latp - self.min_latp) / 200.0
        self.extent = 8192 if hires else 4096
        self.xscale = (self.max_lon - self.min_lon) / float(self.extent)
        self.yscale = (self.max_latp - self.min_latp) / float(self.extent)
        # clipping box in (lon, latp)
        self.clip_minx = self.min_lon - self.xmargin
        self.clip_miny = self.min_latp - self.ymargin
        self.clip_maxx = self.max_lon + self.xmargin
        self.clip_maxy = self.max_latp + self.ymargin

    def scale_latplon(self, latp, lon):
        """coordinates_geom.cpp:28-32 — tile-local int coords (x, y arrays)."""
        x = np.floor((np.asarray(lon, dtype=np.float64) - self.min_lon) / self.xscale)
        y = np.floor((self.max_latp - np.asarray(latp, dtype=np.float64)) / self.yscale)
        return x.astype(np.int64), y.astype(np.int64)

    def scale_pt(self, latp: float, lon: float) -> tuple[int, int]:
        """Scalar fast path of scale_latplon (hot: once per point
        feature per tile)."""
        return (int(math.floor((lon - self.min_lon) / self.xscale)),
                int(math.floor((self.max_latp - latp) / self.yscale)))

    def floor_latplon(self, latp, lon):
        """coordinates_geom.cpp:90-93 — snap to the int grid, back to degrees."""
        x, y = self.scale_latplon(latp, lon)
        return (-(y * self.yscale - self.max_latp), x * self.xscale + self.min_lon)

    def scale_ring(self, lons: np.ndarray, latps: np.ndarray) -> np.ndarray:
        """coordinates_geom.cpp:36-52 — scale with the 5-point backtrack
        self-intersection dodge. Returns int array of shape (n, 2) [x, y]."""
        xs, ys = self.scale_latplon(latps, lons)
        points: list[tuple[int, int]] = []
        for k in range(len(xs)):
            scaled = (int(xs[k]), int(ys[k]))
            found = False
            for j in range(1, 5):
                if len(points) < 1 + j:
                    break
                if points[len(points) - j] == scaled:
                    del points[len(points) - j + 1:]
                    found = True
                    break
            if not found:
                points.append(scaled)
        return np.array(points, dtype=np.int64).reshape(-1, 2)


# --- covered-tile computation ------------------------------------------

def insert_intermediate_tiles(lons: np.ndarray, latps: np.ndarray, base_zoom: int,
                              tile_set: set[tuple[int, int]]) -> None:
    """Supercover Bresenham walk over a point sequence.

    Exact port of impl_insertIntermediateTiles
    (coordinates_geom.cpp:101-189): marks the tile of every vertex and
    every tile a segment passes through (including corner-touch cases).
    """
    txf = lon2tilexf(lons, base_zoom)
    tyf = latp2tileyf(latps, base_zoom)
    tx = np.floor(txf).astype(np.int64)
    ty = np.floor(tyf).astype(np.int64)
    n = len(tx)
    for i in range(n):
        tile_set.add((int(tx[i]), int(ty[i])))
        if i == 0:
            continue
        x1, y1 = int(tx[i - 1]), int(ty[i - 1])
        x2, y2 = int(tx[i]), int(ty[i])
        # supercover line (http://eugen.dedu.free.fr/projects/bresenham/)
        y, x = y1, x1
        dx = x2 - x1
        dy = y2 - y1
        ystep = -1 if dy < 0 else 1
        xstep = -1 if dx < 0 else 1
        dy = abs(dy)
        dx = abs(dx)
        ddy = 2 * dy
        ddx = 2 * dx
        if ddx >= ddy:
            errorprev = error = dx
            for _ in range(dx):
                x += xstep
                error += ddy
                if error > ddx:
                    y += ystep
                    error -= ddx
                    if error + errorprev < ddx:
                        tile_set.add((x, y - ystep))
                    elif error + errorprev > ddx:
                        tile_set.add((x - xstep, y))
                    else:
                        tile_set.add((x, y - ystep))
                        tile_set.add((x - xstep, y))
                tile_set.add((x, y))
                errorprev = error
        else:
            errorprev = error = dy
            for _ in range(dy):
                y += ystep
                error += ddx
                if error > ddy:
                    x += xstep
                    error -= ddy
                    if error + errorprev < ddy:
                        tile_set.add((x - xstep, y))
                    elif error + errorprev > ddy:
                        tile_set.add((x, y - ystep))
                    else:
                        tile_set.add((x - xstep, y))
                        tile_set.add((x, y - ystep))
                tile_set.add((x, y))
                errorprev = error


def fill_covered_tiles(tile_set: set[tuple[int, int]]) -> None:
    """coordinates.cpp:52-67 — for each x, fill the y-range between the
    smallest and largest marked y (interior fill for polygon rings)."""
    tiles = sorted(tile_set)
    # prev_x starts as None (no "previous column"): the reference's
    # uint32 sentinel prevY=(uint32)-2 relies on unsigned wrap so the
    # first column never fills; a literal -2 here would spuriously fill
    # y=-1..first_y for tile column x==0 (ADVICE r1, medium).
    prev_x, prev_y = None, 0
    for tile_x, tile_y in tiles:
        if tile_x == prev_x:
            for fill_y in range(prev_y + 1, tile_y):
                tile_set.add((tile_x, fill_y))
        prev_x, prev_y = tile_x, tile_y
