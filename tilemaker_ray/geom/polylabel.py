"""Pole of inaccessibility (polylabel) — port of the mapbox/polylabel
algorithm (public, ISC) as used by the reference
(/root/reference/include/polylabel.h; LayerAsCentroid default
algorithm, osm_lua_processing.cpp:688-802). Default precision 1e-5 to
match the reference's adaptation.

Quadtree cell subdivision with a max-priority queue on potential
distance; distance to the polygon is signed (negative outside).
"""

from __future__ import annotations

import heapq
import math

import numpy as np

from .core import points_in_polygon


def _seg_dist_sq(px, py, ax, ay, bx, by) -> float:
    x, y = ax, ay
    dx = bx - ax
    dy = by - ay
    if dx != 0 or dy != 0:
        t = ((px - x) * dx + (py - y) * dy) / (dx * dx + dy * dy)
        if t > 1:
            x, y = bx, by
        elif t > 0:
            x += dx * t
            y += dy * t
    dx = px - x
    dy = py - y
    return dx * dx + dy * dy


def _point_to_polygon_dist(px: float, py: float, rings: list[np.ndarray]) -> float:
    """Signed distance: positive inside, negative outside."""
    inside = bool(points_in_polygon([px], [py], rings)[0])
    min_d = math.inf
    for ring in rings:
        for i in range(len(ring) - 1):
            d = _seg_dist_sq(px, py, ring[i, 0], ring[i, 1],
                            ring[i + 1, 0], ring[i + 1, 1])
            if d < min_d:
                min_d = d
    return (1 if inside else -1) * math.sqrt(min_d)


class _Cell:
    __slots__ = ("x", "y", "h", "d", "max_d")

    def __init__(self, x, y, h, rings):
        self.x = x
        self.y = y
        self.h = h
        self.d = _point_to_polygon_dist(x, y, rings)
        self.max_d = self.d + h * math.sqrt(2.0)


def polylabel(rings: list[np.ndarray], precision: float = 1e-5) -> tuple[float, float]:
    """rings: closed (n,2) arrays, outer first. Returns (x, y)."""
    outer = rings[0]
    minx, miny = float(outer[:, 0].min()), float(outer[:, 1].min())
    maxx, maxy = float(outer[:, 0].max()), float(outer[:, 1].max())
    w, hgt = maxx - minx, maxy - miny
    cell_size = min(w, hgt)
    h = cell_size / 2.0
    if cell_size == 0:
        return minx, miny

    heap: list[tuple[float, int, _Cell]] = []
    n = 0

    def push(c: _Cell):
        nonlocal n
        heapq.heappush(heap, (-c.max_d, n, c))
        n += 1

    x = minx
    while x < maxx:
        y = miny
        while y < maxy:
            push(_Cell(x + h, y + h, h, rings))
            y += cell_size
        x += cell_size

    # centroid + bbox-center seeds (mapbox polylabel)
    best = _centroid_cell(rings)
    bbox_cell = _Cell(minx + w / 2, miny + hgt / 2, 0, rings)
    if bbox_cell.d > best.d:
        best = bbox_cell

    while heap:
        _, _, cell = heapq.heappop(heap)
        if cell.d > best.d:
            best = cell
        if cell.max_d - best.d <= precision:
            continue
        h2 = cell.h / 2.0
        for dx in (-h2, h2):
            for dy in (-h2, h2):
                push(_Cell(cell.x + dx, cell.y + dy, h2, rings))
    return best.x, best.y


def _centroid_cell(rings: list[np.ndarray]) -> _Cell:
    ring = rings[0]
    area = 0.0
    cx = cy = 0.0
    for i in range(len(ring) - 1):
        a = ring[i]
        b = ring[i + 1]
        f = a[0] * b[1] - b[0] * a[1]
        cx += (a[0] + b[0]) * f
        cy += (a[1] + b[1]) * f
        area += f * 3.0
    if area == 0:
        c = _Cell(float(ring[0, 0]), float(ring[0, 1]), 0, rings)
    else:
        c = _Cell(cx / area, cy / area, 0, rings)
    return c
