"""Tile-boundary clipping — ports of the reference's clip paths.

- fast_clip: Sutherland-Hodgman ring clip against an axis-aligned box,
  exact port of /root/reference/src/geom.cpp:176-246 (itself a port of
  mapbox/lineclip).
- clip_polygon / clip_multipolygon: the polygon path of
  buildWayGeometry (/root/reference/src/tile_data.cpp:270-349):
  fast_clip then boost-correct; the reference's boost-intersection
  fallback on self-intersection is approximated by keeping the
  corrected fast_clip result (divergence documented; fixture-gated).
- clip_multilinestring: the linestring path
  (/root/reference/src/tile_data.cpp:223-248): pre-split runs whose
  segments miss the clipping box, then Liang-Barsky segment clipping to
  the extend box (equivalent to geom::intersection(mls, box)).
"""

from __future__ import annotations

import numpy as np

from .core import close_ring, correct_polygon, ring_signed_area


def _bit_code(x: float, y: float, minx: float, miny: float, maxx: float, maxy: float) -> int:
    code = 0
    if x < minx:
        code |= 1
    elif x > maxx:
        code |= 2
    if y < miny:
        code |= 4
    elif y > maxy:
        code |= 8
    return code


def fast_clip_ring(ring: np.ndarray, minx: float, miny: float, maxx: float, maxy: float) -> np.ndarray:
    """Sutherland-Hodgman against each box edge (geom.cpp:205-226)."""
    pts = [(float(p[0]), float(p[1])) for p in ring]
    edge = 1
    while edge <= 8:
        if not pts:
            break
        result: list[tuple[float, float]] = []
        prev = pts[-1]
        prev_inside = (_bit_code(prev[0], prev[1], minx, miny, maxx, maxy) & edge) == 0
        for p in pts:
            inside = (_bit_code(p[0], p[1], minx, miny, maxx, maxy) & edge) == 0
            if inside != prev_inside:
                a, b = prev, p
                if edge & 8:
                    ip = (a[0] + (b[0] - a[0]) * (maxy - a[1]) / (b[1] - a[1]), maxy)
                elif edge & 4:
                    ip = (a[0] + (b[0] - a[0]) * (miny - a[1]) / (b[1] - a[1]), miny)
                elif edge & 2:
                    ip = (maxx, a[1] + (b[1] - a[1]) * (maxx - a[0]) / (b[0] - a[0]))
                else:
                    ip = (minx, a[1] + (b[1] - a[1]) * (minx - a[0]) / (b[0] - a[0]))
                result.append(ip)
            if inside:
                result.append(p)
            prev = p
            prev_inside = inside
        pts = result
        edge *= 2
    return np.array(pts, dtype=np.float64).reshape(-1, 2)


def polygon_inside_box(rings, minx, miny, maxx, maxy) -> bool:
    """All vertices within the box — clipping is then the identity."""
    for r in rings:
        a = np.asarray(r)
        if not (a[:, 0].min() >= minx and a[:, 0].max() <= maxx and
                a[:, 1].min() >= miny and a[:, 1].max() <= maxy):
            return False
    return True


def clip_polygon(rings: list[np.ndarray], minx, miny, maxx, maxy) -> list[np.ndarray] | None:
    """fast_clip(Polygon&) (geom.cpp:229-241): clip outer; empty ⇒ gone;
    clip inners, drop empties. Then boost-style correct (close + winding)."""
    outer = fast_clip_ring(rings[0], minx, miny, maxx, maxy)
    if len(outer) == 0:
        return None
    out = [outer]
    for inner in rings[1:]:
        c = fast_clip_ring(inner, minx, miny, maxx, maxy)
        if len(c) > 0:
            out.append(c)
    out = correct_polygon(out)
    if len(out[0]) < 4:
        return None
    out = [out[0]] + [r for r in out[1:] if len(r) >= 4]
    return out


def clip_multipolygon(polys: list[list[np.ndarray]], minx, miny, maxx, maxy) -> list[list[np.ndarray]]:
    """fast_clip each polygon; when Sutherland–Hodgman leaves a
    self-intersection (concave rings bridged across box corners), retry
    with the exact sweep-line intersection against the box — the
    reference's fallback at tile_data.cpp:330-346."""
    from . import boolops
    out = []
    for rings in polys:
        if polygon_inside_box(rings, minx, miny, maxx, maxy):
            # identity clip: skip Sutherland–Hodgman AND the validity
            # probe (input polygons are assumed valid)
            c = [close_ring(np.asarray(r, dtype=np.float64)) for r in rings]
            if len(c[0]) >= 4:
                out.append([c[0]] + [r for r in c[1:] if len(r) >= 4])
            continue
        c = clip_polygon(rings, minx, miny, maxx, maxy)
        if c is None:
            continue
        if boolops.rings_self_intersect(c):
            subj = [[[(float(x), float(y)) for x, y in
                      close_ring(np.asarray(r, dtype=np.float64))]
                     for r in rings]]
            box = [[[(minx, miny), (maxx, miny), (maxx, maxy), (minx, maxy)]]]
            for poly in boolops.intersection(subj, box):
                # boolops emits CCW exteriors; engine convention is
                # boost-correct (outer CW in y-up) — reverse each ring
                conv = [np.asarray(r[::-1], dtype=np.float64) for r in poly]
                if len(conv[0]) >= 4:
                    out.append(conv)
        else:
            out.append(c)
    return out


def _liang_barsky(x1, y1, x2, y2, minx, miny, maxx, maxy):
    """Clip one segment to a box; returns (t0, t1) or None."""
    dx = x2 - x1
    dy = y2 - y1
    t0, t1 = 0.0, 1.0
    for p, q in ((-dx, x1 - minx), (dx, maxx - x1), (-dy, y1 - miny), (dy, maxy - y1)):
        if p == 0.0:
            if q < 0.0:
                return None
        else:
            r = q / p
            if p < 0.0:
                if r > t1:
                    return None
                if r > t0:
                    t0 = r
            else:
                if r < t0:
                    return None
                if r < t1:
                    t1 = r
    return t0, t1


def clip_linestring(ls: np.ndarray, minx, miny, maxx, maxy) -> list[np.ndarray]:
    """geom::intersection(linestring, box) → pieces inside the box."""
    parts: list[np.ndarray] = []
    cur: list[tuple[float, float]] = []
    for i in range(len(ls) - 1):
        x1, y1 = float(ls[i, 0]), float(ls[i, 1])
        x2, y2 = float(ls[i + 1, 0]), float(ls[i + 1, 1])
        r = _liang_barsky(x1, y1, x2, y2, minx, miny, maxx, maxy)
        if r is None:
            if len(cur) > 1:
                parts.append(np.array(cur))
            cur = []
            continue
        t0, t1 = r
        dx = x2 - x1
        dy = y2 - y1
        a = (x1 + t0 * dx, y1 + t0 * dy)
        b = (x1 + t1 * dx, y1 + t1 * dy)
        if t0 > 0.0 or not cur:
            # segment enters the box afresh
            if len(cur) > 1:
                parts.append(np.array(cur))
            cur = [a]
        if b != cur[-1]:
            cur.append(b)
        if t1 < 1.0:
            if len(cur) > 1:
                parts.append(np.array(cur))
            cur = []
    if len(cur) > 1:
        parts.append(np.array(cur))
    return parts


def _seg_intersects_box(x1, y1, x2, y2, minx, miny, maxx, maxy) -> bool:
    return _liang_barsky(x1, y1, x2, y2, minx, miny, maxx, maxy) is not None


def clip_ring_convex(subject: np.ndarray, clip_ring: np.ndarray) -> np.ndarray:
    """Sutherland-Hodgman against a CONVEX clip polygon (CCW closed
    ring). Exact for convex clippers; used by AreaIntersecting (J5) on
    the convex region layer. Returns an open point list (possibly
    empty)."""
    pts = [(float(p[0]), float(p[1])) for p in subject[:-1]] \
        if len(subject) and (subject[0] == subject[-1]).all() \
        else [(float(p[0]), float(p[1])) for p in subject]
    for k in range(len(clip_ring) - 1):
        if not pts:
            break
        ax, ay = clip_ring[k]
        bx, by = clip_ring[k + 1]
        ex, ey = bx - ax, by - ay
        out = []
        prev = pts[-1]
        prev_in = ex * (prev[1] - ay) - ey * (prev[0] - ax) >= 0
        for p in pts:
            cur_in = ex * (p[1] - ay) - ey * (p[0] - ax) >= 0
            if cur_in != prev_in:
                dx, dy = p[0] - prev[0], p[1] - prev[1]
                denom = ex * dy - ey * dx
                if denom != 0:
                    t = (ey * (prev[0] - ax) - ex * (prev[1] - ay)) / denom
                    out.append((prev[0] + t * dx, prev[1] + t * dy))
            if cur_in:
                out.append(p)
            prev, prev_in = p, cur_in
        pts = out
    return np.array(pts, dtype=np.float64).reshape(-1, 2)


def clip_linestring_tilemaker(ls: np.ndarray, clip_box, ext_box) -> list[np.ndarray]:
    """The LINESTRING_ branch of buildWayGeometry
    (tile_data.cpp:223-248): split the input where a segment does not
    intersect the clippingBox, then intersect the runs with the
    extendBox."""
    cminx, cminy, cmaxx, cmaxy = clip_box
    # early out: fully inside the clip box → identity (every segment
    # then intersects the clip box, so no splits, and the extend box —
    # a superset — can't cut either).  The common case for small
    # features at high zoom; skips the per-segment Python scan.
    x = ls[:, 0]
    y = ls[:, 1]
    if (x.min() >= cminx and x.max() <= cmaxx and
            y.min() >= cminy and y.max() <= cmaxy):
        return [ls] if len(ls) > 1 else []
    runs: list[np.ndarray] = []
    start = 0
    for i in range(1, len(ls)):
        if not _seg_intersects_box(ls[i - 1, 0], ls[i - 1, 1], ls[i, 0], ls[i, 1],
                                   cminx, cminy, cmaxx, cmaxy):
            if i - start > 1:
                runs.append(ls[start:i])
            start = i
    if len(ls) - start > 1:
        runs.append(ls[start:])
    out: list[np.ndarray] = []
    for run in runs:
        out.extend(clip_linestring(run, *ext_box))
    return out
