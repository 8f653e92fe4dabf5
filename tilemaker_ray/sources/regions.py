"""Synthetic external polygon layer ("admin regions") — the spatial
join build side, playing the role of the reference's shapefile /
GeoJSON layers (SURVEY §2.1 S3/S4, ShpMemTiles ST5).

Deterministic: convex region polygons (convex hulls of seeded point
clouds) so exact intersection AREA is computable with the
Sutherland-Hodgman convex clip. Each region carries attributes
(name, class) like source_columns.
"""

from __future__ import annotations

import numpy as np

from .. import tilemath as tm

N_REGIONS = 48


def _convex_hull(pts: np.ndarray) -> np.ndarray:
    """Andrew monotone chain; returns closed CCW ring (n,2)."""
    pts = pts[np.lexsort((pts[:, 1], pts[:, 0]))]

    def half(iterable):
        out = []
        for p in iterable:
            while len(out) >= 2 and np.cross(out[-1] - out[-2], p - out[-2]) <= 0:
                out.pop()
            out.append(p)
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    hull = np.array(lower[:-1] + upper[:-1])
    return np.vstack([hull, hull[:1]])


def region_table(seed: int = 42) -> list[dict]:
    """Regions as dicts: name, cls, ring (closed, (lon, latp))."""
    rng = np.random.default_rng(seed ^ 0x9E3779B9)
    out = []
    for i in range(N_REGIONS):
        clat = rng.uniform(-55.0, 60.0)
        clon = rng.uniform(-165.0, 165.0)
        npts = int(rng.integers(6, 16))
        span = rng.uniform(1.0, 6.0)
        pts = np.column_stack([
            clon + rng.normal(0, span, npts),
            tm.lat2latp(clat + rng.normal(0, span * 0.6, npts)),
        ])
        ring = _convex_hull(pts)
        out.append({
            "name": f"region{i:03d}",
            "cls": ["admin", "park", "water"][i % 3],
            "ring": ring,
        })
    return out
