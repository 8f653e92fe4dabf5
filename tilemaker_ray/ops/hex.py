"""Hex-grid binning + k-ring aggregation (H3-style index, planar).

Complements geom/s2.py for the north rule's "H3/S2 index": an
aperture-style hexagonal binning of the deterministic event points
(ops/geospatial.py geocode) on a pointy-top axial hex grid over the
lon/lat plane, plus a ring-1 neighborhood rollup — the two primitives
H3 pipelines use for density surfaces.  (True H3 cell ids — icosahedral
gnomonic faces — are NOT claimed; the published axial/cube-round hex
math here is the planar analogue, and the S2 module provides the
spherical hierarchy.)

- ``hex_bin``: point -> axial (q, r) via the published fractional-hex
  cube-rounding algorithm (www.redblobgames.com/grids/hexagons,
  public), vectorized; partial combine inside map_batches, then one
  small groupby.  Oracle: identical float expressions in SQL.
- ``hex_kring``: per occupied hex, its own count and the summed count
  of its distance-<=1 neighborhood, in ONE groupby: each hex emits 7
  halo rows (self-flagged), then Sum/flag-filter — no join, no second
  shuffle.  Oracle: CROSS JOIN with the 7 offsets + HAVING max(flag).

Both ends stay exact because every float op (sqrt(3)/3 scaling, the
floor(x+0.5) rounds, the dx/dy/dz comparisons) is written in the same
order in numpy and SQL.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

from .geospatial import LAT_SQL, LON_SQL, _event_points

HEX_SIZE = 2.0  # hex size in degrees (circumradius)
_SQRT3_3 = math.sqrt(3.0) / 3.0


def axial_from_xy(x, y, size: float = HEX_SIZE):
    """Pointy-top fractional axial coords, cube-rounded to int (q, r)."""
    qf = (_SQRT3_3 * np.asarray(x, dtype=np.float64)
          - np.asarray(y, dtype=np.float64) / 3.0) / size
    rf = (2.0 / 3.0 * np.asarray(y, dtype=np.float64)) / size
    xf = qf
    zf = rf
    yf = -xf - zf
    rx = np.floor(xf + 0.5)
    ry = np.floor(yf + 0.5)
    rz = np.floor(zf + 0.5)
    dx = np.abs(rx - xf)
    dy = np.abs(ry - yf)
    dz = np.abs(rz - zf)
    c1 = (dx > dy) & (dx > dz)
    c2 = ~c1 & (dy > dz)
    rx = np.where(c1, -ry - rz, rx)
    ry = np.where(c2, -rx - rz, ry)
    rz = np.where(~c1 & ~c2, -rx - ry, rz)
    return rx.astype(np.int64), rz.astype(np.int64)


def hex_center(q, r, size: float = HEX_SIZE):
    """Inverse of the binning (hex center in the x/y plane)."""
    q = np.asarray(q, dtype=np.float64)
    r = np.asarray(r, dtype=np.float64)
    x = size * (math.sqrt(3.0) * q + math.sqrt(3.0) / 2.0 * r)
    y = size * (1.5 * r)
    return x, y


# axial ring-1 neighborhood (self first, flagged)
KRING1 = [(0, 0), (1, 0), (1, -1), (0, -1), (-1, 0), (-1, 1), (0, 1)]


def _hex_batches(b: pa.Table) -> pa.Table:
    q, r = axial_from_xy(b.column("lon").to_numpy(),
                         b.column("lat").to_numpy())
    key = (q + (1 << 20)) << 21 | (r + (1 << 20))
    uniq, counts = np.unique(key, return_counts=True)
    return pa.table({
        "hex_q": pa.array((uniq >> 21) - (1 << 20)),
        "hex_r": pa.array((uniq & ((1 << 21) - 1)) - (1 << 20)),
        "n": pa.array(counts.astype(np.int64)),
    })


def _hex_cells(sf_dir: str):
    from ray.data.aggregate import Sum
    return (_event_points(sf_dir)
            .map_batches(_hex_batches, batch_format="pyarrow")
            .groupby(["hex_q", "hex_r"])
            .aggregate(Sum("n", alias_name="n")))


def q_hex_bin(sf_dir: str) -> pd.DataFrame:
    return _hex_cells(sf_dir).to_pandas()


def q_hex_kring(sf_dir: str) -> pd.DataFrame:
    """Ring-1 rollup per occupied hex, single-shuffle halo pattern."""

    def halo(b: pa.Table) -> pa.Table:
        q = b.column("hex_q").to_numpy()
        r = b.column("hex_r").to_numpy()
        n = b.column("n").to_numpy()
        qs, rs, ns, fs = [], [], [], []
        for dq, dr in KRING1:
            qs.append(q + dq)
            rs.append(r + dr)
            ns.append(n)
            fs.append(np.full(len(q), 1 if (dq, dr) == (0, 0) else 0,
                              dtype=np.int64))
        return pa.table({"hex_q": pa.array(np.concatenate(qs)),
                         "hex_r": pa.array(np.concatenate(rs)),
                         "hn": pa.array(np.concatenate(ns)),
                         "flag": pa.array(np.concatenate(fs))})

    from ray.data.aggregate import Max, Sum

    def own(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return b.append_column(
            "own", pc.multiply(b.column("hn"), b.column("flag")))

    out = (_hex_cells(sf_dir)
           .map_batches(halo, batch_format="pyarrow")
           .map_batches(own, batch_format="pyarrow")
           .groupby(["hex_q", "hex_r"])
           .aggregate(Sum("own", alias_name="n"),
                      Sum("hn", alias_name="ring_n"),
                      Max("flag", alias_name="occ")))
    df = out.to_pandas()
    return (df[df["occ"] == 1][["hex_q", "hex_r", "n", "ring_n"]]
            .reset_index(drop=True))


_AXIAL_SQL = f"""
  WITH pts AS (
    SELECT {LON_SQL} AS lon, {LAT_SQL} AS lat FROM events
  ), frac AS (
    SELECT (sqrt(3.0)/3.0 * lon - lat/3.0) / {HEX_SIZE} AS xf,
           (2.0/3.0 * lat) / {HEX_SIZE} AS zf
    FROM pts
  ), rounded AS (
    SELECT xf, zf, -xf - zf AS yf,
           floor(xf + 0.5) AS rx, floor(-xf - zf + 0.5) AS ry,
           floor(zf + 0.5) AS rz
    FROM frac
  ), d AS (
    SELECT *, abs(rx - xf) AS dx, abs(ry - yf) AS dy, abs(rz - zf) AS dz
    FROM rounded
  ), s1 AS (
    SELECT *, CASE WHEN dx > dy AND dx > dz THEN -ry - rz ELSE rx END AS rx2
    FROM d
  ), s2 AS (
    SELECT *, CASE WHEN NOT (dx > dy AND dx > dz) AND dy > dz
                   THEN -rx2 - rz ELSE ry END AS ry2
    FROM s1
  ), s3 AS (
    SELECT *, CASE WHEN NOT (dx > dy AND dx > dz) AND NOT (dy > dz)
                   THEN -rx2 - ry2 ELSE rz END AS rz2
    FROM s2
  )
  SELECT CAST(rx2 AS BIGINT) AS hex_q, CAST(rz2 AS BIGINT) AS hex_r FROM s3
"""

_OFFSETS_SQL = ", ".join(f"({dq}, {dr})" for dq, dr in KRING1)

# hex_bin has no separate driver entry: hex_kring's `n` column IS the
# bin count, so its oracle row covers the binning operator too (the
# q_hex_bin function remains for tests and library use).
ORACLES = {
    "hex_kring": f"""
WITH binned AS (
  SELECT hex_q, hex_r, CAST(count(*) AS BIGINT) AS n
  FROM ({_AXIAL_SQL}) GROUP BY hex_q, hex_r
), halo AS (
  SELECT b.hex_q + d.dq AS hex_q, b.hex_r + d.dr AS hex_r, b.n,
         CASE WHEN d.dq = 0 AND d.dr = 0 THEN 1 ELSE 0 END AS flag
  FROM binned b CROSS JOIN (VALUES {_OFFSETS_SQL}) d(dq, dr)
)
SELECT hex_q, hex_r, CAST(sum(n * flag) AS BIGINT) AS n,
       CAST(sum(n) AS BIGINT) AS ring_n
FROM halo GROUP BY hex_q, hex_r HAVING max(flag) = 1
""",
}
