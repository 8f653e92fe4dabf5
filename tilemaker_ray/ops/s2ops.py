"""S2 cell-index operator queries (north-rule "H3/S2 index").

Two oracled queries over the events table:

- ``s2_cells``: every event point -> S2 cell token at level 12 and at
  leaf level 30 (geom/s2.py vectorized kernel inside map_batches).  The
  DuckDB oracle re-derives the same Hilbert-curve descent as a
  *generated* recursive CTE (30 per-level steps; the ij->pos /
  orientation tables are emitted from the same arrays the kernel uses,
  so there is no hand-transcription channel for table typos).

- ``s2_pip_join``: the pip_join rectangle join, but the candidate
  prefilter is an S2 covering per rectangle (BFS over cell rect-bounds,
  geom/s2.py) probed with one searchsorted per rectangle over the leaf
  ids of each Arrow batch; exact inclusive verify after.  Its oracle is
  pip_join's SQL verbatim — the covering only prunes, so the result
  must be identical (this doubles as a continuous no-false-negative
  gate on the covering).

Scale notes: the leaf-id kernel is ~10 numpy ops over the whole batch;
coverings are built once on the driver (lru-cached rect bounds) and
broadcast via fn_kwargs; both queries stream — no materialization.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..geom import s2
from .geospatial import (LAT_SQL, LON_SQL, ORACLES as GEO_ORACLES,
                         _event_points, rect_table)

S2_CELL_LEVEL = 12
COVER_LEVEL = 6


def _tokens(ids: np.ndarray) -> pa.Array:
    return pa.array(s2.cell_token(ids), type=pa.string())


def q_s2_cells(sf_dir: str) -> pd.DataFrame:
    ds = _event_points(sf_dir)

    def cells(b: pa.Table) -> pa.Table:
        leaf = s2.cell_from_latlng(b.column("lat").to_numpy(),
                                   b.column("lon").to_numpy())
        return pa.table({
            "event_id": b.column("event_id"),
            "token12": _tokens(s2.cell_parent(leaf, S2_CELL_LEVEL)),
            "token30": _tokens(leaf),
        })

    return ds.map_batches(cells, batch_format="pyarrow").to_pandas()


def _covering_arrays() -> dict[str, np.ndarray]:
    """Per-rect S2 coverings flattened for broadcast: for rect k,
    rows offs[k]:offs[k+1] of (lo, hi) — its disjoint covering cells'
    leaf ranges, sorted by lo."""
    rects = rect_table()
    los, his, offs = [], [], [0]
    for _, r in rects.iterrows():
        cov = s2.covering_for_rect(r.lon0, r.lat0, r.lon1, r.lat1,
                                   max_level=COVER_LEVEL)
        lo, hi = s2.cell_range(cov)
        los.append(lo)
        his.append(hi)
        offs.append(offs[-1] + len(cov))
    return {
        "cov_lo": np.concatenate(los),
        "cov_hi": np.concatenate(his),
        "cov_off": np.array(offs, dtype=np.int64),
        "rect_ids": rects.rect_id.to_numpy(),
        "boxes": rects[["lon0", "lat0", "lon1", "lat1"]].to_numpy(),
    }


def _s2_join_batch(b: pa.Table, cov_lo, cov_hi, cov_off, rect_ids,
                   boxes) -> pa.Table:
    eid = b.column("event_id").to_numpy().astype(np.int64)
    lon = b.column("lon").to_numpy()
    lat = b.column("lat").to_numpy()
    leaf = s2.cell_from_latlng(lat, lon)
    order = np.argsort(leaf, kind="stable")
    sleaf = leaf[order]
    out_e, out_r = [], []
    for k in range(len(rect_ids)):
        lo = cov_lo[cov_off[k]:cov_off[k + 1]]
        hi = cov_hi[cov_off[k]:cov_off[k + 1]]
        if len(lo) == 0:
            continue
        idx = np.searchsorted(lo, sleaf, side="right") - 1
        cand = order[(idx >= 0) & (sleaf <= hi[np.clip(idx, 0, len(hi) - 1)])]
        if len(cand) == 0:
            continue
        x0, y0, x1, y1 = boxes[k]
        m = ((lon[cand] >= x0) & (lon[cand] <= x1) &
             (lat[cand] >= y0) & (lat[cand] <= y1))
        hit = cand[m]
        out_e.append(eid[hit])
        out_r.append(np.full(len(hit), rect_ids[k], dtype=np.int64))
    if not out_e:
        return pa.table({"event_id": pa.array([], type=pa.int64()),
                         "rect_id": pa.array([], type=pa.int64())})
    return pa.table({"event_id": pa.array(np.concatenate(out_e)),
                     "rect_id": pa.array(np.concatenate(out_r))})


def q_s2_pip_join(sf_dir: str) -> pd.DataFrame:
    ds = _event_points(sf_dir)
    cov = _covering_arrays()  # small: built once, shipped per task
    out = ds.map_batches(_s2_join_batch, fn_kwargs=cov,
                         batch_format="pyarrow")
    return out.to_pandas()


# --- generated recursive-CTE oracle for s2_cells ------------------------

def _ij_to_pos_case() -> str:
    whens = []
    for o in range(4):
        for ij in range(4):
            whens.append(f"WHEN {o * 4 + ij} THEN {int(s2.IJ_TO_POS[o, ij])}")
    return "CASE orient*4 + ij2 " + " ".join(whens) + " ELSE 0 END"


def _pos_to_orient_case() -> str:
    whens = " ".join(f"WHEN {p} THEN {int(s2.POS_TO_ORIENT[p])}"
                     for p in range(4))
    return "CASE p " + whens + " ELSE 0 END"


def _s2_cells_oracle() -> str:
    two61 = 1 << 61
    lsb18 = 4 ** (s2.MAX_LEVEL - S2_CELL_LEVEL)  # level-12 lsb
    shift = 2 * (s2.MAX_LEVEL - S2_CELL_LEVEL)
    token = ("rtrim(lpad(lower(hex({id})), 16, '0'), '0')")
    id12 = (f"CAST(face AS HUGEINT)*{two61} + (pos >> {shift})*{2 * lsb18} "
            f"+ {lsb18}")
    id30 = f"CAST(face AS HUGEINT)*{two61} + CAST(pos AS HUGEINT)*2 + 1"
    return f"""
WITH RECURSIVE pts AS (
  SELECT event_id, {LON_SQL} AS lon, {LAT_SQL} AS lat FROM events
), xyz AS (
  SELECT event_id,
         cos(radians(lat))*cos(radians(lon)) AS x,
         cos(radians(lat))*sin(radians(lon)) AS y,
         sin(radians(lat)) AS z
  FROM pts
), fc AS (
  SELECT *, CASE WHEN abs(x) > abs(y)
                 THEN CASE WHEN abs(x) > abs(z)
                           THEN CASE WHEN x < 0 THEN 3 ELSE 0 END
                           ELSE CASE WHEN z < 0 THEN 5 ELSE 2 END END
                 ELSE CASE WHEN abs(y) > abs(z)
                           THEN CASE WHEN y < 0 THEN 4 ELSE 1 END
                           ELSE CASE WHEN z < 0 THEN 5 ELSE 2 END END
            END AS face
  FROM xyz
), fuv AS (
  SELECT event_id, face,
         CASE face WHEN 0 THEN y/x WHEN 1 THEN -x/y WHEN 2 THEN -x/z
                   WHEN 3 THEN z/x WHEN 4 THEN z/y ELSE -y/z END AS u,
         CASE face WHEN 0 THEN z/x WHEN 1 THEN z/y WHEN 2 THEN -y/z
                   WHEN 3 THEN y/x WHEN 4 THEN -x/y ELSE -x/z END AS v
  FROM fc
), fij AS (
  SELECT event_id, face,
         CAST(least(greatest(floor(
           (CASE WHEN u >= 0 THEN 0.5*sqrt(1+3*u)
                 ELSE 1 - 0.5*sqrt(1-3*u) END) * 1073741824.0), 0), 1073741823)
           AS BIGINT) AS i,
         CAST(least(greatest(floor(
           (CASE WHEN v >= 0 THEN 0.5*sqrt(1+3*v)
                 ELSE 1 - 0.5*sqrt(1-3*v) END) * 1073741824.0), 0), 1073741823)
           AS BIGINT) AS j
  FROM fuv
), walk AS (
  SELECT event_id, face, i, j, 0 AS k, CAST(0 AS BIGINT) AS pos,
         face % 2 AS orient
  FROM fij
  UNION ALL
  SELECT event_id, face, i, j, k + 1, pos*4 + p,
         xor(orient, {_pos_to_orient_case()})
  FROM (
    SELECT *, {_ij_to_pos_case()} AS p
    FROM (
      SELECT *, ((i >> (29 - k)) & 1)*2 + ((j >> (29 - k)) & 1) AS ij2
      FROM walk WHERE k < 30
    )
  )
)
SELECT event_id,
       {token.format(id=id12)} AS token12,
       {token.format(id=id30)} AS token30
FROM walk WHERE k = 30
"""


ORACLES = {
    "s2_cells": _s2_cells_oracle(),
    # identical result to pip_join by construction: S2 coverings only
    # prune candidates, the exact verify decides membership
    "s2_pip_join": GEO_ORACLES["pip_join"],
}
