"""Raster<->vector operator queries (north-rule "raster<->vector").

Over the deterministic event points (ops/geospatial.py geocode), on a
fixed W x H lon/lat grid:

- ``rasterize``: vector -> raster.  Points aggregated to sparse cells
  (count + value sum): partial np.unique combine inside map_batches,
  then one small groupby.  Oracle: the same floor math in SQL.
- ``raster_runs``: raster -> vector, stage 1.  Maximal horizontal runs
  of occupied cells per grid row (run-length encoding).  Oracle:
  classic gaps-and-islands SQL.
- ``raster_components``: raster -> vector, stage 2.  4-connected
  components labeled by their minimum cell key, computed DISTRIBUTED:
  per-block vectorized labeling (geom/raster.label_components) inside
  map_groups, then a driver-side union-find over only the block
  BOUNDARY cells (O(perimeter), tiny vs the grid), then a broadcast
  relabel + groupby rollup.  A worker never holds more than one
  block's cells.  Oracle: recursive-CTE reachability closure + min.
- ``raster_polygonize``: raster -> vector, stage 3.  Each component's
  boundary traced to closed rings (geom/raster.trace_rings) inside
  per-component map_groups; emits ring/vertex counts and the shoelace
  area, which must equal the component cell count (the built-in
  consistency check; the ring geometry round-trip is unit-tested via
  fill_rings).  Rows-only: ring topology is not SQL-expressible, but
  label/n_cells pairs are cross-checked by raster_components' oracle.

Scale notes: the raster is sparse (occupied cells only) and all wide
steps key on small ints (cell key / block / label); at a 100 TB input
the rasterize groupby output is bounded by the GRID, not the input,
and the CCL shuffle moves one row per occupied cell.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..geom import raster as rk
from .geospatial import LAT_SQL, LON_SQL, _event_points

W, H = 216, 108          # ~1.7 deg cells over lon [-180,180] x lat [-85,85]
BLOCK = 32               # CCL block side, in cells
VAL_MOD = 97             # deterministic per-event value for the sum band


CELLS_SQL = f"""
  SELECT CAST(floor((({LON_SQL}) - -180.0) / 360.0 * {W}) AS BIGINT) AS cell_x,
         CAST(floor((({LAT_SQL}) - -85.0) / 170.0 * {H}) AS BIGINT) AS cell_y,
         event_id % {VAL_MOD} AS val
  FROM events
"""


def _cell_batches(b: pa.Table) -> pa.Table:
    """Partial rasterize combine: one row per distinct cell per batch."""
    cx, cy = rk.points_to_cells(b.column("lon").to_numpy(),
                                b.column("lat").to_numpy(), W, H)
    key = cy * W + cx
    uniq, inv, counts = np.unique(key, return_inverse=True, return_counts=True)
    val = b.column("event_id").to_numpy() % VAL_MOD
    sums = np.bincount(inv, weights=val.astype(np.float64)).astype(np.int64)
    return pa.table({
        "cell_x": pa.array(uniq % W),
        "cell_y": pa.array(uniq // W),
        "n": pa.array(counts.astype(np.int64)),
        "sum_val": pa.array(sums),
    })


def _raster_cells(sf_dir: str) -> ray.data.Dataset:
    """Sparse raster: one row per occupied cell with count + value sum."""
    from ray.data.aggregate import Sum
    return (_event_points(sf_dir)
            .map_batches(_cell_batches, batch_format="pyarrow")
            .groupby(["cell_x", "cell_y"])
            .aggregate(Sum("n", alias_name="n"),
                       Sum("sum_val", alias_name="sum_val")))


def q_rasterize(sf_dir: str) -> pd.DataFrame:
    return _raster_cells(sf_dir).to_pandas()


def q_raster_runs(sf_dir: str) -> pd.DataFrame:
    """Run-length encode each grid row (maximal horizontal runs)."""
    cells = _raster_cells(sf_dir).select_columns(["cell_x", "cell_y"])

    def runs(g: pd.DataFrame) -> pd.DataFrame:
        xs = np.sort(g["cell_x"].to_numpy(dtype=np.int64))
        brk = np.nonzero(np.diff(xs) > 1)[0]
        x0 = xs[np.concatenate(([0], brk + 1))]
        x1 = xs[np.concatenate((brk, [len(xs) - 1]))]
        return pd.DataFrame({"cell_y": g["cell_y"].iloc[0],
                             "x0": x0, "x1": x1, "len": x1 - x0 + 1})

    return (cells.groupby("cell_y")
                 .map_groups(runs, batch_format="pandas")
                 .to_pandas())


# --- distributed connected components -----------------------------------

def _block_label(g: pd.DataFrame) -> pd.DataFrame:
    """Label one block's cells; mark cells on the block rim (the only
    ones that can join a neighboring block's component)."""
    cx = g["cell_x"].to_numpy(dtype=np.int64)
    cy = g["cell_y"].to_numpy(dtype=np.int64)
    key = cy * W + cx
    order = np.argsort(key)
    keys = key[order]
    lab = rk.label_components(keys, W)
    bx = cx[order] % BLOCK
    by = cy[order] % BLOCK
    rim = (bx == 0) | (bx == BLOCK - 1) | (by == 0) | (by == BLOCK - 1)
    return pd.DataFrame({"key": keys, "label": lab, "rim": rim,
                         "n": g["n"].to_numpy(dtype=np.int64)[order]})


def _merge_rim(rim_df: pd.DataFrame) -> dict[int, int]:
    """Union-find over block-crossing edges among rim cells; returns
    the non-identity part of the local-label -> global-label map."""
    keys = rim_df["key"].to_numpy(dtype=np.int64)
    labels = rim_df["label"].to_numpy(dtype=np.int64)
    order = np.argsort(keys)
    keys = keys[order]
    labels = labels[order]
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    cx = keys % W
    for target, valid in ((keys + 1, cx < W - 1), (keys + W, None)):
        idx = np.clip(np.searchsorted(keys, target), 0, len(keys) - 1)
        found = keys[idx] == target
        if valid is not None:
            found &= valid
        for a, b in zip(labels[np.nonzero(found)[0]], labels[idx[found]]):
            ra, rb = find(int(a)), find(int(b))
            if ra != rb:
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
    return {x: find(x) for x in parent if find(x) != x}


def _labeled_cells(sf_dir: str) -> ray.data.Dataset:
    """Cells with their GLOBAL component label (min cell key)."""
    cells = _raster_cells(sf_dir)

    def add_block(b: pa.Table) -> pa.Table:
        cx = b.column("cell_x").to_numpy()
        cy = b.column("cell_y").to_numpy()
        return b.append_column(
            "block", pa.array((cy // BLOCK) * ((W + BLOCK - 1) // BLOCK)
                              + cx // BLOCK))

    # materialize: consumed twice (rim pull + relabel) and bounded by
    # the GRID size (one row per occupied cell), not by the input rows
    local = (cells.map_batches(add_block, batch_format="pyarrow")
                  .groupby("block")
                  .map_groups(_block_label, batch_format="pandas")
                  .materialize())
    # rim cells are O(perimeter) of each block — small enough to pull
    rim = local.filter(lambda r: r["rim"]).select_columns(
        ["key", "label"]).to_pandas()
    remap = _merge_rim(rim)
    if remap:
        old = np.array(sorted(remap), dtype=np.int64)
        new = np.array([remap[k] for k in old.tolist()], dtype=np.int64)
    else:
        old = np.empty(0, dtype=np.int64)
        new = old

    def relabel(b: pa.Table) -> pa.Table:
        lab = b.column("label").to_numpy().astype(np.int64)
        idx = np.clip(np.searchsorted(old, lab), 0, max(len(old) - 1, 0))
        if len(old):
            hit = old[idx] == lab
            lab = np.where(hit, new[idx], lab)
        return pa.table({"key": b.column("key"), "label": pa.array(lab),
                         "n": b.column("n")})

    return local.map_batches(relabel, batch_format="pyarrow")


def q_raster_components(sf_dir: str) -> pd.DataFrame:
    from ray.data.aggregate import Count, Sum
    out = (_labeled_cells(sf_dir)
           .groupby("label")
           .aggregate(Count(alias_name="n_cells"),
                      Sum("n", alias_name="n_points")))
    return out.to_pandas()


def q_raster_polygonize(sf_dir: str) -> pd.DataFrame:
    """Per component: boundary rings traced raster->vector."""

    def polygonize(g: pd.DataFrame) -> pd.DataFrame:
        rings = rk.trace_rings(g["key"].to_numpy(dtype=np.int64), W)
        return pd.DataFrame({
            "label": [int(g["label"].iloc[0])],
            "n_cells": [len(g)],
            "n_rings": [len(rings)],
            "n_vertices": [int(sum(len(r) for r in rings))],
            "area_cells": [rk.rings_area(rings)],
        })

    return (_labeled_cells(sf_dir)
            .groupby("label")
            .map_groups(polygonize, batch_format="pandas")
            .to_pandas())


# --- oracles ------------------------------------------------------------

_COMPONENTS_SQL = f"""
WITH RECURSIVE cells AS (
  SELECT cell_x, cell_y, CAST(count(*) AS BIGINT) AS n
  FROM ({CELLS_SQL}) GROUP BY cell_x, cell_y
), cellk AS (
  SELECT cell_y * {W} + cell_x AS k, cell_x, cell_y, n FROM cells
), half AS (
  SELECT a.k AS ka, b.k AS kb FROM cellk a JOIN cellk b
    ON b.k = a.k + 1 AND a.cell_x < {W - 1}
  UNION ALL
  SELECT a.k, b.k FROM cellk a JOIN cellk b ON b.k = a.k + {W}
), edges AS (
  SELECT ka, kb FROM half UNION ALL SELECT kb, ka FROM half
), reach AS (
  SELECT k AS cell, k AS anc FROM cellk
  UNION
  SELECT r.cell, e.kb FROM reach r JOIN edges e ON e.ka = r.anc
), lab AS (
  SELECT cell, min(anc) AS label FROM reach GROUP BY cell
)
SELECT label, CAST(count(*) AS BIGINT) AS n_cells,
       CAST(sum(c.n) AS BIGINT) AS n_points
FROM lab JOIN cellk c ON c.k = lab.cell
GROUP BY label
"""

ORACLES = {
    "rasterize": f"""
SELECT cell_x, cell_y, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(val) AS BIGINT) AS sum_val
FROM ({CELLS_SQL}) GROUP BY cell_x, cell_y
""",
    "raster_runs": f"""
WITH cells AS (
  SELECT DISTINCT cell_x, cell_y FROM ({CELLS_SQL})
), g AS (
  SELECT cell_x, cell_y,
         cell_x - row_number() OVER (PARTITION BY cell_y ORDER BY cell_x)
           AS grp
  FROM cells
)
SELECT cell_y, min(cell_x) AS x0, max(cell_x) AS x1,
       CAST(count(*) AS BIGINT) AS len
FROM g GROUP BY cell_y, grp
""",
    "raster_components": _COMPONENTS_SQL,
}
