"""Distributed grid DBSCAN over the derived event points — the
spatial-clustering operator the reference's join family lacks (its
spatial index answers Intersects/CoveredBy/Nearest per feature,
shp_mem_tiles.cpp:21-46; clustering is the natural next query over
the same point layer).

Exact DBSCAN (Ester et al. 1996) with deterministic tie-breaks so the
result is SQL-oracle-able:

- ``n_nbrs``   = |{q : (p.lon-q.lon)² + (p.lat-q.lat)² <= eps²}|,
  INCLUDING p itself (the self-pair makes the SQL degree scan total).
- ``is_core``  = n_nbrs >= min_pts.
- core labels  = min core event_id of the core-graph connected
  component (components via pointer-doubling min-label propagation,
  ops/dedup.py — O(log diameter) shuffle rounds, so the
  high-density giant-component regime stays bounded).
- border (non-core with >= 1 core neighbor) joins the MINIMUM
  cluster label among its core neighbors (plain DBSCAN leaves border
  assignment order-dependent; the min rule makes it a function).
- noise: cluster_id = -1.

Scale shape — the grid-partitioned DBSCAN of the MR-DBSCAN /
RP-DBSCAN family:

- cell = floor(coord/eps): an eps-neighbor always lies within the
  3x3 cell block, so each point ships NINE small copies
  (event_id + 2 floats + flags) and every neighborhood is computed
  locally inside one bucketed map_groups — the shuffle carries the
  replicated id/coord rows, never a distance matrix or candidate
  pair list.
- cells are hash-bucketed into ``NBUCKETS`` groups so map_groups
  amortizes over many cells per group (per-raw-key groups measured
  ~20x slower on the dup-span op — same trade), and the per-cell
  distance matrices tile BOTH axes (2048-home x 8192-candidate
  blocks) so a dense urban cell is bounded memory (runtime skew of a
  hot cell remains — an eps-grid cell cannot be split without
  breaking exactness; the tile loops keep it from OOMing).
- three bucketed exchanges total (core flags; core-core edges —
  core status must be global before edges are certain; border
  labels), plus an id-keyed bucketed hash-join to attach component
  labels and the pointer-doubling rounds.  Everything stays
  Datasets; labels never touch the driver
  (components_pointer_doubling_ds).

The sf0.01 driver oracle is a recursive-CTE DuckDB query over the
same grid (equi-join on 3x3 cell offsets — no cross product), see
DBSCAN_ORACLE; it rides the per-event merged driver row
(__ray_entry__._s2_zorder).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from .geospatial import LAT_SQL, LON_SQL, _event_points

EPS = 1.5          # degrees (planar, like radius_join/knn)
MIN_PTS = 3        # neighbors within eps INCLUDING self
NBUCKETS = 4096
LOCAL_COMPONENTS_MAX = 500_000   # cores below this: driver union-find
LOCAL_EDGES_MAX = 4_000_000      # ... but only if edges fit too
_OFF_BASE = 1 << 31
_CAND_TILE = 8192   # candidate-axis tile width in the cell kernels
_HOME_TILE = 2048
_NOISE = -1
_OFFS9 = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]


def _cell_key(cx: np.ndarray, cy: np.ndarray) -> np.ndarray:
    """Pack (cx, cy) into one int64 key.  Offsets re-base into
    [0, 2^32); out-of-range indices (eps below ~1.7e-4 deg on global
    extents) would silently collide under the OR, so they raise."""
    ax, ay = cx + _OFF_BASE, cy + _OFF_BASE
    if len(ax) and (min(ax.min(), ay.min()) < 0
                    or max(ax.max(), ay.max()) >= (1 << 32)):
        raise ValueError(
            "dbscan cell index exceeds the 32-bit key field — eps too "
            "small for the coordinate extent (cells must fit "
            f"[-{_OFF_BASE}, {(1 << 32) - _OFF_BASE}))")
    # pack in uint64 (ax can exceed 2^31; an int64 shift would wrap
    # mid-expression) and reinterpret the bit pattern as int64
    return ((ax.astype(np.uint64) << np.uint64(32))
            | ay.astype(np.uint64)).view(np.int64)


# the shift-based bucket map below yields [0, NBUCKETS) ONLY for a
# power of two — assert it so an edit can't silently skew bucket ids
# (ADVICE r4)
assert NBUCKETS & (NBUCKETS - 1) == 0, "NBUCKETS must be a power of two"


def _bucket(cell: np.ndarray) -> np.ndarray:
    h = cell.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    return (h >> np.uint64(64 - NBUCKETS.bit_length() + 1)).astype(np.int64)


def _replicate(b: pa.Table, eps: float, offsets, home: np.ndarray,
               carry: tuple[str, ...] = ()) -> pa.Table:
    """One row per (point, offset cell): (bucket, cell, home flag,
    event_id, lon, lat, *carry).  `home` is the per-offset flag row
    (uint8, len(offsets)) — phase 4 forces it to 0 on the candidate
    side so labeled cores are neighbors, never queries."""
    lon = b.column("lon").to_numpy()
    lat = b.column("lat").to_numpy()
    cx = np.floor(lon / eps).astype(np.int64)
    cy = np.floor(lat / eps).astype(np.int64)
    offs = np.asarray(offsets, np.int64)
    k, m = len(offs), len(lon)
    gx = (cx[:, None] + offs[None, :, 0]).ravel()
    gy = (cy[:, None] + offs[None, :, 1]).ravel()
    cell = _cell_key(gx, gy)
    cols = {
        "bucket": pa.array(_bucket(cell)),
        "cell": pa.array(cell),
        "home": pa.array(np.tile(home, m)),
        "event_id": pa.array(np.repeat(
            b.column("event_id").to_numpy().astype(np.int64), k)),
        "lon": pa.array(np.repeat(lon, k)),
        "lat": pa.array(np.repeat(lat, k)),
    }
    for c in carry:
        cols[c] = pa.array(np.repeat(b.column(c).to_numpy(), k))
    return pa.table(cols)


def _segments(g: pd.DataFrame):
    """Yield per-cell (home mask, lon, lat, event_id, frame slice)
    views of a bucket group, via one argsort — no pandas groupby."""
    cell = g["cell"].to_numpy()
    order = np.argsort(cell, kind="stable")
    starts = np.flatnonzero(np.r_[True, cell[order][1:] != cell[order][:-1]])
    bounds = np.r_[starts, len(order)]
    for i in range(len(starts)):
        yield order[bounds[i]:bounds[i + 1]]


def _make_core_kernel(eps: float, tile: int = _HOME_TILE):
    e2 = eps * eps

    def kernel(g: pd.DataFrame) -> pa.Table:
        lon = g["lon"].to_numpy()
        lat = g["lat"].to_numpy()
        eid = g["event_id"].to_numpy().astype(np.int64)
        home = g["home"].to_numpy().astype(bool)
        oid, onn, olon, olat = [], [], [], []
        for seg in _segments(g):
            hm = seg[home[seg]]
            if not len(hm):
                continue
            lo, la = lon[seg], lat[seg]
            hlo, hla = lon[hm], lat[hm]
            nn = np.zeros(len(hm), np.int64)
            for h0 in range(0, len(hm), tile):
                sl = slice(h0, h0 + tile)
                # tile BOTH axes: a hot cell must bound the distance
                # matrix at tile x _CAND_TILE, not tile x cell size
                for c0 in range(0, len(lo), _CAND_TILE):
                    cs = slice(c0, c0 + _CAND_TILE)
                    d2 = ((hlo[sl, None] - lo[None, cs]) ** 2
                          + (hla[sl, None] - la[None, cs]) ** 2)
                    nn[sl] += (d2 <= e2).sum(1)
            oid.append(eid[hm])
            onn.append(nn)
            olon.append(hlo)
            olat.append(hla)
        cat = (lambda xs, dt: np.concatenate(xs) if xs
               else np.empty(0, dt))
        return pa.table({
            "event_id": pa.array(cat(oid, np.int64)),
            "lon": pa.array(cat(olon, np.float64)),
            "lat": pa.array(cat(olat, np.float64)),
            "n_nbrs": pa.array(cat(onn, np.int64)),
        })

    return kernel


def _make_edge_kernel(eps: float, tile: int = _HOME_TILE):
    """Core-core edges: within a cell, each HOME core pairs with every
    core copy of larger event_id within eps — each unordered pair is
    emitted exactly once (in the smaller endpoint's home cell)."""
    e2 = eps * eps

    def kernel(g: pd.DataFrame) -> pa.Table:
        lon = g["lon"].to_numpy()
        lat = g["lat"].to_numpy()
        eid = g["event_id"].to_numpy().astype(np.int64)
        home = g["home"].to_numpy().astype(bool)
        oa, ob = [], []
        for seg in _segments(g):
            hm = seg[home[seg]]
            if not len(hm):
                continue
            lo, la, ids = lon[seg], lat[seg], eid[seg]
            hlo, hla, hid = lon[hm], lat[hm], eid[hm]
            for h0 in range(0, len(hm), tile):
                sl = slice(h0, h0 + tile)
                for c0 in range(0, len(lo), _CAND_TILE):
                    cs = slice(c0, c0 + _CAND_TILE)
                    d2 = ((hlo[sl, None] - lo[None, cs]) ** 2
                          + (hla[sl, None] - la[None, cs]) ** 2)
                    ai, bi = np.nonzero(
                        (d2 <= e2) & (hid[sl, None] < ids[None, cs]))
                    oa.append(hid[sl][ai])
                    ob.append(ids[cs][bi])
        cat = (lambda xs: np.concatenate(xs) if xs
               else np.empty(0, np.int64))
        return pa.table({"doc_a": pa.array(cat(oa)),
                         "doc_b": pa.array(cat(ob))})

    return kernel


def _make_border_kernel(eps: float, tile: int = _HOME_TILE):
    """Per cell: each HOME (non-core) point takes the minimum cluster
    label among labeled-core copies within eps, else NOISE."""
    e2 = eps * eps

    def kernel(g: pd.DataFrame) -> pa.Table:
        lon = g["lon"].to_numpy()
        lat = g["lat"].to_numpy()
        eid = g["event_id"].to_numpy().astype(np.int64)
        home = g["home"].to_numpy().astype(bool)
        lab = g["label"].to_numpy().astype(np.int64)
        nn = g["n_nbrs"].to_numpy().astype(np.int64)
        oid, onn, olab = [], [], []
        for seg in _segments(g):
            hm = seg[home[seg]]
            if not len(hm):
                continue
            cand = seg[~home[seg]]
            if len(cand):
                lo, la, cl = lon[cand], lat[cand], lab[cand]
                hlo, hla = lon[hm], lat[hm]
                imax = np.iinfo(np.int64).max
                best = np.full(len(hm), imax, np.int64)
                for h0 in range(0, len(hm), tile):
                    sl = slice(h0, h0 + tile)
                    for c0 in range(0, len(lo), _CAND_TILE):
                        cs = slice(c0, c0 + _CAND_TILE)
                        d2 = ((hlo[sl, None] - lo[None, cs]) ** 2
                              + (hla[sl, None] - la[None, cs]) ** 2)
                        near = np.where(d2 <= e2, cl[None, cs], imax)
                        best[sl] = np.minimum(best[sl], near.min(1))
                best[best == imax] = _NOISE
            else:
                best = np.full(len(hm), _NOISE, np.int64)
            oid.append(eid[hm])
            onn.append(nn[hm])
            olab.append(best)
        cat = (lambda xs: np.concatenate(xs) if xs
               else np.empty(0, np.int64))
        return pa.table({"event_id": pa.array(cat(oid)),
                         "n_nbrs": pa.array(cat(onn)),
                         "is_core": pa.array(
                             np.zeros(sum(map(len, oid)), np.int64)),
                         "cluster_id": pa.array(cat(olab))})

    return kernel


def _join_labels(g: pd.DataFrame) -> pa.Table:
    """Bucketed hash join (id-grain): kind-0 rows are core points
    (event_id, lon, lat, n_nbrs), kind-1 rows their component labels —
    one pd.merge per ~(n/NBUCKETS)-row bucket, never per id."""
    a = g.loc[g["kind"] == 0, ["event_id", "lon", "lat", "n_nbrs"]]
    b = g.loc[g["kind"] == 1, ["event_id", "label"]]
    m = a.merge(b, on="event_id")
    if len(m) != len(a):
        raise ValueError("dbscan: core point missing a component label")
    return pa.table({
        "event_id": pa.array(m["event_id"].to_numpy(np.int64)),
        "lon": pa.array(m["lon"].to_numpy(np.float64)),
        "lat": pa.array(m["lat"].to_numpy(np.float64)),
        "n_nbrs": pa.array(m["n_nbrs"].to_numpy(np.int64)),
        "label": pa.array(m["label"].to_numpy(np.int64)),
    })


def _components_local(ids: pd.DataFrame, ed: pd.DataFrame) -> pd.DataFrame:
    """Driver union-find over ≤ LOCAL_COMPONENTS_MAX core ids —
    (doc_id, label) with label = min event_id of the component."""
    eid = ids["event_id"].to_numpy(np.int64)
    order = np.argsort(eid, kind="stable")
    eid = eid[order]
    idx = pd.Series(np.arange(len(eid)), index=eid)
    parent = np.arange(len(eid))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    # eid is sorted, so the smaller INDEX is the smaller event_id and
    # rooting unions at min index keeps labels = min event_id
    for a, b in zip(idx.loc[ed["doc_a"].to_numpy(np.int64)].to_numpy(),
                    idx.loc[ed["doc_b"].to_numpy(np.int64)].to_numpy()):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    label = eid[np.fromiter((find(int(i)) for i in range(len(eid))),
                            np.int64, len(eid))]
    return pd.DataFrame({"doc_id": eid, "label": label})


def dbscan_ds(points: ray.data.Dataset, eps: float = EPS,
              min_pts: int = MIN_PTS,
              home_tile: int = _HOME_TILE) -> ray.data.Dataset:
    """(event_id, lon, lat) Dataset → (event_id, n_nbrs, is_core,
    cluster_id) Dataset under exact grid DBSCAN (module docstring)."""
    from .dedup import components_pointer_doubling_ds

    home9 = np.array([1 if o == (0, 0) else 0 for o in _OFFS9], np.uint8)

    # phase 1: neighbor counts (each home cell sees its full 3x3 block)
    rep = points.map_batches(
        lambda b: _replicate(b, eps, _OFFS9, home9),
        batch_format="pyarrow")
    flags = (rep.groupby("bucket")
                .map_groups(_make_core_kernel(eps, home_tile),
                            batch_format="pandas")
                .materialize())
    # cores feeds three downstream stages — materialize once
    cores = flags.filter(expr=f"n_nbrs >= {min_pts}").materialize()

    # phase 2: core-core edges (needs global core flags, hence a
    # second exchange over the core subset only)
    crep = cores.map_batches(
        lambda b: _replicate(b, eps, _OFFS9, home9),
        batch_format="pyarrow")
    edges = (crep.groupby("bucket")
                 .map_groups(_make_edge_kernel(eps, home_tile),
                             batch_format="pandas")
                 .materialize())

    def all_noise(b: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": b.column("event_id"),
            "n_nbrs": b.column("n_nbrs"),
            "is_core": pa.array(np.zeros(b.num_rows, np.int64)),
            "cluster_id": pa.array(np.full(b.num_rows, _NOISE, np.int64)),
        })

    # phase 3: component min-labels.  Size-adaptive like the minhash
    # bucketing (ops/dedup.py): below the threshold a driver-local
    # union-find beats ~20 Ray exchanges of sub-ms work (measured 53 s
    # of pure scheduling at 3.7k cores); above it, pointer-doubling
    # keeps everything distributed in O(log diameter) rounds.
    n_core = cores.count()
    if n_core == 0:
        # no cores ⇒ no clusters, no borders: everything is noise
        return flags.map_batches(all_noise, batch_format="pyarrow")
    # the local path's driver pull and union-find loop scale with the
    # EDGE count, which dense regimes inflate far past the core count
    # — both must be bounded before collecting
    if n_core <= LOCAL_COMPONENTS_MAX and edges.count() <= LOCAL_EDGES_MAX:
        labels = ray.data.from_pandas(_components_local(
            cores.select_columns(["event_id"]).to_pandas(),
            edges.to_pandas()))
    else:
        core_ids = cores.map_batches(
            lambda b: pa.table({"doc_id": b.column("event_id")}),
            batch_format="pyarrow")
        labels, _ = components_pointer_doubling_ds(core_ids, edges)

    # phase 4a: attach labels to core coords (bucketed id hash join)
    def tag_core(b: pa.Table) -> pa.Table:
        eid = b.column("event_id").to_numpy().astype(np.int64)
        return pa.table({
            "jb": pa.array(eid % NBUCKETS), "kind": pa.array(
                np.zeros(len(eid), np.uint8)),
            "event_id": pa.array(eid),
            "lon": b.column("lon"), "lat": b.column("lat"),
            "n_nbrs": b.column("n_nbrs"),
            "label": pa.array(np.zeros(len(eid), np.int64)),
        })

    def tag_label(b: pa.Table) -> pa.Table:
        eid = b.column("doc_id").to_numpy().astype(np.int64)
        z = np.zeros(len(eid), np.float64)
        return pa.table({
            "jb": pa.array(eid % NBUCKETS), "kind": pa.array(
                np.ones(len(eid), np.uint8)),
            "event_id": pa.array(eid),
            "lon": pa.array(z), "lat": pa.array(z),
            "n_nbrs": pa.array(np.zeros(len(eid), np.int64)),
            "label": b.column("label").cast(pa.int64()),
        })

    labeled = (cores.map_batches(tag_core, batch_format="pyarrow")
               .union(labels.map_batches(tag_label, batch_format="pyarrow"))
               .groupby("jb").map_groups(_join_labels,
                                         batch_format="pandas")
               .materialize())

    core_out = labeled.map_batches(
        lambda b: pa.table({
            "event_id": b.column("event_id"),
            "n_nbrs": b.column("n_nbrs"),
            "is_core": pa.array(np.ones(b.num_rows, np.int64)),
            "cluster_id": b.column("label"),
        }), batch_format="pyarrow")

    # phase 4b: border assignment — labeled cores as 3x3 candidates,
    # non-core points as home-cell queries
    if flags.count() == n_core:          # every point is core
        return core_out
    noncore = flags.filter(expr=f"n_nbrs < {min_pts}")
    zero_home = np.zeros(9, np.uint8)
    cand = labeled.map_batches(
        lambda b: _replicate(b, eps, _OFFS9, zero_home, carry=("label",)),
        batch_format="pyarrow")

    COLS = ["bucket", "cell", "home", "event_id", "lon", "lat",
            "n_nbrs", "label"]

    def query_rows(b: pa.Table) -> pa.Table:
        t = _replicate(b, eps, [(0, 0)], np.array([1], np.uint8),
                       carry=("n_nbrs",))
        return t.append_column(
            "label", pa.array(np.zeros(t.num_rows, np.int64))
        ).select(COLS)

    def cand_rows(b: pa.Table) -> pa.Table:
        return b.append_column(
            "n_nbrs", pa.array(np.zeros(b.num_rows, np.int64))
        ).select(COLS)

    border_out = (noncore.map_batches(query_rows, batch_format="pyarrow")
                  .union(cand.map_batches(cand_rows,
                                          batch_format="pyarrow"))
                  .groupby("bucket")
                  .map_groups(_make_border_kernel(eps, home_tile),
                              batch_format="pandas"))
    return core_out.union(border_out)


def q_dbscan(sf_dir: str, eps: float = EPS,
             min_pts: int = MIN_PTS) -> pd.DataFrame:
    """(event_id, n_nbrs, is_core, cluster_id) for every event point."""
    out = dbscan_ds(_event_points(sf_dir), eps, min_pts).to_pandas()
    for c in ("event_id", "n_nbrs", "is_core", "cluster_id"):
        out[c] = out[c].astype(np.int64)
    return (out[["event_id", "n_nbrs", "is_core", "cluster_id"]]
            .sort_values("event_id").reset_index(drop=True))


def dbscan_local(eid: np.ndarray, lon: np.ndarray, lat: np.ndarray,
                 eps: float = EPS, min_pts: int = MIN_PTS) -> pd.DataFrame:
    """Single-process brute-force reference with the identical
    deterministic semantics — the parity gate for the distributed op
    (tests/test_dbscan.py)."""
    e2 = eps * eps
    n = len(eid)
    nn = np.empty(n, np.int64)
    near = []
    for i0 in range(0, n, 1024):
        sl = slice(i0, i0 + 1024)
        d2 = ((lon[sl, None] - lon[None, :]) ** 2
              + (lat[sl, None] - lat[None, :]) ** 2)
        m = d2 <= e2
        nn[sl] = m.sum(1)
        near.append(m)
    near = np.vstack(near)
    core = nn >= min_pts
    order = np.argsort(eid, kind="stable")
    parent = np.arange(n)

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    ci = np.flatnonzero(core)
    for a in ci:
        for b in ci[near[a, ci] & (eid[ci] > eid[a])]:
            ra, rb = find(a), find(b)
            if ra != rb:
                lo, hi = ((ra, rb) if eid[ra] < eid[rb] else (rb, ra))
                parent[hi] = lo
    cluster = np.full(n, _NOISE, np.int64)
    for a in ci:
        cluster[a] = eid[find(a)]
    for a in np.flatnonzero(~core):
        cn = ci[near[a, ci]]
        if len(cn):
            cluster[a] = cluster[cn].min()
    df = pd.DataFrame({"event_id": eid.astype(np.int64),
                       "n_nbrs": nn, "is_core": core.astype(np.int64),
                       "cluster_id": cluster})
    return df.iloc[order].reset_index(drop=True)


# Recursive-CTE oracle over the same eps-grid: the 3x3 neighborhood is
# an EQUI-join on offset cells (no cross product), the component
# closure is reach-set min per node (components are small at the
# oracle's subcritical sf0.01 density — verified ≤ 4 nodes), border
# labels are min over core neighbors, noise is -1.
def dbscan_oracle_guard(con) -> None:
    """Feasibility pre-check for DBSCAN_ORACLE (ADVICE r4): the reach
    CTE materializes full per-node reach sets — O(Σ component²) rows —
    which is fine at the observed subcritical sf densities but would
    blow up rather than fail informatively on a dense fixture.  This
    bounds the blow-up with two cheap aggregates (core-edge count and
    the max single-cell population) BEFORE the recursive CTE runs:
    Σ component² ≤ (Σ degree)² in the worst case, so cap the edge
    count; a hot cell is the usual density driver, so cap that too.
    `con` must already expose the `events` view."""
    stats = con.sql(f"""
        WITH pts AS (
          SELECT event_id, {LON_SQL} AS lon, {LAT_SQL} AS lat FROM events
        ), c AS (
          SELECT CAST(floor(lon/{EPS}) AS BIGINT) AS cx,
                 CAST(floor(lat/{EPS}) AS BIGINT) AS cy
          FROM pts
        )
        SELECT sum(cnt) AS n_rows,
               max(cnt) AS max_cell
        FROM (SELECT cx, cy, count(*) AS cnt FROM c GROUP BY cx, cy)
    """).fetchone()
    n_rows, max_cell = int(stats[0] or 0), int(stats[1] or 0)
    # every point pairs with at most the population of its 3x3 cell
    # neighborhood <= 9*max_cell, so 9*max_cell*n_rows bounds the nbr
    # CTE across ALL cells (not just the hottest — review r5); the
    # reach CTE is bounded by the same quantity per component hop.
    # 1e9 candidate pairs is where DuckDB turns from slow to hopeless.
    est_pairs = 9 * max_cell * n_rows
    if est_pairs > 1_000_000_000:
        raise RuntimeError(
            f"DBSCAN_ORACLE infeasible on this fixture: ~{est_pairs} "
            f"worst-case neighbor pairs ({n_rows} rows, hottest cell "
            f"{max_cell}); shrink EPS or the fixture instead of "
            f"letting the recursive reach CTE blow up")


DBSCAN_ORACLE = f"""
    WITH RECURSIVE pts AS (
      SELECT event_id, {LON_SQL} AS lon, {LAT_SQL} AS lat FROM events
    ), c AS (
      SELECT event_id, lon, lat,
             CAST(floor(lon/{EPS}) AS BIGINT) AS cx,
             CAST(floor(lat/{EPS}) AS BIGINT) AS cy
      FROM pts
    ), offs AS (
      SELECT dx - 1 AS dx, dy - 1 AS dy
      FROM range(3) t1(dx), range(3) t2(dy)
    ), nbr AS (
      SELECT a.event_id AS ea, b.event_id AS eb
      FROM c a CROSS JOIN offs o
      JOIN c b ON b.cx = a.cx + o.dx AND b.cy = a.cy + o.dy
      WHERE (a.lon-b.lon)*(a.lon-b.lon) + (a.lat-b.lat)*(a.lat-b.lat)
            <= {EPS}*{EPS}
    ), deg AS (
      SELECT ea AS event_id, count(*) AS n_nbrs FROM nbr GROUP BY ea
    ), core AS (
      SELECT event_id FROM deg WHERE n_nbrs >= {MIN_PTS}
    ), e AS (
      SELECT n.ea AS a, n.eb AS b FROM nbr n
      JOIN core x ON x.event_id = n.ea
      JOIN core y ON y.event_id = n.eb
      WHERE n.ea <> n.eb
    ), reach(node, r) AS (
      SELECT event_id, event_id FROM core
      UNION
      SELECT reach.node, e.b FROM reach JOIN e ON e.a = reach.r
    ), lab AS (
      SELECT node AS event_id, min(r) AS cluster_id
      FROM reach GROUP BY node
    ), bord AS (
      SELECT n.ea AS event_id, min(l.cluster_id) AS cluster_id
      FROM nbr n JOIN lab l ON l.event_id = n.eb
      WHERE n.ea NOT IN (SELECT event_id FROM core)
      GROUP BY n.ea
    )
    SELECT d.event_id, d.n_nbrs,
           CAST(CASE WHEN l.cluster_id IS NOT NULL
                THEN 1 ELSE 0 END AS BIGINT) AS is_core,
           coalesce(l.cluster_id, bord.cluster_id, -1) AS cluster_id
    FROM deg d
    LEFT JOIN lab l ON l.event_id = d.event_id
    LEFT JOIN bord ON bord.event_id = d.event_id
"""
