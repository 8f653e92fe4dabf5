"""Distributed grid DBSCAN (ops/dbscan.py): hand-built semantics,
local brute-force parity, and the DuckDB recursive-CTE oracle."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from tilemaker_ray.ops import dbscan as D

SF = "/root/testdata/sf0.001"


def _points(ids, xy):
    t = pa.table({"event_id": pa.array(np.asarray(ids, np.int64)),
                  "lon": pa.array(np.asarray([p[0] for p in xy], np.float64)),
                  "lat": pa.array(np.asarray([p[1] for p in xy], np.float64))})
    return ray.data.from_arrow(t)


def test_dbscan_micro_semantics(ray_session):
    # two core triangles, a border point at EXACTLY eps from one core,
    # and an isolated noise point
    ids = [10, 11, 12, 20, 21, 22, 30, 40]
    xy = [(0.0, 0.0), (0.0, 0.5), (0.0, -0.5),
          (2.5, 0.0), (2.5, 0.5), (2.5, -0.5),
          (1.0, 0.0),          # dist to id 10 is exactly eps (inclusive)
          (5.0, 5.0)]
    out = (D.dbscan_ds(_points(ids, xy), eps=1.0, min_pts=3).to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    got = out.set_index("event_id")
    for i in (10, 11, 12):
        assert got.loc[i, "is_core"] == 1 and got.loc[i, "cluster_id"] == 10
    for i in (20, 21, 22):
        assert got.loc[i, "is_core"] == 1 and got.loc[i, "cluster_id"] == 20
    # boundary d2 == eps² counts as a neighbor: 30 is border of cluster 10
    assert got.loc[30, "is_core"] == 0 and got.loc[30, "cluster_id"] == 10
    assert got.loc[30, "n_nbrs"] == 2
    assert got.loc[40, "cluster_id"] == D._NOISE
    # full-frame parity against the brute-force reference
    ref = D.dbscan_local(np.array(ids, np.int64),
                         np.array([p[0] for p in xy]),
                         np.array([p[1] for p in xy]),
                         eps=1.0, min_pts=3)
    pd.testing.assert_frame_equal(out, ref)


def test_dbscan_border_takes_min_cluster_label(ray_session):
    # a border point within eps of cores from TWO clusters joins the
    # smaller label (the deterministic tie-break the oracle encodes);
    # min_pts=4 keeps the bridge (n_nbrs=3) sub-core
    ids = [10, 11, 12, 13, 20, 21, 22, 23, 30]
    xy = [(0.0, 0.0), (-0.3, 0.5), (-0.3, -0.5), (-0.6, 0.0),
          (2.0, 0.0), (2.3, 0.5), (2.3, -0.5), (2.6, 0.0),
          (1.0, 0.0)]      # exactly eps from cores 10 AND 20 only
    out = (D.dbscan_ds(_points(ids, xy), eps=1.0, min_pts=4).to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    got = out.set_index("event_id")
    assert got.loc[30, "n_nbrs"] == 3
    assert got.loc[30, "is_core"] == 0
    assert got.loc[30, "cluster_id"] == 10       # min(10, 20)
    assert got.loc[20, "is_core"] == 1 and got.loc[20, "cluster_id"] == 20
    ref = D.dbscan_local(np.array(ids, np.int64),
                         np.array([p[0] for p in xy]),
                         np.array([p[1] for p in xy]),
                         eps=1.0, min_pts=4)
    pd.testing.assert_frame_equal(out, ref)


def test_dbscan_bridge_core_merges_clusters(ray_session):
    # n_nbrs == min_pts at the bridge point ⇒ core ⇒ single component
    ids = [10, 11, 12, 20, 21, 22, 30]
    xy = [(0.0, 0.0), (0.0, 0.5), (0.0, -0.5),
          (2.0, 0.0), (2.0, 0.5), (2.0, -0.5),
          (1.0, 0.0)]
    out = (D.dbscan_ds(_points(ids, xy), eps=1.0, min_pts=3).to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    assert set(out["cluster_id"]) == {10}
    assert out["is_core"].all()
    ref = D.dbscan_local(np.array(ids, np.int64),
                         np.array([p[0] for p in xy]),
                         np.array([p[1] for p in xy]),
                         eps=1.0, min_pts=3)
    pd.testing.assert_frame_equal(out, ref)


def test_dbscan_parity_sf0001(ray_session):
    # denser parameters so cores, borders, multi-node clusters and
    # noise ALL occur at the 1k-point scale
    import pyarrow.parquet as pq
    eid = (pq.read_table(f"{SF}/events.parquet", columns=["event_id"])
           ["event_id"].to_numpy().astype(np.int64))
    lon = (eid * 7919 % 360000) / 1000.0 - 180.0
    lat = (eid * 104729 % 17000) / 100.0 - 85.0
    ref = D.dbscan_local(eid, lon, lat, eps=6.0, min_pts=3)
    assert ref["is_core"].sum() > 50
    assert ((ref["is_core"] == 0) & (ref["cluster_id"] >= 0)).sum() > 10
    assert (ref["cluster_id"] == D._NOISE).sum() > 10
    out = D.q_dbscan(SF, eps=6.0, min_pts=3)
    pd.testing.assert_frame_equal(out, ref)


def test_dbscan_hot_cell_skew(ray_session):
    # 4k points crammed into ONE eps-cell (the dense-urban-tile skew
    # case): the home-axis tile loop must keep the per-group distance
    # matrices bounded while staying exact vs brute force
    rng = np.random.default_rng(7)
    n = 4000
    ids = np.arange(n, dtype=np.int64)
    lon = rng.uniform(0.0, 0.9, n)
    lat = rng.uniform(0.0, 0.9, n)
    out = (D.dbscan_ds(_points(ids, np.c_[lon, lat]), eps=1.0,
                       min_pts=3, home_tile=257).to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    ref = D.dbscan_local(ids, lon, lat, eps=1.0, min_pts=3)
    pd.testing.assert_frame_equal(out, ref)
    assert out["is_core"].all() and out["cluster_id"].nunique() == 1


def test_dbscan_oracle_sf0001(ray_session):
    out = D.q_dbscan(SF)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{SF}/events.parquet')")
    D.dbscan_oracle_guard(con)    # ADVICE r4: fail informatively, not OOM
    osql = (con.sql(D.DBSCAN_ORACLE).df()
            .sort_values("event_id").reset_index(drop=True))
    for c in osql.columns:
        osql[c] = osql[c].astype(np.int64)
    pd.testing.assert_frame_equal(
        out, osql[["event_id", "n_nbrs", "is_core", "cluster_id"]])
