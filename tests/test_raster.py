"""geom/raster kernels + ops/raster distributed queries.

Kernel tests are pure numpy (no Ray); the query tests ride the
session-scoped Ray fixture and cross-check the distributed CCL against
a single-process BFS reference.
"""

import collections

import numpy as np
import pandas as pd
import pytest

from tilemaker_ray.geom import raster as rk

SF = "/root/testdata/sf0.001"
W = 40


def mask_keys(rows, w=W):
    """Cell keys from an ASCII mask (row 0 = y 0), '#' = filled."""
    out = []
    for y, line in enumerate(rows):
        for x, ch in enumerate(line):
            if ch == "#":
                out.append(y * w + x)
    return np.array(sorted(out), dtype=np.int64)


def bfs_components(keys, w=W):
    """Reference labeling: per-cell min component key via BFS."""
    s = set(keys.tolist())
    label = {}
    for start in sorted(s):
        if start in label:
            continue
        comp = [start]
        seen = {start}
        q = collections.deque([start])
        while q:
            c = q.popleft()
            x, y = c % w, c // w
            for nx, ny in ((x + 1, y), (x - 1, y), (x, y + 1), (x, y - 1)):
                n = ny * w + nx
                if 0 <= nx < w and n in s and n not in seen:
                    seen.add(n)
                    q.append(n)
                    comp.append(n)
        m = min(comp)
        for c in comp:
            label[c] = m
    return np.array([label[k] for k in keys.tolist()], dtype=np.int64)


MASKS = {
    "two_blobs": ["##..#", "##..#", ".....", "###.."],
    "snake": ["#####", "....#", "#####", "#....", "#####"],
    "diag_touch": ["#.", ".#"],
    "ring_hole": ["#####", "#...#", "#.#.#", "#...#", "#####"],
    "single": ["#"],
}


@pytest.mark.parametrize("name", sorted(MASKS))
def test_label_components_vs_bfs(name):
    keys = mask_keys(MASKS[name])
    assert np.array_equal(rk.label_components(keys, W), bfs_components(keys))


def test_label_components_random():
    rng = np.random.default_rng(7)
    for _ in range(10):
        mask = rng.random((30, W)) < 0.45
        keys = np.flatnonzero(mask.reshape(-1)).astype(np.int64)
        assert np.array_equal(rk.label_components(keys, W),
                              bfs_components(keys))


def test_label_components_empty():
    keys = np.empty(0, dtype=np.int64)
    assert len(rk.label_components(keys, W)) == 0


@pytest.mark.parametrize("name", sorted(MASKS))
def test_trace_fill_round_trip(name):
    keys = mask_keys(MASKS[name])
    # trace/fill are per-component ops; round-trip each component
    labels = rk.label_components(keys, W)
    got = []
    for lab in np.unique(labels):
        comp = keys[labels == lab]
        rings = rk.trace_rings(comp, W)
        assert rk.rings_area(rings) == pytest.approx(len(comp))
        got.append(rk.fill_rings(rings, W))
    assert np.array_equal(np.unique(np.concatenate(got)), keys)


def test_trace_fill_round_trip_random():
    rng = np.random.default_rng(11)
    for _ in range(5):
        mask = rng.random((20, W)) < 0.5
        keys = np.flatnonzero(mask.reshape(-1)).astype(np.int64)
        labels = rk.label_components(keys, W)
        for lab in np.unique(labels)[:20]:
            comp = keys[labels == lab]
            rings = rk.trace_rings(comp, W)
            assert rk.rings_area(rings) == pytest.approx(len(comp))
            assert np.array_equal(rk.fill_rings(rings, W), comp)


def test_ring_hole_topology():
    # 16-cell ring with a hole, plus a 1-cell island inside the hole:
    # outer CCW + hole CW + island CCW
    rings = rk.trace_rings(mask_keys(MASKS["ring_hole"]), W)
    signs = sorted(np.sign(rk.rings_area([r])) for r in rings)
    assert signs == [-1.0, 1.0, 1.0]
    assert rk.rings_area(rings) == pytest.approx(17)


def test_points_to_cells_bounds():
    lon = np.array([-180.0, 0.0, 179.999])
    lat = np.array([-85.0, 0.0, 84.99])
    cx, cy = rk.points_to_cells(lon, lat, 216, 108)
    assert cx.tolist() == [0, 108, 215]
    assert cy.tolist() == [0, 54, 107]


# --- distributed queries (Ray session fixture) --------------------------

def _ref_components(sf_dir):
    """Single-process reference for the full query at sf_dir."""
    import pyarrow.parquet as pq
    from tilemaker_ray.ops.raster import VAL_MOD, W as GW, H as GH
    eid = pq.read_table(f"{sf_dir}/events.parquet",
                        columns=["event_id"]).column("event_id").to_numpy()
    lon = (eid * 7919 % 360000) / 1000.0 - 180.0
    lat = (eid * 104729 % 17000) / 100.0 - 85.0
    cx, cy = rk.points_to_cells(lon, lat, GW, GH)
    key = cy * GW + cx
    uniq, inv, counts = np.unique(key, return_inverse=True,
                                  return_counts=True)
    labels = bfs_components(uniq, GW)
    df = pd.DataFrame({"label": labels, "n_cells": 1, "n_points": counts})
    return (df.groupby("label", as_index=False)
              .agg(n_cells=("n_cells", "sum"), n_points=("n_points", "sum")))


def test_raster_components_query(ray_session):
    from tilemaker_ray.ops.raster import q_raster_components
    got = (q_raster_components(SF).sort_values("label")
           .reset_index(drop=True)[["label", "n_cells", "n_points"]])
    exp = _ref_components(SF).sort_values("label").reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype(np.int64), exp.astype(np.int64))


def test_raster_polygonize_query(ray_session):
    from tilemaker_ray.ops.raster import q_raster_polygonize
    got = q_raster_polygonize(SF)
    exp = _ref_components(SF)
    assert len(got) == len(exp)
    # shoelace area of the traced rings must equal the cell count
    assert np.allclose(got["area_cells"], got["n_cells"])
    merged = got.merge(exp, on="label")
    assert len(merged) == len(exp)
    assert (merged["n_cells_x"] == merged["n_cells_y"]).all()
    assert (got["n_rings"] >= 1).all()
