"""ops/hex axial binning kernels + the two distributed queries."""

import numpy as np
import pandas as pd

from tilemaker_ray.ops.hex import (KRING1, axial_from_xy, hex_center,
                                   q_hex_bin, q_hex_kring)

SF = "/root/testdata/sf0.001"


def test_axial_round_nearest_center():
    """Cube rounding must pick the hex whose center is nearest (the
    defining property of fractional-hex rounding)."""
    rng = np.random.default_rng(3)
    x = rng.uniform(-180, 180, 2000)
    y = rng.uniform(-85, 85, 2000)
    q, r = axial_from_xy(x, y)
    cx, cy = hex_center(q, r)
    d_own = np.hypot(x - cx, y - cy)
    for dq, dr in KRING1[1:]:
        nx, ny = hex_center(q + dq, r + dr)
        d_nbr = np.hypot(x - nx, y - ny)
        assert (d_own <= d_nbr + 1e-9).all()


def test_axial_centers_fixed_points():
    """A hex center must round back to its own (q, r)."""
    q0, r0 = np.meshgrid(np.arange(-20, 21, 5), np.arange(-15, 16, 5))
    q0 = q0.reshape(-1)
    r0 = r0.reshape(-1)
    cx, cy = hex_center(q0, r0)
    q, r = axial_from_xy(cx, cy)
    assert np.array_equal(q, q0)
    assert np.array_equal(r, r0)


def test_hex_bin_total(ray_session):
    import pyarrow.parquet as pq
    n_events = pq.read_metadata(f"{SF}/events.parquet").num_rows
    df = q_hex_bin(SF)
    assert df["n"].sum() == n_events
    assert not df.duplicated(subset=["hex_q", "hex_r"]).any()


def test_hex_kring_vs_pandas(ray_session):
    got = (q_hex_kring(SF).sort_values(["hex_q", "hex_r"])
           .reset_index(drop=True))
    binned = q_hex_bin(SF)
    cnt = {(int(q), int(r)): int(n)
           for q, r, n in binned.itertuples(index=False)}
    exp = pd.DataFrame({
        "hex_q": binned["hex_q"],
        "hex_r": binned["hex_r"],
        "n": binned["n"],
        "ring_n": [sum(cnt.get((int(q) + dq, int(r) + dr), 0)
                       for dq, dr in KRING1)
                   for q, r in zip(binned["hex_q"], binned["hex_r"])],
    }).sort_values(["hex_q", "hex_r"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype(np.int64), exp.astype(np.int64))
