"""Mergeable cardinality sketch: HyperLogLog (Flajolet et al. 2007,
public algorithm) over Ray Data — the custom-operator pattern for
sketches: per-batch partial REGISTER ARRAYS, merged by elementwise max
(a commutative, idempotent combine), so the shuffle carries one
m-register row per batch regardless of input size.

Hashes reuse the repo-wide md5 digest[8:16] convention, so the sketch
is deterministic across runs/retries. Estimator: the standard HLL
bias-corrected harmonic mean with small-range (linear counting) and
the 64-bit regime needing no large-range correction.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

HLL_P = 12                    # 2^12 = 4096 registers, ~1.6% rel. error
HLL_M = 1 << HLL_P
_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)


def _hash64(values: list[str]) -> np.ndarray:
    return np.array([int.from_bytes(hashlib.md5(v.encode()).digest()[8:16],
                                    "little") for v in values],
                    dtype=np.uint64)


def hll_registers(h: np.ndarray) -> np.ndarray:
    """Register array (uint8, len m) for a batch of 64-bit hashes."""
    reg = np.zeros(HLL_M, dtype=np.uint8)
    if len(h) == 0:
        return reg
    idx = (h >> np.uint64(64 - HLL_P)).astype(np.int64)
    rest = (h << np.uint64(HLL_P)) | np.uint64((1 << HLL_P) - 1)
    # rank = position of the leftmost 1-bit in the remaining 64-P bits
    nlz = np.zeros(len(h), dtype=np.uint8)
    cur = rest.copy()
    mask = np.uint64(1) << np.uint64(63)
    alive = np.ones(len(h), dtype=bool)
    for r in range(64 - HLL_P + 1):
        hit = alive & ((cur & mask) != 0)
        nlz[hit] = r + 1
        alive &= ~hit
        if not alive.any():
            break
        cur = cur << np.uint64(1)
    np.maximum.at(reg, idx, nlz)
    return reg


def hll_estimate(reg: np.ndarray) -> float:
    m = float(HLL_M)
    est = _ALPHA * m * m / np.sum(np.power(2.0, -reg.astype(np.float64)))
    zeros = int((reg == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)      # linear counting, small range
    return float(est)


def q_hll_distinct_urls(sf_dir: str) -> pd.DataFrame:
    """Approximate distinct-URL count over the pages table: per-batch
    register partials (one 4096-byte row per batch), a driver-side
    elementwise-max merge, one estimate. no_oracle (approximate by
    construction) — error bound asserted in tests vs exact."""
    from ..sources.pages import pages_path, rows_for_sf
    pages = pages_path(rows_for_sf(sf_dir))
    ds = ray.data.read_parquet(pages, columns=["url"])

    def partial(b: pa.Table) -> pa.Table:
        reg = hll_registers(_hash64(b.column("url").to_pylist()))
        return pa.table({"reg": pa.array([reg.tobytes()], pa.binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    merged = np.zeros(HLL_M, dtype=np.uint8)
    for blob in parts["reg"]:
        np.maximum(merged, np.frombuffer(blob, dtype=np.uint8), out=merged)
    return pd.DataFrame({"estimate": [round(hll_estimate(merged), 1)]})
