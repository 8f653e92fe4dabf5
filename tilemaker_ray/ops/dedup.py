"""Deduplication operators over the documents table — exact dedup,
MinHash+LSH near-dup, SimHash, and n-gram Jaccard verification. These
are the training-data-pipeline extensions; the exact variants carry
DuckDB oracles, the sketch-based ones are deterministic (seeded) and
verified by tests + rows-only driver checks.

Scale notes (100 TB design):
- exact dedup: content-hash in a vectorized map_batches, then
  groupby(hash) keep-first — hash-partitioned, no full-text shuffle
  (only hash + doc_id move).
- minhash: shingle→minhash per batch (stateless, vectorized), explode
  to (band, band_hash) rows, groupby bands → candidate pairs, verify
  Jaccard on the candidates only.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Count, Min

from .text import fnv1a_bytes_vec

NUM_PERM = 64
NUM_BANDS = 16  # 4 rows per band
SHINGLE_K = 3  # word shingles


def q_dedup_exact(sf_dir: str) -> pd.DataFrame:
    """Exact duplicate groups by full text: (representative min doc_id,
    n_dups) for every duplicated text."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def h(b: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": b.column("doc_id"),
            "text": b.column("text"),
        })

    out = (ds.map_batches(h, batch_format="pyarrow")
             .groupby("text")
             .aggregate(Min("doc_id", alias_name="rep_doc_id"),
                        Count(alias_name="n_dups")))
    df = out.to_pandas()
    df = df[df.n_dups > 1][["rep_doc_id", "n_dups"]]
    return df.sort_values("rep_doc_id").reset_index(drop=True)


def q_dedup_keep_first(sf_dir: str) -> pd.DataFrame:
    """Exact dedup keep-first: the surviving doc_ids (min per text
    group) — at scale the groupby key is the 64-bit content hash, so
    only (hash, doc_id) shuffles, not the text."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def h(b: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": b.column("doc_id"),
            "h": pa.array(fnv1a_bytes_vec(b.column("text").to_pandas()).astype(np.int64)),
        })

    out = (ds.map_batches(h, batch_format="pyarrow")
             .groupby("h").aggregate(Min("doc_id", alias_name="doc_id")))
    df = out.to_pandas()[["doc_id"]]
    return df.sort_values("doc_id").reset_index(drop=True)


def _shingles(words: list[str], k: int = SHINGLE_K):
    if len(words) < k:
        return [" ".join(words)] if words else []
    return [" ".join(words[i:i + k]) for i in range(len(words) - k + 1)]


def _minhash_params():
    rng = np.random.default_rng(1234)
    a = rng.integers(1, (1 << 61) - 1, NUM_PERM, dtype=np.uint64) | np.uint64(1)
    b = rng.integers(0, (1 << 61) - 1, NUM_PERM, dtype=np.uint64)
    return a, b


MERSENNE = np.uint64((1 << 61) - 1)


def minhash_signature(text: str, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    sh = _shingles(text.split(" "))
    if not sh:
        return np.zeros(NUM_PERM, dtype=np.uint64)
    hv = np.empty(len(sh), dtype=np.uint64)
    for i, s in enumerate(sh):
        h = 0xCBF29CE484222325
        for ch in s.encode():
            h ^= ch
            h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
        hv[i] = h
    # (a*h + b) mod mersenne prime, min over shingles per permutation
    with np.errstate(over="ignore"):
        prods = (a[:, None] * hv[None, :] + b[:, None]) % MERSENNE
    return prods.min(axis=1)


class MinHasher:
    """Stateful actor: permutation parameters generated once per actor
    (deterministic seed). Emits one row per (doc, band)."""

    def __init__(self):
        self.a, self.b = _minhash_params()
        self.rows_per_band = NUM_PERM // NUM_BANDS

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        texts = batch.column("text").to_pylist()
        doc = []
        band = []
        bh = []
        for i, t in enumerate(texts):
            sig = minhash_signature(t, self.a, self.b)
            for bi in range(NUM_BANDS):
                seg = sig[bi * self.rows_per_band:(bi + 1) * self.rows_per_band]
                h = 0xCBF29CE484222325
                for v in seg:
                    for byt in int(v).to_bytes(8, "little"):
                        h ^= byt
                        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
                doc.append(int(ids[i]))
                band.append(bi)
                bh.append(h & 0x7FFFFFFFFFFFFFFF)
        return pa.table({"doc_id": pa.array(doc, pa.int64()),
                         "band": pa.array(band, pa.int64()),
                         "band_hash": pa.array(bh, pa.int64())})


def jaccard(a: str, b: str, k: int = SHINGLE_K) -> float:
    sa = set(_shingles(a.split(" "), k))
    sb = set(_shingles(b.split(" "), k))
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def q_minhash_pairs(sf_dir: str, threshold: float = 0.5) -> pd.DataFrame:
    """MinHash-LSH near-dup candidate pairs, verified with exact n-gram
    Jaccard >= threshold. Returns (doc_a, doc_b) with doc_a < doc_b.

    Pipeline: minhash (actor pool) → explode bands → groupby
    (band, band_hash) → pairs within buckets → dedup pairs → verify
    with exact Jaccard on the candidate set only (broadcast text
    lookup is fine at candidate scale; at 100 TB the verify is a join
    back to the docs by id)."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    bands = ds.map_batches(MinHasher, batch_format="pyarrow", concurrency=2)

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(g.doc_id.unique())
        out_a = []
        out_b = []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                out_a.append(ids[i])
                out_b.append(ids[j])
        return pd.DataFrame({"doc_a": pd.Series(out_a, dtype="int64"),
                             "doc_b": pd.Series(out_b, dtype="int64")})

    pairs = (bands.groupby(["band", "band_hash"])
                  .map_groups(bucket_pairs, batch_format="pandas"))
    pdf = pairs.to_pandas().drop_duplicates()
    if len(pdf) == 0:
        return pd.DataFrame({"doc_a": pd.Series(dtype="int64"),
                             "doc_b": pd.Series(dtype="int64")})
    texts = pd.read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"]).set_index("doc_id")["text"]
    keep = [jaccard(texts[a], texts[b]) >= threshold
            for a, b in zip(pdf.doc_a, pdf.doc_b)]
    out = pdf[np.asarray(keep, dtype=bool)]
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def simhash64(text: str) -> int:
    """64-bit SimHash over word shingles (FNV word hashes)."""
    acc = np.zeros(64, dtype=np.int64)
    for w in _shingles(text.split(" "), 2):
        h = 0xCBF29CE484222325
        for ch in w.encode():
            h ^= ch
            h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
        bits = np.unpackbits(np.frombuffer(int(h).to_bytes(8, "big"), dtype=np.uint8))
        acc += bits.astype(np.int64) * 2 - 1
    out = np.packbits((acc > 0).astype(np.uint8))
    return int.from_bytes(out.tobytes(), "big")


def q_simhash(sf_dir: str) -> pd.DataFrame:
    """SimHash fingerprints (hex) per doc — rows-only check."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def sh(b: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": b.column("doc_id"),
            "simhash": pa.array([format(simhash64(t), "016x")
                                 for t in b.column("text").to_pylist()], pa.string()),
        })

    return ds.map_batches(sh, batch_format="pyarrow").to_pandas()


ORACLES = {
    "dedup_exact": """
        SELECT min(doc_id) AS rep_doc_id, count(*) AS n_dups
        FROM documents
        GROUP BY text
        HAVING count(*) > 1
        ORDER BY rep_doc_id
    """,
    "dedup_keep_first": """
        SELECT min(doc_id) AS doc_id
        FROM documents
        GROUP BY text
        ORDER BY doc_id
    """,
}
