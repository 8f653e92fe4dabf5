"""SemDeDup — semantic deduplication via embedding clustering (Abbas
et al. 2023, "SemDeDup: Data-efficient learning at web-scale through
semantic deduplication").

The published pipeline: k-means-cluster the corpus embeddings, then
within each cluster drop every document whose cosine similarity to an
already-kept cluster member is >= threshold (the paper's 1 - eps),
keeping one exemplar per epsilon-ball.  Exemplar choice differs across
published implementations (lowest-centroid-sim, random, first); we use
GREEDY BY ASCENDING vec_id — deterministic, retry-stable, and the same
keep-first convention the exact-dedup ops in this repo use.

Distributed shape (the 100 TB story):
- centroids: bounded-sample sqrt(n) k-means (`_centroids` — <= 32k
  rows ever reach the driver) broadcast once via ray.put; each point
  is assigned to its SINGLE nearest centroid in map_batches (the paper
  assigns one cluster per point — no multi-probe here, by design).
- the shuffle carries (bucket:int64, vec_id:int64) rows ONLY — never
  an embedding vector, never text (same id-only exchange as the IVF
  dup path, ops/similarity.py:515).
- per-cluster work runs in groupby(bucket).map_groups: member
  embeddings are gathered from the plasma shard store in <= BUCKET_TILE
  id tiles.  The greedy scan holds the KEPT-so-far matrix resident —
  O(kept x dim) per cluster, with cluster size ~ sqrt(n) expected
  (k ∝ sqrt(n)); a pathological all-unique hot cluster degrades to
  O(cluster x dim) memory, which the tile cap keeps to one cluster per
  task, not one corpus.
- output is one (vec_id, kept, exemplar_id) row per vector: dropped
  rows name the kept member that absorbed them, so downstream stages
  can either filter (kept) or remap references (exemplar_id).

Approximate by construction (cross-cluster near-dups are invisible —
the paper's own trade-off), so the driver entry is rows-only; tests
assert exact parity against a single-process reference run with the
same centroids, plus the within-cluster greedy invariants.

Reference scope note: cldellow/tilemaker has no embedding path; this
op belongs to the LLM-training-data half of the brief (dedup family,
next to ops/dedup.py minhash/simhash and ops/similarity.py cosine).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from .similarity import (
    BUCKET_TILE,
    DUP_THRESHOLD,
    _centroids,
    _embedding_shards,
    _gather_embeddings,
    _mat_from_emb,
    _table_rows,
)


def _assign_single(b: pa.Table, cent: np.ndarray) -> pa.Table:
    """One (bucket, vec_id) row per vector — nearest centroid only."""
    ids = b.column("vec_id").to_numpy().astype(np.int64)
    en = _mat_from_emb(b.column("emb"))
    bucket = np.argmax(en @ cent.T, axis=1).astype(np.int64)
    return pa.table({"bucket": pa.array(bucket), "vec_id": pa.array(ids)})


def greedy_keep(ids: np.ndarray, mat: np.ndarray,
                threshold: float) -> pd.DataFrame:
    """Sequential greedy epsilon-ball dedup over ONE cluster's members
    (ids ascending, rows of `mat` aligned and L2-normalized).

    Row i is dropped iff some KEPT j < i has cos(i, j) >= threshold;
    its exemplar is the smallest such j.  The loop is per-row by
    necessity (each decision depends on the previous keeps) but every
    step is a vectorized slice of the precomputed-per-tile similarity
    block, NMS-style.
    """
    n = len(ids)
    kept = np.zeros(n, bool)
    exemplar = ids.copy()
    kept_rows: list[int] = []
    # tile the sim computation so a huge cluster never materializes an
    # n x n matrix — only n_tile x kept.
    for t0 in range(0, n, BUCKET_TILE):
        t1 = min(t0 + BUCKET_TILE, n)
        sims_prev = (mat[t0:t1] @ mat[kept_rows].T
                     if kept_rows else np.empty((t1 - t0, 0)))
        sims_self = mat[t0:t1] @ mat[t0:t1].T
        tile_kept = np.zeros(t1 - t0, bool)
        for i in range(t0, t1):
            r = i - t0
            # earlier-tile keeps all precede in-tile keeps in id order,
            # so checking them first yields the smallest hitting exemplar
            hit = np.flatnonzero(sims_prev[r] >= threshold)
            if hit.size:
                exemplar[i] = ids[kept_rows[int(hit[0])]]
                continue
            hs = np.flatnonzero((sims_self[r, :r] >= threshold)
                                & tile_kept[:r])
            if hs.size:
                exemplar[i] = ids[t0 + int(hs[0])]
                continue
            kept[i] = True
            tile_kept[r] = True
            kept_rows.append(i)
    return pd.DataFrame({"vec_id": ids, "kept": kept, "exemplar": exemplar})


def _cluster_dedup_fn(refs, ranges, threshold):
    def cluster_dedup(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.unique(g["vec_id"].to_numpy())  # sorted unique
        mats, got = [], []
        for i in range(0, len(ids), BUCKET_TILE):
            gi, gm = _gather_embeddings(ids[i:i + BUCKET_TILE], refs, ranges)
            got.append(gi)
            mats.append(gm)
        gids = np.concatenate(got) if got else np.empty(0, np.int64)
        mat = np.concatenate(mats) if mats else np.empty((0, 1))
        return greedy_keep(gids, mat, threshold)

    return cluster_dedup


def semdedup_ds(sf_dir: str,
                threshold: float = DUP_THRESHOLD) -> ray.data.Dataset:
    """(vec_id, kept, exemplar) for every embedding row; kept rows are
    the semantic-dedup survivors."""
    n = _table_rows(sf_dir)
    cent = _centroids(sf_dir, n_rows=n)
    refs, ranges, norm = _embedding_shards(sf_dir)
    assigned = norm.map_batches(lambda b: _assign_single(b, cent),
                                batch_format="pyarrow")
    return (assigned.groupby("bucket")
            .map_groups(_cluster_dedup_fn(refs, ranges, threshold),
                        batch_format="pandas"))


def q_semdedup(sf_dir: str) -> pd.DataFrame:
    """Rows-only driver entry (approximate by construction: k-means
    partitioning hides cross-cluster pairs, exactly as published)."""
    df = semdedup_ds(sf_dir).to_pandas()
    return df.sort_values("vec_id").reset_index(drop=True)
