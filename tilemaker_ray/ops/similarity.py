"""Similarity search over the embeddings table (list<float> column).

- q_cosine_topk: brute-force cosine top-k — numpy matmul per batch
  against a broadcast query matrix (the documented baseline), partial
  top-k per batch (combiner) + final reduce. DuckDB oracle via
  list_cosine_similarity.
- q_ivf_topk: IVF-bucketed variant (the scale path): k-means-lite
  centroids (deterministic seed), probe the nprobe nearest buckets
  only. Verified in tests for recall vs brute force; rows-only for the
  driver (approximate by construction).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

N_QUERIES = 4  # query vectors = embeddings of vec_id 0..3
TOP_K = 10


def _load_queries(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    q = pd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    q = q[q.vec_id < N_QUERIES].sort_values("vec_id")
    mat = np.stack(q.embedding.to_numpy()).astype(np.float64)
    return q.vec_id.to_numpy(), mat


class CosineScorer:
    """Per-batch: cosine of all rows against the broadcast query matrix,
    emit local top-k per query."""

    def __init__(self, qref):
        qid, qmat = ray.get(qref) if isinstance(qref, ray.ObjectRef) else qref
        self.qid = qid
        qn = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
        self.qn = qn

    def __call__(self, b: pa.Table) -> pa.Table:
        ids = b.column("vec_id").to_numpy()
        emb = np.stack(b.column("embedding").to_numpy(zero_copy_only=False)).astype(np.float64)
        en = emb / np.linalg.norm(emb, axis=1, keepdims=True)
        sims = self.qn @ en.T  # (nq, nb)
        k = min(TOP_K, sims.shape[1])
        out = {"query_id": [], "vec_id": [], "sim": []}
        idx = np.argpartition(-sims, k - 1, axis=1)[:, :k]
        for qi in range(len(self.qid)):
            for j in idx[qi]:
                if ids[j] == self.qid[qi]:
                    continue  # exclude self
                out["query_id"].append(int(self.qid[qi]))
                out["vec_id"].append(int(ids[j]))
                out["sim"].append(float(sims[qi, j]))
        return pa.table({
            "query_id": pa.array(out["query_id"], pa.int64()),
            "vec_id": pa.array(out["vec_id"], pa.int64()),
            "sim": pa.array(out["sim"], pa.float64()),
        })


def q_cosine_topk(sf_dir: str) -> pd.DataFrame:
    queries = _load_queries(sf_dir)
    qref = ray.put(queries)
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    partials = ds.map_batches(CosineScorer, fn_constructor_kwargs={"qref": qref},
                              batch_format="pyarrow", concurrency=2)
    df = partials.to_pandas()
    df = df.sort_values(["query_id", "sim", "vec_id"],
                        ascending=[True, False, True], kind="stable")
    df["rank"] = df.groupby("query_id").cumcount() + 1
    df = df[df["rank"] <= TOP_K][["query_id", "rank", "vec_id"]]
    return df.reset_index(drop=True)


N_CENTROIDS = 16
N_PROBE = 4


def _centroids(sf_dir: str) -> np.ndarray:
    """Deterministic centroids: 2 Lloyd iterations from seeded init over
    a sample — built once on the driver (small), broadcast to scorers."""
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["embedding"])
    x = np.stack(emb.embedding.to_numpy()).astype(np.float64)
    x = x / np.linalg.norm(x, axis=1, keepdims=True)
    rng = np.random.default_rng(7)
    c = x[rng.choice(len(x), min(N_CENTROIDS, len(x)), replace=False)]
    for _ in range(2):
        assign = np.argmax(x @ c.T, axis=1)
        for j in range(len(c)):
            m = x[assign == j]
            if len(m):
                v = m.mean(axis=0)
                c[j] = v / np.linalg.norm(v)
    return c


class IvfScorer:
    def __init__(self, qref, cref):
        qid, qmat = ray.get(qref)
        self.cent = ray.get(cref)
        self.qid = qid
        self.qn = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
        # buckets each query probes
        self.probe = np.argsort(-(self.qn @ self.cent.T), axis=1)[:, :N_PROBE]

    def __call__(self, b: pa.Table) -> pa.Table:
        ids = b.column("vec_id").to_numpy()
        emb = np.stack(b.column("embedding").to_numpy(zero_copy_only=False)).astype(np.float64)
        en = emb / np.linalg.norm(emb, axis=1, keepdims=True)
        bucket = np.argmax(en @ self.cent.T, axis=1)
        out = {"query_id": [], "vec_id": [], "sim": []}
        for qi in range(len(self.qid)):
            mask = np.isin(bucket, self.probe[qi])
            if not mask.any():
                continue
            sims = en[mask] @ self.qn[qi]
            sel_ids = ids[mask]
            k = min(TOP_K, len(sims))
            idx = np.argpartition(-sims, k - 1)[:k]
            for j in idx:
                if sel_ids[j] == self.qid[qi]:
                    continue
                out["query_id"].append(int(self.qid[qi]))
                out["vec_id"].append(int(sel_ids[j]))
                out["sim"].append(float(sims[j]))
        return pa.table({
            "query_id": pa.array(out["query_id"], pa.int64()),
            "vec_id": pa.array(out["vec_id"], pa.int64()),
            "sim": pa.array(out["sim"], pa.float64()),
        })


def q_ivf_topk(sf_dir: str) -> pd.DataFrame:
    qref = ray.put(_load_queries(sf_dir))
    cref = ray.put(_centroids(sf_dir))
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    partials = ds.map_batches(IvfScorer,
                              fn_constructor_kwargs={"qref": qref, "cref": cref},
                              batch_format="pyarrow", concurrency=2)
    df = partials.to_pandas()
    df = df.sort_values(["query_id", "sim", "vec_id"],
                        ascending=[True, False, True], kind="stable")
    df["rank"] = df.groupby("query_id").cumcount() + 1
    df = df[df["rank"] <= TOP_K][["query_id", "rank", "vec_id"]]
    return df.reset_index(drop=True)


DUP_THRESHOLD = 0.45  # synthetic embeddings are near-orthogonal (max
                      # pairwise cosine ≈ 0.51); 0.45 yields real pairs


class CosineDupScorer:
    """Embedding-cosine near-dup pairs: exact blocked all-pairs — each
    batch matmuls against the broadcast normalized matrix and keeps
    pairs (a < b, a in batch). O(n²) total but fully vectorized and
    distributed over batches; the IVF/LSH-bucketed variant (q_ivf_topk
    machinery) is the 100 TB scale path for candidate generation."""

    def __init__(self, allref, threshold: float):
        ids, mat = ray.get(allref)
        self.all_ids = ids
        self.all_mat = mat
        self.threshold = threshold

    def __call__(self, b: pa.Table) -> pa.Table:
        ids = b.column("vec_id").to_numpy().astype(np.int64)
        emb = np.stack(b.column("embedding").to_numpy(zero_copy_only=False)).astype(np.float64)
        en = emb / np.linalg.norm(emb, axis=1, keepdims=True)
        sims = en @ self.all_mat.T  # (batch, all)
        bi, aj = np.nonzero(sims >= self.threshold)
        a = ids[bi]
        bb = self.all_ids[aj]
        keep = a < bb
        return pa.table({"vec_a": pa.array(a[keep]),
                         "vec_b": pa.array(bb[keep])})


def q_cosine_dup_pairs(sf_dir: str, threshold: float = DUP_THRESHOLD) -> pd.DataFrame:
    """Near-duplicate (a,b) pairs with cosine >= threshold, a < b."""
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    mat = np.stack(emb.embedding.to_numpy()).astype(np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    allref = ray.put((emb.vec_id.to_numpy().astype(np.int64), mat))
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    out = ds.map_batches(CosineDupScorer,
                         fn_constructor_kwargs={"allref": allref,
                                                "threshold": threshold},
                         batch_format="pyarrow", concurrency=2)
    df = out.to_pandas().sort_values(["vec_a", "vec_b"])
    return df.reset_index(drop=True)


ORACLES = {
    "cosine_dup_pairs": f"""
        WITH n AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        )
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
        FROM n a JOIN n b ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(a.e, b.e) >= {DUP_THRESHOLD}
        ORDER BY vec_a, vec_b
    """,
    "cosine_topk": f"""
        WITH q AS (
          SELECT vec_id AS query_id, embedding AS qe
          FROM embeddings WHERE vec_id < {N_QUERIES}
        ), s AS (
          SELECT q.query_id, e.vec_id,
                 list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                        CAST(q.qe AS DOUBLE[])) AS sim
          FROM q, embeddings e
          WHERE e.vec_id <> q.query_id
        ), r AS (
          SELECT query_id, vec_id,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY sim DESC, vec_id) AS rank
          FROM s
        )
        SELECT query_id, rank, vec_id FROM r WHERE rank <= {TOP_K}
    """,
}
