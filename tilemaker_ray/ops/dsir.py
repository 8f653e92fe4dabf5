"""DSIR-style data selection (Xie et al. 2023, "Data Selection for
Language Models via Importance Resampling"): fit hashed-n-gram bag
models on a TARGET corpus (the distribution you want more of) and on
the RAW corpus, compute per-raw-document importance log-ratios
log p_target(x) - log p_raw(x), and resample via Gumbel-top-k.

Production framing: the data-mixing stage that upsamples crawl
documents resembling a curated corpus.  Here target = the synthetic
pages table (travel vocabulary) and raw = the documents table (tech
vocabulary) — the same learnable split the NB classifier uses
(ops/classify.py), but a different published method: unsupervised
density ratio + stochastic resampling rather than a discriminative
classifier.

Scale shape:
- FEATURES: unigram + bigram tokens hash into DSIR_BUCKETS buckets
  (hashed n-gram trick from the paper §2.3) — model size bounded by
  construction; the bigram channel is what distinguishes word ORDER
  distributions, which unigram NB cannot.
- FIT: one streaming pass per corpus; per-batch bucket partials →
  one small groupby; the driver only ever holds the B-sized count
  vector (2^16 → 512 KB).
- SCORE: the dense log-ratio vector broadcasts via ray.put; each
  batch does explode + hash + one gather + np.add.at — zero shuffle.
- RESAMPLE: Gumbel keys are a pure function of doc_id (deterministic
  across runs/retries — the resume-stability requirement every
  sampler in ops/sampling.py follows); the selection threshold is
  found with a per-batch partial top-k so the driver never holds the
  full key column.

No SQL oracle (log-space float sums); gated by a shared-kernel
local-vs-distributed parity test, a cross-corpus margin test (target
text must out-score raw text under the ratio), and exact-selection
tests (tests/test_ops.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Sum

DSIR_BUCKETS = 1 << 16
DSIR_ALPHA = 1.0
DSIR_KEEP_FRAC = 0.1
_NGRAM_SEP = "\x00"


def ngram_buckets(texts: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """(doc positions, hashed bucket ids) for the unigram + bigram
    features of a batch of texts (zero-based RangeIndex required).
    Fully vectorized; bigrams never cross a document boundary."""
    ex = texts.str.split(" ").explode()
    pos_u = ex.index.to_numpy()
    tok = ex.to_numpy(dtype=object)
    bk_u = (pd.util.hash_array(tok) % DSIR_BUCKETS).astype(np.int64)
    if len(tok) > 1:
        same = pos_u[1:] == pos_u[:-1]
        big = (pd.Series(tok[:-1][same]) + _NGRAM_SEP
               + pd.Series(tok[1:][same])).to_numpy(dtype=object)
        bk_b = (pd.util.hash_array(big) % DSIR_BUCKETS).astype(np.int64)
        pos_b = pos_u[:-1][same]
    else:
        bk_b = np.empty(0, np.int64)
        pos_b = np.empty(0, np.int64)
    return (np.concatenate((pos_u, pos_b)),
            np.concatenate((bk_u, bk_b)))


def _bucket_counts(ds: ray.data.Dataset, col: str) -> np.ndarray:
    """Dense DSIR_BUCKETS count vector over a text Dataset: per-batch
    sparse partials → one small groupby → driver densify."""

    def partial(b: pa.Table) -> pa.Table:
        txt = b.column(col).to_pandas().reset_index(drop=True)
        _, bk = ngram_buckets(txt)
        uniq, n = np.unique(bk, return_counts=True)
        return pa.table({"b": pa.array(uniq),
                         "n": pa.array(n.astype(np.int64))})

    g = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("b").aggregate(Sum("n", alias_name="n")).to_pandas())
    out = np.zeros(DSIR_BUCKETS, np.int64)
    out[g["b"].to_numpy(np.int64)] = g["n"].to_numpy(np.int64)
    return out


def fit_logratio(sf_dir: str) -> np.ndarray:
    """Dense per-bucket log(theta_target / theta_raw) under add-alpha
    smoothing — the broadcastable DSIR model."""
    from ..sources.pages import pages_path, rows_for_sf
    tgt = _bucket_counts(
        ray.data.read_parquet(pages_path(rows_for_sf(sf_dir)),
                              columns=["text"]), "text")
    raw = _bucket_counts(
        ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                              columns=["text"]), "text")
    lt = np.log(tgt + DSIR_ALPHA) - np.log(tgt.sum()
                                           + DSIR_ALPHA * DSIR_BUCKETS)
    lr = np.log(raw + DSIR_ALPHA) - np.log(raw.sum()
                                           + DSIR_ALPHA * DSIR_BUCKETS)
    return lt - lr


def score_logratio(texts: pd.Series, w: np.ndarray) -> np.ndarray:
    """Per-doc importance log-ratio under the broadcast model (shared
    by the distributed scorer and the parity test)."""
    pos, bk = ngram_buckets(texts)
    out = np.zeros(len(texts), np.float64)
    np.add.at(out, pos, w[bk])
    return out


def gumbel_keys(doc_ids: np.ndarray, ratio: np.ndarray) -> np.ndarray:
    """Deterministic Gumbel-top-k sampling keys: ratio + G where G is
    standard Gumbel noise derived from a content hash of doc_id —
    identical across runs, retries and partitionings (the paper's
    stochastic resampling made resume-stable)."""
    u = (pd.util.hash_array(doc_ids.astype(np.uint64)) % ((1 << 53) - 1)
         + 1) / float(1 << 53)
    return ratio + -np.log(-np.log(u))


def q_dsir_select(sf_dir: str,
                  keep_frac: float = DSIR_KEEP_FRAC) -> pd.DataFrame:
    """(doc_id, dsir_logratio, gumbel_key, selected) over the raw
    documents table: importance ratios under the target(pages)/raw
    models, Gumbel resampling keys, and the top-keep_frac selection."""
    import ray

    w_ref = ray.put(fit_logratio(sf_dir))
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    class Scorer:
        def __init__(self, ref):
            self.w = ray.get(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            txt = b.column("text").to_pandas().reset_index(drop=True)
            did = b.column("doc_id").to_numpy()
            r = np.round(score_logratio(txt, self.w), 9)
            return pa.table({
                "doc_id": pa.array(did),
                "dsir_logratio": pa.array(r),
                "gumbel_key": pa.array(np.round(gumbel_keys(did, r), 9)),
            })

    scores = ds.map_batches(Scorer, fn_constructor_kwargs={"ref": w_ref},
                            batch_format="pyarrow",
                            concurrency=(1, 8)).materialize()
    n = scores.count()
    k = max(1, int(n * keep_frac))

    def batch_topk(b: pa.Table) -> pa.Table:
        key = b.column("gumbel_key").to_numpy()
        top = np.sort(key)[max(0, len(key) - k):]
        return pa.table({"gumbel_key": pa.array(top)})

    cand = (scores.map_batches(batch_topk, batch_format="pyarrow")
                  .to_pandas()["gumbel_key"].to_numpy())
    thresh = float(np.sort(cand)[-k])

    def flag(b: pa.Table) -> pa.Table:
        sel = (b.column("gumbel_key").to_numpy() >= thresh)
        return b.append_column("selected",
                               pa.array(sel.astype(np.int64)))

    out = scores.map_batches(flag, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)
