"""Distributed text classifier (the fastText/CCNet-style
quality-classifier stage of a training-data pipeline): multinomial
Naive Bayes over HASHED bag-of-words features (the fastText hashing
trick), trained with ONE partial-counts shuffle, then broadcast
scoring.

Production framing — the GPT/CCNet WebText-classifier recipe: train on
a labeled split (curated "high quality" corpus vs raw crawl), score
every crawl document, keep the top scores.  Here the positive class is
the synthetic Common-Crawl pages table (travel-domain vocabulary) and
the negative class is the documents table (different vocabulary), so
the label is genuinely encoded in the token distribution and the
learned model is testable: held-in accuracy must be near-perfect while
the majority baseline is not.

Scale shape:
- FEATURES: tokens hash into NB_BUCKETS int64 buckets
  (pd.util.hash_array — deterministic across processes), so the
  shuffle key space and the model size are BOUNDED BY CONSTRUCTION no
  matter the corpus vocabulary (the synthetic corpus has ~194k
  distinct tokens at sf0.1 — near-unique geo mentions — which made
  the string-keyed variant's model 20× bigger for zero accuracy).
- TRAIN: map_batches explodes tokens and pre-aggregates (bucket,
  n_pos, n_neg) per batch — the one shuffle carries int partials,
  never tokens; per-batch DOC counts for the class prior ride the
  same stream under a reserved bucket id, keeping training at one
  pass.  Buckets seen fewer than NB_MIN_DF times are dropped from the
  broadcast model (singletons carry no generalizable signal; OOV
  scores 0 by the symmetric-smoothing convention).
- SCORE: the (sorted-bucket, weight) arrays are broadcast via
  ray.put; each batch does one explode + hash + np.searchsorted
  lookup + per-doc np.add.at sum — no Python row loop, zero shuffle.

No SQL oracle (log-space float sums are order-sensitive); correctness
is gated by an exact distributed-vs-local parity test plus the
accuracy bound (tests/test_ops.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Sum

NB_ALPHA = 1.0
NB_BUCKETS = 1 << 18
NB_MIN_DF = 2
# reserved bucket for the per-batch doc-count partials (hash buckets
# are < NB_BUCKETS, so this id cannot collide with a feature)
_DOCS_BUCKET = np.int64(NB_BUCKETS)


def _hash_tokens(toks: np.ndarray) -> np.ndarray:
    """Deterministic token→bucket hash (stable across processes);
    unique-token siphash + gather via the shared NA-safe helper."""
    from ._util import hash_tokens_u64
    return (hash_tokens_u64(toks) % NB_BUCKETS).astype(np.int64)


def _labeled_ds(sf_dir: str) -> ray.data.Dataset:
    """Union of the two corpora as (uid, text, y): y=1 for the curated
    pages table, y=0 for the raw documents table."""
    from ..sources.pages import pages_path, rows_for_sf

    def tag_pages(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return pa.table({
            "uid": pc.binary_join_element_wise(
                pa.array(["p"] * len(b)), b.column("url"), ":"),
            "text": b.column("text"),
            "y": pa.array(np.ones(len(b), np.int64)),
        })

    def tag_docs(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return pa.table({
            "uid": pc.binary_join_element_wise(
                pa.array(["d"] * len(b)),
                pc.cast(b.column("doc_id"), pa.string()), ":"),
            "text": b.column("text"),
            "y": pa.array(np.zeros(len(b), np.int64)),
        })

    pos = (ray.data.read_parquet(pages_path(rows_for_sf(sf_dir)),
                                 columns=["url", "text"])
           .map_batches(tag_pages, batch_format="pyarrow"))
    neg = (ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
           .map_batches(tag_docs, batch_format="pyarrow"))
    return pos.union(neg)


def train_nb(ds: ray.data.Dataset) -> tuple[np.ndarray, np.ndarray, float]:
    """Train hashed-feature multinomial NB over a (text, y) Dataset:
    returns (sorted kept bucket ids, per-bucket log-odds weights,
    class-prior log-odds)."""

    def partial(b: pa.Table) -> pa.Table:
        txt = b.column("text").to_pandas()
        y = b.column("y").to_pandas().astype(np.int64)
        ex = txt.str.split(" ").explode()
        yy = y.reindex(ex.index).to_numpy()
        bk = _hash_tokens(ex.to_numpy(dtype=object))
        if len(bk):
            order = np.argsort(bk, kind="stable")
            bk, yy = bk[order], yy[order]
            starts = np.flatnonzero(
                np.concatenate(([True], bk[1:] != bk[:-1])))
            uniq = bk[starts]
            npos = np.add.reduceat(yy, starts)
            nall = np.diff(np.concatenate((starts, [len(bk)])))
        else:                       # empty batch: emit only the doc row
            uniq = np.empty(0, np.int64)
            npos = nall = np.empty(0, np.int64)
        return pa.table({
            "b": pa.array(np.concatenate((uniq, [_DOCS_BUCKET]))),
            "n_pos": pa.array(np.concatenate((npos, [int(y.sum())]))
                              .astype(np.int64)),
            "n_neg": pa.array(np.concatenate(
                (nall - npos, [int((1 - y).sum())])).astype(np.int64)),
        })

    counts = (ds.map_batches(partial, batch_format="pyarrow")
                .groupby("b")
                .aggregate(Sum("n_pos", alias_name="n_pos"),
                           Sum("n_neg", alias_name="n_neg"))
                .to_pandas().sort_values("b").reset_index(drop=True))
    docs = counts[counts["b"] == _DOCS_BUCKET]
    d_pos, d_neg = int(docs["n_pos"].iloc[0]), int(docs["n_neg"].iloc[0])
    counts = counts[counts["b"] != _DOCS_BUCKET]

    n_pos = counts["n_pos"].to_numpy(np.float64)
    n_neg = counts["n_neg"].to_numpy(np.float64)
    # smoothing denominators use the FULL seen-bucket count; the
    # min-df cut only shrinks the broadcast (dropped buckets score 0)
    v = len(counts)
    tot_pos, tot_neg = n_pos.sum(), n_neg.sum()
    keep = (n_pos + n_neg) >= NB_MIN_DF
    buckets = counts["b"].to_numpy(np.int64)[keep]
    w = (np.log((n_pos[keep] + NB_ALPHA) / (tot_pos + NB_ALPHA * v))
         - np.log((n_neg[keep] + NB_ALPHA) / (tot_neg + NB_ALPHA * v)))
    prior = float(np.log(d_pos + NB_ALPHA) - np.log(d_neg + NB_ALPHA))
    return buckets, w, prior


def score_local(texts: pd.Series, buckets: np.ndarray, w: np.ndarray,
                prior: float) -> np.ndarray:
    """Vectorized NB scoring: explode → hash → searchsorted bucket
    lookup → per-doc weight sum (unknown buckets contribute 0).
    Shared by the actor and the parity test.  `texts` must carry a
    zero-based RangeIndex."""
    ex = texts.str.split(" ").explode()
    out = np.zeros(len(texts), np.float64)
    if len(ex) and len(buckets):
        pos = ex.index.to_numpy()
        bk = _hash_tokens(ex.to_numpy(dtype=object))
        idx = np.clip(np.searchsorted(buckets, bk), 0, len(buckets) - 1)
        contrib = np.where(buckets[idx] == bk, w[idx], 0.0)
        np.add.at(out, pos, contrib)
    return out + prior


def q_nb_classify(sf_dir: str) -> pd.DataFrame:
    """Train on pages(+) vs documents(−), then score every row of both
    held-in sets: (uid, label, score, pred).  Model broadcast once;
    scoring streams."""
    import ray
    labeled = _labeled_ds(sf_dir)
    buckets, w, prior = train_nb(labeled)
    ref = ray.put((buckets, w, prior))

    class Scorer:
        def __init__(self, model_ref):
            self.buckets, self.w, self.prior = ray.get(model_ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            txt = b.column("text").to_pandas().reset_index(drop=True)
            s = score_local(txt, self.buckets, self.w, self.prior)
            return pa.table({
                "uid": b.column("uid"),
                "label": b.column("y"),
                "score": pa.array(np.round(s, 9)),
                "pred": pa.array((s > 0).astype(np.int64)),
            })

    df = labeled.map_batches(Scorer,
                             fn_constructor_kwargs={"model_ref": ref},
                             batch_format="pyarrow",
                             concurrency=(1, 8)).to_pandas()
    return df.sort_values("uid").reset_index(drop=True)
