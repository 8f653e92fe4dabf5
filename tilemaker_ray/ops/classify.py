"""Distributed text classifier (the fastText/CCNet-style
quality-classifier stage of a training-data pipeline): multinomial
Naive Bayes trained with ONE partial-counts shuffle, then broadcast
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
- TRAIN: map_batches explodes tokens and pre-aggregates (tok, n_pos,
  n_neg) per batch, so the one shuffle carries partial counts, never
  tokens; groupby(tok) sums them.  The model table is vocab-bounded
  (cap with min_df at crawl scale) and pulled to the driver once.
- SCORE: the (sorted-vocab, weight) arrays are broadcast via ray.put;
  each batch does one explode + np.searchsorted lookup + per-doc
  np.add.at sum — no Python row loop, zero shuffle.

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
    """Train multinomial NB over a (text, y) Dataset: returns (sorted
    vocab array, per-token log-odds weights, class-prior log-odds)."""

    def partial(b: pa.Table) -> pa.Table:
        txt = b.column("text").to_pandas()
        y = b.column("y").to_pandas().astype(np.int64)
        ex = txt.str.split(" ").explode()
        df = pd.DataFrame({"tok": ex.to_numpy(),
                           "y": y.reindex(ex.index).to_numpy()})
        g = df.groupby("tok", as_index=False).agg(
            n_pos=("y", "sum"), n_all=("y", "size"))
        return pa.table({
            "tok": pa.array(g["tok"], pa.string()),
            "n_pos": pa.array(g["n_pos"].astype("int64")),
            "n_neg": pa.array((g["n_all"] - g["n_pos"]).astype("int64")),
        })

    counts = (ds.map_batches(partial, batch_format="pyarrow")
                .groupby("tok")
                .aggregate(Sum("n_pos", alias_name="n_pos"),
                           Sum("n_neg", alias_name="n_neg"))
                .to_pandas())

    def doc_partial(b: pa.Table) -> pa.Table:
        y = b.column("y").to_numpy()
        return pa.table({"d_pos": pa.array([int(y.sum())], pa.int64()),
                         "d_neg": pa.array([int(len(y) - y.sum())],
                                           pa.int64())})

    dd = (ds.select_columns(["y"])
          .map_batches(doc_partial, batch_format="pyarrow").to_pandas())
    d_pos, d_neg = int(dd["d_pos"].sum()), int(dd["d_neg"].sum())

    counts = counts.sort_values("tok").reset_index(drop=True)
    vocab = counts["tok"].to_numpy(dtype=object)
    n_pos = counts["n_pos"].to_numpy(dtype=np.float64)
    n_neg = counts["n_neg"].to_numpy(dtype=np.float64)
    v = len(vocab)
    tot_pos, tot_neg = n_pos.sum(), n_neg.sum()
    w = (np.log((n_pos + NB_ALPHA) / (tot_pos + NB_ALPHA * v))
         - np.log((n_neg + NB_ALPHA) / (tot_neg + NB_ALPHA * v)))
    prior = float(np.log(d_pos + NB_ALPHA) - np.log(d_neg + NB_ALPHA))
    return vocab, w, prior


def score_local(texts: pd.Series, vocab: np.ndarray, w: np.ndarray,
                prior: float) -> np.ndarray:
    """Vectorized NB scoring: explode → searchsorted vocab lookup →
    per-doc weight sum (OOV tokens contribute 0 — symmetric-smoothing
    convention).  Shared by the actor and the parity test.  `texts`
    must carry a zero-based RangeIndex."""
    ex = texts.str.split(" ").explode()
    out = np.zeros(len(texts), np.float64)
    if len(ex) and len(vocab):
        pos = ex.index.to_numpy()
        toks = ex.to_numpy(dtype=object)
        idx = np.searchsorted(vocab, toks)
        idx = np.clip(idx, 0, len(vocab) - 1)
        contrib = np.where(vocab[idx] == toks, w[idx], 0.0)
        np.add.at(out, pos, contrib)
    return out + prior


def q_nb_classify(sf_dir: str) -> pd.DataFrame:
    """Train on pages(+) vs documents(−), then score every row of both
    held-in sets: (uid, label, score, pred).  Model broadcast once;
    scoring streams."""
    labeled = _labeled_ds(sf_dir)
    vocab, w, prior = train_nb(labeled)
    ref = ray.put((vocab, w, prior))

    class Scorer:
        def __init__(self, model_ref):
            self.vocab, self.w, self.prior = ray.get(model_ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            txt = b.column("text").to_pandas().reset_index(drop=True)
            s = score_local(txt, self.vocab, self.w, self.prior)
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
