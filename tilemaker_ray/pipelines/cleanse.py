"""End-to-end corpus-cleaning pipeline — the web-text flagship twin of
the tile pipeline: ONE job that scores every document (exact-dup
keep-first, Gopher rules, unigram-LM bits, language ID), filters, and
writes the cleaned corpus as partitioned parquet with per-partition
lineage + metrics (the same resume manifest the tile sink uses —
reruns skip finished partitions).

Reference framing: the C4/CCNet/Gopher data-prep recipe composed from
this repo's oracled building blocks (the reference engine has no text
path; this is the LLM-data extension the graft brief mandates).

Three streaming passes, no driver-side text:
  A. dup losers — explode (hash64(text), doc_id), 16 B/row, groupby a
     coarse hash bucket (a hash's whole corpus lands in one group, so
     in-group min(doc_id) is global); emit only LOSERS (docs whose
     exact text appeared under a smaller doc_id).  Losers ≈ duplicate
     count ≪ corpus, pulled once and broadcast via ray.put; at extreme
     dup rates the broadcast upgrades to a doc-bucket join.
  B. unigram LM — one partial-counts shuffle → (vocab, count) arrays
     on the driver → broadcast model (vocab-bounded; min_df cap at
     crawl scale).  Same add-α estimator as ops/text.q_lm_bits, one
     order cheaper (no bigram table) — the coarse pre-filter LM.
  C. score + filter + write — read documents once; per-batch
     vectorized Gopher counts, LangId vote and LM lookup; drop
     losers / rule failures; one parquet partition per doc_id bucket
     (atomic rename) + a manifest row carrying the per-partition drop
     counts as lineage.  A resume loads the completed bucket set and
     drops those rows BEFORE scoring (stages A/B are deterministic
     and recomputed — the documented stage-A trade-off of
     pipelines/resumable.py).
"""

from __future__ import annotations

import os
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data

from ..ops.text import LM_ALPHA, LangId, content_hash64, gopher_counts
from ..state.manifest import Manifest, atomic_write

CLEAN_PARTS = 64          # output partitions (doc_id % CLEAN_PARTS)
# unigram bits/token cap — corpus-dependent config (CCNet cuts by
# perplexity percentile of a held-out distribution); 4.93 ≈ the P94 of
# the synthetic corpora at every sf, so the rule genuinely fires
CLEAN_LM_MAX_BITS = 4.93


def _dup_losers(sf_dir: str) -> np.ndarray:
    """doc_ids whose exact text occurs under a smaller doc_id."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def hashes(b: pa.Table) -> pa.Table:
        # the repo-wide md5-low-64 convention (ops/text.content_hash64)
        # — the SAME hash q_dedup_keep_first keys on, so the loser set
        # can never drift from the oracled keep-first op
        h = content_hash64(b.column("text").to_pylist()).view(np.int64)
        return pa.table({"h": pa.array(h),
                         "hb": pa.array(h >> 52),
                         "doc_id": b.column("doc_id")})

    def losers(g: pd.DataFrame) -> pd.DataFrame:
        h = g["h"].to_numpy()
        doc = g["doc_id"].to_numpy()
        order = np.lexsort((doc, h))
        h, doc = h[order], doc[order]
        first = np.concatenate(([True], h[1:] != h[:-1]))
        return pd.DataFrame({"doc_id": doc[~first]})

    out = (ds.map_batches(hashes, batch_format="pyarrow")
             .groupby("hb").map_groups(losers, batch_format="pandas")
             .to_pandas())
    if "doc_id" not in out.columns:       # zero duplicates anywhere —
        return np.empty(0, np.int64)      # all-empty blocks lose schema
    return out["doc_id"].to_numpy(dtype=np.int64)


def _train_unigram_lm(sf_dir: str) -> tuple[np.ndarray, np.ndarray, float]:
    """(sorted vocab, -log2 P(w) per token, -log2 P(unseen))."""
    from ray.data.aggregate import Sum
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["text"])

    def partial(b: pa.Table) -> pa.Table:
        ex = b.column("text").to_pandas().str.split(" ").explode()
        vc = ex.value_counts()
        return pa.table({"w": pa.array(vc.index.to_numpy(dtype=object),
                                       pa.string()),
                         "n": pa.array(vc.to_numpy(dtype=np.int64))})

    counts = (ds.map_batches(partial, batch_format="pyarrow")
                .groupby("w").aggregate(Sum("n", alias_name="n"))
                .to_pandas().sort_values("w").reset_index(drop=True))
    vocab = counts["w"].to_numpy(dtype=object)
    n = counts["n"].to_numpy(dtype=np.float64)
    total, v = n.sum(), len(vocab)
    bits = -np.log2((n + LM_ALPHA) / (total + LM_ALPHA * v))
    oov_bits = float(-np.log2(LM_ALPHA / (total + LM_ALPHA * v)))
    return vocab, bits, oov_bits


class _CleanWriter:
    """Stage C: score one doc_id-bucket group, filter, write its
    parquet partition atomically, record lineage + drop counts.

    Holds only OBJECT REFS at construction (the writer is pickled
    into the map_groups closure shipped to every worker — ray.get on
    the driver would inline the full LM vocab into that pickle and
    defeat the broadcast); the arrays resolve lazily from plasma on
    first use in each worker process."""

    def __init__(self, out_dir: str, sf_dir: str, model_ref,
                 losers_ref, lm_max_bits: float):
        self.out_dir = out_dir
        self.sf_dir = sf_dir
        self.docs_dir = os.path.join(out_dir, "docs")
        os.makedirs(self.docs_dir, exist_ok=True)
        self.model_ref = model_ref
        self.losers_ref = losers_ref
        self._model = None
        self.lm_max = lm_max_bits
        self.langid = LangId()
        self.mwriter = Manifest(out_dir).writer()

    def _resolve(self):
        if self._model is None:
            vocab, bits, oov = ray.get(self.model_ref)
            self._model = (vocab, bits, oov, ray.get(self.losers_ref))
        return self._model

    def _score(self, df: pd.DataFrame) -> pd.DataFrame:
        vocab, bits, oov_bits, losers = self._resolve()
        txt = df["text"].reset_index(drop=True)
        # ONE explode serves both the gopher kernel and the LM lookup
        # (tokenization dominates this stage — review finding)
        ex = txt.str.split(" ").explode()
        # gopher rules via the SHARED kernel (ops/text.gopher_counts —
        # the same code path the oracled q_gopher_rules runs)
        gopher_ok = gopher_counts(txt, ex=ex)["gopher_pass"].to_numpy() == 1
        n = (txt.str.count(" ") + 1).astype("int64")
        # unigram LM bits per doc: searchsorted vocab lookup
        toks = ex.to_numpy(dtype=object)
        pos = ex.index.to_numpy()
        bits_sum = np.zeros(len(txt), np.float64)
        if len(vocab) and len(toks):
            idx = np.clip(np.searchsorted(vocab, toks),
                          0, len(vocab) - 1)
            contrib = np.where(vocab[idx] == toks, bits[idx], oov_bits)
            np.add.at(bits_sum, pos, contrib)
        lm_bits = bits_sum / n.to_numpy()
        langs, _ = self.langid.predict(txt.tolist())
        doc = df["doc_id"].to_numpy()
        li = np.searchsorted(losers, doc)
        li = np.clip(li, 0, max(len(losers) - 1, 0))
        is_loser = (losers[li] == doc) if len(losers) else \
            np.zeros(len(doc), bool)
        out = df.reset_index(drop=True).copy()
        out["pred_lang"] = langs
        out["ulm_bits"] = np.round(lm_bits, 6)
        out["dup_loser"] = is_loser
        out["gopher_ok"] = gopher_ok
        return out

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        t0 = time.time()
        bucket = int(df["doc_id"].iloc[0]) % CLEAN_PARTS
        key = f"b{bucket:03d}"
        s = self._score(df)
        lm_ok = s["ulm_bits"] <= self.lm_max
        lang_ok = s["pred_lang"] != "und"
        keep = (~s["dup_loser"]) & s["gopher_ok"] & lm_ok & lang_ok
        kept = s.loc[keep, ["doc_id", "text", "lang", "pred_lang",
                            "ulm_bits"]].sort_values("doc_id")
        table = pa.table({
            "doc_id": pa.array(kept["doc_id"].to_numpy(np.int64)),
            "text": pa.array(kept["text"], pa.string()),
            "lang": pa.array(kept["lang"], pa.string()),
            "pred_lang": pa.array(kept["pred_lang"], pa.string()),
            "ulm_bits": pa.array(kept["ulm_bits"].to_numpy(np.float64)),
        })
        import io
        buf = io.BytesIO()
        pq.write_table(table, buf)
        path = os.path.join(self.docs_dir, f"{key}.parquet")
        atomic_write(path, buf.getvalue())
        self.mwriter.record(
            key, len(kept), buf.getbuffer().nbytes, time.time() - t0,
            lineage={"documents": self.sf_dir,
                     "n_in": int(len(s)),
                     "drop_dup": int(s["dup_loser"].sum()),
                     "drop_gopher": int((~s["gopher_ok"]).sum()),
                     "drop_lm": int((~lm_ok).sum()),
                     "drop_lang": int((~lang_ok).sum())})
        return pd.DataFrame({"bucket": [bucket], "n_in": [len(s)],
                             "kept": [len(kept)]})


def clean_corpus(sf_dir: str, out_dir: str,
                 lm_max_bits: float = CLEAN_LM_MAX_BITS) -> dict:
    """Run (or resume) the cleaning job; returns summary stats."""
    manifest = Manifest(out_dir)
    done = manifest.completed()

    losers = np.sort(_dup_losers(sf_dir))
    model = _train_unigram_lm(sf_dir)
    model_ref, losers_ref = ray.put(model), ray.put(losers)

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text", "lang"])

    done_ints = np.array(sorted(int(k[1:]) for k in done), np.int64)

    def add_bucket_skip_done(b: pa.Table) -> pa.Table:
        bucket = b.column("doc_id").to_numpy() % CLEAN_PARTS
        t = b.append_column("bucket", pa.array(bucket.astype(np.int64)))
        if not len(done_ints):
            return t
        return t.filter(pa.array(~np.isin(bucket, done_ints)))

    writer = _CleanWriter(out_dir, sf_dir, model_ref, losers_ref,
                          lm_max_bits)

    def run_write(df: pd.DataFrame) -> pd.DataFrame:
        return writer(df)

    summary = (ds.map_batches(add_bucket_skip_done, batch_format="pyarrow")
                 .groupby("bucket")
                 .map_groups(run_write, batch_format="pandas")
                 .to_pandas())
    rows = manifest.rows()
    drops = {k: sum(r["lineage"].get(k, 0) for r in rows)
             for k in ("drop_dup", "drop_gopher", "drop_lm", "drop_lang")}
    return {
        "partitions_done_before": len(done),
        "partitions_total": len(rows),
        "docs_written_this_run": int(summary["kept"].sum())
        if len(summary) else 0,
        "docs_kept_total": sum(r["rows"] for r in rows),
        **drops,
    }


def q_clean_corpus(sf_dir: str) -> pd.DataFrame:
    """Driver query (rows-only): run the cleaning job into a FRESH
    temp dir and return the kept (doc_id, pred_lang, ulm_bits) rows.
    Deliberately never reuses an output dir across calls: the kept set
    depends on the keep-rule code and thresholds, which a path-keyed
    cache would silently pin to whatever version wrote it first
    (resume-reuse is exercised with explicit out dirs in
    tests/test_cleanse.py).  The composition is cross-checked against
    the individually-oracled component ops in tests."""
    import shutil
    import tempfile
    out = tempfile.mkdtemp(prefix="tilemaker_ray_clean_")
    try:
        clean_corpus(sf_dir, out)
        df = pq.read_table(os.path.join(out, "docs")).to_pandas()
    finally:
        shutil.rmtree(out, ignore_errors=True)
    return (df[["doc_id", "pred_lang", "ulm_bits"]]
            .sort_values("doc_id").reset_index(drop=True))
