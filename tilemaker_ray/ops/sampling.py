"""Deterministic sampling operators for training-data pipelines.

Random sampling on a 100 TB re-runnable pipeline must NOT use RNG
state: a resumed/retried task would draw a different sample. Both ops
key the decision on a content hash (md5 digest[8:16] little-endian —
the repo-wide md5_number_lower convention), so the sample is a pure
function of the data: stable across runs, retries, and partition
boundaries, and exactly reproducible in the DuckDB oracle.

- q_hash_sample: Bernoulli 1-in-MOD sample (hash % MOD == 0). Embarras-
  singly parallel, zero shuffle.
- q_stratified_sample: K docs per language by (hash, doc_id) order —
  a balanced subset. Per-batch combiner keeps only the local top-K per
  lang, so the shuffle carries <= K rows per (batch, lang), then one
  tiny grouped fold.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from .text import content_hash64

SAMPLE_MOD = 10
STRATA_K = 20


def q_hash_sample(sf_dir: str) -> pd.DataFrame:
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "lang", "text", "n_chars"])

    def keep(b: pa.Table) -> pa.Table:
        h = content_hash64(b.column("text").to_pylist())
        mask = pa.array(h % SAMPLE_MOD == 0)
        return b.filter(mask).select(["doc_id", "lang", "n_chars"])

    df = ds.map_batches(keep, batch_format="pyarrow").to_pandas()
    return df.sort_values("doc_id").reset_index(drop=True)


def q_stratified_sample(sf_dir: str) -> pd.DataFrame:
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "lang", "text"])

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "doc_id": b.column("doc_id").to_numpy(),
            "lang": b.column("lang").to_pylist(),
            "h": content_hash64(b.column("text").to_pylist()),
        })
        g = (df.sort_values(["h", "doc_id"], kind="stable")
               .groupby("lang", as_index=False).head(STRATA_K))
        return pa.Table.from_pandas(g, preserve_index=False)

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["h", "doc_id"], kind="stable").head(STRATA_K)
        return g[["doc_id", "lang"]]

    out = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("lang").map_groups(topk, batch_format="pandas"))
    return (out.to_pandas().sort_values(["lang", "doc_id"])
               .reset_index(drop=True))


WEIGHT_MOD = 1000


def q_weighted_sample(sf_dir: str) -> pd.DataFrame:
    """Weight-proportional Bernoulli sample, integer-exact and
    deterministic: keep a doc iff hash64(text) % WEIGHT_MOD < n_chars,
    so inclusion probability ≈ n_chars / WEIGHT_MOD (longer docs
    sampled more) while staying a pure function of the content —
    resume/retry-stable like the uniform hash sampler, with no float
    key whose ordering could diverge from the oracle."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "lang", "text", "n_chars"])

    def keep(b: pa.Table) -> pa.Table:
        h = content_hash64(b.column("text").to_pylist())
        w = b.column("n_chars").to_numpy().astype(np.uint64)
        mask = pa.array(h % WEIGHT_MOD < w)
        return b.filter(mask).select(["doc_id", "lang", "n_chars"])

    df = ds.map_batches(keep, batch_format="pyarrow").to_pandas()
    return df.sort_values("doc_id").reset_index(drop=True)


def q_lang_balance(sf_dir: str) -> pd.DataFrame:
    """Source-mixing / rebalancing (the data-mixing stage of an LLM
    training pipeline): downsample every language to the size of the
    SMALLEST one with a deterministic integer rule — keep a doc iff
    hash64(text) % n_lang < n_min — so expected kept per language is
    n_min and the sample is a pure function of the data (retry/resume
    stable, no float threshold whose rounding could diverge from the
    oracle).  Two passes: a tiny per-lang count groupby (broadcast),
    then an embarrassingly-parallel filter."""
    from ray.data.aggregate import Count
    counts = (ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                    columns=["lang"])
              .groupby("lang").aggregate(Count(alias_name="n"))
              .to_pandas())
    n_by_lang = dict(zip(counts["lang"], counts["n"].astype(np.uint64)))
    mn = np.uint64(counts["n"].min())

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "lang", "text"])

    def keep(b: pa.Table) -> pa.Table:
        h = content_hash64(b.column("text").to_pylist())
        lang = b.column("lang").to_pandas()
        n = lang.map(n_by_lang).to_numpy(dtype=np.uint64)
        mask = pa.array(h % n < mn)
        return b.filter(mask).select(["doc_id", "lang"])

    df = ds.map_batches(keep, batch_format="pyarrow").to_pandas()
    return df.sort_values("doc_id").reset_index(drop=True)


ORACLES = {
    "lang_balance": """
        WITH c AS (
          SELECT lang, count(*) AS n FROM documents GROUP BY lang
        ), m AS (SELECT min(n) AS mn FROM c)
        SELECT d.doc_id, d.lang
        FROM documents d JOIN c USING (lang), m
        WHERE md5_number_lower(d.text) % c.n < m.mn
        ORDER BY d.doc_id
    """,
    "weighted_sample": f"""
        SELECT doc_id, lang, n_chars FROM documents
        WHERE md5_number_lower(text) % {WEIGHT_MOD} < n_chars
        ORDER BY doc_id
    """,
    "hash_sample": f"""
        SELECT doc_id, lang, n_chars FROM documents
        WHERE md5_number_lower(text) % {SAMPLE_MOD} = 0
        ORDER BY doc_id
    """,
    "stratified_sample": f"""
        WITH r AS (
          SELECT doc_id, lang,
                 row_number() OVER (PARTITION BY lang
                                    ORDER BY md5_number_lower(text), doc_id)
                   AS rk
          FROM documents
        )
        SELECT doc_id, lang FROM r WHERE rk <= {STRATA_K}
        ORDER BY lang, doc_id
    """,
}
