"""Text-analysis operators over the documents table — the
training-data-pipeline extensions (language-ID, quality scoring, token
counting, document fingerprinting). All per-batch vectorized; the
language-ID actor compiles its n-gram profiles once per actor (ST1
pattern).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

STOPWORDS = ("the", "a")


def q_token_count(sf_dir: str) -> pd.DataFrame:
    """Whitespace token count + char count per document."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def counts(b: pa.Table) -> pa.Table:
        txt = b.column("text").to_pandas()
        return pa.table({
            "doc_id": b.column("doc_id"),
            "n_tokens": pa.array(txt.str.split(" ").str.len().astype("int64")),
            "n_chars": pa.array(txt.str.len().astype("int64")),
        })

    return ds.map_batches(counts, batch_format="pyarrow").to_pandas()


def q_quality_score(sf_dir: str) -> pd.DataFrame:
    """Quality heuristics: stopword ratio (fixed list), mean token
    length — rounded to 6 decimals for oracle comparison."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def score(b: pa.Table) -> pa.Table:
        txt = b.column("text").to_pandas()
        toks = txt.str.split(" ")
        n = toks.str.len().astype("int64")
        stop = toks.map(lambda ws: sum(1 for w in ws if w in STOPWORDS))
        tot_len = toks.map(lambda ws: sum(len(w) for w in ws))
        return pa.table({
            "doc_id": b.column("doc_id"),
            "stop_ratio": pa.array((stop / n).round(6)),
            "mean_tok_len": pa.array((tot_len / n).round(6)),
        })

    return ds.map_batches(score, batch_format="pyarrow").to_pandas()


class LangId:
    """n-gram-frequency language ID (heuristic, no model): per-actor
    profile of common words per language, argmax vote. No SQL oracle —
    rows-only check; accuracy asserted in tests against the lang
    column is NOT meaningful (synthetic text), so this evidences the
    actor-pool plumbing and a deterministic output contract."""

    PROFILES = {
        "en": {"the", "and", "of", "travel", "city", "guide"},
        "de": {"der", "die", "und", "stadt"},
        "fr": {"le", "la", "et", "ville"},
        "es": {"el", "la", "y", "ciudad"},
    }

    def __init__(self):
        self.profiles = {k: frozenset(v) for k, v in self.PROFILES.items()}

    def __call__(self, b: pa.Table) -> pa.Table:
        txt = b.column("text").to_pylist()
        langs = []
        scores = []
        for t in txt:
            words = set(t.split(" "))
            best, bs = "und", 0
            for lang, prof in sorted(self.profiles.items()):
                s = len(words & prof)
                if s > bs:
                    best, bs = lang, s
            langs.append(best)
            scores.append(bs)
        return pa.table({
            "doc_id": b.column("doc_id"),
            "pred_lang": pa.array(langs, pa.string()),
            "evidence": pa.array(scores, pa.int64()),
        })


def q_langid(sf_dir: str) -> pd.DataFrame:
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    return ds.map_batches(LangId, batch_format="pyarrow", concurrency=2).to_pandas()


FNV_OFFSET = 0xCBF29CE484222325
FNV_PRIME = 0x100000001B3


def fnv1a_bytes_vec(texts: pd.Series) -> np.ndarray:
    """Deterministic 64-bit FNV-1a per text (document fingerprint)."""
    out = np.empty(len(texts), dtype=np.uint64)
    for i, t in enumerate(texts):
        h = FNV_OFFSET
        for bch in t.encode():
            h ^= bch
            h = (h * FNV_PRIME) & 0xFFFFFFFFFFFFFFFF
        out[i] = h
    return out


def q_fingerprint(sf_dir: str) -> pd.DataFrame:
    """Document fingerprint: FNV-1a over the text bytes (stable hash —
    Python's hash() is salted). Returned as hex to dodge signed-int
    round-trips. Rows-only (no SQL hash equivalent in DuckDB that
    matches FNV)."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def fp(b: pa.Table) -> pa.Table:
        h = fnv1a_bytes_vec(b.column("text").to_pandas())
        return pa.table({
            "doc_id": b.column("doc_id"),
            "fingerprint": pa.array([format(x, "016x") for x in h], pa.string()),
        })

    return ds.map_batches(fp, batch_format="pyarrow").to_pandas()


ORACLES = {
    "token_count": """
        SELECT doc_id,
               len(string_split(text, ' ')) AS n_tokens,
               length(text) AS n_chars
        FROM documents
    """,
    "quality_score": """
        SELECT doc_id,
               round(len(list_filter(string_split(text, ' '),
                                     w -> w IN ('the', 'a')))
                     / CAST(len(string_split(text, ' ')) AS DOUBLE), 6) AS stop_ratio,
               round(list_sum(list_transform(string_split(text, ' '),
                                             w -> length(w)))
                     / CAST(len(string_split(text, ' ')) AS DOUBLE), 6) AS mean_tok_len,
        FROM documents
    """,
}
