"""Distributed BPE tokenizer training over the documents table — the
tokenizer-induction stage of an LLM data pipeline (Sennrich et al.
2016, "Neural Machine Translation of Rare Words with Subword Units";
the same word-frequency-table formulation sentencepiece/HF trainers
use).

Scale shape (100 TB corpus):
- ONE corpus-volume pass builds the word-frequency table (per-batch
  partial counts → bucketed groupby sum) — after that, every merge
  iteration runs over the VOCAB-sized table only (~10^5-10^6 rows at
  web scale, constant per iteration), so k merges cost k tiny
  shuffles, not k corpus passes.
- Each iteration: per-word adjacent-symbol-pair counts weighted by
  word frequency (map_batches partial) → groupby(pair-bucket) sum →
  per-block top-1 → driver top-1 (count desc, pair asc — ties are
  deterministic). The merge is applied to the word table in the same
  distributed pass that starts the next iteration; the driver only
  ever holds the k merge pairs.
- `bpe_apply` tokenizes with the learned ranks as a broadcast table
  inside an actor pool (ST1 pattern).

Determinism: counts are integers and the tie-break is lexicographic,
so training reproduces bit-identically across runs/retries — verified
against a pure-Python reference implementation in tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

# End-of-word sentinel.  NOT "\x00": pandas' string hashtable
# (factorize / groupby keys / hash_pandas_object) truncates at
# embedded NUL bytes, which silently MERGED the pair ('x', 'y\x00')
# with ('x', 'y') in the distributed count groupby — the root cause
# of the r4 "bit-identical" flake (caught by the block-order
# invariance test; see tests/test_ops.py::test_bpe_block_order_
# invariance and test_pandas_nul_hashing_is_why_eow_is_not_nul).
# U+E000 is private-use: never produced by the corpus generators and
# stable under pandas hashing.
EOW = "\ue000"
BPE_MERGES = 24       # default merge count for the query entry
SYM_SEP = "\x01"  # joins symbol sequences into one string column


def _pairs_of(syms: list[str]) -> list[tuple[str, str]]:
    return list(zip(syms[:-1], syms[1:]))


def _apply_merge(syms: list[str], a: str, b: str) -> list[str]:
    out = []
    i, n = 0, len(syms)
    while i < n:
        if i + 1 < n and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def bpe_train_reference(word_freq: dict[str, int],
                        n_merges: int) -> list[tuple[str, str]]:
    """Pure-Python reference BPE trainer (the classic algorithm,
    single-threaded) — the correctness twin the distributed trainer is
    tested against."""
    table = {w: [*w, EOW] for w in word_freq}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in table.items():
            f = word_freq[w]
            for p in _pairs_of(syms):
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        table = {w: _apply_merge(s, *best) for w, s in table.items()}
    return merges


def _word_freq_ds(sf_dir: str) -> ray.data.Dataset:
    """(word, n) over the corpus: per-batch partial counts (the
    combiner), ONE bucketed groupby sum — the only corpus-volume
    exchange in training."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["text"])

    def partial(b: pa.Table) -> pa.Table:
        toks = (b.column("text").to_pandas().str.split(" ").explode())
        vc = toks.value_counts()
        w = vc.index.to_numpy(dtype=object)
        return pa.table({
            "wb": pa.array((pd.util.hash_pandas_object(
                pd.Series(w), index=False).to_numpy() % 256)
                .astype(np.int64)),
            "word": pa.array(w, pa.string()),
            "n": pa.array(vc.to_numpy().astype(np.int64)),
        })

    def combine(g: pd.DataFrame) -> pa.Table:
        agg = g.groupby("word", sort=True)["n"].sum()
        return pa.table({"word": pa.array(agg.index, pa.string()),
                         "n": pa.array(agg.to_numpy().astype(np.int64))})

    return (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("wb").map_groups(combine, batch_format="pandas"))


def bpe_train(sf_dir: str,
              n_merges: int = BPE_MERGES) -> list[tuple[str, str]]:
    """Distributed BPE training: returns the ordered merge list."""
    return bpe_train_from_words(_word_freq_ds(sf_dir), n_merges)


def bpe_train_from_words(words: ray.data.Dataset,
                         n_merges: int = BPE_MERGES
                         ) -> list[tuple[str, str]]:
    """Train over a (word, n) Dataset.  Block-order independent BY
    CONSTRUCTION: pair counts are exact integer sums over a complete
    pair-bucket groupby, and the merge pick is the total order
    (count desc, a asc, b asc) — the same tie-break as
    bpe_train_reference — applied first per bucket then across bucket
    winners, so ties can never be resolved by arrival order
    (test-asserted under permuted/repartitioned inputs,
    tests/test_ops.py::test_bpe_block_order_invariance)."""
    words = words.materialize()

    # symbol table rides as (word, syms joined by SYM_SEP, n)
    def init_syms(b: pa.Table) -> pa.Table:
        ws = b.column("word").to_pylist()
        return pa.table({
            "word": b.column("word"),
            "syms": pa.array([SYM_SEP.join([*w, EOW]) for w in ws],
                             pa.string()),
            "n": b.column("n"),
        })

    table = words.map_batches(init_syms,
                              batch_format="pyarrow").materialize()
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        def pair_partial(b: pa.Table) -> pa.Table:
            acc: dict[tuple[str, str], int] = {}
            ns = b.column("n").to_numpy()
            for k, s in enumerate(b.column("syms").to_pylist()):
                syms = s.split(SYM_SEP)
                f = int(ns[k])
                for p in _pairs_of(syms):
                    acc[p] = acc.get(p, 0) + f
            ka = [a for a, _ in acc]
            kb = [b2 for _, b2 in acc]
            return pa.table({
                "a": pa.array(ka, pa.string()),
                "b": pa.array(kb, pa.string()),
                "n": pa.array(list(acc.values()), pa.int64()),
                "pb": pa.array((pd.util.hash_pandas_object(
                    pd.Series([x + SYM_SEP + y
                               for x, y in zip(ka, kb)], dtype=object),
                    index=False).to_numpy() % 256).astype(np.int64)),
            })

        def local_top(g: pd.DataFrame) -> pd.DataFrame:
            agg = (g.groupby(["a", "b"], sort=True)["n"].sum()
                    .reset_index()
                    .sort_values(["n", "a", "b"],
                                 ascending=[False, True, True],
                                 kind="stable"))
            return agg.head(1)

        tops = (table.map_batches(pair_partial, batch_format="pyarrow")
                     .groupby("pb")
                     .map_groups(local_top, batch_format="pandas")
                     .to_pandas())
        if len(tops) == 0:
            break
        tops = tops.sort_values(["n", "a", "b"],
                                ascending=[False, True, True],
                                kind="stable")
        a, b = str(tops.iloc[0]["a"]), str(tops.iloc[0]["b"])
        merges.append((a, b))

        def apply(bt: pa.Table, a=a, b=b) -> pa.Table:
            out = [SYM_SEP.join(_apply_merge(s.split(SYM_SEP), a, b))
                   for s in bt.column("syms").to_pylist()]
            return pa.table({"word": bt.column("word"),
                             "syms": pa.array(out, pa.string()),
                             "n": bt.column("n")})

        table = table.map_batches(apply,
                                  batch_format="pyarrow").materialize()
    return merges


def q_bpe_merges(sf_dir: str,
                 n_merges: int = BPE_MERGES) -> pd.DataFrame:
    """Rows-only driver entry: the learned merge sequence (rank, a, b).
    No SQL oracle (iterative algorithm); bit-identical to the
    pure-Python reference trainer by test."""
    merges = bpe_train(sf_dir, n_merges)
    return pd.DataFrame({
        "rank": np.arange(len(merges), dtype=np.int64),
        "a": [a.replace(EOW, "</w>") for a, _ in merges],
        "b": [b.replace(EOW, "</w>") for _, b in merges],
    })


class BpeTokenizer:
    """Apply-side tokenizer (actor-pool stage): greedy lowest-rank
    merging, one word cache per actor."""

    def __init__(self, merges: list[tuple[str, str]]):
        self.rank = {m: r for r, m in enumerate(merges)}
        self.cache: dict[str, list[str]] = {}

    def word(self, w: str) -> list[str]:
        got = self.cache.get(w)
        if got is None:
            syms = [*w, EOW]
            while len(syms) > 1:
                ranked = [(self.rank.get(p, 1 << 30), i)
                          for i, p in enumerate(_pairs_of(syms))]
                r, i = min(ranked)
                if r == 1 << 30:
                    break
                syms = (syms[:i] + [syms[i] + syms[i + 1]]
                        + syms[i + 2:])
            got = self.cache[w] = syms
        return got

    def __call__(self, b: pa.Table) -> pa.Table:
        counts = [sum(len(self.word(w)) for w in t.split(" "))
                  for t in b.column("text").to_pylist()]
        return pa.table({"doc_id": b.column("doc_id"),
                         "n_bpe_trained_tokens": pa.array(counts,
                                                          pa.int64())})


def bpe_apply_ds(sf_dir: str,
                 merges: list[tuple[str, str]]) -> ray.data.Dataset:
    """Tokenize the corpus with learned merges (broadcast ranks, per-
    actor word cache): (doc_id, n_bpe_trained_tokens)."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    return ds.map_batches(BpeTokenizer, batch_format="pyarrow",
                          fn_constructor_kwargs={"merges": merges},
                          concurrency=(1, 8))
