"""Mergeable sketches over Ray Data — the custom-operator pattern
where per-batch PARTIAL SKETCHES shuffle instead of raw rows:
HyperLogLog (Flajolet et al. 2007; elementwise-max register merge),
Count-Min (Cormode & Muthukrishnan 2005; elementwise-sum merge) with
exact sketch→verify heavy hitters, and Bloom filters (bitwise-OR
merge) accelerating an exact distributed semi-join.  Each partial is
constant-size, so the combine step costs O(batches), not O(rows).

Hashes reuse the repo-wide md5 digest[8:16] convention, so the sketch
is deterministic across runs/retries. Estimator: the standard HLL
bias-corrected harmonic mean with small-range (linear counting) and
the 64-bit regime needing no large-range correction.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

HLL_P = 12                    # 2^12 = 4096 registers, ~1.6% rel. error
HLL_M = 1 << HLL_P
_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)


def _hash64(values: list[str]) -> np.ndarray:
    return np.array([int.from_bytes(hashlib.md5(v.encode()).digest()[8:16],
                                    "little") for v in values],
                    dtype=np.uint64)


def hll_registers(h: np.ndarray) -> np.ndarray:
    """Register array (uint8, len m) for a batch of 64-bit hashes."""
    reg = np.zeros(HLL_M, dtype=np.uint8)
    if len(h) == 0:
        return reg
    idx = (h >> np.uint64(64 - HLL_P)).astype(np.int64)
    rest = (h << np.uint64(HLL_P)) | np.uint64((1 << HLL_P) - 1)
    # rank = position of the leftmost 1-bit in the remaining 64-P bits
    nlz = np.zeros(len(h), dtype=np.uint8)
    cur = rest.copy()
    mask = np.uint64(1) << np.uint64(63)
    alive = np.ones(len(h), dtype=bool)
    for r in range(64 - HLL_P + 1):
        hit = alive & ((cur & mask) != 0)
        nlz[hit] = r + 1
        alive &= ~hit
        if not alive.any():
            break
        cur = cur << np.uint64(1)
    np.maximum.at(reg, idx, nlz)
    return reg


def hll_estimate(reg: np.ndarray) -> float:
    m = float(HLL_M)
    est = _ALPHA * m * m / np.sum(np.power(2.0, -reg.astype(np.float64)))
    zeros = int((reg == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)      # linear counting, small range
    return float(est)


def q_hll_distinct_urls(sf_dir: str) -> pd.DataFrame:
    """Approximate distinct-URL count over the pages table: per-batch
    register partials (one 4096-byte row per batch), a driver-side
    elementwise-max merge, one estimate. no_oracle (approximate by
    construction) — error bound asserted in tests vs exact."""
    from ..sources.pages import pages_path, rows_for_sf
    pages = pages_path(rows_for_sf(sf_dir))
    ds = ray.data.read_parquet(pages, columns=["url"])

    def partial(b: pa.Table) -> pa.Table:
        reg = hll_registers(_hash64(b.column("url").to_pylist()))
        return pa.table({"reg": pa.array([reg.tobytes()], pa.binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    merged = np.zeros(HLL_M, dtype=np.uint8)
    for blob in parts["reg"]:
        np.maximum(merged, np.frombuffer(blob, dtype=np.uint8), out=merged)
    return pd.DataFrame({"estimate": [round(hll_estimate(merged), 1)]})


# --- Count-Min sketch + exact heavy hitters --------------------------------
#
# The CMS (Cormode & Muthukrishnan 2005, public algorithm) is a LINEAR
# sketch: per-batch partials merge by elementwise SUM, so the shuffle
# carries one d*w count matrix per batch regardless of input size.
# Heavy hitters use the sketch->verify pattern that keeps the result
# EXACT (and therefore SQL-oracle-able): CMS only ever over-estimates,
# so "estimate >= T" has no false negatives; a second pass recounts
# exactly, shuffling only the candidate tokens.

CMS_D = 4                     # hash rows
CMS_W = 4096                  # counters per row; eps ~ e/w of total mass


def _cms_indices(tokens: list[str]) -> np.ndarray:
    """(n, d) counter indices from the md5 digest (repo-wide
    deterministic-hash convention): four 4-byte slices mod w."""
    idx = np.empty((len(tokens), CMS_D), dtype=np.int64)
    for i, t in enumerate(tokens):
        dg = hashlib.md5(t.encode()).digest()
        for r in range(CMS_D):
            idx[i, r] = int.from_bytes(dg[4 * r:4 * r + 4], "little") % CMS_W
    return idx


def cms_partial(tokens: list[str], counts: np.ndarray) -> np.ndarray:
    """d*w int64 CMS for tokens with multiplicities `counts`."""
    sk = np.zeros((CMS_D, CMS_W), dtype=np.int64)
    if len(tokens):
        idx = _cms_indices(tokens)
        for r in range(CMS_D):
            np.add.at(sk[r], idx[:, r], counts)
    return sk


def cms_estimate(sk: np.ndarray, tokens: list[str]) -> np.ndarray:
    """Point estimates (min over rows) — always >= the true count."""
    if not tokens:
        return np.zeros(0, dtype=np.int64)
    idx = _cms_indices(tokens)
    ests = np.stack([sk[r][idx[:, r]] for r in range(CMS_D)])
    return ests.min(axis=0)


def _doc_token_counts(b: "pa.Table") -> tuple[list[str], np.ndarray]:
    """Distinct tokens + multiplicities for a documents batch (same
    single-space split convention as ops/text.py top_terms)."""
    toks: list[str] = []
    for t in b.column("text").to_pylist():
        toks.extend(w for w in t.split(" ") if w)
    if not toks:
        return [], np.zeros(0, dtype=np.int64)
    uniq, counts = np.unique(np.asarray(toks, dtype=object), return_counts=True)
    return list(uniq), counts.astype(np.int64)


def q_cms_heavy_hitters(sf_dir: str) -> pd.DataFrame:
    """Exact corpus heavy hitters via a two-pass CMS pipeline: pass 1
    merges per-batch sketch partials (64 KB each — a constant-size
    shuffle); the threshold T = max(10, N // 2000) comes from the
    sketch's exact total mass N; pass 2 re-reads the corpus, keeps
    only tokens whose CMS estimate >= T (a superset of the true heavy
    hitters) and shuffles their (token, n) partials to an exact
    groupby-sum, filtered >= T.  Output is exact, matching plain
    GROUP BY/HAVING SQL, while the wide shuffle carries only
    candidate tokens instead of the whole vocabulary."""
    path = f"{sf_dir}/documents.parquet"
    ds = ray.data.read_parquet(path, columns=["text"])

    def partial(b: pa.Table) -> pa.Table:
        toks, counts = _doc_token_counts(b)
        sk = cms_partial(toks, counts)
        return pa.table({"sk": pa.array([sk.tobytes()], pa.binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    sk = np.zeros((CMS_D, CMS_W), dtype=np.int64)
    for blob in parts["sk"]:
        sk += np.frombuffer(blob, dtype=np.int64).reshape(CMS_D, CMS_W)
    total = int(sk[0].sum())          # every occurrence adds 1 per row
    thresh = max(10, total // 2000)
    sk_ref = ray.put(sk)

    def candidates(b: pa.Table) -> pa.Table:
        toks, counts = _doc_token_counts(b)
        if not toks:
            return pa.table({"token": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        est = cms_estimate(ray.get(sk_ref), toks)
        keep = est >= thresh
        return pa.table({"token": pa.array([t for t, k in zip(toks, keep) if k],
                                           pa.string()),
                         "n": pa.array(counts[keep], pa.int64())})

    from ray.data.aggregate import Sum
    ds2 = ray.data.read_parquet(path, columns=["text"])
    out = (ds2.map_batches(candidates, batch_format="pyarrow")
              .groupby("token").aggregate(Sum("n", alias_name="n"))).to_pandas()
    out = out[out["n"] >= thresh]
    out["n"] = out["n"].astype("int64")
    return (out.sort_values(["n", "token"], ascending=[False, True])
               .reset_index(drop=True))


def cms_heavy_hitters_oracle_sql() -> str:
    return """
        WITH tok AS (
          SELECT unnest(string_split(text, ' ')) AS token FROM documents
        ), tf AS (
          SELECT token, count(*)::BIGINT AS n FROM tok
          WHERE token <> '' GROUP BY token
        ), tot AS (SELECT sum(n)::BIGINT AS total FROM tf)
        SELECT token, n FROM tf, tot
        WHERE n >= greatest(10, total // 2000)
        ORDER BY n DESC, token
    """


# --- Bloom filter + exact semi-join ----------------------------------------
#
# The 100 TB semi-join pattern: the build side's KEYS may be too many
# to broadcast raw, but a Bloom filter of them is small and merges by
# bitwise OR (per-batch partials).  Broadcast the filter, prefilter
# the probe side (no false negatives, ~FPR false positives), then
# confirm the surviving candidates EXACTLY with a key-partitioned
# cogroup — the all-to-all shuffle carries only candidates instead of
# the full probe table.  Output is exact => SQL-oracle-able.

BLOOM_BITS_PER_KEY = 12
BLOOM_K = 5


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public domain constant set) —
    the bloom probe hash; exactness never depends on it."""
    x = x.astype(np.uint64)
    with np.errstate(over="ignore"):
        x = (x + np.uint64(0x9E3779B97F4A7C15))
        x ^= x >> np.uint64(30)
        x *= np.uint64(0xBF58476D1CE4E5B9)
        x ^= x >> np.uint64(27)
        x *= np.uint64(0x94D049BB133111EB)
        x ^= x >> np.uint64(31)
    return x


def bloom_bits(keys: np.ndarray, m_bits: int) -> np.ndarray:
    """Bloom bitmap (uint8 array, m_bits/8 bytes) for int64 keys via
    Kirsch–Mitzenmacher double hashing: index_i = h1 + i*h2 mod m."""
    bits = np.zeros(m_bits // 8, dtype=np.uint8)
    if len(keys) == 0:
        return bits
    h1 = _splitmix64(keys)
    h2 = _splitmix64(h1) | np.uint64(1)
    for i in range(BLOOM_K):
        with np.errstate(over="ignore"):
            idx = ((h1 + np.uint64(i) * h2) % np.uint64(m_bits)).astype(np.int64)
        np.bitwise_or.at(bits, idx >> 3, (1 << (idx & 7)).astype(np.uint8))
    return bits


def bloom_contains(bits: np.ndarray, keys: np.ndarray, m_bits: int) -> np.ndarray:
    if len(keys) == 0:
        return np.zeros(0, dtype=bool)
    h1 = _splitmix64(keys)
    h2 = _splitmix64(h1) | np.uint64(1)
    ok = np.ones(len(keys), dtype=bool)
    for i in range(BLOOM_K):
        with np.errstate(over="ignore"):
            idx = ((h1 + np.uint64(i) * h2) % np.uint64(m_bits)).astype(np.int64)
        ok &= (bits[idx >> 3] & (1 << (idx & 7)).astype(np.uint8)) != 0
    return ok


def q_bloom_semi_join(sf_dir: str) -> pd.DataFrame:
    """Events of high-balance customers (exact bloom-accelerated
    semi-join): build-side partials (bloom bitmaps, OR-merged) over
    customer keys with c_acctbal > 7000; broadcast the filter;
    prefilter events by user_id; confirm candidates exactly with a
    tagged-union cogroup on the key (the dedup/label-propagation
    idiom); count surviving events per event_type."""
    m_bits = 1 << 17          # sized for ~10k build keys at 12 bits/key
    cust = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                                 columns=["c_custkey", "c_acctbal"])

    def build_partial(b: pa.Table) -> pa.Table:
        bal = b.column("c_acctbal").to_numpy()
        keys = b.column("c_custkey").to_numpy()[bal > 7000]
        return pa.table({"bits": pa.array([bloom_bits(keys, m_bits).tobytes()],
                                          pa.binary())})

    parts = cust.map_batches(build_partial, batch_format="pyarrow").to_pandas()
    bits = np.zeros(m_bits // 8, dtype=np.uint8)
    for blob in parts["bits"]:
        np.bitwise_or(bits, np.frombuffer(blob, dtype=np.uint8), out=bits)
    bits_ref = ray.put(bits)

    def prefilter(b: pa.Table) -> pa.Table:
        keys = b.column("user_id").to_numpy()
        ok = bloom_contains(ray.get(bits_ref), keys, m_bits)
        return pa.table({
            "key": pa.array(keys[ok], pa.int64()),
            "event_type": pa.array(
                np.asarray(b.column("event_type").to_pylist(), dtype=object)[ok],
                pa.string()),
            "t": pa.array(np.ones(int(ok.sum()), dtype=np.int8), pa.int8()),
        })

    events = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                                   columns=["user_id", "event_type"])
    candidates = events.map_batches(prefilter, batch_format="pyarrow")

    def build_keys(b: pa.Table) -> pa.Table:
        bal = b.column("c_acctbal").to_numpy()
        keys = b.column("c_custkey").to_numpy()[bal > 7000]
        return pa.table({
            "key": pa.array(keys, pa.int64()),
            "event_type": pa.array([""] * len(keys), pa.string()),
            "t": pa.array(np.zeros(len(keys), dtype=np.int8), pa.int8()),
        })

    cust2 = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                                  columns=["c_custkey", "c_acctbal"])
    tagged = candidates.union(cust2.map_batches(build_keys,
                                                batch_format="pyarrow"))

    def confirm(g: pd.DataFrame) -> pa.Table:
        # arrow output: keeps empty groups string-typed (pandas object
        # columns trip Ray's block-size estimator on size-0 frames)
        vals = (g.loc[g["t"] == 1, "event_type"].tolist()
                if (g["t"] == 0).any() else [])
        return pa.table({"event_type": pa.array(vals, pa.string())})

    from ray.data.aggregate import Count
    out = (tagged.groupby("key").map_groups(confirm, batch_format="pandas")
                 .groupby("event_type").aggregate(Count(alias_name="n"))
           ).to_pandas()
    if out.empty:          # no matches at this scale: typed empty frame
        out = pd.DataFrame({"event_type": pd.Series([], dtype=object),
                            "n": pd.Series([], dtype="int64")})
    out["n"] = out["n"].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


def bloom_semi_join_oracle_sql() -> str:
    return """
        SELECT event_type, count(*)::BIGINT AS n
        FROM events
        WHERE user_id IN (SELECT c_custkey FROM customer
                          WHERE c_acctbal > 7000)
        GROUP BY event_type
        ORDER BY event_type
    """


# --- KLL-style mergeable quantile sketch ------------------------------------

KLL_K = 200  # compactor width; rank error ~ O(1/k) observed, test-asserted


class QuantileSketch:
    """Deterministic KLL-style quantile sketch (the Karnin/Lang/Liberty
    2016 compactor hierarchy, with deterministic alternating selection
    in place of coin flips — same shape and memory, deterministic
    across runs/retries like every sketch in this module).  Level i
    holds values of weight 2^i; a level past k values sorts, promotes
    every other value to level i+1 and discards the rest.  Memory is
    O(k log(n/k)); merge = levelwise concatenation + one compaction
    pass, which is what makes per-batch partials shuffle-friendly."""

    def __init__(self, k: int = KLL_K):
        self.k = k
        self.levels: list[np.ndarray] = [np.empty(0, np.float64)]
        self.parity: list[int] = [0]

    def insert(self, values: np.ndarray) -> "QuantileSketch":
        self.levels[0] = np.concatenate(
            [self.levels[0], np.asarray(values, np.float64)])
        self._compact()
        return self

    def _grow(self, n: int) -> None:
        while len(self.levels) < n:
            self.levels.append(np.empty(0, np.float64))
            self.parity.append(0)

    def _compact(self) -> None:
        i = 0
        while i < len(self.levels):
            if len(self.levels[i]) > self.k:
                s = np.sort(self.levels[i])
                off = self.parity[i]
                self.parity[i] ^= 1
                self._grow(i + 2)
                self.levels[i] = np.empty(0, np.float64)
                self.levels[i + 1] = np.concatenate(
                    [self.levels[i + 1], s[off::2]])
            i += 1

    def merge_level(self, level: int, values: np.ndarray) -> None:
        self._grow(level + 1)
        self.levels[level] = np.concatenate(
            [self.levels[level], np.asarray(values, np.float64)])
        self._compact()

    def quantile(self, qs: list[float]) -> list[float]:
        vals = np.concatenate(self.levels)
        w = np.concatenate([np.full(len(v), 1 << i, np.int64)
                            for i, v in enumerate(self.levels)])
        order = np.argsort(vals, kind="stable")
        vals, w = vals[order], w[order]
        cum = np.cumsum(w)
        total = cum[-1]
        out = []
        for q in qs:
            idx = int(np.searchsorted(cum, q * total, side="left"))
            out.append(float(vals[min(idx, len(vals) - 1)]))
        return out


QSKETCH_QS = [0.5, 0.9, 0.99]


def q_quantile_sketch(sf_dir: str) -> pd.DataFrame:
    """Approximate l_extendedprice quantiles via mergeable per-batch
    KLL partials: each batch emits its compactor levels as (level,
    float64-bytes) rows — O(k log n) bytes per batch, never the rows —
    and the driver merges canonically (rows sorted, so the result is
    independent of block arrival order).  no_oracle (approximate by
    construction); rank-error bound asserted in tests vs the exact
    quantile op."""
    ds = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_extendedprice"])

    def partial(b: pa.Table) -> pa.Table:
        sk = QuantileSketch().insert(
            b.column("l_extendedprice").to_numpy().astype(np.float64))
        lv = [i for i, v in enumerate(sk.levels) if len(v)]
        return pa.table({
            "level": pa.array(lv, pa.int64()),
            "vals": pa.array([sk.levels[i].tobytes() for i in lv],
                             pa.binary()),
        })

    parts = (ds.map_batches(partial, batch_format="pyarrow")
               .to_pandas().sort_values(["level", "vals"])
               .reset_index(drop=True))
    merged = QuantileSketch()
    for _, row in parts.iterrows():
        merged.merge_level(int(row["level"]),
                           np.frombuffer(row["vals"], np.float64))
    est = merged.quantile(QSKETCH_QS)
    return pd.DataFrame({"q": QSKETCH_QS,
                         "estimate": [round(v, 6) for v in est]})
