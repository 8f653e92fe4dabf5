"""Web-table (Common-Crawl-shaped) operators over the synthetic pages
table mandated by the input hint: (url, warc_ts, html, text, lang).

`q_domain_stats` is the canonical web-crawl rollup: registrable-domain
extraction (vectorized Arrow regex — no Python loop) followed by a
two-level aggregation: per-batch partial over (domain, lang) → one
small groupby over partials → per-domain fold. The domain key space is
~O(10^8) at crawl scale but each partial batch collapses to its
distinct (domain, lang) pairs first, so the shuffle carries partials,
not pages (the A6 push-partials pattern).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Max, Sum

from ..sources.pages import pages_path, rows_for_sf

# named group: pyarrow extract_regex requires named capture groups;
# RE2 (DuckDB) accepts the same syntax and numbers it group 1
DOMAIN_RE = r"^https?://(?P<domain>[^/]+)"


def q_domain_stats(sf_dir: str) -> pd.DataFrame:
    """Per-domain crawl stats: page count, distinct languages seen, and
    most recent crawl timestamp."""
    pages = pages_path(rows_for_sf(sf_dir))
    ds = ray.data.read_parquet(pages, columns=["url", "lang", "warc_ts"])

    def partial(b: pa.Table) -> pa.Table:
        dom = pc.struct_field(pc.extract_regex(b.column("url"), DOMAIN_RE),
                              "domain")
        t = pa.table({"domain": dom, "lang": b.column("lang"),
                      "warc_ts": b.column("warc_ts")})
        df = t.to_pandas()
        g = df.groupby(["domain", "lang"], as_index=False).agg(
            n=("warc_ts", "size"), last_ts=("warc_ts", "max"))
        return pa.Table.from_pandas(g, preserve_index=False)

    per_dl = (ds.map_batches(partial, batch_format="pyarrow")
                .groupby(["domain", "lang"])
                .aggregate(Sum("n", alias_name="n"),
                           Max("last_ts", alias_name="last_ts")))
    out = (per_dl.groupby("domain")
                 .aggregate(Sum("n", alias_name="n_pages"),
                            Count(alias_name="n_langs"),
                            Max("last_ts", alias_name="last_crawl")))
    df = out.to_pandas().sort_values("domain").reset_index(drop=True)
    df["n_pages"] = df["n_pages"].astype("int64")
    df["n_langs"] = df["n_langs"].astype("int64")
    return df[["domain", "n_pages", "n_langs", "last_crawl"]]


def domain_stats_oracle_sql(pages_dir: str) -> str:
    return f"""
        WITH p AS (
          SELECT regexp_extract(url, '{DOMAIN_RE}', 1) AS domain,
                 lang, warc_ts
          FROM read_parquet('{pages_dir}/*.parquet')
        )
        SELECT domain,
               count(*) AS n_pages,
               count(DISTINCT lang) AS n_langs,
               max(warc_ts) AS last_crawl
        FROM p GROUP BY domain ORDER BY domain
    """
