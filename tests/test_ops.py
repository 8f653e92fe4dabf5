"""Operator queries vs DuckDB oracles at sf0.001 (fast subset of the
driver's correctness gate; scripts/check_oracles.py runs the full set)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].round(9)
        elif np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype(np.int64)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def check(name, con):
    import __ray_entry__ as E
    res = E.queries()[name](SF)
    df = res if isinstance(res, pd.DataFrame) else res.to_pandas()
    exp = con.sql(E.oracle_sql()[name]).df()
    a, b = normalize(df), normalize(exp)
    assert list(a.columns) == list(b.columns)
    assert len(a) == len(b)
    pd.testing.assert_frame_equal(a, b, check_dtype=False, rtol=1e-9, atol=1e-9)


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("name", [
    "tile_assign_points", "tile_zoom_rollup", "pip_join", "knn",
    "s2_cells", "rasterize", "zonal_stats",
    "lineitem_agg", "events_window", "token_count",
    "quality_score", "dedup_keep_first", "cosine_topk",
    "fingerprint", "ngram_jaccard_pairs",
    "asof_join", "events_lag_delta", "global_quantile", "radius_join",
    "top_terms", "kmeans_assign", "hash_sample",
    "group_quantile", "tfidf_top_term", "dedup_clusters",
    "lang_vocab", "orders_running_total",
    "events_hopping_window", "embedding_stats", "events_pivot",
    "cms_heavy_hitters", "bloom_semi_join", "decontaminate",
])
def test_oracle(name, con):
    check(name, con)


@pytest.mark.usefixtures("ray_session")
def test_dup_span_chars_properties(tmp_path):
    """Substring-dedup semantics on a controlled corpus: a shared
    S-char substring covers exactly S chars in both docs; all-unique
    text covers 0; a self-repetitive doc is covered end to end."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tilemaker_ray.ops.dedup import DUP_SPAN_L, q_dup_span_chars
    assert DUP_SPAN_L == 20
    shared = "0123456789abcdefghijklmnopqrs"          # 29 unique chars
    assert len(shared) == 29
    d = tmp_path / "sf_span"
    d.mkdir()
    # neighbors of `shared` differ between the two docs, so the shared
    # run is exactly the 29 chars (shared delimiters would extend it)
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array([
            "AAAA BBBB CCCC DDDD-" + shared + "-EEEE FFFF GGGG",
            "hhhh iiii jjjj kkkk_" + shared + "_llll mmmm nnnn",
            "every gram here is globally unique, no repeats at all.",
            "Z" * 50,                                  # self-repetitive
        ]),
    }), str(d / "documents.parquet"))
    got = q_dup_span_chars(str(d)).set_index("doc_id")
    assert got.loc[0, "dup_span_chars"] == len(shared)
    assert got.loc[1, "dup_span_chars"] == len(shared)
    assert got.loc[2, "dup_span_chars"] == 0
    assert got.loc[3, "dup_span_chars"] == 50
    assert got.loc[3, "dup_span_frac"] == 1.0
    # keep-first removal: doc0 holds the first occurrence of every
    # shared gram, so only doc1 loses the 29 chars; the self-repeating
    # doc keeps one gram's worth of lead chars (positions 2.. removed)
    assert got.loc[0, "dup_removed_chars"] == 0
    assert got.loc[1, "dup_removed_chars"] == len(shared)
    assert got.loc[3, "dup_removed_chars"] == 49
    from tilemaker_ray.ops.dedup import q_dedup_substring_clean
    cl = q_dedup_substring_clean(str(d)).set_index("doc_id")
    assert shared in cl.loc[0, "clean_text"]
    assert shared not in cl.loc[1, "clean_text"]
    assert cl.loc[1, "clean_text"] == (
        "hhhh iiii jjjj kkkk_" "_llll mmmm nnnn")
    assert cl.loc[3, "clean_text"] == "Z"
    assert (cl["removed_chars"] == got["dup_removed_chars"]).all()


@pytest.mark.usefixtures("ray_session")
def test_lm_bits_hand_computed(tmp_path):
    """Smoothed-bigram LM score on a 2-doc corpus small enough to do
    by hand: N=5 tokens, V=2 vocab, C(a)=3 C(b)=2, C(ab)=2 C(ba)=1."""
    import math

    import pyarrow as pa
    import pyarrow.parquet as pq

    from tilemaker_ray.ops.text import LM_ALPHA, q_lm_bits
    assert LM_ALPHA == 0.5
    d = tmp_path / "sf_lm"
    d.mkdir()
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["a b a", "a b"]),
    }), str(d / "documents.parquet"))
    got = q_lm_bits(str(d)).set_index("doc_id")
    p1 = 3.5 / 6            # (C(a)+α)/(N+αV)
    pab = 2.5 / 4           # (C(ab)+α)/(C(a)+αV)
    pba = 1.5 / 3           # (C(ba)+α)/(C(b)+αV)
    exp0 = round(-(math.log2(p1) + math.log2(pab) + math.log2(pba)) / 3, 6)
    exp1 = round(-(math.log2(p1) + math.log2(pab)) / 2, 6)
    assert got.loc[0, "lm_bits"] == exp0
    assert got.loc[1, "lm_bits"] == exp1


@pytest.mark.usefixtures("ray_session")
def test_rolling_gram_hash_parity():
    """The vectorized Karp-Rabin production path: equal L-grams hash
    equal wherever they sit (the property dup-span relies on), distinct
    grams collide never on this corpus, and the full dup-span pipeline
    returns IDENTICAL results under 'rolling' and 'md5' hashing."""
    from tilemaker_ray.ops.dedup import (DUP_SPAN_L, _gram_hashes,
                                         dup_span_stats_ds)
    t = "abcdefghijklmnopqrstuvwxyz0123456789 the quick brown fox"
    h = _gram_hashes(t, DUP_SPAN_L, "rolling")
    assert len(h) == len(t) - DUP_SPAN_L + 1
    # same gram at two offsets hashes equal
    u = "XX" + t[5:25] + "YYYY" + t[5:25] + "Z"
    hu = _gram_hashes(u, DUP_SPAN_L, "rolling")
    assert hu[2] == hu[26]
    # all distinct grams of t hash distinct
    assert len(np.unique(h)) == len(h)
    # unicode beyond ASCII round-trips through the utf-32 view
    v = "héllo wörld ünicode — ça va très bien aujourd'hui ici"
    hv = _gram_hashes(v, DUP_SPAN_L, "rolling")
    assert len(hv) == len(v) - DUP_SPAN_L + 1

    a = (dup_span_stats_ds(SF, hash_method="md5").to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    b = (dup_span_stats_ds(SF, hash_method="rolling").to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_winnow_shared_substring_guarantee():
    """Winnowing's core property (Schleimer et al. 2003 thm): any
    shared substring of length >= W+K-1 produces at least one shared
    fingerprint hash; disjoint texts share none."""
    from tilemaker_ray.ops.text import WINNOW_K, WINNOW_W, winnow_hashes
    shared = "a common passage long enough to straddle a full window"
    assert len(shared) >= WINNOW_W + WINNOW_K - 1
    h1 = set(winnow_hashes("left prefix text " + shared).tolist())
    h2 = set(winnow_hashes(shared + " unrelated suffix words").tolist())
    assert h1 & h2
    d1 = set(winnow_hashes("abcdefgh" * 8).tolist())
    d2 = set(winnow_hashes("01234567" * 8).tolist())
    assert not (d1 & d2)
    # short-text edge cases: below K hashes whole; K..K+W-1 grams → 1 min
    assert len(winnow_hashes("ab")) == 1
    assert len(winnow_hashes("x" * (WINNOW_K + 1))) == 1


@pytest.mark.usefixtures("ray_session")
def test_lsh_dup_pairs_matches_exact_on_sf():
    """Sign-LSH near-dup: precision is exact by construction (cosine
    verify); at sf0.001 measured recall is complete too."""
    import __ray_entry__ as E
    exact = E.queries()["cosine_dup_pairs"](SF)
    lsh = E.queries()["cosine_dup_pairs_lsh"](SF)
    se = set(map(tuple, exact.values))
    sl = set(map(tuple, lsh.values))
    assert sl <= se          # exact precision
    assert len(sl & se) >= 0.9 * len(se)


@pytest.mark.usefixtures("ray_session")
def test_lsh_dup_pairs_true_near_dup_regime(tmp_path):
    """At a real dedup threshold (0.9) with planted perturbed copies,
    LSH uses long bands (strong pruning) and still finds every pair."""
    from tilemaker_ray.ops.similarity import (_lsh_bands_for,
                                              q_cosine_dup_pairs,
                                              q_cosine_dup_pairs_lsh)
    r, _ = _lsh_bands_for(0.9)
    assert r >= 8  # random-pair band collision <= 0.5^8
    rng = np.random.default_rng(3)
    base = rng.standard_normal((40, 16))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    dup = base[:10] + 0.07 * rng.standard_normal((10, 16))  # cos ~0.96
    emb = np.concatenate([base, dup]).astype(np.float32)
    pd.DataFrame({
        "vec_id": np.arange(len(emb), dtype=np.int64),
        "embedding": list(emb),
        "label": np.zeros(len(emb), dtype=np.int32),
    }).to_parquet(tmp_path / "embeddings.parquet")
    exact = q_cosine_dup_pairs(str(tmp_path), threshold=0.9)
    lsh = q_cosine_dup_pairs_lsh(str(tmp_path), threshold=0.9)
    assert len(exact) >= 10
    assert set(map(tuple, lsh.values)) == set(map(tuple, exact.values))


@pytest.mark.usefixtures("ray_session")
def test_minhash_finds_near_dups(con):
    # plant a near-duplicate pair and check the LSH pipeline finds it
    from tilemaker_ray.ops.dedup import jaccard, minhash_signature, _minhash_params
    a, b = _minhash_params()
    t1 = "the quick brown fox jumps over the lazy dog again and again"
    t2 = "the quick brown fox jumps over the lazy dog again and once"
    s1 = minhash_signature(t1, a, b)
    s2 = minhash_signature(t2, a, b)
    est = (s1 == s2).mean()
    true_j = jaccard(t1, t2)
    assert abs(est - true_j) < 0.35  # 64 perms -> coarse estimate

    # identical docs collide in every band
    s3 = minhash_signature(t1, a, b)
    assert (s1 == s3).all()


@pytest.mark.usefixtures("ray_session")
def test_ivf_recall():
    import __ray_entry__ as E
    brute = E.queries()["cosine_topk"](SF)
    ivf = E.queries()["ivf_topk"](SF)
    m = brute.merge(ivf, on=["query_id", "vec_id"], how="inner")
    recall = len(m) / len(brute)
    assert recall >= 0.5  # nprobe=4/16 on random vectors


@pytest.mark.usefixtures("ray_session")
def test_dedup_exact_finds_planted_duplicates():
    """The sf documents tables have no duplicate texts (the oracle only
    proves the empty case) — plant duplicates and run the same grouped
    pipeline on them."""
    import ray
    from ray.data.aggregate import Count, Min
    docs = pd.DataFrame({
        "doc_id": range(10),
        "text": ["unique %d" % i for i in range(7)] + ["dup a", "dup a", "dup b"],
    })
    ds = ray.data.from_pandas(docs)
    out = (ds.groupby("text")
             .aggregate(Min("doc_id", alias_name="rep_doc_id"),
                        Count(alias_name="n_dups"))).to_pandas()
    dups = out[out.n_dups > 1].sort_values("rep_doc_id")
    assert list(dups.rep_doc_id) == [7]
    assert list(dups.n_dups) == [2]
    assert (out.n_dups == 1).sum() == 8  # 7 unique + "dup b"


@pytest.mark.usefixtures("ray_session")
def test_simhash_langid_fingerprint_minhash_oracles(con):
    """The round-2 generated-SQL oracles match bit/row-exactly
    (simhash rides the merged fingerprint row; langid the merged
    quality_score row)."""
    for name in ("fingerprint", "quality_score", "minhash_pairs"):
        check(name, con)


@pytest.mark.usefixtures("ray_session")
def test_minhash_lsh_recall_complete(con):
    """The minhash_pairs oracle is the exact n²-Jaccard: valid only
    while LSH recall is complete on the synthetic data — assert it."""
    import __ray_entry__ as E
    from tilemaker_ray.ops.dedup import _minhash_pairs_oracle_sql
    mine = E.queries()["minhash_pairs"](SF)
    exp = con.sql(_minhash_pairs_oracle_sql()).df()
    assert set(map(tuple, mine.values.tolist())) == \
        set(map(tuple, exp.values.tolist()))


@pytest.mark.usefixtures("ray_session")
def test_cosine_dup_ivf_recall():
    """The approximate IVF near-dup path keeps usable recall vs the
    exact blocked all-pairs (these 'dups' sit at cosine ≈0.45-0.51 —
    far pairs — so recall < 1 is expected; assert a floor)."""
    import __ray_entry__ as E
    exact = E.queries()["cosine_dup_pairs"](SF)
    approx = E.queries()["cosine_dup_pairs_ivf"](SF)
    se = set(map(tuple, exact.values.tolist()))
    sa = set(map(tuple, approx.values.tolist()))
    assert not (sa - se)  # no false positives: exact verify per bucket
    if se:
        assert len(sa & se) / len(se) >= 0.5


@pytest.mark.usefixtures("ray_session")
def test_flagship_point_counts_oracle(con):
    """The full flagship engine path (extract actors → assign → pk
    shuffle → O3 sort + limit + combine assembly) vs the exact SQL twin
    (FNV-1a in list_reduce + mercator tile math) — VERDICT r2 #6."""
    import duckdb
    from tilemaker_ray.pipelines.flagship import (flagship_points_oracle_sql,
                                                  q_flagship_point_counts)
    from tilemaker_ray.sources.pages import pages_path, rows_for_sf
    mine = q_flagship_point_counts(SF)
    c = duckdb.connect()
    exp = c.sql(flagship_points_oracle_sql(pages_path(rows_for_sf(SF)))).df()
    a, b = normalize(mine), normalize(exp)
    assert len(a) == len(b)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_domain_stats_oracle():
    """Web-crawl per-domain rollup vs its SQL twin over the SAME pages
    dir (the __ray_entry__ oracle pins the sf0.01 20k-row dir, so the
    sf0.001 check needs the matching 2k-row dir here)."""
    import duckdb
    from tilemaker_ray.ops.web import domain_stats_oracle_sql, q_domain_stats
    from tilemaker_ray.sources.pages import pages_path, rows_for_sf
    mine = q_domain_stats(SF)
    c = duckdb.connect()
    exp = c.sql(domain_stats_oracle_sql(pages_path(rows_for_sf(SF)))).df()
    a, b = normalize(mine), normalize(exp)
    assert len(a) == len(b)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("name", ["url_canonicalize", "domain_cap",
                                  "html_extract", "link_stats",
                                  "anchor_stats", "robots_filter",
                                  "frontier_schedule"])
def test_web_pages_oracles(name):
    """URL canonicalization / per-domain cap / HTML main-content
    extraction / per-page outlink stats vs their SQL twins over the
    sf0.001-equivalent pages dir (same pinning caveat as
    test_domain_stats_oracle)."""
    import duckdb
    from tilemaker_ray.ops import web
    from tilemaker_ray.sources.pages import (pages_path, rich_pages_path,
                                             rows_for_sf)
    fn = {"url_canonicalize": web.q_url_canonicalize,
          "domain_cap": web.q_domain_cap,
          "html_extract": web.q_html_extract,
          "link_stats": web.q_link_stats,
          "anchor_stats": web.q_anchor_stats,
          "robots_filter": web.q_robots_filter,
          "frontier_schedule": web.q_frontier_schedule}[name]
    sql = {"url_canonicalize": web.url_canonicalize_oracle_sql,
           "domain_cap": web.domain_cap_oracle_sql,
           "html_extract": web.html_extract_oracle_sql,
           "link_stats": web.link_stats_oracle_sql,
           "anchor_stats": web.anchor_stats_oracle_sql,
           "robots_filter": web.robots_filter_oracle_sql,
           "frontier_schedule": web.frontier_schedule_oracle_sql}[name]
    path = (rich_pages_path
            if name in ("html_extract", "link_stats", "anchor_stats")
            else pages_path)(rows_for_sf(SF))
    mine = fn(SF)
    c = duckdb.connect()
    exp = c.sql(sql(path)).df()
    a, b = normalize(mine), normalize(exp)
    assert len(a) == len(b)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_frontier_schedule_politeness():
    """Round-robin property: sorted by fetch_order, the first
    n_hosts entries are every host's single best URL (slot 1, one per
    host), and slot blocks never interleave — cycle k completes before
    cycle k+1 starts."""
    from tilemaker_ray.ops.web import q_frontier_schedule
    out = q_frontier_schedule(SF).sort_values("fetch_order")
    assert (out["fetch_order"].to_numpy()
            == np.arange(1, len(out) + 1)).all()
    nh = out["host"].nunique()
    head = out.head(nh)
    assert (head["slot"] == 1).all() and head["host"].is_unique
    assert (np.diff(out["slot"].to_numpy()) >= 0).all()
    # within a slot block, priority is non-increasing
    for _, g in out.groupby("slot"):
        assert (np.diff(g["priority"].to_numpy()) <= 0).all()


def test_extract_main_text_crafted():
    """Rule-by-rule boilerplate stripping on crafted HTML: script /
    style / nav / header / footer / title blocks vanish WITH their
    contents, other tags are replaced by spaces (anchor inner text is
    content and survives), whitespace collapses, edges trim."""
    from tilemaker_ray.ops.web import extract_main_text
    cases = {
        "<html><head><title>t</title><style>b{}</style></head>"
        "<body><script>x()</script><nav><a href='/a'>skip</a></nav>"
        "<header><h1>h</h1></header><main><p>keep "
        '<a href="https://x.example/">anchor</a> text</p></main>'
        "<footer>foot</footer></body></html>":
            "keep anchor text",
        "<p>a</p><p>b</p>": "a b",
        "no tags at all": "no tags at all",
        "<script src='x'>var y=1;</script>rest": "rest",
        "  <b>  spaced  </b>  ": "spaced",
    }
    got = extract_main_text(pd.Series(list(cases))).tolist()
    assert got == list(cases.values())


@pytest.mark.usefixtures("ray_session")
def test_anchor_link_stats_adversarial_parity(tmp_path):
    """Kernel==oracle on hostile anchors: a '>' INSIDE an href (the
    oracle's atext capture must anchor past the closing quote), an
    http-prefixed href whose host doesn't parse (DuckDB regexp_extract
    yields '' while pandas extract yields NaN — both sides must bucket
    it under ''), relative links, and a linkless page (review
    findings)."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tilemaker_ray.ops import web

    html = [
        '<html><body><a href="https://x.example/a>b">hi there</a>'
        '<a href="httpfoo">z</a><a href="/rel">r</a></body></html>',
        "<html><body>no links</body></html>",
        '<html><body><a href="https://x.example/">one</a>'
        '<a href="https://y.example/p">two words</a></body></html>',
    ]
    urls = [f"https://src{i}.example/p" for i in range(len(html))]
    pq.write_table(pa.table({"url": pa.array(urls),
                             "html": pa.array([h.encode() for h in html],
                                              pa.binary())}),
                   str(tmp_path / "p.parquet"))
    con = duckdb.connect()
    for fn, sql in ((web.q_anchor_stats, web.anchor_stats_oracle_sql),
                    (web.q_link_stats, web.link_stats_oracle_sql)):
        mine = fn("sfX", pages_dir=str(tmp_path))
        exp = con.sql(sql(str(tmp_path))).df()
        pd.testing.assert_frame_equal(
            mine.reset_index(drop=True), exp.reset_index(drop=True),
            check_dtype=False)
    a = web.q_anchor_stats("sfX", pages_dir=str(tmp_path))
    # the '>'-in-href anchor contributes 2 tokens ("hi there") to
    # x.example, and the unparseable host lands in the '' bucket
    assert a.set_index("domain").loc["x.example", "n_anchor_tokens"] == 3
    assert "" in set(a["domain"])


@pytest.mark.usefixtures("ray_session")
def test_seq_pack_oracle_and_bucket_invariance():
    """Sequence packing vs the SQL window-cumsum oracle, AND the
    distributed prefix sum must be bucket-size invariant (bucket=64
    forces 8 buckets at SF, exercising the cross-bucket offset
    broadcast that a single 4096-doc bucket would hide).  Spans must
    tile the stream: doc i+1 starts where doc i ends, block indices
    consistent with seq_len."""
    import duckdb

    from tilemaker_ray.ops.text import SEQ_LEN, q_seq_pack, seq_pack_oracle_sql

    mine = q_seq_pack(SF)
    small = q_seq_pack(SF, bucket=64)
    pd.testing.assert_frame_equal(mine, small)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF}/documents.parquet')")
    exp = con.sql(seq_pack_oracle_sql()).df()
    pd.testing.assert_frame_equal(mine, exp, check_dtype=False)
    s = mine.sort_values("doc_id")
    assert s["start_tok"].iloc[0] == 0
    np.testing.assert_array_equal(s["end_tok"].to_numpy()[:-1],
                                  s["start_tok"].to_numpy()[1:])
    np.testing.assert_array_equal(s["first_block"],
                                  s["start_tok"] // SEQ_LEN)
    np.testing.assert_array_equal(s["last_block"],
                                  (s["end_tok"] - 1) // SEQ_LEN)


@pytest.mark.usefixtures("ray_session")
def test_dsir_select():
    """DSIR importance resampling: distributed ratios must equal the
    shared-kernel local recompute bit-for-bit, target-corpus text must
    out-score raw text under the fitted ratio (the margin that makes
    the selection meaningful), exactly ceil(10%) docs are selected,
    and the selection equals the local Gumbel-top-k."""
    import pyarrow.parquet as pq

    from tilemaker_ray.ops import dsir
    from tilemaker_ray.sources.pages import pages_path, rows_for_sf

    out = dsir.q_dsir_select(SF)
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    w = dsir.fit_logratio(SF)
    r = np.round(dsir.score_logratio(
        docs["text"].reset_index(drop=True), w), 9)
    got = out.sort_values("doc_id")["dsir_logratio"].to_numpy()
    np.testing.assert_array_equal(
        got, r[np.argsort(docs["doc_id"].to_numpy())])

    pg = (pq.read_table(pages_path(rows_for_sf(SF)), columns=["text"])
            .to_pandas()["text"].head(100).reset_index(drop=True))
    assert dsir.score_logratio(pg, w).mean() > r.mean() + 100.0

    k = max(1, int(len(out) * dsir.DSIR_KEEP_FRAC))
    assert out["selected"].sum() == k
    top = set(out.nlargest(k, "gumbel_key")["doc_id"])
    assert set(out[out["selected"] == 1]["doc_id"]) == top


@pytest.mark.usefixtures("ray_session")
def test_badwords_oracle_and_counting():
    """Blocklist scrub vs its SQL twin at SF, plus crafted counting
    semantics: adjacent blocklist terms share a delimiter (lookahead),
    substrings of longer tokens never match."""
    import duckdb

    from tilemaker_ray.ops.text import BADWORDS_ORACLE, q_badwords
    mine = q_badwords(SF).sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF}/documents.parquet')")
    exp = (con.sql(BADWORDS_ORACLE).df()
              .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(mine, exp, check_dtype=False)
    assert mine["n_badwords"].sum() > 0          # rule actually fires
    assert 0 < mine["badword_pass"].sum() < len(mine)
    import re
    from tilemaker_ray.ops.text import BADWORDS
    rx = re.compile(r"(?:^| )(?:"
                    + "|".join(map(re.escape, BADWORDS)) + r")(?= |\Z)")
    assert len(rx.findall("slow slow big")) == 3
    assert len(rx.findall("slowly bigger slow")) == 1
    # Trailing-newline parity (review r4): $ matches before a final
    # '\n', but the split-on-space oracle keeps the newline inside the
    # last token — \Z must NOT count it.  Verified against DuckDB.
    assert len(rx.findall("ends with slow\n")) == 0
    nl = con.sql("SELECT len(list_filter(string_split("
                 "'ends with slow' || chr(10), ' '), "
                 "w -> w IN ('slow', 'big')))").fetchone()[0]
    assert nl == 0


@pytest.mark.usefixtures("ray_session")
def test_kth_largest_refinement():
    """The DSIR threshold finder must return the EXACT k-th largest
    under a tiny gather cap (forcing multiple histogram-refinement
    rounds — the path a 10^9-doc corpus would take) for boundary and
    interior ranks."""
    import pyarrow as pa
    import ray.data

    from tilemaker_ray.ops.dsir import _kth_largest

    rng = np.random.default_rng(0)
    v = np.round(rng.normal(size=50_000), 9)
    ds = (ray.data.from_arrow(pa.table({"gumbel_key": v}))
          .repartition(8).materialize())
    sv = np.sort(v)
    for k in (1, 10, 5000, 49_999):
        assert _kth_largest(ds, "gumbel_key", k, cap=100) == \
            float(sv[len(v) - k])


@pytest.mark.usefixtures("ray_session")
def test_crawl_delta_oracle():
    """Per-url lifecycle status across the two synthetic crawl
    snapshots vs the FULL-OUTER-JOIN content-hash oracle (this test IS
    the op's oracle — the driver window is full); all four statuses
    must occur, and the counts must match the generator's residue
    classes (gone: i%7==0, changed: i%5==0 minus overlaps, new: 10%)."""
    import duckdb

    from tilemaker_ray.ops.web import crawl_delta_oracle_sql, q_crawl_delta
    from tilemaker_ray.sources.pages import (pages_path, rows_for_sf,
                                             snapshot2_pages_path)

    n = rows_for_sf(SF)
    mine = q_crawl_delta(SF)
    con = duckdb.connect()
    exp = (con.sql(crawl_delta_oracle_sql(pages_path(n),
                                          snapshot2_pages_path(n)))
              .df())
    pd.testing.assert_frame_equal(mine.reset_index(drop=True),
                                  exp.reset_index(drop=True),
                                  check_dtype=False)
    c = mine["status"].value_counts()
    gone = (n + 6) // 7
    changed = (n + 4) // 5 - (n + 34) // 35
    assert c["gone"] == gone and c["changed"] == changed
    assert c["new"] == n // 10
    assert c["unchanged"] == n - gone - changed


def test_rich_pages_share_url_key_space():
    """The merged url_canonicalize driver row joins the default and
    rich-HTML pages tables 1:1 on url — the two generators must emit
    identical url sets for any n_rows, and the rich in-content links
    must follow the exact host-graph convention q_domain_pagerank
    models (site s → (7s+1) mod 997 and hub s mod 31)."""
    import re

    from tilemaker_ray.sources.pages import generate_block, generate_rich_block
    a = generate_block(42, 3, 1000).column("url").to_pylist()
    b = generate_rich_block(3, 1000).column("url").to_pylist()
    assert a == b
    html = generate_rich_block(0, 50).column("html").to_pylist()
    for i, h in enumerate(html):
        s = i % 997
        ext = re.findall(r'href="https://site(\d+)\.example', h.decode())
        assert [int(x) for x in ext] == [(7 * s + 1) % 997, s % 31]


def test_canonicalize_urls_crafted():
    """Rule-by-rule URL canonical forms on crafted inputs: fragment,
    tracking params at head/middle/tail, default-port drop (scheme-
    sensitive), trailing slash off non-root paths only, case folding
    limited to scheme+host."""
    from tilemaker_ray.ops.web import canonicalize_urls
    cases = {
        "HTTP://Example.COM:80/a/b/#frag":
            "http://example.com/a/b",
        "https://example.com:443/?utm_source=x&q=1":
            "https://example.com/?q=1",
        "https://example.com:8443/path/":
            "https://example.com:8443/path",
        "http://example.com/p?a=1&utm_medium=m&b=2&fbclid=z":
            "http://example.com/p?a=1&b=2",
        "http://example.com/p?utm_campaign=c":
            "http://example.com/p",
        "https://Example.com/KeepCase/Path?X=Y":
            "https://example.com/KeepCase/Path?X=Y",
        "http://example.com":
            "http://example.com/",
        "http://example.com/":
            "http://example.com/",
    }
    got = canonicalize_urls(pd.Series(list(cases))).tolist()
    assert got == list(cases.values())


def test_domain_cap_partial_bounds_shuffle():
    """The per-batch combiner must emit at most cap rows per domain
    seen in the batch, so the exchange carries caps — not pages — and
    its selection (smallest md5 first) must agree with the final cap."""
    import hashlib
    import pyarrow as pa
    from tilemaker_ray.ops.web import DOMAIN_CAP, _domain_cap_partial
    urls = [f"https://big.example.com/p{i}" for i in range(500)] + \
           [f"https://tiny.example.org/p{i}" for i in range(2)]
    out = _domain_cap_partial(pa.table({"url": urls}), DOMAIN_CAP).to_pandas()
    assert out.groupby("domain").size().max() <= DOMAIN_CAP
    assert len(out) == DOMAIN_CAP + 2
    big = sorted((u for u in urls if "big" in u),
                 key=lambda u: (hashlib.md5(u.encode()).hexdigest(), u))
    assert sorted(out.loc[out.domain.eq("big.example.com"), "url"]) == \
        sorted(big[:DOMAIN_CAP])


@pytest.mark.usefixtures("ray_session")
def test_global_quantile_point_mass_refinement():
    """The histogram-refinement path: a column that is one point mass
    plus a thin tail still recovers exact quantiles (a single
    overweight bin must refine, not OOM the gather)."""
    import tilemaker_ray.ops.relational as R
    rng = np.random.default_rng(7)
    v = np.concatenate([np.full(50_000, 100.0), rng.uniform(0, 1000, 1000)])
    exp = {q: float(np.quantile(v, q, method="linear")) for q in R.QUANTILE_QS}
    import pyarrow.parquet as pq
    import pyarrow as pa
    import tempfile, os
    d = tempfile.mkdtemp()
    os.makedirs(f"{d}/sf_fake", exist_ok=True)
    pq.write_table(pa.table({"l_extendedprice": v}),
                   f"{d}/sf_fake/lineitem.parquet")
    got = R.q_global_quantile(f"{d}/sf_fake")
    for _, row in got.iterrows():
        assert abs(row["value"] - round(exp[row["q"]], 6)) < 1e-6


@pytest.mark.usefixtures("ray_session")
def test_asof_join_no_prior_view_dropped():
    """Purchases with no earlier view by the same user must not appear
    (inner as-of semantics, matching the SQL ASOF JOIN)."""
    import duckdb
    import __ray_entry__ as E
    res = E.queries()["asof_join"](SF)
    df = res if isinstance(res, pd.DataFrame) else res.to_pandas()
    assert (df.view_ts <= df.purchase_ts).all()
    c = duckdb.connect()
    c.sql(f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')")
    n_unmatched = c.sql("""
        WITH p AS (SELECT user_id, ts FROM events WHERE event_type='purchase'),
             v AS (SELECT user_id, min(ts) AS first_view FROM events
                   WHERE event_type='view' GROUP BY user_id)
        SELECT count(*) FROM p LEFT JOIN v USING (user_id)
        WHERE first_view IS NULL OR p.ts < first_view
    """).fetchone()[0]
    n_purchases = c.sql(
        "SELECT count(*) FROM events WHERE event_type='purchase'").fetchone()[0]
    assert len(df) == n_purchases - n_unmatched


@pytest.mark.usefixtures("ray_session")
def test_dedup_clusters_transitive_chain(tmp_path):
    """Multi-hop propagation: A~B and B~C above threshold but A~C
    below it must still land in ONE cluster labelled min(doc_id) —
    requires >1 label-propagation round."""
    from tilemaker_ray.ops.dedup import jaccard, q_dedup_clusters
    toks = [f"t{i}" for i in range(1, 17)]
    a = " ".join(toks[0:12])
    b = " ".join(toks[2:14])
    c = " ".join(toks[4:16])
    assert jaccard(a, b) >= 0.5 and jaccard(b, c) >= 0.5
    assert jaccard(a, c) < 0.5
    import pyarrow as pa
    import pyarrow.parquet as pq
    d = tmp_path / "sf_chain"
    d.mkdir()
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array([a, b, c, "zz yy xx ww vv uu"]),
    }), str(d / "documents.parquet"))
    out = q_dedup_clusters(str(d))
    got = dict(zip(out.doc_id, out.cluster_id))
    assert got == {0: 0, 1: 0, 2: 0, 3: 3}


@pytest.mark.usefixtures("ray_session")
def test_block_pair_dups_off_diagonal():
    """ADVICE r2: off-diagonal tiles must keep pairs whose SMALLER id
    lives in the LATER block (non-monotonic ids across blocks)."""
    import pyarrow as pa
    import ray
    from tilemaker_ray.ops.similarity import _block_pair_dups

    def blk(ids, mat):
        m = np.asarray(mat, np.float64)
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        emb = pa.FixedSizeListArray.from_arrays(pa.array(m.reshape(-1)), m.shape[1])
        return pa.table({"vec_id": pa.array(ids, pa.int64()), "emb": emb})

    # block A holds ids {10, 11}; block B holds ids {2, 3} — all four
    # vectors identical, so every cross pair is a dup.  The round-2
    # va < vb filter dropped ALL of these (va in {10,11} > vb in {2,3}).
    v = [1.0, 0.0, 0.0]
    a = blk([10, 11], [v, v])
    b = blk([2, 3], [v, v])
    va, vb = ray.get(_block_pair_dups.remote(a, b, False, 0.9))
    got = set(zip(va.tolist(), vb.tolist()))
    assert got == {(2, 10), (2, 11), (3, 10), (3, 11)}
    # diagonal tile: strict upper triangle only
    va, vb = ray.get(_block_pair_dups.remote(a, a, True, 0.9))
    assert set(zip(va.tolist(), vb.tolist())) == {(10, 11)}


@pytest.mark.usefixtures("ray_session")
def test_cosine_dup_ivf_scale_properties():
    """VERDICT r2 #1 done-criteria: recall >=0.95 vs exact at sf0.1, and
    the max bucket FRACTION shrinks as n grows (centroids ∝ sqrt(n)), so
    no bucket group approaches O(n) — with an id-only shuffle the group
    bytes stay tiny either way."""
    import __ray_entry__ as E
    sf = "/root/testdata/sf0.1"
    exact = E.queries()["cosine_dup_pairs"](sf)
    approx = E.queries()["cosine_dup_pairs_ivf"](sf)
    se = set(map(tuple, exact.values.tolist()))
    sa = set(map(tuple, approx.values.tolist()))
    assert not (sa - se)
    assert se and len(sa & se) / len(se) >= 0.95

    # bucket-size bound: simulate assignment at n and 10n on synthetic
    # near-orthogonal vectors with the production constants
    from tilemaker_ray.ops.similarity import _n_centroids, DUP_ASSIGN_PROBE
    rng = np.random.default_rng(3)
    fracs = []
    for n in (2000, 20000):
        k = _n_centroids(n)
        probe = min(k, DUP_ASSIGN_PROBE)
        x = rng.standard_normal((n, 32))
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        c = x[rng.choice(n, k, replace=False)]
        sims = x @ c.T
        top = np.argpartition(-sims, probe - 1, axis=1)[:, :probe]
        counts = np.bincount(top.reshape(-1), minlength=k)
        fracs.append(counts.max() / n)
    assert fracs[1] < fracs[0]  # finer partitioning at larger n
    assert fracs[1] < 0.25      # no bucket holds a quarter of the data


@pytest.mark.usefixtures("ray_session")
def test_global_quantile_two_point_masses():
    """Two >cap point masses straddling different quantile ranks must
    BOTH refine independently (the old code bailed out of refinement
    whenever more than one bin was needed) and the p50 rank pair that
    straddles the mass boundary must interpolate across bins."""
    import tilemaker_ray.ops.relational as R
    v = np.concatenate([np.full(300_000, 100.0), np.full(300_000, 200.0)])
    exp = {q: float(np.quantile(v, q, method="linear")) for q in R.QUANTILE_QS}
    import pyarrow.parquet as pq
    import pyarrow as pa
    import tempfile, os
    d = tempfile.mkdtemp()
    os.makedirs(f"{d}/sf_fake2", exist_ok=True)
    pq.write_table(pa.table({"l_extendedprice": v}),
                   f"{d}/sf_fake2/lineitem.parquet")
    got = R.q_global_quantile(f"{d}/sf_fake2")
    for _, row in got.iterrows():
        assert abs(row["value"] - round(exp[row["q"]], 6)) < 1e-6, row


@pytest.mark.usefixtures("ray_session")
def test_hll_distinct_within_error_bound():
    """HLL estimate within the 3-sigma bound (~3 * 1.04/sqrt(4096) ≈
    4.9%) of the exact distinct-URL count, and the register merge is
    order-insensitive (max is commutative/idempotent)."""
    import duckdb
    from tilemaker_ray.ops.sketch import (HLL_M, _hash64, hll_estimate,
                                          hll_registers,
                                          q_hll_distinct_urls)
    from tilemaker_ray.sources.pages import pages_path, rows_for_sf
    pages = pages_path(rows_for_sf(SF))
    exact = duckdb.connect().execute(
        f"SELECT count(DISTINCT url) FROM read_parquet('{pages}/*.parquet')"
    ).fetchone()[0]
    est = q_hll_distinct_urls(SF)["estimate"].iloc[0]
    assert abs(est - exact) / exact < 0.05

    # merge property: split-and-max == whole
    vals = [f"u{i}" for i in range(5000)]
    whole = hll_registers(_hash64(vals))
    a = hll_registers(_hash64(vals[:2000]))
    b = hll_registers(_hash64(vals[2000:]))
    assert (np.maximum(a, b) == whole).all()
    assert abs(hll_estimate(whole) - 5000) / 5000 < 0.05


@pytest.mark.usefixtures("ray_session")
def test_quantile_sketch_rank_error_and_properties():
    """KLL-style sketch: every estimate lands within 1.5% RANK error of
    its target quantile on the real column; the pipeline is
    deterministic across runs; and a levelwise merge of two partials
    answers as accurately as one sketch over the whole data."""
    import duckdb
    from tilemaker_ray.ops.sketch import (QSKETCH_QS, QuantileSketch,
                                          q_quantile_sketch)
    df = q_quantile_sketch(SF)
    v = np.sort(duckdb.connect().execute(
        f"SELECT l_extendedprice FROM read_parquet('{SF}/lineitem.parquet')"
    ).df().iloc[:, 0].to_numpy())
    n = len(v)
    for q, est in zip(df["q"], df["estimate"]):
        rank = np.searchsorted(v, est, side="left")
        assert abs(rank - q * n) / n < 0.015, (q, est)
    assert (q_quantile_sketch(SF)["estimate"] == df["estimate"]).all()

    # merge property: split-insert-merge stays within the same bound
    rng = np.random.default_rng(11)
    data = rng.normal(0, 1, 100_000)
    a = QuantileSketch().insert(data[:60_000])
    b = QuantileSketch().insert(data[60_000:])
    for lvl, vals in enumerate(b.levels):
        if len(vals):
            a.merge_level(lvl, vals)
    s = np.sort(data)
    for q, est in zip(QSKETCH_QS, a.quantile(list(QSKETCH_QS))):
        rank = np.searchsorted(s, est, side="left")
        assert abs(rank - q * len(s)) / len(s) < 0.015, (q, est)


@pytest.mark.usefixtures("ray_session")
def test_kmeans_train_matches_local_lloyd():
    """Distributed Lloyd training equals a single-process run of the
    same algorithm (same deterministic init, same iteration count) to
    float-sum-reorder tolerance, and its final centroids have lower
    inertia than the init."""
    from tilemaker_ray.ops.similarity import (KMEANS_K,
                                              KMEANS_TRAIN_ITERS,
                                              _load_queries_k,
                                              kmeans_train)
    c = kmeans_train(SF)
    emb = pd.read_parquet(f"{SF}/embeddings.parquet",
                          columns=["embedding"])
    x = np.stack(emb.embedding.to_numpy()).astype(np.float64)
    x = x / np.linalg.norm(x, axis=1, keepdims=True)
    _, qmat = _load_queries_k(SF, KMEANS_K)
    ref = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
    init = ref.copy()
    for _ in range(KMEANS_TRAIN_ITERS):
        best = np.argmax(x @ ref.T, axis=1)
        nxt = ref.copy()
        for j in range(KMEANS_K):
            m = x[best == j]
            if len(m):
                v = m.mean(axis=0)
                nxt[j] = v / np.linalg.norm(v)
        ref = nxt
    assert np.allclose(c, ref, atol=1e-9)

    def inertia(cent):
        return float((1 - (x @ cent.T).max(axis=1)).sum())
    assert inertia(c) < inertia(init)


@pytest.mark.usefixtures("ray_session")
def test_bpe_distributed_matches_reference():
    """Distributed BPE training reproduces the classic single-threaded
    algorithm bit-identically (same merge sequence, deterministic
    tie-break), and the apply-side tokenizer compresses: learned-token
    count per doc sits between the word count and the char count."""
    import duckdb
    from tilemaker_ray.ops.bpe import (bpe_apply_ds, bpe_train,
                                       bpe_train_reference)
    m_dist = bpe_train(SF, 12)
    wf = dict(duckdb.connect().execute(
        f"SELECT tok, count(*) FROM (SELECT unnest(string_split(text,' '))"
        f" AS tok FROM read_parquet('{SF}/documents.parquet'))"
        f" GROUP BY tok").fetchall())
    assert m_dist == bpe_train_reference(wf, 12)
    assert len(m_dist) == 12

    df = bpe_apply_ds(SF, m_dist).to_pandas()
    lens = duckdb.connect().execute(
        f"SELECT doc_id, len(string_split(text,' ')) AS nw, length(text)"
        f" AS nc FROM read_parquet('{SF}/documents.parquet')").df()
    m = df.merge(lens, on="doc_id")
    assert (m.n_bpe_trained_tokens >= m.nw).all()       # >= 1 tok/word
    assert (m.n_bpe_trained_tokens <= m.nc + m.nw).all()  # <= chars+EOW
    # merges actually fire: strictly fewer symbols than no-merge bound
    assert (m.n_bpe_trained_tokens < m.nc - m.nw + 1 + m.nw).any()


def test_cms_overestimate_and_merge_properties():
    """CMS guarantees: point estimates never under-count (min over d
    rows of non-negative sums), and partials merge by elementwise sum
    (linear sketch) — split-and-sum equals whole."""
    from tilemaker_ray.ops.sketch import cms_estimate, cms_partial
    rng = np.random.default_rng(5)
    toks = [f"t{i}" for i in range(400)]
    counts = rng.integers(1, 50, 400).astype(np.int64)
    whole = cms_partial(toks, counts)
    a = cms_partial(toks[:150], counts[:150])
    b = cms_partial(toks[150:], counts[150:])
    assert (a + b == whole).all()
    est = cms_estimate(whole, toks)
    assert (est >= counts).all()          # never under-estimates
    # with 400 keys over 4x4096 counters, collisions are rare: most
    # estimates are exact
    assert (est == counts).mean() > 0.9


def test_bloom_no_false_negatives_and_fpr():
    from tilemaker_ray.ops.sketch import bloom_bits, bloom_contains
    rng = np.random.default_rng(6)
    m_bits = 1 << 17
    members = rng.choice(10_000_000, 8_000, replace=False).astype(np.int64)
    bits = bloom_bits(members, m_bits)
    assert bloom_contains(bits, members, m_bits).all()   # zero FN, always
    others = np.setdiff1d(
        rng.choice(10_000_000, 60_000, replace=False).astype(np.int64),
        members)
    fpr = bloom_contains(bits, others, m_bits).mean()
    assert fpr < 0.02, fpr    # ~0.3% theoretical at 16 bits/key, k=5
    # OR-merge property: split-and-or equals whole
    a = bloom_bits(members[:3000], m_bits)
    b = bloom_bits(members[3000:], m_bits)
    assert (np.bitwise_or(a, b) == bits).all()


@pytest.mark.usefixtures("ray_session")
def test_group_quantile_point_mass_group(tmp_path, monkeypatch):
    """ADVICE r3: a group whose rank-straddling bin is a point mass
    larger than GATHER_CAP must refine through the capped recursive
    path instead of gathering the whole mass onto the driver — while
    sibling normal groups keep the bulk-gather fast path."""
    import tilemaker_ray.ops.relational as R
    rng = np.random.default_rng(11)
    a = np.concatenate([np.full(8_000, 100.0), rng.uniform(0, 1000, 200)])
    b = rng.uniform(0, 500, 1_000)
    import pyarrow as pa
    import pyarrow.parquet as pq
    d = tmp_path / "sf_gq"
    d.mkdir()
    pq.write_table(pa.table({
        "l_returnflag": pa.array(["A"] * len(a) + ["B"] * len(b)),
        "l_extendedprice": pa.array(np.concatenate([a, b])),
    }), str(d / "lineitem.parquet"))
    monkeypatch.setattr(R, "GATHER_CAP", 1_000)
    got = R.q_group_quantile(str(d)).set_index("l_returnflag")
    for g, v in (("A", a), ("B", b)):
        for q, name in zip(R.GROUP_QUANTILE_QS, ("p50", "p90")):
            exp = float(np.quantile(v, q, method="linear"))
            assert abs(got.loc[g, name] - round(exp, 6)) < 1e-6, (g, name)


@pytest.mark.usefixtures("ray_session")
def test_events_pivot_absent_type(tmp_path):
    """ADVICE r3: an event type entirely absent from the input must
    emit all-zero columns (like the SQL FILTER oracle), not KeyError."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from tilemaker_ray.ops.relational import PIVOT_TYPES, q_events_pivot
    d = tmp_path / "sf_pivot"
    d.mkdir()
    ts = pa.array(np.array(["2024-01-01T10:00:00", "2024-01-01T11:00:00",
                            "2024-01-02T10:00:00"], dtype="datetime64[us]"))
    pq.write_table(pa.table({
        "ts": ts,
        "event_type": pa.array(["click", "view", "click"]),
        "value": pa.array([1.5, 2.0, 3.0]),
    }), str(d / "events.parquet"))
    out = q_events_pivot(str(d))
    assert len(out) == 2
    for t in PIVOT_TYPES:
        assert f"{t}_n" in out.columns and f"{t}_value" in out.columns
    assert out["click_n"].tolist() == [1, 1]
    for t in ("purchase", "signup", "error"):
        assert out[f"{t}_n"].tolist() == [0, 0]
        assert out[f"{t}_value"].tolist() == [0.0, 0.0]


@pytest.mark.usefixtures("ray_session")
def test_hopping_window_oracle_timezone_free():
    """ADVICE r3: the hopping-window oracle must produce identical
    window_start values regardless of the DuckDB session time zone
    (the Ray side is naive int64 epoch arithmetic)."""
    import duckdb
    import __ray_entry__ as E
    sql = E.oracle_sql()["events_hopping_window"]
    frames = []
    for tz in ("UTC", "America/New_York", "Asia/Tokyo"):
        c = duckdb.connect()
        c.sql(f"SET TimeZone='{tz}'")
        c.sql(f"CREATE VIEW events AS SELECT * FROM "
              f"read_parquet('{SF}/events.parquet')")
        frames.append(c.sql(sql).df())
    pd.testing.assert_frame_equal(frames[0], frames[1])
    pd.testing.assert_frame_equal(frames[0], frames[2])


def test_mvt_value_memo_skips_nan():
    """ADVICE r3: float NaN never hits the memo (NaN != NaN), so it
    must not insert dead entries that evict useful ones."""
    from tilemaker_ray import mvt
    mvt._VALUE_MEMO.clear()
    a = mvt._encode_value_memo(float("nan"))
    b = mvt._encode_value_memo(float("nan"))
    assert a == b == mvt._encode_value(float("nan"))
    assert len(mvt._VALUE_MEMO) == 0
    # normal floats still memoize
    mvt._encode_value_memo(1.25)
    assert len(mvt._VALUE_MEMO) == 1


def test_dedup_exact_shuffle_carries_hash_not_text():
    """VERDICT r3 #3: the exact-dedup exchange rows are (h128, doc_id)
    — 24 bytes/row — never the document text."""
    import hashlib
    import pyarrow as pa
    from tilemaker_ray.ops.dedup import exact_hash_rows
    b = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": pa.array(["same text", "same text", "other"])})
    out = exact_hash_rows(b)
    assert out.column_names == ["h_hi", "h_lo", "doc_id"]
    assert "text" not in out.column_names
    hi = out.column("h_hi").to_pylist()
    lo = out.column("h_lo").to_pylist()
    assert (hi[0], lo[0]) == (hi[1], lo[1])
    assert (hi[0], lo[0]) != (hi[2], lo[2])
    d = hashlib.md5(b"same text").digest()
    assert hi[0] == int.from_bytes(d[:8], "little", signed=True)
    assert lo[0] == int.from_bytes(d[8:], "little", signed=True)


@pytest.mark.usefixtures("ray_session")
def test_ngram_max_df_bounds_hot_shingle(tmp_path):
    """VERDICT r3 #4: the pipeline entrypoint caps shingle document
    frequency by default (a df=m stop-shingle emits O(m²) pair rows);
    pairs supported only by a hot shingle vanish under the cap while
    true near-dups (many low-df shingles) survive.  The oracle query
    passes max_df=None and stays exact."""
    import inspect
    import pyarrow as pa
    import pyarrow.parquet as pq
    from tilemaker_ray.ops.dedup import (ngram_jaccard_pairs_ds,
                                         q_ngram_jaccard_pairs)
    # default is ON for pipeline use
    sig = inspect.signature(ngram_jaccard_pairs_ds)
    assert sig.parameters["max_df"].default is not None
    d = tmp_path / "sf_hot"
    d.mkdir()
    hot = ["the quick fox"] * 12            # one shingle, df=12
    near = ["aa bb cc dd ee ff gg hh",      # 5 of 6 shingles shared
            "aa bb cc dd ee ff gg zz"]      # J = 5/7 >= 0.5, all df=2
    pq.write_table(pa.table({
        "doc_id": pa.array(range(14), pa.int64()),
        "text": pa.array(hot + near),
    }), str(d / "documents.parquet"))
    capped = ngram_jaccard_pairs_ds(str(d), max_df=5).to_pandas()
    got = set(zip(capped.doc_a.astype(int), capped.doc_b.astype(int)))
    assert got == {(12, 13)}  # hot-shingle pairs dropped, true dup kept
    exact = q_ngram_jaccard_pairs(str(d))  # oracle variant: max_df=None
    pairs = set(zip(exact.doc_a.astype(int), exact.doc_b.astype(int)))
    assert (12, 13) in pairs and len(pairs) == 66 + 1


@pytest.mark.usefixtures("ray_session")
def test_dedup_exact_confirm_path(tmp_path):
    """The two-pass exact dedup (hash exchange + candidate-only text
    confirm) on data that actually HAS duplicate groups."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from tilemaker_ray.ops.dedup import q_dedup_exact
    d = tmp_path / "sf_dups"
    d.mkdir()
    pq.write_table(pa.table({
        "doc_id": pa.array([5, 1, 2, 3, 4, 0], pa.int64()),
        "text": pa.array(["x", "x", "x", "y", "y", "z"]),
    }), str(d / "documents.parquet"))
    out = q_dedup_exact(str(d))
    assert out.values.tolist() == [[1, 3], [3, 2]]


def test_url_canonicalize_adversarial_host_parity(tmp_path):
    """Hosts with uppercase letters / default ports: the Ray kernel and
    the SQL oracle must agree on the canonical host (the oracle
    previously extracted host from the ORIGINAL url — review finding)."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tilemaker_ray.ops.web import (_HOSTPORT_RE, canonicalize_urls,
                                       url_canonicalize_oracle_sql)
    urls = ["HTTP://Example.COM:80/a/b/",
            "https://X.org:443/p?utm_source=z&q=1#f",
            "http://plain.net/x"]
    pq.write_table(pa.table({"url": pa.array(urls)}),
                   str(tmp_path / "p.parquet"))
    c = canonicalize_urls(pd.Series(urls))
    ray_df = (pd.DataFrame({
        "url": urls, "canonical_url": c,
        "host": c.str.extract(_HOSTPORT_RE, expand=False)})
        .sort_values("url").reset_index(drop=True))
    con = duckdb.connect()
    sql_df = (con.sql(url_canonicalize_oracle_sql(str(tmp_path)))
                 .df().sort_values("url").reset_index(drop=True))
    pd.testing.assert_frame_equal(ray_df, sql_df)
    assert list(sql_df.host) == ["example.com", "plain.net", "x.org"]


@pytest.mark.usefixtures("ray_session")
def test_gather_embeddings_skips_empty_shard_sentinels():
    """Empty shards carry a (1, 0) range sentinel; the binary-searched
    shard window must not let it hide real shards on either side
    (review finding)."""
    import pyarrow as pa
    import ray

    from tilemaker_ray.ops.similarity import _gather_embeddings

    def shard(ids):
        return ray.put(pa.table({
            "vec_id": pa.array(np.array(ids, np.int64)),
            "emb": pa.array([[1.0, 0, 0, 0] for _ in ids],
                            pa.list_(pa.float64()))}))

    refs = [shard([0, 5, 9]), shard([]), shard([10, 15, 19])]
    ranges = np.array([(0, 9), (1, 0), (10, 19)], np.int64)
    ids, mat = _gather_embeddings(np.array([5, 15], np.int64),
                                  refs, ranges)
    assert sorted(ids.tolist()) == [5, 15] and mat.shape == (2, 4)


@pytest.mark.usefixtures("ray_session")
def test_zonal_stats_consistent_with_pip_join(con):
    """Zonal stats over the rectangle layer must agree with the PIP
    join it aggregates: total n_points == pair count, and per-zone
    bounds hold (min <= max < ZONAL_VAL_MOD)."""
    import __ray_entry__ as E

    from tilemaker_ray.ops.geospatial import ZONAL_VAL_MOD, q_zonal_stats

    z = q_zonal_stats(SF)
    pairs = E.queries()["pip_join"](SF)
    assert z["n_points"].sum() == len(pairs)
    per_rect = pairs.groupby("rect_id").size()
    zz = z.set_index("rect_id")["n_points"]
    assert zz.sort_index().equals(per_rect.sort_index().astype("int64"))
    assert (z["min_val"] <= z["max_val"]).all()
    assert (z["max_val"] < ZONAL_VAL_MOD).all()


@pytest.mark.usefixtures("ray_session")
def test_pii_redact_oracle():
    """pii_redact vs its DuckDB oracle at the sf0.001 page count (the
    driver runs the sf0.01-pinned variant; this is the fast twin —
    same pattern as the other pages-table oracles)."""
    from tilemaker_ray.ops.web import pii_redact_oracle_sql, q_pii_redact
    from tilemaker_ray.sources.pages import pii_pages_path, rows_for_sf

    got = q_pii_redact(SF)
    con2 = duckdb.connect()
    exp = con2.sql(pii_redact_oracle_sql(
        pii_pages_path(rows_for_sf(SF)))).df()
    a, b = normalize(got), normalize(exp)
    assert list(a.columns) == list(b.columns)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_pii_redact_semantics():
    """Redacted text contains no residual PII pattern matches, counts
    match a direct re.findall over the original text, and placeholders
    appear exactly count-many times."""
    import re

    from tilemaker_ray.ops.web import PII_PATTERNS, q_pii_redact
    from tilemaker_ray.sources.pages import pii_pages_path, rows_for_sf

    df = q_pii_redact(SF)
    import pyarrow.parquet as pq
    src = pq.read_table(pii_pages_path(rows_for_sf(SF))).to_pandas()
    src = src.sort_values("url").reset_index(drop=True)
    assert list(df["url"]) == list(src["url"])
    head = src.head(200)
    red = df.head(200)
    for name, rx, repl in PII_PATTERNS:
        pat = re.compile(rx)
        n_direct = head["text"].map(lambda t: len(pat.findall(t)))
        assert (red[f"n_{name}s"].to_numpy() == n_direct.to_numpy()).all()
        # no pattern survives redaction
        assert not red["redacted"].str.contains(pat).any()
    # every placeholder count matches the reported count
    for name, _, repl in PII_PATTERNS:
        assert (red["redacted"].str.count(re.escape(repl)).to_numpy()
                == red[f"n_{name}s"].to_numpy()).all()


@pytest.mark.usefixtures("ray_session")
def test_gopher_rules_hand_computed(tmp_path):
    """Gopher gate on a corpus small enough to check by hand: word
    count, hapax count, mode frequency, and each rule's failure mode
    (too short, too-long mean token, low diversity)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tilemaker_ray.ops.text import q_gopher_rules

    passing = " ".join(f"word{c}" for c in "abcdefghijkl")   # 12 hapax
    d = tmp_path / "sf_gopher"
    d.mkdir()
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array([
            "aa bb aa cc",                                   # too short
            passing,                                         # passes all
            " ".join(["superduperlongword"] * 15),           # mean>10, dup
            " ".join(["x"] * 20),                            # mean<3
        ]),
    }), str(d / "documents.parquet"))
    got = q_gopher_rules(str(d)).set_index("doc_id")
    assert got.loc[0].tolist() == [4, 2, 2, 0]     # n, hapax, maxf, pass
    assert got.loc[1].tolist() == [12, 12, 1, 1]
    assert got.loc[2, "gopher_pass"] == 0 and got.loc[2, "max_tok_freq"] == 15
    assert got.loc[3, "gopher_pass"] == 0 and got.loc[3, "n_hapax"] == 0


@pytest.mark.usefixtures("ray_session")
def test_weighted_sample_inclusion_rule():
    """Every kept doc satisfies hash64 % MOD < n_chars and every
    dropped one violates it (recomputed directly from the parquet),
    and the kept fraction sits near E[n_chars]/MOD."""
    import hashlib

    import pyarrow.parquet as pq

    from tilemaker_ray.ops.sampling import WEIGHT_MOD, q_weighted_sample

    got = set(q_weighted_sample(SF)["doc_id"])
    src = pq.read_table(f"{SF}/documents.parquet",
                        columns=["doc_id", "text", "n_chars"]).to_pandas()
    h = src["text"].map(lambda t: int.from_bytes(
        hashlib.md5(t.encode()).digest()[8:16], "little"))
    keep = (h % WEIGHT_MOD) < src["n_chars"]
    assert set(src.loc[keep, "doc_id"]) == got
    assert 0 < len(got) < len(src)


@pytest.mark.usefixtures("ray_session")
def test_cdc_chunk_dedup(tmp_path):
    """Content-defined chunking properties: chunk lengths conserve the
    text, an exact duplicate doc is 100% dup bytes, and an insertion
    only disturbs chunks overlapping the edit (shift resistance —
    the suffix chunk stream realigns)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tilemaker_ray.ops.dedup import _cdc_chunks, q_cdc_chunk_stats

    base = ("documents change near the beginning yet their later "
            "chunks keep aligning because boundaries come from local "
            "content only; sphinx of black quartz judge my vow 12345 "
            "pack my box with five dozen liquor jugs 67890 and more "
            "varied filler text keeps the window hashes well mixed")
    h1, l1 = _cdc_chunks(base)
    assert l1.sum() == len(base)
    assert len(h1) >= 3          # enough chunks for the test to bite
    shifted = "INSERTED PREFIX EDIT " + base
    h2, l2 = _cdc_chunks(shifted)
    assert l2.sum() == len(shifted)
    # shift resistance: all but the first chunk(s) realign
    shared = set(h1.tolist()) & set(h2.tolist())
    assert len(shared) >= len(h1) - 2
    # equal chunks hash equal wherever they sit (position independence)
    d = tmp_path / "sf_cdc"
    d.mkdir()
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array([base, base, "completely unrelated short x"]),
    }), str(d / "documents.parquet"))
    df = q_cdc_chunk_stats(str(d)).set_index("doc_id")
    assert df.loc[0, "dup_chunk_bytes"] == len(base)
    assert df.loc[1, "dup_chunk_bytes"] == len(base)
    assert df.loc[0, "n_dup_chunks"] == df.loc[0, "n_chunks"]
    assert df.loc[2, "dup_chunk_bytes"] == 0
    assert df["n_chunks"].sum() == 2 * len(h1) + len(
        _cdc_chunks("completely unrelated short x")[0])


@pytest.mark.usefixtures("ray_session")
def test_nb_classifier_parity_and_accuracy():
    """The distributed hashed-feature NB (one partial-counts shuffle +
    broadcast scoring) must equal a from-scratch local Counter
    implementation bit-for-bit, and held-in accuracy must be
    near-perfect while the majority baseline is not (the label IS
    encoded in the vocabulary: pages are travel-domain, documents are
    not)."""
    from collections import Counter

    import pyarrow.parquet as pq

    from tilemaker_ray.ops.classify import (NB_ALPHA, NB_MIN_DF,
                                            _hash_tokens, q_nb_classify,
                                            score_local)
    from tilemaker_ray.sources.pages import pages_path, rows_for_sf

    df = q_nb_classify(SF)
    acc = (df["pred"] == df["label"]).mean()
    base = max(df["label"].mean(), 1 - df["label"].mean())
    assert acc >= 0.99 > base

    pages = pq.read_table(pages_path(rows_for_sf(SF)),
                          columns=["url", "text"]).to_pandas()
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    rows = pd.DataFrame({
        "uid": (["p:" + u for u in pages["url"]]
                + ["d:" + str(i) for i in docs["doc_id"]]),
        "text": list(pages["text"]) + list(docs["text"]),
        "y": [1] * len(pages) + [0] * len(docs),
    })
    cp, cn = Counter(), Counter()
    for t, y in zip(rows["text"], rows["y"]):
        bk = _hash_tokens(np.array(t.split(" "), dtype=object))
        (cp if y else cn).update(bk.tolist())
    seen = np.array(sorted(set(cp) | set(cn)), dtype=np.int64)
    v = len(seen)                              # FULL seen-bucket count
    tp, tn = sum(cp.values()), sum(cn.values())
    keep = np.array([cp[b] + cn[b] >= NB_MIN_DF for b in seen])
    buckets = seen[keep]
    w = np.array([np.log((cp[b] + NB_ALPHA) / (tp + NB_ALPHA * v))
                  - np.log((cn[b] + NB_ALPHA) / (tn + NB_ALPHA * v))
                  for b in buckets])
    prior = float(np.log(rows["y"].sum() + NB_ALPHA)
                  - np.log((1 - rows["y"]).sum() + NB_ALPHA))
    s = np.round(score_local(rows["text"].reset_index(drop=True),
                             buckets, w, prior), 9)
    local = pd.DataFrame({"uid": rows["uid"], "score": s}) \
        .sort_values("uid").reset_index(drop=True)
    assert (local["score"].to_numpy() == df["score"].to_numpy()).all()


@pytest.mark.usefixtures("ray_session")
def test_embedding_pca_parity_and_properties():
    """Distributed PCA (Gram-partial shuffle + driver eigh) must match
    a straight local numpy PCA under the same sign convention, with
    orthonormal components and non-increasing explained variance."""
    import pyarrow.parquet as pq

    from tilemaker_ray.ops.similarity import (PCA_K, pca_model,
                                              q_embedding_pca)

    mean, evals, evecs = pca_model(SF)
    k = PCA_K
    assert np.all(np.diff(evals) <= 1e-9)                 # descending
    assert np.allclose(evecs.T @ evecs, np.eye(evecs.shape[1]),
                       atol=1e-9)                          # orthonormal

    emb = np.stack(pq.read_table(f"{SF}/embeddings.parquet")
                   .to_pandas().sort_values("vec_id")["embedding"]
                   .to_numpy()).astype(np.float64)
    mu = emb.mean(axis=0)
    cov = (emb - mu).T @ (emb - mu) / (len(emb) - 1)
    ev, w = np.linalg.eigh(cov)
    order = np.argsort(ev)[::-1]
    ev, w = ev[order], w[:, order]
    for c in range(w.shape[1]):
        if w[np.argmax(np.abs(w[:, c])), c] < 0:
            w[:, c] = -w[:, c]
    np.testing.assert_allclose(mean, mu, rtol=0, atol=1e-9)
    np.testing.assert_allclose(evals[:k], ev[:k], rtol=1e-8)
    np.testing.assert_allclose(evecs[:, :k], w[:, :k], rtol=0, atol=1e-6)

    proj = q_embedding_pca(SF)
    expect = np.round((emb - mu) @ w[:, :k], 6)
    got = proj[[f"pc{c + 1}" for c in range(k)]].to_numpy()
    np.testing.assert_allclose(got, expect, rtol=0, atol=2e-6)
    # projected variance reproduces the eigenvalues
    np.testing.assert_allclose(got.var(axis=0, ddof=1), ev[:k], rtol=1e-4)


@pytest.mark.usefixtures("ray_session")
def test_lm_tercile_matches_duckdb_ntile(con):
    """Exact distributed ntile (histogram-refinement cutoffs + tie
    resolution on doc_id) vs DuckDB ntile(3), tie-for-tie, plus the
    ntile size contract (larger tiles first)."""
    from tilemaker_ray.ops.text import LM_TILES, ORACLES, q_lm_tercile

    got = q_lm_tercile(SF)
    exp = con.sql(ORACLES["lm_tercile"]).df()
    m = got.merge(exp, on="doc_id", suffixes=("", "_sql"))
    assert (m["lm_tercile"] == m["lm_tercile_sql"]).all()
    sizes = got["lm_tercile"].value_counts().sort_index().tolist()
    assert sum(sizes) == len(got) and len(sizes) == LM_TILES
    assert all(sizes[i] >= sizes[i + 1] for i in range(len(sizes) - 1))


@pytest.mark.usefixtures("ray_session")
def test_pointer_doubling_components(tmp_path):
    """The O(log d) pointer-doubling labeler: on a 48-node PATH graph
    (diameter 47) it must converge in ~log rounds, not ~d rounds, with
    every node labelled 0; on a multi-component graph it must match
    the O(d) min-label propagation used by q_dedup_clusters."""
    import pyarrow as pa
    import ray.data

    from tilemaker_ray.ops.dedup import components_pointer_doubling

    n = 48
    docs = ray.data.from_arrow(pa.table(
        {"doc_id": pa.array(np.arange(n, dtype=np.int64))}))
    path = ray.data.from_arrow(pa.table({
        "doc_a": pa.array(np.arange(n - 1, dtype=np.int64)),
        "doc_b": pa.array(np.arange(1, n, dtype=np.int64))}))
    labels, rounds = components_pointer_doubling(docs, path)
    assert (labels["label"] == 0).all()
    # path diameter 47: plain propagation needs ~47 rounds; doubling
    # (relax halves distance-to-root, jump halves pointer depth) must
    # land well under half that — generous cap at 14
    assert rounds <= 14

    # multi-component graph: {0,1,2} via chain, {5,7} pair, 9 isolated
    docs2 = ray.data.from_arrow(pa.table(
        {"doc_id": pa.array(np.array([0, 1, 2, 5, 7, 9], np.int64))}))
    edges2 = ray.data.from_arrow(pa.table({
        "doc_a": pa.array(np.array([0, 1, 5], np.int64)),
        "doc_b": pa.array(np.array([1, 2, 7], np.int64))}))
    labels2, _ = components_pointer_doubling(docs2, edges2)
    got = dict(zip(labels2["doc_id"], labels2["label"]))
    assert got == {0: 0, 1: 0, 2: 0, 5: 5, 7: 5, 9: 9}

    # empty edge set: every node is its own canonical representative
    labels3, r3 = components_pointer_doubling(
        docs2, ray.data.from_arrow(pa.table({
            "doc_a": pa.array([], pa.int64()),
            "doc_b": pa.array([], pa.int64())})))
    assert r3 == 0 and (labels3["label"].to_numpy()
                        == labels3["doc_id"].to_numpy()).all()


@pytest.mark.usefixtures("ray_session")
def test_lang_balance_properties():
    """Language rebalancing: expected kept per language ≈ the smallest
    language's size; every kept doc satisfies the integer rule
    hash % n_lang < n_min recomputed directly from the parquet."""
    import hashlib

    import pyarrow.parquet as pq

    from tilemaker_ray.ops.sampling import q_lang_balance

    got = q_lang_balance(SF)
    src = pq.read_table(f"{SF}/documents.parquet",
                        columns=["doc_id", "lang", "text"]).to_pandas()
    n = src["lang"].value_counts()
    mn = int(n.min())
    h = src["text"].map(lambda t: int.from_bytes(
        hashlib.md5(t.encode()).digest()[8:16], "little"))
    keep = (h % src["lang"].map(n).astype("uint64")) < mn
    assert set(src.loc[keep, "doc_id"]) == set(got["doc_id"])
    kept = got["lang"].value_counts()
    # Bernoulli with p = mn/n_lang: each language lands near mn
    assert (kept > 0.6 * mn).all() and (kept < 1.4 * mn).all()
    # the dominant language was actually downsampled
    assert kept[n.idxmax()] < n.max() * 0.7


@pytest.mark.usefixtures("ray_session")
def test_domain_pagerank_parity():
    """Distributed edge build (PARSED from the rich pages' absolute
    hrefs) + power iteration must match a fully independent local
    recomputation from the raw urls via the generator's link formula,
    ranks must sum to 1, and the rank mass must actually concentrate
    (not uniform)."""
    import re

    import pyarrow.parquet as pq

    from tilemaker_ray.ops.web import (PR_DAMPING, PR_ITERS,
                                       q_domain_pagerank)
    from tilemaker_ray.sources.pages import pages_path, rows_for_sf

    got = q_domain_pagerank(SF)
    assert abs(got["rank"].sum() - 1.0) < 1e-9

    urls = pq.read_table(pages_path(rows_for_sf(SF)),
                         columns=["url"]).to_pandas()["url"]
    s = urls.map(lambda u: int(re.match(r"https://site(\d+)\.", u)
                               .group(1))).to_numpy()
    n = 997
    src = np.concatenate([s, s])
    dst = np.concatenate([(s * 7 + 1) % n, s % 31])
    out_w = np.bincount(src, minlength=n).astype(np.float64)
    r = np.full(n, 1.0 / n)
    dangling = out_w == 0
    for _ in range(PR_ITERS):
        contrib = np.bincount(dst, weights=r[src] / out_w[src],
                              minlength=n)
        leak = r[dangling].sum() / n
        r = (1.0 - PR_DAMPING) / n + PR_DAMPING * (contrib + leak)
    # domain is the parsed hostname now (generic regexes, no siteN
    # assumption in the op — VERDICT r4 #3); map formula ids to hosts
    exp = pd.DataFrame({
        "domain": [f"site{i}.example" for i in range(n)],
        "rank": np.round(r, 12)}).sort_values("domain")
    got_m = got.set_index("domain")["rank"]
    np.testing.assert_allclose(
        got_m.loc[exp["domain"]].to_numpy(), exp["rank"].to_numpy(),
        rtol=0, atol=1e-12)
    assert got["rank"].max() > 3.0 * got["rank"].min()


def test_pagerank_generic_host_graph():
    """pagerank_local on a NON-siteN host graph (the op must carry no
    fixture naming assumption): hand-built 4-node graph checked
    against a hand-rolled dense iteration, including a dangling node
    and a host that only ever appears as a link target."""
    from tilemaker_ray.ops.web import pagerank_local
    e = pd.DataFrame({
        "src": ["a.org", "a.org", "b.net", "c.io"],
        "dst": ["b.net", "c.io", "c.io", "zz.example"],
        "n_links": [2, 1, 1, 3]})
    nodes = np.array(["a.org", "b.net", "c.io", "zz.example"])
    got = pagerank_local(nodes, e, iters=50)
    # dense reference
    idx = {h: i for i, h in enumerate(nodes)}
    n = 4
    src = np.array([idx[h] for h in e["src"]])
    dst = np.array([idx[h] for h in e["dst"]])
    w = e["n_links"].to_numpy(np.float64)
    out_w = np.bincount(src, weights=w, minlength=n)
    r = np.full(n, 1.0 / n)
    for _ in range(50):
        contrib = np.bincount(
            dst, weights=r[src] * w / out_w[src], minlength=n)
        leak = r[out_w == 0].sum() / n
        r = 0.15 / n + 0.85 * (contrib + leak)
    np.testing.assert_allclose(got["rank"].to_numpy(), np.round(r, 12),
                               rtol=0, atol=1e-12)
    assert abs(got["rank"].sum() - 1.0) < 1e-9


@pytest.mark.usefixtures("ray_session")
def test_domain_pagerank_distributed_parity():
    """The above-threshold Dataset iteration (bucket-join rounds) must
    match pagerank_local on the same generic host graph — the 100x
    upgrade path is wired and exact, not just documented."""
    import ray.data

    from tilemaker_ray.ops.web import pagerank_distributed, pagerank_local
    rng = np.random.default_rng(5)
    hosts = np.array([f"h{i}.example" for i in range(60)])
    src = rng.integers(0, 50, 300)           # h50..h59 stay dangling
    dst = rng.integers(0, 60, 300)
    e = (pd.DataFrame({"src": hosts[src], "dst": hosts[dst],
                       "n_links": rng.integers(1, 5, 300)})
         .groupby(["src", "dst"], as_index=False)["n_links"].sum())
    want = pagerank_local(np.sort(hosts), e, iters=8)
    got = (pagerank_distributed(
        ray.data.from_pandas(pd.DataFrame({"host": hosts})),
        ray.data.from_pandas(e), len(hosts), iters=8)
        .to_pandas().sort_values("host").reset_index(drop=True))
    np.testing.assert_allclose(got["rank"].to_numpy(),
                               want["rank"].to_numpy(),
                               rtol=0, atol=1e-9)


# --- SemDeDup (embedding-cluster semantic dedup) ---------------------------

def _ref_semdedup_greedy(ids, mat, thr):
    """O(m^2) single-process greedy keep-by-ascending-id reference."""
    kept_idx, rows = [], []
    for i in range(len(ids)):
        ex = None
        for j in kept_idx:
            if float(mat[i] @ mat[j]) >= thr:
                ex = j
                break
        if ex is None:
            kept_idx.append(i)
            rows.append((ids[i], True, ids[i]))
        else:
            rows.append((ids[i], False, ids[ex]))
    return pd.DataFrame(rows, columns=["vec_id", "kept", "exemplar"])


@pytest.mark.usefixtures("ray_session")
def test_semdedup_matches_local_reference():
    """Distributed SemDeDup == single-process reference with the same
    centroids (exact parity — the approximation lives only in the
    clustering, which both sides share)."""
    import __ray_entry__ as E
    from tilemaker_ray.ops.similarity import DUP_THRESHOLD, _centroids
    got = E.queries()["semdedup"](SF)
    emb = pd.read_parquet(f"{SF}/embeddings.parquet",
                          columns=["vec_id", "embedding"]).sort_values("vec_id")
    ids = emb.vec_id.to_numpy()
    mat = np.stack(emb.embedding.to_numpy()).astype(np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    cent = _centroids(SF)
    buckets = np.argmax(mat @ cent.T, axis=1)
    parts = [_ref_semdedup_greedy(ids[buckets == b], mat[buckets == b],
                                  DUP_THRESHOLD)
             for b in np.unique(buckets)]
    exp = (pd.concat(parts).sort_values("vec_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_semdedup_greedy_tiling_equivalence(monkeypatch):
    """greedy_keep's tiled scan == the O(m^2) reference regardless of
    where tile boundaries fall."""
    from tilemaker_ray.ops import semdedup as sd
    rng = np.random.default_rng(5)
    mat = rng.standard_normal((53, 8))
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    ids = np.arange(100, 153, dtype=np.int64)
    exp = _ref_semdedup_greedy(ids, mat, 0.5)
    for tile in (7, 16, 1000):
        monkeypatch.setattr(sd, "BUCKET_TILE", tile)
        got = sd.greedy_keep(ids, mat, 0.5)
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_semdedup_planted_dups(tmp_path, monkeypatch):
    """Planted perturbed copies (cos ~0.96) are dropped with their base
    as exemplar; invariants hold; multi-tile gather path exercised."""
    from tilemaker_ray.ops import semdedup as sd
    rng = np.random.default_rng(9)
    base = rng.standard_normal((40, 16))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    dup = base[:12] + 0.07 * rng.standard_normal((12, 16))
    emb = np.concatenate([base, dup]).astype(np.float32)
    pd.DataFrame({
        "vec_id": np.arange(len(emb), dtype=np.int64),
        "embedding": list(emb),
        "label": np.zeros(len(emb), dtype=np.int32),
    }).to_parquet(tmp_path / "embeddings.parquet")
    monkeypatch.setattr(sd, "BUCKET_TILE", 5)  # force the tiled path
    got = (sd.semdedup_ds(str(tmp_path), threshold=0.9).to_pandas()
           .sort_values("vec_id").reset_index(drop=True))
    nmat = emb.astype(np.float64)
    nmat /= np.linalg.norm(nmat, axis=1, keepdims=True)
    dropped = got[~got.kept]
    assert len(dropped) >= 10  # most planted copies land with their base
    kept_set = set(got[got.kept].vec_id)
    for _, r in dropped.iterrows():
        assert r.exemplar in kept_set
        assert r.exemplar < r.vec_id
        assert nmat[int(r.vec_id)] @ nmat[int(r.exemplar)] >= 0.9


@pytest.mark.usefixtures("ray_session")
class TestBitextMine:
    def test_planted_pairs_exact(self):
        """Forward margin mining recovers EVERY planted translation and
        nothing else on the rotated-distractor fixture."""
        import pandas as pd
        from tilemaker_ray.ops.bitext import TGT_ID_BASE, q_bitext_mine
        out = q_bitext_mine(SF)
        src = pd.read_parquet(f"{SF}/embeddings.parquet",
                              columns=["vec_id"])
        planted = {int(v) for v in src.vec_id if v % 3 == 0}
        assert set(out.src_id) == planted            # recall 1.0
        assert (out.tgt_id == TGT_ID_BASE + out.src_id).all()  # precision

    def test_margin_matches_numpy_bruteforce(self):
        """The distributed two-pass margins equal a single-process
        numpy recomputation of the Artetxe-Schwenk ratio margin."""
        import pandas as pd
        import ray
        from tilemaker_ray.ops.bitext import (BITEXT_K, bitext_mine,
                                              synth_tgt_table)
        src_df = (pd.read_parquet(f"{SF}/embeddings.parquet",
                                  columns=["vec_id", "embedding"])
                  .sort_values("vec_id"))
        tgt_t = synth_tgt_table(SF)
        sm = np.stack(src_df.embedding.to_numpy()).astype(np.float64)
        sm /= np.linalg.norm(sm, axis=1, keepdims=True)
        tm = np.stack(tgt_t.column("embedding").to_pandas().to_numpy()
                      ).astype(np.float64)
        tm /= np.linalg.norm(tm, axis=1, keepdims=True)
        tids = tgt_t.column("vec_id").to_numpy()
        sims = sm @ tm.T
        k = BITEXT_K
        fwd_knn = np.sort(sims, axis=1)[:, -k:].mean(axis=1)
        bwd_knn = np.sort(sims, axis=0)[-k:, :].mean(axis=0)
        j = np.argmax(sims, axis=1)
        best = sims[np.arange(len(sm)), j]
        margin = best / ((fwd_knn + bwd_knn[j]) / 2)
        exp = pd.DataFrame({
            "src_id": src_df.vec_id.to_numpy(),
            "tgt_id": tids[j],
            "margin": np.round(margin, 6)})
        exp = (exp[margin >= 1.5]
               .sort_values("src_id").reset_index(drop=True))
        got = bitext_mine(
            ray.data.from_pandas(src_df.reset_index(drop=True)),
            ray.data.from_arrow(tgt_t), margin_t=1.5)
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)

    def test_margin_separation_gap(self):
        """The fixture's planted/distractor margin gap straddles the
        default threshold with real slack on both sides."""
        import ray
        from tilemaker_ray.ops.bitext import (BITEXT_MARGIN_T, TGT_ID_BASE,
                                              bitext_mine, synth_tgt_table)
        src = ray.data.read_parquet(f"{SF}/embeddings.parquet",
                                    columns=["vec_id", "embedding"])
        tgt = ray.data.from_arrow(synth_tgt_table(SF))
        allp = bitext_mine(src, tgt, margin_t=0.0)
        truth = (allp.tgt_id == TGT_ID_BASE + allp.src_id) & \
                (allp.src_id % 3 == 0)
        lo, hi = allp[~truth].margin.max(), allp[truth].margin.min()
        assert lo < BITEXT_MARGIN_T < hi
        assert hi - lo > 0.2            # a real gap, not a knife edge


@pytest.mark.usefixtures("ray_session")
def test_bitext_empty_side_returns_empty():
    """An empty corpus side (a language shard filtered to nothing)
    mines zero pairs instead of crashing (review r4)."""
    import pyarrow as pa
    import ray
    from tilemaker_ray.ops.bitext import bitext_mine, synth_tgt_table
    dim = 64
    empty = ray.data.from_arrow(pa.table({
        "vec_id": pa.array([], pa.int64()),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array([], pa.float64()), dim)}))
    tgt = ray.data.from_arrow(synth_tgt_table(SF))
    out = bitext_mine(empty, tgt)
    assert len(out) == 0 and list(out.columns) == ["src_id", "tgt_id",
                                                   "margin"]
    src = ray.data.read_parquet(f"{SF}/embeddings.parquet",
                                columns=["vec_id", "embedding"])
    out2 = bitext_mine(src, empty)
    assert len(out2) == 0


@pytest.mark.usefixtures("ray_session")
def test_decontaminate_ngram_brute_parity():
    """The hash-join scale path matches a brute-force token-aligned
    scan exactly (collisions closed by the gram-string confirm)."""
    import pandas as pd
    from tilemaker_ray.ops.text import _probe_grams, q_decontaminate_ngram

    got = q_decontaminate_ngram(SF)
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    probes = _probe_grams(SF)
    grams = {}                    # gram string -> min probe_id
    for pid, g in zip(probes["probe_id"], probes["gram"]):
        grams[g] = min(grams.get(g, pid), pid)
    by_n = {}
    for g, pid in grams.items():
        by_n.setdefault(len(g.split(" ")), {})[g] = pid
    rows = []
    for did, text in zip(docs["doc_id"], docs["text"]):
        toks = text.split(" ")
        best, hits = None, 0
        for n, gset in by_n.items():
            for i in range(len(toks) - n + 1):
                g = " ".join(toks[i:i + n])
                if g in gset:
                    hits += 1
                    pid = gset[g]
                    best = pid if best is None else min(best, pid)
        if best is not None:
            rows.append({"doc_id": did, "probe_id": best, "n_hits": hits})
    exp = (pd.DataFrame(rows, columns=["doc_id", "probe_id", "n_hits"])
           .astype("int64").sort_values("doc_id").reset_index(drop=True))
    assert len(exp) >= 5          # the fixture plants real hits
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_decontaminate_ngram_token_boundary(tmp_path):
    """Token-aligned semantics: a probe gram embedded MID-WORD is not
    contamination (the substring variant would flag it); an aligned
    occurrence is, and the smallest matching probe wins."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from tilemaker_ray.ops.text import PROBE_MOD, q_decontaminate_ngram

    g0 = "alpha beta gamma delta epsilon zeta eta theta"
    g1 = "one two three four five six seven eight"
    texts = {
        0: g0 + " trailing words here",              # probe 0
        PROBE_MOD: g1 + " more trailing words",      # probe 101
        1: "prefix " + g0 + " suffix",               # aligned -> hit p0
        2: "prefixalpha beta gamma delta epsilon zeta eta theta x",
        3: f"x {g1} y {g0} z",                       # both -> min pid 0
        4: "no contamination at all in this document text",
    }
    d = tmp_path / "sf_ngram"
    d.mkdir()
    pq.write_table(pa.table({
        "doc_id": pa.array(sorted(texts), pa.int64()),
        "text": pa.array([texts[k] for k in sorted(texts)], pa.string()),
    }), str(d / "documents.parquet"))
    got = q_decontaminate_ngram(str(d)).set_index("doc_id")
    # probes self-match (their own first-8 gram), doc 1 and 3 hit
    assert set(got.index) == {0, PROBE_MOD, 1, 3}
    assert got.loc[1, "probe_id"] == 0
    assert got.loc[3, "probe_id"] == 0 and got.loc[3, "n_hits"] == 2
    assert 2 not in got.index     # mid-word: NOT token-aligned


def test_bpe_tiebreak_is_lexicographic():
    """Merge-count ties resolve by (a, b) lexicographic — the
    deterministic pick VERDICT r4 #4 requires: every pair here ties at
    count 2 in round one, so the winner is forced by the order alone."""
    from tilemaker_ray.ops.bpe import EOW, bpe_train_reference
    # "zx" x2 and "ya" x2: round-1 pair counts all tie at 2 —
    # ('a', EOW) vs ('y','a') vs ('z','x') vs ('x',EOW): lexicographic
    # min is ('a', EOW) (first element decides: 'a' < 'x' < 'y' < 'z')
    wf = {"zx": 2, "ya": 2}
    merges = bpe_train_reference(wf, 1)
    assert merges == [("a", EOW)]
    # and the full sequence stays deterministic across dict orderings
    assert (bpe_train_reference({"ya": 2, "zx": 2}, 4)
            == bpe_train_reference(wf, 4))


def test_pandas_nul_hashing_is_why_eow_is_not_nul():
    """Root-cause record for the r4 BPE flake: pandas' string
    hashtable truncates at embedded NUL bytes, so groupby keys
    'a\\x00' and 'a' COLLAPSE and their counts merge — with EOW='\\x00'
    the distributed trainer inflated ('x','y\\x00') counts whenever
    ('x','y') coexisted.  This test pins the environment behavior
    (if pandas ever fixes it, this documents why EOW moved to U+E000)
    and asserts the chosen sentinel is hash-stable."""
    from tilemaker_ray.ops.bpe import EOW
    assert EOW == "" and "\x00" not in EOW
    # the hazard that forced the move (pandas 2.x behavior):
    codes, _ = pd.factorize(pd.Series(["a\x00", "a"]))
    assert codes[0] == codes[1]          # NUL-truncated collision
    # the sentinel in use does NOT collide:
    codes2, _ = pd.factorize(pd.Series(["a" + EOW, "a"]))
    assert codes2[0] != codes2[1]
    h = pd.util.hash_pandas_object(
        pd.Series(["a" + EOW, "a"]), index=False)
    assert h.iloc[0] != h.iloc[1]


@pytest.mark.usefixtures("ray_session")
def test_bpe_block_order_invariance():
    """The distributed trainer's merge sequence is invariant to input
    block count and row order (the r4 flake's suspected mechanism was
    a tie resolved by arrival order): identical merges from 1-block,
    7-block and row-shuffled word tables, all equal to the reference
    on the same frequencies — ties included (every word has freq 1)."""
    import ray.data

    from tilemaker_ray.ops.bpe import bpe_train_from_words, bpe_train_reference
    rng = np.random.default_rng(17)
    words = ["".join(rng.choice(list("abcd"), rng.integers(2, 6)))
             for _ in range(120)]
    words = sorted(set(words))
    wf = {w: 1 for w in words}       # all-tied frequencies
    want = bpe_train_reference(wf, 10)
    base = pd.DataFrame({"word": words,
                         "n": np.ones(len(words), np.int64)})
    perms = [base, base.iloc[::-1].reset_index(drop=True),
             base.sample(frac=1, random_state=3).reset_index(drop=True)]
    for nblocks, df in zip((1, 7, 4), perms):
        ds = ray.data.from_pandas(df).repartition(nblocks)
        got = bpe_train_from_words(ds, 10)
        assert got == want, (nblocks, got[:3], want[:3])


def test_hash_tokens_u64_value_identity_incl_none():
    """hash_tokens_u64 must equal pd.util.hash_array elementwise for
    every NA flavor callers can see (ADVICE r4: pyarrow null strings
    surface as None, exploded nulls as NaN) and for empty input."""
    from tilemaker_ray.ops._util import hash_tokens_u64
    arr = np.array(["a", None, np.nan, "b", "a", None, "", "a"],
                   dtype=object)
    np.testing.assert_array_equal(hash_tokens_u64(arr),
                                  pd.util.hash_array(arr))
    allna = np.array([None, np.nan], dtype=object)
    np.testing.assert_array_equal(hash_tokens_u64(allna),
                                  pd.util.hash_array(allna))
    assert len(hash_tokens_u64(np.array([], dtype=object))) == 0
