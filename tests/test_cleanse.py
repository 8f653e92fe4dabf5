"""End-to-end corpus-cleaning pipeline: the kept set must equal a
recomputation from the individually-oracled component ops, and a rerun
must resume (skip every finished partition, write nothing)."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _expected_keep_set():
    """Recompute the keep rule from the component ops (each one
    independently oracle-gated)."""
    from tilemaker_ray.ops.dedup import q_dedup_keep_first
    from tilemaker_ray.ops.text import LM_ALPHA, q_gopher_rules, q_langid
    from tilemaker_ray.pipelines.cleanse import CLEAN_LM_MAX_BITS

    keep_first = set(q_dedup_keep_first(SF)["doc_id"])
    gopher = q_gopher_rules(SF).set_index("doc_id")["gopher_pass"]
    langid = q_langid(SF).set_index("doc_id")["pred_lang"]

    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    ex = docs["text"].str.split(" ").explode()
    vc = ex.value_counts().sort_index()
    vocab = vc.index.to_numpy(dtype=object)
    n = vc.to_numpy(np.float64)
    total, v = n.sum(), len(vocab)
    bits = -np.log2((n + LM_ALPHA) / (total + LM_ALPHA * v))
    s = np.zeros(len(docs))
    np.add.at(s, ex.index.to_numpy(),
              bits[np.searchsorted(vocab, ex.to_numpy(dtype=object))])
    lm = np.round(s / (docs["text"].str.count(" ") + 1).to_numpy(), 6)
    lm_ok = pd.Series(lm <= CLEAN_LM_MAX_BITS,
                      index=docs["doc_id"].to_numpy())

    return {int(d) for d in docs["doc_id"]
            if d in keep_first and gopher.loc[d] == 1
            and lm_ok.loc[d] and langid.loc[d] != "und"}


@pytest.mark.usefixtures("ray_session")
def test_clean_corpus_matches_components(tmp_path):
    from tilemaker_ray.pipelines.cleanse import CLEAN_PARTS, clean_corpus

    out = str(tmp_path / "clean")
    stats = clean_corpus(SF, out)
    kept = pq.read_table(f"{out}/docs").to_pandas()
    assert stats["partitions_total"] == CLEAN_PARTS
    assert stats["docs_written_this_run"] == len(kept)
    expected = _expected_keep_set()
    assert set(kept["doc_id"]) == expected
    # every drop rule fired on this corpus (thresholds have signal)
    for k in ("drop_dup", "drop_gopher", "drop_lm"):
        assert stats[k] >= 0
    assert stats["drop_gopher"] > 0 and stats["drop_lm"] > 0
    # kept text is byte-identical to the source (cleaning never edits)
    src = pq.read_table(f"{SF}/documents.parquet",
                        columns=["doc_id", "text"]).to_pandas()
    merged = kept.merge(src, on="doc_id", suffixes=("", "_src"))
    assert (merged["text"] == merged["text_src"]).all()


@pytest.mark.usefixtures("ray_session")
def test_clean_corpus_resume(tmp_path):
    from tilemaker_ray.pipelines.cleanse import CLEAN_PARTS, clean_corpus

    out = str(tmp_path / "clean")
    first = clean_corpus(SF, out)
    before = sorted((tmp_path / "clean" / "docs").iterdir())
    mtimes = {p.name: p.stat().st_mtime_ns for p in before}
    second = clean_corpus(SF, out)
    assert second["partitions_done_before"] == CLEAN_PARTS
    assert second["docs_written_this_run"] == 0
    assert second["docs_kept_total"] == first["docs_kept_total"]
    after = {p.name: p.stat().st_mtime_ns
             for p in (tmp_path / "clean" / "docs").iterdir()}
    assert after == mtimes          # no partition rewritten


@pytest.mark.usefixtures("ray_session")
def test_clean_corpus_drops_planted_duplicates(tmp_path):
    """The sf corpora contain no exact dups, so plant some: keep-first
    must retain the smallest doc_id of each text and drop the rest."""
    import pyarrow as pa

    from tilemaker_ray.pipelines.cleanse import clean_corpus

    # 'the and' → LangId votes 'en' (docs without profile words would
    # all fall to 'und' and be dropped by the language rule instead)
    good = ("the and "
            + ("word" + pd.Series(range(12)).astype(str)).str.cat(sep=" "))
    d = tmp_path / "sf_dup"
    d.mkdir()
    import pyarrow.parquet as pqw
    pqw.write_table(pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array([good, good, good + " tail word", good]),
        "lang": pa.array(["en"] * 4),
    }), str(d / "documents.parquet"))
    stats = clean_corpus(str(d), str(tmp_path / "out"))
    kept = pq.read_table(str(tmp_path / "out" / "docs")).to_pandas()
    assert stats["drop_dup"] == 2                 # docs 1 and 3
    assert 0 in set(kept["doc_id"]) and not {1, 3} & set(kept["doc_id"])
