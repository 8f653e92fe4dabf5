"""Tokenize-and-pack export (pipelines/export.py): stream parity with
a single-process reference, shard-resume byte identity, stats pinning."""
import glob
import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from tilemaker_ray.ops.bpe import BpeTokenizer, bpe_train
from tilemaker_ray.pipelines import export as ex

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def merges(ray_session):
    return bpe_train(SF, 12)


@pytest.fixture(scope="module")
def run(tmp_path_factory, merges, ray_session):
    out = str(tmp_path_factory.mktemp("export"))
    stats = ex.export_shards(SF, out, seq_len=64, shard_blocks=4,
                             merges=merges)
    return out, stats


def _reference_stream(merges) -> np.ndarray:
    """Single-process tokenize-concat: the ground truth."""
    vocab = ex.build_vocab(SF, merges)
    bpe = BpeTokenizer(merges)
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"]).sort_values("doc_id")
    out = []
    for t in docs["text"]:
        out.extend(vocab.get(s, ex.UNK_ID)
                   for w in t.split(" ") for s in bpe.word(w))
        out.append(ex.EOS_ID)
    return np.asarray(out, np.int32)


def test_stream_parity(run, merges):
    out, stats = run
    ref = _reference_stream(merges)
    got = ex.read_stream(out, seq_len=64)
    assert np.array_equal(got, ref)
    # stats really cover the whole stream
    n_blocks = int(stats["n_blocks"].sum())
    assert n_blocks == -(-len(ref) // 64)
    assert stats["resumed"].eq(0).all()


def test_block_layout(run):
    out, stats = run
    files = sorted(glob.glob(f"{out}/shards/shard-*.parquet"))
    assert len(files) == len(stats)
    seen = []
    for f in files:
        t = pq.read_table(f)
        mat = (t.column("tokens").combine_chunks().flatten()
               .to_numpy(zero_copy_only=False).reshape(len(t), 64))
        seen.append(t.column("block_id").to_numpy())
        # PAD appears nowhere except the global tail block
        assert (mat == ex.PAD_ID).sum() == 0 or f == files[-1]
    ids = np.concatenate(seen)
    assert np.array_equal(np.sort(ids), np.arange(len(ids)))


def test_stats_pin_tokens(run):
    out, stats = run
    for _, row in stats.iterrows():
        t = pq.read_table(f"{out}/shards/shard-{int(row['shard']):06d}"
                          ".parquet")
        mat = (t.column("tokens").combine_chunks().flatten()
               .to_numpy(zero_copy_only=False).astype(np.int64))
        assert mat.sum() == row["tok_sum"]
        assert np.bitwise_xor.reduce(mat) == row["tok_xor"]


def test_resume_skips_finished_shards(run, merges):
    out, stats = run
    files = sorted(glob.glob(f"{out}/shards/shard-*.parquet"))
    victim = files[1]
    vshard = int(os.path.basename(victim)[6:12])
    before = {f: os.path.getmtime(f) for f in files if f != victim}
    os.remove(victim)
    os.remove(f"{out}/_manifest/shard-{vshard:06d}.json")
    again = ex.export_shards(SF, out, seq_len=64, shard_blocks=4,
                             merges=merges)
    # only the victim was rewritten; everything else untouched
    assert os.path.exists(victim)
    for f, m in before.items():
        assert os.path.getmtime(f) == m
    r = again.set_index("shard")
    assert int(r.loc[vshard, "resumed"]) == 0
    assert r.drop(index=vshard)["resumed"].eq(1).all()
    # byte-identical stats after resume
    assert (again.drop(columns=["resumed"]).reset_index(drop=True)
            .equals(stats.drop(columns=["resumed"]).reset_index(drop=True)))


def test_driver_entry(ray_session):
    df = ex.q_export_shards(SF)
    assert list(df.columns) == ["shard", "n_blocks", "n_tokens",
                                "tok_sum", "tok_xor"]
    assert len(df) > 0 and (df["n_blocks"] > 0).all()


@pytest.mark.usefixtures("ray_session")
def test_export_doc_spans_oracle_parity():
    """The surrogate-tokenizer export oracle (VERDICT r4 #7): the REAL
    tokenize→place→exchange→write pipeline under WsTokenizer, read
    back from the WRITTEN shards, equals the DuckDB window-cumsum twin
    row-for-row (placement AND per-doc id sums)."""
    import duckdb

    from tilemaker_ray.pipelines.export import (export_doc_spans,
                                                export_doc_spans_oracle_sql)
    got = export_doc_spans(SF)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF}/documents.parquet')")
    exp = con.sql(export_doc_spans_oracle_sql()).df()
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  exp.reset_index(drop=True),
                                  check_dtype=False)
    # the spans actually straddle blocks and shards at this scale
    assert (got["exp_first_block"] != got["exp_last_block"]).any()
    assert got["exp_shard_last"].max() > 0
