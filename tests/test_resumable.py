import glob
import os

import pandas as pd
import pytest

from tilemaker_ray.sources.pages import pages_path
from tilemaker_ray.state.manifest import Manifest


@pytest.mark.usefixtures("ray_session")
class TestResumable:
    def test_run_and_resume(self, tmp_path):
        from tilemaker_ray.pipelines.resumable import run_resumable
        pages = pages_path(1000)
        out = str(tmp_path / "out")
        s1 = run_resumable(pages, out)
        assert s1["partitions_done_before"] == 0
        assert s1["partitions_total"] > 10
        n_files = len(glob.glob(os.path.join(out, "tiles", "*.parquet")))
        assert n_files == s1["partitions_total"]

        # resume: everything already done → nothing re-rendered
        s2 = run_resumable(pages, out)
        assert s2["partitions_done_before"] == s1["partitions_total"]
        assert s2["tiles_written_this_run"] == 0

        # manifest rows carry lineage + metrics
        rows = Manifest(out).rows()
        assert all(r["lineage"]["pages"] == pages for r in rows)
        assert all(r["rows"] >= 0 and r["wall_s"] >= 0 for r in rows)

        # partial resume: delete one manifest shard entry by removing all
        # shards and rewriting minus one partition → that partition (and
        # only it) is re-rendered
        mdir = os.path.join(out, "_manifest")
        all_rows = Manifest(out).rows()
        victim = next(r["partition"] for r in all_rows
                      if r["partition"].startswith("pk"))
        for f in glob.glob(os.path.join(mdir, "*.jsonl")):
            os.remove(f)
        w = Manifest(out).writer()
        for r in all_rows:
            if r["partition"] != victim:
                w.record(r["partition"], r["rows"], r["bytes"], r["wall_s"], r["lineage"])
        s3 = run_resumable(pages, out)
        assert s3["partitions_done_before"] == s1["partitions_total"] - 1

        # written tiles parquet reads back consistently
        dfs = [pd.read_parquet(f) for f in
               glob.glob(os.path.join(out, "tiles", "*.parquet"))]
        tiles = pd.concat([d for d in dfs if len(d)], ignore_index=True)
        assert not tiles.duplicated(subset=["zoom", "tile_x", "tile_y"]).any()
        assert (tiles.n_bytes > 0).all()

    def test_stage_a_checkpoint_and_midshuffle_resume(self, tmp_path):
        """Stage A persists per input block file; a crash between the
        stages resumes without re-extracting finished files, and a
        partially-extracted run re-extracts ONLY the missing files."""
        from tilemaker_ray.pipelines.resumable import run_resumable
        pages = pages_path(20000)  # 2 input block files
        out = str(tmp_path / "out")
        s1 = run_resumable(pages, out)
        assert s1["feature_files_total"] == 2
        assert s1["feature_files_done_before"] == 0
        feats = sorted(glob.glob(os.path.join(out, "features", "*.parquet")))
        assert len(feats) == 2
        ft_rows = [r for r in Manifest(out).rows()
                   if r["partition"].startswith("ft-")]
        assert len(ft_rows) == 2
        assert all(r["lineage"]["stage"] == "extract" and
                   r["lineage"]["n_pages"] == 10000 for r in ft_rows)

        # full resume: no file re-extracted (mtimes untouched), no tile
        # re-rendered
        mtimes = {f: os.path.getmtime(f) for f in feats}
        s2 = run_resumable(pages, out)
        assert s2["feature_files_done_before"] == 2
        assert s2["tiles_written_this_run"] == 0
        assert {f: os.path.getmtime(f) for f in feats} == mtimes

        # mid-shuffle crash: stage A half done (one file's checkpoint +
        # manifest row lost), stage B not started.  Resume re-extracts
        # only the lost file and produces tiles identical to a fresh run.
        out2 = str(tmp_path / "out2")
        os.makedirs(os.path.join(out2, "features"))
        victim = os.path.basename(feats[1])
        import shutil
        shutil.copy(feats[0], os.path.join(out2, "features",
                                           os.path.basename(feats[0])))
        surviving = ft_rows[0] if ft_rows[0]["partition"] != \
            f"ft-{victim[:-8]}" else ft_rows[1]
        w = Manifest(out2).writer()
        w.record(surviving["partition"], surviving["rows"],
                 surviving["bytes"], surviving["wall_s"],
                 surviving["lineage"])
        kept = os.path.join(out2, "features", os.path.basename(feats[0]))
        kept_mtime = os.path.getmtime(kept)
        s3 = run_resumable(pages, out2)
        assert s3["feature_files_done_before"] == 1
        assert os.path.getmtime(kept) == kept_mtime  # not re-extracted
        assert s3["tiles_written_this_run"] == s1["tiles_written_this_run"]

        def tiles_df(d):
            dfs = [pd.read_parquet(f) for f in
                   sorted(glob.glob(os.path.join(d, "tiles", "*.parquet")))]
            return (pd.concat([x for x in dfs if len(x)], ignore_index=True)
                    .sort_values(["zoom", "tile_x", "tile_y"])
                    .reset_index(drop=True))

        t1, t2 = tiles_df(out), tiles_df(out2)
        assert len(t1) == len(t2)
        assert (t1["mvt"] == t2["mvt"]).all()

    def test_stage_a_rows_match_streaming_path(self, tmp_path):
        """The checkpointed stage-A rows assemble to the same tiles as
        the non-checkpointed (streaming recompute) path."""
        from tilemaker_ray.pipelines.resumable import run_resumable
        pages = pages_path(1000)
        a = str(tmp_path / "ck")
        b = str(tmp_path / "st")
        run_resumable(pages, a, checkpoint_features=True)
        run_resumable(pages, b, checkpoint_features=False)

        def tiles_df(d):
            dfs = [pd.read_parquet(f) for f in
                   sorted(glob.glob(os.path.join(d, "tiles", "*.parquet")))]
            return (pd.concat([x for x in dfs if len(x)], ignore_index=True)
                    .sort_values(["zoom", "tile_x", "tile_y"])
                    .reset_index(drop=True))

        t1, t2 = tiles_df(a), tiles_df(b)
        assert len(t1) == len(t2)
        assert (t1["mvt"] == t2["mvt"]).all()
