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
        victim = all_rows[0]["partition"]
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
