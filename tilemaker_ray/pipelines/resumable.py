"""Resumable flagship run: tiles written as partitioned parquet with a
checkpoint manifest; a rerun skips finished partitions.

Partition unit = the stage-B macro-block group (zoom, mx, my) — the
same key as the assembly shuffle, so the skip-filter sits right after
stage A and completed partitions never re-enter the second shuffle.
Stage A (extract → assign → geometry) is deterministic and recomputed
on resume (documented trade-off; persisting stage-A partials is the
next increment — the materialize() checkpoint already marks the spot).

Layout:
    out_dir/tiles/z{zoom}-mx{mx}-my{my}.parquet   (atomic rename)
    out_dir/_manifest/shard-*.jsonl               (lineage + metrics)
"""

from __future__ import annotations

import os
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

from ..config import Config, default_config
from ..state.manifest import Manifest, atomic_write
from ..stages.salted import SALT_K, GeomStage, TileAssembler
from ..stages.tiles import assign_tiles_batch
from .flagship import feature_dataset


class WritingAssembler(TileAssembler):
    """Stage B + atomic parquet write + manifest row per partition."""

    def __init__(self, out_dir: str, pages_dir: str, config: Config | None = None):
        super().__init__(config)
        self.out_dir = out_dir
        self.pages_dir = pages_dir
        self.tiles_dir = os.path.join(out_dir, "tiles")
        os.makedirs(self.tiles_dir, exist_ok=True)
        self.mwriter = Manifest(out_dir).writer()

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        t0 = time.time()
        key = f"pk{int(df['pk'].iloc[0]):05d}"
        out = super().__call__(df)
        path = os.path.join(self.tiles_dir, f"{key}.parquet")
        table = pa.Table.from_pandas(out, preserve_index=False)
        import io
        buf = io.BytesIO()
        pq.write_table(table, buf)
        atomic_write(path, buf.getvalue())
        self.mwriter.record(key, len(out), int(out["n_bytes"].sum()) if len(out) else 0,
                            time.time() - t0,
                            lineage={"pages": self.pages_dir,
                                     "stage": "assemble", "n_input_rows": len(df)})
        return out[["zoom", "tile_x", "tile_y", "n_features", "n_bytes"]]


def run_resumable(pages_dir: str, out_dir: str,
                  config: Config | None = None) -> dict:
    """Run (or resume) the flagship into out_dir. Returns summary stats.
    Completed partitions (per the manifest) are skipped before the
    assembly shuffle via a broadcast key-set filter."""
    import json
    config = config or default_config()
    manifest = Manifest(out_dir)
    done = manifest.completed()

    # pin the partition count on first run so a resume (possibly on a
    # different cluster size) maps rows to the same partitions
    from ..stages.salted import (add_partition_key, data_num_partitions,
                                 dir_input_bytes)
    meta_path = os.path.join(out_dir, "_manifest", "run_meta.json")
    if os.path.exists(meta_path):
        nparts = json.load(open(meta_path))["num_partitions"]
    else:
        nparts = data_num_partitions(dir_input_bytes(pages_dir))
        with open(meta_path, "w") as f:
            json.dump({"num_partitions": nparts, "pages": pages_dir}, f)

    from ray.data import DataContext
    ctx = DataContext.get_current()
    if ctx.target_max_block_size is None or ctx.target_max_block_size > 8 * 1024 * 1024:
        ctx.target_max_block_size = 8 * 1024 * 1024

    from ..stages.salted import GeomMap
    geom_map = GeomMap(config)

    def run_geom(b):
        return geom_map(b)

    def skip_done(df: pd.DataFrame) -> pd.DataFrame:
        """Anti-join against the completed-partition set. Captured in
        the task closure (plain function — an actor pool here would
        reserve CPUs and can starve the task stages on small clusters);
        for a very large done-set switch to ray.put + lazy ray.get."""
        if not done:
            return df
        keys = "pk" + df["pk"].astype(np.int64).astype(str).str.zfill(5)
        return df[~keys.isin(done)]

    assembler = WritingAssembler(out_dir, pages_dir, config)

    def run_assemble(df):
        return assembler(df)

    def add_pk(df):
        return add_partition_key(df, nparts)

    partials = (feature_dataset(pages_dir, config)
                .map_batches(run_geom, batch_format="pyarrow")
                .map_batches(add_pk, batch_format="pandas")
                .map_batches(skip_done, batch_format="pandas"))
    tiles = partials.groupby("pk").map_groups(
        run_assemble, batch_format="pandas")
    summary = tiles.map_batches(
        lambda df: pd.DataFrame({"tiles": [len(df)],
                                 "bytes": [int(df["n_bytes"].sum()) if len(df) else 0]}),
        batch_format="pandas").to_pandas().sum()

    rows = Manifest(out_dir).rows()
    return {
        "partitions_done_before": len(done),
        "partitions_total": len(rows),
        "tiles_written_this_run": int(summary.get("tiles", 0)),
        "manifest_rows": len(rows),
    }
