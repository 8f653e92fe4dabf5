"""z/x/y file sink — one .pbf per tile in nested dirs + metadata.json
(/root/reference/src/tile_worker.cpp:521-536, shared_data.cpp:70-104).

Naturally parallel and resumable: this sink runs INSIDE the pipeline
(per-batch writes, atomic rename), unlike the single-writer container
packs.
"""

from __future__ import annotations

import json
import os

import pandas as pd

from ..state.manifest import atomic_write


def write_zxy_batch(df: pd.DataFrame, out_dir: str) -> pd.DataFrame:
    for _, row in df.iterrows():
        d = os.path.join(out_dir, str(int(row.zoom)), str(int(row.tile_x)))
        os.makedirs(d, exist_ok=True)
        atomic_write(os.path.join(d, f"{int(row.tile_y)}.pbf"), row.mvt)
    return df[["zoom", "tile_x", "tile_y", "n_bytes"]]


def write_metadata_json(out_dir: str, metadata: dict) -> None:
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "metadata.json"), "w") as f:
        json.dump(metadata, f, indent=2)


def write_zxy(tiles_ds, out_dir: str, metadata: dict) -> int:
    """tiles_ds: Dataset of (zoom, tile_x, tile_y, mvt). Streaming
    parallel write."""
    n = tiles_ds.map_batches(
        lambda df: write_zxy_batch(df, out_dir),
        batch_format="pandas").count()
    write_metadata_json(out_dir, metadata)
    return n
