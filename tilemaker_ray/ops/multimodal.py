"""Multimodal columns: image/audio/video as opaque binary columns with
typed metadata, processed by actor-pool map_batches stages.

The decode kernels themselves are STUBBED (no image/audio libraries in
this container): `decode_image` raises NotImplementedError unless the
deterministic fake codec is selected. Everything around them — schema,
batch sizing for large binary payloads, actor signature, broadcast
model weights, output layout — is real and tested, so swapping in a
real codec (PIL/torchvision/ffmpeg) is a one-function change.

Scale notes: binary payloads make rows wide; stages use small
batch_size and pyarrow format so blocks stay within worker heaps and
the object store spills instead of Python lists.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

IMAGE_SCHEMA = pa.schema([
    ("doc_id", pa.int64()),
    ("media_type", pa.string()),     # "image/fake"
    ("payload", pa.binary()),        # opaque encoded bytes
    ("width", pa.int32()),
    ("height", pa.int32()),
])

FEATURE_DIM = 32


def synth_image_table(n: int, seed: int = 7) -> pa.Table:
    """Deterministic fake 'encoded images': header (w, h) + seeded
    bytes. Stands in for real webp/jpeg payloads in tests/benches."""
    rng = np.random.default_rng(seed)
    rows = {"doc_id": [], "media_type": [], "payload": [], "width": [], "height": []}
    for i in range(n):
        w = int(rng.integers(16, 128))
        h = int(rng.integers(16, 128))
        body = rng.bytes(w * h // 4)
        rows["doc_id"].append(i)
        rows["media_type"].append("image/fake")
        rows["payload"].append(struct.pack("<II", w, h) + body)
        rows["width"].append(w)
        rows["height"].append(h)
    return pa.table(rows, schema=IMAGE_SCHEMA)


def decode_image(payload: bytes, media_type: str) -> np.ndarray:
    """Decode an encoded image to (h, w) uint8 grayscale.

    Real codecs are NOT available in this environment. The
    deterministic fake codec ("image/fake") reproduces a stable pixel
    array from the payload bytes; any other media type raises — the
    marked swap-in point for PIL/libjpeg."""
    if media_type == "image/fake":
        w, h = struct.unpack_from("<II", payload, 0)
        seed = int.from_bytes(hashlib.blake2b(payload, digest_size=8).digest(), "little")
        rng = np.random.default_rng(seed)
        return rng.integers(0, 256, (h, w), dtype=np.uint8)
    raise NotImplementedError(
        f"no codec for {media_type}: install PIL/ffmpeg and extend decode_image")


class ImageFeaturizer:
    """Actor-pool stage: broadcast 'model' weights fetched once per
    actor in __init__ (ST1 pattern), per-batch decode → resize →
    feature projection. With a real model this is batched inference."""

    def __init__(self, weights_ref=None, out_size: int = 16):
        if weights_ref is None:
            rng = np.random.default_rng(123)
            self.weights = rng.normal(0, 1, (out_size * out_size, FEATURE_DIM))
        else:
            self.weights = ray.get(weights_ref)
        self.out_size = out_size

    def _resize(self, img: np.ndarray) -> np.ndarray:
        """Nearest-neighbor resize to (out, out) — numpy only."""
        h, w = img.shape
        yi = (np.arange(self.out_size) * h // self.out_size)
        xi = (np.arange(self.out_size) * w // self.out_size)
        return img[np.ix_(yi, xi)]

    def __call__(self, b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy()
        payloads = b.column("payload").to_pylist()
        mts = b.column("media_type").to_pylist()
        feats = np.empty((len(ids), FEATURE_DIM))
        means = np.empty(len(ids))
        for i in range(len(ids)):
            img = decode_image(payloads[i], mts[i])
            small = self._resize(img).astype(np.float64).ravel() / 255.0
            feats[i] = small @ self.weights
            means[i] = img.mean()
        return pa.table({
            "doc_id": pa.array(ids.astype(np.int64)),
            "embedding": pa.array(list(feats.astype(np.float32)),
                                  pa.list_(pa.float32())),
            "mean_luma": pa.array(means),
        })


def image_feature_dataset(n: int = 500, concurrency: int = 2,
                          batch_size: int = 64) -> ray.data.Dataset:
    """The full multimodal stage wiring: synth table → actor pool with
    small batches (large binary rows) → embedding rows."""
    table = synth_image_table(n)
    rng = np.random.default_rng(123)
    weights = rng.normal(0, 1, (16 * 16, FEATURE_DIM))
    wref = ray.put(weights)
    ds = ray.data.from_arrow(table)
    return ds.map_batches(ImageFeaturizer,
                          fn_constructor_kwargs={"weights_ref": wref},
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=concurrency)


def q_image_features(sf_dir: str) -> pd.DataFrame:
    """Rows-only query: deterministic multimodal featurize pipeline
    (sized by sf like the pages source)."""
    from ..sources.pages import rows_for_sf
    n = max(200, rows_for_sf(sf_dir) // 100)
    df = image_feature_dataset(n).to_pandas()
    df["mean_luma"] = df["mean_luma"].round(4)
    out = df[["doc_id", "mean_luma"]].sort_values("doc_id").reset_index(drop=True)
    return out
