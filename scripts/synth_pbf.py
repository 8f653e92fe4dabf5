"""Synthesize a deterministic multi-block .osm.pbf (BASELINE round-2
candidate #6): enough nodes/ways/relations to exercise the node-store
build and way assembly beyond the single-block monaco fixture.

Writes the OSM PBF container format from the public spec
(BlobHeader + raw Blob, PrimitiveBlock with DenseNodes / Way /
Relation groups).  Usage:

    python scripts/synth_pbf.py [out.pbf] [n_nodes] [n_ways]

Defaults: /tmp/synth.osm.pbf, 2_000_000 nodes, 100_000 ways.
"""

from __future__ import annotations

import struct
import sys

import numpy as np

GRANULARITY = 100  # nanodegrees, the OSM default


def _varint(buf: bytearray, v: int) -> None:
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            buf.append(b | 0x80)
        else:
            buf.append(b)
            return


def _zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63)


def _packed_varints(values) -> bytes:
    buf = bytearray()
    for v in values:
        _varint(buf, int(v))
    return bytes(buf)


def _packed_sints(values) -> bytes:
    buf = bytearray()
    for v in values:
        _varint(buf, _zigzag(int(v)))
    return bytes(buf)


def _field(buf: bytearray, fno: int, wire: int) -> None:
    _varint(buf, (fno << 3) | wire)


def _bytes_field(buf: bytearray, fno: int, data: bytes) -> None:
    _field(buf, fno, 2)
    _varint(buf, len(data))
    buf.extend(data)


def _varint_field(buf: bytearray, fno: int, v: int) -> None:
    _field(buf, fno, 0)
    _varint(buf, v)


def string_table(strings: list[bytes]) -> bytes:
    st = bytearray()
    for s in strings:
        _bytes_field(st, 1, s)
    return bytes(st)


def dense_nodes_group(ids, lats_nano, lons_nano, keys_vals) -> bytes:
    dn = bytearray()
    _bytes_field(dn, 1, _packed_sints(np.diff(ids, prepend=0)))
    _bytes_field(dn, 8, _packed_sints(np.diff(lats_nano // GRANULARITY, prepend=0)))
    _bytes_field(dn, 9, _packed_sints(np.diff(lons_nano // GRANULARITY, prepend=0)))
    if keys_vals:
        _bytes_field(dn, 10, _packed_varints(keys_vals))
    grp = bytearray()
    _bytes_field(grp, 2, bytes(dn))
    return bytes(grp)


def way_msg(wid: int, keys, vals, refs) -> bytes:
    w = bytearray()
    _varint_field(w, 1, wid)
    if keys:
        _bytes_field(w, 2, _packed_varints(keys))
        _bytes_field(w, 3, _packed_varints(vals))
    _bytes_field(w, 8, _packed_sints(np.diff(np.asarray(refs), prepend=0)))
    return bytes(w)


def relation_msg(rid: int, keys, vals, roles_sid, memids, types) -> bytes:
    r = bytearray()
    _varint_field(r, 1, rid)
    if keys:
        _bytes_field(r, 2, _packed_varints(keys))
        _bytes_field(r, 3, _packed_varints(vals))
    _bytes_field(r, 8, _packed_varints(roles_sid))
    _bytes_field(r, 9, _packed_sints(np.diff(np.asarray(memids), prepend=0)))
    _bytes_field(r, 10, _packed_varints(types))
    return bytes(r)


def primitive_block(strings: list[bytes], groups: list[bytes]) -> bytes:
    pb = bytearray()
    _bytes_field(pb, 1, string_table(strings))
    for g in groups:
        _bytes_field(pb, 2, g)
    _varint_field(pb, 17, GRANULARITY)
    _varint_field(pb, 19, 0)  # lat_offset
    _varint_field(pb, 20, 0)  # lon_offset
    return bytes(pb)


def blob(btype: str, data: bytes) -> bytes:
    body = bytearray()
    _bytes_field(body, 1, data)  # raw (uncompressed)
    hdr = bytearray()
    _bytes_field(hdr, 1, btype.encode())
    _varint_field(hdr, 3, len(body))
    return struct.pack(">I", len(hdr)) + bytes(hdr) + bytes(body)


def header_block(bbox) -> bytes:
    hb = bytearray()
    box = bytearray()
    for fno, deg in zip((1, 2, 3, 4), (bbox[0], bbox[2], bbox[1], bbox[3])):
        _field(box, fno, 0)
        _varint(box, _zigzag(int(deg * 1e9)))
    _bytes_field(hb, 1, bytes(box))
    _bytes_field(hb, 4, b"OsmSchema-V0.6")
    _bytes_field(hb, 4, b"DenseNodes")
    return bytes(hb)


HIGHWAY_CLASSES = [b"residential", b"primary", b"secondary", b"tertiary"]


def synthesize(path: str, n_nodes: int = 2_000_000, n_ways: int = 100_000,
               n_rels: int = 200, block_entities: int = 8000,
               bbox=(7.0, 43.0, 8.0, 44.0), seed: int = 42) -> dict:
    rng = np.random.default_rng(seed)
    # nodes on a jittered grid covering bbox
    side = int(np.ceil(np.sqrt(n_nodes)))
    ii = np.arange(n_nodes, dtype=np.int64)
    gx = (ii % side).astype(np.float64) / side
    gy = (ii // side).astype(np.float64) / side
    lon = bbox[0] + (bbox[2] - bbox[0]) * (gx + rng.uniform(-0.3, 0.3, n_nodes) / side)
    lat = bbox[1] + (bbox[3] - bbox[1]) * (gy + rng.uniform(-0.3, 0.3, n_nodes) / side)
    node_ids = ii + 1
    lat_nano = (lat * 1e9).astype(np.int64)
    lon_nano = (lon * 1e9).astype(np.int64)

    strings = [b"", b"highway", b"name", b"building", b"landuse", b"type",
               b"multipolygon", b"outer", b"inner", b"yes", b"grass",
               b"waterway", b"river"] + HIGHWAY_CLASSES
    sid = {s: i for i, s in enumerate(strings)}

    counts = {"nodes": 0, "ways": 0, "relations": 0, "blocks": 0}
    with open(path, "wb") as f:
        f.write(blob("OSMHeader", header_block(bbox)))
        # --- node blocks (untagged; a sprinkling of tagged POIs) -----
        for s in range(0, n_nodes, block_entities):
            e = min(s + block_entities, n_nodes)
            pb = primitive_block(strings, [dense_nodes_group(
                node_ids[s:e], lat_nano[s:e], lon_nano[s:e], [])])
            f.write(blob("OSMData", pb))
            counts["nodes"] += e - s
            counts["blocks"] += 1
        # --- way blocks: chains of nearby nodes ----------------------
        way_id = 10_000_000
        rel_member_pool: list[int] = []
        ways_per_block = max(1, block_entities // 8)
        w = 0
        while w < n_ways:
            group = bytearray()
            for _ in range(min(ways_per_block, n_ways - w)):
                way_id += 1
                w += 1
                ln = int(rng.integers(4, 16))
                start = int(rng.integers(0, n_nodes - ln * side - 1))
                horizontal = rng.random() < 0.5
                step = 1 if horizontal else side
                refs = (start + np.arange(ln, dtype=np.int64) * step) + 1
                r = rng.random()
                if r < 0.30:   # named highway
                    keys = [sid[b"highway"], sid[b"name"]]
                    vals = [sid[HIGHWAY_CLASSES[int(rng.integers(4))]],
                            sid[b"river"]]
                elif r < 0.45:  # closed building polygon
                    base = int(rng.integers(0, n_nodes - side - 2))
                    refs = np.array([base + 1, base + 2, base + side + 2,
                                     base + side + 1, base + 1], dtype=np.int64)
                    keys = [sid[b"building"]]
                    vals = [sid[b"yes"]]
                elif r < 0.50:  # landuse ring for relations
                    base = int(rng.integers(0, n_nodes - 2 * side - 3))
                    refs = np.array([base + 1, base + 3, base + 2 * side + 3,
                                     base + 2 * side + 1, base + 1],
                                    dtype=np.int64)
                    keys = []
                    vals = []
                    rel_member_pool.append(way_id)
                else:           # untagged path (filtered out)
                    keys = []
                    vals = []
                _bytes_field(group, 3, way_msg(way_id, keys, vals, refs))
            f.write(blob("OSMData", primitive_block(strings, [bytes(group)])))
            counts["ways"] += min(ways_per_block, n_ways - w + ways_per_block)
            counts["blocks"] += 1
        counts["ways"] = w
        # --- relation block: landuse multipolygons -------------------
        group = bytearray()
        rid = 20_000_000
        for i in range(min(n_rels, len(rel_member_pool))):
            rid += 1
            _bytes_field(group, 4, relation_msg(
                rid,
                [sid[b"type"], sid[b"landuse"]],
                [sid[b"multipolygon"], sid[b"grass"]],
                [sid[b"outer"]], [rel_member_pool[i]], [1]))
            counts["relations"] += 1
        if counts["relations"]:
            f.write(blob("OSMData", primitive_block(strings, [bytes(group)])))
            counts["blocks"] += 1
    return counts


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/synth.osm.pbf"
    n_nodes = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
    n_ways = int(sys.argv[3]) if len(sys.argv) > 3 else 100_000
    import os
    import time
    t0 = time.time()
    c = synthesize(out, n_nodes, n_ways)
    print(f"{out}: {os.path.getsize(out)/1e6:.1f} MB, {c} "
          f"in {time.time()-t0:.1f}s")
