"""Real PNG codec, pure numpy + stdlib zlib (public RFC 2083 / W3C
PNG spec — no image libraries in this container).

Decoder: 8-bit non-interlaced PNGs, color types 0 (gray), 2 (RGB),
3 (palette), 4 (gray+alpha), 6 (RGBA); all five scanline filters
(None/Sub/Up/Average/Paeth); chunk CRC verification. Returns (h, w)
uint8 grayscale (BT.601 luma, matching decode_bmp's convention;
alpha is ignored for featurization).

Encoder: filter-0 writer for gray / RGB / RGBA (synth + test helper).

Vectorization notes: None/Up filters invert as whole-row numpy ops and
Sub inverts as a per-lane cumsum mod 256; Average/Paeth carry a
left-neighbor dependency, so those rows fall back to a per-byte loop
(scanlines are short relative to the zlib cost either way).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"

# bytes-per-pixel per color type at bit depth 8
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))


def encode_png(img: np.ndarray) -> bytes:
    """(h,w) gray, (h,w,3) RGB or (h,w,4) RGBA uint8 → PNG bytes
    (filter 0 on every scanline)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        color = 0
    elif img.ndim == 3 and img.shape[2] == 3:
        color = 2
    elif img.ndim == 3 and img.shape[2] == 4:
        color = 6
    else:
        raise ValueError(f"unsupported image shape {img.shape}")
    h, w = img.shape[:2]
    flat = img.reshape(h, -1)
    raw = np.concatenate([np.zeros((h, 1), np.uint8), flat], axis=1).tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(raw, 6))
            + _chunk(b"IEND", b""))


def _unfilter(filt: np.ndarray, ftypes: np.ndarray, bpp: int) -> np.ndarray:
    """Invert PNG scanline filters. filt: (h, stride) filtered bytes,
    ftypes: (h,) filter type per row. Returns reconstructed bytes."""
    h, stride = filt.shape
    recon = np.zeros_like(filt)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        f = int(ftypes[y])
        row = filt[y]
        if f == 0:                                   # None
            cur = row.copy()
        elif f == 2:                                 # Up
            cur = row + prev                         # uint8 wraps mod 256
        elif f == 1:                                 # Sub: per-lane cumsum
            cur = row.copy()
            for lane in range(bpp):
                cur[lane::bpp] = np.cumsum(
                    row[lane::bpp].astype(np.uint64)).astype(np.uint8)
        elif f == 3:                                 # Average
            cur = np.zeros(stride, dtype=np.uint8)
            for x in range(stride):
                left = int(cur[x - bpp]) if x >= bpp else 0
                cur[x] = (int(row[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif f == 4:                                 # Paeth
            cur = np.zeros(stride, dtype=np.uint8)
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                if pa_ <= pb and pa_ <= pc:
                    pr = a
                elif pb <= pc:
                    pr = b
                else:
                    pr = c
                cur[x] = (int(row[x]) + pr) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {f}")
        recon[y] = cur
        prev = cur
    return recon


def _luma(rgb: np.ndarray) -> np.ndarray:
    r = rgb[..., 0].astype(np.float32)
    g = rgb[..., 1].astype(np.float32)
    b = rgb[..., 2].astype(np.float32)
    return np.clip(np.rint(0.299 * r + 0.587 * g + 0.114 * b),
                   0, 255).astype(np.uint8)


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes → (h, w) uint8 grayscale."""
    if payload[:8] != _SIG:
        raise ValueError("not a PNG payload")
    pos = 8
    ihdr = None
    idat = []
    plte = None
    while pos + 8 <= len(payload):
        (ln,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + ln]
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + ln)
        if zlib.crc32(tag + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif tag == b"IDAT":
            idat.append(data)
        elif tag == b"PLTE":
            plte = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color, comp, flt, interlace = ihdr
    if depth != 8:
        raise NotImplementedError(f"PNG bit depth {depth}")
    if interlace != 0:
        raise NotImplementedError("interlaced (Adam7) PNG")
    if color not in _CHANNELS:
        raise NotImplementedError(f"PNG color type {color}")
    bpp = _CHANNELS[color]
    stride = w * bpp
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG data size mismatch")
    rows = raw.reshape(h, stride + 1)
    recon = _unfilter(np.ascontiguousarray(rows[:, 1:]), rows[:, 0], bpp)
    px = recon.reshape(h, w, bpp)
    if color == 0:
        return px[:, :, 0].copy()
    if color == 4:                      # gray + alpha: drop alpha
        return px[:, :, 0].copy()
    if color == 2:
        return _luma(px)
    if color == 6:
        return _luma(px[:, :, :3])
    # color == 3: palette lookup then luma
    if plte is None:
        raise ValueError("paletted PNG missing PLTE")
    return _luma(plte[px[:, :, 0]])
