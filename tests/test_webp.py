"""VP8L (lossless WebP) codec tests: exact round-trips through every
transform / entropy feature combination, container handling, and the
multimodal dispatch wiring."""
import numpy as np
import pytest

from tilemaker_ray.ops.webp import (
    _DIST_MAP, _copy_symbol, _copy_value, _BitReader, _BitWriter,
    decode_webp, decode_webp_gray, encode_webp,
)
from tilemaker_ray.ops.multimodal import decode_image, synth_image_table


def _expect_rgba(img: np.ndarray) -> np.ndarray:
    if img.ndim == 2:
        img = np.repeat(img[..., None], 3, axis=2)
    if img.shape[2] == 3:
        a = np.full(img.shape[:2] + (1,), 255, np.uint8)
        img = np.concatenate([img, a], axis=2)
    return img


def _roundtrip(img, **kw):
    out = decode_webp(encode_webp(img, **kw))
    np.testing.assert_array_equal(out, _expect_rgba(img))


class TestRoundTrip:
    def test_literal_rgb(self):
        rng = np.random.default_rng(1)
        _roundtrip(rng.integers(0, 256, (13, 7, 3), dtype=np.uint8))

    def test_rgba_alpha_exact(self):
        rng = np.random.default_rng(2)
        img = rng.integers(0, 256, (24, 31, 4), dtype=np.uint8)
        out = decode_webp(encode_webp(img))
        np.testing.assert_array_equal(out[..., 3], img[..., 3])

    def test_color_cache(self):
        rng = np.random.default_rng(3)
        img = (rng.integers(0, 9, (40, 40, 3)) * 28).astype(np.uint8)
        _roundtrip(img, cache_bits=6)
        _roundtrip(img, cache_bits=1)
        _roundtrip(img, cache_bits=11)

    def test_rle_backrefs(self):
        img = np.zeros((20, 33, 3), np.uint8)
        img[5:10, 4:20] = 77
        img[:, ::3] = 200
        _roundtrip(img, use_rle=True)
        _roundtrip(img, use_rle=True, cache_bits=4)

    def test_rle_run_crossing_rows_uses_2d_dist_map(self):
        # constant image: the encoder emits dist=1 runs crossing row
        # boundaries, exercising the short-distance plane map
        _roundtrip(np.full((10, 10, 3), 42, np.uint8), use_rle=True)

    def test_subtract_green(self):
        rng = np.random.default_rng(4)
        _roundtrip(rng.integers(0, 256, (9, 14, 3), dtype=np.uint8),
                   subtract_green=True)

    @pytest.mark.parametrize("mode", list(range(14)))
    def test_all_predictor_modes(self, mode):
        grad = (np.arange(25)[:, None] * 7
                + np.arange(18)[None, :] * 3).astype(np.uint8)
        img = np.stack([grad, grad[::-1], 255 - grad], axis=2)
        _roundtrip(img, predictor=mode)

    def test_cross_color(self):
        rng = np.random.default_rng(5)
        img = rng.integers(0, 256, (17, 23, 3), dtype=np.uint8)
        _roundtrip(img, cross_color=(23, 250, 7))
        _roundtrip(img, cross_color=(255, 1, 128), subtract_green=True)

    def test_stacked_transforms(self):
        rng = np.random.default_rng(6)
        img = rng.integers(0, 256, (21, 16, 3), dtype=np.uint8)
        _roundtrip(img, subtract_green=True, cross_color=(9, 9, 9),
                   predictor=7, cache_bits=3)

    @pytest.mark.parametrize("ncolors,width", [
        (2, 8), (2, 9), (2, 15), (4, 10), (4, 11),
        (16, 16), (16, 17), (200, 12),
    ])
    def test_palette_bundling(self, ncolors, width):
        rng = np.random.default_rng(ncolors * 100 + width)
        step = 255 // max(1, ncolors - 1)
        img = (rng.integers(0, ncolors, (11, width)) * step).astype(np.uint8)
        _roundtrip(img, palette=True)

    def test_meta_prefix_codes(self):
        rng = np.random.default_rng(7)
        img = rng.integers(0, 256, (37, 41, 3), dtype=np.uint8)
        _roundtrip(img, meta_bits=3)
        _roundtrip(img, meta_bits=4, cache_bits=5)
        _roundtrip(img, meta_bits=2, subtract_green=True)

    def test_degenerate_shapes(self):
        rng = np.random.default_rng(8)
        _roundtrip(np.array([[123]], dtype=np.uint8))
        _roundtrip(rng.integers(0, 256, (1, 19), dtype=np.uint8))
        _roundtrip(rng.integers(0, 256, (19, 1), dtype=np.uint8))


class TestContainer:
    def test_vp8x_wrapper_scanned_for_vp8l(self):
        import struct
        img = np.full((5, 5), 9, np.uint8)
        plain = encode_webp(img)
        vp8l_chunk = plain[12:]  # the VP8L chunk of our own writer
        vp8x = b"VP8X" + struct.pack("<I", 10) + bytes(10)
        riff = b"WEBP" + vp8x + vp8l_chunk
        wrapped = b"RIFF" + struct.pack("<I", len(riff)) + riff
        np.testing.assert_array_equal(decode_webp(wrapped), _expect_rgba(img))

    def test_lossy_vp8_raises(self):
        import struct
        chunk = b"VP8 " + struct.pack("<I", 4) + bytes(4)
        riff = b"WEBP" + chunk
        payload = b"RIFF" + struct.pack("<I", len(riff)) + riff
        with pytest.raises(NotImplementedError):
            decode_webp(payload)

    def test_not_webp_raises(self):
        with pytest.raises(ValueError):
            decode_webp(b"RIFF\x00\x00\x00\x00JUNK")


class TestInternals:
    def test_distance_map_shape_and_prefix(self):
        # 120 entries over y in [0,7], x in [-7,8]; the spec's table
        # opens (0,1),(1,0),(1,1),(-1,1),(0,2),(2,0),(1,2),(-1,2)...
        assert len(_DIST_MAP) == 120
        assert _DIST_MAP[:10] == [(0, 1), (1, 0), (1, 1), (-1, 1), (0, 2),
                                  (2, 0), (1, 2), (-1, 2), (2, 1), (-2, 1)]
        d2 = [x * x + y * y for x, y in _DIST_MAP]
        assert d2 == sorted(d2)

    def test_copy_symbol_value_inverse(self):
        for v in list(range(1, 70)) + [333, 1024, 4096]:
            code, extra, ebits = _copy_symbol(v)
            bw = _BitWriter()
            bw.write(extra, ebits)
            br = _BitReader(bw.bytes() or b"\x00")
            assert _copy_value(code, br) == v


class TestDispatch:
    def test_decode_image_routes_webp(self):
        rng = np.random.default_rng(9)
        img = rng.integers(0, 256, (12, 12, 3), dtype=np.uint8)
        payload = encode_webp(img, cache_bits=4)
        gray = decode_image(payload, "image/webp")
        assert gray.shape == (12, 12)
        np.testing.assert_array_equal(gray, decode_webp_gray(payload))

    def test_synth_table_mixes_webp(self):
        t = synth_image_table(21)
        mts = t.column("media_type").to_pylist()
        assert "image/webp" in mts
        idx = mts.index("image/webp")
        payload = t.column("payload")[idx].as_py()
        w = t.column("width")[idx].as_py()
        h = t.column("height")[idx].as_py()
        assert decode_image(payload, "image/webp").shape == (h, w)


def test_select_predictor_ties_go_to_top():
    """VP8L predictor 11 (Select) tie-break: libwebp's Sub3 returns TOP
    when the Manhattan distances are equal (review finding — a LEFT
    tie-break decodes spec-conformant files wrongly and the error
    propagates through sequential prediction)."""
    from tilemaker_ray.ops.webp import _predict
    left, top, topleft = 0x00020000, 0x00000200, 0
    assert _predict(11, left, top, topleft, 0) == top
    # non-tie behavior unchanged: p == left ⇒ distance 0 ⇒ left wins
    assert _predict(11, 0x05050505, 0x50505050, 0x50505050, 0) == 0x05050505
