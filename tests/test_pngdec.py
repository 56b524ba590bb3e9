"""PNG decoder (parsers/pngdec.py) against the test-side encoder
(tests/pngenc.py) — real encoded bytes, pixel-exact checks (PNG is
lossless, so every roundtrip must be bit-identical)."""

from __future__ import annotations

import numpy as np
import pytest

from ragflow_ray.parsers.pngdec import (
    BadPng,
    UnsupportedPng,
    decode_png,
    encode_png_rgb,
)
from tests.pngenc import encode_png


def _rgb(h, w, seed=0):
    rs = np.random.RandomState(seed)
    return rs.randint(0, 256, size=(h, w, 3), dtype=np.uint8)


class TestRoundtrip:
    def test_rgb8_all_filters_exact(self):
        img = _rgb(16, 11, seed=1)
        out = decode_png(encode_png(img, color_type=2, filters=[0, 1, 2, 3, 4]))
        assert out.shape == (16, 11, 3)
        assert (out == img).all()

    @pytest.mark.parametrize("f", [0, 1, 2, 3, 4])
    def test_rgb8_each_filter_alone(self, f):
        img = _rgb(9, 7, seed=10 + f)
        out = decode_png(encode_png(img, color_type=2, filters=[f]))
        assert (out == img).all()

    def test_gray8(self):
        rs = np.random.RandomState(2)
        g = rs.randint(0, 256, size=(12, 13), dtype=np.uint8)
        out = decode_png(encode_png(g, color_type=0))
        assert out.shape == (12, 13, 3)
        assert (out[..., 0] == g).all() and (out[..., 1] == g).all()

    def test_rgba_composites_over_white(self):
        img = np.zeros((4, 4, 4), dtype=np.uint8)
        img[..., :3] = 100
        img[..., 3] = 51  # alpha 0.2: 100*0.2 + 255*0.8 = 224
        out = decode_png(encode_png(img, color_type=6))
        assert (out == 224).all()

    def test_rgba_opaque_exact(self):
        img = np.dstack([_rgb(8, 8, seed=3),
                         np.full((8, 8), 255, dtype=np.uint8)])
        out = decode_png(encode_png(img, color_type=6))
        assert (out == img[..., :3]).all()

    def test_gray_alpha(self):
        rs = np.random.RandomState(4)
        ga = np.dstack([rs.randint(0, 256, (6, 6), dtype=np.uint8),
                        np.full((6, 6), 255, dtype=np.uint8)])
        out = decode_png(encode_png(ga, color_type=4))
        assert (out[..., 0] == ga[..., 0]).all()

    def test_palette(self):
        pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [7, 8, 9]],
                       dtype=np.uint8)
        idx = np.arange(24, dtype=np.uint8).reshape(4, 6) % 4
        out = decode_png(encode_png(idx, color_type=3, palette=pal))
        assert (out == pal[idx]).all()

    def test_palette_trns(self):
        pal = np.array([[200, 200, 200], [10, 20, 30]], dtype=np.uint8)
        idx = np.array([[0, 1], [1, 0]], dtype=np.uint8)
        out = decode_png(encode_png(idx, color_type=3, palette=pal,
                                    trns=bytes([0, 255])))  # index 0 transparent
        assert (out[0, 0] == 255).all()  # composited to white
        assert (out[0, 1] == pal[1]).all()

    @pytest.mark.parametrize("depth", [1, 2, 4])
    def test_palette_low_depth(self, depth):
        n = 1 << depth
        pal = (np.arange(n * 3, dtype=np.uint8).reshape(n, 3) * 17 % 256).astype(np.uint8)
        idx = (np.arange(35, dtype=np.uint8).reshape(5, 7) % n).astype(np.uint8)
        out = decode_png(encode_png(idx, color_type=3, depth=depth, palette=pal))
        assert (out == pal[idx]).all()

    @pytest.mark.parametrize("depth", [1, 2, 4])
    def test_gray_low_depth_scales(self, depth):
        maxv = (1 << depth) - 1
        g = (np.arange(18).reshape(3, 6) % (maxv + 1)).astype(np.uint8)
        out = decode_png(encode_png(g, color_type=0, depth=depth))
        assert (out[..., 0] == (g.astype(int) * 255 // maxv)).all()

    def test_rgb16_high_byte(self):
        img = _rgb(5, 5, seed=6)
        out = decode_png(encode_png(img, color_type=2, depth=16))
        assert (out == img).all()

    def test_multi_idat(self):
        img = _rgb(20, 20, seed=7)
        out = decode_png(encode_png(img, color_type=2, idat_split=50))
        assert (out == img).all()

    def test_single_pixel(self):
        img = np.array([[[9, 8, 7]]], dtype=np.uint8)
        assert (decode_png(encode_png(img, color_type=2)) == img).all()

    def test_library_writer_roundtrip(self):
        img = _rgb(8, 8, seed=8)
        assert (decode_png(encode_png_rgb(img)) == img).all()


class TestErrors:
    def test_bad_signature(self):
        with pytest.raises(BadPng):
            decode_png(b"\x89PNX" + b"\x00" * 32)

    def test_truncated(self):
        good = encode_png(_rgb(8, 8), color_type=2)
        with pytest.raises(BadPng):
            decode_png(good[:40])

    def test_interlace_flag_on_sequential_stream_rejected(self):
        # flipping the flag without re-laying-out passes must fail
        # cleanly (the pass layout needs more bytes than one image)
        good = bytearray(encode_png(_rgb(8, 8), color_type=2))
        good[16 + 12] = 1
        import struct as _s
        import zlib as _z
        good[29:33] = _s.pack(">I", _z.crc32(bytes(good[12:16 + 13])))
        with pytest.raises(BadPng):
            decode_png(bytes(good))

    def test_palette_missing_plte(self):
        idx = np.zeros((2, 2), dtype=np.uint8)
        raw = encode_png(idx, color_type=3, palette=np.zeros((1, 3), np.uint8))
        # strip the PLTE chunk
        i = raw.index(b"PLTE") - 4
        import struct as _s
        (size,) = _s.unpack_from(">I", raw, i)
        cut = raw[:i] + raw[i + 12 + size:]
        with pytest.raises(BadPng):
            decode_png(cut)

    def test_palette_index_out_of_range(self):
        pal = np.zeros((2, 3), dtype=np.uint8)
        idx = np.full((2, 2), 5, dtype=np.uint8)
        with pytest.raises(BadPng):
            decode_png(encode_png(idx, color_type=3, palette=pal))


class TestAdam7:
    def test_interlaced_rgb_exact(self):
        img = _rgb(16, 16, seed=20)
        out = decode_png(encode_png(img, color_type=2, interlace=True))
        assert (out == img).all()

    def test_interlaced_odd_dims(self):
        # 13x9: several passes have ragged sub-image sizes
        img = _rgb(13, 9, seed=21)
        out = decode_png(encode_png(img, color_type=2, interlace=True))
        assert (out == img).all()

    def test_interlaced_tiny(self):
        # 2x3: passes 1,4,6 have content; most are empty
        img = _rgb(2, 3, seed=22)
        out = decode_png(encode_png(img, color_type=2, interlace=True))
        assert (out == img).all()

    def test_interlaced_single_pixel(self):
        img = np.array([[[1, 2, 3]]], dtype=np.uint8)
        out = decode_png(encode_png(img, color_type=2, interlace=True))
        assert (out == img).all()

    def test_interlaced_with_filters(self):
        img = _rgb(24, 17, seed=23)
        out = decode_png(encode_png(img, color_type=2, interlace=True,
                                    filters=[4, 3, 2, 1]))
        assert (out == img).all()

    def test_interlaced_gray_low_depth(self):
        g = (np.arange(15 * 11).reshape(15, 11) % 4).astype(np.uint8)
        out = decode_png(encode_png(g, color_type=0, depth=2, interlace=True))
        assert (out[..., 0] == g.astype(int) * 255 // 3).all()

    def test_interlaced_palette(self):
        pal = np.array([[9, 9, 9], [1, 2, 3], [4, 5, 6]], dtype=np.uint8)
        idx = (np.arange(10 * 10).reshape(10, 10) % 3).astype(np.uint8)
        out = decode_png(encode_png(idx, color_type=3, palette=pal, interlace=True))
        assert (out == pal[idx]).all()

    def test_interlaced_rgba(self):
        img = np.dstack([_rgb(9, 12, seed=24),
                         np.full((9, 12), 255, dtype=np.uint8)])
        out = decode_png(encode_png(img, color_type=6, interlace=True))
        assert (out == img[..., :3]).all()

    def test_unknown_interlace_method(self):
        good = bytearray(encode_png(_rgb(8, 8), color_type=2))
        good[16 + 12] = 2
        import struct as _s
        import zlib as _z
        good[29:33] = _s.pack(">I", _z.crc32(bytes(good[12:16 + 13])))
        with pytest.raises(UnsupportedPng):
            decode_png(bytes(good))
