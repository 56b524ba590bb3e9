"""TGA decoder tests — hand-built headers per feature."""

import struct

import numpy as np
import pytest

from ragflow_ray.parsers.tgadec import (BadTga, UnsupportedTga,
                                        _unrle_tga, decode_tga,
                                        encode_tga_rgb24)


def _hdr(itype, w, h, bpp, desc=0, cmap=(0, 0, 0, 0)):
    ct, first, length, bits = cmap
    return struct.pack("<BBBHHBHHHHBB", 0, ct, itype, first, length,
                       bits, 0, 0, w, h, bpp, desc)


class TestTga:
    def test_type2_roundtrip(self):
        rng = np.random.default_rng(21)
        for w, h in ((8, 8), (5, 3), (1, 1)):
            img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            assert (decode_tga(encode_tga_rgb24(img)) == img).all()

    def test_rle_packets(self):
        got = _unrle_tga(bytes([0x82, 9, 8, 7, 0x01, 1, 2, 3,
                                4, 5, 6]), 5, 3)
        assert got == bytes([9, 8, 7] * 3 + [1, 2, 3, 4, 5, 6])

    def test_type10_rle_truecolor(self):
        rng = np.random.default_rng(22)
        img = rng.integers(0, 256, (2, 3, 3), dtype=np.uint8)
        stream = b"".join(b"\x00" + bytes(px) for px in
                          img[::-1, :, ::-1].reshape(-1, 3))
        out = decode_tga(_hdr(10, 3, 2, 24) + stream)
        assert (out == img).all()

    def test_type3_gray_top_down(self):
        g = np.random.default_rng(23).integers(
            0, 256, (2, 3), dtype=np.uint8)
        out = decode_tga(_hdr(3, 3, 2, 8, desc=0x20) + g.tobytes())
        assert (out[:, :, 0] == g).all()

    def test_type1_palette_with_first_offset(self):
        pal = b"".join(bytes([b, g, r]) for r, g, b in
                       [(i, 255 - i, i // 2) for i in range(8)])
        blob = (_hdr(1, 4, 1, 8, desc=0x20, cmap=(1, 4, 8, 24))
                + pal + bytes([4, 5, 6, 11]))
        out = decode_tga(blob)
        assert tuple(out[0, 0]) == (0, 255, 0)
        assert tuple(out[0, 3]) == (7, 248, 3)

    def test_16bit_555(self):
        v = (10 << 10) | (20 << 5) | 31
        out = decode_tga(_hdr(2, 1, 1, 16, desc=0x20)
                         + struct.pack("<H", v))
        assert tuple(out[0, 0]) == ((10 << 3) | (10 >> 2),
                                    (20 << 3) | (20 >> 2), 255)

    def test_right_to_left(self):
        img = np.array([[[1, 1, 1], [2, 2, 2]]], dtype=np.uint8)
        out = decode_tga(_hdr(2, 2, 1, 24, desc=0x30)
                         + img[:, :, ::-1].tobytes())
        assert tuple(out[0, 0]) == (2, 2, 2)

    def test_32bit_alpha_dropped(self):
        px = bytes([10, 20, 30, 99])  # BGRA
        out = decode_tga(_hdr(2, 1, 1, 32, desc=0x20) + px)
        assert tuple(out[0, 0]) == (30, 20, 10)

    def test_palette_index_out_of_range_typed(self):
        pal = bytes(3 * 4)
        blob = (_hdr(1, 1, 1, 8, desc=0x20, cmap=(1, 0, 4, 24))
                + pal + bytes([9]))
        with pytest.raises(BadTga):
            decode_tga(blob)

    def test_rejections(self):
        with pytest.raises(BadTga):
            decode_tga(b"short")
        with pytest.raises(UnsupportedTga):
            decode_tga(_hdr(4, 1, 1, 24) + b"\x00" * 3)
        with pytest.raises(BadTga):
            decode_tga(_hdr(2, 4, 4, 24))  # truncated pixels
