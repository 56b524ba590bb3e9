"""BMP / DIB decoder tests — hand-built containers per feature."""

import struct

import numpy as np
import pytest

from ragflow_ray.parsers.bmpdec import (BadBmp, UnsupportedBmp,
                                        decode_bmp, encode_bmp_rgb24)

_PAL256 = b"".join(bytes([b, g, r, 0])
                   for r, g, b in [(i, 255 - i, i // 2)
                                   for i in range(256)])


def _bmp(info: bytes, pal: bytes, pix: bytes) -> bytes:
    off = 14 + len(info) + len(pal)
    return (b"BM" + struct.pack("<IHHI", off + len(pix), 0, 0, off)
            + info + pal + pix)


def _info(w, h, bpp, comp=0, size_img=0, clr_used=0):
    return struct.pack("<IiiHHIIiiII", 40, w, h, 1, bpp, comp,
                       size_img, 0, 0, clr_used, 0)


class TestBmp24:
    def test_roundtrip_with_padding(self):
        rng = np.random.default_rng(1)
        for w, h in ((8, 8), (5, 3), (1, 1), (7, 2)):
            img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            assert (decode_bmp(encode_bmp_rgb24(img)) == img).all()

    def test_pinned_bytes(self):
        import hashlib

        img = np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3)
        got = hashlib.md5(encode_bmp_rgb24(img)).hexdigest()
        assert got == "4243066ef9a5ddc124bff68ef40df214", got


class TestPalette:
    def test_8bit(self):
        rows = [bytes([0, 1, 2, 3, 255]) + b"\x00" * 3,
                bytes([10, 20, 30, 40, 50]) + b"\x00" * 3]
        pix = rows[1] + rows[0]  # bottom-up storage
        out = decode_bmp(_bmp(_info(5, 2, 8, clr_used=256), _PAL256, pix))
        assert tuple(out[0, 4]) == (255, 0, 127)
        assert tuple(out[1, 2]) == (30, 225, 15)

    def test_4bit(self):
        # 3 px/row: nibbles (1,2)(3,pad) -> padded row of 4 bytes
        pix = bytes([0x12, 0x30, 0, 0])
        out = decode_bmp(_bmp(_info(3, 1, 4, clr_used=16),
                              _PAL256[:64], pix))
        assert tuple(out[0, 0]) == (1, 254, 0)
        assert tuple(out[0, 2]) == (3, 252, 1)

    def test_1bit(self):
        pal = bytes([0, 0, 0, 0, 255, 255, 255, 0])
        pix = bytes([0b10110000, 0b01000000, 0, 0])
        out = decode_bmp(_bmp(_info(10, 1, 1, clr_used=2), pal, pix))
        white = (255, 255, 255)
        assert tuple(out[0, 0]) == white
        assert tuple(out[0, 1]) == (0, 0, 0)
        assert tuple(out[0, 9]) == white  # bit 1 of the second byte


class TestRle:
    def test_rle8_runs_absolute_delta(self):
        # bottom row: run of 4 x idx7; EOL; top row: absolute [1,2,3]
        # then delta skipping to EOB
        rle = (bytes([4, 7, 0, 0]) + bytes([0, 3, 1, 2, 3, 0])
               + bytes([1, 9, 0, 1]))
        out = decode_bmp(_bmp(_info(4, 2, 8, comp=1, clr_used=256),
                              _PAL256, rle))
        assert tuple(out[1, 0]) == (7, 248, 3)
        assert tuple(out[0, 0]) == (1, 254, 0)
        assert tuple(out[0, 3]) == (9, 246, 4)

    def test_rle4_run_expands_nibble_pair(self):
        # run of 5 with value 0x12 -> 1,2,1,2,1
        rle = bytes([5, 0x12, 0, 1])
        out = decode_bmp(_bmp(_info(5, 1, 4, comp=2, clr_used=16),
                              _PAL256[:64], rle))
        assert [int(out[0, i, 0]) for i in range(5)] == [1, 2, 1, 2, 1]


class TestOther:
    def test_16bit_555(self):
        v = (10 << 10) | (20 << 5) | 31
        pix = struct.pack("<HH", v, 0)
        out = decode_bmp(_bmp(_info(1, 1, 16), b"", pix))
        assert tuple(out[0, 0]) == ((10 << 3) | (10 >> 2),
                                    (20 << 3) | (20 >> 2), 255)

    def test_32bit_top_down(self):
        rng = np.random.default_rng(2)
        img = rng.integers(0, 256, (2, 3, 3), dtype=np.uint8)
        pix = b"".join(bytes([img[y, x, 2], img[y, x, 1],
                              img[y, x, 0], 0])
                       for y in range(2) for x in range(3))
        out = decode_bmp(_bmp(_info(3, -2, 32), b"", pix))
        assert (out == img).all()

    def test_bare_dib_without_file_header(self):
        img = np.full((8, 8, 3), 200, dtype=np.uint8)
        blob = encode_bmp_rgb24(img)
        assert (decode_bmp(blob[14:]) == img).all()

    def test_rejects_bitfields_and_core_header(self):
        with pytest.raises(UnsupportedBmp):
            decode_bmp(_bmp(_info(1, 1, 16, comp=3), b"", b"\x00" * 4))
        core = struct.pack("<IHHHH", 12, 1, 1, 1, 24)
        with pytest.raises(BadBmp):
            decode_bmp(b"BM" + struct.pack("<IHHI", 26, 0, 0, 26)
                       + core + b"\x00" * 4)

    def test_truncated_pixels_raise(self):
        with pytest.raises(BadBmp):
            decode_bmp(_bmp(_info(8, 8, 24), b"", b"\x00" * 10))
