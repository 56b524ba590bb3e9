"""Binary Netpbm (P4/P5/P6) codec tests."""

import numpy as np
import pytest

from ragflow_ray.parsers.pnmdec import (BadPnm, UnsupportedPnm,
                                        decode_pnm, encode_ppm_rgb8)


class TestPnm:
    def test_p6_roundtrip(self):
        rng = np.random.default_rng(13)
        for w, h in ((8, 8), (5, 3), (1, 1)):
            img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            assert (decode_pnm(encode_ppm_rgb8(img)) == img).all()

    def test_p5_with_comment(self):
        g = np.random.default_rng(14).integers(
            0, 256, (2, 3), dtype=np.uint8)
        blob = b"P5\n# scanner model X\n3 2\n255\n" + g.tobytes()
        out = decode_pnm(blob)
        assert (out[:, :, 0] == g).all() and (out[:, :, 2] == g).all()

    def test_p5_16bit_big_endian(self):
        g16 = np.array([[0, 65535, 32768]], dtype=np.uint16)
        blob = b"P5 3 1 65535\n" + g16.byteswap().tobytes()
        assert tuple(decode_pnm(blob)[0, :, 0]) == (0, 255, 128)

    def test_small_maxval_scales(self):
        blob = b"P5 2 1 15\n" + bytes([0, 15])
        assert tuple(decode_pnm(blob)[0, :, 0]) == (0, 255)

    def test_p4_packed_bits_one_is_black(self):
        blob = b"P4 10 1\n" + bytes([0b10110000, 0b01000000])
        out = decode_pnm(blob)
        assert tuple(out[0, 0]) == (0, 0, 0)
        assert tuple(out[0, 1]) == (255, 255, 255)
        assert tuple(out[0, 9]) == (0, 0, 0)

    def test_ascii_forms_unsupported(self):
        with pytest.raises(UnsupportedPnm):
            decode_pnm(b"P3 1 1 255\n0 0 0")

    def test_rejections(self):
        for bad in (b"P6 0 1 255\n", b"P6 2 2 255\nxy",
                    b"P6 2 2 0\n", b"nonsense"):
            with pytest.raises(BadPnm):
                decode_pnm(bad)
