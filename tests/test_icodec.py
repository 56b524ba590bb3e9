"""ICO container codec tests — PNG and legacy-DIB entries."""

import numpy as np
import pytest

from ragflow_ray.parsers.bmpdec import encode_bmp_rgb24
from ragflow_ray.parsers.icodec import BadIco, decode_ico, encode_ico
from ragflow_ray.parsers.pngdec import encode_png_rgb


def _img(seed=9, shape=(8, 8, 3)):
    return np.random.default_rng(seed).integers(
        0, 256, shape, dtype=np.uint8)


class TestIco:
    def test_png_entry_roundtrip(self):
        img = _img()
        assert (decode_ico(encode_ico([encode_png_rgb(img)])) == img).all()

    def test_dib_entry_roundtrip(self):
        img = _img()
        assert (decode_ico(encode_ico([encode_bmp_rgb24(img)])) == img).all()

    def test_largest_entry_selected(self):
        small = _img(1, (4, 4, 3))
        big = _img(2)
        ico = encode_ico([encode_png_rgb(small), encode_bmp_rgb24(big)])
        assert (decode_ico(ico) == big).all()

    def test_and_mask_bit_renders_white(self):
        img = _img()
        ico = bytearray(encode_ico([encode_bmp_rgb24(img)]))
        # layout: dir(6)+entry(16)=22, DIB header 40, XOR 8 rows x 24B;
        # mask byte 20 = bottom-up row 5, x=0 -> image row 2
        ico[22 + 40 + 192 + 20] |= 0x80
        out = decode_ico(bytes(ico))
        assert tuple(out[2, 0]) == (255, 255, 255)
        flat_o = np.delete(out.reshape(64, 3), 16, axis=0)
        flat_i = np.delete(img.reshape(64, 3), 16, axis=0)
        assert (flat_o == flat_i).all()

    def test_missing_mask_treated_opaque(self):
        import struct

        img = _img()
        ico = bytearray(encode_ico([encode_bmp_rgb24(img)]))
        (size,) = struct.unpack("<I", ico[14:18])
        struct.pack_into("<I", ico, 14, size - 32)  # drop the mask
        assert (decode_ico(bytes(ico[: len(ico) - 32])) == img).all()

    def test_rejects_cursor_and_garbage(self):
        with pytest.raises(BadIco):
            decode_ico(b"\x00\x00\x02\x00\x01\x00" + b"\x00" * 16)
        with pytest.raises(BadIco):
            decode_ico(b"nonsense")

    def test_entry_out_of_range_raises(self):
        ico = bytearray(encode_ico([encode_png_rgb(_img())]))
        ico[6 + 12] = 0xFF  # corrupt the entry size (low byte)
        ico[6 + 13] = 0xFF
        with pytest.raises(BadIco):
            decode_ico(bytes(ico))
