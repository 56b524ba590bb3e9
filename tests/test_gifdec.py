"""GIF decoder (parsers/gifdec.py) against the test-side encoder
(tests/gifenc.py) — real encoded bytes, pixel-exact checks (GIF is
lossless) — plus a widely-published in-the-wild file as a known
answer the encoder had no hand in."""

from __future__ import annotations

import base64

import numpy as np
import pytest

from ragflow_ray.parsers.gifdec import BadGif, decode_gif
from tests.gifenc import encode_gif

# the classic 1x1 transparent-pixel GIF served by web beacons for
# decades — bytes long published verbatim across the public web
_PIXEL_GIF = base64.b64decode(
    "R0lGODlhAQABAIAAAAAAAP///yH5BAEAAAAALAAAAAABAAEAAAIBRAA7")


def _pal(n, seed=0):
    rs = np.random.RandomState(seed)
    return rs.randint(0, 256, size=(n, 3), dtype=np.uint8)


def _idx(h, w, n, seed=0):
    rs = np.random.RandomState(seed)
    return rs.randint(0, n, size=(h, w), dtype=np.uint8)


class TestKnownAnswer:
    def test_web_beacon_pixel(self):
        out = decode_gif(_PIXEL_GIF)
        assert out.shape == (1, 1, 3)
        # palette[0] is black but flagged transparent → white
        assert (out == 255).all()


class TestRoundtrip:
    def test_basic_exact(self):
        pal, idx = _pal(8, 1), _idx(13, 17, 8, 2)
        out = decode_gif(encode_gif(idx, pal))
        assert (out == pal[idx]).all()

    def test_two_color(self):
        pal = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
        idx = (np.arange(25).reshape(5, 5) % 2).astype(np.uint8)
        out = decode_gif(encode_gif(idx, pal))
        assert (out == pal[idx]).all()

    def test_256_colors_dict_growth(self):
        # large noisy frame: LZW dictionary grows through several
        # width bumps (9 → 12 bits)
        pal, idx = _pal(256, 3), _idx(64, 64, 256, 4)
        out = decode_gif(encode_gif(idx, pal))
        assert (out == pal[idx]).all()

    def test_dictionary_overflow_clear(self):
        # enough distinct phrases to hit 4096 entries and force the
        # encoder's mid-stream clear + width reset
        rs = np.random.RandomState(5)
        pal = _pal(256, 6)
        idx = rs.randint(0, 256, size=(120, 120), dtype=np.uint8)
        out = decode_gif(encode_gif(idx, pal))
        assert (out == pal[idx]).all()

    def test_interlaced(self):
        pal, idx = _pal(16, 7), _idx(23, 9, 16, 8)
        out = decode_gif(encode_gif(idx, pal, interlace=True))
        assert (out == pal[idx]).all()

    def test_interlaced_few_rows(self):
        # fewer rows than one full interlace cycle
        pal, idx = _pal(4, 9), _idx(3, 11, 4, 10)
        out = decode_gif(encode_gif(idx, pal, interlace=True))
        assert (out == pal[idx]).all()

    def test_local_color_table(self):
        pal, idx = _pal(32, 11), _idx(10, 10, 32, 12)
        out = decode_gif(encode_gif(idx, pal, local_palette=True))
        assert (out == pal[idx]).all()

    def test_transparency_composites_white(self):
        pal = np.array([[10, 20, 30], [200, 100, 50]], dtype=np.uint8)
        idx = np.array([[0, 1], [1, 0]], dtype=np.uint8)
        out = decode_gif(encode_gif(idx, pal, transparent=0))
        assert (out[0, 0] == 255).all() and (out[1, 1] == 255).all()
        assert (out[0, 1] == pal[1]).all()

    def test_offset_frame_on_canvas(self):
        pal, idx = _pal(4, 13), _idx(2, 3, 4, 14)
        out = decode_gif(encode_gif(idx, pal, offset=(5, 4),
                                    screen=(10, 8)))
        assert out.shape == (8, 10, 3)
        assert (out[4:6, 5:8] == pal[idx]).all()
        assert (out[0, 0] == 255).all()  # uncovered canvas is white

    def test_first_frame_of_animation(self):
        pal, idx = _pal(8, 15), _idx(6, 6, 8, 16)
        out = decode_gif(encode_gif(idx, pal, extra_frame=True))
        assert (out == pal[idx]).all()

    def test_gif87a(self):
        pal, idx = _pal(8, 17), _idx(5, 5, 8, 18)
        out = decode_gif(encode_gif(idx, pal, version=b"GIF87a"))
        assert (out == pal[idx]).all()

    def test_long_subblock_chain(self):
        # > 255 compressed bytes forces multi-sub-block framing
        pal, idx = _pal(256, 19), _idx(48, 48, 256, 20)
        blob = encode_gif(idx, pal)
        assert (decode_gif(blob) == pal[idx]).all()


class TestErrors:
    def test_bad_signature(self):
        with pytest.raises(BadGif):
            decode_gif(b"JIF89a" + b"\x00" * 32)

    def test_truncated(self):
        blob = encode_gif(_idx(8, 8, 8, 21), _pal(8, 21))
        with pytest.raises(BadGif):
            decode_gif(blob[:20])

    def test_no_image_before_trailer(self):
        blob = bytearray(encode_gif(_idx(4, 4, 4, 22), _pal(4, 22)))
        i = bytes(blob).index(b"\x2c")
        with pytest.raises(BadGif):
            decode_gif(bytes(blob[:i]) + b"\x3b")

    def test_frame_outside_screen(self):
        blob = encode_gif(_idx(4, 4, 4, 23), _pal(4, 23),
                          offset=(3, 0), screen=(5, 4))
        # encoder wrote frame 4 wide at left=3 on a 5-wide screen? the
        # encoder asserts screen >= frame, so force the header smaller
        raw = bytearray(blob)
        raw[6] = 5  # screen width low byte
        with pytest.raises(BadGif):
            decode_gif(bytes(raw))


class TestDecodeImageIntegration:
    def test_decode_image_real_path_gif(self):
        from ragflow_ray.ops.multimodal import decode_image

        pal, idx = _pal(16, 24), _idx(9, 9, 16, 25)
        out = decode_image(encode_gif(idx, pal), fake=False)
        assert (out == pal[idx]).all()
