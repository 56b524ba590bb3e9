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


class TestAnimation:
    """Full frame walk: disposal methods, delays, loop count."""

    def _anim(self, vals=(5, 100, 200), delays=(10, 20, 30)):
        import numpy as np

        from ragflow_ray.parsers.gifdec import encode_gif_gray_animation

        frames = [np.full((4, 4), v, dtype=np.uint8) for v in vals]
        return encode_gif_gray_animation(frames, list(delays))

    def test_all_frames_and_delays(self):
        from ragflow_ray.parsers.gifdec import decode_gif_frames

        meta, frames = decode_gif_frames(self._anim())
        assert meta["n_frames"] == 3
        assert meta["delay_total_cs"] == 60
        assert [int(f[0, 0, 0]) for f in frames] == [5, 100, 200]

    def test_decode_gif_still_returns_first_frame(self):
        from ragflow_ray.parsers.gifdec import decode_gif

        assert int(decode_gif(self._anim())[0, 0, 0]) == 5

    def test_max_frames_stops_early(self):
        from ragflow_ray.parsers.gifdec import decode_gif_frames

        meta, frames = decode_gif_frames(self._anim(), max_frames=2)
        assert meta["n_frames"] == 2

    def test_disposal_2_restores_background(self):
        """A small patch with disposal 2 shows in its own frame but
        the next frame sees white underneath."""
        import numpy as np

        from ragflow_ray.parsers.gifdec import (_gray_image_block,
                                                decode_gif_frames)

        out = bytearray(b"GIF89a")
        out += bytes([4, 0, 4, 0, 0x80 | 7, 0, 0])
        out += bytes(v for i in range(256) for v in (i, i, i))
        # frame 1: 2x2 patch at (1,1), value 9, disposal 2
        out += bytes([0x21, 0xF9, 4, 2 << 2, 0, 0, 0, 0])
        patch = bytes([0x2C, 1, 0, 1, 0, 2, 0, 2, 0, 0])
        blk = _gray_image_block(np.full((2, 2), 9, dtype=np.uint8))
        out += patch + blk[10:]  # reuse the LZW body, custom descriptor
        # frame 2: transparent 1x1 at (0,0) (reveals the canvas state)
        out += bytes([0x21, 0xF9, 4, 1, 0, 0, 7, 0])  # transp idx 7
        tiny = bytes([0x2C, 0, 0, 0, 0, 1, 0, 1, 0, 0])
        blk2 = _gray_image_block(np.full((1, 1), 7, dtype=np.uint8))
        out += tiny + blk2[10:]
        out.append(0x3B)
        _, frames = decode_gif_frames(bytes(out))
        assert int(frames[0][1, 1, 0]) == 9      # patch visible
        assert int(frames[1][1, 1, 0]) == 255    # disposal 2 cleared
        assert int(frames[1][0, 0, 0]) == 255    # transparent = canvas

    def test_disposal_3_restores_previous(self):
        import numpy as np

        from ragflow_ray.parsers.gifdec import (_gray_image_block,
                                                decode_gif_frames)

        out = bytearray(b"GIF89a")
        out += bytes([2, 0, 2, 0, 0x80 | 7, 0, 0])
        out += bytes(v for i in range(256) for v in (i, i, i))
        full = bytes([0x2C, 0, 0, 0, 0, 2, 0, 2, 0, 0])
        # frame 1: full canvas value 50 (disposal 0 - persists)
        out += full + _gray_image_block(
            np.full((2, 2), 50, dtype=np.uint8))[10:]
        # frame 2: full canvas value 99, disposal 3 (restore previous)
        out += bytes([0x21, 0xF9, 4, 3 << 2, 0, 0, 0, 0])
        out += full + _gray_image_block(
            np.full((2, 2), 99, dtype=np.uint8))[10:]
        # frame 3: transparent full canvas -> shows restored 50
        out += bytes([0x21, 0xF9, 4, 1, 0, 0, 7, 0])
        out += full + _gray_image_block(
            np.full((2, 2), 7, dtype=np.uint8))[10:]
        out.append(0x3B)
        _, frames = decode_gif_frames(bytes(out))
        assert int(frames[1][0, 0, 0]) == 99
        assert int(frames[2][0, 0, 0]) == 50

    def test_netscape_loop_count(self):
        from ragflow_ray.parsers.gifdec import decode_gif_frames

        blob = bytearray(self._anim())
        ext = (bytes([0x21, 0xFF, 11]) + b"NETSCAPE2.0"
               + bytes([3, 1, 7, 0, 0]))
        pos = 13 + 768  # after header + screen descriptor + GCT
        blob[pos:pos] = ext
        meta, _ = decode_gif_frames(bytes(blob))
        assert meta["loop_count"] == 7
