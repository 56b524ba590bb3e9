"""AVI/MJPEG container + uniform-gray JPEG encoder tests.

The container layer is exercised with frames from BOTH encoders: the
package's uniform-gray generator (bit-exact decode, the oracle path)
and the general test encoder (tests/jpegenc.py) for realistic frame
content through the same RIFF walk.
"""

import numpy as np
import pytest

from ragflow_ray.parsers.avidec import (BadAvi, decode_avi_gray_means,
                                        encode_avi_mjpeg,
                                        encode_jpeg_gray_uniform,
                                        parse_avi_mjpeg)
from ragflow_ray.parsers.jpegdec import decode_baseline_jpeg


class TestUniformGrayEncoder:
    def test_all_values_roundtrip_exact(self):
        for v in range(0, 256, 7):
            img = decode_baseline_jpeg(encode_jpeg_gray_uniform(v))
            assert img.shape == (16, 16, 3)
            assert (img == v).all()

    def test_boundary_values_exact(self):
        for v in (0, 1, 127, 128, 129, 254, 255):
            img = decode_baseline_jpeg(encode_jpeg_gray_uniform(v))
            assert (img == v).all()

    def test_non_square_dims(self):
        img = decode_baseline_jpeg(encode_jpeg_gray_uniform(99, 24, 8))
        assert img.shape == (8, 24, 3)
        assert (img == 99).all()

    def test_rejects_non_multiple_of_8(self):
        with pytest.raises(ValueError):
            encode_jpeg_gray_uniform(10, 12, 8)

    def test_rejects_out_of_range(self):
        with pytest.raises(ValueError):
            encode_jpeg_gray_uniform(256)


class TestAviContainer:
    def _blob(self, vals=(7, 250, 128, 0, 255, 33), fps=10):
        frames = [encode_jpeg_gray_uniform(v) for v in vals]
        return frames, encode_avi_mjpeg(frames, 16, 16, fps=fps)

    def test_roundtrip_meta_and_frames(self):
        frames, blob = self._blob()
        meta, got = parse_avi_mjpeg(blob)
        assert meta == {"us_per_frame": 100_000, "n_frames": 6,
                        "width": 16, "height": 16}
        assert got == frames

    def test_strided_decode_means(self):
        _, blob = self._blob()
        out = decode_avi_gray_means(blob, stride=2)
        assert out["frame_means"] == [7, 128, 255]
        assert out["n_frames"] == 6

    def test_damaged_index_falls_back_to_sequential(self):
        frames, blob = self._blob()
        b = bytearray(blob)
        ix = b.rfind(b"idx1")
        b[ix + 12:ix + 16] = (999_999).to_bytes(4, "little")
        _, got = parse_avi_mjpeg(bytes(b))
        assert got == frames

    def test_absolute_offset_index_accepted(self):
        """Some writers store absolute file offsets in idx1; the
        parser accepts either convention."""
        frames, blob = self._blob(vals=(1, 2))
        b = bytearray(blob)
        ix = b.rfind(b"idx1")
        movi = b.find(b"movi")
        n_entries = int.from_bytes(b[ix + 4:ix + 8], "little") // 16
        for e in range(n_entries):
            off_pos = ix + 8 + 16 * e + 8
            rel = int.from_bytes(b[off_pos:off_pos + 4], "little")
            # absolute chunk-header offset = movi fourcc pos + rel
            b[off_pos:off_pos + 4] = (movi + rel).to_bytes(4, "little")
        _, got = parse_avi_mjpeg(bytes(b))
        assert got == frames

    def test_rejects_non_avi(self):
        with pytest.raises(BadAvi):
            parse_avi_mjpeg(b"RIFF\x04\x00\x00\x00WAVE")
        with pytest.raises(BadAvi):
            parse_avi_mjpeg(b"not riff at all")

    def test_truncated_container_raises(self):
        _, blob = self._blob()
        with pytest.raises((BadAvi, Exception)):
            parse_avi_mjpeg(blob[:60])

    def test_general_encoder_frames_through_container(self):
        import sys, os
        sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
        from jpegenc import encode_jpeg

        rng = np.random.default_rng(0)
        imgs = [rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
                for _ in range(3)]
        blob = encode_avi_mjpeg([encode_jpeg(im) for im in imgs], 16, 16)
        _, frames = parse_avi_mjpeg(blob)
        for im, f in zip(imgs, frames):
            dec = decode_baseline_jpeg(f).astype(int)
            assert np.abs(dec - im.astype(int)).max() <= 12

    def test_pinned_container_bytes(self):
        """Deterministic output — a changed writer layout must be a
        conscious decision (the jpegdec pinned-checksum idiom)."""
        import hashlib

        _, blob = self._blob()
        assert hashlib.md5(blob).hexdigest() == (
            _PINNED_MD5), hashlib.md5(blob).hexdigest()


_PINNED_MD5 = "39852312ef24b08c31186d50cbe82a1b"
