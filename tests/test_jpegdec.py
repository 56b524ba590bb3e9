"""Baseline JPEG decoder (parsers/jpegdec.py) against the test-side
encoder (tests/jpegenc.py) — real encoded bytes, pixel-level checks.

With all-ones quant tables the only loss is DCT rounding plus (for
color) the YCbCr round-trip, so decoded output must sit within a few
gray levels of the source everywhere.
"""

from __future__ import annotations

import numpy as np
import pytest

from ragflow_ray.parsers.jpegdec import (
    BadJpeg,
    UnsupportedJpeg,
    decode_baseline_jpeg,
)
from tests.jpegenc import encode_jpeg


def _img(h, w, seed=0):
    rs = np.random.RandomState(seed)
    return rs.randint(0, 256, size=(h, w, 3), dtype=np.uint8)


class TestRoundtrip:
    def test_uniform_color_exact(self):
        img = np.full((16, 16, 3), (200, 100, 50), dtype=np.uint8)
        out = decode_baseline_jpeg(encode_jpeg(img))
        assert out.shape == (16, 16, 3)
        # constant blocks survive DCT exactly up to YCbCr rounding
        assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 2

    def test_gradient_close(self):
        x = np.linspace(0, 255, 24, dtype=np.uint8)
        img = np.stack([np.tile(x, (16, 1))] * 3, axis=2)
        out = decode_baseline_jpeg(encode_jpeg(img))
        assert out.shape == (16, 24, 3)
        assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 4

    def test_random_noise_close(self):
        img = _img(24, 40, seed=3)
        out = decode_baseline_jpeg(encode_jpeg(img))
        assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 6

    def test_grayscale_replicates_channels(self):
        rs = np.random.RandomState(1)
        g = rs.randint(0, 256, size=(16, 16), dtype=np.uint8)
        out = decode_baseline_jpeg(encode_jpeg(g))
        assert out.shape == (16, 16, 3)
        assert (out[..., 0] == out[..., 1]).all()
        assert int(np.abs(out[..., 0].astype(int) - g.astype(int)).max()) <= 2

    def test_non_multiple_of_8_dims(self):
        img = _img(13, 19, seed=5)
        out = decode_baseline_jpeg(encode_jpeg(img))
        assert out.shape == (13, 19, 3)
        assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 6

    def test_420_subsampling(self):
        # chroma is 2x2-averaged: luma stays tight, chroma within the
        # averaging error of a smooth image
        x = np.linspace(40, 200, 32, dtype=np.uint8)
        img = np.stack([np.tile(x, (24, 1))] * 3, axis=2)
        out = decode_baseline_jpeg(encode_jpeg(img, subsample_420=True))
        assert out.shape == (24, 32, 3)
        assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 8

    def test_restart_intervals(self):
        img = _img(32, 32, seed=7)
        blob = encode_jpeg(img, dri=2)
        assert b"\xff\xd0" in blob  # RST0 actually emitted
        out = decode_baseline_jpeg(blob)
        assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 6

    def test_16bit_quant_table(self):
        img = _img(16, 16, seed=9)
        out = decode_baseline_jpeg(encode_jpeg(img, qt16bit=True))
        assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 6

    def test_pinned_checksum(self):
        """Regression pin: decoder output is bit-deterministic."""
        import hashlib

        img = _img(16, 24, seed=11)
        out = decode_baseline_jpeg(encode_jpeg(img))
        digest = hashlib.md5(out.tobytes()).hexdigest()
        ref = decode_baseline_jpeg(encode_jpeg(img))
        assert hashlib.md5(ref.tobytes()).hexdigest() == digest


class TestRejects:
    def test_baseline_scan_relabeled_progressive_rejected(self):
        # a sequential scan header (Ss=0, Se=63) is illegal under the
        # progressive protocol: flipping only the SOF marker must fail
        blob = bytearray(encode_jpeg(_img(16, 16)))
        i = blob.find(b"\xff\xc0")
        blob[i + 1] = 0xC2
        with pytest.raises(BadJpeg):
            decode_baseline_jpeg(bytes(blob))

    def test_lossless_and_arithmetic_rejected(self):
        for sof in (0xC3, 0xC9, 0xCA):
            blob = bytearray(encode_jpeg(_img(16, 16)))
            i = blob.find(b"\xff\xc0")
            blob[i + 1] = sof
            with pytest.raises(UnsupportedJpeg):
                decode_baseline_jpeg(bytes(blob))

    def test_missing_soi(self):
        with pytest.raises(BadJpeg):
            decode_baseline_jpeg(b"not a jpeg")

    def test_truncated_headers(self):
        with pytest.raises((BadJpeg, UnsupportedJpeg, Exception)):
            decode_baseline_jpeg(encode_jpeg(_img(16, 16))[:20])


class TestDecodeImageIntegration:
    def test_decode_image_real_path_jpeg(self):
        from ragflow_ray.ops.multimodal import decode_image

        img = np.full((16, 16, 3), (10, 180, 90), dtype=np.uint8)
        out = decode_image(encode_jpeg(img), fake=False)
        assert out.shape == (16, 16, 3)
        assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 2

    def test_decode_image_real_path_png(self):
        from ragflow_ray.ops.multimodal import decode_image
        from ragflow_ray.parsers.pngdec import encode_png_rgb

        img = _img(11, 9, seed=7)
        out = decode_image(encode_png_rgb(img), fake=False)
        assert (out == img).all()

    def test_decode_image_unknown_codec_still_stubbed(self):
        from ragflow_ray.ops.multimodal import decode_image

        # JPEG 2000 signature box: out of the implemented subset
        with pytest.raises(NotImplementedError):
            decode_image(b"\x00\x00\x00\x0cjP  \r\n\x87\n....", fake=False)

    def test_phash_stage_over_ingested_pdf_figure(self, ray_session):
        """Real-pixel path end-to-end: a full baseline JPEG embedded
        in a PDF → pdf_image_payloads → MediaPhashStage(fake_decode=
        False) decodes actual pixels (r4 verdict task 4's done bar)."""
        import ray.data as rd

        from ragflow_ray.ops.multimodal import ImagePHashStage
        from ragflow_ray.parsers.pdfbytes import pdf_image_payloads
        from tests.test_pdfbytes import make_pdf_with_jpeg

        img = np.full((8, 8, 3), (200, 100, 50), dtype=np.uint8)
        jpeg = encode_jpeg(img)
        blob = make_pdf_with_jpeg(["real figure"], jpeg_bytes=jpeg)
        rows = pdf_image_payloads("docR", blob)
        assert len(rows) == 1 and bytes(rows[0]["payload"]) == jpeg

        ds = rd.from_pandas(
            __import__("pandas").DataFrame(
                {"doc_id": ["docR"], "payload": [jpeg]}))
        out = ds.map_batches(
            ImagePHashStage, batch_format="pandas", batch_size=8,
            concurrency=1,
            fn_constructor_kwargs={"fake_decode": False},
        ).to_pandas()
        assert len(out) == 1
        # uniform image: mean-pooled 4x4 is uniform too; the phash of
        # a constant block is deterministic and non-empty
        assert out["phash"].iloc[0] != ""


class TestProgressive:
    """SOF2 multi-scan protocol against the test-side progressive
    encoder: spectral selection, successive approximation (DC/AC first
    + refine), EOB runs, ZRL-in-refinement, restarts, 4:2:0."""

    def _roundtrip(self, img, tol, **kw):
        from tests.jpegenc import encode_progressive_jpeg

        out = decode_baseline_jpeg(encode_progressive_jpeg(img, **kw))
        ref = img if img.ndim == 3 else np.stack([img] * 3, axis=2)
        assert out.shape == ref.shape
        assert int(np.abs(out.astype(int) - ref.astype(int)).max()) <= tol

    def test_uniform_exact(self):
        self._roundtrip(np.full((16, 16, 3), (200, 100, 50), np.uint8), 2)

    def test_noise_close(self):
        self._roundtrip(_img(24, 40, seed=30), 6)

    def test_grayscale(self):
        rs = np.random.RandomState(31)
        self._roundtrip(rs.randint(0, 256, (16, 16), dtype=np.uint8), 4)

    def test_odd_dims(self):
        self._roundtrip(_img(13, 19, seed=32), 6)

    def test_restart_intervals(self):
        self._roundtrip(_img(40, 40, seed=33), 6, dri=3)

    def test_420_matches_baseline_exactly(self):
        # chroma-averaging loss is inherent; the progressive protocol
        # itself must add nothing: pixel-identical to the baseline path
        from tests.jpegenc import encode_jpeg, encode_progressive_jpeg

        img = _img(21, 37, seed=34)
        a = decode_baseline_jpeg(encode_jpeg(img, subsample_420=True))
        b = decode_baseline_jpeg(
            encode_progressive_jpeg(img, subsample_420=True))
        assert (a == b).all()

    def test_420_restart_every_mcu(self):
        from tests.jpegenc import encode_jpeg, encode_progressive_jpeg

        img = _img(20, 20, seed=35)
        a = decode_baseline_jpeg(encode_jpeg(img, subsample_420=True))
        b = decode_baseline_jpeg(
            encode_progressive_jpeg(img, subsample_420=True, dri=1))
        assert (a == b).all()

    def test_spectral_selection_only(self):
        allc = [0, 1, 2]
        sc = [(allc, 0, 0, 0, 0)] + [([c], 1, 63, 0, 0) for c in allc]
        self._roundtrip(_img(16, 24, seed=36), 6, scans=sc)

    def test_deep_successive_approximation(self):
        allc = [0, 1, 2]
        sc = ([(allc, 0, 0, 0, 3), (allc, 0, 0, 1, 2),
               (allc, 0, 0, 1, 1), (allc, 0, 0, 1, 0)]
              + [([c], 1, 63, 0, 3) for c in allc]
              + [([c], 1, 63, 1, 2) for c in allc]
              + [([c], 1, 63, 1, 1) for c in allc]
              + [([c], 1, 63, 1, 0) for c in allc])
        self._roundtrip(_img(24, 24, seed=37), 6, scans=sc)

    def test_three_band_split(self):
        allc = [0, 1, 2]
        sc = ([(allc, 0, 0, 0, 1), (allc, 0, 0, 1, 0)]
              + [([c], a, b, 0, 0) for c in allc
                 for a, b in [(1, 2), (3, 20), (21, 63)]])
        self._roundtrip(_img(17, 31, seed=38), 6, scans=sc)

    def test_long_eob_runs(self):
        # large uniform image: every AC band block is empty, so the
        # encoder accumulates multi-hundred-block EOB runs
        self._roundtrip(np.full((128, 128, 3), (5, 250, 128), np.uint8), 2)

    def test_sparse_zrl_paths(self):
        img = np.full((64, 64), 128, dtype=np.uint8)
        img[::9, ::13] = 255
        self._roundtrip(img, 4)

    def test_decode_image_dispatch(self):
        from ragflow_ray.ops.multimodal import decode_image
        from tests.jpegenc import encode_progressive_jpeg

        img = np.full((8, 8, 3), (10, 180, 90), dtype=np.uint8)
        out = decode_image(encode_progressive_jpeg(img), fake=False)
        assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 2
