"""Typed-failure fuzz contract for every binary decoder.

A 100-TB corpus feeds these decoders untrusted bytes; the contract is
that ANY garbage fails with the decoder's typed error (so the media
stages' ``errors='skip'`` policy can catch it) — never a bare
``struct.error`` / ``IndexError`` / numpy shape error, and never a
hang or an implausible multi-gigabyte allocation (the GIF
logical-screen cap exists because this fuzz found exactly that)."""

import random

import pytest

from ragflow_ray.parsers import (avidec, bmpdec, gifdec, icodec,
                                 jpegdec, pngdec, pnmdec, tgadec,
                                 tiffdec, wavdec)

_CASES = [
    ("bmp", b"BM", bmpdec.decode_bmp, (bmpdec.BadBmp,)),
    ("tiff-le", b"II*\x00", tiffdec.decode_tiff, (tiffdec.BadTiff,)),
    ("tiff-be", b"MM\x00*", tiffdec.decode_tiff, (tiffdec.BadTiff,)),
    ("ico", b"\x00\x00\x01\x00", icodec.decode_ico, (icodec.BadIco,)),
    ("avi", b"RIFF\xff\xff\x00\x00AVI ",
     lambda b: avidec.parse_avi_mjpeg(b), (avidec.BadAvi,)),
    ("gif", b"GIF89a", gifdec.decode_gif, (gifdec.BadGif,)),
    ("png", b"\x89PNG\r\n\x1a\n", pngdec.decode_png,
     (pngdec.BadPng, pngdec.UnsupportedPng)),
    ("wav", b"RIFF\xff\xff\x00\x00WAVE",
     lambda b: wavdec.decode_wav(b),
     (wavdec.BadWav, wavdec.UnsupportedWav)),
    ("jpeg", b"\xff\xd8", jpegdec.decode_baseline_jpeg,
     (jpegdec.BadJpeg,)),
    ("pnm", b"P6 ", pnmdec.decode_pnm, (pnmdec.BadPnm,)),
    ("tga", b"\x00\x00\x02", tgadec.decode_tga, (tgadec.BadTga,)),
]


@pytest.mark.parametrize("name,magic,fn,ok", _CASES,
                         ids=[c[0] for c in _CASES])
def test_garbage_after_magic_fails_typed(name, magic, fn, ok):
    rng = random.Random(hash(name) & 0xFFFF)
    for _ in range(150):
        blob = magic + bytes(rng.randrange(256)
                             for _ in range(rng.randrange(0, 300)))
        try:
            fn(blob)   # a lucky decode of tiny garbage is acceptable
        except ok:
            pass       # the contract: typed errors only


@pytest.mark.parametrize("name,magic,fn,ok", _CASES,
                         ids=[c[0] for c in _CASES])
def test_truncations_of_valid_payloads_fail_typed(name, magic, fn, ok):
    """Every prefix-truncation of a REAL payload must fail typed (or
    still decode, for container formats whose tail is optional)."""
    import numpy as np

    img = np.random.default_rng(0).integers(0, 256, (8, 8, 3),
                                            dtype=np.uint8)
    gray = img[:, :, 0].copy()
    samples = (np.arange(64, dtype=np.int16) * 100)
    valid = {
        "bmp": bmpdec.encode_bmp_rgb24(img),
        "tiff-le": tiffdec.encode_tiff_rgb8(img),
        "tiff-be": None,
        "ico": icodec.encode_ico([bmpdec.encode_bmp_rgb24(img)]),
        "avi": avidec.encode_avi_mjpeg(
            [avidec.encode_jpeg_gray_uniform(7)], 16, 16),
        "gif": gifdec.encode_gif_gray(gray),
        "png": pngdec.encode_png_rgb(img),
        "wav": wavdec.encode_wav_pcm16(samples, sample_rate=8000),
        "jpeg": avidec.encode_jpeg_gray_uniform(7),
        "pnm": pnmdec.encode_ppm_rgb8(img),
        "tga": tgadec.encode_tga_rgb24(img),
    }[name]
    if valid is None:
        pytest.skip("no big-endian encoder; the LE case covers it")
    for cut in range(1, len(valid), 7):
        try:
            fn(valid[:cut])
        except ok:
            pass


class TestAllocationBombs:
    """Regressions for the review findings: tiny hostile headers must
    fail typed BEFORE any implausible allocation."""

    def test_bmp_rle_huge_dims_refused(self):
        import struct

        info = struct.pack("<IiiHHIIiiII", 40, 60000, 60000, 1, 8, 1,
                           2, 0, 0, 256, 0)
        blob = (b"BM" + struct.pack("<IHHI", 0, 0, 0, 14 + 40 + 1024)
                + info + b"\x00" * 1024 + bytes([4, 7]))
        with pytest.raises(bmpdec.BadBmp):
            bmpdec.decode_bmp(blob)

    def test_bmp_rle_run_past_row_end_typed(self):
        import struct

        pal = b"\x00" * 1024
        rle = bytes([4, 1, 4, 2, 0, 1])  # two runs past w=2
        info = struct.pack("<IiiHHIIiiII", 40, 2, 1, 1, 8, 1,
                           len(rle), 0, 0, 256, 0)
        off = 14 + 40 + len(pal)
        blob = (b"BM" + struct.pack("<IHHI", off + len(rle), 0, 0, off)
                + info + pal + rle)
        out = bmpdec.decode_bmp(blob)   # clamps, never crashes
        assert out.shape == (1, 2, 3)

    def test_gif_many_frames_bounded(self):
        import numpy as np

        from ragflow_ray.parsers.gifdec import (_gray_image_block,
                                                gif_gray_header)

        # big-but-under-cap screen + many tiny frames
        out = bytearray(b"GIF89a")
        out += bytes([0, 0x20, 0, 0x20, 0x80 | 7, 0, 0])  # 8192x8192
        out += bytes(v for i in range(256) for v in (i, i, i))
        tiny = bytes([0x2C, 0, 0, 0, 0, 1, 0, 1, 0, 0])
        blk = _gray_image_block(np.zeros((1, 1), dtype=np.uint8))
        for _ in range(40):
            out += tiny + blk[10:]
        out.append(0x3B)
        with pytest.raises(gifdec.BadGif):
            gifdec.decode_gif_frames(bytes(out))

    def test_avi_index_entry_at_eof_typed(self):
        from ragflow_ray.parsers.avidec import (encode_avi_mjpeg,
                                                encode_jpeg_gray_uniform)

        blob = bytearray(encode_avi_mjpeg(
            [encode_jpeg_gray_uniform(5)], 16, 16) + b"00dc\x01\x02")
        ix = blob.rfind(b"idx1")
        # point the entry at the trailing 6-byte '00dc' fragment
        blob[ix + 12:ix + 16] = (len(blob) - 6).to_bytes(4, "little")
        try:
            avidec.parse_avi_mjpeg(bytes(blob))
        except avidec.BadAvi:
            pass

    def test_ico_wraps_inner_decoder_errors(self):
        import struct

        import numpy as np

        blob = bytearray(icodec.encode_ico(
            [bmpdec.encode_bmp_rgb24(
                np.zeros((8, 8, 3), dtype=np.uint8))]))
        struct.pack_into("<H", blob, 22 + 12, 9)  # DIB planes := 9
        with pytest.raises(icodec.BadIco):
            icodec.decode_ico(bytes(blob))

    def test_tiff_page_chain_bounded(self):
        import numpy as np

        img = np.zeros((8, 8, 3), dtype=np.uint8)
        blob = tiffdec.encode_tiff_rgb8_pages([img] * 3)
        # 3 normal pages decode; the bound only rejects implausible
        # chains (cycle test lives in test_tiffdec)
        assert len(tiffdec.decode_tiff_pages(blob)) == 3
