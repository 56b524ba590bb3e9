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
                                 jpegdec, pngdec, pnmdec, tiffdec,
                                 wavdec)

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
    }[name]
    if valid is None:
        pytest.skip("no big-endian encoder; the LE case covers it")
    for cut in range(1, len(valid), 7):
        try:
            fn(valid[:cut])
        except ok:
            pass
