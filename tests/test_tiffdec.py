"""Baseline TIFF decoder tests — hand-built IFDs per feature.

Big-endian SHORT tag values are LEFT-justified in the 4-byte value
field; the builders here encode that explicitly (it is the subtle
part of the container)."""

import struct

import numpy as np
import pytest

from ragflow_ray.parsers.tiffdec import (BadTiff, UnsupportedTiff,
                                         _unpackbits, decode_tiff,
                                         encode_tiff_rgb8)


def _be_gray(img, photo=1, comp=1, rps=None):
    h, w = img.shape
    rps = rps or h
    strips, r = [], 0
    while r < h:
        strips.append(img[r:r + rps].tobytes())
        r += rps
    if comp == 32773:
        enc = []
        for s in strips:
            out = bytearray()
            for i in range(0, len(s), 128):
                chunk = s[i:i + 128]
                out.append(len(chunk) - 1)
                out += chunk
            enc.append(bytes(out))
        strips = enc
    pix = b"".join(strips)
    offs, pos = [], 8
    for s in strips:
        offs.append(pos)
        pos += len(s)
    ifd_off = pos

    def sval(v):
        return struct.pack(">HH", v, 0)

    def lval(v):
        return struct.pack(">I", v)

    ents = [(256, 4, 1, lval(w)), (257, 4, 1, lval(h)),
            (258, 3, 1, sval(8)), (259, 3, 1, sval(comp)),
            (262, 3, 1, sval(photo)), (277, 3, 1, sval(1)),
            (278, 4, 1, lval(rps))]
    extra = b""
    if len(strips) == 1:
        ents += [(273, 4, 1, lval(offs[0])),
                 (279, 4, 1, lval(len(strips[0])))]
    else:
        so = ifd_off + 2 + 12 * (len(ents) + 2) + 4
        sc = so + 4 * len(strips)
        ents += [(273, 4, len(strips), lval(so)),
                 (279, 4, len(strips), lval(sc))]
        extra = (b"".join(struct.pack(">I", o) for o in offs)
                 + b"".join(struct.pack(">I", len(s)) for s in strips))
    ents.sort()
    out = bytearray(b"MM\x00*" + struct.pack(">I", ifd_off)) + pix
    out += struct.pack(">H", len(ents))
    for tag, typ, cnt, val in ents:
        out += struct.pack(">HHI", tag, typ, cnt) + val
    out += struct.pack(">I", 0) + extra
    return bytes(out)


class TestRgbRoundtrip:
    def test_roundtrip(self):
        rng = np.random.default_rng(3)
        for w, h in ((8, 8), (5, 3), (1, 1)):
            img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            assert (decode_tiff(encode_tiff_rgb8(img)) == img).all()

    def test_pinned_bytes(self):
        import hashlib

        img = np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3)
        got = hashlib.md5(encode_tiff_rgb8(img)).hexdigest()
        assert got == "ee3fc6f997a91adbe9c79de3aad5c747", got


class TestPackBits:
    def test_literal_and_repeat(self):
        assert (_unpackbits(bytes([2, 1, 2, 3, 0xFE, 9]), 6)
                == bytes([1, 2, 3, 9, 9, 9]))

    def test_noop_128_skipped(self):
        assert _unpackbits(bytes([128, 0, 7]), 1) == bytes([7])

    def test_short_strip_raises(self):
        with pytest.raises(BadTiff):
            _unpackbits(bytes([1, 5]), 4)


class TestGrayBigEndian:
    def test_single_strip(self):
        g = np.random.default_rng(4).integers(
            0, 256, (6, 5), dtype=np.uint8)
        out = decode_tiff(_be_gray(g))
        assert (out[:, :, 0] == g).all() and (out[:, :, 2] == g).all()

    def test_multi_strip_packbits(self):
        g = np.random.default_rng(5).integers(
            0, 256, (6, 5), dtype=np.uint8)
        out = decode_tiff(_be_gray(g, comp=32773, rps=2))
        assert (out[:, :, 0] == g).all()

    def test_white_is_zero_inverts(self):
        g = np.random.default_rng(6).integers(
            0, 256, (2, 3), dtype=np.uint8)
        out = decode_tiff(_be_gray(g, photo=0))
        assert (out[:, :, 0] == 255 - g).all()


class TestPalette:
    def test_4bit_16bit_colormap(self):
        w, h = 3, 1
        pix = bytes([0x12, 0x30])
        cmap = [((i * 16 + ch) << 8) for ch in range(3)
                for i in range(16)]
        cm = b"".join(struct.pack("<H", v) for v in cmap)
        cm_off = 8 + len(pix)
        ifd_off = cm_off + len(cm)
        ents = [(256, 4, 1, struct.pack("<I", w)),
                (257, 4, 1, struct.pack("<I", h)),
                (258, 3, 1, struct.pack("<HH", 4, 0)),
                (259, 3, 1, struct.pack("<HH", 1, 0)),
                (262, 3, 1, struct.pack("<HH", 3, 0)),
                (273, 4, 1, struct.pack("<I", 8)),
                (277, 3, 1, struct.pack("<HH", 1, 0)),
                (278, 4, 1, struct.pack("<I", h)),
                (279, 4, 1, struct.pack("<I", len(pix))),
                (320, 3, 48, struct.pack("<I", cm_off))]
        out = bytearray(b"II*\x00" + struct.pack("<I", ifd_off))
        out += pix + cm + struct.pack("<H", len(ents))
        for tag, typ, cnt, val in ents:
            out += struct.pack("<HHI", tag, typ, cnt) + val
        out += struct.pack("<I", 0)
        dec = decode_tiff(bytes(out))
        assert tuple(dec[0, 0]) == (16, 17, 18)
        assert tuple(dec[0, 2]) == (48, 49, 50)


class TestRejections:
    def test_bad_magic(self):
        with pytest.raises(BadTiff):
            decode_tiff(b"PK\x03\x04....")

    def test_jpeg_compression_unsupported(self):
        g = np.zeros((2, 2), dtype=np.uint8)
        blob = _be_gray(g).replace(
            struct.pack(">HHI", 259, 3, 1) + struct.pack(">HH", 1, 0),
            struct.pack(">HHI", 259, 3, 1) + struct.pack(">HH", 6, 0))
        with pytest.raises(UnsupportedTiff):
            decode_tiff(blob)

    def test_truncated_strip(self):
        g = np.zeros((4, 4), dtype=np.uint8)
        with pytest.raises(BadTiff):
            decode_tiff(_be_gray(g)[:20])


def _lzw_encode(data: bytes) -> bytes:
    """TIFF-variant LZW encoder (test-side): MSB-first packing,
    early code-width change at next_code == 2^width - 1, table reset
    at 4094 — the handshake the decoder must match exactly."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    acc = nbits = 0

    def put(code, width):
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)
            acc &= (1 << nbits) - 1

    def fresh():
        return {bytes([i]): i for i in range(256)}

    table = fresh()
    next_code, width = 258, 9
    put(CLEAR, width)
    cur = b""
    for byte in data:
        cand = cur + bytes([byte])
        if cand in table:
            cur = cand
            continue
        put(table[cur], width)
        table[cand] = next_code
        next_code += 1
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
        if next_code >= 4094:
            put(CLEAR, width)
            table = fresh()
            next_code, width = 258, 9
        cur = bytes([byte])
    if cur:
        put(table[cur], width)
    put(EOI, width)
    if nbits:
        put(0, 8 - nbits)
    return bytes(out)


def _le_tiff(w, h, pix, comp=1, predictor=1, photo=2, spp=3):
    def sv(v):
        return struct.pack("<HH", v, 0)

    def lv(v):
        return struct.pack("<I", v)

    bps_off = 8 + len(pix)
    ifd_off = bps_off + 6
    ents = [(256, 4, 1, lv(w)), (257, 4, 1, lv(h)),
            (258, 3, 3, lv(bps_off)), (259, 3, 1, sv(comp)),
            (262, 3, 1, sv(photo)), (273, 4, 1, lv(8)),
            (277, 3, 1, sv(spp)), (278, 4, 1, lv(h)),
            (279, 4, 1, lv(len(pix)))]
    if predictor != 1:
        ents.append((317, 3, 1, sv(predictor)))
    ents.sort()
    out = bytearray(b"II*\x00" + struct.pack("<I", ifd_off)) + pix
    out += struct.pack("<HHH", 8, 8, 8)
    out += struct.pack("<H", len(ents))
    for tag, typ, cnt, val in ents:
        out += struct.pack("<HHI", tag, typ, cnt) + val
    out += struct.pack("<I", 0)
    return bytes(out)


class TestLzw:
    def test_roundtrip_crosses_width_boundaries(self):
        # enough distinct bigrams to push the table past 511 and 1023
        rng = np.random.default_rng(7)
        h, w = 40, 40
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        pix = _lzw_encode(img.tobytes())
        out = decode_tiff(_le_tiff(w, h, pix, comp=5))
        assert (out == img).all()

    def test_repetitive_data_compresses_and_roundtrips(self):
        img = np.tile(np.arange(8, dtype=np.uint8), (16, 6)).reshape(
            16, 16, 3)
        raw = img.tobytes()
        pix = _lzw_encode(raw)
        assert len(pix) < len(raw)
        out = decode_tiff(_le_tiff(16, 16, pix, comp=5))
        assert (out == img).all()

    def test_lzw_with_horizontal_predictor(self):
        rng = np.random.default_rng(8)
        img = rng.integers(0, 256, (5, 7, 3), dtype=np.uint8)
        diff = img.astype(np.int64).copy()
        diff[:, 1:] = (img[:, 1:].astype(np.int64)
                       - img[:, :-1].astype(np.int64)) % 256
        pix = _lzw_encode(diff.astype(np.uint8).tobytes())
        out = decode_tiff(_le_tiff(7, 5, pix, comp=5, predictor=2))
        assert (out == img).all()

    def test_predictor_on_uncompressed_gray(self):
        g = np.array([[10, 5, 250, 3]], dtype=np.uint8)
        # stored differences; cumsum mod 256 must recover the row
        diff = np.array([[10, 251, 245, 9]], dtype=np.uint8)
        out = decode_tiff(_le_tiff(4, 1, diff.tobytes(), comp=1,
                                   predictor=2, photo=1, spp=1))
        assert (out[0, :, 0] == g[0]).all()

    def test_truncated_lzw_raises(self):
        img = np.zeros((4, 4, 3), dtype=np.uint8)
        pix = _lzw_encode(img.tobytes())
        with pytest.raises(BadTiff):
            decode_tiff(_le_tiff(4, 4, pix[: len(pix) // 2], comp=5))


class TestMultiPage:
    def test_ifd_chain_roundtrip(self):
        from ragflow_ray.parsers.tiffdec import (decode_tiff,
                                                 decode_tiff_pages,
                                                 encode_tiff_rgb8_pages)

        rng = np.random.default_rng(5)
        imgs = [rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
                for h, w in ((8, 8), (4, 6), (3, 3))]
        blob = encode_tiff_rgb8_pages(imgs)
        pages = decode_tiff_pages(blob)
        assert len(pages) == 3
        for a, b in zip(imgs, pages):
            assert (a == b).all()
        # first-IFD contract unchanged, early stop honored
        assert (decode_tiff(blob) == imgs[0]).all()
        assert len(decode_tiff_pages(blob, max_pages=2)) == 2

    def test_cyclic_chain_terminates(self):
        from ragflow_ray.parsers.tiffdec import (decode_tiff_pages,
                                                 encode_tiff_rgb8_pages)

        img = np.zeros((2, 2, 3), dtype=np.uint8)
        blob = bytearray(encode_tiff_rgb8_pages([img, img]))
        # point page 2's next-IFD back at page 1's IFD
        (first,) = struct.unpack("<I", blob[4:8])
        second = first + 2 + 12 * 9 + 4 + len(img.tobytes()) + 6
        patch = second + 2 + 12 * 9
        struct.pack_into("<I", blob, patch, first)
        # the patch must have landed on page 2's (formerly 0) pointer
        assert struct.unpack("<I", blob[patch:patch + 4]) == (first,)
        assert struct.unpack("<H", blob[second:second + 2]) == (9,)
        pages = decode_tiff_pages(bytes(blob))
        assert len(pages) == 2  # the cycle stops the walk
