"""From-scratch BMP / DIB decoder (Windows BITMAPINFOHEADER family).

The reference ingests legacy Office binaries whose embedded pictures
are frequently device-independent bitmaps (the `.doc` / `.xls` blob
format this repo's ``parsers/olebytes.py`` walks); this module gives
the multimodal stages a real decode path for them, implemented from
the public Windows BMP file-format documentation.

Supported: BITMAPFILEHEADER ('BM') or bare BITMAPINFOHEADER DIBs,
1/4/8-bit palette images, 16-bit BI_RGB (5-5-5), 24/32-bit BI_RGB,
RLE8 and RLE4 compression (end-of-line / end-of-bitmap / delta
escapes), top-down (negative height) and bottom-up rows, 4-byte row
padding.  BI_BITFIELDS and the V4/V5 headers' extra fields are out of
scope (documented, raised explicitly).

``decode_bmp`` returns H×W×3 uint8 RGB.  ``encode_bmp_rgb24`` writes
the canonical bottom-up 24-bit form for payload synthesis and tests —
lossless, so decode(encode(x)) == x exactly and the oracled query can
recompute decoded content from the digest bytes that built the image.
"""

from __future__ import annotations

import struct

import numpy as np


class BadBmp(ValueError):
    pass


class UnsupportedBmp(BadBmp):
    pass


def encode_bmp_rgb24(img: np.ndarray) -> bytes:
    """H×W×3 uint8 → a complete bottom-up 24-bit BI_RGB BMP file."""
    h, w, c = img.shape
    if c != 3:
        raise ValueError("encode_bmp_rgb24 wants H x W x 3")
    row_len = (w * 3 + 3) & ~3
    body = bytearray()
    pad = b"\x00" * (row_len - w * 3)
    for y in range(h - 1, -1, -1):           # bottom-up storage
        row = img[y][:, ::-1].tobytes()       # RGB → BGR
        body += row + pad
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                       len(body), 2835, 2835, 0, 0)
    off = 14 + 40
    filehdr = b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
    return filehdr + info + bytes(body)


def _palette(data: bytes, pos: int, n: int) -> np.ndarray:
    pal = np.frombuffer(data[pos:pos + 4 * n], dtype=np.uint8)
    if len(pal) < 4 * n:
        raise BadBmp("truncated palette")
    pal = pal.reshape(n, 4)[:, :3][:, ::-1]  # BGRX → RGB
    return pal.astype(np.uint8)


def _unrle(data: bytes, w: int, h: int, bits: int) -> np.ndarray:
    """RLE8 / RLE4 → H×W uint8 index raster (bottom-up origin)."""
    out = np.zeros((h, w), dtype=np.uint8)
    x = y = 0
    i = 0
    n = len(data)
    while i + 1 < n:
        cnt, val = data[i], data[i + 1]
        i += 2
        if cnt:                               # encoded run
            if bits == 8:
                run = np.full(cnt, val, dtype=np.uint8)
            else:
                pair = np.array([val >> 4, val & 15], dtype=np.uint8)
                run = np.tile(pair, (cnt + 1) // 2)[:cnt]
            e = min(x + cnt, w)
            if y < h and x < w:
                out[y, x:e] = run[: e - x]
            x += cnt
            continue
        if val == 0:                          # end of line
            x, y = 0, y + 1
        elif val == 1:                        # end of bitmap
            break
        elif val == 2:                        # delta
            if i + 1 >= n:
                raise BadBmp("truncated RLE delta")
            x += data[i]
            y += data[i + 1]
            i += 2
        else:                                 # absolute mode
            cnt = val
            if bits == 8:
                lit = np.frombuffer(data[i:i + cnt], dtype=np.uint8)
                i += (cnt + 1) & ~1           # word-aligned
            else:
                nbytes = (cnt + 1) // 2
                raw = np.frombuffer(data[i:i + nbytes], dtype=np.uint8)
                lit = np.empty(nbytes * 2, dtype=np.uint8)
                lit[0::2] = raw >> 4
                lit[1::2] = raw & 15
                lit = lit[:cnt]
                i += (nbytes + 1) & ~1        # word-aligned
            if len(lit) < cnt:
                raise BadBmp("truncated RLE literals")
            e = min(x + cnt, w)
            if y < h and x < w:
                out[y, x:e] = lit[: e - x]
            x += cnt
    return out[::-1]                          # raster is bottom-up


def decode_bmp(data: bytes) -> np.ndarray:
    """BMP file or bare DIB → H×W×3 uint8 RGB."""
    pix_off = None
    if data[:2] == b"BM":
        if len(data) < 54:
            raise BadBmp("truncated file header")
        (pix_off,) = struct.unpack("<I", data[10:14])
        data = data[14:]
        pix_off -= 14
    if len(data) < 40:
        raise BadBmp("truncated info header")
    (hdr_size, w, h, planes, bpp, comp, _size_img, _xp, _yp,
     clr_used, _clr_imp) = struct.unpack("<IiiHHIIiiII", data[:40])
    if hdr_size < 40:
        raise UnsupportedBmp("BITMAPCOREHEADER (OS/2) not supported")
    if planes != 1:
        raise BadBmp(f"planes={planes}")
    if comp not in (0, 1, 2):
        raise UnsupportedBmp(f"compression {comp} (BI_BITFIELDS/"
                             "JPEG/PNG embeddings not supported)")
    top_down = h < 0
    h = abs(h)
    if w <= 0 or h == 0 or w > 1 << 20 or h > 1 << 20:
        raise BadBmp(f"bad dimensions {w}x{h}")
    if w * h > 1 << 26:
        # untrusted input: refuse the area before ANY raster
        # allocation (the RLE path allocates h x w up front)
        raise BadBmp(f"implausible raster {w}x{h}")

    pal_pos = hdr_size
    n_pal = clr_used or (1 << bpp if bpp <= 8 else 0)
    if pix_off is None:
        pix_off = hdr_size + 4 * n_pal
    pix = data[pix_off:]

    if comp in (1, 2):                        # RLE8 / RLE4
        if (comp == 1 and bpp != 8) or (comp == 2 and bpp != 4):
            raise BadBmp(f"RLE{8 if comp == 1 else 4} with bpp={bpp}")
        pal = _palette(data, pal_pos, n_pal)
        idx = _unrle(pix, w, h, bpp)
        if top_down:
            idx = idx[::-1]
        return pal[np.minimum(idx, n_pal - 1)]

    row_len = ((w * bpp + 31) // 32) * 4
    if len(pix) < row_len * h:
        raise BadBmp("truncated pixel data")
    raster = np.frombuffer(pix[: row_len * h],
                           dtype=np.uint8).reshape(h, row_len)
    if not top_down:
        raster = raster[::-1]

    if bpp in (1, 4, 8):
        pal = _palette(data, pal_pos, n_pal)
        if bpp == 8:
            idx = raster[:, :w]
        elif bpp == 4:
            hi, lo = raster >> 4, raster & 15
            idx = np.empty((h, row_len * 2), dtype=np.uint8)
            idx[:, 0::2] = hi
            idx[:, 1::2] = lo
            idx = idx[:, :w]
        else:
            bitsarr = np.unpackbits(raster, axis=1)
            idx = bitsarr[:, :w]
        return pal[np.minimum(idx, n_pal - 1)]
    if bpp == 16:                             # BI_RGB 5-5-5
        v = raster.view("<u2")[:, :w].astype(np.uint16)
        r = ((v >> 10) & 31).astype(np.uint8)
        g = ((v >> 5) & 31).astype(np.uint8)
        b = (v & 31).astype(np.uint8)
        # canonical 5→8-bit expansion: (c << 3) | (c >> 2)
        out = np.stack([(r << 3) | (r >> 2), (g << 3) | (g >> 2),
                        (b << 3) | (b >> 2)], axis=-1)
        return out
    if bpp == 24:
        bgr = raster[:, : w * 3].reshape(h, w, 3)
        return bgr[:, :, ::-1].copy()
    if bpp == 32:
        bgrx = raster[:, : w * 4].reshape(h, w, 4)
        return bgrx[:, :, 2::-1].copy()
    raise UnsupportedBmp(f"bpp={bpp}")
