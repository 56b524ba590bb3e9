"""From-scratch TGA (Truevision Targa) decoder.

The last of the common legacy raster formats in scraped game/graphics
corpora.  Implemented from the public Truevision TGA 2.0
specification: 18-byte header (image-ID length, color-map spec,
origin, descriptor), color-mapped / truecolor / grayscale images
(types 1/2/3) and their RLE forms (9/10/11), 8/15/16/24/32-bit
pixels (BGR(A) storage, 15/16-bit as 5-5-5 with the canonical
5→8-bit expansion), bottom-up or top-down row order via descriptor
bit 5, right-to-left via bit 4.

``decode_tga`` returns H×W×3 uint8 RGB (alpha dropped).
``encode_tga_rgb24`` writes the canonical bottom-up type-2 form.
"""

from __future__ import annotations

import struct

import numpy as np


class BadTga(ValueError):
    pass


class UnsupportedTga(BadTga):
    pass


def encode_tga_rgb24(img: np.ndarray) -> bytes:
    """H×W×3 uint8 → a bottom-up type-2 (uncompressed truecolor) TGA."""
    h, w, c = img.shape
    if c != 3:
        raise ValueError("encode_tga_rgb24 wants H x W x 3")
    hdr = struct.pack("<BBBHHBHHHHBB", 0, 0, 2, 0, 0, 0, 0, 0,
                      w, h, 24, 0)
    body = img[::-1, :, ::-1].tobytes()      # bottom-up, RGB→BGR
    return hdr + body


def _unrle_tga(data: bytes, n_pixels: int, bpp_bytes: int) -> bytes:
    """TGA RLE: packets of (1 + 7-bit count); high bit set = one pixel
    repeated count+1 times, clear = count+1 literal pixels."""
    out = bytearray()
    need = n_pixels * bpp_bytes
    i, n = 0, len(data)
    while len(out) < need:
        if i >= n:
            raise BadTga("truncated RLE stream")
        head = data[i]
        i += 1
        cnt = (head & 0x7F) + 1
        if head & 0x80:                       # run packet
            px = data[i:i + bpp_bytes]
            if len(px) < bpp_bytes:
                raise BadTga("truncated RLE run pixel")
            out += px * cnt
            i += bpp_bytes
        else:                                 # raw packet
            take = cnt * bpp_bytes
            px = data[i:i + take]
            if len(px) < take:
                raise BadTga("truncated RLE raw packet")
            out += px
            i += take
    return bytes(out[:need])


def _expand555(v: np.ndarray) -> np.ndarray:
    r = ((v >> 10) & 31).astype(np.uint8)
    g = ((v >> 5) & 31).astype(np.uint8)
    b = (v & 31).astype(np.uint8)
    return np.stack([(r << 3) | (r >> 2), (g << 3) | (g >> 2),
                     (b << 3) | (b >> 2)], axis=-1)


def decode_tga(data: bytes) -> np.ndarray:
    """TGA bytes → H×W×3 uint8 RGB."""
    if len(data) < 18:
        raise BadTga("truncated header")
    (id_len, cmap_type, itype, cmap_first, cmap_len, cmap_bits,
     _xo, _yo, w, h, bpp, desc) = struct.unpack("<BBBHHBHHHHBB",
                                                data[:18])
    base = itype & 7
    rle = bool(itype & 8)
    if base not in (1, 2, 3) or itype & ~0x0B:
        raise UnsupportedTga(f"image type {itype}")
    if not (0 < w <= 1 << 20 and 0 < h <= 1 << 20) or w * h > 1 << 26:
        raise BadTga(f"bad dimensions {w}x{h}")
    pos = 18 + id_len

    cmap = None
    if cmap_type == 1:
        if cmap_bits not in (24, 32, 15, 16):
            raise UnsupportedTga(f"{cmap_bits}-bit color map")
        entry = (cmap_bits + 7) // 8
        raw = data[pos:pos + cmap_len * entry]
        if len(raw) < cmap_len * entry:
            raise BadTga("truncated color map")
        pos += cmap_len * entry
        arr = np.frombuffer(raw, dtype=np.uint8).reshape(cmap_len, entry)
        if entry >= 3:
            cmap = arr[:, 2::-1].copy()       # BGR(A) → RGB
        else:
            v = np.frombuffer(raw, dtype="<u2")
            cmap = _expand555(v.astype(np.uint16))
    elif cmap_type != 0:
        raise UnsupportedTga(f"color-map type {cmap_type}")
    if base == 1 and cmap is None:
        raise BadTga("color-mapped image without a color map")

    if base == 1:
        pxb = (bpp + 7) // 8
        if bpp not in (8, 16):
            raise UnsupportedTga(f"{bpp}-bit palette indices")
    elif base == 3:
        pxb = 1
        if bpp != 8:
            raise UnsupportedTga(f"{bpp}-bit grayscale")
    else:
        if bpp not in (15, 16, 24, 32):
            raise UnsupportedTga(f"{bpp}-bit truecolor")
        pxb = (bpp + 7) // 8

    need = w * h * pxb
    if rle:
        raw = _unrle_tga(data[pos:], w * h, pxb)
    else:
        raw = data[pos:pos + need]
        if len(raw) < need:
            raise BadTga("truncated pixel data")
    arr = np.frombuffer(raw, dtype=np.uint8)

    if base == 1:
        if pxb == 1:
            idx = arr.astype(np.int32)
        else:
            idx = arr.view("<u2").astype(np.int32)
        idx -= cmap_first
        if idx.min() < 0 or idx.max() >= len(cmap):
            raise BadTga("palette index out of range")
        rgb = cmap[idx].reshape(h, w, 3)[:, :, :3]
    elif base == 3:
        g = arr.reshape(h, w)
        rgb = np.stack([g, g, g], axis=-1)
    elif pxb == 2:
        rgb = _expand555(arr.view("<u2").astype(np.uint16)).reshape(
            h, w, 3)
    else:
        px = arr.reshape(h, w, pxb)
        rgb = px[:, :, 2::-1].copy()          # BGR(A) → RGB

    if not desc & 0x20:                       # bit 5 clear = bottom-up
        rgb = rgb[::-1]
    if desc & 0x10:                           # bit 4 = right-to-left
        rgb = rgb[:, ::-1]
    return np.ascontiguousarray(rgb)
