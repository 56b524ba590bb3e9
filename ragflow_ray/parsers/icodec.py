"""From-scratch ICO (Windows icon / favicon) container codec.

Favicons are the image format a web-scraped corpus meets on every
site; an ICO is a directory of entries each holding EITHER a PNG
stream (modern) or a bare DIB whose header height is DOUBLED to
cover the 1-bit AND transparency mask stored after the XOR pixel
data (legacy).  Implemented from the public ICONDIR/ICONDIRENTRY
layout; the pixel work delegates to the existing from-scratch
decoders (``pngdec``, ``bmpdec``).

``decode_ico`` returns the LARGEST entry as H×W×3 RGB (masked-out
pixels render white, the repo's canvas convention).  ``encode_ico``
wraps ready-made PNG or 24-bit-DIB payloads for synthesis and tests.
"""

from __future__ import annotations

import struct

import numpy as np


class BadIco(ValueError):
    pass


def encode_ico(images: list[bytes]) -> bytes:
    """Wrap encoded images into an ICO.  Each item is EITHER a PNG
    stream (stored verbatim) or a full BMP file from
    ``encode_bmp_rgb24`` (stored as a DIB: file header stripped,
    header height doubled, an all-opaque AND mask appended)."""
    entries = []
    for img in images:
        if img[:8] == b"\x89PNG\r\n\x1a\n":
            w, h = struct.unpack(">II", img[16:24])
            entries.append((w, h, img))
            continue
        if img[:2] != b"BM":
            raise ValueError("entry must be PNG or BMP")
        dib = bytearray(img[14:])
        (w,) = struct.unpack("<i", dib[4:8])
        (h,) = struct.unpack("<i", dib[8:12])
        struct.pack_into("<i", dib, 8, h * 2)   # doubled height
        mask_row = ((w + 31) // 32) * 4          # 1-bit rows, padded
        dib += b"\x00" * (mask_row * h)          # all-opaque mask
        entries.append((w, h, bytes(dib)))

    out = bytearray(struct.pack("<HHH", 0, 1, len(entries)))
    off = 6 + 16 * len(entries)
    for w, h, payload in entries:
        out += struct.pack("<BBBBHHII", w % 256, h % 256, 0, 0, 1, 32,
                           len(payload), off)
        off += len(payload)
    for _, _, payload in entries:
        out += payload
    return bytes(out)


def decode_ico(data: bytes) -> np.ndarray:
    """Largest entry of an ICO → H×W×3 uint8 RGB."""
    if len(data) < 6:
        raise BadIco("truncated ICONDIR")
    reserved, ico_type, count = struct.unpack("<HHH", data[:6])
    if reserved != 0 or ico_type != 1 or count == 0:
        raise BadIco("not an ICO container")
    best = None
    for k in range(count):
        pos = 6 + 16 * k
        if pos + 16 > len(data):
            raise BadIco("truncated ICONDIRENTRY")
        bw, bh, _, _, _, _, size, off = struct.unpack(
            "<BBBBHHII", data[pos:pos + 16])
        w = bw or 256   # 0 encodes 256 in the directory
        h = bh or 256
        if off + size > len(data):
            raise BadIco("entry payload out of range")
        if best is None or w * h > best[0]:
            best = (w * h, data[off:off + size])
    payload = best[1]

    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        from .pngdec import BadPng, decode_png

        try:
            return decode_png(payload)
        except BadPng as ex:
            # the per-decoder contract: ICO callers catch BadIco
            raise BadIco(f"corrupt PNG entry: {ex}") from ex

    # DIB entry: header height covers XOR + AND; halve it and hand
    # the XOR part to the BMP decoder, then apply the AND mask
    if len(payload) < 40:
        raise BadIco("truncated DIB entry")
    (hdr_size,) = struct.unpack("<I", payload[:4])
    (w,) = struct.unpack("<i", payload[4:8])
    (h2,) = struct.unpack("<i", payload[8:12])
    (bpp,) = struct.unpack("<H", payload[14:16])
    h = abs(h2) // 2
    if h == 0 or w <= 0:
        raise BadIco("bad DIB entry dimensions")
    dib = bytearray(payload)
    struct.pack_into("<i", dib, 8, h if h2 > 0 else -h)
    from .bmpdec import BadBmp, decode_bmp

    try:
        rgb = decode_bmp(bytes(dib))
    except BadBmp as ex:
        raise BadIco(f"corrupt DIB entry: {ex}") from ex

    # AND mask: 1-bit rows (bottom-up like the XOR data), after the
    # pixel data; a set bit means transparent → white
    xor_row = ((w * bpp + 31) // 32) * 4
    mask_row = ((w + 31) // 32) * 4
    # palette (if any) sits between header and pixels
    n_pal = 0
    if bpp <= 8:
        (clr_used,) = struct.unpack("<I", payload[32:36])
        n_pal = clr_used or (1 << bpp)
    mask_off = hdr_size + 4 * n_pal + xor_row * h
    mask = payload[mask_off:mask_off + mask_row * h]
    if len(mask) < mask_row * h:
        return rgb  # some writers omit the mask; treat as opaque
    m = np.frombuffer(mask, dtype=np.uint8).reshape(h, mask_row)
    bits = np.unpackbits(m, axis=1)[:, :w].astype(bool)
    if h2 > 0:
        bits = bits[::-1]       # stored bottom-up like the XOR data
    out = rgb.copy()
    out[bits] = 255
    return out
