"""From-scratch binary Netpbm (PNM) codec: P4 / P5 / P6.

The interchange format of scientific and OCR corpora (scanner
pipelines emit PBM/PGM/PPM; Netpbm's own spec is the reference).
Header: magic, whitespace/comment-separated width, height, and (for
P5/P6) maxval; then one binary raster.  Supported: P4 1-bit packed
rows, P5 gray and P6 RGB at maxval ≤ 255 and the 16-bit big-endian
maxval ≤ 65535 forms (scaled to 8-bit by the canonical
``round(v * 255 / maxval)``).  The ASCII forms (P1–P3) are out of
scope — raised explicitly.
"""

from __future__ import annotations

import numpy as np


class BadPnm(ValueError):
    pass


class UnsupportedPnm(BadPnm):
    pass


def _tokens(data: bytes, pos: int, count: int) -> tuple[list[int], int]:
    """Read ``count`` whitespace/comment-separated decimal tokens."""
    vals: list[int] = []
    n = len(data)
    while len(vals) < count:
        while pos < n and data[pos:pos + 1].isspace():
            pos += 1
        if pos < n and data[pos] == 0x23:          # '#' comment
            while pos < n and data[pos] not in (0x0A, 0x0D):
                pos += 1
            continue
        start = pos
        while pos < n and data[pos:pos + 1].isdigit():
            pos += 1
        if pos == start:
            raise BadPnm("malformed header token")
        vals.append(int(data[start:pos]))
    if pos >= n or not data[pos:pos + 1].isspace():
        raise BadPnm("missing raster separator")
    return vals, pos + 1


def decode_pnm(data: bytes) -> np.ndarray:
    """P4/P5/P6 bytes → H×W×3 uint8 RGB (gray replicates channels)."""
    magic = bytes(data[:2])
    if magic in (b"P1", b"P2", b"P3"):
        raise UnsupportedPnm("ASCII PNM forms not supported")
    if magic not in (b"P4", b"P5", b"P6"):
        raise BadPnm("not a binary PNM")
    if magic == b"P4":
        (w, h), pos = _tokens(data, 2, 2)
        maxval = 1
    else:
        (w, h, maxval), pos = _tokens(data, 2, 3)
    if not (0 < w <= 1 << 20 and 0 < h <= 1 << 20):
        raise BadPnm(f"bad dimensions {w}x{h}")
    if not (1 <= maxval <= 65535):
        raise BadPnm(f"bad maxval {maxval}")

    if magic == b"P4":
        row_bytes = (w + 7) // 8
        need = row_bytes * h
        raw = np.frombuffer(data[pos:pos + need], dtype=np.uint8)
        if len(raw) < need:
            raise BadPnm("truncated raster")
        bits = np.unpackbits(raw.reshape(h, row_bytes), axis=1)[:, :w]
        g = (1 - bits).astype(np.uint8) * np.uint8(255)  # 1 = black
        return np.stack([g, g, g], axis=-1)

    ch = 3 if magic == b"P6" else 1
    wide = maxval > 255
    need = w * h * ch * (2 if wide else 1)
    raw = np.frombuffer(data[pos:pos + need], dtype=np.uint8)
    if len(raw) < need:
        raise BadPnm("truncated raster")
    if wide:
        v = raw.reshape(-1, 2)
        vals = (v[:, 0].astype(np.uint32) << 8) | v[:, 1]  # big-endian
    else:
        vals = raw.astype(np.uint32)
    if maxval != 255:
        vals = (vals * 255 + maxval // 2) // maxval
    px = vals.astype(np.uint8).reshape(h, w, ch)
    return np.repeat(px, 3, axis=2) if ch == 1 else px.copy()


def encode_ppm_rgb8(img: np.ndarray) -> bytes:
    """H×W×3 uint8 → a P6 maxval-255 PPM (lossless roundtrip)."""
    h, w, c = img.shape
    if c != 3:
        raise ValueError("encode_ppm_rgb8 wants H x W x 3")
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()
