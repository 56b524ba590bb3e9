"""Test-side PNG encoder — exercises every subset of
ragflow_ray/parsers/pngdec.py with real encoded bytes: all five
color types, bit depths 1/2/4/8/16, all five filter types (chosen
per row), palette + tRNS, multi-IDAT splitting.  Kept out of the
library on purpose: the engine only needs the filter-0 RGB writer
(`pngdec.encode_png_rgb`) for payload synthesis."""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(ctype: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + ctype + payload
            + struct.pack(">I", zlib.crc32(ctype + payload)))


def _paeth1(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _filter_row(cur: bytes, prev: bytes, ftype: int, bpp: int) -> bytes:
    out = bytearray(len(cur))
    for x in range(len(cur)):
        a = cur[x - bpp] if x >= bpp else 0
        b = prev[x]
        c = prev[x - bpp] if x >= bpp else 0
        if ftype == 0:
            v = cur[x]
        elif ftype == 1:
            v = cur[x] - a
        elif ftype == 2:
            v = cur[x] - b
        elif ftype == 3:
            v = cur[x] - ((a + b) >> 1)
        else:
            v = cur[x] - _paeth1(a, b, c)
        out[x] = v & 0xFF
    return bytes(out)


def _pack_row(samples: np.ndarray, depth: int) -> bytes:
    """1-D per-row sample ints → packed bytes, MSB-first."""
    if depth == 8:
        return samples.astype(np.uint8).tobytes()
    if depth == 16:
        # high byte carries the value; low byte varies to prove it's ignored
        hi = samples.astype(np.uint16) << 8
        return (hi | (samples.astype(np.uint16) * 37 & 0xFF)).astype(">u2").tobytes()
    per = 8 // depth
    pad = (-len(samples)) % per
    s = np.concatenate([samples, np.zeros(pad, dtype=samples.dtype)])
    out = np.zeros(len(s) // per, dtype=np.uint8)
    for i in range(per):
        out = (out << depth) | s[i::per].astype(np.uint8)
    return out.tobytes()


_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def encode_png(
    img: np.ndarray,
    color_type: int = 2,
    depth: int = 8,
    filters=None,
    palette: np.ndarray | None = None,
    trns: bytes | None = None,
    idat_split: int = 0,
    interlace: bool = False,
) -> bytes:
    """Sample array → PNG bytes.

    ``img`` shape by color type: 0 → (h, w) gray; 2 → (h, w, 3);
    3 → (h, w) palette indices (requires ``palette``); 4 → (h, w, 2);
    6 → (h, w, 4).  ``filters``: per-row filter types (cycled), default
    cycles 0..4.
    """
    img = np.asarray(img)
    h, w = img.shape[:2]
    nsamp = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    flat = img.reshape(h, w * nsamp) if img.ndim == 3 else img.reshape(h, w)
    bpp = max(1, nsamp * depth // 8)
    filters = list(filters) if filters is not None else [0, 1, 2, 3, 4]

    raw = bytearray()
    if interlace:
        grid = flat.reshape(h, w, nsamp)
        for x0, y0, xs, ys in _ADAM7:
            sub = grid[y0::ys, x0::xs]
            ph, pw = sub.shape[:2]
            if ph == 0 or pw == 0:
                continue
            sflat = sub.reshape(ph, pw * nsamp)
            prev = b"\x00" * ((pw * nsamp * depth + 7) // 8)
            for y in range(ph):
                cur = _pack_row(sflat[y], depth)
                f = filters[y % len(filters)] if depth >= 8 else 0
                raw.append(f)
                raw += _filter_row(cur, prev, f, bpp)
                prev = cur
    else:
        prev = b"\x00" * ((w * nsamp * depth + 7) // 8)
        for y in range(h):
            cur = _pack_row(flat[y], depth)
            f = filters[y % len(filters)] if depth >= 8 else 0
            raw.append(f)
            raw += _filter_row(cur, prev, f, bpp)
            prev = cur

    ihdr = struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0,
                       1 if interlace else 0)
    comp = zlib.compress(bytes(raw), 6)
    out = _SIG + _chunk(b"IHDR", ihdr)
    if color_type == 3:
        out += _chunk(b"PLTE", np.asarray(palette, dtype=np.uint8).tobytes())
        if trns is not None:
            out += _chunk(b"tRNS", trns)
    if idat_split > 0:
        for i in range(0, len(comp), idat_split):
            out += _chunk(b"IDAT", comp[i:i + idat_split])
    else:
        out += _chunk(b"IDAT", comp)
    return out + _chunk(b"IEND", b"")
