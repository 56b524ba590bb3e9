"""Test-side GIF encoder — exercises ragflow_ray/parsers/gifdec.py
with real encoded bytes: true LZW compression (dictionary growth,
width bumps, mid-stream clear on a full table), interlace, global and
local color tables, transparency, sub-block framing, animation-style
multi-frame files.  Kept out of the library on purpose: the
engine only needs the literal-code gray writer
(`gifdec.encode_gif_gray`) for payload synthesis."""

from __future__ import annotations

import numpy as np


class _LsbWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def finish(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
        return bytes(self.out)


def lzw_encode(indices: np.ndarray, min_code: int) -> bytes:
    """GIF-variant LZW: LSB-first, clear first, reset on a full
    dictionary, end code last."""
    clear = 1 << min_code
    end = clear + 1
    w = _LsbWriter()
    width = min_code + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    nxt = end + 1
    w.put(clear, width)
    run = b""
    for k in map(int, indices):
        cand = run + bytes([k])
        if cand in table:
            run = cand
            continue
        w.put(table[run], width)
        table[cand] = nxt
        nxt += 1
        if nxt - 1 == (1 << width) and width < 12:
            width += 1
        if nxt > 4095:
            w.put(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            nxt = end + 1
            width = min_code + 1
        run = bytes([k])
    if run:
        w.put(table[run], width)
    w.put(end, width)
    return w.finish()


def _blocks(payload: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(payload), 255):
        part = payload[i:i + 255]
        out.append(len(part))
        out += part
    out.append(0)
    return bytes(out)


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def encode_gif(
    idx: np.ndarray,
    palette: np.ndarray,
    interlace: bool = False,
    local_palette: bool = False,
    transparent: int = -1,
    offset: tuple[int, int] = (0, 0),
    screen: tuple[int, int] | None = None,
    extra_frame: bool = False,
    version: bytes = b"GIF89a",
) -> bytes:
    """Palette-index frame → GIF bytes.

    ``idx``: (h, w) uint8 indices; ``palette``: (n, 3) uint8 (n a
    power of two, ≥2).  ``screen`` defaults to the frame size plus
    the offset.  ``extra_frame`` appends a second (ignored) frame."""
    idx = np.asarray(idx, dtype=np.uint8)
    palette = np.asarray(palette, dtype=np.uint8)
    h, w = idx.shape
    left, top = offset
    sw, sh = screen if screen else (left + w, top + h)
    npal = len(palette)
    assert npal & (npal - 1) == 0 and npal >= 2
    pal_bits = max(1, (npal - 1).bit_length())

    out = bytearray(version)
    out += bytes([sw & 0xFF, sw >> 8, sh & 0xFF, sh >> 8])
    if local_palette:
        out += bytes([0x00, 0, 0])  # no global table
    else:
        out += bytes([0x80 | (pal_bits - 1), 0, 0])
        out += palette.tobytes()
    if transparent >= 0:
        out += bytes([0x21, 0xF9, 4, 0x01, 0, 0, transparent, 0])
    # a comment extension: decoders must skip it
    out += bytes([0x21, 0xFE]) + _blocks(b"made by tests/gifenc.py")

    def frame(fidx, fleft, ftop):
        fh, fw = fidx.shape
        blk = bytearray([0x2C,
                         fleft & 0xFF, fleft >> 8, ftop & 0xFF, ftop >> 8,
                         fw & 0xFF, fw >> 8, fh & 0xFF, fh >> 8])
        iflags = 0
        if local_palette:
            iflags |= 0x80 | (pal_bits - 1)
        if interlace:
            iflags |= 0x40
        blk.append(iflags)
        if local_palette:
            blk += palette.tobytes()
        rows = fidx
        if interlace:
            order = np.concatenate(
                [np.arange(start, fh, step)
                 for start, step in _INTERLACE_PASSES])
            rows = fidx[order]
        min_code = max(2, pal_bits)
        blk.append(min_code)
        blk += _blocks(lzw_encode(rows.reshape(-1), min_code))
        return bytes(blk)

    out += frame(idx, left, top)
    if extra_frame:
        out += frame(np.zeros_like(idx), left, top)
    out.append(0x3B)
    return bytes(out)
