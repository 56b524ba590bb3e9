"""From-scratch PNG decoder.

Implements the still-image path of the public PNG spec (RFC 2083 /
ISO 15948): signature + chunk walk → IHDR → PLTE/tRNS → IDAT
concatenation → zlib inflate (stdlib, as everywhere else in this
repo's Flate handling) → per-row unfilter (None/Sub/Up/Average/
Paeth) → sample unpack → RGB.  Companion to ``parsers/jpegdec.py``:
together they give the multimodal stages (``ops/multimodal.py``)
real pixel content for the two dominant public still-image codecs
(the reference rasterizes via pdfplumber/PIL,
deepdoc/parser/pdf_parser.py:1006-1034; no image library exists in
this container).

Scope (documented): bit depth 8 for all five color types (gray,
RGB, palette, gray+alpha, RGBA) plus bit depths 1/2/4 for grayscale
and palette; 16-bit samples are truncated to their high byte (what
common readers render); alpha composites over white; Adam7 interlace
(seven sub-image passes scattered onto the output grid, spec §8.2).

The unfilter loop is per-row Python (rows are sequentially dependent
by construction) with numpy vectorization inside each row for Sub /
Average / Paeth via per-pixel-group steps; all other stages are whole-
image numpy.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


class UnsupportedPng(ValueError):
    """Well-formed PNG outside the implemented subset."""


class BadPng(ValueError):
    """Malformed / truncated PNG data."""


_SIG = b"\x89PNG\r\n\x1a\n"

# color type → samples per pixel
_NSAMP = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _chunks(data: bytes):
    if data[:8] != _SIG:
        raise BadPng("missing PNG signature")
    pos = 8
    while pos + 8 <= len(data):
        (size,) = struct.unpack_from(">I", data, pos)
        ctype = data[pos + 4:pos + 8]
        payload = data[pos + 8:pos + 8 + size]
        if len(payload) < size:
            raise BadPng(f"truncated {ctype!r} chunk")
        yield ctype, payload
        pos += 12 + size  # 4 len + 4 type + data + 4 crc
        if ctype == b"IEND":
            return
    raise BadPng("missing IEND")


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Per-element Paeth predictor (spec §6.6) on int16 arrays."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out


def _unfilter(raw: bytes, h: int, rowbytes: int, bpp: int) -> np.ndarray:
    """Filtered scanline stream → (h, rowbytes) uint8 array."""
    need = h * (rowbytes + 1)
    if len(raw) < need:
        raise BadPng("inflated IDAT shorter than image")
    src = np.frombuffer(raw[:need], dtype=np.uint8).reshape(h, rowbytes + 1)
    out = np.zeros((h, rowbytes), dtype=np.uint8)
    prev = np.zeros(rowbytes, dtype=np.int16)
    for y in range(h):
        ftype = int(src[y, 0])
        row = src[y, 1:].astype(np.int16)
        if ftype == 0:  # None
            cur = row
        elif ftype == 1:  # Sub is a per-lane cumulative sum mod 256
            acc = np.cumsum(row.reshape(-1, bpp).astype(np.int64), axis=0)
            cur = (acc & 0xFF).reshape(-1).astype(np.int16)
        elif ftype == 2:  # Up
            cur = (row + prev) & 0xFF
        elif ftype == 3:  # Average
            cur = row.copy()
            cur[:bpp] = (cur[:bpp] + (prev[:bpp] >> 1)) & 0xFF
            for x in range(bpp, rowbytes, bpp):
                cur[x:x + bpp] = (row[x:x + bpp]
                                  + ((cur[x - bpp:x] + prev[x:x + bpp]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = row.copy()
            zero = np.zeros(bpp, dtype=np.int16)
            cur[:bpp] = (cur[:bpp] + _paeth(zero, prev[:bpp], zero)) & 0xFF
            for x in range(bpp, rowbytes, bpp):
                cur[x:x + bpp] = (row[x:x + bpp]
                                  + _paeth(cur[x - bpp:x], prev[x:x + bpp],
                                           prev[x - bpp:x])) & 0xFF
        else:
            raise BadPng(f"filter type {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out


def _unpack_bits(rows: np.ndarray, w: int, depth: int) -> np.ndarray:
    """(h, rowbytes) packed 1/2/4-bit samples → (h, w) ints, MSB first."""
    h = rows.shape[0]
    per = 8 // depth
    bits = np.unpackbits(rows, axis=1).reshape(h, -1, 8)
    vals = np.zeros((h, bits.shape[1] * per), dtype=np.uint8)
    for i in range(per):
        chunk = bits[:, :, i * depth:(i + 1) * depth]
        v = np.zeros((h, bits.shape[1]), dtype=np.uint8)
        for b in range(depth):
            v = (v << 1) | chunk[:, :, b]
        vals[:, i::per] = v
    return vals[:, :w]


# Adam7 pass grid: (x_start, y_start, x_step, y_step), spec §8.2
_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def _rows_to_samples(rows: np.ndarray, w: int, nsamp: int, depth: int) -> np.ndarray:
    """Unfiltered scanline bytes → (h, w, nsamp) raw sample values."""
    h = rows.shape[0]
    if depth < 8:
        return _unpack_bits(rows, w * nsamp, depth).reshape(h, w, nsamp)
    if depth == 16:
        return rows.reshape(h, w, nsamp, 2)[..., 0]  # high byte
    return rows.reshape(h, w, nsamp)


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → HxWx3 uint8 RGB (alpha composited over white)."""
    data = bytes(data)
    ihdr = None
    plte = None
    trns = None
    idat: list[bytes] = []
    for ctype, payload in _chunks(data):
        if ctype == b"IHDR":
            ihdr = payload
        elif ctype == b"PLTE":
            plte = payload
        elif ctype == b"tRNS":
            trns = payload
        elif ctype == b"IDAT":
            idat.append(payload)
    if ihdr is None or len(ihdr) < 13:
        raise BadPng("missing IHDR")
    w, h, depth, ctype_i, comp, filt, interlace = struct.unpack(">IIBBBBB", ihdr)
    if w == 0 or h == 0:
        raise BadPng("zero dimension")
    if comp != 0 or filt != 0:
        raise BadPng("unknown compression/filter method")
    if interlace not in (0, 1):
        raise UnsupportedPng(f"interlace method {interlace}")
    if ctype_i not in _NSAMP:
        raise BadPng(f"color type {ctype_i}")
    if depth not in (1, 2, 4, 8, 16) or (depth < 8 and ctype_i not in (0, 3)) \
            or (depth == 16 and ctype_i == 3):
        raise BadPng(f"bit depth {depth} for color type {ctype_i}")
    if not idat:
        raise BadPng("missing IDAT")
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as e:
        raise BadPng(f"IDAT inflate failed: {e}") from e

    nsamp = _NSAMP[ctype_i]
    bpp = max(1, nsamp * depth // 8)
    if interlace == 0:
        rowbytes = (w * nsamp * depth + 7) // 8
        samples = _rows_to_samples(_unfilter(raw, h, rowbytes, bpp), w, nsamp, depth)
    else:
        # Adam7: each pass is an independently filtered sub-image,
        # scattered onto the output grid by its (start, step) lattice
        samples = np.zeros((h, w, nsamp), dtype=np.uint8)
        off = 0
        for x0, y0, xs, ys in _ADAM7:
            pw = (w - x0 + xs - 1) // xs
            ph = (h - y0 + ys - 1) // ys
            if pw == 0 or ph == 0:
                continue
            prowbytes = (pw * nsamp * depth + 7) // 8
            need = ph * (prowbytes + 1)
            sub = _unfilter(raw[off:off + need], ph, prowbytes, bpp)
            off += need
            samples[y0::ys, x0::xs] = _rows_to_samples(sub, pw, nsamp, depth)
    if depth < 8 and ctype_i == 0:  # scale to full 8-bit range (spec sample scaling)
        samples = (samples.astype(np.uint16) * 255 // ((1 << depth) - 1)).astype(np.uint8)

    if ctype_i == 3:
        if plte is None or len(plte) % 3:
            raise BadPng("palette image without a valid PLTE")
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        idx = samples[..., 0]
        if int(idx.max()) >= len(pal):
            raise BadPng("palette index out of range")
        rgb = pal[idx]
        if trns is not None:
            alpha = np.full(len(pal), 255, dtype=np.uint8)
            alpha[: len(trns)] = np.frombuffer(trns, dtype=np.uint8)
            a = alpha[idx].astype(np.uint16)[..., None]
            rgb = ((rgb.astype(np.uint16) * a + 255 * (255 - a) + 127) // 255).astype(np.uint8)
        return np.ascontiguousarray(rgb)
    if ctype_i == 0:
        return np.repeat(samples, 3, axis=2)
    if ctype_i == 2:
        return np.ascontiguousarray(samples)
    if ctype_i == 4:
        g, a = samples[..., 0].astype(np.uint16), samples[..., 1].astype(np.uint16)
        g = ((g * a + 255 * (255 - a) + 127) // 255).astype(np.uint8)
        return np.repeat(g[..., None], 3, axis=2)
    # RGBA
    rgb = samples[..., :3].astype(np.uint16)
    a = samples[..., 3:4].astype(np.uint16)
    return ((rgb * a + 255 * (255 - a) + 127) // 255).astype(np.uint8)


def encode_png_rgb(img: np.ndarray) -> bytes:
    """Minimal filter-0 RGB8 PNG writer for in-pipeline payload
    synthesis (oracle-checked real-decode queries; the multi-filter /
    multi-color-type encoder that exercises the decoder's subsets is
    test-side, ``tests/pngenc.py``)."""
    img = np.asarray(img, dtype=np.uint8)
    h, w, _ = img.shape
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))

    def chunk(ctype: bytes, payload: bytes) -> bytes:
        return (struct.pack(">I", len(payload)) + ctype + payload
                + struct.pack(">I", zlib.crc32(ctype + payload)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw, 6))
            + chunk(b"IEND", b""))
