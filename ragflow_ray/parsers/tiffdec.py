"""From-scratch baseline TIFF decoder (TIFF 6.0, part 1).

The last major legacy still-image container the multimodal stages
meet (scanned-page sidecars, fax-style exports, legacy Office
embeddings).  Implemented from the public TIFF 6.0 specification:

* both byte orders (``II`` little- / ``MM`` big-endian)
* the first IFD's baseline tags: dimensions, bits-per-sample,
  compression, photometric interpretation, strip offsets/counts,
  rows-per-strip, samples-per-pixel, color map
* uncompressed (1) and PackBits (32773) strip compression
* photometric 0/1 (grayscale, incl. WhiteIsZero inversion), 2 (RGB,
  8-bit), 3 (palette, 16-bit color map entries per the spec)
* 1/4/8-bit grayscale and palette sample depths

* LZW compression (5) — the TIFF variant: MSB-first bit packing,
  9-bit initial codes, EARLY code-width change (one code before the
  table fills, unlike GIF), ClearCode 256 / EOI 257 — and the
  horizontal-differencing predictor (tag 317, value 2) usually
  paired with it

Out of scope (raised explicitly): CCITT/JPEG compression, tiles,
planar configuration 2, multi-IFD pages beyond the first.

``encode_tiff_rgb8`` writes a canonical single-strip uncompressed RGB
TIFF for payload synthesis and tests — lossless, so the oracled query
recomputes decoded content from the digest bytes exactly.
"""

from __future__ import annotations

import struct

import numpy as np


class BadTiff(ValueError):
    pass


class UnsupportedTiff(BadTiff):
    pass


_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4,
              10: 8, 11: 4, 12: 8}


def encode_tiff_rgb8(img: np.ndarray) -> bytes:
    """H×W×3 uint8 → a little-endian single-strip uncompressed TIFF."""
    h, w, c = img.shape
    if c != 3:
        raise ValueError("encode_tiff_rgb8 wants H x W x 3")
    pix = img.tobytes()
    # layout: header(8) | pixel data | BitsPerSample array | IFD
    pix_off = 8
    bps_off = pix_off + len(pix)
    ifd_off = bps_off + 6
    entries = [
        (256, 4, 1, w),             # ImageWidth
        (257, 4, 1, h),             # ImageLength
        (258, 3, 3, bps_off),       # BitsPerSample -> offset
        (259, 3, 1, 1),             # Compression: none
        (262, 3, 1, 2),             # Photometric: RGB
        (273, 4, 1, pix_off),       # StripOffsets
        (277, 3, 1, 3),             # SamplesPerPixel
        (278, 4, 1, h),             # RowsPerStrip
        (279, 4, 1, len(pix)),      # StripByteCounts
    ]
    out = bytearray(b"II*\x00" + struct.pack("<I", ifd_off))
    out += pix
    out += struct.pack("<HHH", 8, 8, 8)
    out += struct.pack("<H", len(entries))
    for tag, typ, cnt, val in entries:
        out += struct.pack("<HHII", tag, typ, cnt, val)
    out += struct.pack("<I", 0)     # next-IFD terminator
    return bytes(out)


def encode_tiff_rgb8_pages(imgs: list[np.ndarray]) -> bytes:
    """Multi-page variant: one uncompressed RGB IFD per image, chained
    through the next-IFD pointers (the scanned-document layout)."""
    if not imgs:
        raise ValueError("no pages")
    blobs = []
    for img in imgs:
        h, w, c = img.shape
        if c != 3:
            raise ValueError("encode_tiff_rgb8_pages wants H x W x 3")
        blobs.append((w, h, img.tobytes()))
    out = bytearray(b"II*\x00\x00\x00\x00\x00")
    ifd_offsets = []
    for w, h, pix in blobs:
        pix_off = len(out)
        out += pix
        bps_off = len(out)
        out += struct.pack("<HHH", 8, 8, 8)
        ifd_offsets.append(len(out))
        entries = [
            (256, 4, 1, w), (257, 4, 1, h), (258, 3, 3, bps_off),
            (259, 3, 1, 1), (262, 3, 1, 2), (273, 4, 1, pix_off),
            (277, 3, 1, 3), (278, 4, 1, h), (279, 4, 1, len(pix)),
        ]
        out += struct.pack("<H", len(entries))
        for tag, typ, cnt, val in entries:
            out += struct.pack("<HHII", tag, typ, cnt, val)
        out += struct.pack("<I", 0)  # patched below for non-last pages
    struct.pack_into("<I", out, 4, ifd_offsets[0])
    for k in range(len(ifd_offsets) - 1):
        # the next-IFD pointer sits after this IFD's 9 entries
        patch = ifd_offsets[k] + 2 + 12 * 9
        struct.pack_into("<I", out, patch, ifd_offsets[k + 1])
    return bytes(out)


def _unpackbits(data: bytes, expected: int) -> bytes:
    """PackBits (Apple RLE) decompression for one strip."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n and len(out) < expected:
        b = data[i]
        i += 1
        if b < 128:                 # literal run of b+1 bytes
            out += data[i:i + b + 1]
            i += b + 1
        elif b > 128:               # repeat next byte 257-b times
            if i >= n:
                raise BadTiff("truncated PackBits repeat")
            out += bytes([data[i]]) * (257 - b)
            i += 1
        # b == 128: no-op per spec
    if len(out) < expected:
        raise BadTiff("PackBits strip shorter than declared")
    return bytes(out[:expected])


def _unlzw(data: bytes, expected: int) -> bytes:
    """TIFF-variant LZW decompression for one strip (spec §13):
    MSB-first code packing and the early code-width bump at table
    sizes 510/1022/2046 (one before GIF, and one more for the
    decoder's one-entry lag behind the encoder)."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    table: list[bytes] = []

    def reset():
        nonlocal table, width
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9

    width = 9
    reset()
    acc = nbits = 0
    prev: bytes | None = None
    i, n = 0, len(data)
    while len(out) < expected:
        while nbits < width:
            if i >= n:
                raise BadTiff("LZW strip ended before expected output")
            acc = (acc << 8) | data[i]
            nbits += 8
            i += 1
        code = (acc >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        if code == CLEAR:
            reset()
            prev = None
            continue
        if code == EOI:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise BadTiff("LZW code out of range")
        out += entry
        prev = entry
        # early change: the decoder's table is one entry behind the
        # encoder's, so it widens one entry earlier still — at table
        # size 2^width - 2 (510/1022/2046), matching §13's convention
        if len(table) + 2 >= (1 << width) and width < 12:
            width += 1
    if len(out) < expected:
        raise BadTiff("LZW strip shorter than declared")
    return bytes(out[:expected])


def _read_ifd_at(data: bytes, e: str, ifd_off: int):
    """IFD at ``ifd_off`` → (tags, next-IFD offset or 0)."""
    if ifd_off + 2 > len(data):
        raise BadTiff("IFD offset out of range")
    (n_entries,) = struct.unpack(e + "H", data[ifd_off:ifd_off + 2])
    tags = {}
    for k in range(n_entries):
        pos = ifd_off + 2 + 12 * k
        if pos + 12 > len(data):
            raise BadTiff("truncated IFD")
        tag, typ, cnt = struct.unpack(e + "HHI", data[pos:pos + 8])
        size = _TYPE_SIZE.get(typ, 1) * cnt
        if size <= 4:
            raw = data[pos + 8:pos + 12][:size]
        else:
            (off,) = struct.unpack(e + "I", data[pos + 8:pos + 12])
            raw = data[off:off + size]
            if len(raw) < size:
                raise BadTiff(f"tag {tag} value out of range")
        if typ == 3:
            if len(raw) < 2 * cnt:
                raise BadTiff(f"tag {tag} SHORT array truncated")
            vals = struct.unpack(e + "H" * cnt, raw)
        elif typ == 4:
            if len(raw) < 4 * cnt:
                raise BadTiff(f"tag {tag} LONG array truncated")
            vals = struct.unpack(e + "I" * cnt, raw)
        elif typ == 1:
            vals = tuple(raw)
        else:
            vals = raw
        tags[tag] = vals
    tail = ifd_off + 2 + 12 * n_entries
    if tail + 4 > len(data):
        raise BadTiff("truncated next-IFD pointer")
    (nxt,) = struct.unpack(e + "I", data[tail:tail + 4])
    return tags, nxt


def decode_tiff(data: bytes) -> np.ndarray:
    """First IFD of a baseline TIFF → H×W×3 uint8 RGB."""
    return decode_tiff_pages(data, max_pages=1)[0]


def decode_tiff_pages(data: bytes, max_pages: int | None = None
                      ) -> list[np.ndarray]:
    """Walk the IFD chain — the multi-page scanned-document form —
    decoding each page to H×W×3 RGB.  A cycle in the chain (seen in
    corrupt files) terminates the walk rather than looping.
    Untrusted-input bounds: at most 4096 pages and 2^28 total decoded
    pixels — a tiny file chaining thousands of large-page IFDs over
    shared strip data must not accumulate unbounded memory."""
    if data[:2] == b"II" and data[2:4] == b"*\x00":
        e = "<"
    elif data[:2] == b"MM" and data[2:4] == b"\x00*":
        e = ">"
    else:
        raise BadTiff("not a TIFF (bad byte-order header)")
    if len(data) < 8:
        raise BadTiff("truncated header")
    (off,) = struct.unpack(e + "I", data[4:8])
    pages = []
    seen = set()
    total_px = 0
    while off and off not in seen:
        seen.add(off)
        tags, off = _read_ifd_at(data, e, off)
        page = _decode_ifd(data, e, tags)
        total_px += page.shape[0] * page.shape[1]
        if len(pages) >= 4096 or total_px > 1 << 28:
            raise BadTiff("implausible page chain")
        pages.append(page)
        if max_pages is not None and len(pages) >= max_pages:
            break
    if not pages:
        raise BadTiff("empty IFD chain")
    return pages


def _decode_ifd(data: bytes, e: str, tags: dict) -> np.ndarray:

    def one(tag, default=None):
        v = tags.get(tag)
        if v is None:
            if default is None:
                raise BadTiff(f"missing required tag {tag}")
            return default
        return v[0]

    w, h = one(256), one(257)
    if not (0 < w <= 1 << 20 and 0 < h <= 1 << 20):
        raise BadTiff(f"bad dimensions {w}x{h}")
    comp = one(259, 1)
    photo = one(262)
    spp = one(277, 1)
    bps = tags.get(258, (1,))
    rows_per_strip = one(278, h)
    offsets = tags.get(273)
    counts = tags.get(279)
    if offsets is None or counts is None:
        raise BadTiff("missing strip offsets/counts")
    if comp not in (1, 5, 32773):
        raise UnsupportedTiff(
            f"compression {comp} (only none/LZW/PackBits)")
    predictor = one(317, 1)
    if predictor not in (1, 2):
        raise UnsupportedTiff(f"predictor {predictor}")
    if predictor == 2 and (photo == 2 and any(b != 8 for b in bps[:3])
                           or photo != 2 and bps[0] != 8):
        raise UnsupportedTiff("predictor 2 requires 8-bit samples")
    if 322 in tags or 323 in tags:
        raise UnsupportedTiff("tiled TIFF")
    if one(284, 1) != 1:
        raise UnsupportedTiff("planar configuration 2")

    if photo == 2:
        if spp < 3 or any(b != 8 for b in bps[:3]):
            raise UnsupportedTiff("RGB requires 8-bit x >=3 samples")
        depth = 8
    else:
        if spp != 1:
            raise UnsupportedTiff(f"photometric {photo} with spp={spp}")
        depth = bps[0]
        if depth not in (1, 4, 8):
            raise UnsupportedTiff(f"{depth}-bit samples")

    # reassemble the raster strip by strip
    row_bytes = (w * depth * (spp if photo == 2 else 1) + 7) // 8
    raster = bytearray()
    remaining = h
    for off, cnt in zip(offsets, counts):
        nrows = min(rows_per_strip, remaining)
        if nrows <= 0:
            break
        strip = data[off:off + cnt]
        if len(strip) < cnt:
            raise BadTiff("strip out of range")
        if comp == 32773:
            strip = _unpackbits(strip, row_bytes * nrows)
        elif comp == 5:
            strip = _unlzw(strip, row_bytes * nrows)
        elif len(strip) < row_bytes * nrows:
            raise BadTiff("strip shorter than its rows")
        raster += strip[: row_bytes * nrows]
        remaining -= nrows
    if remaining > 0:
        raise BadTiff("strips cover fewer rows than ImageLength")
    raw = np.frombuffer(bytes(raster), dtype=np.uint8).reshape(h, row_bytes)
    if predictor == 2:
        # horizontal differencing: cumulative sum per sample channel
        nch = spp if photo == 2 else 1
        px = raw[:, : w * nch].reshape(h, w, nch)
        raw2 = np.cumsum(px.astype(np.int64), axis=1) % 256
        raw = raw2.astype(np.uint8).reshape(h, w * nch)
        row_bytes = w * nch

    if photo == 2:
        rgb = raw[:, : w * spp].reshape(h, w, spp)[:, :, :3]
        return rgb.copy()
    if depth == 8:
        idx = raw[:, :w]
    elif depth == 4:
        hi, lo = raw >> 4, raw & 15
        idx = np.empty((h, row_bytes * 2), dtype=np.uint8)
        idx[:, 0::2] = hi
        idx[:, 1::2] = lo
        idx = idx[:, :w]
    else:
        idx = np.unpackbits(raw, axis=1)[:, :w]
    if photo == 3:
        cmap = tags.get(320)
        n = 1 << depth
        if cmap is None or len(cmap) < 3 * n:
            raise BadTiff("palette image without a full color map")
        # 16-bit map entries; the spec's canonical 8-bit reduction
        pal = (np.array(cmap[: 3 * n], dtype=np.uint32)
               .reshape(3, n).T >> 8).astype(np.uint8)
        return pal[np.minimum(idx, n - 1)]
    # grayscale: scale to 8-bit, invert for WhiteIsZero (photometric 0)
    if depth == 1:
        g = idx * np.uint8(255)
    elif depth == 4:
        g = (idx * np.uint8(17))
    else:
        g = idx
    if photo == 0:
        g = np.uint8(255) - g
    return np.stack([g, g, g], axis=-1)
