"""From-scratch AVI (RIFF) MJPEG container reader + test-payload writer.

The reference pipeline stops at still images (``deepdoc``'s figure
crops, ``rag/app/picture.py``); video ingestion is part of this
engine's beyond-the-reference multimodal surface: a corpus row carries
an opaque ``binary`` AVI payload, an actor-pool stage parses the
container, samples frames at a stride, and decodes each sampled frame
through the from-scratch baseline-JPEG decoder
(:mod:`ragflow_ray.parsers.jpegdec`).

Implemented from the public AVI RIFF specification (Microsoft
"AVI RIFF File Reference" / OpenDML) and ITU-T T.81 for the embedded
frames:

* ``parse_avi_mjpeg``  — walks the RIFF chunk tree, reads the ``avih``
  main header (dimensions, frame count, frame interval), extracts the
  ``00dc`` video chunks — via the ``idx1`` index when present and
  self-consistent, sequential ``movi`` walk otherwise — and returns
  (metadata, list-of-JPEG-byte-strings).
* ``encode_avi_mjpeg`` — the inverse, for payload synthesis and tests.
* ``encode_jpeg_gray_uniform`` — a minimal spec-conformant baseline
  JPEG encoder for UNIFORM grayscale frames (the oracle payloads):
  with all-ones quantization a uniform block is DC-only and the
  decode round-trip is bit-exact, so SQL can recompute the decoded
  pixel value from the digest byte that chose it.

Frame chunk offsets in ``idx1`` are written relative to the first byte
of the ``movi`` fourcc (the common writer convention; the parser also
accepts absolute file offsets, the other convention in the wild).
"""

from __future__ import annotations

import struct

import numpy as np


class BadAvi(ValueError):
    pass


# ---------------------------------------------------------------------------
# minimal uniform-gray baseline JPEG encoder
# ---------------------------------------------------------------------------

def _category(v: int) -> tuple[int, int]:
    """JPEG magnitude category and mantissa bits for ``v``."""
    if v == 0:
        return 0, 0
    a, bits = abs(v), v
    if v < 0:
        bits = v - 1
    n = a.bit_length()
    return n, bits & ((1 << n) - 1)


def _canonical_table(symbols: list[int]) -> tuple[bytes, bytes, dict]:
    """Single-length canonical Huffman table: all ``symbols`` get the
    shortest length L with ``2^L - 1 >= len(symbols)`` (the all-ones
    code stays unused, per the T.81 recommendation)."""
    syms = sorted(set(symbols))
    L = 1
    while (1 << L) - 1 < len(syms):
        L += 1
    counts = bytearray(16)
    counts[L - 1] = len(syms)
    codes = {s: (L, i) for i, s in enumerate(syms)}
    return bytes(counts), bytes(syms), codes


def encode_jpeg_gray_uniform(value: int, width: int = 16,
                             height: int = 16) -> bytes:
    """One real baseline-JPEG stream for a ``height``×``width`` image
    where EVERY pixel is ``value`` (0–255).  All-ones quantization,
    one component, 8×8-multiple dimensions required: each block is
    DC-only, so the decoder reconstructs ``value`` exactly."""
    if not (0 <= value <= 255):
        raise ValueError("pixel value out of range")
    if width % 8 or height % 8:
        raise ValueError("uniform encoder requires 8-multiple dims")
    dc = 8 * (value - 128)  # orthonormal DCT of a uniform block
    cat1, mant = _category(dc)
    dc_counts, dc_syms, dc_codes = _canonical_table([0, cat1])
    ac_counts, ac_syms, ac_codes = _canonical_table([0x00])  # EOB only

    out = bytearray(b"\xff\xd8")                       # SOI
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + b"\x01" * 64
    out += (b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, height, width, 1)
            + bytes([1, 0x11, 0]))                     # SOF0, 1 comp
    out += (b"\xff\xc4" + struct.pack(">H", 3 + 16 + len(dc_syms))
            + b"\x00" + dc_counts + dc_syms)           # DHT DC 0
    out += (b"\xff\xc4" + struct.pack(">H", 3 + 16 + len(ac_syms))
            + b"\x10" + ac_counts + ac_syms)           # DHT AC 0
    out += (b"\xff\xda" + struct.pack(">H", 8)
            + bytes([1, 1, 0x00, 0, 63, 0]))           # SOS

    acc, nbits = 0, 0
    body = bytearray()

    def put(bits: int, length: int) -> None:
        nonlocal acc, nbits
        acc = (acc << length) | (bits & ((1 << length) - 1))
        nbits += length
        while nbits >= 8:
            nbits -= 8
            byte = (acc >> nbits) & 0xFF
            body.append(byte)
            if byte == 0xFF:
                body.append(0x00)
            acc &= (1 << nbits) - 1

    n_blocks = (width // 8) * (height // 8)
    for b in range(n_blocks):
        cat, bits = (cat1, mant) if b == 0 else (0, 0)  # diff-coded DC
        length, code = dc_codes[cat]
        put(code, length)
        if cat:
            put(bits, cat)
        length, code = ac_codes[0x00]
        put(code, length)                               # EOB
    if nbits:
        put((1 << (8 - nbits)) - 1, 8 - nbits)          # 1-pad
    out += body
    out += b"\xff\xd9"                                  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# AVI container writer
# ---------------------------------------------------------------------------

def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(list_type: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", list_type + payload)


def encode_avi_mjpeg(frames: list[bytes], width: int, height: int,
                     fps: int = 10) -> bytes:
    """A real ``RIFF('AVI ')`` container holding ``frames`` (each a
    complete JPEG stream) as ``00dc`` chunks with an ``idx1`` index."""
    us_per_frame = 1_000_000 // fps
    bufsize = max((len(f) for f in frames), default=0)
    avih = struct.pack(
        "<IIIIIIIIIIIIII", us_per_frame, 0, 0, 0x10, len(frames), 0, 1,
        bufsize, width, height, 0, 0, 0, 0)
    strh = (b"vids" + b"MJPG" + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0,
                                            1, fps, 0, len(frames),
                                            bufsize, 10_000, 0)
            + struct.pack("<hhhh", 0, 0, width, height))
    strf = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24,
                       struct.unpack("<I", b"MJPG")[0],
                       width * height * 3, 0, 0, 0, 0)
    hdrl = _list(b"hdrl", _chunk(b"avih", avih)
                 + _list(b"strl", _chunk(b"strh", strh)
                         + _chunk(b"strf", strf)))

    movi_payload = bytearray()
    index = bytearray()
    for f in frames:
        # offset relative to the first byte of the 'movi' fourcc:
        # fourcc itself is 4 bytes, so the first chunk sits at 4
        off = 4 + len(movi_payload)
        index += b"00dc" + struct.pack("<III", 0x10, off, len(f))
        movi_payload += _chunk(b"00dc", f)
    movi = _list(b"movi", bytes(movi_payload))
    body = b"AVI " + hdrl + movi + _chunk(b"idx1", bytes(index))
    return b"RIFF" + struct.pack("<I", len(body)) + body


# ---------------------------------------------------------------------------
# AVI container parser
# ---------------------------------------------------------------------------

def _walk(data: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_size) for each chunk in
    [start, end); LIST chunks yield their list type as fourcc with the
    payload positioned after it."""
    i = start
    while i + 8 <= end:
        fourcc = data[i:i + 4]
        (size,) = struct.unpack("<I", data[i + 4:i + 8])
        payload = i + 8
        if payload + size > end:
            raise BadAvi("chunk overruns container")
        if fourcc == b"LIST":
            yield data[payload:payload + 4], payload + 4, size - 4
        else:
            yield fourcc, payload, size
        i = payload + size + (size & 1)


def parse_avi_mjpeg(data: bytes) -> tuple[dict, list[bytes]]:
    """→ ({"width", "height", "n_frames", "us_per_frame"}, frames).

    Prefers the ``idx1`` index (validating that every entry points at
    a well-formed ``00dc`` header, accepting movi-relative or absolute
    offsets); any inconsistency falls back to the sequential ``movi``
    walk, mirroring how tolerant players treat damaged indexes."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise BadAvi("not a RIFF/AVI container")
    (riff_size,) = struct.unpack("<I", data[4:8])
    end = min(8 + riff_size, len(data))

    meta = {}
    movi_span = None
    idx1 = None
    for fourcc, pos, size in _walk(data, 12, end):
        if fourcc == b"hdrl":
            for f2, p2, s2 in _walk(data, pos, pos + size):
                if f2 == b"avih" and s2 >= 40:
                    v = struct.unpack("<10I", data[p2:p2 + 40])
                    meta = {"us_per_frame": v[0], "n_frames": v[4],
                            "width": v[8], "height": v[9]}
        elif fourcc == b"movi":
            movi_span = (pos, size)
        elif fourcc == b"idx1":
            idx1 = (pos, size)
    if not meta:
        raise BadAvi("missing avih main header")
    if movi_span is None:
        raise BadAvi("missing movi list")

    movi_pos, movi_size = movi_span

    def _via_index() -> list[bytes] | None:
        if idx1 is None:
            return None
        ipos, isize = idx1
        frames = []
        for off in range(ipos, ipos + isize - isize % 16, 16):
            fourcc = data[off:off + 4]
            _, coff, csize = struct.unpack("<III", data[off + 4:off + 16])
            if fourcc != b"00dc":
                continue
            # movi-relative (common) or absolute (also seen in the wild)
            for base in (movi_pos - 4 + coff, coff):
                hdr = data[base:base + 8]
                if (len(hdr) == 8 and hdr[:4] == b"00dc"
                        and struct.unpack("<I", hdr[4:8])[0] == csize
                        and base + 8 + csize <= end):
                    frames.append(data[base + 8:base + 8 + csize])
                    break
            else:
                return None  # inconsistent index → sequential walk
        return frames

    frames = _via_index()
    if frames is None:
        frames = [data[p:p + s]
                  for f, p, s in _walk(data, movi_pos, movi_pos + movi_size)
                  if f == b"00dc"]
    return meta, frames


def decode_avi_gray_means(data: bytes, stride: int = 1) -> dict:
    """Parse + decode every ``stride``-th frame through the real JPEG
    decoder and return integer per-frame means (exact for the uniform
    oracle payloads; floor-division mean otherwise)."""
    from .jpegdec import decode_baseline_jpeg

    meta, frames = parse_avi_mjpeg(data)
    means = []
    for i in range(0, len(frames), stride):
        px = decode_baseline_jpeg(frames[i]).astype(np.int64)
        means.append(int(px.sum() // px.size))
    return {**meta, "n_frames": len(frames), "frame_means": means}
