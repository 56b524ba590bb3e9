"""From-scratch GIF (87a/89a) decoder.

Implements the still-image path of the public GIF specification
(CompuServe GIF89a, W3C archive): header + logical screen descriptor
→ global/local color tables → extension blocks (graphic control:
transparency) → image descriptor → variable-width LSB-first LZW
(clear/end codes, dictionary growth to 4096, deferred clear) →
optional 4-pass interlace reorder → palette map → RGB.  Companion to
``parsers/jpegdec.py`` / ``parsers/pngdec.py``: the third image codec
behind ``ops/multimodal.decode_image``.

Note the LZW here is a DIFFERENT variant from the PDF LZWDecode filter
already implemented in ``parsers/pdfbytes.py``: GIF packs codes
LSB-first with an image-defined minimum code size and 255-byte
sub-block framing, PDF packs MSB-first with a fixed 8-bit alphabet
and an early-change default.

Scope (documented): full frame walk of still AND animated files via
``decode_gif_frames`` — GCE disposal methods 0–3, per-frame delays,
the NETSCAPE loop count, global and local color tables, interlace,
transparency (composited over the persistent canvas; the uncovered
canvas is white, same convention as the PNG path), frames smaller
than the logical screen composited in place.  ``decode_gif`` keeps
its original first-frame contract for the still-image call sites.

The LZW decode walks codes in Python (sequentially dependent by
construction, bounded by the compressed byte count); everything after
the index stream is whole-image numpy.
"""

from __future__ import annotations

import numpy as np


class BadGif(ValueError):
    """Malformed / truncated GIF data."""


def _subblocks(data: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate 255-byte-framed sub-blocks starting at ``pos``;
    → (payload, position after the 0x00 terminator)."""
    out = bytearray()
    n = len(data)
    while True:
        if pos >= n:
            raise BadGif("truncated sub-block chain")
        size = data[pos]
        pos += 1
        if size == 0:
            return bytes(out), pos
        if pos + size > n:
            raise BadGif("truncated sub-block")
        out += data[pos:pos + size]
        pos += size


class _LsbReader:
    """LSB-first bit reader over the concatenated LZW payload."""

    __slots__ = ("data", "pos", "acc", "nbits")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read(self, n: int) -> int | None:
        while self.nbits < n:
            if self.pos >= len(self.data):
                return None  # stream exhausted (tolerated: see KAT)
            self.acc |= self.data[self.pos] << self.nbits
            self.pos += 1
            self.nbits += 8
        out = self.acc & ((1 << n) - 1)
        self.acc >>= n
        self.nbits -= n
        return out


def _lzw_decode(payload: bytes, min_code: int, npix: int) -> np.ndarray:
    """GIF-variant LZW → uint8 index array of length ``npix``.

    Tolerates a missing explicit end code once ``npix`` indices have
    been produced (common in minimal in-the-wild files)."""
    if not 2 <= min_code <= 11:
        raise BadGif(f"LZW minimum code size {min_code}")
    clear = 1 << min_code
    end = clear + 1
    reader = _LsbReader(payload)
    out = bytearray()
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    width = min_code + 1
    prev: bytes | None = None
    while len(out) < npix:
        code = reader.read(width)
        if code is None:
            break
        if code == clear:
            table = list(base)
            width = min_code + 1
            prev = None
            continue
        if code == end:
            break
        if code < len(table) and (code < clear or code > end):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise BadGif("LZW code out of sequence")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
        prev = entry
        # widen when the NEXT assignable code would not fit
        if len(table) == (1 << width) and width < 12:
            width += 1
    if len(out) < npix:
        raise BadGif("LZW stream shorter than the image")
    return np.frombuffer(bytes(out[:npix]), dtype=np.uint8)


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(data: bytes) -> np.ndarray:
    """GIF bytes → HxWx3 uint8 RGB of the logical screen (first
    frame; transparency and uncovered canvas render white)."""
    _meta, frames = decode_gif_frames(data, max_frames=1)
    return frames[0]


def decode_gif_frames(data: bytes, max_frames: int | None = None
                      ) -> tuple[dict, list[np.ndarray]]:
    """Full animated-GIF walk → ({"width", "height", "n_frames",
    "delay_total_cs", "loop_count"}, composited RGB frames).

    Each returned frame is the logical screen AS DISPLAYED at that
    step: frames composite onto a persistent canvas (transparent
    pixels show what is underneath), then the frame's disposal method
    runs — 0/1 leave, 2 restore the background (white, the module's
    canvas convention), 3 restore the pre-frame canvas.  Delays and
    the NETSCAPE loop count come from the graphic-control /
    application extensions; ``max_frames`` stops the walk early (the
    still-image path decodes exactly one frame).  Untrusted-input
    bounds: at most 4096 frames and 2^28 total returned pixels — a
    tiny file declaring a large screen and thousands of 1×1 frames
    must not accumulate hundreds of GB of canvas copies."""
    data = bytes(data)
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise BadGif("missing GIF signature")
    if len(data) < 13:
        raise BadGif("truncated screen descriptor")
    sw = data[6] | (data[7] << 8)
    sh = data[8] | (data[9] << 8)
    flags = data[10]
    if sw == 0 or sh == 0:
        raise BadGif("zero screen dimension")
    if sw * sh > 1 << 26:
        # untrusted input: a 64-megapixel logical screen is outside
        # this corpus's world; refuse before the canvas allocation
        raise BadGif(f"implausible logical screen {sw}x{sh}")
    pos = 13
    gct = None
    if flags & 0x80:
        ngct = 2 << (flags & 7)
        gct = np.frombuffer(data[pos:pos + 3 * ngct], dtype=np.uint8)
        if len(gct) < 3 * ngct:
            raise BadGif("truncated global color table")
        gct = gct.reshape(-1, 3)
        pos += 3 * ngct

    transparent = -1
    disposal = 0
    delay_cs = 0
    delay_total = 0
    loop_count = -1
    canvas = np.full((sh, sw, 3), 255, dtype=np.uint8)
    frames: list[np.ndarray] = []
    n = len(data)
    while pos < n:
        b = data[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            if pos + 2 > n:
                raise BadGif("truncated extension")
            label = data[pos + 1]
            payload, pos = _subblocks(data, pos + 2)
            if label == 0xF9 and len(payload) >= 4:  # graphic control
                disposal = (payload[0] >> 2) & 7
                delay_cs = payload[1] | (payload[2] << 8)
                transparent = payload[3] if payload[0] & 1 else -1
            elif (label == 0xFF and len(payload) >= 14
                  and payload[:11] == b"NETSCAPE2.0"
                  and payload[11] == 1):
                loop_count = payload[12] | (payload[13] << 8)
            continue
        if b == 0x2C:  # image descriptor
            if pos + 10 > n:
                raise BadGif("truncated image descriptor")
            left = data[pos + 1] | (data[pos + 2] << 8)
            top = data[pos + 3] | (data[pos + 4] << 8)
            iw = data[pos + 5] | (data[pos + 6] << 8)
            ih = data[pos + 7] | (data[pos + 8] << 8)
            iflags = data[pos + 9]
            pos += 10
            pal = gct
            if iflags & 0x80:  # local color table
                nlct = 2 << (iflags & 7)
                pal = np.frombuffer(data[pos:pos + 3 * nlct], dtype=np.uint8)
                if len(pal) < 3 * nlct:
                    raise BadGif("truncated local color table")
                pal = pal.reshape(-1, 3)
                pos += 3 * nlct
            if pal is None:
                raise BadGif("image without any color table")
            if iw == 0 or ih == 0 or left + iw > sw or top + ih > sh:
                raise BadGif("frame outside the logical screen")
            if pos >= n:
                raise BadGif("missing LZW minimum code size")
            min_code = data[pos]
            payload, pos = _subblocks(data, pos + 1)
            idx = _lzw_decode(payload, min_code, iw * ih).reshape(ih, iw)
            if iflags & 0x40:  # interlace: rows arrive in 4 passes
                rows = np.concatenate(
                    [np.arange(start, ih, step)
                     for start, step in _INTERLACE_PASSES])
                deinter = np.empty_like(idx)
                deinter[rows] = idx
                idx = deinter
            if int(idx.max()) >= len(pal):
                raise BadGif("palette index out of range")
            rgb = pal[idx].astype(np.uint8)
            before = canvas.copy() if disposal == 3 else None
            region = canvas[top:top + ih, left:left + iw]
            if transparent >= 0:
                keep = (idx == transparent)[..., None]
                region[...] = np.where(keep, region, rgb)
            else:
                region[...] = rgb
            if (len(frames) >= 4096
                    or (len(frames) + 1) * sw * sh > 1 << 28):
                raise BadGif("implausible animation size")
            frames.append(canvas.copy())
            delay_total += delay_cs
            if disposal == 2:
                canvas[top:top + ih, left:left + iw] = 255
            elif disposal == 3:
                canvas = before
            transparent, disposal, delay_cs = -1, 0, 0
            if max_frames is not None and len(frames) >= max_frames:
                break
            continue
        raise BadGif(f"unknown block 0x{b:02x}")
    if not frames:
        raise BadGif("no image data before trailer")
    meta = {"width": sw, "height": sh, "n_frames": len(frames),
            "delay_total_cs": delay_total, "loop_count": loop_count}
    return meta, frames


def gif_gray_header(w: int, h: int) -> bytes:
    """GIF89a header + logical screen + 256-level gray global palette
    — THE byte layout; every writer in the repo must come here."""
    return (b"GIF89a"
            + bytes([w & 255, w >> 8, h & 255, h >> 8, 0x80 | 7, 0, 0])
            + bytes(v for i in range(256) for v in (i, i, i)))


def gce_bytes(delay_cs: int, disposal: int = 0,
              transparent: int | None = None) -> bytes:
    """One graphic-control extension block."""
    flags = (disposal & 7) << 2 | (1 if transparent is not None else 0)
    return bytes([0x21, 0xF9, 4, flags, delay_cs & 255,
                  delay_cs >> 8, transparent or 0, 0])


def _gray_image_block(idx: np.ndarray, delay_cs: int | None = None
                      ) -> bytes:
    """One image block (optional GCE with ``delay_cs``) in the
    literal-code "uncompressed GIF" LZW construction."""
    h, w = idx.shape
    out = bytearray()
    if delay_cs is not None:
        out += gce_bytes(delay_cs)
    out += bytes([0x2C, 0, 0, 0, 0,
                  w & 255, w >> 8, h & 255, h >> 8, 0])
    out.append(8)  # LZW minimum code size → 9-bit literal codes
    acc = nbits = 0
    payload = bytearray()

    def put(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += 9
        while nbits >= 8:
            payload.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    put(256)  # clear
    for i, k in enumerate(map(int, idx.reshape(-1))):
        if i and i % 254 == 0:
            put(256)
        put(k)
    put(257)  # end
    if nbits:
        payload.append(acc & 0xFF)
    for i in range(0, len(payload), 255):
        part = payload[i:i + 255]
        out.append(len(part))
        out += part
    out.append(0)
    return bytes(out)


def encode_gif_gray_animation(frames: list[np.ndarray],
                              delays_cs: list[int]) -> bytes:
    """Animated GIF over the 256-level gray palette: one full-canvas
    image block per frame, each with a GCE carrying its delay (no
    transparency, disposal 0) — the payload form of the oracled
    animated-decode query."""
    if not frames or len(frames) != len(delays_cs):
        raise ValueError("frames/delays mismatch")
    h, w = np.asarray(frames[0]).shape
    out = bytearray(gif_gray_header(w, h))
    for idx, d in zip(frames, delays_cs):
        idx = np.asarray(idx, dtype=np.uint8)
        if idx.shape != (h, w):
            raise ValueError("all frames must fill the canvas")
        out += _gray_image_block(idx, delay_cs=d)
    out.append(0x3B)
    return bytes(out)


def encode_gif_gray(idx: np.ndarray) -> bytes:
    """Minimal GIF writer for in-pipeline payload synthesis
    (oracle-checked real-decode queries; the compressing multi-feature
    encoder that exercises the decoder's subsets is test-side,
    ``tests/gifenc.py``): 256-level gray global palette and
    literal-code LZW — a clear code before every 254th literal keeps
    the dictionary below the first width bump, the classic
    "uncompressed GIF" construction."""
    idx = np.asarray(idx, dtype=np.uint8)
    h, w = idx.shape
    out = bytearray(gif_gray_header(w, h))
    out += _gray_image_block(idx)
    out.append(0x3B)
    return bytes(out)
