"""From-scratch baseline JPEG (SOF0/SOF1) decoder.

Implements the sequential-DCT Huffman path of the public JPEG spec
(ITU-T T.81 / ISO 10918-1): marker parse → DQT/DHT/SOF/SOS → entropy
decode (DC prediction, AC run-length, byte unstuffing, RSTn restarts)
→ dequantize → 8×8 IDCT → chroma upsampling → JFIF YCbCr→RGB.  This
gives the multimodal stages REAL pixel content for the embedded
DCTDecode figures that parsers/pdfbytes.py surfaces (the reference
rasterizes figures via pdfplumber, deepdoc/parser/pdf_parser.py:
856-866; no codec library exists in this container, hence this
module).

Scope (documented): baseline + extended-sequential Huffman (SOF0/1),
8-bit precision, grayscale and 3-component YCbCr, sampling factors
1-4, 8/16-bit quant tables, restart intervals.  Out of scope —
progressive (SOF2), arithmetic coding, 12-bit, CMYK — raises
``UnsupportedJpeg`` so callers can degrade to the digest stand-in.

Per-pixel work is numpy (vectorized IDCT over all blocks at once,
array upsampling); only the entropy decode walks bits in Python,
which is unavoidable without a codec library and is bounded by the
compressed byte count.
"""

from __future__ import annotations

import struct

import numpy as np


class UnsupportedJpeg(ValueError):
    """Well-formed JPEG outside the baseline subset."""


class BadJpeg(ValueError):
    """Malformed / truncated JPEG data."""


_ZIGZAG = np.array([
    0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], dtype=np.int64)

# orthonormal 8-point DCT-II basis: IDCT(block) = B.T @ block @ B
_BASIS = np.zeros((8, 8))
for _u in range(8):
    _c = np.sqrt(0.125) if _u == 0 else 0.5
    for _x in range(8):
        _BASIS[_u, _x] = _c * np.cos((2 * _x + 1) * _u * np.pi / 16)


class _HuffTable:
    """Canonical Huffman decode table from a DHT segment (16 counts +
    symbols), decoded MSB-first by (length, code) lookup."""

    def __init__(self, counts: list[int], symbols: bytes) -> None:
        self.lut: dict[tuple[int, int], int] = {}
        code, k = 0, 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                self.lut[(length, code)] = symbols[k]
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over one entropy-coded interval (already
    unstuffed)."""

    __slots__ = ("data", "pos", "bits", "nbits")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.bits = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos < len(self.data):
            self.bits = (self.bits << 8) | self.data[self.pos]
            self.pos += 1
            self.nbits += 8
        else:
            # past the end: pad with 1s (spec: the last byte's unused
            # bits are padding; a conforming stream never *needs* them)
            self.bits = (self.bits << 8) | 0xFF
            self.nbits += 8

    def read(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        out = (self.bits >> self.nbits) & ((1 << n) - 1)
        self.bits &= (1 << self.nbits) - 1
        return out

    def huff(self, table: _HuffTable) -> int:
        length, code = 0, 0
        for _ in range(16):
            code = (code << 1) | self.read(1)
            length += 1
            sym = table.lut.get((length, code))
            if sym is not None:
                return sym
        raise BadJpeg("invalid Huffman code")


def _extend(bits: int, size: int) -> int:
    """T.81 EXTEND: map the ``size``-bit magnitude code to its signed
    value."""
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


def _split_entropy(data: bytes, start: int) -> tuple[list[bytes], int]:
    """Unstuff (drop 0x00 after 0xFF) and split the scan at RSTn
    markers; → (intervals, offset of the terminating marker)."""
    intervals: list[bytearray] = [bytearray()]
    i = start
    n = len(data)
    while i < n:
        b = data[i]
        if b != 0xFF:
            intervals[-1].append(b)
            i += 1
            continue
        if i + 1 >= n:
            break
        m = data[i + 1]
        if m == 0x00:
            intervals[-1].append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:  # RSTn
            intervals.append(bytearray())
            i += 2
        else:  # real marker: scan over
            return [bytes(x) for x in intervals], i
    return [bytes(x) for x in intervals], n


def decode_baseline_jpeg(data: bytes) -> np.ndarray:
    """Decode ``data`` to an H×W×3 uint8 RGB array (grayscale images
    replicate their single channel)."""
    if data[:2] != b"\xff\xd8":
        raise BadJpeg("missing SOI")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffTable] = {}  # (class, id)
    dri = 0
    frame = None  # (H, W, comps) ; comps = [(cid, h, v, tq)]
    i = 2
    n = len(data)
    while i < n:
        if data[i] != 0xFF:
            i += 1
            continue
        marker = data[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xD9:  # EOI
            raise BadJpeg("EOI before SOS")
        (seglen,) = struct.unpack(">H", data[i + 2 : i + 4])
        seg = data[i + 4 : i + 2 + seglen]
        if marker == 0xDB:  # DQT
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 15
                j += 1
                if pq == 0:
                    tbl = np.frombuffer(seg[j : j + 64], dtype=np.uint8)
                    j += 64
                else:
                    tbl = np.frombuffer(seg[j : j + 128],
                                        dtype=">u2")
                    j += 128
                qt[tq] = tbl.astype(np.int64)
        elif marker == 0xC4:  # DHT
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 15
                counts = list(seg[j + 1 : j + 17])
                nsym = sum(counts)
                syms = seg[j + 17 : j + 17 + nsym]
                huff[(tc, th)] = _HuffTable(counts, syms)
                j += 17 + nsym
        elif marker in (0xC0, 0xC1):  # SOF0 / SOF1
            prec = seg[0]
            if prec != 8:
                raise UnsupportedJpeg(f"{prec}-bit precision")
            h, w = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            if ncomp not in (1, 3):
                raise UnsupportedJpeg(f"{ncomp}-component image")
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 15, tq))
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise UnsupportedJpeg(f"SOF{marker - 0xC0} coding process")
        elif marker == 0xDD:  # DRI
            (dri,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise BadJpeg("SOS before SOF")
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs, tds = seg[1 + 2 * c], seg[2 + 2 * c]
                scan.append((cs, tds >> 4, tds & 15))
            return _decode_scan(data, i + 2 + seglen, frame, scan,
                                qt, huff, dri)
        i += 2 + seglen
    raise BadJpeg("no SOS marker")


def _decode_scan(data, start, frame, scan, qt, huff, dri):
    H, W, comps = frame
    if H == 0 or W == 0:
        raise BadJpeg("zero dimension")
    if len(scan) != len(comps):
        raise UnsupportedJpeg("multi-scan (non-interleaved) stream")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if hmax < 1 or vmax < 1 or hmax > 4 or vmax > 4:
        raise BadJpeg("bad sampling factors")
    if any(hmax % c[1] or vmax % c[2] for c in comps):
        raise UnsupportedJpeg("non-integer chroma upsampling ratio")
    mcux = -(-W // (8 * hmax))
    mcuy = -(-H // (8 * vmax))

    by_cid = {c[0]: c for c in comps}
    order = []  # (comp index, h, v, qtable, dc table, ac table)
    for k, (cs, td, ta) in enumerate(scan):
        if cs not in by_cid:
            raise BadJpeg("scan references unknown component")
        cid, ch, cv, tq = by_cid[cs]
        if tq not in qt or (0, td) not in huff or (1, ta) not in huff:
            raise BadJpeg("missing table")
        order.append((k, ch, cv, qt[tq], huff[(0, td)], huff[(1, ta)]))

    intervals, _end = _split_entropy(data, start)
    # per component: coefficient array (blocks_y, blocks_x, 64)
    planes = [np.zeros((mcuy * cv * 8, mcux * ch * 8), dtype=np.float64)
              for _k, ch, cv, _q, _d, _a in order]
    coefs = [[] for _ in order]          # flat zigzag blocks, MCU order
    reader = _BitReader(intervals[0])
    interval_idx = 0
    preds = [0] * len(order)
    for mcu in range(mcux * mcuy):
        if dri and mcu and mcu % dri == 0:
            interval_idx += 1
            if interval_idx >= len(intervals):
                raise BadJpeg("missing restart interval")
            reader = _BitReader(intervals[interval_idx])
            preds = [0] * len(order)
        for ci, (_k, ch, cv, q, dc_t, ac_t) in enumerate(order):
            for _b in range(ch * cv):
                blk = np.zeros(64, dtype=np.int64)
                t = reader.huff(dc_t)
                if t > 11:
                    raise BadJpeg("bad DC size")
                preds[ci] += _extend(reader.read(t), t)
                blk[0] = preds[ci]
                k = 1
                while k < 64:
                    rs = reader.huff(ac_t)
                    r, s = rs >> 4, rs & 15
                    if s == 0:
                        if r == 15:
                            k += 16
                            continue
                        break  # EOB
                    k += r
                    if k > 63:
                        raise BadJpeg("AC run past block end")
                    blk[k] = _extend(reader.read(s), s)
                    k += 1
                coefs[ci].append(blk * q)

    # vectorized dequant+IDCT per component, then place blocks
    out_planes = []
    for ci, (_k, ch, cv, _q, _d, _a) in enumerate(order):
        arr = np.stack(coefs[ci]).astype(np.float64)  # (nblk, 64) zigzag
        dez = np.zeros_like(arr)
        dez[:, _ZIGZAG] = arr
        blocks = dez.reshape(-1, 8, 8)
        pix = np.einsum("ux,nuv,vy->nxy", _BASIS, blocks, _BASIS) + 128.0
        plane = planes[ci]
        bi = 0
        for mcu in range(mcux * mcuy):
            my, mx = divmod(mcu, mcux)
            for v in range(cv):
                for hh in range(ch):
                    by = my * cv + v
                    bx = mx * ch + hh
                    plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = \
                        pix[bi]
                    bi += 1
        # upsample to full MCU-grid resolution and crop to (H, W)
        plane = np.repeat(np.repeat(plane, vmax // cv, axis=0),
                          hmax // ch, axis=1)
        out_planes.append(plane[:H, :W])

    if len(out_planes) == 1:
        y = np.clip(np.rint(out_planes[0]), 0, 255).astype(np.uint8)
        return np.stack([y, y, y], axis=2)
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)
