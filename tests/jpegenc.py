"""Minimal baseline JPEG ENCODER — test fixture generator only.

Produces spec-conformant sequential-DCT Huffman streams (ITU-T T.81)
so tests can verify ragflow_ray.parsers.jpegdec against real encoded
bytes without any codec library: all-ones quant tables (so the only
loss is DCT rounding), single-length canonical Huffman tables built
from the stream's own symbol set, optional 4:2:0 subsampling and
restart intervals.  Independent of the decoder except for the shared
public constants (zigzag order, DCT basis) re-derived here.
"""

from __future__ import annotations

import struct

import numpy as np

_ZIGZAG = np.array([
    0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], dtype=np.int64)

_B = np.zeros((8, 8))
for _u in range(8):
    _c = np.sqrt(0.125) if _u == 0 else 0.5
    for _x in range(8):
        _B[_u, _x] = _c * np.cos((2 * _x + 1) * _u * np.pi / 16)


def _zigzagged(block: np.ndarray) -> np.ndarray:
    """Forward orthonormal DCT of one level-shifted 8x8 block, all-ones
    quantization (round to int), in zigzag order."""
    coef = _B @ (block - 128.0) @ _B.T
    q = np.rint(coef).astype(np.int64)
    return q.ravel()[_ZIGZAG]


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, bits: int, length: int) -> None:
        self.acc = (self.acc << length) | (bits & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            byte = (self.acc >> self.n) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)  # 1-bits padding


def _category(v: int) -> tuple[int, int]:
    """(size, appended bits) for a DC diff / AC coefficient."""
    s = int(abs(v)).bit_length()
    bits = v if v >= 0 else v + (1 << s) - 1
    return s, bits


def _make_table(symbols: set[int]) -> tuple[list[int], bytes, dict]:
    """Single-length canonical Huffman table over ``symbols``."""
    syms = sorted(symbols)
    L = 1
    while (1 << L) - 1 < len(syms):
        L += 1
    counts = [0] * 16
    counts[L - 1] = len(syms)
    codes = {s: (L, i) for i, s in enumerate(syms)}
    return counts, bytes(syms), codes


def _to_ycbcr(rgb: np.ndarray) -> list[np.ndarray]:
    r, g, b = (rgb[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return [y, cb, cr]


def _pad(plane: np.ndarray, mult_y: int, mult_x: int) -> np.ndarray:
    h, w = plane.shape
    ph = (-h) % mult_y
    pw = (-w) % mult_x
    return np.pad(plane, ((0, ph), (0, pw)), mode="edge")


def encode_jpeg(img: np.ndarray, subsample_420: bool = False,
                dri: int = 0, qt16bit: bool = False) -> bytes:
    """Encode ``img`` (HxW grayscale or HxWx3 RGB uint8) as baseline
    JPEG with all-ones quant tables."""
    gray = img.ndim == 2
    H, W = img.shape[:2]
    if gray:
        planes = [img.astype(np.float64)]
        samp = [(1, 1)]
    else:
        planes = _to_ycbcr(img)
        if subsample_420:
            samp = [(2, 2), (1, 1), (1, 1)]
            for ci in (1, 2):
                p = _pad(planes[ci], 2, 2)
                planes[ci] = p.reshape(p.shape[0] // 2, 2,
                                       p.shape[1] // 2, 2).mean((1, 3))
        else:
            samp = [(1, 1)] * 3
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-W // (8 * hmax))
    mcuy = -(-H // (8 * vmax))
    for ci, (ch, cv) in enumerate(samp):
        planes[ci] = _pad(planes[ci], mcuy * cv * 8, mcux * ch * 8)

    # walk MCUs once to gather blocks (zigzag coefficient vectors)
    mcu_blocks: list[list[np.ndarray]] = []  # per MCU: blocks in order
    for mcu in range(mcux * mcuy):
        my, mx = divmod(mcu, mcux)
        blocks = []
        for ci, (ch, cv) in enumerate(samp):
            for v in range(cv):
                for hh in range(ch):
                    by, bx = my * cv + v, mx * ch + hh
                    blk = planes[ci][by * 8 : by * 8 + 8,
                                     bx * 8 : bx * 8 + 8]
                    blocks.append(_zigzagged(blk))
        mcu_blocks.append(blocks)

    # symbol pass: with restarts, DC preds reset per interval
    def dc_ac_symbols():
        dc_syms: set[int] = set()
        ac_syms: set[int] = set()
        preds = [0] * len(samp)
        comp_of_block = []
        for ci, (ch, cv) in enumerate(samp):
            comp_of_block += [ci] * (ch * cv)
        for mcu, blocks in enumerate(mcu_blocks):
            if dri and mcu and mcu % dri == 0:
                preds = [0] * len(samp)
            for bi, blk in enumerate(blocks):
                ci = comp_of_block[bi]
                diff = int(blk[0]) - preds[ci]
                preds[ci] = int(blk[0])
                dc_syms.add(_category(diff)[0])
                k, run = 1, 0
                while k < 64:
                    v = int(blk[k])
                    if v == 0:
                        run += 1
                    else:
                        while run > 15:
                            ac_syms.add(0xF0)
                            run -= 16
                        s, _ = _category(v)
                        ac_syms.add((run << 4) | s)
                        run = 0
                    k += 1
                if run:
                    ac_syms.add(0x00)  # EOB
        # EOB must always be encodable (uniform images need it)
        ac_syms.add(0x00)
        return dc_syms, ac_syms

    dc_syms, ac_syms = dc_ac_symbols()
    dc_counts, dc_symbytes, dc_codes = _make_table(dc_syms)
    ac_counts, ac_symbytes, ac_codes = _make_table(ac_syms)

    # entropy pass
    writer = _BitWriter()
    chunks: list[bytes] = []
    preds = [0] * len(samp)
    comp_of_block = []
    for ci, (ch, cv) in enumerate(samp):
        comp_of_block += [ci] * (ch * cv)
    rst = 0
    for mcu, blocks in enumerate(mcu_blocks):
        if dri and mcu and mcu % dri == 0:
            writer.flush()
            chunks.append(bytes(writer.out))
            chunks.append(bytes([0xFF, 0xD0 + rst]))
            rst = (rst + 1) & 7
            writer = _BitWriter()
            preds = [0] * len(samp)
        for bi, blk in enumerate(blocks):
            ci = comp_of_block[bi]
            diff = int(blk[0]) - preds[ci]
            preds[ci] = int(blk[0])
            s, bits = _category(diff)
            cl, code = dc_codes[s]
            writer.put(code, cl)
            if s:
                writer.put(bits, s)
            k, run = 1, 0
            while k < 64:
                v = int(blk[k])
                if v == 0:
                    run += 1
                else:
                    while run > 15:
                        cl, code = ac_codes[0xF0]
                        writer.put(code, cl)
                        run -= 16
                    s, bits = _category(v)
                    cl, code = ac_codes[(run << 4) | s]
                    writer.put(code, cl)
                    writer.put(bits, s)
                    run = 0
                k += 1
            if run:
                cl, code = ac_codes[0x00]
                writer.put(code, cl)
    writer.flush()
    chunks.append(bytes(writer.out))
    entropy = b"".join(chunks)

    # containers
    out = bytearray(b"\xff\xd8")
    if qt16bit:
        dqt = bytes([0x10]) + struct.pack(">64H", *([1] * 64))
    else:
        dqt = bytes([0x00]) + bytes([1] * 64)
    out += b"\xff\xdb" + struct.pack(">H", 2 + len(dqt)) + dqt
    ncomp = len(samp)
    sof = bytes([8]) + struct.pack(">HH", H, W) + bytes([ncomp])
    for ci, (ch, cv) in enumerate(samp):
        sof += bytes([ci + 1, (ch << 4) | cv, 0])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    dht = (bytes([0x00]) + bytes(dc_counts) + dc_symbytes
           + bytes([0x10]) + bytes(ac_counts) + ac_symbytes)
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht
    if dri:
        out += b"\xff\xdd" + struct.pack(">HH", 4, dri)
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00])  # DC table 0, AC table 0
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    out += entropy + b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# progressive (SOF2) encoder — spectral selection + successive
# approximation, cross-block EOB runs, buffered correction bits
# ---------------------------------------------------------------------------

class _Emitter:
    """Two-pass scan emitter: pass 1 (codes=None) collects the Huffman
    symbol set; pass 2 writes bits with the built table."""

    def __init__(self, codes=None):
        self.syms: set[int] = set()
        self.codes = codes
        self.writer = _BitWriter() if codes is not None else None
        self.chunks: list[bytes] = []
        self.rst = 0

    def symbol(self, s: int) -> None:
        if self.codes is None:
            self.syms.add(s)
        else:
            cl, code = self.codes[s]
            self.writer.put(code, cl)

    def bits(self, v: int, n: int) -> None:
        if self.codes is not None and n:
            self.writer.put(v, n)

    def restart(self) -> None:
        if self.codes is not None:
            self.writer.flush()
            self.chunks.append(bytes(self.writer.out))
            self.chunks.append(bytes([0xFF, 0xD0 + self.rst]))
            self.rst = (self.rst + 1) & 7
            self.writer = _BitWriter()

    def finish(self) -> bytes:
        if self.codes is None:
            return b""
        self.writer.flush()
        self.chunks.append(bytes(self.writer.out))
        return b"".join(self.chunks)


def _dc_first_emit(em, units, al, dri):
    preds: dict[int, int] = {}
    for u, blocks in enumerate(units):
        if dri and u and u % dri == 0:
            em.restart()
            preds = {}
        for ci, c in blocks:
            v = int(c) >> al  # DC point transform: arithmetic shift
            diff = v - preds.get(ci, 0)
            preds[ci] = v
            s, bits = _category(diff)
            em.symbol(s)
            em.bits(bits, s)


def _dc_refine_emit(em, units, al, dri):
    for u, blocks in enumerate(units):
        if dri and u and u % dri == 0:
            em.restart()
        for _ci, c in blocks:
            em.bits((int(c) >> al) & 1, 1)


def _ac_first_emit(em, band_blocks, al, dri):
    eobrun = 0

    def flush():
        nonlocal eobrun
        if eobrun:
            r = eobrun.bit_length() - 1
            em.symbol(r << 4)
            em.bits(eobrun - (1 << r), r)
            eobrun = 0

    for u, band in enumerate(band_blocks):
        if dri and u and u % dri == 0:
            flush()
            em.restart()
        # AC point transform: magnitude shift (toward zero)
        vals = [(-((-int(c)) >> al) if c < 0 else int(c) >> al)
                for c in band]
        nz = [k for k, v in enumerate(vals) if v]
        if not nz:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush()
            continue
        flush()
        run = 0
        for k in range(nz[-1] + 1):
            v = vals[k]
            if v == 0:
                run += 1
                continue
            while run > 15:
                em.symbol(0xF0)
                run -= 16
            s, bits = _category(v)
            em.symbol((run << 4) | s)
            em.bits(bits, s)
            run = 0
        if nz[-1] < len(vals) - 1:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush()
    flush()


def _ac_refine_emit(em, band_blocks, al, dri):
    eobrun = 0
    pending: list[int] = []  # correction bits buffered under the run

    def flush():
        nonlocal eobrun, pending
        if eobrun:
            r = eobrun.bit_length() - 1
            em.symbol(r << 4)
            em.bits(eobrun - (1 << r), r)
            eobrun = 0
        for b in pending:
            em.bits(b, 1)
        pending = []

    for u, band in enumerate(band_blocks):
        if dri and u and u % dri == 0:
            flush()
            em.restart()
        absv = [abs(int(c)) >> al for c in band]
        neg = [c < 0 for c in band]
        eob = -1
        for k, t in enumerate(absv):
            if t == 1:
                eob = k
        r = 0
        br: list[int] = []
        k = 0
        while k < len(absv):
            t = absv[k]
            if t == 0:
                r += 1
                k += 1
                continue
            while r > 15 and k <= eob:
                flush()
                em.symbol(0xF0)
                r -= 16
                for b in br:
                    em.bits(b, 1)
                br = []
            if t > 1:  # already-significant: buffer its correction bit
                br.append(t & 1)
                k += 1
                continue
            flush()
            em.symbol((r << 4) | 1)
            em.bits(0 if neg[k] else 1, 1)
            for b in br:
                em.bits(b, 1)
            br = []
            r = 0
            k += 1
        if r > 0 or br:
            eobrun += 1
            pending.extend(br)
            if eobrun == 0x7FFF:
                flush()
    flush()


def encode_progressive_jpeg(img: np.ndarray, scans=None, dri: int = 0,
                            subsample_420: bool = False) -> bytes:
    """Encode as progressive (SOF2) JPEG with all-ones quant tables.

    ``scans``: list of ``(comp_indices, Ss, Se, Ah, Al)``; the default
    script exercises every kernel — interleaved DC first with
    successive approximation, split spectral bands, AC refinement,
    DC refinement.
    """
    gray = img.ndim == 2
    H, W = img.shape[:2]
    if gray:
        planes = [img.astype(np.float64)]
        samp = [(1, 1)]
    else:
        planes = _to_ycbcr(img)
        if subsample_420:
            samp = [(2, 2), (1, 1), (1, 1)]
            for ci in (1, 2):
                p = _pad(planes[ci], 2, 2)
                planes[ci] = p.reshape(p.shape[0] // 2, 2,
                                       p.shape[1] // 2, 2).mean((1, 3))
        else:
            samp = [(1, 1)] * 3
    ncomp = len(samp)
    allc = list(range(ncomp))
    if scans is None:
        scans = ([(allc, 0, 0, 0, 1)]
                 + [([c], 1, 5, 0, 1) for c in allc]
                 + [([c], 6, 63, 0, 1) for c in allc]
                 + [([c], 1, 5, 1, 0) for c in allc]
                 + [(allc, 0, 0, 1, 0)]
                 + [([c], 6, 63, 1, 0) for c in allc])
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-W // (8 * hmax))
    mcuy = -(-H // (8 * vmax))

    coefs = []  # per comp: (by, bx, 64) zigzag ints over the padded grid
    for ci, (ch, cv) in enumerate(samp):
        p = _pad(planes[ci], mcuy * cv * 8, mcux * ch * 8)
        by, bx = p.shape[0] // 8, p.shape[1] // 8
        grid = np.zeros((by, bx, 64), dtype=np.int64)
        for yy in range(by):
            for xx in range(bx):
                grid[yy, xx] = _zigzagged(p[yy * 8:yy * 8 + 8,
                                            xx * 8:xx * 8 + 8])
        coefs.append(grid)

    def scan_units(comp_list, is_dc):
        if len(comp_list) > 1:
            units = []
            for mcu in range(mcux * mcuy):
                my, mx = divmod(mcu, mcux)
                blocks = []
                for ci in comp_list:
                    ch, cv = samp[ci]
                    for v in range(cv):
                        for hh in range(ch):
                            blocks.append((ci, my * cv + v, mx * ch + hh))
                units.append(blocks)
            return units
        ci = comp_list[0]
        ch, cv = samp[ci]
        bw = -(- -(-(W * ch) // hmax) // 8)
        bh = -(- -(-(H * cv) // vmax) // 8)
        return [[(ci, yy, xx)] for yy in range(bh) for xx in range(bw)]

    out = bytearray(b"\xff\xd8")
    dqt = bytes([0x00]) + bytes([1] * 64)
    out += b"\xff\xdb" + struct.pack(">H", 2 + len(dqt)) + dqt
    sof = bytes([8]) + struct.pack(">HH", H, W) + bytes([ncomp])
    for ci, (ch, cv) in enumerate(samp):
        sof += bytes([ci + 1, (ch << 4) | cv, 0])
    out += b"\xff\xc2" + struct.pack(">H", 2 + len(sof)) + sof
    if dri:
        out += b"\xff\xdd" + struct.pack(">HH", 4, dri)

    for comp_list, ss, se, ah, al in scans:
        is_dc = ss == 0
        units = scan_units(comp_list, is_dc)

        def run(em):
            if is_dc:
                flat = [[(ci, coefs[ci][by, bx, 0]) for ci, by, bx in u]
                        for u in units]
                if ah == 0:
                    _dc_first_emit(em, flat, al, dri)
                else:
                    _dc_refine_emit(em, flat, al, dri)
            else:
                bands = [coefs[u[0][0]][u[0][1], u[0][2], ss:se + 1]
                         for u in units]
                if ah == 0:
                    _ac_first_emit(em, bands, al, dri)
                else:
                    _ac_refine_emit(em, bands, al, dri)

        collector = _Emitter()
        run(collector)
        entropy = b""
        table_needed = bool(collector.syms)
        if table_needed:
            counts, symbytes, codes = _make_table(collector.syms)
            tc = 0 if is_dc else 1
            dht = bytes([(tc << 4) | 0]) + bytes(counts) + symbytes
            out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht
            emitter = _Emitter(codes)
        else:  # DC refinement: raw bits only, no Huffman table
            emitter = _Emitter({})
        run(emitter)
        entropy = emitter.finish()

        sos = bytes([len(comp_list)])
        for ci in comp_list:
            sos += bytes([ci + 1, 0x00])
        sos += bytes([ss, se, (ah << 4) | al])
        out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
        out += entropy
    return bytes(out + b"\xff\xd9")
