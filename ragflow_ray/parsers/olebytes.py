"""From-scratch legacy binary Office (.doc/.xls) extraction — stdlib only.

The reference routes ``.doc`` through an external Tika server and
treats every non-empty line of the extracted text as a section
(``rag/app/naive.py:534-545``).  No Tika (or JVM) exists here, so this
module reads the two on-disk formats directly:

* **OLE2 / Compound File Binary** ([MS-CFB]): 512/4096-byte sectors,
  FAT chains assembled from the header DIFAT + chained DIFAT sectors,
  the directory stream's 128-byte entries, and the mini FAT over the
  root entry's mini stream for streams under the 4096-byte cutoff.
* **Excel 97-2003 binary** ([MS-XLS] BIFF8): the ``Workbook`` stream's
  record sequence — BOUNDSHEET positions, the SST shared-string table
  (compressed/UTF-16 strings, rich/ext payload skipping, CONTINUE
  records with per-boundary option-flag bytes), and the cell records
  LABELSST / LABEL / NUMBER / RK / MULRK / BOOLERR / FORMULA(+STRING).
  Output is the same ``[{"name", "rows"}]`` sheet payload the OOXML
  reader produces (officebytes.xlsx_to_sheets), so the excel chunker
  path is shared.  The reference reaches .xls through its
  pandas/xlrd fallback (deepdoc/parser/excel_parser.py:30-65).
* **Word 97-2003 binary** ([MS-DOC]): the ``WordDocument`` stream's
  FIB (wIdent 0xA5EC; fWhichTblStm picking ``1Table`` vs ``0Table``),
  the piece table (Clx → Pcdt → PlcPcd) from the table stream, and
  per-piece text runs — fCompressed pieces are CP1252 bytes at
  ``fc >> 1``, the rest UTF-16LE at ``fc``.  The main-body range is
  the FIB's ``ccpText``; Word's in-text control bytes (paragraph mark
  0x0D, cell mark 0x07, vertical tab 0x0B, page break 0x0C) map to
  newlines, non-breaking/optional hyphens (0x1E/0x1F) to "-"/"",
  and field-control bytes (0x13/0x14/0x15) are dropped.

Subset and degradation contract (same as pdfbytes/officebytes):
encrypted .doc (FIB fEncrypted) and fast-save complexities beyond the
piece table are out of subset; malformed bytes raise ValueError, which
the ingest boundary (sources/ingest.rows_from_files) converts to a
skipped-file row — never a crash, never silent garbage.

Exact Tika parity is NOT a goal (the reference's extraction is
whatever the external server returns); the invariant mirrored from
rag/app/naive.py:534-545 is "extracted text, split on newlines,
non-empty lines become sections", which chunkers/naive.py applies to
``fmt == "doc"`` rows.
"""

from __future__ import annotations

import struct

_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
_ENDOFCHAIN = 0xFFFFFFFE
_FREESECT = 0xFFFFFFFF
_MAX_SECTORS = 1 << 20  # chain-walk bound: 512 MiB of 512-byte sectors


def _u16(b: bytes, at: int) -> int:
    return struct.unpack_from("<H", b, at)[0]


def _u32(b: bytes, at: int) -> int:
    return struct.unpack_from("<I", b, at)[0]


def _sector(blob: bytes, idx: int, size: int) -> bytes:
    at = (idx + 1) * size
    if at + size > len(blob):
        raise ValueError(f"sector {idx} beyond end of file")
    return blob[at : at + size]


def _chain(fat: list[int], start: int) -> list[int]:
    """Follow a FAT chain, bounded against cycles."""
    out: list[int] = []
    cur = start
    while cur not in (_ENDOFCHAIN, _FREESECT) and cur < len(fat):
        out.append(cur)
        if len(out) > _MAX_SECTORS:
            raise ValueError("FAT chain cycle")
        cur = fat[cur]
    return out


def ole_streams(blob: bytes) -> dict[str, bytes]:
    """Compound file → {stream name: bytes} for every stream entry.

    Handles both regular streams (FAT chains) and small streams under
    the mini-stream cutoff (mini FAT over the root entry's storage).
    """
    if len(blob) < 512 or blob[:8] != _MAGIC:
        raise ValueError("not an OLE2 compound file")
    sec_size = 1 << _u16(blob, 30)
    mini_size = 1 << _u16(blob, 32)
    if sec_size not in (512, 4096) or mini_size != 64:
        raise ValueError("unsupported sector geometry")
    mini_cutoff = _u32(blob, 56)

    # FAT sector list: 109 header DIFAT entries, then chained DIFAT
    # sectors (each holds sec_size//4 - 1 entries + a next pointer)
    fat_sectors = [
        _u32(blob, 76 + 4 * i) for i in range(109)
    ]
    difat_cur, difat_n = _u32(blob, 68), _u32(blob, 72)
    seen_difat: set[int] = set()
    # bound by both the declared count and the file's own sector count:
    # difat_n is attacker-controlled and a self-pointing DIFAT sector
    # would otherwise spin forever (the _chain walk has this bound too)
    for _ in range(min(difat_n, len(blob) // sec_size + 1)):
        if difat_cur in (_ENDOFCHAIN, _FREESECT) or difat_cur in seen_difat:
            break
        seen_difat.add(difat_cur)
        sec = _sector(blob, difat_cur, sec_size)
        per = sec_size // 4 - 1
        fat_sectors += [_u32(sec, 4 * i) for i in range(per)]
        difat_cur = _u32(sec, sec_size - 4)
    fat_sectors = [s for s in fat_sectors if s != _FREESECT]

    fat: list[int] = []
    for s in fat_sectors:
        sec = _sector(blob, s, sec_size)
        fat += [_u32(sec, 4 * i) for i in range(sec_size // 4)]

    def read_chain(start: int) -> bytes:
        return b"".join(_sector(blob, s, sec_size) for s in _chain(fat, start))

    # directory entry slots (128 bytes each) across the directory chain;
    # slot index is the id the tree pointers use, so invalid slots stay
    # as None placeholders
    directory = read_chain(_u32(blob, 48))
    slots: list[dict | None] = []
    for at in range(0, len(directory) - 127, 128):
        name_len = _u16(directory, at + 64)
        obj_type = directory[at + 66]
        if obj_type not in (1, 2, 5) or not 2 <= name_len <= 64:
            slots.append(None)
            continue
        slots.append(
            {
                "name": directory[at : at + name_len - 2].decode(
                    "utf-16-le", "replace"
                ),
                "type": obj_type,
                "left": _u32(directory, at + 68),
                "right": _u32(directory, at + 72),
                "child": _u32(directory, at + 76),
                "start": _u32(directory, at + 116),
                "size": _u32(directory, at + 120),
            }
        )

    # ROOT-LEVEL streams only: walk the root entry's child subtree via
    # the left/right sibling pointers, without descending into storage
    # entries' children — an embedded OLE object (ObjectPool/_1234...)
    # carries its own "WordDocument"/"Workbook" streams which must not
    # shadow the document's.  Malformed trees fall back to a flat scan.
    root_idx = next(
        (i for i, s in enumerate(slots) if s and s["type"] == 5), None
    )
    entries: list[dict] = []
    if root_idx is not None:
        stack = [slots[root_idx]["child"]]
        visited: set[int] = set()
        while stack:
            i = stack.pop()
            if i >= len(slots) or i in visited or slots[i] is None:
                continue
            visited.add(i)
            e = slots[i]
            stack += [e["left"], e["right"]]
            if e["type"] == 2:
                entries.append(e)
    if not entries:  # no/garbled tree pointers: degrade to every stream
        entries = [s for s in slots if s and s["type"] == 2]

    # mini FAT + the root entry's mini stream (small-stream storage)
    mini_data = (
        read_chain(slots[root_idx]["start"]) if root_idx is not None else b""
    )
    mini_fat: list[int] = []
    for s in _chain(fat, _u32(blob, 60)):
        sec = _sector(blob, s, sec_size)
        mini_fat += [_u32(sec, 4 * i) for i in range(sec_size // 4)]

    def read_mini_chain(start: int) -> bytes:
        out: list[bytes] = []
        cur = start
        while cur not in (_ENDOFCHAIN, _FREESECT) and cur < len(mini_fat):
            at = cur * mini_size
            out.append(mini_data[at : at + mini_size])
            if len(out) > _MAX_SECTORS:
                raise ValueError("mini FAT chain cycle")
            cur = mini_fat[cur]
        return b"".join(out)

    streams: dict[str, bytes] = {}
    for e in entries:
        raw = (
            read_mini_chain(e["start"])
            if e["size"] < mini_cutoff
            else read_chain(e["start"])
        )
        streams[e["name"]] = raw[: e["size"]]
    return streams


# Word in-text control bytes → the line-oriented form the naive
# chunker sections on (reference splits Tika text on "\n",
# rag/app/naive.py:539)
_CTRL_MAP = {
    0x0D: "\n", 0x07: "\n", 0x0B: "\n", 0x0C: "\n",
    0x1E: "-", 0x1F: "", 0x13: "", 0x14: "", 0x15: "",
    0x01: "", 0x02: "", 0x05: "", 0x08: "",
}


def _clean(text: str) -> str:
    return "".join(_CTRL_MAP.get(ord(c), c) for c in text)


def doc_to_text(blob: bytes) -> str:
    """.doc bytes → extracted main-body text with newline-separated
    paragraphs (the form rag/app/naive.py:534-545 sections on)."""
    streams = ole_streams(blob)
    word = streams.get("WordDocument")
    if word is None or len(word) < 0x01AA:
        raise ValueError("no WordDocument stream")
    if _u16(word, 0) != 0xA5EC:
        raise ValueError("bad FIB wIdent")
    flags = _u16(word, 0x000A)
    if flags & 0x0100:  # fEncrypted — out of subset
        raise ValueError("encrypted .doc")
    table_name = "1Table" if flags & 0x0200 else "0Table"
    table = streams.get(table_name) or streams.get(
        "0Table" if table_name == "1Table" else "1Table"
    )
    if table is None:
        raise ValueError("no table stream")
    ccp_text = _u32(word, 0x004C)
    fc_clx, lcb_clx = _u32(word, 0x01A2), _u32(word, 0x01A6)
    if lcb_clx == 0 or fc_clx + lcb_clx > len(table):
        raise ValueError("piece table out of bounds")
    clx = table[fc_clx : fc_clx + lcb_clx]

    # Clx: Prc blocks (0x01, u16 cb, data) then the Pcdt (0x02, u32 lcb)
    at = 0
    plc = None
    while at < len(clx):
        kind = clx[at]
        if kind == 0x01:
            at += 3 + _u16(clx, at + 1)
        elif kind == 0x02:
            lcb = _u32(clx, at + 1)
            plc = clx[at + 5 : at + 5 + lcb]
            break
        else:
            raise ValueError("malformed Clx")
    if plc is None or len(plc) < 4 or (len(plc) - 4) % 12:
        raise ValueError("malformed PlcPcd")

    n = (len(plc) - 4) // 12
    cps = [_u32(plc, 4 * i) for i in range(n + 1)]
    parts: list[str] = []
    remaining = ccp_text
    for k in range(n):
        if remaining <= 0:
            break
        nchars = min(cps[k + 1] - cps[k], remaining)
        fc_raw = _u32(plc, 4 * (n + 1) + 8 * k + 2)
        if fc_raw & 0x40000000:  # fCompressed: one CP1252 byte per char
            at = fc_raw & 0x3FFFFFFF
            at >>= 1
            parts.append(word[at : at + nchars].decode("cp1252", "replace"))
        else:
            at = fc_raw & 0x3FFFFFFF
            parts.append(
                word[at : at + 2 * nchars].decode("utf-16-le", "replace")
            )
        remaining -= nchars
    return _clean("".join(parts))


# --- Excel 97-2003 (BIFF8) -------------------------------------------------

_XLS_BOF = 0x0809
_XLS_EOF = 0x000A
_XLS_CONTINUE = 0x003C
_XLS_SST = 0x00FC
_XLS_BOUNDSHEET = 0x0085
_XLS_LABELSST = 0x00FD
_XLS_LABEL = 0x0204
_XLS_NUMBER = 0x0203
_XLS_RK = 0x027E
_XLS_MULRK = 0x00BD
_XLS_BOOLERR = 0x0205
_XLS_FORMULA = 0x0006
_XLS_STRING = 0x0207
_XLS_FILEPASS = 0x002F


def _xls_records(data: bytes, at: int):
    """(opcode, payload) records from ``at`` until the substream EOF."""
    while at + 4 <= len(data):
        op, ln = struct.unpack_from("<HH", data, at)
        yield op, data[at + 4 : at + 4 + ln]
        at += 4 + ln
        if op == _XLS_EOF:
            return


def _num(value: float):
    """float → int when integral (matching officebytes._cell_value)."""
    return int(value) if float(value).is_integer() else value


def _rk_value(v: int):
    """RK-packed number: bit0 = ×1/100, bit1 = 30-bit int vs double-high-bits."""
    if v & 2:
        x = v >> 2
        if x & 0x20000000:
            x -= 0x40000000
        val = float(x)
    else:
        val = struct.unpack("<d", struct.pack("<Q", (v & 0xFFFFFFFC) << 32))[0]
    if v & 1:
        val /= 100
    return _num(val)


class _SstCursor:
    """Byte cursor over the SST payload + its CONTINUE payloads.  At a
    chunk boundary inside a string's character run, the next chunk
    begins with a fresh option-flags byte that can switch the run
    between compressed and UTF-16 ([MS-XLS] 2.5.293)."""

    def __init__(self, chunks: list[bytes]):
        self.chunks = chunks
        self.ci = 0
        self.off = 8  # past cstTotal/cstUnique

    def _ensure(self) -> int:
        while self.off >= len(self.chunks[self.ci]):
            self.ci += 1
            self.off = 0
            if self.ci >= len(self.chunks):
                raise ValueError("truncated SST")
        return len(self.chunks[self.ci]) - self.off

    def take(self, n: int) -> bytes:
        """n raw bytes, spanning chunks (headers/counts/skip areas)."""
        out = bytearray()
        while n:
            avail = self._ensure()
            k = min(n, avail)
            out += self.chunks[self.ci][self.off : self.off + k]
            self.off += k
            n -= k
        return bytes(out)

    def chars(self, cch: int, wide: bool) -> str:
        out: list[str] = []
        while cch:
            if self._ensure() == 0:  # pragma: no cover — _ensure raises
                raise ValueError("truncated SST")
            if self.off == 0:  # continuation boundary: new flags byte
                wide = bool(self.chunks[self.ci][0] & 1)
                self.off = 1
                if self._ensure() == 0:
                    continue
            width = 2 if wide else 1
            avail = (len(self.chunks[self.ci]) - self.off) // width
            take = min(cch, avail)
            if take == 0:  # nothing readable before the boundary
                self.off = len(self.chunks[self.ci])
                continue
            raw = self.chunks[self.ci][self.off : self.off + take * width]
            out.append(raw.decode("utf-16-le" if wide else "latin-1"))
            self.off += take * width
            cch -= take
        return "".join(out)


def _parse_sst(chunks: list[bytes]) -> list[str]:
    cur = _SstCursor(chunks)
    unique = _u32(chunks[0], 4)
    strings: list[str] = []
    for _ in range(min(unique, 1 << 22)):
        hdr = cur.take(3)
        cch = hdr[0] | (hdr[1] << 8)
        flags = hdr[2]
        c_run = struct.unpack("<H", cur.take(2))[0] if flags & 8 else 0
        cb_ext = struct.unpack("<I", cur.take(4))[0] if flags & 4 else 0
        strings.append(cur.chars(cch, bool(flags & 1)))
        cur.take(4 * c_run + cb_ext)  # rich runs + ext block
    return strings


def _short_unicode(payload: bytes, at: int) -> str:
    """XLUnicodeString (u16 cch, u8 flags, chars) — LABEL/BOUNDSHEET forms
    pass their own width.  Truncated payloads yield "" (degradation
    contract: malformed records skip, they don't raise IndexError)."""
    if at + 3 > len(payload):
        return ""
    cch = _u16(payload, at)
    wide = payload[at + 2] & 1
    raw = payload[at + 3 : at + 3 + cch * (2 if wide else 1)]
    return raw.decode("utf-16-le" if wide else "latin-1")


def xls_to_sheets(blob: bytes) -> list[dict]:
    """.xls bytes → ``[{"name", "rows"}]`` — the same payload shape as
    officebytes.xlsx_to_sheets, so both route into the excel chunker."""
    streams = ole_streams(blob)
    wb = streams.get("Workbook") or streams.get("Book")
    if wb is None:
        raise ValueError("no Workbook stream")
    if len(wb) < 4 or _u16(wb, 0) != _XLS_BOF:
        raise ValueError("Workbook stream lacks BOF")

    # globals substream: sheet directory + shared strings
    bound: list[tuple[int, str]] = []
    sst_chunks: list[bytes] = []
    in_sst = False
    for op, payload in _xls_records(wb, 0):
        if op == _XLS_FILEPASS:
            raise ValueError("encrypted .xls")
        if op == _XLS_BOUNDSHEET and len(payload) >= 8:
            name_cch = payload[6]
            wide = payload[7] & 1
            raw = payload[8 : 8 + name_cch * (2 if wide else 1)]
            bound.append(
                (_u32(payload, 0), raw.decode("utf-16-le" if wide else "latin-1"))
            )
            in_sst = False
        elif op == _XLS_SST:
            sst_chunks = [payload]
            in_sst = True
        elif op == _XLS_CONTINUE and in_sst:
            sst_chunks.append(payload)
        else:
            in_sst = False
    sst = _parse_sst(sst_chunks) if sst_chunks else []

    sheets: list[dict] = []
    for pos, name in bound:
        if pos + 4 > len(wb) or _u16(wb, pos) != _XLS_BOF:
            continue
        cells: dict[tuple[int, int], object] = {}
        pending_string: tuple[int, int] | None = None
        for op, p in _xls_records(wb, pos):
            if op == _XLS_LABELSST and len(p) >= 10:
                idx = _u32(p, 6)
                cells[(_u16(p, 0), _u16(p, 2))] = (
                    sst[idx] if idx < len(sst) else ""
                )
            elif op == _XLS_LABEL and len(p) >= 9:
                cells[(_u16(p, 0), _u16(p, 2))] = _short_unicode(p, 6)
            elif op == _XLS_NUMBER and len(p) >= 14:
                cells[(_u16(p, 0), _u16(p, 2))] = _num(
                    struct.unpack_from("<d", p, 6)[0]
                )
            elif op == _XLS_RK and len(p) >= 10:
                cells[(_u16(p, 0), _u16(p, 2))] = _rk_value(_u32(p, 6))
            elif op == _XLS_MULRK and len(p) >= 12:
                row, col0 = _u16(p, 0), _u16(p, 2)
                n = (len(p) - 6) // 6
                for i in range(n):
                    cells[(row, col0 + i)] = _rk_value(_u32(p, 4 + 6 * i + 2))
            elif op == _XLS_BOOLERR and len(p) >= 8:
                if p[7] == 0:  # fError unset → boolean
                    cells[(_u16(p, 0), _u16(p, 2))] = "true" if p[6] else "false"
            elif op == _XLS_FORMULA and len(p) >= 14:
                row, col = _u16(p, 0), _u16(p, 2)
                if p[12:14] == b"\xff\xff":  # non-numeric cached result
                    code = p[6]
                    if code == 0:  # string value follows in STRING
                        pending_string = (row, col)
                    elif code == 1:
                        cells[(row, col)] = "true" if p[8] else "false"
                    # code 2 (error) / 3 (empty) → no cell
                else:
                    cells[(row, col)] = _num(struct.unpack_from("<d", p, 6)[0])
            elif op == _XLS_STRING and pending_string is not None:
                cells[pending_string] = _short_unicode(p, 0)
                pending_string = None

        if not cells:
            sheets.append({"name": name, "rows": []})
            continue
        width = max(c for _, c in cells) + 1
        rows = [
            [cells.get((r, c)) for c in range(width)]
            for r in sorted({r for r, _ in cells})
        ]
        sheets.append({"name": name, "rows": rows})
    return sheets


def xls_to_sheets_span(blob: bytes) -> list[dict]:
    """Same span form as officebytes.xlsx_to_sheets_span — both feed
    the excel chunker path untouched."""
    from .officebytes import sheets_span

    return sheets_span(xls_to_sheets(blob))
