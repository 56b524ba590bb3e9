"""From-scratch legacy .doc/.xls extraction (parsers/olebytes.py).

The writers below build real OLE2 compound files byte by byte (header,
DIFAT, FAT chains, directory entries, mini FAT + mini stream) around
hand-assembled Word (FIB + piece table) and Excel (BIFF8 record
stream) binaries, so the extractors are tested against actual on-disk
structure rather than their own assumptions — the same pattern as
test_pdfbytes/test_officebytes.
"""

from __future__ import annotations

import struct

import pytest

from ragflow_ray.parsers.olebytes import doc_to_text, ole_streams

ENDOFCHAIN = 0xFFFFFFFE
FREESECT = 0xFFFFFFFF
FATSECT = 0xFFFFFFFD


def make_cfb(streams: dict[str, bytes],
             embedded: dict[str, bytes] | None = None) -> bytes:
    """Independent compound-file writer: streams ≥4096 bytes go into
    FAT chains, smaller ones into the mini stream via the mini FAT.
    Directory tree pointers are real (root.child → a right-sibling
    chain of the root-level entries); ``embedded`` adds an
    "ObjectPool" storage whose child subtree holds its own streams —
    the embedded-OLE-object layout real .doc files carry."""
    sectors: list[bytes] = []
    chains: dict[int, int] = {}

    def add(data: bytes) -> int:
        k = max(1, (len(data) + 511) // 512)
        first = len(sectors)
        data = data.ljust(512 * k, b"\x00")
        for i in range(k):
            sectors.append(data[512 * i : 512 * (i + 1)])
            chains[first + i] = first + i + 1
        chains[first + k - 1] = ENDOFCHAIN
        return first

    items = list(streams.items()) + list((embedded or {}).items())
    mini_data = b""
    mini_fat: list[int] = []
    starts: list[int] = []
    for _, d in items:
        if len(d) >= 4096:
            starts.append(add(d))
        else:
            k = max(1, (len(d) + 63) // 64)
            starts.append(len(mini_data) // 64)
            mini_data += d.ljust(64 * k, b"\x00")
            base = len(mini_fat)
            mini_fat += list(range(base + 1, base + k))
            mini_fat.append(ENDOFCHAIN)

    mini_start = add(mini_data) if mini_data else ENDOFCHAIN
    minifat_start = ENDOFCHAIN
    n_minifat = 0
    if mini_fat:
        raw = b"".join(struct.pack("<I", v) for v in mini_fat)
        raw = raw.ljust(512 * max(1, (len(raw) + 511) // 512), b"\xff")
        minifat_start = add(raw)
        n_minifat = len(raw) // 512

    def dirent(name: str, typ: int, start: int, size: int,
               right: int = FREESECT, child: int = FREESECT) -> bytes:
        nm = name.encode("utf-16-le")
        e = bytearray(128)
        e[: len(nm)] = nm
        struct.pack_into("<H", e, 64, len(nm) + 2)
        e[66] = typ
        e[67] = 1  # black
        struct.pack_into("<III", e, 68, FREESECT, right, child)
        struct.pack_into("<I", e, 116, start)
        struct.pack_into("<I", e, 120, size)
        return bytes(e)

    n_root = len(streams)
    root_names = list(streams)
    emb_names = list(embedded or {})
    entries = [
        dirent("Root Entry", 5, mini_start, len(mini_data),
               child=1 if items or embedded is not None else FREESECT)
    ]
    for j, n in enumerate(root_names):
        last = j + 1 == n_root and not emb_names
        entries.append(
            dirent(n, 2, starts[j], len(streams[n]),
                   right=FREESECT if last else len(entries) + 1)
        )
    if emb_names:
        storage_idx = len(entries)
        entries.append(dirent("ObjectPool", 1, 0, 0, child=storage_idx + 1))
        for j, n in enumerate(emb_names):
            last = j + 1 == len(emb_names)
            entries.append(
                dirent(n, 2, starts[n_root + j], len((embedded or {})[n]),
                       right=FREESECT if last else len(entries) + 1)
            )
    dir_start = add(b"".join(entries))

    fat_sector = len(sectors)
    fat = [chains.get(i, ENDOFCHAIN) for i in range(len(sectors))]
    fat.append(FATSECT)
    raw_fat = b"".join(struct.pack("<I", v) for v in fat).ljust(512, b"\xff")
    assert len(raw_fat) == 512, "test writer supports one FAT sector"
    sectors.append(raw_fat)

    hdr = bytearray(512)
    hdr[:8] = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
    struct.pack_into("<H", hdr, 24, 0x3E)  # minor
    struct.pack_into("<H", hdr, 26, 3)  # major (512-byte sectors)
    struct.pack_into("<H", hdr, 28, 0xFFFE)
    struct.pack_into("<H", hdr, 30, 9)
    struct.pack_into("<H", hdr, 32, 6)
    struct.pack_into("<I", hdr, 44, 1)  # one FAT sector
    struct.pack_into("<I", hdr, 48, dir_start)
    struct.pack_into("<I", hdr, 56, 4096)
    struct.pack_into("<I", hdr, 60, minifat_start)
    struct.pack_into("<I", hdr, 64, n_minifat)
    struct.pack_into("<I", hdr, 68, ENDOFCHAIN)  # no DIFAT chain
    struct.pack_into("<I", hdr, 72, 0)
    struct.pack_into("<I", hdr, 76, fat_sector)
    for i in range(1, 109):
        struct.pack_into("<I", hdr, 76 + 4 * i, FREESECT)
    return bytes(hdr) + b"".join(sectors)


def make_doc(pieces: list[tuple[str, bool]], big_word: bool = True,
             embedded: dict[str, bytes] | None = None) -> bytes:
    """Word binary from text pieces [(text, compressed?)]: FIB +
    text area in WordDocument, Clx (a Prc block, then the Pcdt) in
    1Table.  big_word pads WordDocument past the 4096 mini cutoff."""
    word = bytearray(2048)
    struct.pack_into("<H", word, 0, 0xA5EC)
    struct.pack_into("<H", word, 2, 0x00C1)  # nFib (Word 97)
    struct.pack_into("<H", word, 0x0A, 0x0200)  # fWhichTblStm → 1Table

    # Word CPs count UTF-16 code units (a surrogate pair is 2 CPs)
    def units(text: str, compressed: bool) -> int:
        return len(text) if compressed else len(text.encode("utf-16-le")) // 2

    struct.pack_into(
        "<I", word, 0x4C, sum(units(t, c) for t, c in pieces)
    )
    text_area = bytearray()
    fcs: list[int] = []
    for text, compressed in pieces:
        at = 2048 + len(text_area)
        if compressed:
            text_area += text.encode("cp1252")
            fcs.append((at * 2) | 0x40000000)
        else:
            text_area += text.encode("utf-16-le")
            fcs.append(at)

    cps, cp = [], 0
    for text, compressed in pieces:
        cps.append(cp)
        cp += units(text, compressed)
    cps.append(cp)
    plc = b"".join(struct.pack("<I", c) for c in cps)
    for fc in fcs:
        plc += struct.pack("<HIH", 0, fc, 0)
    clx = b"\x01" + struct.pack("<H", 4) + b"\xde\xad\xbe\xef"  # Prc to skip
    clx += b"\x02" + struct.pack("<I", len(plc)) + plc
    fc_clx = 64
    struct.pack_into("<I", word, 0x01A2, fc_clx)
    struct.pack_into("<I", word, 0x01A6, len(clx))

    word_stream = bytes(word) + bytes(text_area)
    if big_word:
        word_stream = word_stream.ljust(4608, b"\x00")
    table = b"\x00" * fc_clx + clx
    return make_cfb(
        {"WordDocument": word_stream, "1Table": table}, embedded=embedded
    )


class TestOleDoc:
    def test_single_compressed_piece(self):
        blob = make_doc([("Hello legacy Word\rsecond paragraph\r", True)])
        assert doc_to_text(blob) == "Hello legacy Word\nsecond paragraph\n"

    def test_mixed_pieces_and_unicode(self):
        blob = make_doc([
            ("café ANSI part\r", True),
            ("Unicode 中文 piece — dash\r", False),
            ("tail", True),
        ])
        assert doc_to_text(blob) == (
            "café ANSI part\nUnicode 中文 piece — dash\ntail"
        )

    def test_control_char_mapping(self):
        text = "cell\x07row\x07para\rhy\x1ephen\x1fopt\x13field\x14res\x15"
        blob = make_doc([(text, True)])
        assert doc_to_text(blob) == "cell\nrow\npara\nhy-phenoptfieldres"

    def test_small_streams_use_mini_fat(self):
        """WordDocument under the 4096 cutoff lives in the mini stream."""
        blob = make_doc([("mini stream body\r", True)], big_word=False)
        streams = ole_streams(blob)
        assert len(streams["WordDocument"]) < 4096
        assert doc_to_text(blob) == "mini stream body\n"

    def test_ccp_text_bounds_reading(self):
        """Pieces past ccpText (footnote/header areas) are excluded."""
        blob = bytearray(make_doc([("main body\r", True), ("footnote", True)]))
        # shrink ccpText to just the main body: 10 chars
        # (WordDocument begins at sector 0 = byte 512 in this layout)
        at = bytes(blob).find(struct.pack("<H", 0xA5EC))
        struct.pack_into("<I", blob, at + 0x4C, 10)
        assert doc_to_text(bytes(blob)) == "main body\n"

    def test_encrypted_doc_raises(self):
        blob = bytearray(make_doc([("secret\r", True)]))
        at = bytes(blob).find(struct.pack("<H", 0xA5EC))
        flags = struct.unpack_from("<H", blob, at + 0x0A)[0]
        struct.pack_into("<H", blob, at + 0x0A, flags | 0x0100)
        with pytest.raises(ValueError):
            doc_to_text(bytes(blob))

    def test_not_ole_raises(self):
        with pytest.raises(ValueError):
            doc_to_text(b"PK\x03\x04 this is a zip, not OLE")
        with pytest.raises(ValueError):
            doc_to_text(b"short")


class TestDocIngest:
    def test_rows_from_files_routes_doc(self, tmp_path):
        import pyarrow as pa

        from ragflow_ray.sources.ingest import rows_from_files

        good = make_doc([("Line one of the doc\rline two\r", True)])
        batch = pa.table(
            {"path": ["a/report.doc", "b/broken.doc"],
             "bytes": [good, b"\xd0\xcf\x11\xe0 truncated garbage"]}
        )
        rows = rows_from_files(batch).to_pylist()
        by_id = {r["doc_id"]: r for r in rows}
        ok = by_id["report.doc"]
        assert ok["fmt"] == "doc" and ok["template"] == "naive"
        assert ok["spans"][0]["text"] == "Line one of the doc\nline two\n"
        bad = by_id["broken.doc"]
        assert bad["fmt"] == "error" and not bad["spans"]

    def test_naive_chunker_sections_on_lines(self):
        from ragflow_ray.chunkers.common import ChunkConfig
        from ragflow_ray.chunkers.naive import chunk_naive

        text = "alpha first line\nbeta second line\ngamma third line"
        doc = {
            "doc_id": "d.doc",
            "fmt": "doc",
            "template": "naive",
            "spans": [
                {"kind": "text", "text": text, "media_ref": "", "offset": 0}
            ],
        }
        chunks = chunk_naive(doc, ChunkConfig())
        joined = "\n".join(c["text"] for c in chunks)
        for line in text.split("\n"):
            assert line in joined


# --- legacy .xls (BIFF8) ---------------------------------------------------


def _rec(op: int, payload: bytes) -> bytes:
    return struct.pack("<HH", op, len(payload)) + payload


def _bof(dt: int) -> bytes:
    return _rec(0x0809, struct.pack("<HH", 0x0600, dt) + b"\x00" * 12)


def rk_int(v: int) -> int:
    return ((v & 0x3FFFFFFF) << 2) | 2


def rk_cents(cents: int) -> int:
    return ((cents & 0x3FFFFFFF) << 2) | 3


def rk_float(v: float) -> int:
    hi = struct.unpack("<Q", struct.pack("<d", v))[0] >> 32
    return hi & 0xFFFFFFFC


def make_xls(sheets: list[tuple[str, list[bytes]]],
             strings: list[str]) -> bytes:
    """Independent BIFF8 writer: globals substream (SST + BOUNDSHEETs)
    then one worksheet substream per sheet from pre-packed cell
    records.  BOUNDSHEET positions are fixed up after assembly."""
    sst = struct.pack("<II", len(strings), len(strings))
    for s in strings:
        wide = any(ord(c) > 0xFF for c in s)
        sst += struct.pack("<HB", len(s), 1 if wide else 0)
        sst += s.encode("utf-16-le" if wide else "latin-1")

    bound_at: list[int] = []
    globals_recs = _bof(0x0005) + _rec(0x00FC, sst)
    for name, _ in sheets:
        bound_at.append(len(globals_recs) + 4)  # payload offset of lbPlyPos
        nm = name.encode("latin-1")
        globals_recs += _rec(
            0x0085, struct.pack("<IBB", 0, 0, 0)
            + struct.pack("<BB", len(nm), 0) + nm
        )
    globals_recs += _rec(0x000A, b"")

    stream = bytearray(globals_recs)
    for i, (_, cell_recs) in enumerate(sheets):
        struct.pack_into("<I", stream, bound_at[i], len(stream))
        stream += _bof(0x0010)
        for r in cell_recs:
            stream += r
        stream += _rec(0x000A, b"")
    return make_cfb({"Workbook": bytes(stream)})


class TestXls:
    def test_cell_record_types(self):
        from ragflow_ray.parsers.olebytes import xls_to_sheets

        cells = [
            _rec(0x00FD, struct.pack("<HHHI", 0, 0, 0, 0)),  # LABELSST "alpha"
            _rec(0x0203, struct.pack("<HHHd", 0, 1, 0, 2.5)),  # NUMBER
            _rec(0x027E, struct.pack("<HHHI", 1, 0, 0, rk_int(7))),
            _rec(0x027E, struct.pack("<HHHI", 1, 1, 0, rk_cents(250))),  # 2.5
            _rec(0x027E, struct.pack("<HHHI", 1, 2, 0, rk_float(1.5))),
            _rec(0x00BD, struct.pack("<HH", 2, 0)
                 + struct.pack("<HI", 0, rk_int(10))
                 + struct.pack("<HI", 0, rk_int(-3))
                 + struct.pack("<H", 1)),  # MULRK cols 0-1
            _rec(0x0205, struct.pack("<HHHBB", 3, 0, 0, 1, 0)),  # TRUE
            _rec(0x0205, struct.pack("<HHHBB", 3, 1, 0, 0x2A, 1)),  # error→None
            _rec(0x0006, struct.pack("<HHHd", 4, 0, 0, 42.0) + b"\x00" * 8),
            _rec(0x0006, struct.pack("<HHH", 4, 1, 0)
                 + b"\x00" * 6 + b"\xff\xff" + b"\x00" * 8),  # string result
            _rec(0x0207, struct.pack("<HB", 6, 0) + b"cached"),
        ]
        blob = make_xls([("Data", cells)], ["alpha"])
        sheets = xls_to_sheets(blob)
        assert sheets[0]["name"] == "Data"
        assert sheets[0]["rows"] == [
            ["alpha", 2.5, None],
            [7, 2.5, 1.5],
            [10, -3, None],
            ["true", None, None],
            [42, "cached", None],
        ]

    def test_two_sheets_and_unicode_sst(self):
        from ragflow_ray.parsers.olebytes import xls_to_sheets

        c1 = [_rec(0x00FD, struct.pack("<HHHI", 0, 0, 0, 0))]
        c2 = [_rec(0x00FD, struct.pack("<HHHI", 0, 0, 0, 1))]
        blob = make_xls([("first", c1), ("zweite", c2)], ["héllo", "中文字"])
        sheets = xls_to_sheets(blob)
        assert [s["name"] for s in sheets] == ["first", "zweite"]
        assert sheets[0]["rows"] == [["héllo"]]
        assert sheets[1]["rows"] == [["中文字"]]

    def test_sst_continue_boundary_switches_width(self):
        """A string split across a CONTINUE whose continuation flag
        flips between compressed and UTF-16 ([MS-XLS] 2.5.293)."""
        from ragflow_ray.parsers.olebytes import _parse_sst

        # one string "abcDEF": 3 compressed chars in the SST record,
        # 3 wide chars after the boundary flag byte in the CONTINUE
        chunk1 = struct.pack("<II", 1, 1) + struct.pack("<HB", 6, 0) + b"abc"
        chunk2 = b"\x01" + "DEF".encode("utf-16-le")
        assert _parse_sst([chunk1, chunk2]) == ["abcDEF"]
        # and the reverse: wide first, compressed continuation
        chunk1 = struct.pack("<II", 1, 1) + struct.pack("<HB", 6, 1) \
            + "ab√".encode("utf-16-le")
        chunk2 = b"\x00" + b"cde"
        assert _parse_sst([chunk1, chunk2]) == ["ab√cde"]

    def test_encrypted_xls_raises(self):
        from ragflow_ray.parsers.olebytes import xls_to_sheets

        stream = _bof(0x0005) + _rec(0x002F, b"\x01\x00\x02\x00") \
            + _rec(0x000A, b"")
        with pytest.raises(ValueError):
            xls_to_sheets(make_cfb({"Workbook": stream}))

    def test_ingest_routes_xls(self):
        import pyarrow as pa

        from ragflow_ray.sources.ingest import rows_from_files

        cells = [
            _rec(0x00FD, struct.pack("<HHHI", 0, 0, 0, 0)),
            _rec(0x00FD, struct.pack("<HHHI", 0, 1, 0, 1)),
            _rec(0x027E, struct.pack("<HHHI", 1, 0, 0, rk_int(12))),
            _rec(0x00FD, struct.pack("<HHHI", 1, 1, 0, 2)),
        ]
        blob = make_xls([("People", cells)], ["name", "age", "Ada"])
        batch = pa.table({"path": ["x/people.xls"], "bytes": [blob]})
        row = rows_from_files(batch).to_pylist()[0]
        assert row["fmt"] == "excel" and row["template"] == "naive"

        from ragflow_ray.chunkers.common import ChunkConfig
        from ragflow_ray.chunkers.naive import chunk_naive

        chunks = chunk_naive(
            {"doc_id": "people.xls", "fmt": "excel", "template": "naive",
             "spans": row["spans"]},
            ChunkConfig(),
        )
        joined = "\n".join(c["text"] for c in chunks)
        assert "Ada" in joined and "12" in joined


# --- property tests: the degradation contract ------------------------------

from hypothesis import given, settings, strategies as st  # noqa: E402

_PIECE = st.text(
    alphabet=st.characters(codec="utf-16-le", exclude_characters="\x00"),
    min_size=1, max_size=60,
)


class TestOleProperties:
    @settings(max_examples=40)
    @given(st.lists(st.tuples(_PIECE, st.booleans()), min_size=1, max_size=4))
    def test_doc_roundtrip_any_pieces(self, pieces):
        """Arbitrary piece texts survive the piece table: output equals
        the control-char-mapped concatenation (CP1252 pieces degrade
        per-char exactly like the encoder, so compare post-encode)."""
        from ragflow_ray.parsers.olebytes import _clean

        enc = [
            (t.encode("cp1252", "replace").decode("cp1252") if comp else t, comp)
            for t, comp in pieces
        ]
        blob = make_doc(enc)
        assert doc_to_text(blob) == _clean("".join(t for t, _ in enc))

    @settings(max_examples=60)
    @given(st.binary(min_size=1, max_size=40), st.integers(0, 5000))
    def test_mutated_doc_never_crashes(self, junk, at):
        """Splicing junk anywhere into a valid file either still parses
        or raises ValueError — never any other exception (the ingest
        boundary's documented contract)."""
        base = make_doc([("stable body\r", True)])
        at = at % len(base)
        blob = base[:at] + junk + base[at + len(junk):]
        try:
            doc_to_text(blob)
        except (ValueError, struct.error):
            pass

    @settings(max_examples=60)
    @given(st.binary(min_size=1, max_size=40), st.integers(0, 5000))
    def test_mutated_xls_never_crashes(self, junk, at):
        from ragflow_ray.parsers.olebytes import xls_to_sheets

        cells = [_rec(0x00FD, struct.pack("<HHHI", 0, 0, 0, 0))]
        base = make_xls([("S", cells)], ["v"])
        at = at % len(base)
        blob = base[:at] + junk + base[at + len(junk):]
        try:
            xls_to_sheets(blob)
        except (ValueError, struct.error):
            pass


class TestReviewRegressions:
    """Pinned fixes from the round-3 code review of the OLE/AES work."""

    def test_embedded_object_does_not_shadow_root_streams(self):
        """An ObjectPool storage with its own WordDocument/1Table (an
        embedded Word object) must not shadow the root document's
        streams — the directory walk stays at root level."""
        blob = make_doc(
            [("real main body\r", True)],
            embedded={"WordDocument": b"\xff" * 600, "1Table": b"\xee" * 128},
        )
        assert doc_to_text(blob) == "real main body\n"

    def test_difat_cycle_is_bounded(self):
        """csectDifat = 0xFFFFFFFF with a self-pointing DIFAT sector
        must terminate instead of spinning for 4 billion iterations."""
        hdr = bytearray(make_doc([("x\r", True)])[:512])
        struct.pack_into("<I", hdr, 68, 0)  # first DIFAT sector = 0
        struct.pack_into("<I", hdr, 72, 0xFFFFFFFF)  # huge declared count
        difat = bytearray(b"\xff" * 512)
        struct.pack_into("<I", difat, 508, 0)  # next DIFAT → itself
        with pytest.raises(ValueError):
            ole_streams(bytes(hdr) + bytes(difat))

    def test_truncated_boundsheet_and_string_records_skip(self):
        """Short BIFF records degrade per-record (no IndexError)."""
        from ragflow_ray.parsers.olebytes import xls_to_sheets

        cells = [_rec(0x00FD, struct.pack("<HHHI", 0, 0, 0, 0))]
        stream = _bof(0x0005) + _rec(0x00FC, struct.pack("<II", 1, 1)
                                     + struct.pack("<HB", 1, 0) + b"v")
        stream += _rec(0x0085, b"\x00\x00\x00")  # truncated BOUNDSHEET
        bound_payload = struct.pack("<IBB", 0, 0, 0) + struct.pack("<BB", 1, 0) + b"S"
        bound_at = len(stream) + 4
        stream += _rec(0x0085, bound_payload)
        stream += _rec(0x000A, b"")
        fixed = bytearray(stream)
        struct.pack_into("<I", fixed, bound_at, len(stream))
        stream = bytes(fixed) + _bof(0x0010)
        for r in cells:
            stream += r
        stream += _rec(0x0207, b"\x01")  # truncated STRING record
        stream += _rec(0x000A, b"")
        sheets = xls_to_sheets(make_cfb({"Workbook": stream}))
        assert sheets == [{"name": "S", "rows": [["v"]]}]
