"""From-scratch PDF text-layer extraction (parsers/pdfbytes.py).

The writer below builds real, spec-conformant single-font PDFs byte by
byte (compressed and uncompressed content streams, Kids tree), so the
extractor is tested against actual PDF structure rather than its own
assumptions.
"""

from __future__ import annotations

import zlib

from ragflow_ray.parsers.pdfbytes import pdf_text_lines, pdf_to_page_payloads


def make_pdf(pages: list[list[str]], compress: bool = True,
             use_tj_array: bool = False) -> bytes:
    """Minimal well-formed PDF: catalog → pages tree → page objects
    with one content stream each."""
    objs: list[bytes] = []

    def add(body: bytes) -> int:
        objs.append(body)
        return len(objs)  # 1-based object number

    n_pages = len(pages)
    # reserve: 1 catalog, 2 pages-node; page objects and streams follow
    add(b"<< /Type /Catalog /Root-placeholder true >>")  # replaced below
    add(b"<< /Type /Pages >>")  # replaced below

    page_nums = []
    for lines in pages:
        parts = [b"BT /F1 12 Tf 72 720 Td"]
        for i, line in enumerate(lines):
            if i > 0:
                parts.append(b"0 -14 Td")
            esc = line.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
            if use_tj_array:
                mid = max(1, len(esc) // 2)
                parts.append(
                    b"[(" + esc[:mid].encode("latin-1") + b") -20 ("
                    + esc[mid:].encode("latin-1") + b")] TJ"
                )
            else:
                parts.append(b"(" + esc.encode("latin-1") + b") Tj")
        parts.append(b"ET")
        content = b"\n".join(parts)
        if compress:
            data = zlib.compress(content)
            stream_obj = (
                b"<< /Length " + str(len(data)).encode()
                + b" /Filter /FlateDecode >>\nstream\n" + data + b"\nendstream"
            )
        else:
            stream_obj = (
                b"<< /Length " + str(len(content)).encode()
                + b" >>\nstream\n" + content + b"\nendstream"
            )
        s_num = add(stream_obj)
        p_num = add(
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Contents "
            + str(s_num).encode() + b" 0 R >>"
        )
        page_nums.append(p_num)

    kids = b" ".join(str(n).encode() + b" 0 R" for n in page_nums)
    objs[0] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objs[1] = (
        b"<< /Type /Pages /Count " + str(n_pages).encode()
        + b" /Kids [" + kids + b"] >>"
    )

    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += str(i).encode() + b" 0 obj\n" + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 " + str(len(objs) + 1).encode() + b"\n"
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        b"trailer\n<< /Size " + str(len(objs) + 1).encode()
        + b" /Root 1 0 R >>\nstartxref\n" + str(xref_at).encode() + b"\n%%EOF\n"
    )
    return bytes(out)


class TestPdfBytes:
    def test_single_page_compressed(self):
        blob = make_pdf([["hello world", "second line"]])
        assert pdf_text_lines(blob) == [["hello world", "second line"]]

    def test_uncompressed_stream(self):
        blob = make_pdf([["plain stream text"]], compress=False)
        assert pdf_text_lines(blob) == [["plain stream text"]]

    def test_multi_page_order(self):
        blob = make_pdf([["page one"], ["page two"], ["page three"]])
        assert pdf_text_lines(blob) == [["page one"], ["page two"], ["page three"]]

    def test_tj_array_segments(self):
        blob = make_pdf([["concatenated segment line"]], use_tj_array=True)
        assert pdf_text_lines(blob) == [["concatenated segment line"]]

    def test_escapes_and_parens(self):
        blob = make_pdf([["with (parens) and \\ backslash"]])
        assert pdf_text_lines(blob) == [["with (parens) and \\ backslash"]]

    def test_garbage_does_not_crash(self):
        assert pdf_text_lines(b"%PDF-1.4 not really a pdf") == []
        assert pdf_text_lines(b"") == []

    def test_page_payloads_feed_plain_chunker(self):
        from ragflow_ray.chunkers import ChunkConfig, chunk_document

        blob = make_pdf([["alpha beta gamma", "delta epsilon"]])
        doc = {
            "doc_id": "pdfreal-1",
            "fmt": "pdf",
            "spans": pdf_to_page_payloads("pdfreal-1", blob),
        }
        spans = chunk_document(doc, "naive", ChunkConfig(layout_mode="plain"))
        text = "".join(s["text"] for s in spans)
        assert "alpha beta gamma" in text and "delta epsilon" in text


from hypothesis import given, settings, strategies as st

# printable latin-1 text without PDF-delimiter ambiguity hazards the
# writer already escapes; lines must be non-empty after strip
_LINE = st.text(
    alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x7E),
    min_size=1, max_size=60,
).map(str.strip).filter(bool)


class TestPdfBytesProperties:
    @settings(max_examples=60, deadline=None)
    @given(st.lists(st.lists(_LINE, min_size=1, max_size=6), min_size=1, max_size=4),
           st.booleans())
    def test_roundtrip_any_lines(self, pages, compress):
        blob = make_pdf(pages, compress=compress)
        assert pdf_text_lines(blob) == pages


class TestTokenizerRobustness:
    """Out-of-subset bytes must degrade to skipped tokens, never crash
    (ADVICE r02: malformed numerics and \\8/\\9 escapes reproduced)."""

    def test_malformed_numeric_tokens_skipped(self):
        from ragflow_ray.parsers.pdfbytes import _tokenize

        toks = list(_tokenize(b"1.2.3 -- (ok) Tj 4.5 Td"))
        kinds = [k for k, _ in toks]
        assert ("str", b"ok") in toks
        assert ("num", 4.5) in toks
        # the bad runs produced no 'num' token and no exception
        assert kinds.count("num") == 1

    def test_non_octal_escapes_are_bare_chars(self):
        from ragflow_ray.parsers.pdfbytes import _unescape_literal

        assert _unescape_literal(rb"a\8b\9c") == "a8b9c"
        assert _unescape_literal(rb"\101\60") == "A0"

    def test_arbitrary_binary_never_crashes(self):
        from ragflow_ray.parsers.pdfbytes import _page_lines

        import random

        rng = random.Random(7)
        for _ in range(20):
            junk = bytes(rng.randrange(256) for _ in range(400))
            _page_lines([junk])  # must not raise


def make_cid_pdf(pages_lines: list[list[str]]) -> bytes:
    """A minimal Identity-H Type0-font PDF: every show-string is 2-byte
    CIDs (cid = ord(char) + 7 so a latin-1 misread cannot pass), with a
    /ToUnicode CMap carrying both bfchar entries and one bfrange."""
    import zlib as _zlib

    # code -> char over the alphabet used; codes offset by 7
    alphabet = sorted({ch for page in pages_lines for ln in page for ch in ln})
    code_of = {ch: ord(ch) + 7 for ch in alphabet}
    # one bfrange for 'a'..'z', bfchar entries for the rest
    range_lo, range_hi = ord("a") + 7, ord("z") + 7
    bfchars = [
        (code_of[ch], ch) for ch in alphabet
        if not (range_lo <= code_of[ch] <= range_hi)
    ]
    cmap_lines = [
        "/CIDInit /ProcSet findresource begin",
        "begincmap",
        "1 begincodespacerange", "<0000> <FFFF>", "endcodespacerange",
        f"{len(bfchars)} beginbfchar",
    ]
    for code, ch in bfchars:
        cmap_lines.append(
            f"<{code:04X}> <{ord(ch):04X}>"
        )
    cmap_lines += [
        "endbfchar",
        "1 beginbfrange",
        f"<{range_lo:04X}> <{range_hi:04X}> <{ord('a'):04X}>",
        "endbfrange",
        "endcmap",
    ]
    cmap_stream = "\n".join(cmap_lines).encode()

    objs: list[bytes] = []

    def add(body: bytes) -> int:
        objs.append(body)
        return len(objs)

    cmap_num = add(
        b"<< /Length " + str(len(cmap_stream)).encode()
        + b" >>\nstream\n" + cmap_stream + b"\nendstream"
    )
    font_num = add(
        (f"<< /Type /Font /Subtype /Type0 /BaseFont /Fake-Identity-H "
         f"/Encoding /Identity-H /ToUnicode {cmap_num} 0 R >>").encode()
    )
    page_nums = []
    content_nums = []
    for lines in pages_lines:
        ops = ["BT", "/F7 12 Tf"]
        for i, line in enumerate(lines):
            hexstr = "".join(f"{code_of[ch]:04X}" for ch in line)
            ops.append(f"1 0 0 1 72 {720 - 14 * i} Tm")
            ops.append(f"<{hexstr}> Tj")
        ops.append("ET")
        raw = "\n".join(ops).encode()
        comp = _zlib.compress(raw)
        content_nums.append(add(
            b"<< /Length " + str(len(comp)).encode()
            + b" /Filter /FlateDecode >>\nstream\n" + comp + b"\nendstream"
        ))
    pages_obj_num = len(objs) + len(pages_lines) + 1
    for cn in content_nums:
        page_nums.append(add(
            (f"<< /Type /Page /Parent {pages_obj_num} 0 R /Contents {cn} 0 R "
             f"/Resources << /Font << /F7 {font_num} 0 R >> >> "
             f"/MediaBox [0 0 612 792] >>").encode()
        ))
    kids = " ".join(f"{p} 0 R" for p in page_nums)
    pages_num = add(
        (f"<< /Type /Pages /Kids [{kids}] /Count {len(page_nums)} >>").encode()
    )
    assert pages_num == pages_obj_num
    catalog_num = add(f"<< /Type /Catalog /Pages {pages_num} 0 R >>".encode())

    out = bytearray(b"%PDF-1.7\n")
    for i, body in enumerate(objs, start=1):
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    out += f"trailer\n<< /Root {catalog_num} 0 R >>\n%%EOF".encode()
    return bytes(out)


class TestCidToUnicode:
    def test_cid_pdf_roundtrip(self):
        pages = [["Hello CID World", "second line 42"],
                 ["page two text"]]
        blob = make_cid_pdf(pages)
        assert pdf_text_lines(blob) == pages

    def test_bfrange_and_bfchar_paths(self):
        # lowercase letters travel through the bfrange, the rest
        # through bfchar entries
        pages = [["abcxyz", "ABC 123!"]]
        assert pdf_text_lines(make_cid_pdf(pages)) == pages

    def test_unmapped_codes_skipped(self):
        from ragflow_ray.parsers.pdfbytes import _page_lines

        # a hex string with codes far outside the cmap: no crash, and
        # mapped codes still decode
        blob = make_cid_pdf([["ab"]])
        pages = pdf_text_lines(blob)
        assert pages == [["ab"]]

    @settings(max_examples=25, deadline=None)
    @given(st.lists(st.lists(_LINE, min_size=1, max_size=4), min_size=1, max_size=3))
    def test_cid_roundtrip_property(self, pages):
        assert pdf_text_lines(make_cid_pdf(pages)) == pages


def make_pdf15(pages_lines: list[list[str]]) -> bytes:
    """A PDF 1.5-shaped file in the modern-producer layout: catalog,
    pages node and page dicts packed in a FlateDecode /ObjStm; content
    streams top-level with INDIRECT /Length; a binary /Type /XRef
    cross-reference stream instead of a classic xref table."""
    import zlib as _zlib

    # object numbering: 1 catalog, 2 pages node, then per page
    # (content, length-int, page dict), then objstm, then xref stream
    n_pages = len(pages_lines)
    content_nums = [3 + 3 * i for i in range(n_pages)]
    length_nums = [4 + 3 * i for i in range(n_pages)]
    page_nums = [5 + 3 * i for i in range(n_pages)]
    objstm_num = 3 + 3 * n_pages
    xref_num = objstm_num + 1

    # --- packed (ObjStm) objects: catalog, pages node, page dicts ---
    packed: list[tuple[int, bytes]] = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Count " + str(n_pages).encode()
            + b" /Kids [" + b" ".join(f"{p} 0 R".encode() for p in page_nums)
            + b"] >>"),
    ]
    for p, c in zip(page_nums, content_nums):
        packed.append((p, (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Contents {c} 0 R >>").encode()))
    bodies = b""
    header_parts = []
    for num, body in packed:
        header_parts.append(f"{num} {len(bodies)}")
        bodies += body + b"\n"
    header = (" ".join(header_parts) + "\n").encode()
    objstm_payload = _zlib.compress(header + bodies)
    objstm_obj = (
        b"<< /Type /ObjStm /N " + str(len(packed)).encode()
        + b" /First " + str(len(header)).encode()
        + b" /Length " + str(len(objstm_payload)).encode()
        + b" /Filter /FlateDecode >>\nstream\n" + objstm_payload
        + b"\nendstream"
    )

    # --- top-level objects ---
    top: dict[int, bytes] = {objstm_num: objstm_obj}
    for lines, c, ln in zip(pages_lines, content_nums, length_nums):
        parts = [b"BT /F1 12 Tf 72 720 Td"]
        for i, line in enumerate(lines):
            if i > 0:
                parts.append(b"0 -14 Td")
            esc = line.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
            parts.append(b"(" + esc.encode("latin-1") + b") Tj")
        parts.append(b"ET")
        comp = _zlib.compress(b"\n".join(parts))
        top[c] = (
            b"<< /Length " + str(ln).encode() + b" 0 R /Filter /FlateDecode >>"
            b"\nstream\n" + comp + b"\nendstream"
        )
        top[ln] = str(len(comp)).encode()

    out = bytearray(b"%PDF-1.5\n")
    offsets: dict[int, int] = {}
    for num in sorted(top):
        offsets[num] = len(out)
        out += str(num).encode() + b" 0 obj\n" + top[num] + b"\nendobj\n"

    # --- cross-reference stream (binary W [1 4 2] entries) ---
    def entry(t: int, a: int, b: int) -> bytes:
        return bytes([t]) + a.to_bytes(4, "big") + b.to_bytes(2, "big")

    size = xref_num + 1
    rows = [entry(0, 0, 0xFFFF)]  # obj 0: free
    for num in range(1, size):
        if num in offsets:
            rows.append(entry(1, offsets[num], 0))
        elif num == xref_num:
            rows.append(entry(1, 0, 0))  # patched below
        else:  # packed in the object stream
            idx = [p for p, _ in packed].index(num)
            rows.append(entry(2, objstm_num, idx))
    xref_at = len(out)
    rows[xref_num] = entry(1, xref_at, 0)
    xref_payload = _zlib.compress(b"".join(rows))
    out += (
        str(xref_num).encode() + b" 0 obj\n"
        b"<< /Type /XRef /Size " + str(size).encode()
        + b" /W [1 4 2] /Root 1 0 R /Filter /FlateDecode /Length "
        + str(len(xref_payload)).encode() + b" >>\nstream\n"
        + xref_payload + b"\nendstream\nendobj\n"
    )
    out += b"startxref\n" + str(xref_at).encode() + b"\n%%EOF\n"
    return bytes(out)


class TestPdf15ObjectStreams:
    def test_objstm_roundtrip(self):
        pages = [["modern pdf line one", "line two"], ["second page"]]
        assert pdf_text_lines(make_pdf15(pages)) == pages

    def test_objstm_payload_path(self):
        blob = make_pdf15([["objstm alpha", "objstm beta"]])
        spans = pdf_to_page_payloads("pdf15-1", blob)
        assert len(spans) == 1
        import json
        payload = json.loads(spans[0]["text"])
        assert [b["text"] for b in payload["boxes"]] == [
            "objstm alpha", "objstm beta"]

    @settings(max_examples=30, deadline=None)
    @given(st.lists(st.lists(_LINE, min_size=1, max_size=5),
                    min_size=1, max_size=3))
    def test_objstm_roundtrip_property(self, pages):
        assert pdf_text_lines(make_pdf15(pages)) == pages


def _lzw_encode(data: bytes) -> bytes:
    """Spec-shaped LZW encoder (early change) for roundtrip tests."""
    dict_ = {bytes([i]): i for i in range(256)}
    next_code, width = 258, 9
    bits: list[tuple[int, int]] = [(256, width)]
    w = b""
    for ch in data:
        c = bytes([ch])
        if w + c in dict_:
            w += c
            continue
        bits.append((dict_[w], width))
        dict_[w + c] = next_code
        next_code += 1
        if next_code + 1 >= (1 << width) and width < 12:
            width += 1
        w = c
    if w:
        bits.append((dict_[w], width))
    bits.append((257, width))
    buf = nbits = 0
    out = bytearray()
    for code, wd in bits:
        buf = (buf << wd) | code
        nbits += wd
        while nbits >= 8:
            out.append((buf >> (nbits - 8)) & 0xFF)
            nbits -= 8
    if nbits:
        out.append((buf << (8 - nbits)) & 0xFF)
    return bytes(out)


def make_filtered_pdf(lines: list[str], filters: str) -> bytes:
    """One-page PDF whose content stream uses the given filter chain,
    e.g. '/LZWDecode' or '[/ASCII85Decode /FlateDecode]'."""
    import base64
    import zlib as _zlib

    parts = [b"BT /F1 12 Tf 72 720 Td"]
    for i, line in enumerate(lines):
        if i > 0:
            parts.append(b"0 -14 Td")
        esc = line.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
        parts.append(b"(" + esc.encode("latin-1") + b") Tj")
    parts.append(b"ET")
    data = b"\n".join(parts)
    # apply chain in REVERSE (the reader undoes them in listed order)
    for name in reversed(filters.replace("[", "").replace("]", "").split()):
        if name == "/FlateDecode":
            data = _zlib.compress(data)
        elif name == "/LZWDecode":
            data = _lzw_encode(data)
        elif name == "/ASCIIHexDecode":
            data = data.hex().encode() + b">"
        elif name == "/ASCII85Decode":
            data = base64.a85encode(data) + b"~>"
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Count 1 /Kids [4 0 R] >>",
        b"<< /Length " + str(len(data)).encode() + b" /Filter " + filters.encode()
        + b" >>\nstream\n" + data + b"\nendstream",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Contents 3 0 R >>",
    ]
    out = bytearray(b"%PDF-1.4\n")
    for i, body in enumerate(objs, start=1):
        out += str(i).encode() + b" 0 obj\n" + body + b"\nendobj\n"
    out += b"trailer\n<< /Size 5 /Root 1 0 R >>\n%%EOF\n"
    return bytes(out)


class TestFilterChains:
    def test_lzw(self):
        lines = ["lzw compressed stream", "second line here"]
        assert pdf_text_lines(make_filtered_pdf(lines, "/LZWDecode")) == [lines]

    def test_ascii85(self):
        lines = ["ascii eighty five"]
        assert pdf_text_lines(make_filtered_pdf(lines, "/ASCII85Decode")) == [lines]

    def test_asciihex(self):
        lines = ["hex encoded"]
        assert pdf_text_lines(make_filtered_pdf(lines, "/ASCIIHexDecode")) == [lines]

    def test_chain_a85_flate(self):
        lines = ["chained filters work", "both of them"]
        blob = make_filtered_pdf(lines, "[/ASCII85Decode /FlateDecode]")
        assert pdf_text_lines(blob) == [lines]

    def test_chain_hex_lzw(self):
        lines = ["hex then lzw"]
        blob = make_filtered_pdf(lines, "[/ASCIIHexDecode /LZWDecode]")
        assert pdf_text_lines(blob) == [lines]

    def test_unknown_filter_degrades(self):
        blob = make_filtered_pdf(["never seen"], "/DCTDecode")
        assert pdf_text_lines(blob) == [[]]  # stream skipped, no crash

    def test_lzw_garbage_no_crash(self):
        from ragflow_ray.parsers.pdfbytes import _lzw_decode

        import random
        rng = random.Random(11)
        for _ in range(30):
            _lzw_decode(bytes(rng.randrange(256) for _ in range(200)))

    @settings(max_examples=40, deadline=None)
    @given(st.binary(min_size=0, max_size=600))
    def test_lzw_roundtrip_property(self, data):
        from ragflow_ray.parsers.pdfbytes import _lzw_decode

        assert _lzw_decode(_lzw_encode(data)) == data


# ---------------------------------------------------------------- predictors


def _png_filter(data: bytes, rowlen: int, bpp: int, ftypes: list[int]) -> bytes:
    """Independent PNG row-filter ENCODER (inverse of _unpredict), one
    tag byte per row, cycling through ftypes."""
    assert len(data) % rowlen == 0
    out = bytearray()
    prev = bytes(rowlen)
    for r in range(0, len(data), rowlen):
        row = data[r : r + rowlen]
        ft = ftypes[(r // rowlen) % len(ftypes)]
        out.append(ft)
        for i in range(rowlen):
            left = row[i - bpp] if i >= bpp else 0
            up = prev[i]
            ul = prev[i - bpp] if i >= bpp else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = left
            elif ft == 2:
                pred = up
            elif ft == 3:
                pred = (left + up) >> 1
            else:  # Paeth
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
            out.append((row[i] - pred) & 0xFF)
        prev = row
    return bytes(out)


def make_predictor_pdf(lines: list[str], predictor: int, columns: int,
                       ftypes: list[int] | None = None) -> bytes:
    """One-page PDF whose FlateDecode content stream carries a
    /DecodeParms /Predictor post-filter."""
    parts = [b"BT /F1 12 Tf 72 720 Td"]
    for i, line in enumerate(lines):
        if i > 0:
            parts.append(b"0 -14 Td")
        esc = line.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
        parts.append(b"(" + esc.encode("latin-1") + b") Tj")
    parts.append(b"ET")
    data = b"\n".join(parts)
    if len(data) % columns:  # pad to whole rows (whitespace is inert)
        data += b" " * (columns - len(data) % columns)
    if predictor >= 10:
        filt = _png_filter(data, columns, 1, ftypes or [2])
    else:  # TIFF horizontal differencing
        out = bytearray()
        for r in range(0, len(data), columns):
            row = bytearray(data[r : r + columns])
            for i in range(len(row) - 1, 0, -1):
                row[i] = (row[i] - row[i - 1]) & 0xFF
            out += row
        filt = bytes(out)
    comp = zlib.compress(filt)
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Count 1 /Kids [4 0 R] >>",
        b"<< /Length " + str(len(comp)).encode()
        + b" /Filter /FlateDecode /DecodeParms << /Predictor "
        + str(predictor).encode() + b" /Columns " + str(columns).encode()
        + b" >> >>\nstream\n" + comp + b"\nendstream",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Contents 3 0 R >>",
    ]
    out = bytearray(b"%PDF-1.4\n")
    for i, body in enumerate(objs, start=1):
        out += str(i).encode() + b" 0 obj\n" + body + b"\nendobj\n"
    out += b"trailer\n<< /Size 5 /Root 1 0 R >>\n%%EOF\n"
    return bytes(out)


class TestPredictors:
    def test_png_up_predictor12(self):
        lines = ["predictor twelve stream", "second line of it"]
        assert pdf_text_lines(make_predictor_pdf(lines, 12, 24)) == [lines]

    def test_png_mixed_filters(self):
        lines = ["mixed row filters survive", "sub up average paeth none"]
        blob = make_predictor_pdf(lines, 15, 17, ftypes=[1, 2, 3, 4, 0])
        assert pdf_text_lines(blob) == [lines]

    def test_tiff_predictor2(self):
        lines = ["tiff differencing"]
        assert pdf_text_lines(make_predictor_pdf(lines, 2, 16)) == [lines]

    def test_unpredict_bad_geometry_degrades(self):
        from ragflow_ray.parsers.pdfbytes import _unpredict

        # stream length not a multiple of stride -> None, no crash
        assert _unpredict(b"\x02abc", 12, 100, 1, 8) is None
        assert _unpredict(b"", 12, 0, 1, 8) is None
        # unknown row filter tag -> None
        assert _unpredict(b"\x09ab", 12, 2, 1, 8) is None

    @settings(max_examples=30, deadline=None)
    @given(st.binary(min_size=1, max_size=400), st.integers(1, 30),
           st.lists(st.sampled_from([0, 1, 2, 3, 4]), min_size=1, max_size=5))
    def test_png_roundtrip_property(self, data, columns, ftypes):
        from ragflow_ray.parsers.pdfbytes import _unpredict

        if len(data) % columns:
            data += b"\x00" * (columns - len(data) % columns)
        enc = _png_filter(data, columns, 1, ftypes)
        assert _unpredict(enc, 12, columns, 1, 8) == data

    def test_array_form_decodeparms(self):
        """/Filter [/FlateDecode] /DecodeParms [<< ... >>] — the array
        spelling, required whenever /Filter is an array — must decode
        identically to the scalar form (round-3 review finding)."""
        lines = ["array form decode parms"]
        blob = make_predictor_pdf(lines, 12, 24)
        arr = blob.replace(
            b"/Filter /FlateDecode /DecodeParms << ",
            b"/Filter [/FlateDecode] /DecodeParms [<< ",
        ).replace(b" >> >>", b" >>] >>")
        assert arr != blob  # the rewrite matched
        assert pdf_text_lines(arr) == [lines]


# --- encrypted PDFs (standard security handler, RC4) ---------------------


def _rc4_ref(key: bytes, data: bytes) -> bytes:
    """Independent RC4 for the fixture encryptor (textbook KSA/PRGA)."""
    S = list(range(256))
    j = 0
    for i in range(256):
        j = (j + S[i] + key[i % len(key)]) % 256
        S[i], S[j] = S[j], S[i]
    res = []
    i = j = 0
    for c in data:
        i = (i + 1) % 256
        j = (j + S[i]) % 256
        S[i], S[j] = S[j], S[i]
        res.append(c ^ S[(S[i] + S[j]) % 256])
    return bytes(res)


def encrypt_pdf(blob: bytes, r: int = 3, key_bits: int = 128) -> bytes:
    """Encrypt a make_pdf()-shaped document: RC4 streams, standard
    security handler, EMPTY user password (owner-locked form).

    Derives /O from an owner password, computes the real /U, appends
    the /Encrypt object and rewrites the trailer — an independent
    implementation of Algorithms 2/3/4/5 so the parser's decrypt path
    is checked against the spec, not against itself.
    """
    import hashlib
    import re as _re

    PAD = bytes([
        0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
        0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
        0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
        0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
    ])
    n = 5 if r == 2 else key_bits // 8
    v = 1 if r == 2 else 2
    p = -44 & 0xFFFFFFFF
    doc_id = hashlib.md5(blob).digest()

    # /O (Algorithm 3): owner password "owner", empty user password
    oh = hashlib.md5(b"owner" + PAD[: 32 - 5]).digest()
    if r >= 3:
        for _ in range(50):
            oh = hashlib.md5(oh[:n]).digest()
    okey = oh[:n]
    o = _rc4_ref(okey, PAD)  # rc4 of padded USER password (empty)
    if r >= 3:
        for i in range(1, 20):
            o = _rc4_ref(bytes(b ^ i for b in okey), o)

    # file key (Algorithm 2, empty user password)
    h = hashlib.md5(PAD + o + p.to_bytes(4, "little") + doc_id).digest()
    if r >= 3:
        for _ in range(50):
            h = hashlib.md5(h[:n]).digest()
    key = h[:n]

    # /U (Algorithm 4/5)
    if r == 2:
        u = _rc4_ref(key, PAD)
    else:
        u = _rc4_ref(key, hashlib.md5(PAD + doc_id).digest())
        for i in range(1, 20):
            u = _rc4_ref(bytes(b ^ i for b in key), u)
        u = u + b"\x00" * 16

    # rc4 every stream body in place (length-preserving)
    out = bytearray(blob)
    for m in _re.finditer(rb"(\d+)\s+(\d+)\s+obj\b", blob):
        start = m.end()
        sm = _re.compile(rb"stream\r?\n").search(blob, start)
        em = blob.find(b"endobj", start)
        if sm is None or (em != -1 and em < sm.start()):
            continue
        header = blob[start : sm.start()]
        lm = _re.search(rb"/Length\s+(\d+)", header)
        if not lm:
            continue
        s0, s1 = sm.end(), sm.end() + int(lm.group(1))
        num = int(m.group(1))
        okey_obj = hashlib.md5(
            key + (num & 0xFFFFFF).to_bytes(3, "little") + b"\x00\x00"
        ).digest()[: min(n + 5, 16)]
        out[s0:s1] = _rc4_ref(okey_obj, blob[s0:s1])

    enc_num = blob.count(b" 0 obj") + 1
    enc_obj = (
        f"{enc_num} 0 obj\n<< /Filter /Standard /V {v} /R {r} "
        f"/Length {n * 8} /P -44 /O <{o.hex()}> /U <{u.hex()}> "
        f">>\nendobj\n"
    ).encode()
    trailer_at = bytes(out).rfind(b"trailer")
    body = bytes(out[:trailer_at]) + enc_obj
    trailer = (
        b"trailer\n<< /Size " + str(enc_num + 1).encode()
        + b" /Root 1 0 R /Encrypt " + str(enc_num).encode() + b" 0 R"
        + b" /ID [ <" + doc_id.hex().encode() + b"> <"
        + doc_id.hex().encode() + b"> ] >>\nstartxref\n0\n%%EOF\n"
    )
    return body + trailer


class TestEncryptedPdf:
    def test_rc4_r3_roundtrip(self):
        pages = [["Secret page one", "second line"], ["page two"]]
        blob = encrypt_pdf(make_pdf(pages), r=3, key_bits=128)
        assert pdf_text_lines(blob) == pages

    def test_rc4_r2_40bit_roundtrip(self):
        pages = [["forty bit rc4"]]
        blob = encrypt_pdf(make_pdf(pages), r=2)
        assert pdf_text_lines(blob) == pages

    def test_rc4_uncompressed_roundtrip(self):
        pages = [["plain stream body"]]
        blob = encrypt_pdf(make_pdf(pages, compress=False), r=3)
        assert pdf_text_lines(blob) == pages

    def test_wrong_user_password_degrades(self):
        """A corrupted /U (≈ a real user password) must not decrypt —
        and must not crash: garbage streams degrade to no text."""
        pages = [["hidden"]]
        blob = bytearray(encrypt_pdf(make_pdf(pages), r=3))
        at = bytes(blob).find(b"/U <") + 4
        blob[at:at + 2] = b"00" if blob[at:at + 2] != b"00" else b"11"
        out = pdf_text_lines(bytes(blob))
        assert all("hidden" not in ln for pg in out for ln in pg)

    def test_unencrypted_unaffected(self):
        pages = [["no encryption here"]]
        assert pdf_text_lines(make_pdf(pages)) == pages


# --- encrypted PDFs (V4 crypt filters: AESV2 / V2) ------------------------
#
# The fixture carries its own FORWARD AES-128 built from log/antilog
# tables over the 0x03 generator — a different GF(2^8) construction than
# the library's square-and-multiply inverse — so encryptor and decryptor
# only agree if both match FIPS-197.


def _aes_tables_ref():
    log, alog = [0] * 256, [0] * 256
    x = 1
    for i in range(255):
        alog[i] = x
        log[x] = i
        y = ((x << 1) & 0xFF) ^ (0x1B if x & 0x80 else 0)  # x*2
        x = y ^ x  # x*3 (the generator)
    sbox = [0] * 256
    for a in range(256):
        inv = 0 if a == 0 else alog[(255 - log[a]) % 255]
        b = inv
        for sh in (1, 2, 3, 4):
            b ^= ((inv << sh) | (inv >> (8 - sh))) & 0xFF
        sbox[a] = b ^ 0x63
    return sbox, log, alog


_SBOX_REF, _LOG_REF, _ALOG_REF = _aes_tables_ref()


def _mul_ref(a: int, b: int) -> int:
    if a == 0 or b == 0:
        return 0
    return _ALOG_REF[(_LOG_REF[a] + _LOG_REF[b]) % 255]


def _key_schedule_ref(key: bytes) -> list[list[int]]:
    nk = len(key) // 4  # 4 (AES-128) or 8 (AES-256)
    nr = nk + 6
    w = [list(key[i:i + 4]) for i in range(0, len(key), 4)]
    rcon = 1
    for i in range(nk, 4 * (nr + 1)):
        t = list(w[i - 1])
        if i % nk == 0:
            t = [_SBOX_REF[t[1]], _SBOX_REF[t[2]], _SBOX_REF[t[3]],
                 _SBOX_REF[t[0]]]
            t[0] ^= rcon
            rcon = _mul_ref(rcon, 2)
        elif nk > 6 and i % nk == 4:
            t = [_SBOX_REF[b] for b in t]
        w.append([a ^ b for a, b in zip(w[i - nk], t)])
    return [sum((w[4 * r + c] for c in range(4)), []) for r in range(nr + 1)]


def _aes_encrypt_block_ref(ks: list[list[int]], block: bytes) -> bytes:
    nr = len(ks) - 1
    s = [a ^ b for a, b in zip(block, ks[0])]
    for rnd in range(1, nr + 1):
        s = [_SBOX_REF[b] for b in s]
        # ShiftRows: row r rotates left by r (flat index = 4*col + row)
        s = [s[4 * (((i // 4) + (i % 4)) % 4) + (i % 4)] for i in range(16)]
        if rnd != nr:
            ns = [0] * 16
            for c in range(0, 16, 4):
                col = s[c:c + 4]
                for r in range(4):
                    ns[c + r] = (
                        _mul_ref(col[r], 2)
                        ^ _mul_ref(col[(r + 1) % 4], 3)
                        ^ col[(r + 2) % 4] ^ col[(r + 3) % 4]
                    )
            s = ns
        s = [a ^ b for a, b in zip(s, ks[rnd])]
    return bytes(s)


def _aes_cbc_encrypt_ref(key: bytes, iv: bytes, data: bytes) -> bytes:
    ks = _key_schedule_ref(key)
    pad = 16 - len(data) % 16
    data = data + bytes([pad]) * pad
    out, prev = bytearray(iv), iv
    for at in range(0, len(data), 16):
        blk = bytes(a ^ b for a, b in zip(data[at:at + 16], prev))
        prev = _aes_encrypt_block_ref(ks, blk)
        out += prev
    return bytes(out)


def encrypt_pdf_v4(blob: bytes, cfm: str = "AESV2",
                   cf_first: bool = False) -> bytes:
    """V=4 R=4 crypt-filter encryption of a make_pdf()-shaped document
    with an empty user password: /StdCF carries /CFM /AESV2 (AES-128-
    CBC, IV-prefixed, PKCS#7) or /CFM /V2 (RC4).  Independent of the
    parser — Algorithms 1–5 re-derived here, forward AES from the
    log/antilog construction above.  ``cf_first`` serializes the /CF
    dict before (and without) the top-level /Length, the writer
    ordering that can mislead a naive key-length lookup."""
    import hashlib
    import re as _re

    PAD = bytes([
        0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
        0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
        0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
        0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
    ])
    n = 16
    p = -44 & 0xFFFFFFFF
    doc_id = hashlib.md5(blob).digest()

    oh = hashlib.md5(b"owner" + PAD[: 32 - 5]).digest()
    for _ in range(50):
        oh = hashlib.md5(oh[:n]).digest()
    okey = oh[:n]
    o = _rc4_ref(okey, PAD)
    for i in range(1, 20):
        o = _rc4_ref(bytes(b ^ i for b in okey), o)

    h = hashlib.md5(PAD + o + p.to_bytes(4, "little") + doc_id).digest()
    for _ in range(50):
        h = hashlib.md5(h[:n]).digest()
    key = h[:n]

    u = _rc4_ref(key, hashlib.md5(PAD + doc_id).digest())
    for i in range(1, 20):
        u = _rc4_ref(bytes(b ^ i for b in key), u)
    u = u + b"\x00" * 16

    # rebuild object by object: AES ciphertext is longer than the
    # plaintext, so /Length is patched (the parser scans sequentially
    # and ignores xref offsets)
    pieces: list[bytes] = []
    last = 0
    for m in _re.finditer(rb"(\d+)\s+(\d+)\s+obj\b", blob):
        em = blob.find(b"endobj", m.end())
        if em == -1:
            continue
        span = blob[m.start():em + 6]
        pieces.append(blob[last:m.start()])
        last = em + 6
        sm = _re.compile(rb"stream\r?\n").search(span)
        lm = _re.search(rb"/Length\s+(\d+)", span[: sm.start()] if sm else b"")
        if sm is None or lm is None:
            pieces.append(span)
            continue
        num = int(m.group(1))
        s0, s1 = sm.end(), sm.end() + int(lm.group(1))
        body = span[s0:s1]
        salt = b"sAlT" if cfm == "AESV2" else b""
        okey_obj = hashlib.md5(
            key + (num & 0xFFFFFF).to_bytes(3, "little") + b"\x00\x00" + salt
        ).digest()[: min(n + 5, 16)]
        if cfm == "AESV2":
            iv = hashlib.md5(b"iv" + num.to_bytes(4, "big")).digest()
            enc = _aes_cbc_encrypt_ref(okey_obj, iv, body)
        else:
            enc = _rc4_ref(okey_obj, body)
        header = _re.sub(
            rb"/Length\s+\d+", b"/Length %d" % len(enc), span[: sm.start()],
            count=1,
        )
        pieces.append(header + span[sm.start():s0] + enc + span[s1:])
    pieces.append(blob[last:])
    out = b"".join(pieces)

    enc_num = blob.count(b" 0 obj") + 1
    if cf_first:
        # dict key order is writer-dependent: /CF (whose /StdCF carries
        # its own BYTE-count /Length 16) before the top-level key-bit
        # /Length — and the top-level /Length omitted (default 128)
        enc_dict = (
            f"<< /Filter /Standard "
            f"/CF << /StdCF << /CFM /{cfm} /Length 16 >> >> "
            f"/StmF /StdCF /StrF /StdCF /V 4 /R 4 "
            f"/P -44 /O <{o.hex()}> /U <{u.hex()}> >>"
        )
    else:
        enc_dict = (
            f"<< /Filter /Standard /V 4 /R 4 /Length 128 "
            f"/CF << /StdCF << /CFM /{cfm} /Length 16 >> >> "
            f"/StmF /StdCF /StrF /StdCF "
            f"/P -44 /O <{o.hex()}> /U <{u.hex()}> >>"
        )
    enc_obj = f"{enc_num} 0 obj\n{enc_dict}\nendobj\n".encode()
    trailer_at = out.rfind(b"trailer")
    body_out = out[:trailer_at] + enc_obj
    trailer = (
        b"trailer\n<< /Size " + str(enc_num + 1).encode()
        + b" /Root 1 0 R /Encrypt " + str(enc_num).encode() + b" 0 R"
        + b" /ID [ <" + doc_id.hex().encode() + b"> <"
        + doc_id.hex().encode() + b"> ] >>\nstartxref\n0\n%%EOF\n"
    )
    return body_out + trailer


class TestAesEncryptedPdf:
    def test_fips197_known_answers(self):
        """Both sides pinned to the spec: the fixture's forward cipher
        produces the FIPS-197 ciphertexts, the parser's inverse cipher
        recovers the plaintexts (Appendix C.1 and Appendix B)."""
        from ragflow_ray.parsers.pdfbytes import (
            _aes_decrypt_block, _aes_key_schedule,
        )

        vectors = [
            ("000102030405060708090a0b0c0d0e0f",
             "00112233445566778899aabbccddeeff",
             "69c4e0d86a7b0430d8cdb78070b4c55a"),
            ("2b7e151628aed2a6abf7158809cf4f3c",
             "3243f6a8885a308d313198a2e0370734",
             "3925841d02dc09fbdc118597196a0b32"),
        ]
        for k, pt, ct in vectors:
            key, plain, cipher = (bytes.fromhex(x) for x in (k, pt, ct))
            assert _aes_encrypt_block_ref(_key_schedule_ref(key), plain) == cipher
            assert _aes_decrypt_block(_aes_key_schedule(key), cipher) == plain

    def test_aesv2_roundtrip(self):
        pages = [["AES secret page", "line two"], ["second page"]]
        blob = encrypt_pdf_v4(make_pdf(pages), cfm="AESV2")
        assert pdf_text_lines(blob) == pages

    def test_aesv2_uncompressed_roundtrip(self):
        pages = [["plain aes stream"]]
        blob = encrypt_pdf_v4(make_pdf(pages, compress=False), cfm="AESV2")
        assert pdf_text_lines(blob) == pages

    def test_v4_rc4_crypt_filter_roundtrip(self):
        """V=4 R=4 with /CFM /V2 — RC4 selected through the crypt-filter
        dictionary rather than the legacy V field."""
        pages = [["rc4 behind a crypt filter"]]
        blob = encrypt_pdf_v4(make_pdf(pages), cfm="V2")
        assert pdf_text_lines(blob) == pages

    def test_aesv2_wrong_user_password_degrades(self):
        pages = [["hidden aes"]]
        blob = bytearray(encrypt_pdf_v4(make_pdf(pages), cfm="AESV2"))
        at = bytes(blob).find(b"/U <") + 4
        blob[at:at + 2] = b"00" if blob[at:at + 2] != b"00" else b"11"
        out = pdf_text_lines(bytes(blob))
        assert all("hidden" not in ln for pg in out for ln in pg)

    def test_aesv3_out_of_subset_degrades(self):
        """V=5 stays undecrypted — no crash, no text leak."""
        pages = [["v5 secret"]]
        blob = encrypt_pdf_v4(make_pdf(pages), cfm="AESV2")
        blob = blob.replace(b"/V 4 /R 4", b"/V 5 /R 6")
        out = pdf_text_lines(blob)
        assert all("v5 secret" not in ln for pg in out for ln in pg)


def indirect_lengths(blob: bytes) -> bytes:
    """Rewrite every stream object's direct /Length N to an indirect
    '/Length <new> 0 R' whose target integer object is appended before
    the trailer — the Acrobat-style layout (post-encryption safe: only
    headers and the tail change)."""
    import re as _re

    next_num = max(
        int(m.group(1)) for m in _re.finditer(rb"(\d+)\s+0\s+obj\b", blob)
    ) + 1
    extra = []

    def swap(m):
        nonlocal next_num
        extra.append(
            b"%d 0 obj\n%s\nendobj\n" % (next_num, m.group(1))
        )
        out = b"/Length %d 0 R" % next_num
        next_num += 1
        return out

    body = _re.sub(rb"/Length\s+(\d+)(?![0-9])(?!\s+\d+\s+R)", swap, blob)
    at = body.rfind(b"trailer")
    return body[:at] + b"".join(extra) + body[at:]


class TestAesReviewRegressions:
    """Pinned fixes from the round-3 code review of the AES work."""

    def test_cf_dict_before_top_level_length(self):
        """/CF << /Length 16 >> serialized first (and the top-level
        /Length omitted) must not poison the key-length lookup."""
        pages = [["cf-first ordering"]]
        for cfm in ("AESV2", "V2"):
            blob = encrypt_pdf_v4(make_pdf(pages), cfm=cfm, cf_first=True)
            assert pdf_text_lines(blob) == pages, cfm

    def test_aes_stream_with_indirect_length(self):
        """AES streams whose /Length is an indirect reference decrypt,
        and the resolved target is re-pointed at the plaintext size."""
        pages = [["indirect length aes", "line two"], ["page two"]]
        blob = indirect_lengths(encrypt_pdf_v4(make_pdf(pages), cfm="AESV2"))
        assert pdf_text_lines(blob) == pages

    def test_rc4_stream_with_indirect_length(self):
        pages = [["indirect length rc4"]]
        blob = indirect_lengths(encrypt_pdf_v4(make_pdf(pages), cfm="V2"))
        assert pdf_text_lines(blob) == pages


# --- xref-driven object discovery + embedded JPEG figures ----------------


def make_tiny_jpeg(width: int = 6, height: int = 4) -> bytes:
    """A structurally valid JPEG container (SOI, SOF0 with dims, EOI).
    The payload contract needs a parseable header, not decodable
    pixels — downstream decode is stubbed in this container anyway."""
    sof = (b"\xff\xc0" + (8 + 3 * 1).to_bytes(2, "big") + b"\x08"
           + height.to_bytes(2, "big") + width.to_bytes(2, "big")
           + b"\x01" + b"\x01\x11\x00")
    return b"\xff\xd8" + sof + b"\xff\xd9"


def make_pdf_with_jpeg(lines: list[str], width: int = 6,
                       height: int = 4,
                       jpeg_bytes: bytes | None = None) -> bytes:
    """One text page whose /Resources reference a DCTDecode image."""
    jpeg = jpeg_bytes if jpeg_bytes is not None else make_tiny_jpeg(
        width, height)
    content = b"BT /F1 12 Tf 72 720 Td (" + lines[0].encode() + b") Tj ET"
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Count 1 /Kids [3 0 R] >>",
        (b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
         b"/Resources << /XObject << /Im1 5 0 R >> >> /Contents 4 0 R >>"),
        (b"<< /Length " + str(len(content)).encode() + b" >>\nstream\n"
         + content + b"\nendstream"),
        (b"<< /Type /XObject /Subtype /Image /Width "
         + str(width).encode() + b" /Height " + str(height).encode()
         + b" /ColorSpace /DeviceRGB /BitsPerComponent 8 "
         b"/Filter /DCTDecode /Length " + str(len(jpeg)).encode()
         + b" >>\nstream\n" + jpeg + b"\nendstream"),
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += str(i).encode() + b" 0 obj\n" + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 " + str(len(objs) + 1).encode() + b"\n"
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (b"trailer\n<< /Size " + str(len(objs) + 1).encode()
            + b" /Root 1 0 R >>\nstartxref\n" + str(xref_at).encode()
            + b"\n%%EOF\n")
    return bytes(out)


class TestXrefDiscovery:
    def test_classic_xref_route_used(self):
        from ragflow_ray.parsers.pdfbytes import _objects_from_xref, _objects_scan

        blob = make_pdf([["alpha"], ["beta"]])
        via_xref = _objects_from_xref(blob)
        assert via_xref is not None
        assert via_xref == _objects_scan(blob)

    def test_xref_stream_route_used(self):
        from ragflow_ray.parsers.pdfbytes import _objects_from_xref

        blob = make_pdf15([["packed page one"], ["packed page two"]])
        via_xref = _objects_from_xref(blob)
        assert via_xref is not None
        # the /Type /XRef stream file still extracts identically
        assert pdf_text_lines(blob) == [["packed page one"],
                                        ["packed page two"]]

    def test_lying_xref_falls_back_to_scan(self):
        from ragflow_ray.parsers.pdfbytes import _objects, _objects_from_xref

        blob = bytearray(make_pdf([["resilient"]]))
        # lie in the xref: object 1's entry now points at object 2's
        # header, so the strict number check must reject the route
        xref_at = bytes(blob).rfind(b"\nxref\n")
        first_entry = bytes(blob).find(b"0000000000 65535 f", xref_at)
        assert first_entry != -1
        entry2 = first_entry + 20
        obj2_at = bytes(blob).find(b"2 0 obj")
        blob[entry2 : entry2 + 10] = f"{obj2_at:010d}".encode()
        blob = bytes(blob)
        assert _objects_from_xref(blob) is None
        assert 1 in _objects(blob)  # scan still finds everything
        assert pdf_text_lines(blob) == [["resilient"]]

    def test_truncated_no_trailer_uses_scan(self):
        blob = make_pdf([["no xref at all"]])
        blob = blob[: blob.rfind(b"xref")]  # drop table + trailer
        assert pdf_text_lines(blob) == [["no xref at all"]]

    @staticmethod
    def _incremental_update(base: bytes, obj_num: int, body: bytes,
                            with_prev: bool) -> bytes:
        """Append one updated object + a classic xref section for it."""
        prev_at = base.rfind(b"\nxref\n") + 1
        out = bytearray(base)
        obj_at = len(out)
        out += (str(obj_num).encode() + b" 0 obj\n" + body + b"\nendobj\n")
        xref_at = len(out)
        out += (b"xref\n" + str(obj_num).encode() + b" 1\n"
                + f"{obj_at:010d} 00000 n \n".encode())
        trailer = b"trailer\n<< /Size 7 /Root 1 0 R"
        if with_prev:
            trailer += b" /Prev " + str(prev_at).encode()
        out += (trailer + b" >>\nstartxref\n" + str(xref_at).encode()
                + b"\n%%EOF\n")
        return bytes(out)

    def test_valid_incremental_update_keeps_xref_route(self):
        from ragflow_ray.parsers.pdfbytes import _objects_from_xref

        base = make_pdf([["alpha"], ["beta"]], compress=False)
        new = b"BT /F1 12 Tf 72 720 Td (gamma) Tj ET"
        body = (b"<< /Length " + str(len(new)).encode()
                + b" >>\nstream\n" + new + b"\nendstream")
        blob = self._incremental_update(base, 3, body, with_prev=True)
        assert _objects_from_xref(blob) is not None  # chain complete
        assert pdf_text_lines(blob) == [["gamma"], ["beta"]]

    def test_incomplete_chain_falls_back_to_scan(self):
        from ragflow_ray.parsers.pdfbytes import _objects_from_xref

        base = make_pdf([["alpha"], ["beta"]], compress=False)
        new = b"BT /F1 12 Tf 72 720 Td (gamma) Tj ET"
        body = (b"<< /Length " + str(len(new)).encode()
                + b" >>\nstream\n" + new + b"\nendstream")
        # the newest section's trailer drops /Prev: the chain now
        # accounts for ONE of /Size 7 objects — the completeness check
        # must abandon the xref route instead of silently extracting a
        # subset, and the scan still sees the whole file
        blob = self._incremental_update(base, 3, body, with_prev=False)
        assert _objects_from_xref(blob) is None
        assert pdf_text_lines(blob) == [["gamma"], ["beta"]]

    def test_free_entry_tombstones_deleted_object(self):
        from ragflow_ray.parsers.pdfbytes import _objects_from_xref

        base = make_pdf([["alpha"], ["beta"]], compress=False)
        prev_at = base.rfind(b"\nxref\n") + 1
        out = bytearray(base)
        xref_at = len(out)
        # delete page 2 (content 5 + page 6) in an incremental section
        out += (b"xref\n5 2\n"
                + b"0000000000 00001 f \n"
                + b"0000000000 00001 f \n")
        out += (b"trailer\n<< /Size 7 /Root 1 0 R /Prev "
                + str(prev_at).encode() + b" >>\nstartxref\n"
                + str(xref_at).encode() + b"\n%%EOF\n")
        blob = bytes(out)
        objs = _objects_from_xref(blob)
        assert objs is not None  # tombstones keep the chain complete
        # the deleted objects must NOT resurrect from the older
        # section's still-present in-use offsets
        assert 5 not in objs and 6 not in objs
        assert {1, 2, 3, 4} <= set(objs)

    def test_objstm_claim_shadows_older_direct_body(self):
        from ragflow_ray.parsers.pdfbytes import _objects_from_xref

        base = make_pdf([["alpha"], ["beta"]], compress=False)
        prev_at = base.rfind(b"\nxref\n") + 1
        # an update packs object 2 (the Pages node) into an ObjStm with
        # the Kids REVERSED; its type-2 entry must claim number 2 so
        # the stale direct body at the older section's offset is never
        # parsed (expansion's setdefault would otherwise lose to it)
        packed = b"<< /Type /Pages /Count 2 /Kids [6 0 R 4 0 R] >>"
        header = b"2 0\n"
        objstm_payload = zlib.compress(header + packed)
        objstm = (b"<< /Type /ObjStm /N 1 /First "
                  + str(len(header)).encode()
                  + b" /Filter /FlateDecode /Length "
                  + str(len(objstm_payload)).encode()
                  + b" >>\nstream\n" + objstm_payload + b"\nendstream")
        out = bytearray(base)
        objstm_at = len(out)
        out += b"7 0 obj\n" + objstm + b"\nendobj\n"
        xref_at = len(out)

        def entry(t: int, f2: int, f3: int) -> bytes:
            return bytes([t]) + f2.to_bytes(4, "big") + f3.to_bytes(2, "big")

        rows = (entry(2, 7, 0)      # obj 2: packed in ObjStm 7, index 0
                + entry(1, objstm_at, 0)   # obj 7
                + entry(1, xref_at, 0))    # obj 8 (this xref stream)
        payload = zlib.compress(rows)
        out += (b"8 0 obj\n<< /Type /XRef /W [1 4 2] /Index [2 1 7 2] "
                b"/Size 9 /Root 1 0 R /Prev " + str(prev_at).encode()
                + b" /Filter /FlateDecode /Length "
                + str(len(payload)).encode() + b" >>\nstream\n"
                + payload + b"\nendstream\nendobj\n")
        out += b"startxref\n" + str(xref_at).encode() + b"\n%%EOF\n"
        blob = bytes(out)
        objs = _objects_from_xref(blob)
        assert objs is not None
        assert 2 not in objs  # claimed by the ObjStm, not parsed stale
        # end-to-end: the packed Pages node wins → page order reversed
        assert pdf_text_lines(blob) == [["beta"], ["alpha"]]


class TestEmbeddedJpeg:
    def test_image_payload_extracted(self):
        from ragflow_ray.parsers.pdfbytes import pdf_image_payloads

        blob = make_pdf_with_jpeg(["figure page"], width=9, height=7)
        rows = pdf_image_payloads("docA", blob)
        assert len(rows) == 1
        r = rows[0]
        assert (r["page_no"], r["name"]) == (1, "Im1")
        assert (r["width"], r["height"]) == (9, 7)  # SOF, not /Width
        assert r["media_ref"] == "crop://docA/p1/Im1"
        assert r["payload"].startswith(b"\xff\xd8")
        assert r["payload"].endswith(b"\xff\xd9")

    def test_figures_ride_in_page_payload(self):
        import base64
        import json

        from ragflow_ray.parsers.pdfbytes import pdf_to_page_payloads

        blob = make_pdf_with_jpeg(["figure page"])
        spans = pdf_to_page_payloads("docB", blob)
        payload = json.loads(spans[0]["text"])
        figs = payload["figures"]
        assert len(figs) == 1
        assert figs[0]["codec"] == "jpeg"
        jpeg = base64.b64decode(figs[0]["image_b64"])
        assert jpeg.startswith(b"\xff\xd8")
        # text layer unaffected
        assert payload["boxes"][0]["text"] == "figure page"

    def test_media_feature_stage_consumes_pdf_figures(self, ray_session):
        """The multimodal actor stage runs over ingested-PDF media
        rows end-to-end (r3 verdict task 6's done condition)."""
        import hashlib

        import ray.data as rd

        from ragflow_ray.ops.multimodal import MediaFeatureStage
        from ragflow_ray.parsers.pdfbytes import pdf_image_payloads

        rows = []
        for d in range(4):
            blob = make_pdf_with_jpeg([f"doc {d}"], width=4 + d, height=3)
            for r in pdf_image_payloads(f"doc{d}", blob):
                rows.append({"doc_id": r["doc_id"], "payload": r["payload"]})
        ds = rd.from_items(rows).map_batches(
            MediaFeatureStage, fn_constructor_kwargs={"fake_decode": True},
            batch_format="pandas", batch_size=2, concurrency=2,
        )
        out = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
        assert len(out) == 4
        expect_md5 = hashlib.md5(
            bytes(rows[0]["payload"])).hexdigest()
        got = out.loc[out["doc_id"] == "doc0", "payload_md5"].iloc[0]
        assert got == expect_md5


def make_pdf_with_image_stream(stream: bytes, *, width: int, height: int,
                               colorspace: bytes = b"/DeviceRGB",
                               bpc: int = 8,
                               filter_entry: bytes = b"/Filter /FlateDecode "
                               ) -> bytes:
    """One text page whose /Resources reference an arbitrary image
    stream (the FlateDecode / unfiltered raw-figure construction)."""
    content = b"BT /F1 12 Tf 72 720 Td (raw figure page) Tj ET"
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Count 1 /Kids [3 0 R] >>",
        (b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
         b"/Resources << /XObject << /Im1 5 0 R >> >> /Contents 4 0 R >>"),
        (b"<< /Length " + str(len(content)).encode() + b" >>\nstream\n"
         + content + b"\nendstream"),
        (b"<< /Type /XObject /Subtype /Image /Width "
         + str(width).encode() + b" /Height " + str(height).encode()
         + b" /ColorSpace " + colorspace + b" /BitsPerComponent "
         + str(bpc).encode() + b" " + filter_entry
         + b"/Length " + str(len(stream)).encode()
         + b" >>\nstream\n" + stream + b"\nendstream"),
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += str(i).encode() + b" 0 obj\n" + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 " + str(len(objs) + 1).encode() + b"\n"
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (b"trailer\n<< /Size " + str(len(objs) + 1).encode()
            + b" /Root 1 0 R >>\nstartxref\n" + str(xref_at).encode()
            + b"\n%%EOF\n")
    return bytes(out)


class TestEmbeddedFlateRaw:
    """Flate/unfiltered 8-bit image XObjects → the self-describing
    raw container, decoded to exact pixels by ops.multimodal."""

    def _pixels(self, w: int, h: int, ncomp: int) -> bytes:
        return bytes((13 * i + 7) % 256 for i in range(w * h * ncomp))

    def test_flate_rgb_roundtrip(self):
        import zlib

        import numpy as np

        from ragflow_ray.ops.multimodal import decode_image
        from ragflow_ray.parsers.pdfbytes import pdf_image_payloads

        w, h = 9, 5
        pixels = self._pixels(w, h, 3)
        blob = make_pdf_with_image_stream(zlib.compress(pixels),
                                          width=w, height=h)
        rows = pdf_image_payloads("docR", blob)
        assert len(rows) == 1
        r = rows[0]
        assert r["codec"] == "raw"
        assert (r["width"], r["height"]) == (w, h)
        assert r["media_ref"] == "crop://docR/p1/Im1"
        arr = decode_image(r["payload"])
        assert arr.shape == (h, w, 3)
        assert arr.tobytes() == pixels

    def test_unfiltered_gray_replicates_channels(self):
        import numpy as np

        from ragflow_ray.ops.multimodal import decode_image
        from ragflow_ray.parsers.pdfbytes import pdf_image_payloads

        w, h = 4, 6
        pixels = self._pixels(w, h, 1)
        blob = make_pdf_with_image_stream(
            pixels, width=w, height=h, colorspace=b"/DeviceGray",
            filter_entry=b"")
        rows = pdf_image_payloads("docG", blob)
        assert len(rows) == 1 and rows[0]["codec"] == "raw"
        arr = decode_image(rows[0]["payload"])
        assert arr.shape == (h, w, 3)
        gray = np.frombuffer(pixels, dtype=np.uint8).reshape(h, w)
        assert (arr == gray[:, :, None]).all()

    def test_flate_with_png_predictor(self):
        """/DecodeParms PNG Up-filter rows un-predict through the
        shared filter machinery before the geometry check."""
        import zlib

        from ragflow_ray.ops.multimodal import decode_image
        from ragflow_ray.parsers.pdfbytes import pdf_image_payloads

        w, h = 5, 4
        pixels = self._pixels(w, h, 3)
        rowlen = w * 3
        enc = bytearray()
        prev = bytes(rowlen)
        for r in range(0, len(pixels), rowlen):
            row = pixels[r : r + rowlen]
            enc.append(2)  # PNG Up filter tag
            enc += bytes((row[i] - prev[i]) & 0xFF for i in range(rowlen))
            prev = row
        blob = make_pdf_with_image_stream(
            zlib.compress(bytes(enc)), width=w, height=h,
            filter_entry=(b"/Filter /FlateDecode /DecodeParms "
                          b"<< /Predictor 12 /Columns 5 /Colors 3 "
                          b"/BitsPerComponent 8 >> "))
        rows = pdf_image_payloads("docU", blob)
        assert len(rows) == 1 and rows[0]["codec"] == "raw"
        assert decode_image(rows[0]["payload"]).tobytes() == pixels

    def test_geometry_mismatch_skipped(self):
        import zlib

        from ragflow_ray.parsers.pdfbytes import pdf_image_payloads

        blob = make_pdf_with_image_stream(
            zlib.compress(b"\x00" * 10), width=9, height=5)
        assert pdf_image_payloads("docX", blob) == []

    def test_unsupported_depth_skipped(self):
        import zlib

        from ragflow_ray.parsers.pdfbytes import pdf_image_payloads

        w, h = 8, 4
        blob = make_pdf_with_image_stream(
            zlib.compress(b"\x00" * (w * h // 8)), width=w, height=h,
            colorspace=b"/DeviceGray", bpc=1)
        assert pdf_image_payloads("docB", blob) == []

    def test_raw_figure_rides_in_page_payload(self):
        import base64
        import json
        import zlib

        from ragflow_ray.parsers.pdfbytes import pdf_to_page_payloads

        w, h = 3, 2
        pixels = self._pixels(w, h, 3)
        blob = make_pdf_with_image_stream(zlib.compress(pixels),
                                          width=w, height=h)
        payload = json.loads(pdf_to_page_payloads("docP", blob)[0]["text"])
        figs = payload["figures"]
        assert len(figs) == 1 and figs[0]["codec"] == "raw"
        raw = base64.b64decode(figs[0]["image_b64"])
        assert raw.startswith(b"RFRAW1:") and raw.endswith(pixels)
        assert payload["boxes"][0]["text"] == "raw figure page"


# --- AESV3 (V5 R5/R6, AES-256) --------------------------------------------


def _aes_cbc_encrypt_nopad_ref(key: bytes, iv: bytes, data: bytes) -> bytes:
    ks = _key_schedule_ref(key)
    out, prev = bytearray(), iv
    for at in range(0, len(data), 16):
        prev = _aes_encrypt_block_ref(
            ks, bytes(a ^ b for a, b in zip(data[at:at + 16], prev)))
        out += prev
    return bytes(out)


def _hash_2b_ref(pwd: bytes, salt: bytes, udata: bytes = b"") -> bytes:
    """Independent Algorithm 2.B (ISO 32000-2) built on the fixture's
    log/antilog forward cipher — agrees with the parser's only if both
    match the spec."""
    import hashlib

    k = hashlib.sha256(pwd + salt + udata).digest()
    hashers = (hashlib.sha256, hashlib.sha384, hashlib.sha512)
    rnd = 0
    while True:
        k1 = (pwd + k + udata) * 64
        e = _aes_cbc_encrypt_nopad_ref(k[:16], k[16:32], k1)
        k = hashers[sum(e[:16]) % 3](e).digest()
        rnd += 1
        if rnd >= 64 and e[-1] <= rnd - 32:
            return k[:32]


def encrypt_pdf_v5(blob: bytes, r: int = 6) -> bytes:
    """AESV3 encryption (V=5, R=6 — or the deprecated R=5) of a
    make_pdf()-shaped document with an empty USER password: /U carries
    hash+validation-salt+key-salt, /UE the AES-256-wrapped file key;
    every stream body becomes IV-prefixed PKCS#7 AES-256-CBC under the
    file key directly (no per-object keys in V5)."""
    import hashlib
    import re as _re

    file_key = hashlib.sha256(b"v5-file-key-fixture").digest()  # 32 bytes
    vsalt = hashlib.md5(b"vsalt").digest()[:8]
    ksalt = hashlib.md5(b"ksalt").digest()[:8]
    if r == 6:
        u_hash = _hash_2b_ref(b"", vsalt)
        ik = _hash_2b_ref(b"", ksalt)
    else:
        u_hash = hashlib.sha256(vsalt).digest()
        ik = hashlib.sha256(ksalt).digest()
    u = u_hash + vsalt + ksalt  # 48 bytes
    ue = _aes_cbc_encrypt_nopad_ref(ik, b"\x00" * 16, file_key)
    # owner entries: present for shape, unused by the empty-user path
    o = hashlib.sha256(b"owner-hash").digest() + b"\x11" * 16
    oe = b"\x22" * 32

    def enc_stream(num: int, body: bytes) -> bytes:
        iv = hashlib.md5(b"iv5" + num.to_bytes(4, "big")).digest()
        pad = 16 - len(body) % 16
        data = body + bytes([pad]) * pad
        return iv + _aes_cbc_encrypt_nopad_ref(file_key, iv, data)

    pieces: list[bytes] = []
    last = 0
    for m in _re.finditer(rb"(\d+)\s+(\d+)\s+obj\b", blob):
        em = blob.find(b"endobj", m.end())
        if em == -1:
            continue
        span = blob[m.start():em + 6]
        pieces.append(blob[last:m.start()])
        last = em + 6
        sm = _re.compile(rb"stream\r?\n").search(span)
        lm = _re.search(rb"/Length\s+(\d+)", span[: sm.start()] if sm else b"")
        if sm is None or lm is None:
            pieces.append(span)
            continue
        s0, s1 = sm.end(), sm.end() + int(lm.group(1))
        enc = enc_stream(int(m.group(1)), span[s0:s1])
        header = _re.sub(
            rb"/Length\s+\d+", b"/Length %d" % len(enc), span[: sm.start()],
            count=1,
        )
        pieces.append(header + span[sm.start():s0] + enc + span[s1:])
    pieces.append(blob[last:])
    out = b"".join(pieces)

    enc_num = blob.count(b" 0 obj") + 1
    enc_dict = (
        f"<< /Filter /Standard /V 5 /R {r} /Length 256 "
        f"/CF << /StdCF << /CFM /AESV3 /Length 32 >> >> "
        f"/StmF /StdCF /StrF /StdCF /P -44 "
        f"/O <{o.hex()}> /U <{u.hex()}> /OE <{oe.hex()}> /UE <{ue.hex()}> >>"
    )
    enc_obj = f"{enc_num} 0 obj\n{enc_dict}\nendobj\n".encode()
    doc_id = __import__("hashlib").md5(blob).digest()
    trailer_at = out.rfind(b"trailer")
    body_out = out[:trailer_at] + enc_obj
    trailer = (
        b"trailer\n<< /Size " + str(enc_num + 1).encode()
        + b" /Root 1 0 R /Encrypt " + str(enc_num).encode() + b" 0 R"
        + b" /ID [ <" + doc_id.hex().encode() + b"> <"
        + doc_id.hex().encode() + b"> ] >>\nstartxref\n0\n%%EOF\n"
    )
    return body_out + trailer


class TestAesV3EncryptedPdf:
    def test_fips197_aes256_known_answer(self):
        """FIPS-197 Appendix C.3 (AES-256): fixture forward cipher
        produces the spec ciphertext, parser inverse recovers it."""
        from ragflow_ray.parsers.pdfbytes import (
            _aes_decrypt_block, _aes_key_schedule,
        )

        key = bytes.fromhex(
            "000102030405060708090a0b0c0d0e0f"
            "101112131415161718191a1b1c1d1e1f")
        plain = bytes.fromhex("00112233445566778899aabbccddeeff")
        cipher = bytes.fromhex("8ea2b7ca516745bfeafc49904b496089")
        assert _aes_encrypt_block_ref(_key_schedule_ref(key), plain) == cipher
        assert _aes_decrypt_block(_aes_key_schedule(key), cipher) == plain

    def test_hash_2b_agrees_across_cipher_cores(self):
        from ragflow_ray.parsers.pdfbytes import _hash_2b

        for pwd, salt in [(b"", b"saltsalt"), (b"pw", b"\x00" * 8),
                          (b"longer password bytes", b"abcdefgh")]:
            assert _hash_2b(pwd, salt) == _hash_2b_ref(pwd, salt)

    def test_aesv3_r6_roundtrip(self):
        pages = [["AES-256 secret page", "second line"], ["page two"]]
        blob = encrypt_pdf_v5(make_pdf(pages), r=6)
        assert pdf_text_lines(blob) == pages

    def test_aesv3_r5_roundtrip(self):
        pages = [["deprecated r5 revision"]]
        blob = encrypt_pdf_v5(make_pdf(pages), r=5)
        assert pdf_text_lines(blob) == pages

    def test_aesv3_uncompressed_roundtrip(self):
        pages = [["plain aes256 stream body"]]
        blob = encrypt_pdf_v5(make_pdf(pages, compress=False), r=6)
        assert pdf_text_lines(blob) == pages

    def test_real_user_password_degrades(self):
        """A non-empty user password fails /U verification: the doc
        stays undecrypted and extraction degrades to no text, without
        raising (the module's no-crash contract)."""
        blob = bytearray(encrypt_pdf_v5(make_pdf([["locked"]]), r=6))
        # corrupt the validation hash so the empty password can't verify
        import re as _re

        m = _re.search(rb"/U <([0-9a-f]+)>", bytes(blob))
        flipped = bytearray(bytes.fromhex(m.group(1).decode()))
        flipped[0] ^= 0xFF
        blob[m.start(1):m.end(1)] = flipped.hex().encode()
        pages = pdf_text_lines(bytes(blob))
        assert all(not any(ln.strip() for ln in page) for page in pages)


class TestEmbeddedJp2:
    def _make_jp2(self, width=5, height=3):
        # minimal JP2 container: signature box + jp2h/ihdr carrying dims
        sig = b"\x00\x00\x00\x0cjP  \r\n\x87\n"
        ihdr = (b"\x00\x00\x00\x16ihdr"
                + height.to_bytes(4, "big") + width.to_bytes(4, "big")
                + b"\x00\x03\x07\x00\x00\x00")
        return sig + b"\x00\x00\x00\x1ejp2h" + ihdr

    def test_jpx_payload_extracted(self):
        from ragflow_ray.parsers.pdfbytes import pdf_image_payloads

        jp2 = self._make_jp2(width=12, height=9)
        content = b"BT /F1 12 Tf 72 720 Td (jp2 page) Tj ET"
        objs = [
            b"<< /Type /Catalog /Pages 2 0 R >>",
            b"<< /Type /Pages /Count 1 /Kids [3 0 R] >>",
            (b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
             b"/Resources << /XObject << /Im9 5 0 R >> >> /Contents 4 0 R >>"),
            (b"<< /Length " + str(len(content)).encode() + b" >>\nstream\n"
             + content + b"\nendstream"),
            (b"<< /Type /XObject /Subtype /Image /Width 12 /Height 9 "
             b"/Filter /JPXDecode /Length " + str(len(jp2)).encode()
             + b" >>\nstream\n" + jp2 + b"\nendstream"),
        ]
        out = bytearray(b"%PDF-1.5\n")
        for i, body in enumerate(objs, start=1):
            out += str(i).encode() + b" 0 obj\n" + body + b"\nendobj\n"
        out += b"trailer\n<< /Size 6 /Root 1 0 R >>\nstartxref\n0\n%%EOF\n"
        rows = pdf_image_payloads("docJ", bytes(out))
        assert len(rows) == 1
        r = rows[0]
        assert r["codec"] == "jp2"
        assert (r["width"], r["height"]) == (12, 9)  # ihdr, not /Width
        assert r["payload"].startswith(b"\x00\x00\x00\x0cjP")

    def test_raw_codestream_dims(self):
        from ragflow_ray.parsers.pdfbytes import _jp2_dims

        siz = (b"\xff\x4f\xff\x51" + b"\x00\x29\x00\x00"
               + (640).to_bytes(4, "big") + (480).to_bytes(4, "big")
               + b"\x00" * 24)
        assert _jp2_dims(siz) == (640, 480)
