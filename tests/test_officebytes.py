"""Stdlib OOXML ingestion (parsers/officebytes.py).

The writers below build real ZIP+XML .docx/.xlsx containers by hand,
so the extractor is tested against actual OOXML structure.
"""

from __future__ import annotations

import io
import json
import zipfile

from ragflow_ray.parsers.officebytes import (
    docx_to_spans,
    xlsx_to_sheets,
)

_W_NS = 'xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main"'
_S_NS = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
_R_NS = 'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"'


_A_NS = 'xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main"'


def make_docx(blocks: list) -> bytes:
    """blocks: ("p", text, styleId|None), ("img", relId, target) or
    ("tbl", rows, spans_per_row)."""
    body = []
    rels = []
    for block in blocks:
        if block[0] == "p":
            _, text, style = block
            ppr = f"<w:pPr><w:pStyle w:val='{style}'/></w:pPr>" if style else ""
            body.append(f"<w:p>{ppr}<w:r><w:t>{text}</w:t></w:r></w:p>")
        elif block[0] == "img":
            _, rid, target = block
            rels.append((rid, target))
            body.append(
                f"<w:p {_A_NS} {_R_NS}><w:r><w:drawing>"
                f"<a:graphic><a:graphicData><a:blip r:embed='{rid}'/>"
                "</a:graphicData></a:graphic>"
                "</w:drawing></w:r></w:p>"
            )
        else:
            _, rows, spans = block
            trs = []
            for row, row_spans in zip(rows, spans):
                tcs = []
                for cell, span in zip(row, row_spans):
                    spanxml = (
                        f"<w:tcPr><w:gridSpan w:val='{span}'/></w:tcPr>"
                        if span > 1 else ""
                    )
                    tcs.append(
                        f"<w:tc>{spanxml}<w:p><w:r><w:t>{cell}</w:t></w:r></w:p></w:tc>"
                    )
                trs.append("<w:tr>" + "".join(tcs) + "</w:tr>")
            body.append("<w:tbl>" + "".join(trs) + "</w:tbl>")
    document = (
        f"<w:document {_W_NS}><w:body>" + "".join(body) + "</w:body></w:document>"
    )
    styles = (
        f"<w:styles {_W_NS}>"
        "<w:style w:type='paragraph' w:styleId='Heading1'>"
        "<w:name w:val='heading 1'/></w:style>"
        "<w:style w:type='paragraph' w:styleId='Heading2'>"
        "<w:name w:val='heading 2'/></w:style>"
        "<w:style w:type='paragraph' w:styleId='Caption'>"
        "<w:name w:val='Caption'/></w:style>"
        "</w:styles>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("word/document.xml", document)
        zf.writestr("word/styles.xml", styles)
        if rels:
            zf.writestr(
                "word/_rels/document.xml.rels",
                '<Relationships xmlns="http://schemas.openxmlformats.org/'
                'package/2006/relationships">'
                + "".join(
                    f"<Relationship Id='{rid}' Type='x' Target='{t}'/>"
                    for rid, t in rels
                )
                + "</Relationships>",
            )
            for _, t in rels:
                zf.writestr(f"word/{t}", b"\x89PNGfake")
    return buf.getvalue()


def make_xlsx(sheets: dict[str, list[list]]) -> bytes:
    """sheets: name → rows (str / int / float / bool / None cells)."""
    shared: list[str] = []

    def cell_xml(ref: str, value):
        if value is None:
            return ""
        if isinstance(value, bool):
            return f"<c r='{ref}' t='b'><v>{1 if value else 0}</v></c>"
        if isinstance(value, (int, float)):
            return f"<c r='{ref}'><v>{value}</v></c>"
        if value not in shared:
            shared.append(value)
        return f"<c r='{ref}' t='s'><v>{shared.index(value)}</v></c>"

    sheet_xmls = []
    for rows in sheets.values():
        row_xml = []
        for rn, row in enumerate(rows, start=1):
            cells = "".join(
                cell_xml(f"{chr(65 + ci)}{rn}", v) for ci, v in enumerate(row)
            )
            row_xml.append(f"<row r='{rn}'>{cells}</row>")
        sheet_xmls.append(
            f"<worksheet {_S_NS}><sheetData>" + "".join(row_xml)
            + "</sheetData></worksheet>"
        )

    names = list(sheets)
    wb_sheets = "".join(
        f"<sheet name='{n}' sheetId='{i+1}' r:id='rId{i+1}'/>"
        for i, n in enumerate(names)
    )
    workbook = (
        f"<workbook {_S_NS} {_R_NS}><sheets>{wb_sheets}</sheets></workbook>"
    )
    rels = (
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/'
        'relationships">'
        + "".join(
            f"<Relationship Id='rId{i+1}' Type='x' "
            f"Target='worksheets/sheet{i+1}.xml'/>"
            for i in range(len(names))
        )
        + "</Relationships>"
    )
    sst = (
        f"<sst {_S_NS}>"
        + "".join(f"<si><t>{s}</t></si>" for s in shared)
        + "</sst>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("xl/workbook.xml", workbook)
        zf.writestr("xl/_rels/workbook.xml.rels", rels)
        zf.writestr("xl/sharedStrings.xml", sst)
        for i, xml in enumerate(sheet_xmls):
            zf.writestr(f"xl/worksheets/sheet{i+1}.xml", xml)
    return buf.getvalue()


class TestDocxBytes:
    def test_paragraphs_and_heading_styles(self):
        blob = make_docx([
            ("p", "Section One", "Heading1"),
            ("p", "body paragraph text", None),
            ("p", "Sub Point", "Heading2"),
        ])
        spans = docx_to_spans(blob)
        payloads = [json.loads(s["text"]) for s in spans]
        assert payloads[0] == {"t": "Section One", "style": "Heading 1"}
        assert payloads[1] == {"t": "body paragraph text", "style": ""}
        assert payloads[2]["style"] == "Heading 2"

    def test_table_with_gridspan(self):
        blob = make_docx([
            ("tbl", [["merged", "tail"], ["a", "b", "c"]], [[2, 1], [1, 1, 1]]),
        ])
        payload = json.loads(docx_to_spans(blob)[0]["text"])
        # gridSpan repeats the merged cell like python-docx row.cells
        assert payload["table"]["rows"] == [["merged", "merged", "tail"],
                                            ["a", "b", "c"]]

    def test_inline_image_spans(self):
        """w:drawing blips emit media spans in document order with
        relationship-target refs (round-3 task: the real-bytes path
        reaches the image-carrying merge like the payload path)."""
        blob = make_docx([
            ("p", "before image", None),
            ("img", "rId5", "media/image1.png"),
            ("p", "Figure 1: a caption", "Caption"),
            ("p", "after image", None),
        ])
        spans = docx_to_spans(blob, "mydoc")
        kinds = [s["kind"] for s in spans]
        # image paragraph emits its (empty) text span then the media span
        assert kinds == ["text", "text", "media", "text", "text"]
        media = spans[2]
        assert media["media_ref"] == "media://mydoc/media/image1.png"
        assert [s["offset"] for s in spans] == list(range(5))

    def test_image_reaches_naive_chunker_merge(self):
        from ragflow_ray.chunkers import ChunkConfig, chunk_document

        blob = make_docx([
            ("p", "Intro paragraph text.", None),
            ("img", "rId1", "media/image9.png"),
            ("p", "Figure 1: the caption.", "Caption"),
        ])
        doc = {"doc_id": "di", "fmt": "docx", "spans": docx_to_spans(blob, "di")}
        spans = chunk_document(doc, "naive", ChunkConfig())
        refs = [s["media_ref"] for s in spans if s["media_ref"]]
        assert any("media/image9.png" in r for r in refs)

    def test_feeds_laws_chunker(self):
        from ragflow_ray.chunkers import ChunkConfig, chunk_document

        blob = make_docx([
            ("p", "Section 1", "Heading1"),
            ("p", "first body clause", None),
            ("p", "Section 2", "Heading1"),
            ("p", "second body clause", None),
        ])
        doc = {"doc_id": "dx", "fmt": "docx", "spans": docx_to_spans(blob)}
        spans = chunk_document(doc, "laws", ChunkConfig())
        texts = [s["text"] for s in spans]
        assert texts == ["Section 1\nfirst body clause",
                         "Section 2\nsecond body clause"]


class TestXlsxBytes:
    def test_values_and_types(self):
        blob = make_xlsx({"Data": [
            ["name", "score", "ok"],
            ["alpha", 3, True],
            ["beta", 2.5, False],
            [None, 7, None],
        ]})
        sheets = xlsx_to_sheets(blob)
        assert sheets[0]["name"] == "Data"
        assert sheets[0]["rows"] == [
            ["name", "score", "ok"],
            ["alpha", 3, "true"],
            ["beta", 2.5, "false"],
            [None, 7, None],
        ]

    def test_multi_sheet_and_qa(self):
        from ragflow_ray.chunkers import ChunkConfig, chunk_document
        from ragflow_ray.parsers.officebytes import xlsx_to_sheets_span

        blob = make_xlsx({
            "S1": [["What is A?", "A is first."]],
            "S2": [["What is B?", "B is second."]],
        })
        doc = {"doc_id": "xq", "fmt": "excel", "spans": xlsx_to_sheets_span(blob)}
        spans = chunk_document(doc, "qa", ChunkConfig())
        assert [s["text"] for s in spans] == [
            "Question: What is A?\tAnswer: is first.",
            "Question: What is B?\tAnswer: B is second.",
        ]


_P_NS = (
    'xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main" '
    'xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main" '
    'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"'
)


def _sp_xml(paragraphs: list, top: int, left: int) -> str:
    """paragraphs: (text, bullet_level|None)."""
    paras = []
    for text, lvl in paragraphs:
        if lvl is None:
            paras.append(f"<a:p><a:r><a:t>{text}</a:t></a:r></a:p>")
        else:
            paras.append(
                f"<a:p><a:pPr lvl='{lvl}'><a:buChar char='•'/></a:pPr>"
                f"<a:r><a:t>{text}</a:t></a:r></a:p>"
            )
    return (
        f"<p:sp><p:spPr><a:xfrm><a:off x='{left}' y='{top}'/></a:xfrm></p:spPr>"
        f"<p:txBody>{''.join(paras)}</p:txBody></p:sp>"
    )


def _tbl_xml(rows: list[list[str]], top: int, left: int) -> str:
    grid = "".join("<a:gridCol/>" for _ in rows[0])
    trs = []
    for row in rows:
        tcs = "".join(
            f"<a:tc><a:txBody><a:p><a:r><a:t>{c}</a:t></a:r></a:p></a:txBody></a:tc>"
            for c in row
        )
        trs.append(f"<a:tr>{tcs}</a:tr>")
    return (
        f"<p:graphicFrame><p:xfrm><a:off x='{left}' y='{top}'/></p:xfrm>"
        "<a:graphic><a:graphicData>"
        f"<a:tbl><a:tblGrid>{grid}</a:tblGrid>{''.join(trs)}</a:tbl>"
        "</a:graphicData></a:graphic></p:graphicFrame>"
    )


def make_pptx(slides: list[list[str]]) -> bytes:
    """slides: list of shape-XML lists (use _sp_xml/_tbl_xml)."""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        sld_ids = "".join(
            f"<p:sldId id='{256 + i}' r:id='rId{i + 1}'/>"
            for i in range(len(slides))
        )
        zf.writestr(
            "ppt/presentation.xml",
            f"<p:presentation {_P_NS}><p:sldIdLst>{sld_ids}</p:sldIdLst>"
            "</p:presentation>",
        )
        zf.writestr(
            "ppt/_rels/presentation.xml.rels",
            '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
            '2006/relationships">'
            + "".join(
                f"<Relationship Id='rId{i + 1}' Type='x' "
                f"Target='slides/slide{i + 1}.xml'/>"
                for i in range(len(slides))
            )
            + "</Relationships>",
        )
        for i, shapes in enumerate(slides):
            zf.writestr(
                f"ppt/slides/slide{i + 1}.xml",
                f"<p:sld {_P_NS}><p:cSld><p:spTree>{''.join(shapes)}"
                "</p:spTree></p:cSld></p:sld>",
            )
    return buf.getvalue()


class TestPptxBytes:
    def test_shape_order_and_bullets(self):
        from ragflow_ray.parsers.officebytes import pptx_to_slide_texts

        blob = make_pptx([
            [
                # body placed BELOW the title but listed first in XML —
                # (top//10, left) ordering must put the title first
                _sp_xml([("first point", 0), ("sub point", 1)], top=2000, left=0),
                _sp_xml([("Slide Title", None)], top=100, left=0),
            ],
            [_sp_xml([("second slide", None)], top=0, left=0)],
        ])
        texts = pptx_to_slide_texts(blob)
        assert texts == [
            "Slide Title\n.first point\n  .sub point",
            "second slide",
        ]

    def test_table_rendering(self):
        from ragflow_ray.parsers.officebytes import pptx_to_slide_texts

        blob = make_pptx([
            [_tbl_xml([["name", "score"], ["alpha", "3"], ["beta", "7"]],
                      top=0, left=0)],
        ])
        assert pptx_to_slide_texts(blob) == [
            "name: alpha; score: 3\nname: beta; score: 7"
        ]

    def test_presentation_chunker_end_to_end(self):
        from ragflow_ray.chunkers import ChunkConfig, chunk_document
        from ragflow_ray.parsers.officebytes import pptx_to_slide_spans

        blob = make_pptx([
            [_sp_xml([("Intro", None)], top=0, left=0)],
            [_sp_xml([("Conclusion", None)], top=0, left=0)],
        ])
        doc = {"doc_id": "deck", "fmt": "ppt",
               "spans": pptx_to_slide_spans(blob, "deck")}
        spans = chunk_document(doc, "presentation", ChunkConfig())
        assert [(s["text"], s["media_ref"]) for s in spans] == [
            ("Intro", "media://deck/slide1"),
            ("Conclusion", "media://deck/slide2"),
        ]


import pytest


@pytest.mark.usefixtures("ray_session")
class TestIngestOffice:
    def test_ingest_docx_xlsx(self, tmp_path):
        from ragflow_ray.sources.ingest import read_text_files

        (tmp_path / "d.docx").write_bytes(
            make_docx([("p", "hello docx world", None)])
        )
        (tmp_path / "s.xlsx").write_bytes(
            make_xlsx({"Sheet1": [["h1", "h2"], ["v1", "v2"]]})
        )
        rows = {r["doc_id"]: r for r in read_text_files(str(tmp_path)).take_all()}
        assert rows["d.docx"]["fmt"] == "docx"
        assert json.loads(rows["d.docx"]["spans"][0]["text"])["t"] == "hello docx world"
        assert rows["s.xlsx"]["fmt"] == "excel"
        assert "Sheet1" in rows["s.xlsx"]["spans"][0]["text"]

    def test_ingest_pptx(self, tmp_path):
        from ragflow_ray.sources.ingest import read_text_files

        (tmp_path / "deck.pptx").write_bytes(
            make_pptx([[_sp_xml([("Only Slide", None)], top=0, left=0)]])
        )
        rows = {r["doc_id"]: r for r in read_text_files(str(tmp_path)).take_all()}
        assert rows["deck.pptx"]["fmt"] == "ppt"
        assert rows["deck.pptx"]["template"] == "presentation"
        payload = json.loads(rows["deck.pptx"]["spans"][0]["text"])
        assert payload == {"page_no": 1, "text": "Only Slide"}
        assert rows["deck.pptx"]["spans"][0]["media_ref"] == "media://deck.pptx/slide1"

    def test_ingest_skips_corrupt_file(self, tmp_path):
        """One bad file degrades to an empty-span error row; the good
        file still ingests (ADVICE r02: per-file containment)."""
        from ragflow_ray.sources.ingest import read_text_files

        (tmp_path / "bad.docx").write_bytes(b"this is not a zip archive")
        (tmp_path / "good.txt").write_text("plain text survives")
        rows = {r["doc_id"]: r for r in read_text_files(str(tmp_path)).take_all()}
        assert rows["bad.docx"]["fmt"] == "error"
        assert list(rows["bad.docx"]["spans"]) == []
        assert rows["good.txt"]["spans"][0]["text"] == "plain text survives"
