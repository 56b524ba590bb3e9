"""Minimal from-scratch OOXML (.docx / .xlsx / .pptx) byte ingestion.

No office codec libraries exist in this container, but OOXML is a ZIP
of XML — the stdlib covers the subset these pipelines need:

* .docx — ``word/document.xml`` body walked in document order:
  paragraphs become ``{"t": text, "style": name}`` payload spans
  (style ids resolve to display names via ``word/styles.xml``, and
  ``heading N`` names normalize to the ``Heading N`` form the outline
  walkers match); tables become ``{"table": {"rows": [...]}}`` with
  gridSpan-merged cells repeated, mirroring python-docx's
  ``row.cells`` behavior the colspan-merge renderer expects; inline
  images (``w:drawing`` blips) become media spans addressed by their
  relationship target.
* .xlsx — sheets resolve through ``xl/workbook.xml`` + its rels;
  shared strings, inline strings, booleans and numbers decode;
  integral floats emit as ints; rows pad to the widest used column —
  producing the ``{"sheets": [{"name", "rows"}]}`` payload the excel
  parsers consume.
* .pptx — slides resolve through ``ppt/presentation.xml`` + its rels
  in presentation order; per slide, shapes sort by (top//10, left)
  EMUs, text frames emit bullet-prefixed paragraphs, a:tbl tables
  render "header: cell; ..." rows and group shapes recurse — the
  RAGFlowPptParser walk (deepdoc/parser/ppt_parser.py:27-108) over
  raw XML instead of python-pptx.

Deliberately out of scope (documented subset): chart objects,
footnotes/endnotes, vMerge vertical spans (the repeated-cell form),
formula recomputation (cached ``<v>`` values are used), and encrypted
containers.  Reference parity targets: python-docx paragraph walking
(rag/app/naive.py:80-183) and openpyxl row iteration
(deepdoc/parser/excel_parser.py:95-160).
"""

from __future__ import annotations

import io
import json
import re
import zipfile
from xml.etree import ElementTree

_W = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"
_S = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_R = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
_PR = "{http://schemas.openxmlformats.org/package/2006/relationships}"

_HEADING_NAME = re.compile(r"heading\s*(\d+)", re.IGNORECASE)
_CELL_REF = re.compile(r"([A-Z]+)([0-9]+)")


def _style_names(zf: zipfile.ZipFile) -> dict[str, str]:
    """styleId → display name (``Heading N`` normalized)."""
    try:
        root = ElementTree.fromstring(zf.read("word/styles.xml"))
    except (KeyError, ElementTree.ParseError):
        return {}
    names: dict[str, str] = {}
    for style in root.iter(f"{_W}style"):
        sid = style.get(f"{_W}styleId")
        name_el = style.find(f"{_W}name")
        if sid is None or name_el is None:
            continue
        name = name_el.get(f"{_W}val") or ""
        m = _HEADING_NAME.fullmatch(name.strip())
        if m:
            name = f"Heading {m.group(1)}"
        names[sid] = name
    return names


def _para_text(p) -> str:
    parts = []
    for t in p.iter(f"{_W}t"):
        parts.append(t.text or "")
    return "".join(parts)


def _para_style(p, names: dict[str, str]) -> str:
    el = p.find(f"{_W}pPr/{_W}pStyle")
    if el is None:
        return ""
    sid = el.get(f"{_W}val") or ""
    return names.get(sid, sid)


def _table_rows(tbl) -> list[list[str]]:
    rows = []
    for tr in tbl.findall(f"{_W}tr"):
        row: list[str] = []
        for tc in tr.findall(f"{_W}tc"):
            text = "\n".join(
                _para_text(p) for p in tc.findall(f"{_W}p")
            ).strip("\n")
            span_el = tc.find(f"{_W}tcPr/{_W}gridSpan")
            span = int(span_el.get(f"{_W}val", "1")) if span_el is not None else 1
            row.extend([text] * max(1, span))
        rows.append(row)
    return rows


def _docx_rels(zf: zipfile.ZipFile) -> dict[str, str]:
    """relationship Id → target (e.g. ``media/image1.png``)."""
    try:
        root = ElementTree.fromstring(zf.read("word/_rels/document.xml.rels"))
    except (KeyError, ElementTree.ParseError):
        return {}
    return {
        rel.get("Id") or "": rel.get("Target") or ""
        for rel in root.iter(f"{_PR}Relationship")
    }


def docx_to_spans(blob: bytes, doc_id: str = "docx") -> list[dict]:
    """.docx bytes → interleaved payload spans (paragraphs + tables in
    document order) for the docx-family chunkers.

    Inline images (``w:drawing`` → ``a:blip r:embed``) emit media
    spans in document order after their paragraph's text — the same
    interleaved form the payload corpus uses, so the real-bytes path
    reaches ``naive_merge_with_images`` like the payload path does
    (reference ``naive.Docx`` image extraction, rag/app/naive.py:39-251).
    """
    zf = zipfile.ZipFile(io.BytesIO(blob))
    names = _style_names(zf)
    rels = _docx_rels(zf)
    root = ElementTree.fromstring(zf.read("word/document.xml"))
    body = root.find(f"{_W}body")
    spans: list[dict] = []
    if body is None:
        return spans

    def add_text(payload: dict) -> None:
        spans.append(
            {
                "kind": "text",
                "text": json.dumps(payload, ensure_ascii=False),
                "media_ref": "",
                "offset": len(spans),
            }
        )

    for child in body:
        if child.tag == f"{_W}p":
            add_text({"t": _para_text(child), "style": _para_style(child, names)})
            for blip in child.iter(f"{_A}blip"):
                rid = blip.get(f"{_R}embed") or blip.get(f"{_R}link") or ""
                target = rels.get(rid, rid or "img")
                spans.append(
                    {
                        "kind": "media",
                        "text": "",
                        "media_ref": f"media://{doc_id}/{target}",
                        "offset": len(spans),
                    }
                )
        elif child.tag == f"{_W}tbl":
            add_text({"table": {"rows": _table_rows(child)}})
    return spans


def _col_index(ref: str) -> int:
    m = _CELL_REF.match(ref or "")
    if not m:
        return 0
    n = 0
    for ch in m.group(1):
        n = n * 26 + (ord(ch) - 64)
    return n - 1


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        root = ElementTree.fromstring(zf.read("xl/sharedStrings.xml"))
    except (KeyError, ElementTree.ParseError):
        return []
    out = []
    for si in root.findall(f"{_S}si"):
        out.append("".join(t.text or "" for t in si.iter(f"{_S}t")))
    return out


def _cell_value(c, shared: list[str]):
    ctype = c.get("t", "n")
    if ctype == "inlineStr":
        is_el = c.find(f"{_S}is")
        return "".join(t.text or "" for t in is_el.iter(f"{_S}t")) if is_el is not None else ""
    v = c.find(f"{_S}v")
    if v is None or v.text is None:
        return None
    if ctype == "s":
        try:
            return shared[int(v.text)]
        except (ValueError, IndexError):
            return v.text
    if ctype == "b":
        return "true" if v.text.strip() == "1" else "false"
    if ctype == "str":
        return v.text
    try:
        f = float(v.text)
        return int(f) if f.is_integer() else f
    except ValueError:
        return v.text


def xlsx_to_sheets(blob: bytes) -> list[dict]:
    """.xlsx bytes → ``[{"name", "rows"}]`` sheet payloads."""
    zf = zipfile.ZipFile(io.BytesIO(blob))
    shared = _shared_strings(zf)

    rels: dict[str, str] = {}
    try:
        rel_root = ElementTree.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
        for rel in rel_root.iter(f"{_PR}Relationship"):
            target = rel.get("Target") or ""
            rels[rel.get("Id") or ""] = (
                target if target.startswith("xl/") else f"xl/{target.lstrip('/')}"
            )
    except (KeyError, ElementTree.ParseError):
        pass

    sheets: list[dict] = []
    try:
        wb = ElementTree.fromstring(zf.read("xl/workbook.xml"))
    except (KeyError, ElementTree.ParseError):
        return sheets
    for sheet in wb.iter(f"{_S}sheet"):
        name = sheet.get("name") or f"Sheet{len(sheets) + 1}"
        path = rels.get(sheet.get(f"{_R}id") or "", "")
        if not path or path not in zf.namelist():
            continue
        root = ElementTree.fromstring(zf.read(path))
        rows: list[list] = []
        width = 0
        for row_el in root.iter(f"{_S}row"):
            row: list = []
            for c in row_el.findall(f"{_S}c"):
                idx = _col_index(c.get("r", ""))
                while len(row) < idx:
                    row.append(None)
                row.append(_cell_value(c, shared))
            width = max(width, len(row))
            rows.append(row)
        for row in rows:
            row.extend([None] * (width - len(row)))
        sheets.append({"name": name, "rows": rows})
    return sheets


def sheets_span(sheets: list[dict]) -> list[dict]:
    """Sheet payloads → the one-span excel corpus form (shared by the
    .xlsx path here and the legacy .xls path in olebytes)."""
    return [
        {
            "kind": "text",
            "text": json.dumps({"sheets": sheets}, ensure_ascii=False),
            "media_ref": "",
            "offset": 0,
        }
    ]


def xlsx_to_sheets_span(blob: bytes) -> list[dict]:
    return sheets_span(xlsx_to_sheets(blob))


# -- .pptx -----------------------------------------------------------------
#
# Parity target: RAGFlowPptParser (deepdoc/parser/ppt_parser.py:27-108) —
# the reference walks python-pptx slides; per slide, shapes sort by
# (top // 10, left), text frames emit bulleted paragraphs
# ("  "*level + "." + text when the paragraph carries buChar/buAutoNum/
# buBlip), tables render rows 1..n as "hdr0: cell0; hdr1: cell1; ...",
# and group shapes recurse over their sorted children.

_A = "{http://schemas.openxmlformats.org/drawingml/2006/main}"
_P = "{http://schemas.openxmlformats.org/presentationml/2006/main}"

_SLIDE_NUM = re.compile(r"slide(\d+)\.xml$")


def _pptx_off(el) -> tuple[int, int]:
    """(top, left) of a shape in EMUs (0,0 when unplaced — matching the
    reference's ``x.top if x.top is not None else 0`` guard)."""
    for xfrm_path in (f"{_P}spPr/{_A}xfrm", f"{_P}grpSpPr/{_A}xfrm",
                      f"{_P}xfrm", f"{_A}xfrm"):
        xfrm = el.find(xfrm_path)
        if xfrm is not None:
            off = xfrm.find(f"{_A}off")
            if off is not None:
                try:
                    return int(off.get("y", "0")), int(off.get("x", "0"))
                except ValueError:
                    return 0, 0
    return 0, 0


def _pptx_para_text(p) -> str:
    return "".join(t.text or "" for t in p.iter(f"{_A}t"))


def _pptx_txbody_text(txbody) -> str:
    texts = []
    for p in txbody.findall(f"{_A}p"):
        text = _pptx_para_text(p)
        if not text.strip():
            continue
        ppr = p.find(f"{_A}pPr")
        bulleted = ppr is not None and any(
            ppr.find(f"{_A}{tag}") is not None
            for tag in ("buChar", "buAutoNum", "buBlip")
        )
        if bulleted:
            try:
                level = int(ppr.get("lvl", "0") or 0)
            except ValueError:  # malformed lvl attr: one paragraph's
                level = 0       # indent, not the whole deck, degrades
            texts.append(f"{'  ' * level}.{text}")
        else:
            texts.append(text)
    return "\n".join(texts)


def _pptx_table_text(tbl) -> str:
    cells: list[list[str]] = []
    for tr in tbl.findall(f"{_A}tr"):
        cells.append(
            [
                "\n".join(_pptx_para_text(p) for p in tc.iter(f"{_A}p"))
                for tc in tr.findall(f"{_A}tc")
            ]
        )
    if not cells:
        return ""
    n_cols = len(tbl.findall(f"{_A}tblGrid/{_A}gridCol")) or len(cells[0])
    header = cells[0] + [""] * (n_cols - len(cells[0]))
    rows = []
    for row in cells[1:]:
        row = row + [""] * (n_cols - len(row))
        rows.append("; ".join(f"{header[j]}: {row[j]}" for j in range(n_cols)))
    return "\n".join(rows)


def _pptx_shape_text(shape) -> str:
    if shape.tag == f"{_P}sp":
        txbody = shape.find(f"{_P}txBody")
        return _pptx_txbody_text(txbody) if txbody is not None else ""
    if shape.tag == f"{_P}graphicFrame":
        for t in shape.iter(f"{_A}tbl"):
            return _pptx_table_text(t)
        return ""
    if shape.tag == f"{_P}grpSp":
        texts = []
        for child in _sorted_shapes(shape):
            t = _pptx_shape_text(child)
            if t:
                texts.append(t)
        return "\n".join(texts)
    return ""


def _sorted_shapes(parent) -> list:
    shapes = [
        el for el in parent
        if el.tag in (f"{_P}sp", f"{_P}graphicFrame", f"{_P}grpSp")
    ]
    keyed = [(_pptx_off(el), i, el) for i, el in enumerate(shapes)]
    keyed.sort(key=lambda k: (k[0][0] // 10, k[0][1], k[1]))
    return [el for _, _, el in keyed]


def _slide_paths(zf: zipfile.ZipFile) -> list[str]:
    """Slide part paths in presentation order (sldIdLst walk through
    the rels; numeric-filename fallback)."""
    rels: dict[str, str] = {}
    try:
        rel_root = ElementTree.fromstring(
            zf.read("ppt/_rels/presentation.xml.rels")
        )
        for rel in rel_root.iter(f"{_PR}Relationship"):
            target = (rel.get("Target") or "").lstrip("/")
            rels[rel.get("Id") or ""] = (
                target if target.startswith("ppt/") else f"ppt/{target}"
            )
    except (KeyError, ElementTree.ParseError):
        pass
    try:
        pres = ElementTree.fromstring(zf.read("ppt/presentation.xml"))
        order = [
            rels.get(sld.get(f"{_R}id") or "", "")
            for sld in pres.iter(f"{_P}sldId")
        ]
        order = [p for p in order if p and p in zf.namelist()]
        if order:
            return order
    except (KeyError, ElementTree.ParseError):
        pass
    slides = [n for n in zf.namelist() if _SLIDE_NUM.search(n)
              and n.startswith("ppt/slides/")]
    return sorted(slides, key=lambda n: int(_SLIDE_NUM.search(n).group(1)))


def pptx_to_slide_texts(blob: bytes) -> list[str]:
    """.pptx bytes → per-slide text (RAGFlowPptParser.__call__ shape:
    one string per slide, shapes in (top//10, left) order)."""
    zf = zipfile.ZipFile(io.BytesIO(blob))
    out = []
    for path in _slide_paths(zf):
        try:
            root = ElementTree.fromstring(zf.read(path))
        except (KeyError, ElementTree.ParseError):
            out.append("")
            continue
        tree = root.find(f"{_P}cSld/{_P}spTree")
        texts = []
        if tree is not None:
            for shape in _sorted_shapes(tree):
                t = _pptx_shape_text(shape)
                if t:
                    texts.append(t)
        out.append("\n".join(texts))
    return out


def pptx_to_slide_spans(blob: bytes, doc_id: str = "pptx") -> list[dict]:
    """.pptx bytes → the slides payload form the presentation chunker
    consumes (one media span per slide, ``{"page_no", "text"}``)."""
    spans = []
    for pn, text in enumerate(pptx_to_slide_texts(blob), start=1):
        spans.append(
            {
                "kind": "media",
                "text": json.dumps({"page_no": pn, "text": text},
                                   ensure_ascii=False),
                "media_ref": f"media://{doc_id}/slide{pn}",
                "offset": pn - 1,
            }
        )
    return spans
