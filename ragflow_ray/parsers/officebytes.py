"""Minimal from-scratch OOXML (.docx / .xlsx) byte ingestion.

No office codec libraries exist in this container, but OOXML is a ZIP
of XML — the stdlib covers the subset these pipelines need:

* .docx — ``word/document.xml`` body walked in document order:
  paragraphs become ``{"t": text, "style": name}`` payload spans
  (style ids resolve to display names via ``word/styles.xml``, and
  ``heading N`` names normalize to the ``Heading N`` form the outline
  walkers match); tables become ``{"table": {"rows": [...]}}`` with
  gridSpan-merged cells repeated, mirroring python-docx's
  ``row.cells`` behavior the colspan-merge renderer expects.
* .xlsx — sheets resolve through ``xl/workbook.xml`` + its rels;
  shared strings, inline strings, booleans and numbers decode;
  integral floats emit as ints; rows pad to the widest used column —
  producing the ``{"sheets": [{"name", "rows"}]}`` payload the excel
  parsers consume.

Deliberately out of scope (documented subset): embedded images/charts,
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


def docx_to_spans(blob: bytes) -> list[dict]:
    """.docx bytes → interleaved payload spans (paragraphs + tables in
    document order) for the docx-family chunkers."""
    zf = zipfile.ZipFile(io.BytesIO(blob))
    names = _style_names(zf)
    root = ElementTree.fromstring(zf.read("word/document.xml"))
    body = root.find(f"{_W}body")
    spans: list[dict] = []
    if body is None:
        return spans
    for child in body:
        if child.tag == f"{_W}p":
            payload = {"t": _para_text(child), "style": _para_style(child, names)}
        elif child.tag == f"{_W}tbl":
            payload = {"table": {"rows": _table_rows(child)}}
        else:
            continue
        spans.append(
            {
                "kind": "text",
                "text": json.dumps(payload, ensure_ascii=False),
                "media_ref": "",
                "offset": len(spans),
            }
        )
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


def xlsx_to_sheets_span(blob: bytes) -> list[dict]:
    return [
        {
            "kind": "text",
            "text": json.dumps({"sheets": xlsx_to_sheets(blob)}, ensure_ascii=False),
            "media_ref": "",
            "offset": 0,
        }
    ]
