"""The "one" template chunker — whole document as a single chunk.

Parity with /root/reference/rag/app/one.py:28-132: the PDF path keeps
headers/footers (``drop=False``), interleaves table rows back by
position, and sorts sections by (page, top, x0); every other format
just joins its sections.  Output: one text span with the full
document.
"""

from __future__ import annotations

from ..parsers.docxlike import parse_docx_spans
from ..parsers.html import parse_html
from .common import ChunkConfig, SpanEmitter, build_doc_boxes, doc_text


def chunk_one(doc: dict, cfg: ChunkConfig) -> list[dict]:
    fmt = doc.get("fmt", "txt")

    if fmt == "pdf":
        boxes = build_doc_boxes(doc, drop=False)
        boxes.run_table_structure()
        boxes.merge_horizontal()
        tables = boxes.extract_tables_figures(need_figures=True, return_html=True)
        boxes.sort_reading_order()
        entries = [
            (b["text"], boxes.positions_of(b)) for b in boxes.boxes
        ]
        for (ref, rows), poss in tables:
            if not rows:
                continue
            text = rows if isinstance(rows, str) else rows[0]
            entries.append(
                (text, [(p[0] + 1, p[1], p[2], p[3], p[4]) for p in poss])
            )
        entries.sort(key=lambda e: (e[1][0][0], e[1][0][3], e[1][0][1]))
        sections = [txt for txt, _ in entries if txt]
    elif fmt == "docx":
        lines, tables = parse_docx_spans(doc["spans"], doc["doc_id"])
        sections = [t for t, _ in lines if t]
        sections.extend(tables)
    elif fmt == "excel":
        from ..parsers.excel import sheet_rows_to_html
        from .common import doc_sheets

        sections = sheet_rows_to_html(doc_sheets(doc), 1_000_000_000)
    elif fmt == "html":
        sections = [s for s in parse_html(doc_text(doc)) if s]
    else:
        sections = [s for s in doc_text(doc).split("\n") if s]

    out = SpanEmitter()
    text = "\n".join(sections)
    if text.strip():
        out.emit("text", text)
    return out.to_dicts()
