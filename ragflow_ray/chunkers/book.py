"""The "book" template chunker.

Parity with /root/reference/rag/app/book.py:65-152: parse per format,
strip the table of contents, vote a bullet family, and either build
hierarchical chunks (depth 5) or fall back to greedy merging with the
position tag split off each section.  The PDF path (book.Pdf,
book.py:30-62) adds vertical merge, TOC-page dropping and same-bullet
merging after table extraction.

The reference samples sections with unseeded ``random.choices`` before
language/bullet sniffing (book.py:88-89,132-133) — replaced by a
deterministic full scan (SURVEY.md §7.4).
"""

from __future__ import annotations

from ..parsers.docxlike import parse_docx_spans
from ..parsers.html import parse_html
from ..text.bullets import bullets_category
from ..text.lang import is_english_text
from ..text.merge import greedy_merge, promote_colon_titles, strip_toc_sections
from .common import ChunkConfig, SpanEmitter, build_doc_boxes, doc_text


def _pdf_sections(doc: dict, cfg: ChunkConfig, out: SpanEmitter):
    boxes = build_doc_boxes(doc, drop=True)
    boxes.run_table_structure()
    boxes.merge_horizontal()
    tables = boxes.extract_tables_figures(need_figures=True, return_html=True)
    boxes.merge_vertical()
    boxes.drop_toc_pages()
    boxes.merge_same_bullet()
    out.emit_tables(tables, cfg)
    return [
        (b["text"] + boxes.line_tag(b), b.get("layoutno", "")) for b in boxes.boxes
    ]


def chunk_book(doc: dict, cfg: ChunkConfig) -> list[dict]:
    fmt = doc.get("fmt", "txt")
    out = SpanEmitter()

    if fmt == "pdf":
        if cfg.layout_mode == "plain":
            from .common import plain_pdf_lines

            sections = [(ln, "") for ln in plain_pdf_lines(doc) if ln]
        else:
            sections = _pdf_sections(doc, cfg, out)
    elif fmt == "docx":
        lines, tables = parse_docx_spans(doc["spans"], doc["doc_id"])
        sections = [(t, "") for t, _ref in lines if t]
        strip_toc_sections(sections, eng=is_english_text([t for t, _ in sections]))
        out.emit_tables([(("", t), "") for t in tables], cfg)
    elif fmt == "html":
        sections = [(s, "") for s in parse_html(doc_text(doc)) if s]
        strip_toc_sections(sections, eng=is_english_text([t for t, _ in sections]))
    else:  # txt
        sections = [(line, "") for line in doc_text(doc).split("\n") if line]
        strip_toc_sections(sections, eng=is_english_text([t for t, _ in sections]))

    promote_colon_titles(sections)
    bull = bullets_category([t for t, _ in sections])
    if bull >= 0:
        from ..text.merge import hierarchical_merge

        chunks = ["\n".join(ck) for ck in hierarchical_merge(bull, sections, 5)]
    else:
        # split position tags back off: text before '@', tag after
        pairs = [s.split("@") for s, _ in sections]
        resections = [
            (p[0], "@" + p[1]) if len(p) == 2 else (p[0], "") for p in pairs
        ]
        chunks = greedy_merge(resections, 256, "\n。；！？")

    out.emit_text_chunks(chunks, strip_tags=(fmt == "pdf"))
    return out.to_dicts()
