"""The "naive" (general) template chunker.

Behavioral parity with /root/reference/rag/app/naive.py:383-577: parse
per format, pack sections with ``greedy_merge``, emit table chunks
first then text chunks.  Format-specific paths:

* docx-like — caption/image pairing + image-carrying merge
  (``naive_merge_docx``, rag/nlp/__init__.py:659-693)
* pdf — DeepDOC box pipeline (naive.Pdf, naive.py:254-296): layout →
  table structure → horizontal merge → table/figure extraction →
  reading-order sort
* txt/code — pre-chunked by the txt parser, then re-merged
* markdown — tables extracted AND left inline (separate_tables=False)
* html — readability main-content lines
* json — recursive structure splitter
"""

from __future__ import annotations

from dataclasses import replace

from ..parsers.docxlike import combine_refs, parse_docx_spans
from ..parsers.excel import sheet_rows_to_html, sheet_rows_to_lines
from ..parsers.html import parse_html
from ..parsers.jsonp import parse_json
from ..parsers.markdown import parse_markdown
from ..parsers.txt import parse_txt
from ..text.delimiters import full_match_regex, split_regex
from ..text.merge import greedy_merge
from ..text.tokens import token_count
from .common import (
    ChunkConfig,
    SpanEmitter,
    build_doc_boxes,
    doc_sheets,
    doc_text,
    plain_pdf_lines,
)


def _merge_with_refs(
    sections: list[tuple[str, str | None]], cfg: ChunkConfig
) -> tuple[list[str], list[str | None]]:
    """``naive_merge_docx`` analogue: greedy merge that carries a
    combined media ref per chunk."""
    if not sections:
        return [], []
    chunks = [""]
    refs: list[str | None] = [None]
    counts = [0]

    def push(text: str, ref: str | None) -> None:
        n = token_count(text)
        if chunks[-1] == "" or counts[-1] > cfg.chunk_token_num:
            chunks.append(text)
            refs.append(ref)
            counts.append(n)
        else:
            chunks[-1] += text
            refs[-1] = combine_refs(refs[-1], ref)
            counts[-1] += n

    splitter = split_regex(cfg.delimiter)
    is_delim = full_match_regex(cfg.delimiter)
    for text, ref in sections:
        for frag in splitter.split(text):
            if is_delim.match(frag):
                continue
            push(frag, ref)
    return chunks, refs


def chunk_naive(doc: dict, cfg: ChunkConfig) -> list[dict]:
    fmt = doc.get("fmt", "txt")
    out = SpanEmitter()

    if fmt == "docx":
        lines, tables = parse_docx_spans(doc["spans"], doc["doc_id"])
        out.emit_tables([(("", t), "") for t in tables], cfg)
        chunks, refs = _merge_with_refs(lines, cfg)
        for ck, ref in zip(chunks, refs):
            if not ck.strip():
                continue
            out.emit("text", ck, ref or "")
        return out.to_dicts()

    if fmt == "pdf":
        if cfg.layout_mode == "plain":
            sections = [(ln, "") for ln in plain_pdf_lines(doc)]
            chunks = greedy_merge(
                sections, cfg.chunk_token_num, cfg.delimiter, cfg.overlapped_percent
            )
            out.emit_text_chunks(chunks)
            return out.to_dicts()
        boxes = build_doc_boxes(doc, drop=True)
        boxes.run_table_structure()
        boxes.merge_horizontal()
        tables = boxes.extract_tables_figures(need_figures=True, return_html=True)
        boxes.sort_reading_order()
        sections = [(b["text"], boxes.line_tag(b)) for b in boxes.boxes]
        out.emit_tables(tables, cfg)
        chunks = greedy_merge(
            sections, cfg.chunk_token_num, cfg.delimiter, cfg.overlapped_percent
        )
        out.emit_text_chunks(chunks, strip_tags=True)
        return out.to_dicts()

    if fmt == "excel":
        sheets = doc_sheets(doc)
        if cfg.html4excel:
            sections = [(t, "") for t in sheet_rows_to_html(sheets, 12) if t]
        else:
            sections = [(t, "") for t in sheet_rows_to_lines(sheets) if t]
        # reference bumps the budget so each row-line stays whole
        # (rag/app/naive.py:493)
        cfg = replace(cfg, chunk_token_num=12800)
        chunks = greedy_merge(sections, cfg.chunk_token_num, cfg.delimiter)
        out.emit_text_chunks(chunks)
        return out.to_dicts()

    if fmt == "markdown":
        text = doc_text(doc)
        sections, tables = parse_markdown(text, separate_tables=False)
        out.emit_tables([(("", t), "") for t in tables], cfg)
        chunks = greedy_merge(sections, cfg.chunk_token_num, cfg.delimiter)
        out.emit_text_chunks(chunks)
        return out.to_dicts()

    if fmt == "html":
        sections = [(s, "") for s in parse_html(doc_text(doc)) if s]
    elif fmt == "doc":
        # legacy binary Word: every non-empty line of the extracted
        # text is a section (rag/app/naive.py:534-545 sections the
        # Tika text the same way before naive_merge)
        sections = [(ln, "") for ln in doc_text(doc).split("\n") if ln]
    elif fmt == "json":
        sections = [(s, "") for s in parse_json(doc_text(doc), cfg.chunk_token_num) if s]
    else:  # txt / source code
        pre = parse_txt(doc_text(doc), cfg.chunk_token_num, cfg.delimiter)
        sections = [(c, "") for c in pre]

    chunks = greedy_merge(
        sections, cfg.chunk_token_num, cfg.delimiter, cfg.overlapped_percent
    )
    out.emit_text_chunks(chunks)
    return out.to_dicts()
