"""The "paper" template chunker (PDF only).

Parity with /root/reference/rag/app/paper.py:27-211:

* naive box pipeline + table extraction, then two-column reorder when
  the median box width is under half the page width (paper.py:58-67);
* whitespace squeeze on every box;
* title = first title-layout box among the first 32 (unless it is a
  front-matter keyword), authors = the following non-front-matter
  line; abstract = the first long "abstract"-keyword box (or its
  successor);
* remaining text/title boxes become sections, grouped between pivots
  of the most frequent title level (``title_frequency``), one chunk
  per group.
"""

from __future__ import annotations

import re
from statistics import median

from ..text.bullets import bullets_category, title_frequency
from ..text.merge import strip_position_tags
from .common import ChunkConfig, SpanEmitter, build_doc_boxes

_FRONT_MATTER = re.compile(
    r"[0-9. 一、i]*(introduction|abstract|摘要|引言|keywords|key words|关键词"
    r"|background|背景|目录|前言|contents)"
)
_MULTI_SPACE = re.compile(r"([\t 　]|　){2,}")
_TEXT_OR_TITLE = re.compile(r"(text|title)")
_ABSTRACT = re.compile(r"(abstract|摘要)")


def _is_front_matter(txt: str) -> bool:
    return bool(_FRONT_MATTER.match(txt.lower().strip()))


def extract_paper(doc: dict, cfg: ChunkConfig) -> dict:
    """→ {title, authors, abstract, sections, tables} (paper.Pdf)."""
    boxes = build_doc_boxes(doc, drop=True)
    boxes.run_table_structure()
    boxes.merge_horizontal()
    tables = boxes.extract_tables_figures(need_figures=True, return_html=True)
    if boxes.boxes:
        column_width = median(b["x1"] - b["x0"] for b in boxes.boxes)
    else:
        column_width = 0
    boxes.sort_reading_order()
    boxes.drop_toc_pages()
    if boxes.pages and column_width < boxes.pages[0].width / 2:
        boxes.sort_columns(column_width / 2)
    for b in boxes.boxes:
        b["text"] = _MULTI_SPACE.sub(" ", b["text"].strip())

    bxs = boxes.boxes
    title = ""
    authors: list[str] = []
    i = 0
    while i < min(32, len(bxs) - 1):
        b = bxs[i]
        i += 1
        if b.get("layoutno", "").find("title") >= 0:
            title = b["text"]
            if _is_front_matter(title):
                title = ""
                break
            for j in range(3):
                if _is_front_matter(bxs[i + j]["text"]):
                    break
                authors.append(bxs[i + j]["text"])
                break
            break

    abstract = ""
    i = 0
    while i + 1 < min(32, len(bxs)):
        b = bxs[i]
        i += 1
        txt = b["text"].lower().strip()
        if _ABSTRACT.match(txt):
            if len(txt.split()) > 32 or len(txt) > 64:
                abstract = txt + boxes.line_tag(b)
                break
            txt = bxs[i]["text"].lower().strip()
            if len(txt.split()) > 32 or len(txt) > 64:
                abstract = txt + boxes.line_tag(bxs[i])
            i += 1
            break
    if not abstract:
        i = 0

    sections = [
        (b["text"] + boxes.line_tag(b), b.get("layoutno", ""))
        for b in bxs[i:]
        if _TEXT_OR_TITLE.match(b.get("layoutno", "text"))
    ]
    return {
        "title": title,
        "authors": " ".join(authors),
        "abstract": abstract,
        "sections": sections,
        "tables": tables,
    }


def chunk_paper(doc: dict, cfg: ChunkConfig) -> list[dict]:
    paper = extract_paper(doc, cfg)
    out = SpanEmitter()
    if paper["title"]:
        out.emit("title", paper["title"])
    out.emit_tables(paper["tables"], cfg)
    if paper["abstract"]:
        out.emit("abstract", strip_position_tags(paper["abstract"]))

    sections = paper["sections"]
    bull = bullets_category([txt for txt, _ in sections])
    most_level, levels = title_frequency(bull, sections)

    sec_ids = []
    sid = 0
    for i, lvl in enumerate(levels):
        if lvl <= most_level and i > 0 and lvl != levels[i - 1]:
            sid += 1
        sec_ids.append(sid)

    chunks: list[str] = []
    last_sid = -2
    for (txt, _), sec_id in zip(sections, sec_ids):
        if sec_id == last_sid:
            if chunks:
                chunks[-1] += "\n" + txt
                continue
        chunks.append(txt)
        last_sid = sec_id
    out.emit_text_chunks(chunks, strip_tags=True)
    return out.to_dicts()
