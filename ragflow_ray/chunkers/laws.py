"""The "laws" template chunker.

Parity with /root/reference/rag/app/laws.py:143-211: parse per format
(PDF path runs layout + vertical merge only — no table extraction,
laws.py:111-140), strip the TOC, vote a bullet family, and emit
hierarchical chunks of depth 5 joined by newlines.  The docx path
(laws.Docx.__call__, laws.py:57-100) walks heading levels and
assembles one section per heading with its first populated child
level.
"""

from __future__ import annotations

import json
import re

from ..parsers.html import parse_html
from ..text.bullets import BULLET_FAMILIES, bullets_category, _COMPILED_FAMILIES
from ..text.merge import hierarchical_merge, promote_colon_titles, strip_toc_sections
from .common import ChunkConfig, SpanEmitter, build_doc_boxes, doc_text

_IDEOGRAPHIC_SPACE = re.compile(r"　")


def _docx_question_level(text: str, style: str, bull: int) -> tuple[int, str]:
    """(outline level, text) for a docx paragraph
    (rag/nlp/__init__.py:617-627)."""
    txt = _IDEOGRAPHIC_SPACE.sub(" ", text).strip()
    if style.startswith("Heading"):
        try:
            return int(style.split(" ")[-1]), txt
        except ValueError:
            return 0, txt
    if bull < 0:
        return 0, txt
    for j, pat in enumerate(_COMPILED_FAMILIES[bull]):
        if pat.match(txt):
            return j + 1, txt
    return len(BULLET_FAMILIES[bull]), txt


def _docx_outline_sections(doc: dict) -> list[str]:
    """Heading-level outline assembly (laws.Docx.__call__)."""
    paras: list[tuple[str, str]] = []
    for s in sorted(doc["spans"], key=lambda x: x["offset"]):
        if s["kind"] != "text":
            continue
        try:
            payload = json.loads(s["text"])
        except (json.JSONDecodeError, TypeError):
            payload = {"t": s["text"], "style": ""}
        if "table" in payload:
            continue
        paras.append((payload.get("t", ""), payload.get("style", "")))

    bull = bullets_category([t for t, _ in paras])
    lines: list[tuple[int, str]] = []
    for text, style in paras:
        level, txt = _docx_question_level(text, style, bull)
        if not txt.strip("\n"):
            continue
        lines.append((level, txt))

    visited = [False] * len(lines)
    sections: list[str] = []
    for s in range(len(lines)):
        e = s + 1
        while e < len(lines):
            if lines[e][0] <= lines[s][0]:
                break
            e += 1
        if e - s == 1 and visited[s]:
            continue
        sec: list[str] = []
        next_level = lines[s][0] + 1
        while not sec and next_level < 22:
            for i in range(s + 1, e):
                if lines[i][0] != next_level:
                    continue
                sec.append(lines[i][1])
                visited[i] = True
            next_level += 1
        sec.insert(0, lines[s][1])
        sections.append("\n".join(sec))
    return [s for s in sections if s]


def chunk_laws(doc: dict, cfg: ChunkConfig) -> list[dict]:
    fmt = doc.get("fmt", "txt")
    out = SpanEmitter()

    if fmt == "docx":
        for sec in _docx_outline_sections(doc):
            if sec.strip():
                out.emit("text", sec)
        return out.to_dicts()

    if fmt == "pdf":
        if cfg.layout_mode == "plain":
            from .common import plain_pdf_lines

            sections = [ln for ln in plain_pdf_lines(doc) if ln]
        else:
            boxes = build_doc_boxes(doc, drop=True)
            boxes.merge_vertical()
            sections = [b["text"] + boxes.line_tag(b) for b in boxes.boxes]
    elif fmt == "html":
        sections = [s for s in parse_html(doc_text(doc)) if s]
    else:  # txt
        sections = [s for s in doc_text(doc).split("\n") if s]

    strip_toc_sections(sections, eng=cfg.is_english)
    promote_colon_titles(sections)
    bull = bullets_category(sections)
    chunks = hierarchical_merge(bull, sections, 5)
    out.emit_text_chunks(["\n".join(ck) for ck in chunks], strip_tags=(fmt == "pdf"))
    return out.to_dicts()
