"""Shared chunker plumbing: config, output spans, emission helpers.

The reference wraps chunks into doc-store dicts via ``tokenize_chunks``
/ ``tokenize_table`` (/root/reference/rag/nlp/__init__.py:267-329); our
engine emits ordered output spans ``(kind, text, media_ref, order)``
per document instead (FIXTURES.md §2).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from ..pdf.boxpipe import DocBoxes
from ..pdf.page_model import Page, page_from_payload
from ..text.merge import strip_position_tags


@dataclass(frozen=True)
class ChunkConfig:
    chunk_token_num: int = 128
    delimiter: str = "\n!?。；！？"
    overlapped_percent: int = 0
    lang: str = "English"
    table_batch_size: int = 10
    # "deepdoc" = full layout pipeline; "plain" = text layer only
    # (reference parser_config["layout_recognize"]: DeepDOC | Plain Text)
    layout_mode: str = "deepdoc"
    html4excel: bool = False

    @property
    def is_english(self) -> bool:
        return self.lang.lower() == "english"


@dataclass
class Span:
    kind: str
    text: str
    media_ref: str = ""
    order: int = -1

    def to_dict(self) -> dict:
        return {
            "kind": self.kind,
            "text": self.text,
            "media_ref": self.media_ref,
            "order": self.order,
        }


class SpanEmitter:
    """Accumulates output spans with a running ``order`` counter."""

    def __init__(self) -> None:
        self.spans: list[Span] = []

    def emit(self, kind: str, text: str, media_ref: str = "") -> None:
        self.spans.append(Span(kind, text, media_ref, len(self.spans)))

    def emit_text_chunks(self, chunks: list[str], strip_tags: bool = False,
                         refs: list | None = None) -> None:
        """``tokenize_chunks`` analogue: skip blank chunks, optionally
        strip position tags (the pdf_parser.remove_tag path)."""
        for i, ck in enumerate(chunks):
            if not ck.strip():
                continue
            text = strip_position_tags(ck) if strip_tags else ck
            ref = refs[i] if refs and i < len(refs) and refs[i] else ""
            self.emit("text", text, ref or "")

    def emit_tables(self, tables, cfg: ChunkConfig) -> None:
        """``tokenize_table`` analogue (rag/nlp/__init__.py:302-329).

        ``tables`` items are ((media_ref, content), positions) where
        content is an HTML string or a list of row strings; row lists
        batch ``table_batch_size`` at a time joined by '; '/'； '.
        """
        for item in tables:
            if isinstance(item, tuple) and len(item) == 2 and isinstance(item[0], tuple):
                (ref, content), _poss = item
            else:
                ref, content = item
            if not content:
                continue
            if isinstance(content, str):
                self.emit("table", content, ref or "")
                continue
            joiner = "; " if cfg.is_english else "； "
            for i in range(0, len(content), cfg.table_batch_size):
                self.emit(
                    "table", joiner.join(content[i : i + cfg.table_batch_size]), ref or ""
                )

    def to_dicts(self) -> list[dict]:
        return [s.to_dict() for s in self.spans]


def doc_text(doc: dict) -> str:
    """Concatenated text of a document's text spans (offset order)."""
    spans = sorted(doc["spans"], key=lambda s: s["offset"])
    return "".join(s["text"] for s in spans if s["kind"] == "text")


def doc_pages(doc: dict) -> list[Page]:
    """Decode the page payloads of a pdf-family document.

    Pages renumber 1..n within the doc (or page-range part) — the
    reference does the same per task (pdf_parser.py:1080: ``__ocr(i+1,
    ...)`` over the task's page slice).
    """
    pages = []
    for s in sorted(doc["spans"], key=lambda x: x["offset"]):
        if s["kind"] == "media" and s["text"]:
            page = page_from_payload(s["text"])
            pn = len(pages) + 1
            page.page_no = pn
            for b in page.boxes:
                b["page_number"] = pn
            for lt in page.layouts:
                lt["page_number"] = pn
            pages.append(page)
    return pages


def plain_pdf_lines(doc: dict) -> list[str]:
    """The "Plain Text" pdf path: raw text-layer lines, no layout model
    (reference PlainParser, pdf_parser.py:1243-1269 — pypdf
    ``extract_text`` per page split on newlines)."""
    lines: list[str] = []
    for page in doc_pages(doc):
        for b in page.boxes:
            if b.get("text"):
                lines.append(b["text"])
    return lines


def doc_sheets(doc: dict) -> list[dict]:
    """Sheet payloads of an excel-family document."""
    import json as _json

    for s in sorted(doc["spans"], key=lambda x: x["offset"]):
        if s["kind"] == "text" and s["text"].startswith("{"):
            try:
                payload = _json.loads(s["text"])
            except _json.JSONDecodeError:
                continue
            if "sheets" in payload:
                return payload["sheets"]
    return []


def build_doc_boxes(doc: dict, drop: bool = True) -> DocBoxes:
    """Decode pages and run the layout stage (the OCR+layout model
    boundary)."""
    pages = doc_pages(doc)
    is_english = _doc_is_english(pages)
    boxes = DocBoxes(doc["doc_id"], pages, is_english=is_english)
    boxes.run_layouts(drop=drop)
    return boxes


def _doc_is_english(pages: list[Page]) -> bool:
    """Deterministic replacement for the reference's sampled
    ``is_english`` vote (pdf_parser.py:1059-1066): majority of pages
    whose concatenated box text is ASCII-dominated."""
    votes = 0
    for p in pages:
        text = "".join(b.get("text", "") for b in p.boxes)
        if not text:
            continue
        if text.isascii():
            votes += 1
            continue
        ascii_chars = sum(1 for ch in text if ord(ch) < 128)
        if ascii_chars / len(text) > 0.8:
            votes += 1
    return votes > len(pages) / 2 if pages else True
