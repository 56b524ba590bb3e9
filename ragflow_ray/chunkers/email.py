"""The "email" template chunker — .eml messages.

Parity with /root/reference/rag/app/email.py:28-108 (stdlib-only in
the reference too):

* every header renders as ``"Header: value"`` text lines;
* text/plain parts decode with their declared charset (``find_codec``
  sniff as fallback) and pre-chunk through the txt parser;
* text/html parts extract through the readability parser;
* both section streams greedy-merge into chunks
  (``naive_merge``, chunk budget from the config — the reference's
  email parser_config defaults to 512 tokens);
* attachments route through the naive chunker by filename extension
  (txt/html/markdown/json and, here, raw-bytes PDF); an attachment
  that fails to parse is silently skipped (reference behavior,
  email.py:102-106).

The corpus carries .eml documents as a single text span holding the
raw bytes decoded latin-1 (lossless byte round-trip).
"""

from __future__ import annotations

import io
from email import policy
from email.parser import BytesParser

from ..parsers.html import parse_html
from ..parsers.txt import parse_txt
from ..text.merge import greedy_merge
from ..text.normalize import find_codec
from .common import ChunkConfig, SpanEmitter, doc_text

_TEXT_FMTS = {
    ".txt": "txt", ".text": "txt", ".log": "txt", ".csv": "txt",
    ".html": "html", ".htm": "html", ".md": "markdown",
    ".markdown": "markdown", ".json": "json",
}


def _decode_part(part) -> str:
    payload = part.get_payload(decode=True) or b""
    charset = part.get_content_charset()
    if charset:
        try:
            return payload.decode(charset, errors="replace")
        except LookupError:
            pass
    return payload.decode(find_codec(payload), errors="replace")


def _attachment_doc(filename: str, payload: bytes) -> dict | None:
    import os

    ext = os.path.splitext(filename or "")[1].lower()
    if ext == ".pdf":
        from ..parsers.pdfbytes import pdf_to_page_payloads

        return {
            "doc_id": filename,
            "fmt": "pdf",
            "spans": pdf_to_page_payloads(filename, payload),
        }
    if ext == ".docx":
        from ..parsers.officebytes import docx_to_spans

        return {"doc_id": filename, "fmt": "docx", "spans": docx_to_spans(payload)}
    if ext == ".xlsx":
        from ..parsers.officebytes import xlsx_to_sheets_span

        return {
            "doc_id": filename,
            "fmt": "excel",
            "spans": xlsx_to_sheets_span(payload),
        }
    fmt = _TEXT_FMTS.get(ext)
    if fmt is None:
        return None
    text = payload.decode(find_codec(payload), errors="replace")
    return {
        "doc_id": filename,
        "fmt": fmt,
        "spans": [{"kind": "text", "text": text, "media_ref": "", "offset": 0}],
    }


def chunk_email(doc: dict, cfg: ChunkConfig) -> list[dict]:
    from .naive import chunk_naive

    raw = doc_text(doc).encode("latin-1", errors="replace")
    msg = BytesParser(policy=policy.default).parse(io.BytesIO(raw))

    text_parts: list[str] = []
    html_parts: list[str] = []
    for header, value in msg.items():
        text_parts.append(f"{header}: {value}")

    def add_content(m) -> None:
        ctype = m.get_content_type()
        if ctype == "text/plain":
            text_parts.append(_decode_part(m))
        elif ctype == "text/html":
            html_parts.append(_decode_part(m))
        elif "multipart" in ctype and m.is_multipart():
            for part in m.iter_parts():
                add_content(part)

    add_content(msg)

    # the reference pre-chunks plain-text bodies with TxtParser's
    # DEFAULTS (email.py:80 passes no arguments to parser_txt —
    # chunk_token_num=128 and the default delimiter; only the later
    # naive_merge sees the 512-token config budget)
    sections = [
        (c, "") for c in parse_txt("\n".join(text_parts))
    ] + [(line, "") for line in parse_html("\n".join(html_parts)) if line]

    out = SpanEmitter()
    chunks = greedy_merge(sections, cfg.chunk_token_num, cfg.delimiter)
    out.emit_text_chunks(chunks)

    pdf_cfg = cfg
    if cfg.layout_mode != "plain":
        from dataclasses import replace

        # attachment PDFs arrive as raw text-layer payloads (no layout
        # regions), so they go through the plain path
        pdf_cfg = replace(cfg, layout_mode="plain")
    for part in msg.iter_attachments():
        disposition = (part.get("Content-Disposition") or "").strip().split(";")
        if not disposition or disposition[0].lower() != "attachment":
            continue
        att = _attachment_doc(part.get_filename() or "", part.get_payload(decode=True) or b"")
        if att is None:
            continue
        try:
            for span in chunk_naive(att, pdf_cfg if att["fmt"] == "pdf" else cfg):
                out.emit(span["kind"], span["text"], span["media_ref"])
        except Exception:  # noqa: BLE001 — reference skips bad attachments
            continue
    return out.to_dicts()
