"""The "presentation" template chunker — one chunk per slide/page.

Parity with /root/reference/rag/app/presentation.py:101-168: every
page becomes its own chunk carrying the page thumbnail (here: the
page's media ref) and its page number.  Slide-family docs carry one
media span per slide whose payload is ``{"page_no": n, "text": ...}``;
pdf-family docs use the page-box payloads (all box text of the page).
"""

from __future__ import annotations

import json

from .common import ChunkConfig, SpanEmitter, doc_pages


def chunk_presentation(doc: dict, cfg: ChunkConfig) -> list[dict]:
    out = SpanEmitter()
    fmt = doc.get("fmt", "slides")

    if fmt == "pdf":
        media = [s for s in sorted(doc["spans"], key=lambda x: x["offset"])
                 if s["kind"] == "media" and s["text"]]
        for page, span in zip(doc_pages(doc), media):
            txt = "\n".join(b["text"] for b in page.boxes if b.get("text"))
            if txt.strip():
                out.emit("slide", txt, span["media_ref"])
        return out.to_dicts()

    for span in sorted(doc["spans"], key=lambda x: x["offset"]):
        if span["kind"] != "media" or not span["text"]:
            continue
        try:
            payload = json.loads(span["text"])
        except json.JSONDecodeError:
            continue
        txt = payload.get("text", "")
        if txt.strip():
            out.emit("slide", txt, span["media_ref"])
    return out.to_dicts()
