"""Interleaved docx-like document parsing (text+media spans).

The reference parses .docx with python-docx into (paragraph text,
inline images, style) triples, pairs Caption paragraphs with the
nearest preceding image, attaches stray images to the previous
paragraph, and renders tables to HTML with colspan-merged duplicate
cells and a nearest-heading "Table Location" caption
(/root/reference/rag/app/naive.py:185-251, :80-183).

Our corpus stores such documents as interleaved spans:

* paragraph:  ``kind="text"``,  ``text='{"t": ..., "style": ...}'``
* image:      ``kind="media"``, ``media_ref="media://..."``
* table:      ``kind="text"``,  ``text='{"table": {"rows": [[...]]}}'``

Instead of pasting PIL images together, image attachments stay as
``media_ref`` strings; multiple refs combine with ``"+"`` (the
engine-level analogue of ``concat_img``, rag/nlp/__init__.py:630-656).
"""

from __future__ import annotations

import json
import re
from html import escape

_HEADING = re.compile(r"Heading\s*(\d+)", re.IGNORECASE)
_IDEOGRAPHIC_SPACE = re.compile(r"　")


def combine_refs(a: str | None, b: str | None) -> str | None:
    """Merge two media refs (vertical-concat analogue, dedup identical)."""
    if a and not b:
        return a
    if b and not a:
        return b
    if not a and not b:
        return None
    if a == b:
        return a
    return f"{a}+{b}"


def _clean(text: str) -> str:
    return _IDEOGRAPHIC_SPACE.sub(" ", text).strip()


def _nearest_heading_path(doc_name: str, paragraphs: list[dict], table_pos: int) -> str:
    """Hierarchical heading path before a table: "Doc > H1 > H2 > ...".

    Walk backwards for the nearest heading, then repeatedly for any
    heading of strictly smaller level (naive.py:119-181).
    """
    nearest: tuple[int, str] | None = None
    for p in reversed(paragraphs[:table_pos]):
        m = _HEADING.search(p.get("style") or "")
        if not m:
            continue
        level = int(m.group(1))
        if level <= 7 and p["t"].strip():
            nearest = (level, p["t"].strip())
            break
    if nearest is None:
        return ""
    titles = [nearest]
    current = nearest[0]
    while current > 1:
        found = False
        for p in reversed(paragraphs[:table_pos]):
            m = _HEADING.search(p.get("style") or "")
            if not m:
                continue
            level = int(m.group(1))
            if level < current and p["t"].strip():
                titles.append((level, p["t"].strip()))
                current = level
                found = True
                break
        if not found:
            break
    titles.sort(key=lambda lv: lv[0])
    return " > ".join([doc_name] + [t for _, t in titles])


def table_rows_to_html(rows: list[list[str]], caption: str = "") -> str:
    """HTML table with duplicate-adjacent-cell colspan merge
    (naive.py:228-249)."""
    html = "<table>"
    if caption:
        html += f"<caption>Table Location: {caption}</caption>"
    for row in rows:
        html += "<tr>"
        i = 0
        while i < len(row):
            span = 1
            cell = row[i]
            for j in range(i + 1, len(row)):
                if cell == row[j]:
                    span += 1
                    i = j
                else:
                    break
            i += 1
            if span == 1:
                html += f"<td>{escape(str(cell))}</td>"
            else:
                html += f"<td colspan='{span}'>{escape(str(cell))}</td>"
        html += "</tr>"
    html += "</table>"
    return html


def parse_docx_spans(
    spans: list[dict], doc_name: str = ""
) -> tuple[list[tuple[str, str | None]], list[str]]:
    """→ (lines, tables).

    ``lines`` are (paragraph text, combined media ref or None) pairs
    with the reference's caption/image pairing behavior; ``tables``
    are HTML strings with heading-path captions.
    """
    paragraphs: list[dict] = []  # flattened doc order for heading lookup
    lines: list[tuple[str, list, str]] = []  # (text, refs, style)
    tables: list[tuple[int, list[list[str]]]] = []  # (position, rows)
    last_image: str | None = None

    for span in spans:
        if span["kind"] == "media":
            ref = span["media_ref"]
            if lines:
                lines[-1][1].append(ref)
            else:
                last_image = ref
            paragraphs.append({"t": "", "style": "", "media": ref})
            continue
        try:
            payload = json.loads(span["text"])
        except (json.JSONDecodeError, TypeError):
            payload = {"t": span["text"], "style": ""}
        if "table" in payload:
            tables.append((len(paragraphs), payload["table"]["rows"]))
            paragraphs.append({"t": "", "style": "__table__"})
            continue
        text, style = _clean(payload.get("t", "")), payload.get("style", "")
        paragraphs.append({"t": text, "style": style})
        if not text:
            continue
        if style == "Caption":
            former: str | None = None
            if lines and lines[-1][1] and lines[-1][2] != "Caption":
                former = lines[-1][1].pop()
            elif last_image:
                former, last_image = last_image, None
            lines.append((text, [former] if former else [], style))
        else:
            refs: list = []
            if last_image:
                refs.append(last_image)
                last_image = None
            lines.append((text, refs, style))

    out_lines: list[tuple[str, str | None]] = []
    for text, refs, _style in lines:
        combined: str | None = None
        for r in refs:
            combined = combine_refs(combined, r)
        out_lines.append((text, combined))

    out_tables = [
        table_rows_to_html(rows, _nearest_heading_path(doc_name, paragraphs, pos))
        for pos, rows in tables
    ]
    return out_lines, out_tables
