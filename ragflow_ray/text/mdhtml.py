"""Markdown → HTML rendering for qa answers (python-markdown subset).

The reference renders markdown qa answers to HTML with
``markdown(last_answer, extensions=['markdown.extensions.tables'])``
(/root/reference/rag/app/qa.py:438,450).  python-markdown is not in
this container, so this module implements the block-level subset its
output shape uses — the same documented-subset approach as the Tika /
pdfplumber replacements:

* paragraphs — blank-line-separated blocks → ``<p>…</p>``, soft-wrapped
  lines joined with a newline INSIDE the tag (python-markdown keeps
  them);
* pipe tables (the ``tables`` extension) → the extension's exact tag
  layout: one tag per line, ``<thead>``/``<tbody>`` sections,
  ``:---:``-style alignment as ``style="text-align: …;"`` attributes;
* unordered (``- `` / ``* `` / ``+ ``) and ordered (``1. ``) lists →
  ``<ul>/<ol>`` with one ``<li>`` per line;
* ATX headings ``#``–``######`` → ``<h1>``–``<h6>`` (deeper runs fall
  back to paragraphs, as python-markdown does); a heading line inside
  a multi-line block splits the block at the heading, matching
  python-markdown's hashheader processor (``# T\ntext`` → ``<h1>`` +
  ``<p>``, no blank line required);
* blockquotes — a block whose first line starts with ``>`` renders as
  ``<blockquote>`` around its recursively-rendered content, with
  lazy continuation lines (no ``>``) included, as python-markdown
  does;
* ``&`` and ``<`` escape to entities inside text content;
* core inline syntax (python-markdown applies these without any
  extension): `` `code` `` → ``<code>`` (contents protected from
  further inline processing, as python-markdown's code spans are),
  ``**strong**`` → ``<strong>``, ``*em*`` → ``<em>``,
  ``[text](url)`` → ``<a href="url">text</a>`` — in paragraphs,
  list items, headings and table cells alike.

Out of subset (documented, inline text passes through verbatim):
underscore emphasis (``_em_``/``__strong__``), autolinks, inline
images, fenced code blocks (the reference enables only the tables
extension, so fences are paragraph text there too), reference links,
setext headings, space-less ATX headings (``#T``), trailing ``#``
stripping, and nested (``>>``) blockquotes.
"""

from __future__ import annotations

import re

_HEADING = re.compile(r"^(#{1,6})\s+(.*)$")
_UL_ITEM = re.compile(r"^[-*+]\s+(.*)$")
_OL_ITEM = re.compile(r"^\d+\.\s+(.*)$")
_TABLE_SEP = re.compile(r"^\s*\|?\s*:?-+:?\s*(\|\s*:?-+:?\s*)*\|?\s*$")


def _esc(text: str) -> str:
    return text.replace("&", "&amp;").replace("<", "&lt;")


_CODE_SPAN = re.compile(r"`([^`]+)`")
_STRONG = re.compile(r"\*\*(?!\s)(.+?)(?<!\s)\*\*")
_EM = re.compile(r"\*(?!\s)([^*]+?)(?<!\s)\*")
_LINK = re.compile(r"\[([^\]]*)\]\(([^)\s]*)\)")


def _inline(text: str) -> str:
    """Escape + core inline markup.  Code spans are lifted out first
    so their contents are protected from emphasis/link processing
    (python-markdown's inline-pattern order)."""
    out = _esc(text)
    codes: list[str] = []

    def stash(m: re.Match) -> str:
        codes.append(m.group(1))
        return f"\x00{len(codes) - 1}\x00"

    out = _CODE_SPAN.sub(stash, out)
    out = _LINK.sub(
        lambda m: f'<a href="{m.group(2).replace(chr(34), "%22")}">'
                  f"{m.group(1)}</a>", out)
    out = _STRONG.sub(r"<strong>\1</strong>", out)
    out = _EM.sub(r"<em>\1</em>", out)
    for i, c in enumerate(codes):
        out = out.replace(f"\x00{i}\x00", f"<code>{c}</code>")
    return out


def _split_row(line: str) -> list[str]:
    row = line.strip()
    if row.startswith("|"):
        row = row[1:]
    if row.endswith("|"):
        row = row[:-1]
    return [c.strip() for c in row.split("|")]


def _alignments(sep_line: str) -> list[str | None]:
    out: list[str | None] = []
    for cell in _split_row(sep_line):
        left, right = cell.startswith(":"), cell.endswith(":")
        if left and right:
            out.append("center")
        elif right:
            out.append("right")
        elif left:
            out.append("left")
        else:
            out.append(None)
    return out


def _render_table(lines: list[str]) -> list[str]:
    headers = _split_row(lines[0])
    aligns = _alignments(lines[1])
    aligns += [None] * (len(headers) - len(aligns))

    def cell(tag: str, text: str, align: str | None) -> str:
        attr = f' style="text-align: {align};"' if align else ""
        return f"<{tag}{attr}>{_inline(text)}</{tag}>"

    out = ["<table>", "<thead>", "<tr>"]
    out += [cell("th", h, a) for h, a in zip(headers, aligns)]
    out += ["</tr>", "</thead>", "<tbody>"]
    for line in lines[2:]:
        cells = _split_row(line)
        # python-markdown pads/truncates body rows to the header width
        cells = (cells + [""] * len(headers))[: len(headers)]
        out.append("<tr>")
        out += [cell("td", c, a) for c, a in zip(cells, aligns)]
        out.append("</tr>")
    out += ["</tbody>", "</table>"]
    return out


_BQ_MARK = re.compile(r"^\s{0,3}> ?")


def _render_block(block: list[str]) -> list[str]:
    first = block[0].strip()
    # pipe table: a header row and a separator row
    if (len(block) >= 2 and "|" in first
            and _TABLE_SEP.match(block[1])):
        return _render_table([ln.strip() for ln in block])
    # blockquote: strip the markers, include lazy-continuation lines,
    # and render the quoted content recursively
    if first.startswith(">"):
        inner = [_BQ_MARK.sub("", ln) for ln in block]
        return ["<blockquote>", *_render_block(inner), "</blockquote>"]
    # hashheader: a heading line splits the block around itself
    # (python-markdown needs no blank line before or after a heading)
    for i, ln in enumerate(block):
        m = _HEADING.match(ln.strip())
        if m:
            out = _render_block(block[:i]) if i else []
            level = len(m.group(1))
            out.append(f"<h{level}>{_inline(m.group(2).strip())}</h{level}>")
            if i + 1 < len(block):
                out += _render_block(block[i + 1:])
            return out
    if all(_UL_ITEM.match(ln.strip()) for ln in block):
        return ["<ul>",
                *(f"<li>{_inline(_UL_ITEM.match(ln.strip()).group(1))}</li>"
                  for ln in block),
                "</ul>"]
    if all(_OL_ITEM.match(ln.strip()) for ln in block):
        return ["<ol>",
                *(f"<li>{_inline(_OL_ITEM.match(ln.strip()).group(1))}</li>"
                  for ln in block),
                "</ol>"]
    body = "\n".join(_inline(ln.strip()) for ln in block)
    return [f"<p>{body}</p>"]


def markdown_to_html(text: str) -> str:
    """Render ``text`` to HTML (see module docstring for the subset)."""
    blocks: list[list[str]] = []
    cur: list[str] = []
    for raw in text.split("\n"):
        if raw.strip():
            cur.append(raw)
        elif cur:
            blocks.append(cur)
            cur = []
    if cur:
        blocks.append(cur)

    out: list[str] = []
    for block in blocks:
        out += _render_block(block)
    return "\n".join(out)
