"""Markdown → HTML rendering for qa answers (python-markdown subset).

The reference renders markdown qa answers to HTML with
``markdown(last_answer, extensions=['markdown.extensions.tables'])``
(/root/reference/rag/app/qa.py:438,450).  python-markdown is not in
this container, so this module implements the block-level subset its
output shape uses — the same documented-subset approach as the Tika /
pdfplumber replacements.  Block processors run in python-markdown's
registry order (code 80 > table 75 > hashheader 70 > setext 60 >
hr 50 > lists 40/30 > quote 20 > paragraph 10):

* paragraphs — blank-line-separated blocks → ``<p>…</p>``, soft-wrapped
  lines joined with a newline INSIDE the tag (python-markdown keeps
  them); a line ending in two or more spaces renders a ``<br />`` hard
  break, and tabs expand to 4-space stops up front (python-markdown's
  whitespace normalizer);
* indented code blocks — a block opening at a 4-space indent emits the
  leading indented run as ``<pre><code>…\\n</code></pre>`` (one indent
  level stripped, contents escaped, no inline processing);
* pipe tables (the ``tables`` extension) → the extension's exact tag
  layout: one tag per line, ``<thead>``/``<tbody>`` sections,
  ``:---:``-style alignment as ``style="text-align: …;"`` attributes;
* unordered (``- `` / ``* `` / ``+ ``) and ordered (``1. ``) lists →
  ``<ul>/<ol>``, python-markdown's list shape: the list must open its
  block (a block starting with text stays a paragraph — markdown
  requires a blank line before a list), either marker type continues
  the list (the first item picks the tag), and unmarked lines are
  lazy continuations joined into the previous ``<li>``;
* ATX headings ``#``–``######`` → ``<h1>``–``<h6>``, python-markdown's
  hashheader shape: no space required after the hashes (``#T`` is a
  heading), trailing ``#`` runs stripped, a seventh ``#`` becomes
  content (``####### x`` → ``<h6># x</h6>``), and a heading line inside
  a multi-line block splits the block at the heading (``# T\\ntext`` →
  ``<h1>`` + ``<p>``, no blank line required);
* setext headings — a line underlined by ``=``/``-`` runs → ``<h1>`` /
  ``<h2>`` (the underline must sit on the block's second line, as
  python-markdown's matcher anchors it);
* horizontal rules — a line of three-plus ``-``/``_``/``*`` (spaces
  allowed between, ≤3 leading spaces) → ``<hr />``, splitting its
  block; checked before lists so ``- - -`` is a rule, not a list;
* blockquotes — from the first ``>``-marked line (≤3 leading spaces)
  to the end of the block, one marker level stripped per line and the
  content recursively block-rendered; unmarked lines inside are lazy
  continuations and deeper ``>>`` markers nest, as python-markdown's
  quote processor does;
* ``&`` (when not already an entity), ``<`` and ``>`` escape to
  entities inside text content (ElementTree's serializer escapes all
  three; ``&copy;``-style entities pass through);
* core inline syntax (python-markdown applies these without any
  extension), in python-markdown's pattern order: `` `code` `` →
  ``<code>`` (multi-backtick fences, content ``.strip()``-ed and
  protected from further inline processing), backslash escapes of the
  special set ``\\`*_{}[]()>#+-.!`` → the literal character,
  ``<http://url>`` autolinks → ``<a>``, ``![alt](src)`` →
  ``<img src="…" alt="…" />``, ``[text](url)`` →
  ``<a href="url">text</a>``, ``***both***``/``___both___`` →
  ``<strong><em>``, ``**strong**``/``__strong__`` → ``<strong>``,
  ``*em*``/``_em_`` → ``<em>`` (underscore variants only at word
  boundaries — intra-word underscores stay literal, python-markdown's
  smart default) — in paragraphs, list items, headings and table
  cells alike.

Out of subset (documented, text passes through verbatim): reference
links and ``<addr@x>`` mail autolinks, raw inline HTML passthrough,
fenced code blocks (the reference enables only the tables extension,
so fences are paragraph text there too), indented sublists and block
elements nested inside list items, code spans and emphasis spanning
a soft line break, and indented code blocks continuing across blank
lines.  Byte-exact
python-markdown parity is unverifiable offline; the shapes above are
written from its public source/docs.
"""

from __future__ import annotations

import re

_HEADING = re.compile(r"^(#{1,6})(.*?)#*$")
_SETEXT = re.compile(r"^[=-]+[ ]*$")
_HR = re.compile(
    r"^[ ]{0,3}(?:(?:-[ ]{0,2}){3,}|(?:_[ ]{0,2}){3,}|(?:\*[ ]{0,2}){3,})$"
)
_UL_ITEM = re.compile(r"^[-*+]\s+(.*)$")
_OL_ITEM = re.compile(r"^\d+\.\s+(.*)$")
_TABLE_SEP = re.compile(r"^\s*\|?\s*:?-+:?\s*(\|\s*:?-+:?\s*)*\|?\s*$")
_BQ_LINE = re.compile(r"^[ ]{0,3}>")
_BQ_MARK = re.compile(r"^[ ]{0,3}> ?")

_AMP = re.compile(r"&(?!#?[0-9A-Za-z]+;)")


def _esc(text: str) -> str:
    return (_AMP.sub("&amp;", text)
            .replace("<", "&lt;").replace(">", "&gt;"))


def _attr(text: str) -> str:
    return _esc(text).replace('"', "&quot;")


# inline patterns, in python-markdown's registry order (backtick 190,
# escape 180, link/image 160/150, autolink 120, em_strong 60)
_CODE_SPAN = re.compile(r"(?<!\\)(`+)(.+?)(?<!`)\1(?!`)")
_ESCAPE = re.compile(r"\\([\\`*_{}\[\]()>#+.!-])")
_AUTOLINK = re.compile(r"<((?:[Ff]|[Hh][Tt])[Tt][Pp][Ss]?://[^<>]*)>")
_IMAGE = re.compile(r"!\[([^\]]*)\]\(([^)\s]*)\)")
_LINK = re.compile(r"\[([^\]]*)\]\(([^)\s]*)\)")
_STRONG_EM = re.compile(r"\*\*\*(?!\s)(.+?)(?<!\s)\*\*\*")
_STRONG = re.compile(r"\*\*(?!\s)(.+?)(?<!\s)\*\*")
_EM = re.compile(r"\*(?!\s)([^*]+?)(?<!\s)\*")
_STRONG_EM_U = re.compile(
    r"(?<![0-9A-Za-z_])___(?![\s_])(.+?)(?<![\s_])___(?![0-9A-Za-z_])")
_STRONG_U = re.compile(
    r"(?<![0-9A-Za-z_])__(?![\s_])(.+?)(?<![\s_])__(?![0-9A-Za-z_])")
_EM_U = re.compile(
    r"(?<![0-9A-Za-z_])_(?![\s_])([^_]+?)(?<![\s_])_(?![0-9A-Za-z_])")


def _inline(text: str) -> str:
    """Escape + core inline markup.  Pre-escape patterns (code spans,
    backslash escapes, autolinks, images) are stashed first so their
    contents are protected from the later passes — python-markdown's
    placeholder mechanism; link TEXT stays in the stream so emphasis
    still applies inside it, as python-markdown's tree does."""
    stash: list[str] = []

    def put(html: str) -> str:
        stash.append(html)
        return f"\x00{len(stash) - 1}\x00"

    out = _CODE_SPAN.sub(
        lambda m: put(f"<code>{_esc(m.group(2).strip())}</code>"), text)
    out = _ESCAPE.sub(lambda m: put(_esc(m.group(1))), out)
    out = _AUTOLINK.sub(
        lambda m: put(f'<a href="{_attr(m.group(1))}">'
                      f"{_esc(m.group(1))}</a>"), out)
    out = _IMAGE.sub(
        lambda m: put(f'<img src="{_attr(m.group(2))}" '
                      f'alt="{_attr(m.group(1))}" />'), out)
    out = _esc(out)
    out = _LINK.sub(
        lambda m: f'<a href="{m.group(2).replace(chr(34), "%22")}">'
                  f"{m.group(1)}</a>", out)
    out = _STRONG_EM.sub(r"<strong><em>\1</em></strong>", out)
    out = _STRONG.sub(r"<strong>\1</strong>", out)
    out = _EM.sub(r"<em>\1</em>", out)
    out = _STRONG_EM_U.sub(r"<strong><em>\1</em></strong>", out)
    out = _STRONG_U.sub(r"<strong>\1</strong>", out)
    out = _EM_U.sub(r"<em>\1</em>", out)
    for i, frag in enumerate(stash):
        out = out.replace(f"\x00{i}\x00", frag)
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


def _render_block(block: list[str]) -> list[str]:
    if not block:
        return []
    # indented code (priority 80): the leading 4-space-indented run;
    # the remainder re-enters block processing
    if block[0].startswith("    "):
        i = 0
        while i < len(block) and block[i].startswith("    "):
            i += 1
        code = "\n".join(_esc(ln[4:]) for ln in block[:i])
        return [f"<pre><code>{code}\n</code></pre>",
                *_render_block(block[i:])]
    first = block[0].strip()
    # pipe table (75): a header row and a separator row
    if (len(block) >= 2 and "|" in first
            and _TABLE_SEP.match(block[1])):
        return _render_table([ln.strip() for ln in block])
    # hashheader (70): a heading line splits the block around itself
    # (python-markdown needs no blank line before or after a heading)
    for i, ln in enumerate(block):
        m = _HEADING.match(ln.rstrip())
        if m:
            out = _render_block(block[:i]) if i else []
            level = len(m.group(1))
            out.append(f"<h{level}>{_inline(m.group(2).strip())}</h{level}>")
            out += _render_block(block[i + 1:])
            return out
    # setext heading (60): an =/- underline on the block's second line
    if len(block) >= 2 and _SETEXT.match(block[1]):
        level = 1 if block[1].startswith("=") else 2
        return [f"<h{level}>{_inline(first)}</h{level}>",
                *_render_block(block[2:])]
    # horizontal rule (50) — before lists, so "- - -" is a rule
    for i, ln in enumerate(block):
        if _HR.match(ln.rstrip()):
            out = _render_block(block[:i]) if i else []
            out.append("<hr />")
            out += _render_block(block[i + 1:])
            return out
    # lists (40/30): python-markdown's list processors MATCH at the
    # block start only (a list needs a blank line before it — a block
    # opening with text stays one paragraph even if later lines look
    # like items); either marker type continues the list (the first
    # item picks the tag), and unmarked lines are lazy continuations
    # appended to the previous item
    if _UL_ITEM.match(first) or _OL_ITEM.match(first):
        tag = "ul" if _UL_ITEM.match(first) else "ol"
        items: list[str] = []
        for ln in block:
            s = ln.strip()
            m = _UL_ITEM.match(s) or _OL_ITEM.match(s)
            if m:
                items.append(m.group(1))
            else:
                items[-1] += "\n" + s
        out = [f"<{tag}>"]
        for it in items:
            out.append("<li>"
                       + "\n".join(_inline(l) for l in it.split("\n"))
                       + "</li>")
        out.append(f"</{tag}>")
        return out
    # blockquote (20): from the first marked line to the end of the
    # block — python-markdown dequotes every later line (lazy
    # continuation), and a deeper ">>" marker nests via the recursion
    for i, ln in enumerate(block):
        if _BQ_LINE.match(ln):
            out = _render_block(block[:i]) if i else []
            inner = [_BQ_MARK.sub("", l) for l in block[i:]]
            return out + ["<blockquote>", *_render_block(inner),
                          "</blockquote>"]
    # paragraph (10); a line ending in two-plus spaces hard-breaks
    parts = []
    for j, ln in enumerate(block):
        seg = _inline(ln.strip())
        if j < len(block) - 1 and ln.endswith("  "):
            seg += "<br />"
        parts.append(seg)
    body = "\n".join(parts)
    return [f"<p>{body}</p>"]


def markdown_to_html(text: str) -> str:
    """Render ``text`` to HTML (see module docstring for the subset)."""
    # python-markdown's whitespace normalizer: \r\n → \n, tabs → 4-stops
    text = text.replace("\r\n", "\n").replace("\r", "\n").expandtabs(4)
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
