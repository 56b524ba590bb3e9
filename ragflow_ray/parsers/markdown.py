"""Markdown parsing: table extraction + heading-fused sectioning.

Parity with /root/reference/deepdoc/parser/markdown_parser.py:26-106
(``extract_tables_and_remainder``: bordered, borderless, and raw-HTML
tables) and rag/app/naive.py:346-366 (``Markdown.__call__``: heading
lines are fused with the following line; tables are rendered to
HTML).  The reference renders tables with the ``markdown`` package
(not installed here); :func:`md_table_to_html` is our own renderer for
the same pipe-table grammar.
"""

from __future__ import annotations

import re
from html import escape

_BORDER_TABLE = re.compile(
    r"(?:\n|^)"
    r"(?:\|.*?\|.*?\|.*?\n)"
    r"(?:\|(?:\s*[:-]+[-| :]*\s*)\|.*?\n)"
    r"(?:\|.*?\|.*?\|.*?\n)+",
)
_BORDERLESS_TABLE = re.compile(
    r"(?:\n|^)"
    r"(?:\S.*?\|.*?\n)"
    r"(?:(?:\s*[:-]+[-| :]*\s*).*?\n)"
    r"(?:\S.*?\|.*?\n)+",
)
_HTML_TABLE = re.compile(
    r"(?:\n|^)\s*(?:"
    r"(?:<html[^>]*>\s*<body[^>]*>\s*<table[^>]*>.*?</table>\s*</body>\s*</html>)"
    r"|(?:<body[^>]*>\s*<table[^>]*>.*?</table>\s*</body>)"
    r"|(?:<table[^>]*>.*?</table>)"
    r")\s*(?=\n|$)",
    re.DOTALL | re.IGNORECASE,
)
_DIVIDER_ROW = re.compile(r"^\s*\|?(?:\s*:?-+:?\s*\|)+\s*:?-*:?\s*\|?\s*$")


def _cut_matches(
    text: str, pattern: re.Pattern, sink: list[str], keep: bool, render: bool = False
) -> str:
    out: list[str] = []
    last = 0
    for m in pattern.finditer(text):
        sink.append(m.group())
        out.append(text[last : m.start()])
        if keep:
            # the reference leaves a *rendered HTML* copy inline for pipe
            # tables and the raw markup for already-HTML tables
            inline = md_table_to_html(m.group()) if render else m.group()
            out.append(inline + "\n\n")
        else:
            out.append("\n\n")
        last = m.end()
    out.append(text[last:])
    return "".join(out)


def extract_tables_and_remainder(
    markdown_text: str, separate_tables: bool = True
) -> tuple[str, list[str]]:
    """Pull tables out of markdown text.

    When ``separate_tables`` the tables are removed from the
    remainder; otherwise they are left in place (the reference
    substitutes rendered HTML — we keep the raw table in place and
    render at section level, see ``chunkers.naive``).
    """
    tables: list[str] = []
    working = markdown_text
    keep = not separate_tables
    if "|" in markdown_text:
        working = _cut_matches(working, _BORDER_TABLE, tables, keep, render=True)
        working = _cut_matches(working, _BORDERLESS_TABLE, tables, keep, render=True)
    if "<table>" in working.lower():
        working = _cut_matches(working, _HTML_TABLE, tables, keep, render=False)
    return working, tables


def _split_row(line: str) -> list[str]:
    line = line.strip()
    if line.startswith("|"):
        line = line[1:]
    if line.endswith("|"):
        line = line[:-1]
    return [c.strip() for c in line.split("|")]


def md_table_to_html(table_text: str) -> str:
    """Render a markdown pipe table (bordered or borderless) to HTML.

    Already-HTML tables pass through unchanged.
    """
    stripped = table_text.strip()
    if stripped.lower().startswith("<"):
        return stripped
    lines = [ln for ln in stripped.split("\n") if ln.strip()]
    if not lines:
        return ""
    header: list[str] | None = None
    rows: list[list[str]] = []
    for i, ln in enumerate(lines):
        if _DIVIDER_ROW.match(ln):
            if i == 1 and rows:
                header = rows.pop(0)
            continue
        rows.append(_split_row(ln))
    parts = ["<table>"]
    if header is not None:
        parts.append(
            "<thead><tr>"
            + "".join(f"<th>{escape(c)}</th>" for c in header)
            + "</tr></thead>"
        )
    parts.append("<tbody>")
    for r in rows:
        parts.append("<tr>" + "".join(f"<td>{escape(c)}</td>" for c in r) + "</tr>")
    parts.append("</tbody></table>")
    return "".join(parts)


def parse_markdown(
    text: str, separate_tables: bool = True
) -> tuple[list[tuple[str, str]], list[str]]:
    """→ (sections, tables).

    Sections are (text, "") pairs; a ``#`` heading line is fused with
    its immediately following line (rag/app/naive.py:356-363).
    Tables come back as HTML strings.
    """
    remainder, tables = extract_tables_and_remainder(f"{text}\n", separate_tables)
    sections: list[tuple[str, str]] = []
    for sec in remainder.split("\n"):
        if sec.strip().find("#") == 0:
            sections.append((sec, ""))
        elif sections and sections[-1][0].strip().find("#") == 0:
            prev, _ = sections.pop(-1)
            sections.append((prev + "\n" + sec, ""))
        else:
            sections.append((sec, ""))
    return sections, [md_table_to_html(t) for t in tables]
