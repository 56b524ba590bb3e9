"""HTML boilerplate stripping — main-content extraction.

The reference delegates to the ``readability-lxml`` + ``html_text``
libraries (/root/reference/deepdoc/parser/html_parser.py:40-49): score
DOM blocks by text density and link density, keep the best candidate
subtree, extract its visible text, and emit ``"{title}\\n{content}"``
split on newlines.

Neither library exists in this environment, so this module implements
the public Arc90/readability algorithm from scratch on the stdlib
``html.parser``:

* paragraph-ish blocks contribute ``1 + commas + min(len/100, 3)``
  points to their parent (and half to their grandparent);
* containers get a tag prior (div +5, article/section/pre/td +3,
  lists/forms −3, headings −5) and a ±25 class/id hint
  (nav/sidebar/footer/ad… vs article/content/main/post…);
* the final score is damped by link density
  (``score *= 1 − link_text/total_text``);
* the winning subtree's visible text is emitted with one line per
  block element (the ``html_text`` convention).

Deterministic, vectorization-friendly (pure function per document).
"""

from __future__ import annotations

import re
from html import unescape
from html.parser import HTMLParser

_BLOCK_TAGS = {
    "address", "article", "aside", "blockquote", "body", "br", "caption",
    "dd", "div", "dl", "dt", "fieldset", "figcaption", "figure", "footer",
    "form", "h1", "h2", "h3", "h4", "h5", "h6", "header", "hr", "html",
    "li", "main", "nav", "ol", "p", "pre", "section", "table", "tbody",
    "td", "tfoot", "th", "thead", "tr", "ul",
}
_SKIP_TAGS = {"script", "style", "noscript", "template", "head", "iframe", "svg"}
_VOID_TAGS = {
    "area", "base", "br", "col", "embed", "hr", "img", "input", "link",
    "meta", "param", "source", "track", "wbr",
}

_NEGATIVE_HINT = re.compile(
    r"combine|comment|com-|contact|foot|footer|footnote|masthead|media"
    r"|meta|outbrain|promo|related|scroll|share|shoutbox|sidebar|sponsor"
    r"|shopping|tags|tool|widget|nav|menu|banner|breadcrumb|hidden|ad-",
    re.IGNORECASE,
)
_POSITIVE_HINT = re.compile(
    r"article|body|content|entry|hentry|h-entry|main|page|pagination"
    r"|post|text|blog|story",
    re.IGNORECASE,
)
_TAG_PRIOR = {
    "div": 5, "article": 8, "main": 8, "section": 3, "pre": 3, "td": 3,
    "blockquote": 3, "address": -3, "ol": -3, "ul": -3, "dl": -3,
    "dd": -3, "dt": -3, "li": -3, "form": -3, "h1": -5, "h2": -5,
    "h3": -5, "h4": -5, "h5": -5, "h6": -5, "th": -5,
}
_PARAGRAPHISH = {"p", "pre", "td", "blockquote"}
_WS = re.compile(r"\s+")


class _Node:
    __slots__ = ("tag", "attrs", "children", "parent", "score")

    def __init__(self, tag: str, attrs: dict, parent: "_Node | None"):
        self.tag = tag
        self.attrs = attrs
        self.children: list = []  # _Node | str
        self.parent = parent
        self.score: float | None = None

    def iter_nodes(self):
        yield self
        for ch in self.children:
            if isinstance(ch, _Node):
                yield from ch.iter_nodes()

    def text(self) -> str:
        parts: list[str] = []
        for ch in self.children:
            if isinstance(ch, str):
                parts.append(ch)
            else:
                parts.append(ch.text())
        return "".join(parts)

    def link_text_len(self) -> int:
        total = 0
        for node in self.iter_nodes():
            if node.tag == "a":
                total += len(_WS.sub(" ", node.text()).strip())
        return total


class _DomBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = _Node("html", {}, None)
        self.cursor = self.root
        self.title_parts: list[str] = []
        self._skip_depth = 0
        self._in_title = False

    def handle_starttag(self, tag, attrs):
        tag = tag.lower()
        if tag == "title":
            self._in_title = True
            return
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
            return
        if self._skip_depth:
            return
        node = _Node(tag, dict(attrs), self.cursor)
        self.cursor.children.append(node)
        if tag not in _VOID_TAGS:
            self.cursor = node

    def handle_startendtag(self, tag, attrs):
        tag = tag.lower()
        if self._skip_depth or tag in _SKIP_TAGS:
            return
        self.cursor.children.append(_Node(tag, dict(attrs), self.cursor))

    def handle_endtag(self, tag):
        tag = tag.lower()
        if tag == "title":
            self._in_title = False
            return
        if tag in _SKIP_TAGS:
            if self._skip_depth:
                self._skip_depth -= 1
            return
        if self._skip_depth:
            return
        node = self.cursor
        while node is not None and node.tag != tag:
            node = node.parent
        if node is not None and node.parent is not None:
            self.cursor = node.parent

    def handle_data(self, data):
        if self._in_title:
            self.title_parts.append(data)
            return
        if self._skip_depth or not data:
            return
        self.cursor.children.append(data)


def _class_id_hint(node: _Node) -> float:
    blob = " ".join(
        str(node.attrs.get(k, "")) for k in ("class", "id") if node.attrs.get(k)
    )
    score = 0.0
    if blob:
        if _NEGATIVE_HINT.search(blob):
            score -= 25.0
        if _POSITIVE_HINT.search(blob):
            score += 25.0
    return score


def _base_score(node: _Node) -> float:
    return _TAG_PRIOR.get(node.tag, 0) + _class_id_hint(node)


def _clean_len(text: str) -> int:
    return len(_WS.sub(" ", text).strip())


def _is_paragraphish(node: _Node) -> bool:
    if node.tag in _PARAGRAPHISH:
        return True
    if node.tag == "div":
        return not any(
            isinstance(ch, _Node) and ch.tag in _BLOCK_TAGS for ch in node.children
        )
    return False


def _pick_candidate(root: _Node) -> _Node:
    candidates: list[_Node] = []
    for node in root.iter_nodes():
        if not _is_paragraphish(node):
            continue
        inner = _WS.sub(" ", node.text()).strip()
        if len(inner) < 25:
            continue
        points = 1.0 + inner.count(",") + inner.count("，") + min(len(inner) / 100.0, 3.0)
        for ancestor, share in ((node.parent, 1.0), (
            node.parent.parent if node.parent else None, 0.5
        )):
            if ancestor is None:
                continue
            if ancestor.score is None:
                ancestor.score = _base_score(ancestor)
                candidates.append(ancestor)
            ancestor.score += points * share

    best: _Node | None = None
    best_score = float("-inf")
    for cand in candidates:
        total = _clean_len(cand.text())
        if total == 0:
            continue
        link_density = min(1.0, cand.link_text_len() / total)
        final = (cand.score or 0.0) * (1.0 - link_density)
        if final > best_score:
            best, best_score = cand, final
    return best if best is not None else root


def _render_text(node: _Node, out: list[str]) -> None:
    if node.tag in _SKIP_TAGS:
        return
    if node.tag == "br":
        out.append("\n")
        return
    is_block = node.tag in _BLOCK_TAGS
    if is_block:
        out.append("\n")
    for ch in node.children:
        if isinstance(ch, str):
            out.append(ch)
        else:
            _render_text(ch, out)
    if is_block:
        out.append("\n")


def node_to_text(node: _Node) -> str:
    """Visible text, one line per block element, whitespace collapsed."""
    raw: list[str] = []
    _render_text(node, raw)
    lines: list[str] = []
    for line in "".join(raw).split("\n"):
        line = _WS.sub(" ", unescape(line)).strip()
        if line:
            lines.append(line)
    return "\n".join(lines)


def extract_main_text(html: str) -> tuple[str, str]:
    """→ (title, main content text) of an HTML document."""
    builder = _DomBuilder()
    builder.feed(html)
    builder.close()
    title = _WS.sub(" ", "".join(builder.title_parts)).strip()
    best = _pick_candidate(builder.root)
    return title, node_to_text(best)


def parse_html(html: str) -> list[str]:
    """``"{title}\\n{content}"`` split on newlines (reference contract)."""
    if not isinstance(html, str):
        raise TypeError("txt type should be string!")
    title, content = extract_main_text(html)
    return f"{title}\n{content}".split("\n")
