"""Delimiter-string handling.

The reference accepts a user delimiter *string* in which every single
character is a delimiter, except that backtick-quoted runs denote a
single multi-character delimiter (``"ab`||`cd"`` → delimiters
``||, a, b, c, d``).  Multi-char delimiters must win over their
prefixes, so alternatives are ordered longest-first.

Semantics mirrored from /root/reference/rag/nlp/__init__.py:701-717
(``get_delimiters``) and deepdoc/parser/txt_parser.py:33 (the
unicode-escape round-trip applied to txt-parser delimiters, which lets
users write ``"\\n"`` literally in configuration).
"""

from __future__ import annotations

import re
from functools import lru_cache

_BACKTICKED = re.compile(r"`([^`]+)`")


def decode_escaped_delimiters(delimiters: str) -> str:
    """Interpret literal escapes (``"\\n"``) in a config delimiter string.

    Reference quirk: ``encode('utf-8').decode('unicode_escape')
    .encode('latin1').decode('utf-8')`` — i.e. apply python escape
    sequences while round-tripping non-ASCII safely.
    """
    return (
        delimiters.encode("utf-8")
        .decode("unicode_escape")
        .encode("latin1")
        .decode("utf-8")
    )


@lru_cache(maxsize=256)
def delimiter_pattern(delimiters: str) -> str:
    """Build an alternation regex source string from a delimiter spec."""
    pieces: list[str] = []
    cursor = 0
    for m in _BACKTICKED.finditer(delimiters):
        pieces.append(m.group(1))
        pieces.extend(delimiters[cursor : m.start()])
        cursor = m.end()
    pieces.extend(delimiters[cursor:])
    pieces = [p for p in pieces if p]
    pieces.sort(key=len, reverse=True)
    return "|".join(re.escape(p) for p in pieces)


@lru_cache(maxsize=256)
def split_regex(delimiters: str) -> "re.Pattern[str]":
    """Compiled capture-group splitter for :func:`delimiter_pattern`."""
    return re.compile(f"({delimiter_pattern(delimiters)})", re.DOTALL)


@lru_cache(maxsize=256)
def full_match_regex(delimiters: str) -> "re.Pattern[str]":
    """Compiled 'is this fragment purely one delimiter' matcher."""
    return re.compile(f"^{delimiter_pattern(delimiters)}$")


def split_dropping_delimiters(text: str, delimiters: str) -> list[str]:
    """Split ``text`` on the delimiter spec, discarding delimiter hits.

    This is the splitting step shared by the txt parser and the
    greedy merger (txt_parser.py:58-62, rag/nlp/__init__.py:557-561):
    ``re.split`` with a capture group, then fragments that are exactly
    one delimiter are skipped.
    """
    pat = split_regex(delimiters)
    full = full_match_regex(delimiters)
    return [frag for frag in pat.split(text) if not full.match(frag)]
