"""Plain-text / source-code parser.

Parity with /root/reference/deepdoc/parser/txt_parser.py:29-64
(``RAGFlowTxtParser.parser_txt``): split the document on the delimiter
set (delimiters support backtick-quoted multi-char entries and literal
escape sequences), then greedily pack fragments into chunks; a new
chunk opens only when the current chunk already *exceeds*
``chunk_token_num`` tokens.  Delimiters are dropped from the output.
"""

from __future__ import annotations

from ..text.delimiters import decode_escaped_delimiters, split_dropping_delimiters
from ..text.tokens import token_count

DEFAULT_TXT_DELIMITERS = "\n!?;。；！？"


def parse_txt(
    text: str,
    chunk_token_num: int = 128,
    delimiter: str = DEFAULT_TXT_DELIMITERS,
) -> list[str]:
    """Split + greedy-pack ``text``; returns chunk strings."""
    if not isinstance(text, str):
        raise TypeError("txt type should be str!")
    delimiter = decode_escaped_delimiters(delimiter)

    chunks = [""]
    counts = [0]
    for frag in split_dropping_delimiters(text, delimiter):
        n = token_count(frag)
        if counts[-1] > chunk_token_num:
            chunks.append(frag)
            counts.append(n)
        else:
            chunks[-1] += frag
            counts[-1] += n
    return chunks
