"""The "tag" template chunker — content↔tag pair extraction.

Parity with /root/reference/rag/app/tag.py (no LLM involved — the
reference's tag template is a plain two-column parser):

* txt — delimiter vote between TAB and comma (tab wins ties,
  tag.py:66-71), then a single-pass state machine: a line that does
  NOT split into exactly two columns accumulates into the pending
  content; a two-column line closes the pair.  Reference quirks
  pinned: every content string carries a LEADING newline (the
  unconditional ``content += "\\n" + ...``, tag.py:78-82), and
  trailing content with no closing pair is dropped;
* csv — same machine over ``csv.reader`` rows with empty cells
  stripped (tag.py:96-110);
* excel — first/second non-empty cell per row via the qa Excel
  pairing (tag.py:54-58 reuses ``rag.app.qa.Excel``);
* tags — ``a.split(',')``, stripped, ``.`` → ``_``
  (``beAdoc``, tag.py:30).

Output mapping (DIVERGENCES.md §11): the doc-store pair
(``content_with_weight``, ``tag_kwd``) flattens into ONE span,
``kind="tag"``, ``text = content + "\\t" + ",".join(tags)``.
"""

from __future__ import annotations

import csv

from .common import ChunkConfig, SpanEmitter, doc_text
from .qa import qa_pairs_from_excel


def clean_tags(a: str) -> list[str]:
    """tag.py:30: split on comma, strip, dots become underscores."""
    return [t.strip().replace(".", "_") for t in a.split(",") if t.strip()]


def tag_pairs_from_lines(lines: list[str]) -> list[tuple[str, str]]:
    """txt path (tag.py:62-92): delimiter vote + accumulate-garbage
    state machine."""
    comma = sum(1 for ln in lines if len(ln.split(",")) == 2)
    tab = sum(1 for ln in lines if len(ln.split("\t")) == 2)
    delimiter = "\t" if tab >= comma else ","

    pairs: list[tuple[str, str]] = []
    content = ""
    for line in lines:
        arr = line.split(delimiter)
        if len(arr) != 2:
            content += "\n" + line
        else:
            content += "\n" + arr[0]
            pairs.append((content, arr[1]))
            content = ""
    return pairs


def tag_pairs_from_csv(lines: list[str]) -> list[tuple[str, str]]:
    """csv path (tag.py:96-110): proper csv rows, empty cells dropped,
    non-2-column rows accumulate the RAW line."""
    pairs: list[tuple[str, str]] = []
    content = ""
    for i, row in enumerate(csv.reader(lines)):
        row = [r.strip() for r in row if r.strip()]
        if len(row) != 2:
            if i < len(lines):
                content += "\n" + lines[i]
        else:
            content += "\n" + row[0]
            pairs.append((content, row[1]))
            content = ""
    return pairs


def chunk_tag(doc: dict, cfg: ChunkConfig) -> list[dict]:
    fmt = doc.get("fmt", "txt")
    out = SpanEmitter()
    if fmt == "excel":
        pairs = qa_pairs_from_excel(doc)
    elif fmt == "csv":
        pairs = tag_pairs_from_csv(doc_text(doc).split("\n"))
    else:
        pairs = tag_pairs_from_lines(doc_text(doc).split("\n"))
    for content, tags in pairs:
        out.emit("tag", content + "\t" + ",".join(clean_tags(tags)))
    return out.to_dicts()
