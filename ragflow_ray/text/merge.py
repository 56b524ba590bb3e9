"""Section → chunk assembly.

Behavioral parity with the *live* code paths of
/root/reference/rag/nlp/__init__.py:

* :func:`greedy_merge`        ← ``naive_merge``        (:521-563)
* :func:`hierarchical_merge`  ← ``hierarchical_merge`` (:431-518)
* :func:`strip_toc_sections`  ← ``remove_contents_table`` (:347-376)
* :func:`promote_colon_titles`← ``make_colon_as_title`` (:379-397)

Reference quirks kept on purpose (documented in SURVEY.md §7.4):

* ``naive_merge`` seeds its accumulator with an empty chunk that
  survives to the output and is only dropped later by
  ``tokenize_chunks`` — callers here must filter empty chunks.
* the new-chunk test is ``tokens > budget`` checked *before* adding,
  so chunks overshoot the budget by one section.
* ``make_colon_as_title`` can never fire in the reference (its
  length guard tests the 1–2 char split *delimiter*), so it is a
  behavioral no-op; we keep the no-op.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from .bullets import BULLET_FAMILIES, _COMPILED_FAMILIES, _TITLEISH_LAYOUT, looks_like_body_text
from .delimiters import full_match_regex, split_regex
from .tokens import token_count

_POS_TAG = re.compile(r"@@[\t0-9.-]+?##")
_TRAILING_TAG = re.compile(r"@@[0-9]+.*")
_TOC_HEADING = re.compile(
    r"(contents|目录|目次|tableofcontents|致谢|acknowledge)$", re.IGNORECASE
)
_SPACEY = re.compile(r"( | |　)+")
_PURE_NUMBER = re.compile(r"[0-9]+$")


def strip_position_tags(text: str) -> str:
    """Drop ``@@pn\\tx0\\tx1\\ttop\\tbottom##`` position tags."""
    return _POS_TAG.sub("", text)


def _as_pairs(sections) -> list[tuple[str, str]]:
    if sections and isinstance(sections[0], str):
        return [(s, "") for s in sections]
    return list(sections)


def greedy_merge(
    sections,
    chunk_token_num: int = 128,
    delimiter: str = "\n。；！？",
    overlapped_percent: int = 0,
) -> list[str]:
    """Greedy token-budget packing of (text, pos_tag) sections.

    Returns raw chunk strings (position tags embedded); the first
    element is usually the empty seed chunk — filter on emission.
    """
    if not sections:
        return []
    sections = _as_pairs(sections)

    chunks = [""]
    budgets = [0]
    open_threshold = chunk_token_num * (100 - overlapped_percent) / 100.0

    def push(text: str, pos: str) -> None:
        tnum = token_count(text)
        if not pos or tnum < 8:
            pos = ""
        if chunks[-1] == "" or budgets[-1] > open_threshold:
            carried = strip_position_tags(chunks[-1])
            text = carried[int(len(carried) * (100 - overlapped_percent) / 100.0) :] + text
            if text.find(pos) < 0:
                text += pos
            chunks.append(text)
            budgets.append(tnum)
        else:
            if chunks[-1].find(pos) < 0:
                text += pos
            chunks[-1] += text
            budgets[-1] += tnum

    splitter = split_regex(delimiter)
    is_delim = full_match_regex(delimiter)
    for sec, pos in sections:
        if token_count(sec) < chunk_token_num:
            push(sec, pos)
            continue
        for frag in splitter.split(sec):
            if is_delim.match(frag):
                continue
            push(frag, pos)

    return chunks


def _rank_before(sorted_ids: list[int], target: int) -> int:
    """Index of the greatest element `< target` (reference binary_search)."""
    if not sorted_ids:
        return -1
    if target > sorted_ids[-1]:
        return len(sorted_ids) - 1
    if target < sorted_ids[0]:
        return -1
    lo, hi = 0, len(sorted_ids)
    while hi - lo > 1:
        mid = (hi + lo) // 2
        if target > sorted_ids[mid]:
            lo = mid
        else:
            hi = mid
    return lo


def hierarchical_merge(bull: int, sections, depth: int) -> list[list[str]]:
    """Assemble one chunk per heading with its ancestor headings.

    ``bull`` is a bullet-family id from ``bullets_category``; sections
    are (text, layout) pairs or plain strings.  Output is a list of
    chunks, each a list of section texts ordered ancestors-first; the
    tiny-chunk merge packs consecutive single-line chunks under 218
    tokens together.  The leading accumulator may be an empty list —
    callers filter empty joins.
    """
    if not sections or bull < 0:
        return []
    sections = _as_pairs(sections)
    sections = [
        (t, o)
        for t, o in sections
        if t
        and len(t.split("@")[0].strip()) > 1
        and not _PURE_NUMBER.match(t.split("@")[0].strip())
    ]
    size = len(BULLET_FAMILIES[bull])

    # bucket section indices by level: family patterns, then title-layout,
    # then body text
    buckets: list[list[int]] = [[] for _ in range(size + 2)]
    for i, (txt, layout) in enumerate(sections):
        for j, pat in enumerate(_COMPILED_FAMILIES[bull]):
            if pat.match(txt.strip()):
                buckets[j].append(i)
                break
        else:
            if _TITLEISH_LAYOUT.search(layout) and not looks_like_body_text(txt):
                buckets[size].append(i)
            else:
                buckets[size + 1].append(i)
    texts = [t for t, _ in sections]

    groups: list[list[int]] = []
    consumed = [False] * len(texts)
    rev = buckets[::-1]
    for i, bucket in enumerate(rev[:depth]):
        for j in bucket:
            if consumed[j]:
                continue
            consumed[j] = True
            groups.append([j])
            if i + 1 == len(rev) - 1:
                continue
            for ii in range(i + 1, len(rev)):
                jj = _rank_before(rev[ii], j)
                if jj < 0:
                    continue
                if rev[ii][jj] > groups[-1][-1]:
                    groups[-1].pop(-1)
                groups[-1].append(rev[ii][jj])
            for ii in groups[-1]:
                consumed[ii] = True

    if not groups:
        return groups
    resolved = [[texts[j] for j in grp[::-1]] for grp in groups]

    merged: list[list[str]] = [[]]
    sizes = [0]
    for chunk in resolved:
        if len(chunk) == 1:
            n = token_count(_TRAILING_TAG.sub("", chunk[0]))
            if n + sizes[-1] < 218:
                merged[-1].append(chunk[0])
                sizes[-1] += n
                continue
        merged.append(chunk)
        sizes.append(218 if len(chunk) > 1 else token_count(_TRAILING_TAG.sub("", chunk[0])))
    return merged


def strip_toc_sections(sections: list, eng: bool = False) -> None:
    """Remove a table-of-contents block from ``sections`` in place.

    On a TOC heading: drop it, derive a prefix from the first following
    non-empty entry, then drop entries until (within a 128-entry
    lookahead) a body entry re-matching that prefix is found.
    """

    def text_at(i: int) -> str:
        s = sections[i]
        return (s if isinstance(s, str) else s[0]).strip()

    i = 0
    while i < len(sections):
        head = _SPACEY.sub("", text_at(i).split("@")[0])
        if not _TOC_HEADING.match(head):
            i += 1
            continue
        sections.pop(i)
        if i >= len(sections):
            break

        def derive_prefix() -> str:
            return text_at(i)[:3] if not eng else " ".join(text_at(i).split()[:2])

        prefix = derive_prefix()
        while not prefix and i < len(sections):
            sections.pop(i)
            if i >= len(sections):
                break
            prefix = derive_prefix()
        if i >= len(sections):
            break
        sections.pop(i)
        if i >= len(sections) or not prefix:
            break
        for j in range(i, min(i + 128, len(sections))):
            if not re.match(prefix, text_at(j)):
                continue
            for _ in range(i, j):
                sections.pop(i)
            break


_COLON_SPLIT = re.compile(r"([。？！!?;；]| \.)")


def promote_colon_titles(sections: list) -> list:
    """Reference ``make_colon_as_title`` — kept as the (inert) original.

    The reference guards on the *length of the split delimiter*
    (always 1–2 chars, never ≥32), so no synthetic title is ever
    inserted; preserved for signature parity.
    """
    if not sections:
        return []
    if isinstance(sections[0], str):
        return sections
    i = 0
    while i < len(sections):
        txt, _layout = sections[i]
        i += 1
        txt = txt.split("@")[0].strip()
        if not txt or txt[-1] not in ":：":
            continue
        rev = txt[::-1]
        arr = _COLON_SPLIT.split(rev)
        if len(arr) < 2 or len(arr[1]) < 32:
            continue
        sections.insert(i - 1, (arr[0][::-1], "title"))
        i += 1
    return sections
