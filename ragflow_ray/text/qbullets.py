"""Question-numbering detection for QA documents.

Parity with /root/reference/rag/nlp/__init__.py:74-165
(``QUESTION_PATTERN``, ``qbullets_category``, ``has_qbullet``):
eleven question-marker regex families voted by first-hit; per-box
bullet acceptance with x-indent and index-monotonicity heuristics.
"""

from __future__ import annotations

import re

from .bullets import is_probably_not_bullet
from .numbers import index_int

QUESTION_PATTERNS = [
    r"第([零一二三四五六七八九十百0-9]+)问",
    r"第([零一二三四五六七八九十百0-9]+)条",
    r"[\(（]([零一二三四五六七八九十百]+)[\)）]",
    r"第([0-9]+)问",
    r"第([0-9]+)条",
    r"([0-9]{1,2})[\. 、]",
    r"([零一二三四五六七八九十百]+)[ 、]",
    r"[\(（]([0-9]{1,2})[\)）]",
    r"QUESTION (ONE|TWO|THREE|FOUR|FIVE|SIX|SEVEN|EIGHT|NINE|TEN)",
    r"QUESTION (I+V?|VI*|XI|IX|X)",
    r"QUESTION ([0-9]+)",
]

_ASKING = re.compile(r"(what|when|where|how|why|which|who|whose|为什么|为啥|哪)")
_TAIL = r"(\w|\W)*?(?:？|\?|\n|$)+"


def qbullets_category(sections: list[str]) -> tuple[int, str]:
    """→ (winning pattern index, pattern); (−1, last pattern) when no
    section matches (the reference indexes with −1 → last entry)."""
    hits = [0] * len(QUESTION_PATTERNS)
    for i, pat in enumerate(QUESTION_PATTERNS):
        for sec in sections:
            if re.match(pat, sec) and not is_probably_not_bullet(sec):
                hits[i] += 1
                break
    best, best_hits = -1, 0
    for i, h in enumerate(hits):
        if h > best_hits:
            best, best_hits = i, h
    return best, QUESTION_PATTERNS[best]


def has_qbullet(
    reg: str,
    box: dict,
    last_box: dict,
    last_index: int,
    last_bull,
    bull_x0_list: list[float],
):
    """Accept/reject a question bullet on ``box`` →
    (match object | None, updated last_index).

    Acceptance requires geometric alignment with earlier bullets
    (x-indent within 10pt of the running average) and either a
    monotonically non-decreasing index, a question-mark ending, a
    title layout, or an interrogative opening.
    """
    section, last_section = box["text"], last_box["text"]
    m = re.match(reg + _TAIL, section)
    if not m:
        return None, last_index
    if "x0" not in last_box:
        last_box["x0"] = box["x0"]
    if "top" not in last_box:
        last_box["top"] = box["top"]
    if last_bull and box["x0"] - last_box["x0"] > 10:
        return None, last_index
    if (
        not last_bull
        and box["x0"] >= last_box["x0"]
        and box["top"] - last_box["top"] < 20
    ):
        return None, last_index
    avg_x0 = sum(bull_x0_list) / len(bull_x0_list) if bull_x0_list else box["x0"]
    if box["x0"] - avg_x0 > 10:
        return None, last_index
    index = index_int(m.group(1))
    if last_section and last_section[-1] in ":：":
        return None, last_index
    if not last_index or index >= last_index:
        bull_x0_list.append(box["x0"])
        return m, index
    if section and section[-1] in "?？":
        bull_x0_list.append(box["x0"])
        return m, index
    if box.get("layout_type") == "title":
        bull_x0_list.append(box["x0"])
        return m, index
    lead = re.match(reg, section)
    pure = section.lstrip(lead.group()).lower() if lead else section.lower()
    if _ASKING.match(pure):
        bull_x0_list.append(box["x0"])
        return m, index
    return None, last_index
