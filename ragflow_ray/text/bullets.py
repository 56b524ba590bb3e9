"""Bullet / heading pattern families and voting.

Behavioral parity with /root/reference/rag/nlp/__init__.py:168-225
(``BULLET_PATTERN``, ``bullets_category``, ``not_bullet``),
:401-428 (``title_frequency``, ``not_title``).

Four families: CN legal (编/章/节/条), numeric outline, CN enumeration,
EN Part/Chapter/Section/Article.  ``bullets_category`` votes: for each
family count how many sections match at least one of its patterns and
return the family with the strictly-highest hit count (ties resolved
to the earliest family; -1 when nothing matches).
"""

from __future__ import annotations

import re
from collections import Counter

_CN_NUM = "零一二三四五六七八九十百"

BULLET_FAMILIES: list[list[str]] = [
    [  # 0: Chinese legal hierarchy
        rf"第[{_CN_NUM}0-9]+(分?编|部分)",
        rf"第[{_CN_NUM}0-9]+章",
        rf"第[{_CN_NUM}0-9]+节",
        rf"第[{_CN_NUM}0-9]+条",
        rf"[\(（][{_CN_NUM}]+[\)）]",
    ],
    [  # 1: numeric outline
        r"第[0-9]+章",
        r"第[0-9]+节",
        r"[0-9]{,2}[\. 、]",
        r"[0-9]{,2}\.[0-9]{,2}[^a-zA-Z/%~-]",
        r"[0-9]{,2}\.[0-9]{,2}\.[0-9]{,2}",
        r"[0-9]{,2}\.[0-9]{,2}\.[0-9]{,2}\.[0-9]{,2}",
    ],
    [  # 2: Chinese enumeration
        rf"第[{_CN_NUM}0-9]+章",
        rf"第[{_CN_NUM}0-9]+节",
        rf"[{_CN_NUM}]+[ 、]",
        rf"[\(（][{_CN_NUM}]+[\)）]",
        r"[\(（][0-9]{,2}[\)）]",
    ],
    [  # 3: English book hierarchy
        r"PART (ONE|TWO|THREE|FOUR|FIVE|SIX|SEVEN|EIGHT|NINE|TEN)",
        r"Chapter (I+V?|VI*|XI|IX|X)",
        r"Section [0-9]+",
        r"Article [0-9]+",
    ],
]

_COMPILED_FAMILIES = [[re.compile(p) for p in fam] for fam in BULLET_FAMILIES]

# one alternation per family: ``(?:p1)|(?:p2)…`` matched at position 0
# is exactly ``any(p.match(s) for p in fam)`` — one C-level match call
# instead of up to 6 (bullets_category dominated the chunker profile)
_FAMILY_UNION = [
    re.compile("|".join(f"(?:{p})" for p in fam)) for fam in BULLET_FAMILIES
]

# lines that *look* numbered but are data, not bullets
_FALSE_BULLET = [re.compile(p) for p in (r"0", r"[0-9]+ +[0-9~个只-]", r"[0-9]+\.{2,}")]
_FALSE_BULLET_UNION = re.compile(r"(?:0)|(?:[0-9]+ +[0-9~个只-])|(?:[0-9]+\.{2,})")

_TITLEISH_LAYOUT = re.compile(r"(title|head)")
_SENTENCE_PUNCT = re.compile(r"[,;，。；！!]")
_CN_ARTICLE = re.compile(rf"第[{_CN_NUM}0-9]+条")


def is_probably_not_bullet(line: str) -> bool:
    return _FALSE_BULLET_UNION.match(line) is not None


def bullets_category(sections: list[str]) -> int:
    """Pick the bullet family with the most matching sections; -1 if none.

    Sections iterate on the outside so the strip + false-bullet guard
    runs once per section instead of once per (section, family)."""
    hits = [0] * len(_FAMILY_UNION)
    for sec in sections:
        sec = sec.strip()
        if is_probably_not_bullet(sec):
            continue
        for i, union in enumerate(_FAMILY_UNION):
            if union.match(sec):
                hits[i] += 1
    best, best_hits = -1, 0
    for i, h in enumerate(hits):
        if h > best_hits:
            best, best_hits = i, h
    return best


def looks_like_body_text(txt: str) -> bool:
    """True when ``txt`` cannot be a title (reference ``not_title``)."""
    if _CN_ARTICLE.match(txt):
        return False
    if len(txt.split()) > 12 or (txt.find(" ") < 0 and len(txt) >= 32):
        return True
    return bool(_SENTENCE_PUNCT.search(txt))


def section_levels(bull: int, sections: list[tuple[str, str]]) -> list[int]:
    """Per-section bullet level.

    Level ``j`` = index of the first matching pattern of family
    ``bull``; ``len(family)`` for a title-layout line that passes the
    title filter; ``len(family)+1`` for plain body text.
    """
    size = len(BULLET_FAMILIES[bull]) if bull >= 0 else 0
    levels = []
    for txt, layout in sections:
        lvl = size + 1
        if bull >= 0:
            for j, p in enumerate(_COMPILED_FAMILIES[bull]):
                if p.match(txt.strip()) and not is_probably_not_bullet(txt):
                    lvl = j
                    break
            else:
                if _TITLEISH_LAYOUT.search(layout) and not looks_like_body_text(
                    txt.split("@")[0]
                ):
                    lvl = size
        levels.append(lvl)
    return levels


def title_frequency(bull: int, sections: list[tuple[str, str]]) -> tuple[int, list[int]]:
    """Most frequent title level (the grouping pivot) + per-section levels.

    Parity with rag/nlp/__init__.py:401-420.
    """
    size = len(BULLET_FAMILIES[bull]) if bull >= 0 else 0
    if not sections or bull < 0:
        return size + 1, [size + 1 for _ in sections]
    levels = section_levels(bull, sections)
    most = size + 1
    for level, _ in sorted(Counter(levels).items(), key=lambda kv: -kv[1]):
        if level <= size:
            most = level
            break
    return most, levels
