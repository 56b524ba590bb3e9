"""Numbering-index parsing: arabic, english words, chinese numerals,
roman numerals.

Stand-in for the reference's cn2an / word2number / roman_numbers
dependencies (rag/nlp/__init__.py:132-147) — same fallback chain,
implemented from the public numeral systems.
"""

from __future__ import annotations

_EN_WORDS = {
    "zero": 0, "one": 1, "two": 2, "three": 3, "four": 4, "five": 5,
    "six": 6, "seven": 7, "eight": 8, "nine": 9, "ten": 10,
    "eleven": 11, "twelve": 12, "thirteen": 13, "fourteen": 14,
    "fifteen": 15, "sixteen": 16, "seventeen": 17, "eighteen": 18,
    "nineteen": 19, "twenty": 20, "thirty": 30, "forty": 40,
    "fifty": 50, "sixty": 60, "seventy": 70, "eighty": 80, "ninety": 90,
}
_CN_DIGITS = {"零": 0, "一": 1, "二": 2, "三": 3, "四": 4, "五": 5,
              "六": 6, "七": 7, "八": 8, "九": 9}
_CN_UNITS = {"十": 10, "百": 100}
_ROMAN = {"I": 1, "V": 5, "X": 10, "L": 50, "C": 100, "D": 500, "M": 1000}


def english_word_number(text: str) -> int:
    total = 0
    matched = False
    for w in text.strip().lower().replace("-", " ").split():
        if w not in _EN_WORDS:
            raise ValueError(text)
        total += _EN_WORDS[w]
        matched = True
    if not matched:
        raise ValueError(text)
    return total


def chinese_number(text: str) -> int:
    total, current = 0, 0
    matched = False
    for ch in text.strip():
        if ch in _CN_DIGITS:
            current = _CN_DIGITS[ch]
            matched = True
        elif ch in _CN_UNITS:
            unit = _CN_UNITS[ch]
            total += (current or 1) * unit
            current = 0
            matched = True
        else:
            raise ValueError(text)
    if not matched:
        raise ValueError(text)
    return total + current


def roman_number(text: str) -> int:
    s = text.strip().upper()
    if not s or any(ch not in _ROMAN for ch in s):
        raise ValueError(text)
    total = 0
    for i, ch in enumerate(s):
        v = _ROMAN[ch]
        if i + 1 < len(s) and _ROMAN[s[i + 1]] > v:
            total -= v
        else:
            total += v
    return total


def index_int(index_str: str) -> int:
    """Arabic → english-word → chinese → roman, else −1
    (rag/nlp/__init__.py:132-147)."""
    for parse in (int, english_word_number, chinese_number, roman_number):
        try:
            return parse(index_str)
        except (ValueError, TypeError):
            continue
    return -1
