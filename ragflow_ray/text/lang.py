"""Language sniffing (char-class ratio heuristics).

Parity with /root/reference/rag/nlp/__init__.py:228-257
(``is_english`` / ``is_chinese``).  Deterministic — no sampling; the
reference samples sections with unseeded ``random.choices`` before
voting (rag/nlp/__init__.py:196-198), which we deliberately replace
with a full (or deterministically seeded) scan so that reruns and
different parallelism levels agree.
"""

from __future__ import annotations

import re

_ENGLISHY = re.compile(r"[`a-zA-Z0-9\s.,':;/\"?<>!\(\)\-]")


def is_english_text(texts) -> bool:
    """>80% of the (non-empty) items are plain-latin strings."""
    if not texts:
        return False
    if isinstance(texts, str):
        items = list(texts)
    elif isinstance(texts, list):
        items = [t for t in texts if isinstance(t, str) and t.strip()]
    else:
        return False
    if not items:
        return False
    hits = sum(1 for t in items if _ENGLISHY.fullmatch(t.strip()))
    return hits / len(items) > 0.8


def is_chinese_text(text: str) -> bool:
    """>20% CJK-unified characters."""
    if not text:
        return False
    cjk = sum(1 for ch in text if "一" <= ch <= "鿿")
    return cjk / len(text) > 0.2
