"""The "table" template chunker — typed tabular rows to field-labeled
chunks.

Parity with /root/reference/rag/app/table.py:302-402 and
``column_data_type`` (:258-300): headers from the first line, rows
split on TAB, per-column type voting (int / float / bool / datetime /
text) with value normalization, one chunk per row rendered as
``"header:value; ..."``.  The doc-store field mapping (pinyin names,
``_tks``/``_long`` suffixes) is storage plumbing and out of scope.
"""

from __future__ import annotations

import re
from datetime import datetime

from .common import ChunkConfig, SpanEmitter, doc_text

_INT = re.compile(r"[+-]?[0-9]+$")
_FLOAT = re.compile(r"[+-]?[0-9.]{,19}$")
_BOOL = re.compile(r"(true|yes|是|\*|✓|✔|☑|✅|√|false|no|否|⍻|×)$", re.IGNORECASE)
_BOOL_TRUE = re.compile(r"(true|yes|是|\*|✓|✔|☑|✅|√)$", re.IGNORECASE)
_BOOL_FALSE = re.compile(r"(false|no|否|⍻|×)$", re.IGNORECASE)


def parse_datetime(s: str) -> str | None:
    try:
        from dateutil.parser import parse as _parse

        return _parse(s.strip()).strftime("%Y-%m-%d %H:%M:%S")
    except Exception:  # noqa: BLE001 — unparseable = not a datetime
        return None


def to_bool(s: str) -> str | None:
    s = str(s).strip()
    if _BOOL_TRUE.match(s):
        return "yes"
    if _BOOL_FALSE.match(s):
        return "no"
    return None


def column_data_type(values: list) -> tuple[list, str]:
    """Vote a column type and normalize values (table.py:258-300)."""
    counts = {"int": 0, "float": 0, "text": 0, "datetime": 0, "bool": 0}
    float_flag = False
    for a in values:
        if a is None:
            continue
        s = str(a).replace("%%", "")
        if _INT.match(s) and not s.startswith("0"):
            counts["int"] += 1
            if int(str(a)) > 2**63 - 1:
                float_flag = True
                break
        elif _FLOAT.match(s) and not s.startswith("0"):
            counts["float"] += 1
        elif _BOOL.match(str(a)):
            counts["bool"] += 1
        elif parse_datetime(str(a)):
            counts["datetime"] += 1
        else:
            counts["text"] += 1
    if float_flag:
        ty = "float"
    else:
        ty = sorted(counts.items(), key=lambda kv: -kv[1])[0][0]
    cast = {"int": int, "float": float, "datetime": parse_datetime,
            "bool": to_bool, "text": str}[ty]
    out = []
    for a in values:
        if a is None:
            out.append(None)
            continue
        try:
            out.append(cast(str(a)))
        except Exception:  # noqa: BLE001
            out.append(None)
    return out, ty


def chunk_table(doc: dict, cfg: ChunkConfig, delimiter: str = "\t") -> list[dict]:
    lines = [ln for ln in doc_text(doc).split("\n")]
    if not lines:
        return []
    headers = lines[0].split(delimiter)
    rows = []
    for line in lines[1:]:
        row = line.split(delimiter)
        if len(row) == len(headers):
            rows.append(row)

    # drop index-ish columns (table.py:353-356)
    drop = [j for j, h in enumerate(headers) if h in ("id", "_id", "index", "idx")]
    if drop:
        headers = [h for j, h in enumerate(headers) if j not in drop]
        rows = [[v for j, v in enumerate(r) if j not in drop] for r in rows]

    columns = list(zip(*rows)) if rows else [[] for _ in headers]
    typed_cols = []
    for col in columns:
        values, _ty = column_data_type(list(col))
        typed_cols.append(values)

    out = SpanEmitter()
    for i in range(len(rows)):
        fields = []
        for j, header in enumerate(headers):
            v = typed_cols[j][i]
            if v is None or not str(v):
                continue
            fields.append(f"{header}:{v}")
        if fields:
            out.emit("row", "; ".join(fields))
    return out.to_dicts()
