"""JSON / JSONL structure-preserving splitter.

Parity with /root/reference/deepdoc/parser/json_parser.py:27-179
(itself derived from the public langchain RecursiveJsonSplitter):
recursively pack key/value subtrees into chunks whose serialized size
stays under ``max_chunk_size * 2`` characters, starting a new chunk
once the current one reaches ``min_chunk_size``; lists are converted
to index-keyed dicts first.  JSONL input is split per line.
"""

from __future__ import annotations

import json
from typing import Any


def _json_size(data: dict) -> int:
    return len(json.dumps(data, ensure_ascii=False))


def _listify(data: Any) -> Any:
    if isinstance(data, dict):
        return {k: _listify(v) for k, v in data.items()}
    if isinstance(data, list):
        return {str(i): _listify(v) for i, v in enumerate(data)}
    return data


class JsonSplitter:
    def __init__(self, max_chunk_size: int = 2000, min_chunk_size: int | None = None):
        self.max_chunk_size = max_chunk_size * 2
        self.min_chunk_size = (
            min_chunk_size
            if min_chunk_size is not None
            else max(max_chunk_size - 200, 50)
        )

    def _set_path(self, d: dict, path: list[str], value: Any) -> None:
        for key in path[:-1]:
            d = d.setdefault(key, {})
        d[path[-1]] = value

    def _split(self, data: Any, path: list[str], chunks: list[dict]) -> list[dict]:
        if isinstance(data, dict):
            for key, value in data.items():
                new_path = path + [key]
                used = _json_size(chunks[-1])
                size = _json_size({key: value})
                if size < self.max_chunk_size - used:
                    self._set_path(chunks[-1], new_path, value)
                else:
                    if used >= self.min_chunk_size:
                        chunks.append({})
                    self._split(value, new_path, chunks)
        else:
            self._set_path(chunks[-1], path, data)
        return chunks

    def split(self, data: Any, convert_lists: bool = True) -> list[dict]:
        if convert_lists:
            data = _listify(data)
        chunks = self._split(data, [], [{}])
        if chunks and not chunks[-1]:
            chunks.pop()
        return chunks


def _looks_like_jsonl(txt: str, sample_limit: int = 10, threshold: float = 0.8) -> bool:
    lines = [ln.strip() for ln in txt.strip().splitlines() if ln.strip()]
    if not lines:
        return False
    try:
        json.loads(txt)
        return False
    except json.JSONDecodeError:
        pass
    sample = lines[: min(len(lines), sample_limit)]
    ok = 0
    for ln in sample:
        try:
            json.loads(ln)
            ok += 1
        except json.JSONDecodeError:
            pass
    return bool(ok) and ok / len(sample) >= threshold


def parse_json(text: str, max_chunk_size: int = 2000) -> list[str]:
    """→ serialized JSON chunk strings (empty on unparseable input)."""
    splitter = JsonSplitter(max_chunk_size)
    if _looks_like_jsonl(text):
        out: list[str] = []
        for line in text.strip().splitlines():
            if not line.strip():
                continue
            try:
                data = json.loads(line)
            except json.JSONDecodeError:
                continue
            out.extend(
                json.dumps(c, ensure_ascii=False) for c in splitter.split(data) if c
            )
        return out
    try:
        data = json.loads(text)
    except json.JSONDecodeError:
        return []
    return [json.dumps(c, ensure_ascii=False) for c in splitter.split(data) if c]
