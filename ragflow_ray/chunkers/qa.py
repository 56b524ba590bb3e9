"""The "qa" template chunker — question/answer pair extraction.

Parity with /root/reference/rag/app/qa.py (text-format paths, qa.py:
313-470):

* txt — delimiter vote (TAB vs comma), two-column state machine where
  non-pair lines extend the pending answer; a pair is emitted when the
  next two-column line closes it;
* markdown — ``#`` heading levels form a question stack; the answer is
  the text until the next heading at the same-or-higher level (code
  fences suspend heading detection);
* each pair renders as ``"Question: q\\tAnswer: a"``
  (``问题：/回答：`` for Chinese), with role prefixes stripped.

The PDF/docx/xlsx QA paths need qbullet geometry / office payloads and
are out of scope for round 1 (SURVEY.md §2.6 marks qa "partial").
"""

from __future__ import annotations

import re

from .common import ChunkConfig, SpanEmitter, doc_text

_ROLE_PREFIX = re.compile(
    r"^(问题|答案|回答|user|assistant|Q|A|Question|Answer|问|答)[\t:： ]+",
    re.IGNORECASE,
)
_MD_HEADING = re.compile(r"#*")


def strip_role_prefix(txt: str) -> str:
    return _ROLE_PREFIX.sub("", txt.strip())


def format_pair(q: str, a: str, eng: bool) -> str:
    qprefix = "Question: " if eng else "问题："
    aprefix = "Answer: " if eng else "回答："
    return "\t".join([qprefix + strip_role_prefix(q), aprefix + strip_role_prefix(a)])


def qa_pairs_from_lines(lines: list[str]) -> list[tuple[str, str]]:
    """Two-column state machine (qa.py:344-372)."""
    comma = sum(1 for ln in lines if len(ln.split(",")) == 2)
    tab = sum(1 for ln in lines if len(ln.split("\t")) == 2)
    delimiter = "\t" if tab >= comma else ","

    pairs: list[tuple[str, str]] = []
    question, answer = "", ""
    for line in lines:
        arr = line.split(delimiter)
        if len(arr) != 2:
            if question:
                answer += "\n" + line
        else:
            if question and answer:
                pairs.append((question, answer))
            question, answer = arr
    if question:
        pairs.append((question, answer))
    return pairs


def qa_pairs_from_markdown(lines: list[str]) -> list[tuple[str, str]]:
    """Heading-stack extraction (qa.py:419-448); answers keep their raw
    markdown (the reference HTML-renders them — codecs out of scope)."""
    pairs: list[tuple[str, str]] = []
    last_answer = ""
    question_stack: list[str] = []
    level_stack: list[int] = []
    code_block = False
    for line in lines:
        if line.strip().startswith("```"):
            code_block = not code_block
        level, question = 0, ""
        if not code_block:
            m = _MD_HEADING.match(line)
            if m and m.group(0):
                level, question = len(m.group(0)), line.lstrip("#").lstrip()
        if not level or level > 6:
            last_answer = f"{last_answer}\n{line}"
            continue
        if last_answer.strip():
            sum_question = "\n".join(question_stack)
            if sum_question:
                pairs.append((sum_question, last_answer))
            last_answer = ""
        while question_stack and level <= level_stack[-1]:
            question_stack.pop()
            level_stack.pop()
        question_stack.append(question)
        level_stack.append(level)
    if last_answer.strip():
        sum_question = "\n".join(question_stack)
        if sum_question:
            pairs.append((sum_question, last_answer))
    return pairs


def chunk_qa(doc: dict, cfg: ChunkConfig) -> list[dict]:
    fmt = doc.get("fmt", "txt")
    lines = doc_text(doc).split("\n")
    if fmt == "markdown":
        pairs = qa_pairs_from_markdown(lines)
    else:
        pairs = qa_pairs_from_lines(lines)
    out = SpanEmitter()
    for q, a in pairs:
        out.emit("qa", format_pair(q, a, cfg.is_english))
    return out.to_dicts()
