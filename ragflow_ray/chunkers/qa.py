"""The "qa" template chunker — question/answer pair extraction.

Parity with /root/reference/rag/app/qa.py (text-format paths, qa.py:
313-470):

* txt — delimiter vote (TAB vs comma), two-column state machine where
  non-pair lines extend the pending answer; a pair is emitted when the
  next two-column line closes it;
* markdown — ``#`` heading levels form a question stack; the answer is
  the text until the next heading at the same-or-higher level (code
  fences suspend heading detection);
* pdf — question-bullet segmentation over the box pipeline
  (:func:`qa_pairs_from_pdf`, qa.py:77-170);
* docx — heading-level question stack over paragraph payloads, tables
  rendered first (qa.Docx.__call__, qa.py:184-260 + :453-460);
* xlsx — per sheet row: question = first non-empty cell, answer =
  second (qa.Excel, qa.py:36-76);
* each pair renders as ``"Question: q\\tAnswer: a"``
  (``问题：/回答：`` for Chinese), with role prefixes stripped.
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
    """Heading-stack extraction (qa.py:419-448); answers are raw
    markdown here — the CHUNKER renders them to HTML at emission
    (text/mdhtml.py, mirroring qa.py:438,450)."""
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


def qa_pairs_from_pdf(doc: dict) -> tuple[list[tuple[str, str]], list]:
    """Question-bullet segmentation over the box pipeline (qa.Pdf,
    qa.py:77-170): keep headers/footers (drop=False), detect the
    question-numbering family, then walk boxes accumulating answers,
    splicing table text in position order.

    Raises ``ValueError`` when no Q&A structure is recognizable (the
    reference behavior).
    """
    from ..text.qbullets import has_qbullet, qbullets_category
    from .common import build_doc_boxes

    boxes = build_doc_boxes(doc, drop=False)
    boxes.run_table_structure()
    boxes.merge_horizontal()
    tbls = boxes.extract_tables_figures(need_figures=True, return_html=True)

    sections = [b["text"] for b in boxes.boxes]
    q_bull, reg = qbullets_category(sections)
    if q_bull == -1:
        raise ValueError("Unable to recognize Q&A structure.")

    tbls = sorted(tbls, key=lambda el: (el[1][0][0], el[1][0][3]) if el[1] else (0, 0))

    def tbl_info(idx: int):
        if idx >= len(tbls):
            return 1, 0.0, ""
        (ref, content), poss = tbls[idx]
        pn, _l, _r, top, _btm = poss[0]
        text = content if isinstance(content, str) else "".join(content)
        return pn + 1, top, text

    pairs: list[tuple[str, str]] = []
    last_q = last_a = ""
    last_index = -1
    last_box: dict = {"text": ""}
    last_bull = None
    bull_x0: list[float] = []
    tbl_index = 0
    last_pn, last_bottom = 0, 0.0
    for box in boxes.boxes:
        section = box["text"]
        line_pn = box["page_number"]
        line_top = box["top"] - boxes.page_cum_height[line_pn - 1]
        bull, index = has_qbullet(reg, box, last_box, last_index, last_bull, bull_x0)
        last_box, last_index, last_bull = box, index, bull
        tbl_pn, tbl_top, tbl_text = tbl_info(tbl_index)

        def table_due() -> bool:
            after_last = (tbl_pn == last_pn and tbl_top >= last_bottom) or tbl_pn > last_pn
            before_line = (tbl_pn == line_pn and tbl_top <= line_top) or tbl_pn < line_pn
            return after_last and before_line

        if not bull:
            if not last_q:
                if tbl_pn < line_pn or (tbl_pn == line_pn and tbl_top <= line_top):
                    tbl_index += 1
                continue
            addition = section
            while table_due():
                addition = f"{tbl_text}{addition}"
                tbl_index += 1
                tbl_pn, tbl_top, tbl_text = tbl_info(tbl_index)
            last_a = f"{last_a}{addition}"
        else:
            if last_q:
                while table_due():
                    last_a = f"{last_a}{tbl_text}"
                    tbl_index += 1
                    tbl_pn, tbl_top, tbl_text = tbl_info(tbl_index)
                pairs.append((last_q, last_a))
                last_q = last_a = ""
            last_q = bull.group()
            last_a = section[bull.span()[1] :]
        last_bottom = box["bottom"] - boxes.page_cum_height[line_pn - 1]
        last_pn = line_pn
    if last_q:
        pairs.append((last_q, last_a))
    return pairs, tbls


def qa_pairs_from_excel(doc: dict) -> list[tuple[str, str]]:
    """Per sheet row: q = first non-empty cell, a = second (qa.Excel,
    qa.py:47-64).  The reference's ``if not cell.value`` skip also
    drops falsy values (0, empty string) — quirk kept."""
    from .common import doc_sheets

    pairs: list[tuple[str, str]] = []
    for sheet in doc_sheets(doc):
        for row in sheet.get("rows", []):
            q = a = ""
            for cell in row:
                if not cell:
                    continue
                if not q:
                    q = str(cell)
                elif not a:
                    a = str(cell)
                else:
                    break
            if q and a:
                pairs.append((q, a))
    return pairs


def qa_pairs_from_docx_spans(doc: dict) -> tuple[list[tuple[str, str, str | None]],
                                                 list[str]]:
    """Heading-stack Q&A over docx paragraph payloads (qa.Docx.__call__,
    qa.py:200-260): Heading-N paragraphs push questions, everything
    else (including blank paragraphs, as bare newlines) extends the
    pending answer; media spans attach as combined refs (the engine's
    ``concat_img``).  Tables render to colspan-merged HTML."""
    import json

    from ..parsers.docxlike import combine_refs, table_rows_to_html
    from .laws import _docx_question_level

    pairs: list[tuple[str, str, str | None]] = []
    tables: list[str] = []
    last_answer = ""
    last_ref: str | None = None
    question_stack: list[str] = []
    level_stack: list[int] = []

    for span in sorted(doc["spans"], key=lambda s: s["offset"]):
        if span["kind"] == "media":
            last_ref = combine_refs(last_ref, span["media_ref"] or None)
            continue
        try:
            payload = json.loads(span["text"])
        except (json.JSONDecodeError, TypeError):
            payload = {"t": span["text"], "style": ""}
        if "table" in payload:
            tables.append(table_rows_to_html(payload["table"]["rows"]))
            continue
        text = payload.get("t", "")
        level, p_text = 0, ""
        if text.strip():
            level, p_text = _docx_question_level(text, payload.get("style", ""), -1)
        if not level or level > 6:
            last_answer = f"{last_answer}\n{p_text}"
            continue
        if last_answer or last_ref:
            sum_question = "\n".join(question_stack)
            if sum_question:
                pairs.append((sum_question, last_answer, last_ref))
            last_answer, last_ref = "", None
        while question_stack and level <= level_stack[-1]:
            question_stack.pop()
            level_stack.pop()
        question_stack.append(p_text)
        level_stack.append(level)
    if last_answer:
        sum_question = "\n".join(question_stack)
        if sum_question:
            pairs.append((sum_question, last_answer, last_ref))
    return pairs, tables


def chunk_qa(doc: dict, cfg: ChunkConfig) -> list[dict]:
    fmt = doc.get("fmt", "txt")
    out = SpanEmitter()
    if fmt == "pdf":
        pairs, _tbls = qa_pairs_from_pdf(doc)
    elif fmt == "docx":
        triples, tables = qa_pairs_from_docx_spans(doc)
        # reference order: tables first (tokenize_table), then pairs
        out.emit_tables([(("", t), "") for t in tables], cfg)
        for q, a, ref in triples:
            out.emit("qa", format_pair(q, a, cfg.is_english), ref or "")
        return out.to_dicts()
    elif fmt == "excel":
        pairs = qa_pairs_from_excel(doc)
    else:
        lines = doc_text(doc).split("\n")
        if fmt == "markdown":
            # the reference HTML-renders markdown answers
            # (rag/app/qa.py:438,450: markdown(last_answer,
            # extensions=['markdown.extensions.tables']))
            from ..text.mdhtml import markdown_to_html

            pairs = [(q, markdown_to_html(a))
                     for q, a in qa_pairs_from_markdown(lines)]
        else:
            pairs = qa_pairs_from_lines(lines)
    for q, a in pairs:
        out.emit("qa", format_pair(q, a, cfg.is_english))
    return out.to_dicts()
