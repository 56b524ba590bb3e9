"""The "manual" template chunker (PDF).

Parity with /root/reference/rag/app/manual.py:30-260: naive box
pipeline + reading-order sort + TOC dropping + whitespace squeeze;
sections carry (text, layoutno, positions).  Grouping pivots on the
most frequent title level (``title_frequency``; the reference prefers
PDF outlines when they cover >3% of sections — our page payloads have
no outline channel, so the bullet path is the live one).  Chunks merge
while under 32 tokens, or under 1024 tokens within the same section
(or for tables, sec_id −1); position tags are appended inline.
"""

from __future__ import annotations

import re

from ..text.bullets import bullets_category, title_frequency
from ..text.tokens import token_count
from .common import ChunkConfig, SpanEmitter, build_doc_boxes

_MULTI_SPACE = re.compile(r"([\t 　]|　){2,}")


def _pos_tag(pn, left, right, top, bottom) -> str:
    if pn + left + right + top + bottom == 0:
        return ""
    return "@@{}\t{:.1f}\t{:.1f}\t{:.1f}\t{:.1f}##".format(pn, left, right, top, bottom)


def chunk_manual(doc: dict, cfg: ChunkConfig) -> list[dict]:
    if doc.get("fmt") != "pdf":
        raise NotImplementedError("manual template: only pdf-family docs")

    boxes = build_doc_boxes(doc, drop=True)
    boxes.run_table_structure()
    boxes.merge_horizontal()
    tbls = boxes.extract_tables_figures(need_figures=True, return_html=True)
    boxes.sort_reading_order()
    boxes.drop_toc_pages()
    for b in boxes.boxes:
        b["text"] = _MULTI_SPACE.sub(" ", b["text"].strip())

    sections = [
        (b["text"], b.get("layoutno", ""), boxes.positions_of(b)) for b in boxes.boxes
    ]

    outlines: list[tuple[str, int]] = []
    for page in boxes.pages:
        for t, d in page.outlines:
            if (t, d) not in outlines:
                outlines.append((t, d))

    if sections and len(outlines) / len(sections) > 0.03:
        # outline channel: level of each section = level of the first
        # outline entry sharing >80% character bigrams (manual.py:199-212)
        max_lvl = max(lvl for _, lvl in outlines)
        most_level = max(0, max_lvl - 1)
        levels = []
        for txt, _, _ in sections:
            for t, lvl in outlines:
                tks = {t[i] + t[i + 1] for i in range(len(t) - 1)}
                tks_ = {txt[i] + txt[i + 1] for i in range(min(len(t), len(txt) - 1))}
                if len(tks & tks_) / max(len(tks), len(tks_), 1) > 0.8:
                    levels.append(lvl)
                    break
            else:
                levels.append(max_lvl + 1)
    else:
        bull = bullets_category([txt for txt, _, _ in sections])
        most_level, levels = title_frequency(bull, [(t, l) for t, l, _ in sections])
    assert len(sections) == len(levels)

    sec_ids = []
    sid = 0
    for i, lvl in enumerate(levels):
        if lvl <= most_level and i > 0 and lvl != levels[i - 1]:
            sid += 1
        sec_ids.append(sid)

    entries = [
        (txt, sec_ids[i], poss) for i, (txt, _, poss) in enumerate(sections)
    ]
    for (ref, rows), poss in tbls:
        if not rows:
            continue
        entries.append(
            (rows if isinstance(rows, str) else rows[0], -1,
             [(p[0] + 1, p[1], p[2], p[3], p[4]) for p in poss])
        )

    chunks: list[str] = []
    last_sid = -2
    tk_cnt = 0
    for txt, sec_id, poss in sorted(
        entries, key=lambda x: (x[-1][0][0], x[-1][0][3], x[-1][0][1])
    ):
        tags = "\t".join(_pos_tag(*pos) for pos in poss)
        if tk_cnt < 32 or (tk_cnt < 1024 and (sec_id == last_sid or sec_id == -1)):
            if chunks:
                chunks[-1] += "\n" + txt + tags
                tk_cnt += token_count(txt)
                continue
        chunks.append(txt + tags)
        tk_cnt = token_count(txt)
        if sec_id > -1:
            last_sid = sec_id

    out = SpanEmitter()
    out.emit_tables(tbls, cfg)
    out.emit_text_chunks(chunks, strip_tags=True)
    return out.to_dicts()
