"""Deterministic synthetic corpus of interleaved text+media documents.

Implements the fixture families of FIXTURES.md §3 (derived from the
reference's test-fixture style, /root/reference/test/utils/file_utils.py,
but content-rich).  Every document's RNG is seeded by
``crc32(f"{seed}:{doc_id}")`` so generation is reproducible per doc and
independent of generation order / parallelism.

Input schema (BASELINE.json input_hint + engine extras):

    doc_id: string
    fmt:      string  ("html" | "txt" | "markdown" | "json" | "docx" | "pdf")
    template: string  (suggested chunker: naive | book | laws | paper | one)
    spans:  list<struct<kind, text, media_ref, offset>>

The Lance format is not available in this container; Parquet stands in
(same Arrow schema, swap ``write_parquet`` → ``write_lance`` on a
cluster with Lance).
"""

from __future__ import annotations

import json
import random
import zlib

import pyarrow as pa

SPAN_TYPE = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)
INPUT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("fmt", pa.string()),
        ("template", pa.string()),
        ("n_media", pa.int32()),  # media-span count: the cheap cost
        # estimate used for heavy/light routing with parquet pushdown
        ("spans", pa.list_(SPAN_TYPE)),
    ]
)
OUT_SPAN_TYPE = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("order", pa.int32()),
    ]
)
OUTPUT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("template", pa.string()),
        ("n_spans", pa.int32()),
        ("n_chars", pa.int64()),
        ("error", pa.string()),
        ("spans", pa.list_(OUT_SPAN_TYPE)),
    ]
)

_WORDS = (
    "data stream merge sort table scan filter window batch vector query "
    "join group order part key hash line row column value fast slow small "
    "big index store shard block spill cache plan stage layout page text"
).split()

_ZH_CHARS = "数据流合并排序表扫描过滤窗口批向量查询连接组顺序部分键哈希行列值快慢小大索引存储分片块缓存计划阶段布局页文本"

FAMILIES = (
    "html", "txt", "markdown", "json", "book_txt", "laws_txt",
    "paper_pdf", "book_pdf", "docx", "qa_txt", "table_tsv", "slides",
    "manual_pdf", "excel", "qa_pdf",
)

_FMT = {
    "html": "html", "txt": "txt", "markdown": "markdown", "json": "json",
    "book_txt": "txt", "laws_txt": "txt", "paper_pdf": "pdf",
    "book_pdf": "pdf", "docx": "docx", "qa_txt": "txt",
    "table_tsv": "txt", "slides": "slides", "manual_pdf": "pdf",
    "excel": "excel", "qa_pdf": "pdf",
}
_TEMPLATE = {
    "html": "naive", "txt": "naive", "markdown": "naive", "json": "naive",
    "book_txt": "book", "laws_txt": "laws", "paper_pdf": "paper",
    "book_pdf": "book", "docx": "naive", "qa_txt": "qa",
    "table_tsv": "table", "slides": "presentation", "manual_pdf": "manual",
    "excel": "naive", "qa_pdf": "qa",
}


def _rng(seed: int, doc_id: str) -> random.Random:
    return random.Random(zlib.crc32(f"{seed}:{doc_id}".encode()))


def _sentence(r: random.Random, n: int | None = None, zh: bool = False) -> str:
    if zh:
        k = n or r.randint(8, 20)
        return "".join(r.choice(_ZH_CHARS) for _ in range(k)) + "。"
    k = n or r.randint(6, 16)
    words = [r.choice(_WORDS) for _ in range(k)]
    return " ".join(words).capitalize() + r.choice([".", ".", ".", "!", "?"])


def _paragraph(r: random.Random, sentences: int | None = None, zh: bool = False) -> str:
    return " ".join(_sentence(r, zh=zh) for _ in range(sentences or r.randint(2, 5)))


def _span(kind: str, text: str, media_ref: str, offset: int) -> dict:
    return {"kind": kind, "text": text, "media_ref": media_ref, "offset": offset}


# --- family generators -------------------------------------------------


def _gen_html(r: random.Random, doc_id: str) -> list[dict]:
    n_paras = r.randint(5, 20)
    nav_links = "".join(
        f'<a href="/{w}">{w.capitalize()}</a> '
        for w in r.sample(_WORDS, r.randint(4, 8))
    )
    paras = "".join(f"<p>{_paragraph(r, r.randint(2, 4))}</p>\n" for _ in range(n_paras))
    title = " ".join(r.sample(_WORDS, 3)).title()
    html = (
        f"<html><head><title>{title}</title></head><body>\n"
        f'<nav class="menu">{nav_links}</nav>\n'
        f'<div class="sidebar">{nav_links}</div>\n'
        f"<article>\n{paras}</article>\n"
        f'<footer><a href="/contact">contact</a> <a href="/about">about</a> '
        f"copyright {r.randint(2000, 2024)}</footer>\n"
        f"</body></html>"
    )
    spans = [_span("text", html, "", 0)]
    for k in range(r.randint(0, 2)):
        spans.append(_span("media", "", f"media://{doc_id}/{k}", len(spans)))
    return spans


def _gen_txt(r: random.Random, doc_id: str) -> list[dict]:
    parts = []
    for _ in range(r.randint(3, 10)):
        parts.append(_paragraph(r, r.randint(2, 8)))
    # one oversized run to force the delimiter split path
    parts.append(" ".join(_sentence(r, 14) for _ in range(30)))
    text = "\n".join(parts)
    return [_span("text", text, "", 0)]


def _gen_markdown(r: random.Random, doc_id: str) -> list[dict]:
    lines = [f"# {' '.join(r.sample(_WORDS, 3)).title()}", _paragraph(r)]
    lines += [f"## {' '.join(r.sample(_WORDS, 2)).title()}", _paragraph(r, 3)]
    cols = r.sample(_WORDS, 3)
    lines.append("")
    lines.append("| " + " | ".join(cols) + " |")
    lines.append("|" + "---|" * 3)
    for _ in range(r.randint(2, 5)):
        lines.append("| " + " | ".join(str(r.randint(1, 999)) for _ in cols) + " |")
    lines.append("")
    lines.append(_paragraph(r))
    lines.append("")
    lines.append(
        "<table><tr><td>alpha</td><td>%d</td></tr><tr><td>beta</td><td>%d</td></tr></table>"
        % (r.randint(0, 99), r.randint(0, 99))
    )
    lines.append("")
    lines.append(_paragraph(r))
    spans = [_span("text", "\n".join(lines), "", 0)]
    spans.append(_span("media", "", f"media://{doc_id}/img0", 1))
    return spans


def _gen_json(r: random.Random, doc_id: str) -> list[dict]:
    obj = {
        "meta": {"id": doc_id, "year": r.randint(2000, 2024)},
        "records": [
            {"name": r.choice(_WORDS), "value": r.randint(0, 10_000),
             "tags": r.sample(_WORDS, 3)}
            for _ in range(r.randint(3, 12))
        ],
        "summary": _paragraph(r, 3),
    }
    return [_span("text", json.dumps(obj, ensure_ascii=False), "", 0)]


_EN_NUM = ["ONE", "TWO", "THREE", "FOUR", "FIVE", "SIX", "SEVEN", "EIGHT", "NINE", "TEN"]
_ROMAN = ["I", "II", "III", "IV", "V", "VI", "VII", "VIII", "IX", "X"]
_CN_NUM = ["一", "二", "三", "四", "五", "六", "七", "八", "九", "十"]


def _gen_book_txt(r: random.Random, doc_id: str) -> list[dict]:
    zh = r.random() < 0.4
    lines: list[str] = []
    n_chapters = r.randint(2, 4)
    # leading TOC block
    lines.append("目录" if zh else "Contents")
    for c in range(n_chapters):
        lines.append(f"第{_CN_NUM[c]}章 ........ {c * 7 + 1}" if zh
                     else f"Chapter {_ROMAN[c]} ........ {c * 7 + 1}")
    for c in range(n_chapters):
        lines.append(f"第{_CN_NUM[c]}章 {_sentence(r, 4, zh)}" if zh
                     else f"Chapter {_ROMAN[c]} {_sentence(r, 4)}")
        for s in range(r.randint(1, 3)):
            lines.append(f"第{_CN_NUM[s]}节 {_sentence(r, 3, zh)}" if zh
                         else f"Section {s + 1} {_sentence(r, 3)}")
            for _ in range(r.randint(1, 4)):
                lines.append(_paragraph(r, r.randint(1, 3), zh))
    return [_span("text", "\n".join(lines), "", 0)]


def _gen_laws_txt(r: random.Random, doc_id: str) -> list[dict]:
    zh = r.random() < 0.6
    lines: list[str] = []
    n = r.randint(2, 3)
    for c in range(n):
        lines.append(f"第{_CN_NUM[c]}章 {_sentence(r, 3, zh)}" if zh
                     else f"PART {_EN_NUM[c]} {_sentence(r, 3)}")
        for a in range(r.randint(2, 5)):
            lines.append(f"第{_CN_NUM[a]}条 {_paragraph(r, 2, zh)}" if zh
                         else f"Article {a + 1} {_paragraph(r, 2)}")
    return [_span("text", "\n".join(lines), "", 0)]


def _page_payload(page_no: int, width: float, height: float, boxes, layouts, tables=None):
    return json.dumps(
        {
            "page_no": page_no,
            "width": width,
            "height": height,
            "boxes": boxes,
            "layouts": layouts,
            "tables": tables or [],
        }
    )


def _mkbox(x0, top, w, h, text):
    return {"x0": x0, "x1": x0 + w, "top": top, "bottom": top + h, "text": text}


def _mklayout(ty, x0, top, x1, bottom, score=0.9):
    return {"type": ty, "score": score, "x0": x0, "x1": x1, "top": top, "bottom": bottom}


def _gen_paper_pdf(r: random.Random, doc_id: str, n_pages: int | None = None) -> list[dict]:
    """Two-column paper: title, authors, abstract, numbered sections,
    one table with TSR rows/cols, one figure with caption,
    header/footer garbage."""
    W, H = 612.0, 792.0
    col_w = 260.0
    left_x, right_x = 40.0, 320.0
    n_pages = n_pages or r.randint(1, 3)
    spans: list[dict] = []
    sec_no = 0
    for pn in range(1, n_pages + 1):
        boxes, layouts, tables = [], [], []
        # running header + page number footer (garbage)
        boxes.append(_mkbox(200, 20, 200, 12, f"proc of synthetic conf {doc_id}"))
        layouts.append(_mklayout("header", 150, 15, 460, 35))
        boxes.append(_mkbox(290, 760, 40, 12, f"{pn} / {n_pages}"))
        layouts.append(_mklayout("footer", 280, 755, 340, 775))
        y = 50.0
        if pn == 1:
            title = " ".join(r.sample(_WORDS, 5)).title()
            boxes.append(_mkbox(100, y, 400, 22, title))
            layouts.append(_mklayout("title", 90, y - 4, 510, y + 26))
            y += 34
            authors = ", ".join(
                f"{r.choice(_WORDS).title()} {r.choice(_WORDS).title()}" for _ in range(2)
            )
            boxes.append(_mkbox(150, y, 300, 14, authors))
            layouts.append(_mklayout("text", 140, y - 3, 460, y + 17))
            y += 26
            abstract = "abstract " + " ".join(_sentence(r, 12) for _ in range(4))
            boxes.append(_mkbox(80, y, 440, 40, abstract))
            layouts.append(_mklayout("text", 70, y - 4, 530, y + 44))
            y += 54
        # two columns of numbered sections + body lines
        for x0 in (left_x, right_x):
            yy = y
            while yy < H - 80:
                if r.random() < 0.3:
                    sec_no += 1
                    heading = f"{sec_no}. {' '.join(r.sample(_WORDS, 2)).title()}"
                    boxes.append(_mkbox(x0, yy, col_w * 0.8, 14, heading))
                    layouts.append(
                        _mklayout("title", x0 - 4, yy - 3, x0 + col_w * 0.8 + 4, yy + 17)
                    )
                    yy += 22
                body = _sentence(r, 10)
                boxes.append(_mkbox(x0, yy, col_w, 12, body))
                layouts.append(_mklayout("text", x0 - 4, yy - 3, x0 + col_w + 4, yy + 15))
                yy += 18
        # one table on the last page, spanning the left column
        if pn == n_pages:
            ty = H - 200
            layouts.append(_mklayout("table", left_x - 5, ty - 5, left_x + 250, ty + 65))
            comps = []
            headers = ["name", "score", "rank"]
            comps.append({"label": "table column header", "score": 0.9,
                          "x0": left_x, "x1": left_x + 240, "top": ty, "bottom": ty + 14})
            for ri in range(3):
                comps.append({"label": "table row", "score": 0.9,
                              "x0": left_x, "x1": left_x + 240,
                              "top": ty + 16 * (ri + 1), "bottom": ty + 16 * (ri + 1) + 14})
            for ci in range(3):
                comps.append({"label": "table column", "score": 0.9,
                              "x0": left_x + 80 * ci, "x1": left_x + 80 * ci + 78,
                              "top": ty, "bottom": ty + 62})
            for ci, h in enumerate(headers):
                boxes.append(_mkbox(left_x + 80 * ci + 2, ty + 1, 74, 12, h))
            for ri in range(3):
                for ci in range(3):
                    val = r.choice(_WORDS) if ci == 0 else str(r.randint(1, 99))
                    boxes.append(
                        _mkbox(left_x + 80 * ci + 2, ty + 16 * (ri + 1) + 1, 74, 12, val)
                    )
            # table boxes need layout assignment to the table region: they
            # overlap it, handled by assign_layouts
            tables.append(comps)
            cap_y = ty + 70
            boxes.append(_mkbox(left_x, cap_y, 240, 12, f"Table 1: {_sentence(r, 5)}"))
            layouts.append(_mklayout("table caption", left_x - 4, cap_y - 3,
                                     left_x + 244, cap_y + 15))
            # figure + caption in right column
            fy = H - 190
            layouts.append(_mklayout("figure", right_x, fy, right_x + 200, fy + 80))
            fig_cap_y = fy + 86
            boxes.append(_mkbox(right_x, fig_cap_y, 200, 12, f"Figure 1: {_sentence(r, 5)}"))
            layouts.append(_mklayout("figure caption", right_x - 4, fig_cap_y - 3,
                                     right_x + 204, fig_cap_y + 15))
        spans.append(
            _span("media", _page_payload(pn, W, H, boxes, layouts, tables),
                  f"media://{doc_id}/page{pn}", pn - 1)
        )
    return spans


def _gen_book_pdf(r: random.Random, doc_id: str, n_pages: int | None = None) -> list[dict]:
    """Single-column book: a TOC page with dotted leaders, chapter
    bullets, body lines; occasionally a cross-page table."""
    W, H = 612.0, 792.0
    n_pages = n_pages or r.randint(2, 4)
    spans: list[dict] = []
    chapter = 0
    for pn in range(1, n_pages + 1):
        boxes, layouts, tables = [], [], []
        y = 60.0
        if pn == 1:
            boxes.append(_mkbox(260, y, 90, 16, "Contents"))
            layouts.append(_mklayout("title", 250, y - 4, 360, y + 20))
            y += 26
            for c in range(min(3, n_pages - 1)):
                boxes.append(_mkbox(80, y, 400, 12, f"Chapter {_ROMAN[c]} ········ {c + 2}"))
                layouts.append(_mklayout("text", 70, y - 3, 490, y + 15))
                y += 18
        else:
            chapter += 1
            ch = f"Chapter {_ROMAN[min(chapter - 1, 9)]} {' '.join(r.sample(_WORDS, 2)).title()}"
            boxes.append(_mkbox(80, y, 350, 16, ch))
            layouts.append(_mklayout("title", 70, y - 4, 440, y + 20))
            y += 26
            while y < H - 80:
                body = _sentence(r, 11)
                boxes.append(_mkbox(80, y, 450, 12, body))
                layouts.append(_mklayout("text", 70, y - 3, 540, y + 15))
                y += 18
        spans.append(
            _span("media", _page_payload(pn, W, H, boxes, layouts, tables),
                  f"media://{doc_id}/page{pn}", pn - 1)
        )
    return spans


def _gen_docx(r: random.Random, doc_id: str) -> list[dict]:
    spans: list[dict] = []

    def text_span(t: str, style: str = "") -> None:
        spans.append(
            _span("text", json.dumps({"t": t, "style": style}, ensure_ascii=False),
                  "", len(spans))
        )

    text_span(" ".join(r.sample(_WORDS, 3)).title(), "Heading 1")
    text_span(_paragraph(r, 3))
    for h2 in range(r.randint(1, 3)):
        text_span(" ".join(r.sample(_WORDS, 2)).title(), "Heading 2")
        text_span(_paragraph(r, r.randint(2, 4)))
        if r.random() < 0.5:
            spans.append(_span("media", "", f"media://{doc_id}/img{h2}", len(spans)))
            text_span(f"Figure {h2 + 1}: {_sentence(r, 4)}", "Caption")
    rows = [["metric", "value", "value"]] + [
        [r.choice(_WORDS), str(r.randint(0, 999)), str(r.randint(0, 999))]
        for _ in range(r.randint(2, 4))
    ]
    spans.append(
        _span("text", json.dumps({"table": {"rows": rows}}, ensure_ascii=False),
              "", len(spans))
    )
    text_span(_paragraph(r, 2))
    return spans


def _gen_qa_txt(r: random.Random, doc_id: str) -> list[dict]:
    lines = []
    for i in range(r.randint(4, 12)):
        q = f"Q: what about {' '.join(r.sample(_WORDS, 3))}?"
        a = f"A: {_sentence(r, 10)}"
        lines.append(f"{q}\t{a}")
        if r.random() < 0.3:  # continuation line extends the answer
            lines.append(_sentence(r, 8))
    return [_span("text", "\n".join(lines), "", 0)]


def _gen_table_tsv(r: random.Random, doc_id: str) -> list[dict]:
    headers = ["name", "count", "ratio", "active", "note"]
    lines = ["\t".join(headers)]
    for _ in range(r.randint(4, 15)):
        lines.append(
            "\t".join(
                [
                    r.choice(_WORDS),
                    str(r.randint(1, 999)),
                    f"{r.random():.3f}".lstrip("0") or "0.5",
                    r.choice(["yes", "no", "true", "false"]),
                    _sentence(r, 5),
                ]
            )
        )
    return [_span("text", "\n".join(lines), "", 0)]


def _gen_qa_pdf(r: random.Random, doc_id: str) -> list[dict]:
    """Numbered-question pages: ≥24pt spacing (the reference's bullet
    indent heuristic needs it) with indented answer lines."""
    W, H = 612.0, 792.0
    spans = []
    qno = 0
    for pn in range(1, r.randint(1, 3) + 1):
        boxes, layouts = [], []
        y = 50.0
        while y < H - 100:
            qno += 1
            q = f"{qno}. What about {' '.join(r.sample(_WORDS, 2))}?"
            boxes.append(_mkbox(50, y, 350, 12, q))
            layouts.append(_mklayout("text", 45, y - 3, 405, y + 15))
            y += 26
            for _ in range(r.randint(1, 2)):
                boxes.append(_mkbox(70, y, 330, 12, _sentence(r, 9)))
                layouts.append(_mklayout("text", 65, y - 3, 405, y + 15))
                y += 26
        spans.append(
            _span("media", _page_payload(pn, W, H, boxes, layouts, []),
                  f"media://{doc_id}/page{pn}", pn - 1)
        )
    return spans


def _gen_excel(r: random.Random, doc_id: str) -> list[dict]:
    sheets = []
    for sname in ["Data", r.choice(["metrics", "Sheet2", "totals"])]:
        headers = r.sample(_WORDS, 4)
        rows = [headers]
        for _ in range(r.randint(3, 10)):
            rows.append([r.choice(_WORDS), str(r.randint(0, 999)),
                         str(r.randint(0, 99)), _sentence(r, 4)])
        sheets.append({"name": sname, "rows": rows})
    return [_span("text", json.dumps({"sheets": sheets}, ensure_ascii=False), "", 0)]


def _gen_slides(r: random.Random, doc_id: str) -> list[dict]:
    spans = []
    for pn in range(1, r.randint(3, 8)):
        payload = json.dumps(
            {"page_no": pn, "text": f"{' '.join(r.sample(_WORDS, 3)).title()}\n"
             + "\n".join("• " + _sentence(r, 6) for _ in range(r.randint(2, 5)))}
        )
        spans.append(_span("media", payload, f"media://{doc_id}/slide{pn}", pn - 1))
    return spans


_GENERATORS = {
    "html": _gen_html,
    "txt": _gen_txt,
    "markdown": _gen_markdown,
    "json": _gen_json,
    "book_txt": _gen_book_txt,
    "laws_txt": _gen_laws_txt,
    "paper_pdf": _gen_paper_pdf,
    "book_pdf": _gen_book_pdf,
    "docx": _gen_docx,
    "qa_txt": _gen_qa_txt,
    "table_tsv": _gen_table_tsv,
    "slides": _gen_slides,
    "manual_pdf": _gen_paper_pdf,  # manual runs over paper-style pages
    "excel": _gen_excel,
    "qa_pdf": _gen_qa_pdf,
}


def generate_document(family: str, index: int, seed: int = 42, heavy: bool = False) -> dict:
    """One deterministic document row."""
    doc_id = f"doc-{family}-{index:08d}"
    r = _rng(seed, doc_id)
    if heavy and family in ("paper_pdf", "book_pdf", "manual_pdf"):
        spans = _GENERATORS[family](r, doc_id, n_pages=40)
    else:
        spans = _GENERATORS[family](r, doc_id)
    return {
        "doc_id": doc_id,
        "fmt": _FMT[family],
        "template": _TEMPLATE[family],
        "n_media": sum(1 for s in spans if s["kind"] == "media" and s["text"]),
        "spans": spans,
    }


def generate_corpus(
    n_docs: int, seed: int = 42, families: tuple[str, ...] = FAMILIES,
    heavy_tail: float = 0.0,
) -> list[dict]:
    """``n_docs`` documents round-robined over ``families``;
    ``heavy_tail`` fraction become 40-page PDFs (F9 skew family)."""
    docs = []
    for i in range(n_docs):
        family = families[i % len(families)]
        heavy = heavy_tail > 0 and (zlib.crc32(f"heavy:{seed}:{i}".encode()) % 10_000) < heavy_tail * 10_000
        docs.append(generate_document(family, i, seed, heavy=heavy))
    return docs


def corpus_table(docs: list[dict]) -> pa.Table:
    return pa.Table.from_pylist(docs, schema=INPUT_SCHEMA)


def write_corpus(path: str, n_docs: int, seed: int = 42, heavy_tail: float = 0.0,
                 rows_per_file: int = 2000) -> str:
    """Write a corpus as partitioned Parquet (Lance stand-in)."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)
    part = 0
    for start in range(0, n_docs, rows_per_file):
        docs = [
            generate_document(
                FAMILIES[i % len(FAMILIES)], i, seed,
                heavy=heavy_tail > 0
                and (zlib.crc32(f"heavy:{seed}:{i}".encode()) % 10_000) < heavy_tail * 10_000,
            )
            for i in range(start, min(start + rows_per_file, n_docs))
        ]
        pq.write_table(corpus_table(docs), os.path.join(path, f"part-{part:05d}.parquet"))
        part += 1
    return path
