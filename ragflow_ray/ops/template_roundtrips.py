"""Per-template roundtrip extraction queries with exact SQL oracles.

Round-1 left every ``extract_*`` template query as a rows-only check
(VERDICT.md task 2).  These queries close that hole: for each template
a deterministic document is constructed *from each ``documents.text``
row inside the pipeline* (txt lines, docx outline payloads, markdown,
TSV, slide payloads, full PDF page records), the **real chunker** runs
over it, and the concatenated output is a string DuckDB can recompute
with list/regexp ops — so the driver's value-hash compare verifies the
template logic end-to-end, not just row counts.

Document text is a single-space word stream (TESTDATA.md), which makes
the constructions exact: every wrapper groups the word list with fixed
arithmetic that the oracle mirrors via ``list_transform`` over
``string_split(text, ' ')``.

Templates whose chunkers need more words than short docs carry
(paper/manual) extend the stream deterministically by repeating it
(``repeat(text || ' ', R)`` on the SQL side).

Reference parity notes live in each chunker module; this module only
*drives* them (rag/app/{naive,book,laws,paper,one,qa,table,manual,
presentation}.py via ragflow_ray.chunkers).
"""

from __future__ import annotations

import json

import pandas as pd

from ..chunkers import ChunkConfig, chunk_document

_EXTRACT_SCHEMA = None


def _schema():
    global _EXTRACT_SCHEMA
    if _EXTRACT_SCHEMA is None:
        import pyarrow as pa

        _EXTRACT_SCHEMA = pa.schema(
            [("doc_id", pa.int64()), ("extracted", pa.string())]
        )
    return _EXTRACT_SCHEMA


def _docs(sf_dir: str):
    import ray.data as rd

    from ..sources.readers import read_parquet_clean

    return read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])


def _run(sf_dir: str, build, template: str, cfg: ChunkConfig | None = None,
         joiner: str = "\n"):
    """documents → per-row doc construction → real chunker → joined
    span text (one row per document)."""
    import pyarrow as pa

    cfg = cfg or ChunkConfig()

    def batch_fn(batch: pd.DataFrame):
        ids, outs = [], []
        for doc_id, text in zip(batch["doc_id"], batch["text"]):
            doc = build(int(doc_id), text)
            spans = chunk_document(doc, template, cfg)
            ids.append(int(doc_id))
            outs.append(joiner.join(s["text"] for s in spans))
        return pa.table(
            {"doc_id": pa.array(ids, type=pa.int64()), "extracted": pa.array(outs)},
            schema=_schema(),
        )

    out = _docs(sf_dir).map_batches(batch_fn, batch_format="pandas")
    return out.sort("doc_id").to_pandas()


def _txt_doc(doc_id, text: str) -> dict:
    return {
        "doc_id": str(doc_id),
        "fmt": "txt",
        "spans": [{"kind": "text", "text": text, "media_ref": "", "offset": 0}],
    }


def _group_words(words: list[str], size: int) -> list[list[str]]:
    return [words[i : i + size] for i in range(0, len(words), size)]


# -- one: whole-document chunk --------------------------------------------


def extract_one(sf_dir: str):
    """One word per line; the ``one`` chunker re-joins the non-empty
    lines → extracted == text with spaces turned into newlines."""
    return _run(
        sf_dir, lambda _id, t: _txt_doc(_id, t.replace(" ", "\n")), "one"
    )


# -- naive: html boilerplate strip + greedy merge -------------------------


def _naive_html_doc(doc_id, text: str) -> dict:
    words = text.split(" ")
    paras = "".join(
        f"<p>{' '.join(g)}</p>" for g in _group_words(words, 12)
    )
    nav = "".join(f'<a href="/l{i}">nav link {i}</a> ' for i in range(8))
    html = (
        f"<html><head><title>doc {doc_id}</title></head><body>"
        f'<nav class="menu">{nav}</nav>'
        f"<article>{paras}</article>"
        f'<footer class="footer">{nav}</footer></body></html>'
    )
    return {
        "doc_id": str(doc_id),
        "fmt": "html",
        "spans": [{"kind": "text", "text": html, "media_ref": "", "offset": 0}],
    }


def extract_naive(sf_dir: str):
    """Boilerplate page → Arc90 main-content lines → greedy merge.
    Chunk concatenation = title + the 12-word paragraphs run together
    (greedy_merge appends fragments with no separator)."""
    return _run(sf_dir, _naive_html_doc, "naive", joiner="")


# -- book: bullet voting + hierarchical merge -----------------------------


def _book_doc(doc_id, text: str) -> dict:
    lines = []
    for k, g in enumerate(_group_words(text.split(" "), 10)):
        lines.append(f"Section {k + 1}")
        # 'z ' keeps a trailing single-char body ('a') above
        # hierarchical_merge's len>1 section filter
        lines.append("z " + " ".join(g))
    return _txt_doc(doc_id, "\n".join(lines))


def extract_book(sf_dir: str):
    """'Section k' headers vote the English bullet family; every body
    line attaches to its section via hierarchical_merge → chunks are
    exactly 'Section k\\n<10 words>'."""
    return _run(sf_dir, _book_doc, "book")


# -- laws: docx heading-outline walk --------------------------------------


def _laws_docx_doc(doc_id, text: str) -> dict:
    spans = []

    def add(payload):
        spans.append(
            {
                "kind": "text",
                "text": json.dumps(payload),
                "media_ref": "",
                "offset": len(spans),
            }
        )

    for k, g in enumerate(_group_words(text.split(" "), 16)):
        add({"t": f"Section {k + 1}", "style": "Heading 1"})
        add({"t": " ".join(g[:8]), "style": ""})
        if len(g) > 8:
            add({"t": " ".join(g[8:]), "style": ""})
    return {"doc_id": str(doc_id), "fmt": "docx", "spans": spans}


def extract_laws(sf_dir: str):
    """Heading-1 outline walk: each section = heading + its first
    populated child level (the two body paragraphs)."""
    return _run(sf_dir, _laws_docx_doc, "laws")


# -- qa: markdown heading-stack pairs -------------------------------------


def _qa_md_doc(doc_id, text: str) -> dict:
    lines = []
    for g in _group_words(text.split(" "), 9):
        # 'z' prefix keeps vocab word 'a' from tripping the role-prefix
        # stripper (^(Q|A|...)[\t: ]+)
        lines.append("# z " + " ".join(g[:3]))
        if len(g) > 3:
            lines.append("z " + " ".join(g[3:]))
    return _txt_doc(doc_id, "\n".join(lines))


def extract_qa(sf_dir: str):
    """Markdown heading-stack Q&A: every heading with a following body
    line yields 'Question: ...\\tAnswer: ...'."""
    cfg = ChunkConfig()

    def build(doc_id, text):
        d = _qa_md_doc(doc_id, text)
        d["fmt"] = "markdown"
        return d

    return _run(sf_dir, build, "qa", cfg)


# -- book + TOC: remove_contents_table quirk path --------------------------


def _book_toc_doc(doc_id, text: str) -> dict:
    """The extract_book construction behind a Contents page: a TOC
    heading and one dot-leader entry.  The word stream carries digits,
    so ``is_english_text`` votes False and strip_toc_sections runs its
    3-char-prefix branch (the pinned reference quirk): it must drop the
    heading, derive prefix 'Sec' from the entry, pop the entry, and
    stop at the real 'Section 1' body header — leaving exactly the
    extract_book output."""
    toc = ["Contents", "Section 1 ······ 2"]
    body = []
    for k, g in enumerate(_group_words(text.split(" "), 10)):
        body.append(f"Section {k + 1}")
        body.append("z " + " ".join(g))
    return _txt_doc(doc_id, "\n".join(toc + body))


def extract_book_toc(sf_dir: str):
    """Book chunker with a table-of-contents page: the TOC block is
    constant, so the oracle equals extract_book's — the value-hash
    passes only if remove_contents_table drops exactly the TOC block."""
    return _run(sf_dir, _book_toc_doc, "book")


# -- naive + oversized section: delimiter split + phantom-"" quirk ---------

OVERFLOW_TOKENS = 4
OVERFLOW_GROUP = 6


def _naive_overflow_doc(doc_id, text: str) -> dict:
    """One boilerplate page whose article is a single paragraph of the
    word stream with '。' every OVERFLOW_GROUP words.  With a 4-token
    budget the paragraph is oversized: greedy_merge splits it on the
    delimiter, the first fragment packs onto the title chunk (the
    phantom-"" seed swallows the title first), and every later
    fragment opens its own chunk."""
    words = text.split(" ")
    para = "。".join(
        " ".join(g) for g in _group_words(words, OVERFLOW_GROUP)
    )
    nav = "".join(f'<a href="/l{i}">nav link {i}</a> ' for i in range(8))
    html = (
        f"<html><head><title>doc {doc_id}</title></head><body>"
        f'<nav class="menu">{nav}</nav>'
        f"<article><p>{para}</p></article>"
        f'<footer class="footer">{nav}</footer></body></html>'
    )
    return {
        "doc_id": str(doc_id),
        "fmt": "html",
        "spans": [{"kind": "text", "text": html, "media_ref": "", "offset": 0}],
    }


def extract_naive_overflow(sf_dir: str):
    """Naive chunker, oversized-section path: chunks are the title with
    the first 6-word fragment run on, then one chunk per fragment."""
    return _run(
        sf_dir, _naive_overflow_doc, "naive",
        ChunkConfig(chunk_token_num=OVERFLOW_TOKENS),
    )


# -- qa txt: two-column state machine + role-prefix strip -------------------


def _qa_roles_doc(doc_id, text: str) -> dict:
    """TAB-delimited 'Q: ...\\tA: ...' lines (8 words per pair); the qa
    txt path must vote the TAB delimiter and strip both role
    prefixes."""
    lines = []
    for g in _group_words(text.split(" "), 8):
        if len(g) <= 3:
            continue
        lines.append("Q: " + " ".join(g[:3]) + "\tA: " + " ".join(g[3:]))
    return _txt_doc(doc_id, "\n".join(lines))


def extract_qa_roles(sf_dir: str):
    """Role-prefixed two-column QA: every line yields
    'Question: <3 words>\\tAnswer: <up to 5 words>'."""
    return _run(sf_dir, _qa_roles_doc, "qa")


# -- tag: two-column content↔tags pairs ------------------------------------


def _tag_txt_doc(doc_id, text: str) -> dict:
    """Tag construction: each full group of 3 words becomes a garbage
    line (``z <w0>`` — no delimiter) followed by a pair line
    ``<w1>\\t g.<w2>``-shaped (``w1\\tg.w2``).  Exercises the TAB/comma
    vote (tab wins), the garbage-accumulates-into-content machine, the
    unconditional leading-``\\n`` quirk, and the ``.``→``_`` tag
    cleanup (rag/app/tag.py:30,62-92)."""
    lines = []
    for g in _group_words(text.split(" "), 3):
        if len(g) < 3:
            break
        lines.append("z " + g[0])
        lines.append(g[1] + "\tg." + g[2])
    return _txt_doc(doc_id, "\n".join(lines))


def extract_tag(sf_dir: str):
    """Every 3-word group yields one span
    ``\\nz w0\\nw1<TAB>g_w2`` (leading newline included)."""
    return _run(sf_dir, _tag_txt_doc, "tag")


# -- email: stdlib eml parse + header/body sections ------------------------

EMAIL_BODY_WORDS = 32


def _email_doc(doc_id, text: str) -> dict:
    """A minimal RFC-2822 message: three verbatim headers + a plain
    body of the first EMAIL_BODY_WORDS words.  The email chunker
    renders each header as 'Header: value', pre-chunks the text
    sections with parse_txt (which drops the newline delimiters and
    concatenates fragments), and greedy-merges — under the 128-token
    parser budget everything lands in ONE chunk whose text is the
    plain concatenation the oracle rebuilds."""
    body = " ".join(text.split(" ")[:EMAIL_BODY_WORDS])
    raw = (
        "From: alice@example.com\r\n"
        "To: bob@example.com\r\n"
        f"Subject: doc {doc_id}\r\n"
        "\r\n"
        f"{body}"
    )
    return {
        "doc_id": str(doc_id),
        "fmt": "email",
        "spans": [{"kind": "text", "text": raw, "media_ref": "", "offset": 0}],
    }


def extract_email(sf_dir: str):
    """Email chunker end-to-end: headers + plain body → one chunk."""
    return _run(sf_dir, _email_doc, "email")


# -- table: typed TSV rows ------------------------------------------------


def _table_doc(doc_id, text: str) -> dict:
    rows = ["name\tdesc"]
    for g in _group_words(text.split(" "), 6):
        if len(g) <= 3:  # a row needs a non-empty second column
            continue
        rows.append(" ".join(g[:3]) + "\t" + " ".join(g[3:]))
    return _txt_doc(doc_id, "\n".join(rows))


def extract_table(sf_dir: str):
    """TSV → per-row 'header:value; ...' chunks (all-text column
    vote; word cells normalize to themselves)."""
    return _run(sf_dir, _table_doc, "table")


# -- presentation: slide payloads -----------------------------------------


def _slides_doc(doc_id, text: str) -> dict:
    spans = []
    for k, g in enumerate(_group_words(text.split(" "), 12)):
        spans.append(
            {
                "kind": "media",
                "text": json.dumps({"page_no": k + 1, "text": " ".join(g)}),
                "media_ref": f"media://{doc_id}/s{k + 1}",
                "offset": k,
            }
        )
    return {"doc_id": str(doc_id), "fmt": "slides", "spans": spans}


def extract_presentation(sf_dir: str):
    """One chunk per slide payload, in offset order."""
    return _run(sf_dir, _slides_doc, "presentation")


# -- pdf page construction (manual / paper) -------------------------------


def _pdf_doc(doc_id, pages: list[list[tuple[str, str]]]) -> dict:
    """pages = per-page [(text, layout_type)] line lists → media spans
    with full post-model page payloads (single-column, one layout
    region per line: the pass-through geometry — 30pt line pitch keeps
    every box in its own region, so no pipeline merge can fire)."""
    spans = []
    for pn, lines in enumerate(pages, start=1):
        boxes, layouts = [], []
        y = 40.0
        for text, lt in lines:
            boxes.append(
                {"x0": 40.0, "x1": 572.0, "top": y, "bottom": y + 16.0, "text": text}
            )
            layouts.append(
                {"type": lt, "score": 0.9, "x0": 40.0, "x1": 572.0,
                 "top": y, "bottom": y + 16.0}
            )
            y += 30.0
        payload = {
            "page_no": pn, "width": 612, "height": 792,
            "boxes": boxes, "layouts": layouts, "tables": [],
        }
        spans.append(
            {
                "kind": "media",
                "text": json.dumps(payload),
                "media_ref": f"media://{doc_id}/p{pn}",
                "offset": pn - 1,
            }
        )
    return {"doc_id": str(doc_id), "fmt": "pdf", "spans": spans}


def _paginate(lines: list[tuple[str, str]], per_page: int = 16):
    return [lines[i : i + per_page] for i in range(0, len(lines), per_page)]


MANUAL_REPEAT = 2
PAPER_REPEAT = 6


def _manual_doc(doc_id, text: str) -> dict:
    words = (text + " ") * MANUAL_REPEAT
    lines: list[tuple[str, str]] = []
    for k, g in enumerate(_group_words(words.split(" ")[:-1], 32)):
        lines.append((f"Section {k + 1}", "title"))
        lines.append((" ".join(g), "text"))
    return _pdf_doc(doc_id, _paginate(lines))


def extract_manual(sf_dir: str):
    """Manual chunker over pass-through PDF pages: 32-word bodies keep
    every section its own chunk (the <32-token merge rule only fuses a
    header with its own body)."""
    return _run(sf_dir, _manual_doc, "manual")


def _paper_doc(doc_id, text: str) -> dict:
    ws = ((text + " ") * PAPER_REPEAT).split(" ")[:-1]
    lines: list[tuple[str, str]] = [
        (" ".join(ws[0:4]), "title"),       # paper title
        (" ".join(ws[4:8]), "text"),        # authors line
        ("abstract " + " ".join(ws[8:48]), "text"),
    ]
    for k, g in enumerate(_group_words(ws[48:], 16)):
        lines.append((f"Section {k + 1}", "title"))
        lines.append((" ".join(g[:8]), "text"))
        if len(g) > 8:
            lines.append((" ".join(g[8:]), "text"))
    return _pdf_doc(doc_id, _paginate(lines))


def extract_paper(sf_dir: str):
    """Paper chunker: title box, abstract box, then 'Section k' pivots
    grouping their two body lines."""
    return _run(sf_dir, _paper_doc, "paper")


# -- SQL oracle fragments --------------------------------------------------

_WS = "string_split(d.text, ' ')"


def _sql(body: str) -> str:
    return f"""
        SELECT d.doc_id, {body} AS extracted
        FROM documents d ORDER BY d.doc_id
    """


def _grouped(expr: str, size: int, words: str = "ws", n: str = "nw",
             joiner: str = "chr(10)", where: str | None = None) -> str:
    """array_to_string(list_transform(range(ceil(n/size)), g -> expr))"""
    rng = f"range(({n} + {size - 1}) // {size})"
    lt = f"list_transform({rng}, g -> {expr})"
    if where:
        lt = f"list_filter({lt}, x -> x IS NOT NULL)"
    return f"array_to_string({lt}, {joiner})"


def oracle_sql() -> dict[str, str]:
    """DuckDB recomputations of each roundtrip (column-exact)."""
    g10 = ("'Section ' || (g + 1)::VARCHAR || chr(10) || 'z ' || "
           "array_to_string(ws[g*10+1 : g*10+10], ' ')")
    g16_laws = (
        "'Section ' || (g + 1)::VARCHAR || chr(10) || "
        "array_to_string(ws[g*16+1 : g*16+8], ' ') || "
        "CASE WHEN nw > g*16+8 THEN chr(10) || "
        "array_to_string(ws[g*16+9 : g*16+16], ' ') ELSE '' END"
    )
    g9_qa = (
        # markdown answers are HTML-rendered by the chunker (a single
        # body line -> one <p> block), mirroring rag/app/qa.py:438
        "CASE WHEN nw > g*9+3 THEN "
        "'Question: z ' || array_to_string(ws[g*9+1 : g*9+3], ' ') || chr(9) || "
        "'Answer: <p>z ' || array_to_string(ws[g*9+4 : g*9+9], ' ') || '</p>' "
        "ELSE NULL END"
    )
    g6_table = (
        "CASE WHEN nw > g*6+3 THEN "
        "'name:' || array_to_string(ws[g*6+1 : g*6+3], ' ') || '; desc:' || "
        "array_to_string(ws[g*6+4 : g*6+6], ' ') "
        "ELSE NULL END"
    )
    g12 = "array_to_string(ws[g*12+1 : g*12+12], ' ')"
    g32_manual = ("'Section ' || (g + 1)::VARCHAR || chr(10) || "
                  "array_to_string(ws[g*32+1 : g*32+32], ' ')")
    g16_paper = (
        "'Section ' || (g + 1)::VARCHAR || chr(10) || "
        "array_to_string(ws[g*16+49 : g*16+56], ' ') || "
        "CASE WHEN nw > g*16+56 THEN chr(10) || "
        "array_to_string(ws[g*16+57 : g*16+64], ' ') ELSE '' END"
    )

    def with_ws(body: str, repeat: int = 1) -> str:
        src = (
            "string_split(d.text, ' ')" if repeat == 1
            else f"string_split(trim(repeat(d.text || ' ', {repeat})), ' ')"
        )
        return f"""
            SELECT doc_id, {body} AS extracted
            FROM (SELECT doc_id, ws, len(ws) AS nw
                  FROM (SELECT doc_id, {src} AS ws FROM documents d)) t
            ORDER BY doc_id
        """

    g6_overflow = f"array_to_string(ws[g*{OVERFLOW_GROUP}+1 : g*{OVERFLOW_GROUP}+{OVERFLOW_GROUP}], ' ')"
    g8_qa_roles = (
        "CASE WHEN nw > g*8+3 THEN "
        "'Question: ' || array_to_string(ws[g*8+1 : g*8+3], ' ') || chr(9) || "
        "'Answer: ' || array_to_string(ws[g*8+4 : g*8+8], ' ') "
        "ELSE NULL END"
    )

    return {
        "extract_one": """
            SELECT doc_id, replace(text, ' ', chr(10)) AS extracted
            FROM documents ORDER BY doc_id
        """,
        "extract_naive": with_ws(
            "'doc ' || doc_id::VARCHAR || " + _grouped(g12, 12, joiner="''")
        ),
        "extract_book": with_ws(_grouped(g10, 10)),
        # identical to extract_book — the TOC block must vanish exactly
        "extract_book_toc": with_ws(_grouped(g10, 10)),
        # title + first 6-word fragment run together, later fragments
        # one per chunk
        "extract_naive_overflow": with_ws(
            "'doc ' || doc_id::VARCHAR || "
            + _grouped(g6_overflow, OVERFLOW_GROUP)
        ),
        "extract_qa_roles": with_ws(_grouped(g8_qa_roles, 8, where="notnull")),
        # tag: floor(nw/3) full groups; leading chr(10) per span is the
        # reference's unconditional content += "\n" quirk
        "extract_tag": with_ws(
            "array_to_string(list_transform(range(nw // 3), g -> "
            "chr(10) || 'z ' || ws[g*3+1] || chr(10) || ws[g*3+2] || "
            "chr(9) || 'g_' || ws[g*3+3]), chr(10))"
        ),
        "extract_email": f"""
            SELECT doc_id,
                   'From: alice@example.comTo: bob@example.comSubject: doc '
                   || doc_id::VARCHAR
                   || array_to_string(string_split(text, ' ')[1:{EMAIL_BODY_WORDS}], ' ')
                       AS extracted
            FROM documents ORDER BY doc_id
        """,
        "extract_laws": with_ws(_grouped(g16_laws, 16)),
        "extract_qa": with_ws(_grouped(g9_qa, 9, where="notnull")),
        "extract_table": with_ws(_grouped(g6_table, 6, where="notnull")),
        "extract_presentation": with_ws(_grouped(g12, 12)),
        "extract_manual": with_ws(
            _grouped(g32_manual, 32), repeat=MANUAL_REPEAT
        ),
        "extract_paper": with_ws(
            "array_to_string(ws[1:4], ' ') || chr(10) || 'abstract ' || "
            "array_to_string(ws[9:48], ' ') || chr(10) || "
            + _grouped(g16_paper, 16, n="(nw - 48)"),
            repeat=PAPER_REPEAT,
        ),
    }
