"""Generate the oracle fixture for the ``pdf_text_blocks`` query.

``pdf_text_blocks`` runs the generic ``RAGFlowPdfParser.__call__``
composition (reference pdf_parser.py:1131-1140 — layout assignment,
horizontal merge, Y-sort, TOC drop, table/figure extraction,
reading-order DFS block assembly) over the deterministic synthetic
corpus's pdf-family documents and reports per-doc
``(n_blocks, n_chars)``.

This module re-derives the expected values with a SELF-CONTAINED,
deliberately-naive sequential implementation of the pinned pipeline
spec — plain dict/list loops, no numpy, no imports from
``ragflow_ray`` except the corpus *input* generator (the operator
under test is the pipeline, not the corpus).  The engine implements
the same spec with vectorized kernels, cmp-sorts and staged
mutation; agreement across every pdf document at three scale factors
is a real consistency check on both.

Notes on what the composition's output actually depends on (and what
is therefore re-derived): ``run_table_structure`` only tags table
boxes (R/H/C grid indices) and ``construct_table``'s content never
reaches the block text — table boxes are popped wholesale — so TSR
alignment is omitted here on purpose.

Fixture rows carry ``corpus_key`` = SUM(n_chars) of the sf documents
table, the selector convention of tools/make_sketch_fixtures.py.

Run:  python tools/make_pdfblocks_fixture.py [sf_dir ...]
"""

from __future__ import annotations

import json
import re
import sys
from statistics import median

import pyarrow as pa
import pyarrow.parquet as pq

FIXTURE_DIR = "/root/repo/tests/fixtures"

# ---- pinned spec regexes (deepdoc pdf_parser / layout_recognizer) --------

GARBAGE_TEXT = [
    re.compile(p)
    for p in (
        r"^•+$",
        r"^[0-9]{1,2} / ?[0-9]{1,2}$",
        r"^[0-9]{1,2} of [0-9]{1,2}$",
        r"^http://[^ ]{12,}",
        r"\(cid *: *[0-9]+ *\)",
    )
]
TOC_TITLE = re.compile(
    r"(contents|目录|目次|tableofcontents|致谢|acknowledge)$"
)
SPACES = re.compile(r"( | |　)+")
ENGLISHISH = re.compile(r"[0-9a-zA-Z :'.-]{5,}")
DOT_LEADER = re.compile(r"(··|……|\.{4,})")
SRC_NOTE = re.compile(r"(数据|资料|图表)*来源[:： ]")
NUMERIC_ONLY = re.compile(r"[0-9 ().,%+/-]+$")
CAPTION_ZH = re.compile(r"[图表]+[ 0-9:：]{2,}")

PROJ_LADDER = [
    (re.compile(r"第[零一二三四五六七八九十百]+章"), 1),
    (re.compile(r"第[零一二三四五六七八九十百]+[条节]"), 2),
    (re.compile(r"[零一二三四五六七八九十百]+[、 　]"), 3),
    (re.compile(r"[\(（][零一二三四五六七八九十百]+[）\)]"), 4),
    (re.compile(r"[0-9]+(、|\.[　 ]|\.[^0-9])"), 5),
    (re.compile(r"[0-9]+\.[0-9]+(、|[. 　]|[^0-9])"), 6),
    (re.compile(r"[0-9]+\.[0-9]+\.[0-9]+(、|[ 　]|[^0-9])"), 7),
    (re.compile(r"[0-9]+\.[0-9]+\.[0-9]+\.[0-9]+(、|[ 　]|[^0-9])"), 8),
    (re.compile(r".{,48}[：:?？]$"), 9),
    (re.compile(r"[0-9]+）"), 10),
    (re.compile(r"[\(（][0-9]+[）\)]"), 11),
    (re.compile(r"[零一二三四五六七八九十百]+是"), 12),
    (re.compile(r"[⚫•➢✓]"), 12),
]

GARBAGE_LAYOUTS = ("footer", "header", "reference")
ASSIGN_ORDER = [
    "footer", "header", "reference", "figure caption", "table caption",
    "title", "table", "text", "figure", "equation",
]


def proj_rank(line: str):
    if len(line) <= 2:
        return None
    if NUMERIC_ONLY.match(line):
        return False
    for pat, rank in PROJ_LADDER:
        if pat.match(line):
            return rank
    return None


# ---- tiny geometry helpers ------------------------------------------------


def ysort(items, threshold):
    """Insertion-style y-first sort with x tie inside the threshold
    (cmp semantics: dy wins unless |dy| < threshold, then x0)."""
    from functools import cmp_to_key

    def cmp(a, b):
        dy = a["top"] - b["top"]
        if abs(dy) < threshold:
            dx = a["x0"] - b["x0"]
            return -1 if dx < 0 else (1 if dx > 0 else 0)
        return -1 if dy < 0 else (1 if dy > 0 else 0)

    return sorted(items, key=cmp_to_key(cmp))


def ov(a, b, ratio=True):
    """Area of a∩b, optionally / area(a)."""
    if b["x0"] > a["x1"] or b["x1"] < a["x0"]:
        return 0.0
    if b["bottom"] < a["top"] or b["top"] > a["bottom"]:
        return 0.0
    w = min(a["x1"], b["x1"]) - max(a["x0"], b["x0"])
    h = min(a["bottom"], b["bottom"]) - max(a["top"], b["top"])
    area = (a["x1"] - a["x0"]) * (a["bottom"] - a["top"])
    if area == 0:
        return 0.0
    o = w * h
    return o / area if (o > 0 and ratio) else o


def disjoint(a, b):
    return (a["x1"] < b["x0"] or a["x0"] > b["x1"]
            or a["bottom"] < b["top"] or a["top"] > b["bottom"])


def cleanup_layouts(boxes, layouts, far=2, thr=0.7):
    i = 0
    while i + 1 < len(layouts):
        j = i + 1
        while j < min(i + far, len(layouts)) and (
            layouts[i].get("type", "") != layouts[j].get("type", "")
            or disjoint(layouts[i], layouts[j])
        ):
            j += 1
        if j >= min(i + far, len(layouts)):
            i += 1
            continue
        if ov(layouts[i], layouts[j]) < thr and ov(layouts[j], layouts[i]) < thr:
            i += 1
            continue
        if layouts[i].get("score") and layouts[j].get("score"):
            layouts.pop(j if layouts[i]["score"] > layouts[j]["score"] else i)
            continue
        ai = sum(ov(b, layouts[i], False) for b in boxes if not disjoint(b, layouts[i]))
        aj = sum(ov(b, layouts[j], False) for b in boxes if not disjoint(b, layouts[j]))
        layouts.pop(j if ai > aj else i)
    return layouts


def best_layout(box, cands, thr=0.4):
    """Max (fwd, bwd) overlap candidate with >= acceptance (later index
    wins ties); None below the fwd threshold."""
    best_i, best = None, (thr, 0.0)
    for i, lt in enumerate(cands):
        key = (ov(box, lt), ov(lt, box))
        if key >= best:
            best_i, best = i, key
    return best_i


# ---- per-document pipeline -------------------------------------------------


def doc_blocks(doc: dict) -> tuple[int, int]:
    pages = []
    for s in sorted(doc["spans"], key=lambda x: x["offset"]):
        if s["kind"] == "media" and s["text"]:
            pages.append(json.loads(s["text"]))
    heights = [float(p.get("height", 792)) for p in pages]
    widths_pg = [float(p.get("width", 612)) for p in pages]
    cum = [0.0]
    for h in heights:
        cum.append(cum[-1] + h)
    mean_h, mean_w = [], []
    for p in pages:
        bx = p.get("boxes", [])
        mean_h.append(median([float(b["bottom"]) - float(b["top"]) for b in bx]) if bx else 0)
        mean_w.append(
            median([(float(b["x1"]) - float(b["x0"])) / max(len(b.get("text", "")), 1)
                    for b in bx]) if bx else 8
        )

    # 1. layout assignment + garbage drop, per page
    boxes = []
    garbage_seen: dict[str, list[str]] = {}
    for pn0, p in enumerate(pages):
        page_h = heights[pn0]
        bxs = [
            {"x0": float(b["x0"]), "x1": float(b["x1"]), "top": float(b["top"]),
             "bottom": float(b["bottom"]), "text": b.get("text", ""),
             "page_number": pn0 + 1}
            for b in p.get("boxes", [])
        ]
        lts = [
            {"type": lt["type"].lower(), "score": float(lt.get("score", 1.0)),
             "x0": float(lt["x0"]), "x1": float(lt["x1"]),
             "top": float(lt["top"]), "bottom": float(lt["bottom"]),
             "page_number": pn0 + 1}
            for lt in p.get("layouts", [])
            if float(lt.get("score", 1.0)) >= 0.4
            or lt["type"].lower() not in GARBAGE_LAYOUTS
        ]
        if lts:
            mh_lt = sum(lt["bottom"] - lt["top"] for lt in lts) / len(lts)
            lts = ysort(lts, mh_lt / 2)
        lts = cleanup_layouts(bxs, lts)

        bxs = [b for b in bxs if not any(g.search(b["text"]) for g in GARBAGE_TEXT)]
        dropped = [False] * len(bxs)
        for ty in ASSIGN_ORDER:
            same = [lt for lt in lts if lt["type"] == ty]
            if not same:
                continue
            for i, b in enumerate(bxs):
                if dropped[i] or b.get("layout_type"):
                    continue
                ii = best_layout(b, same)
                if ii is None:
                    b["layout_type"] = ""
                    continue
                same[ii]["visited"] = True
                keep = (ty == "footer" and b["bottom"] < page_h * 0.9) or (
                    ty == "header" and b["top"] > page_h * 0.1
                )
                if ty in GARBAGE_LAYOUTS and not keep:
                    garbage_seen.setdefault(ty, []).append(b["text"])
                    dropped[i] = True
                    continue
                b["layoutno"] = f"{ty}-{ii}"
                b["layout_type"] = "figure" if ty == "equation" else ty
        bxs = [b for b, d in zip(bxs, dropped) if not d]

        figs = [lt for lt in lts if lt["type"] in ("figure", "equation")]
        for i, lt in enumerate(figs):
            if lt.get("visited"):
                continue
            synth = dict(lt)
            synth.pop("type", None)
            synth["text"] = ""
            synth["layout_type"] = "figure"
            synth["layoutno"] = f"figure-{i}"
            bxs.append(synth)
        boxes.extend(bxs)

    from collections import Counter

    repeated = set()
    for texts in garbage_seen.values():
        for t, c in Counter(texts).items():
            if c > 1:
                repeated.add(t)
    boxes = [b for b in boxes if b["text"].strip() not in repeated]

    for b in boxes:
        off = cum[b["page_number"] - 1]
        b["top"] += off
        b["bottom"] += off

    # 2. horizontal merge (same layoutno, same text row)
    i = 0
    while i < len(boxes) - 1:
        b, nxt = boxes[i], boxes[i + 1]
        if b.get("layoutno", "0") != nxt.get("layoutno", "1") or b.get(
            "layout_type", ""
        ) in ("table", "figure", "equation"):
            i += 1
            continue
        gap = (nxt["top"] + nxt["bottom"] - b["top"] - b["bottom"]) / 2
        if abs(gap) < mean_h[b["page_number"] - 1] / 3:
            b["x1"] = nxt["x1"]
            b["top"] = (b["top"] + nxt["top"]) / 2
            b["bottom"] = (b["bottom"] + nxt["bottom"]) / 2
            b["text"] += nxt["text"]
            boxes.pop(i + 1)
            continue
        i += 1

    # 3. Y-sort (stable: threshold 0)
    boxes.sort(key=lambda b: b["top"])

    # 4. TOC drop
    boxes = drop_toc(boxes, pages)

    # 5. pop tables / figures / captions (content discarded)
    i = 0
    while i < len(boxes):
        b = boxes[i]
        if "layoutno" not in b:
            i += 1
            continue
        if b["layout_type"] in ("table", "figure"):
            boxes.pop(i)
            continue
        i += 1
    i = 0
    while i < len(boxes):
        b = boxes[i]
        if CAPTION_ZH.match(b["text"].strip()) or b.get("layout_type", "").find(
            "caption"
        ) >= 0:
            boxes.pop(i)
            continue
        i += 1

    # 6. reading-order DFS block assembly
    text = assemble(boxes, pages, heights, widths_pg, cum, mean_h)
    return len([blk for blk in text.split("\n\n") if blk]), len(text)


def drop_toc(boxes, pages):
    boxes = list(boxes)
    found = False
    i = 0
    while i < len(boxes):
        head = SPACES.sub("", boxes[i]["text"].lower())
        if not TOC_TITLE.match(head):
            i += 1
            continue
        found = True
        eng = bool(ENGLISHISH.match(boxes[i]["text"].strip()))
        boxes.pop(i)
        if i >= len(boxes):
            break

        def prefix_at():
            t = boxes[i]["text"].strip()
            return t[:3] if not eng else " ".join(t.split()[:2])

        prefix = prefix_at()
        while not prefix and i < len(boxes):
            boxes.pop(i)
            if i >= len(boxes):
                break
            prefix = prefix_at()
        if i >= len(boxes):
            break
        boxes.pop(i)
        if i >= len(boxes) or not prefix:
            break
        for j in range(i, min(i + 128, len(boxes))):
            if not re.match(prefix, boxes[j]["text"]):
                continue
            for _ in range(i, j):
                boxes.pop(i)
            break
    if found:
        return boxes
    dirty = [0] * len(pages)
    for b in boxes:
        if DOT_LEADER.search(b["text"]):
            dirty[b["page_number"] - 1] += 1
    bad = {i + 1 for i, c in enumerate(dirty) if c > 3}
    if not bad:
        return boxes
    return [b for b in boxes if b["page_number"] not in bad]


def assemble(boxes, pages, heights, widths_pg, cum, mean_h):
    boxes = [dict(b) for b in boxes]

    def line_tag(b):
        pns = [b["page_number"]]
        top = b["top"] - cum[pns[0] - 1]
        bott = b["bottom"] - cum[pns[0] - 1]
        if pns[-1] - 1 >= len(pages):
            return ""
        while bott > heights[pns[-1] - 1]:
            bott -= heights[pns[-1] - 1]
            pns.append(pns[-1] + 1)
            if pns[-1] - 1 >= len(pages):
                return ""
        return "@@{}\t{:.1f}\t{:.1f}\t{:.1f}\t{:.1f}##".format(
            "-".join(map(str, pns)), b["x0"], b["x1"], top, bott
        )

    def useful(b):
        if b.get("layout_type"):
            return True
        if b["x1"] - b["x0"] > widths_pg[b["page_number"] - 1] / 3:
            return True
        return b["bottom"] - b["top"] > mean_h[b["page_number"] - 1]

    blocks = []
    while boxes:
        lines, ws = [], []
        pw = widths_pg[boxes[0]["page_number"] - 1]
        mh = mean_h[boxes[0]["page_number"] - 1]
        anchored = proj_rank(boxes[0]["text"]) or boxes[0].get("layout_type", "") == "title"

        def dfs(line, start):
            lines.append(line)
            ws.append(line["x1"] - line["x0"])
            structural = proj_rank(line["text"]) or line.get("layout_type", "") == "title"
            for i in range(start + 1, min(start + 20, len(boxes))):
                if boxes[i]["page_number"] - line["page_number"] > 0:
                    break
                y_dis = (
                    boxes[i]["top"] + boxes[i]["bottom"] - line["top"] - line["bottom"]
                ) / 2
                if (
                    not structural
                    and y_dis >= 3 * mh
                    and line["bottom"] - line["top"] < 1.5 * mh
                ):
                    break
                if not useful(boxes[i]):
                    continue
                x_dis = min(
                    abs(line["x1"] - boxes[i]["x0"]),
                    abs(line["x0"] - boxes[i]["x1"]),
                    abs(line["x0"] + line["x1"] - boxes[i]["x0"] - boxes[i]["x1"]) / 2,
                )
                if structural or x_dis < pw / 10:
                    nxt = boxes.pop(i)
                    dfs(nxt, i - 1)
                    break

        try:
            if useful(boxes[0]):
                dfs(boxes[0], 0)
        except Exception:
            pass
        boxes.pop(0)
        if not ws:
            continue
        mw = sum(ws) / len(ws)
        if anchored or mw / pw >= 0.35 or mw > 200:
            blocks.append("\n".join(c["text"] + line_tag(c) for c in lines))
    return "\n\n".join(blocks)


# ---- driver ----------------------------------------------------------------


def doc_corpus_key(sf_dir: str) -> int:
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["n_chars"])
    return int(sum(t.column("n_chars").to_pylist()))


def build(sf_dirs: list[str]) -> None:
    import os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from ragflow_ray.sources.corpus import generate_corpus  # input only

    os.makedirs(FIXTURE_DIR, exist_ok=True)
    rows = {"corpus_key": [], "doc_id": [], "n_blocks": [], "n_chars": []}
    for sf in sf_dirs:
        key = doc_corpus_key(sf)
        n_rows = pq.read_metadata(f"{sf}/documents.parquet").num_rows
        n = max(36, n_rows // 10)
        docs = [d for d in generate_corpus(n) if d["fmt"] == "pdf"]
        for doc in docs:
            nb, nc = doc_blocks(doc)
            rows["corpus_key"].append(key)
            rows["doc_id"].append(doc["doc_id"])
            rows["n_blocks"].append(nb)
            rows["n_chars"].append(nc)
        print(f"{sf}: key={key} pdf_docs={len(docs)}")
    pq.write_table(
        pa.table(rows).cast(pa.schema([
            ("corpus_key", pa.int64()), ("doc_id", pa.string()),
            ("n_blocks", pa.int64()), ("n_chars", pa.int64()),
        ])),
        f"{FIXTURE_DIR}/pdf_text_blocks.parquet",
    )


if __name__ == "__main__":
    dirs = sys.argv[1:] or [
        "/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"
    ]
    build(dirs)
