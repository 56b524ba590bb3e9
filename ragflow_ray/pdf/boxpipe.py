"""Per-document PDF box pipeline.

:class:`DocBoxes` carries a parsed document's page records through the
deterministic post-model pipeline, mirroring the *live* paths of
/root/reference/deepdoc/parser/pdf_parser.py:

==============================  =====================================
this module                     reference
==============================  =====================================
``run_layouts``                 ``_layouts_rec``            (:363-372)
``run_table_structure``         ``_table_transformer_job``  (:205-294)
``merge_horizontal``            ``_text_merge``             (:374-405 live)
``merge_vertical``              ``_naive_vertical_merge``   (:430-479)
``sort_reading_order``          ``_concat_downward``        (:481-483 live: Y-sort only)
``drop_toc_pages``              ``_filter_forpages``        (:593-642)
``merge_same_bullet``           ``_merge_with_same_bullet`` (:644-666)
``extract_tables_figures``      ``_extract_table_figure``   (:668-879)
``assemble_text_blocks``        ``__filterout_scraps``      (:922-992)
``line_tag``/``positions_of``   ``_line_tag``/``get_position`` (:905-920, 1227-1240)
==============================  =====================================

Instead of cropping PIL images, table/figure regions are addressed by
deterministic ``crop://`` media refs — the engine's analogue of the
reference's MinIO-uploaded chunk images.
"""

from __future__ import annotations

import re
from statistics import median

from .geometry import (
    find_max_overlap,
    sort_two_column,
    sort_y_first,
)
from .layout import assign_layouts
from .page_model import Page
from .tables import (
    align_table_components,
    construct_table,
    is_caption,
    tag_table_components,
)

_PAGE_NUMBERISH = re.compile(r"[0-9  •一—-]+$")
_SRC_NOTE = re.compile(r"(数据|资料|图表)*来源[:： ]")
_TOC_TITLE = re.compile(r"(contents|目录|目次|tableofcontents|致谢|acknowledge)$")
_SPACES = re.compile(r"( | |　)+")
_ENGLISHISH_LINE = re.compile(r"[0-9a-zA-Z :'.-]{5,}")
_DOT_LEADER = re.compile(r"(··|……|\.{4,})")
_NUMERIC_ONLY = re.compile(r"[0-9 ().,%+/-]+$")
_CN_CONSONANTS = set("qwertyuopasdfghjklzxcvbnm")

_PROJ_LADDER = [
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


def proj_match(line: str):
    """Bullet-ladder rank of a line (None = no structural marker)."""
    if len(line) <= 2:
        return None
    if _NUMERIC_ONLY.match(line):
        return False
    for pat, rank in _PROJ_LADDER:
        if pat.match(line):
            return rank
    return None


class DocBoxes:
    """Mutable per-document pipeline state (one instance per doc)."""

    def __init__(self, doc_id: str, pages: list[Page], is_english: bool = True):
        self.doc_id = doc_id
        self.pages = pages
        self.is_english = is_english
        self.boxes: list[dict] = []
        self.page_layouts: list[list[dict]] = []
        self.page_heights = [p.height for p in pages]
        cum = [0.0]
        for h in self.page_heights:
            cum.append(cum[-1] + h)
        self.page_cum_height = cum
        self.mean_height = [
            median([b["bottom"] - b["top"] for b in p.boxes]) if p.boxes else 0
            for p in pages
        ]
        self.mean_width = [
            median([(b["x1"] - b["x0"]) / max(len(b.get("text", "")), 1) for b in p.boxes])
            if p.boxes
            else 8
            for p in pages
        ]

    # -- layout ---------------------------------------------------------

    def run_layouts(self, drop: bool = True) -> None:
        self.boxes, self.page_layouts = assign_layouts(self.pages, drop=drop)
        for b in self.boxes:
            off = self.page_cum_height[b["page_number"] - 1]
            b["top"] += off
            b["bottom"] += off

    def run_table_structure(self) -> None:
        components: list[dict] = []
        for pn, page in enumerate(self.pages):
            table_layouts = [lt for lt in self.page_layouts[pn] if lt["type"] == "table"]
            for j, comps in enumerate(page.tables[: len(table_layouts)] if table_layouts else []):
                comps = align_table_components([dict(c) for c in comps])
                for c in comps:
                    c["top"] += self.page_cum_height[pn]
                    c["bottom"] += self.page_cum_height[pn]
                    c["pn"] = pn
                    c["layoutno"] = j
                components.extend(comps)
        if components:
            tag_table_components(self.boxes, components)

    # -- merging --------------------------------------------------------

    def merge_horizontal(self) -> None:
        bxs = self.boxes
        i = 0
        while i < len(bxs) - 1:
            b, nxt = bxs[i], bxs[i + 1]
            if b.get("layoutno", "0") != nxt.get("layoutno", "1") or b.get(
                "layout_type", ""
            ) in ("table", "figure", "equation"):
                i += 1
                continue
            y_gap = (nxt["top"] + nxt["bottom"] - b["top"] - b["bottom"]) / 2
            if abs(y_gap) < self.mean_height[b["page_number"] - 1] / 3:
                b["x1"] = nxt["x1"]
                b["top"] = (b["top"] + nxt["top"]) / 2
                b["bottom"] = (b["bottom"] + nxt["bottom"]) / 2
                b["text"] += nxt["text"]
                bxs.pop(i + 1)
                continue
            i += 1

    def merge_vertical(self) -> None:
        med_h = median(self.mean_height) if self.mean_height else 0
        bxs = sort_y_first(self.boxes, med_h / 3)
        i = 0
        while i + 1 < len(bxs):
            b, nxt = bxs[i], bxs[i + 1]
            if b["page_number"] < nxt["page_number"] and _PAGE_NUMBERISH.match(b["text"]):
                bxs.pop(i)
                continue
            if not b["text"].strip():
                bxs.pop(i)
                continue
            stripped, nstripped = b["text"].strip(), nxt["text"].strip()
            concat_hints = [
                stripped[-1] in ",;:'\"，、‘“；：-",
                len(stripped) > 1 and stripped[-2] in ",;:'\"，‘“、；：",
                bool(nstripped) and nstripped[0] in "。；？！?”）),，、：",
            ]
            stop_hints = [
                b.get("layoutno", 0) != nxt.get("layoutno", 0),
                stripped[-1] in "。？！?",
                self.is_english and stripped[-1] in ".!?",
                b["page_number"] == nxt["page_number"]
                and nxt["top"] - b["bottom"]
                > self.mean_height[b["page_number"] - 1] * 1.5,
                b["page_number"] < nxt["page_number"]
                and abs(b["x0"] - nxt["x0"]) > self.mean_width[b["page_number"] - 1] * 4,
            ]
            detached = [b["x1"] < nxt["x0"], b["x0"] > nxt["x1"]]
            if (any(stop_hints) and not any(concat_hints)) or any(detached):
                i += 1
                continue
            b["bottom"] = nxt["bottom"]
            b["text"] += nxt["text"]
            b["x0"] = min(b["x0"], nxt["x0"])
            b["x1"] = max(b["x1"], nxt["x1"])
            bxs.pop(i + 1)
        self.boxes = bxs

    def sort_reading_order(self) -> None:
        """The live ``_concat_downward`` path: a plain Y-first sort (the
        XGBoost DFS below the early return is dead code)."""
        self.boxes = sort_y_first(self.boxes, 0)

    def sort_columns(self, column_width: float) -> None:
        self.boxes = sort_two_column(self.boxes, column_width)

    # -- TOC / bullets --------------------------------------------------

    def drop_toc_pages(self) -> None:
        if not self.boxes:
            return
        found = False
        i = 0
        while i < len(self.boxes):
            head = _SPACES.sub("", self.boxes[i]["text"].lower())
            if not _TOC_TITLE.match(head):
                i += 1
                continue
            found = True
            eng = bool(_ENGLISHISH_LINE.match(self.boxes[i]["text"].strip()))
            self.boxes.pop(i)
            if i >= len(self.boxes):
                break

            def prefix_at() -> str:
                t = self.boxes[i]["text"].strip()
                return t[:3] if not eng else " ".join(t.split()[:2])

            prefix = prefix_at()
            while not prefix and i < len(self.boxes):
                self.boxes.pop(i)
                if i >= len(self.boxes):
                    break
                prefix = prefix_at()
            if i >= len(self.boxes):
                break
            self.boxes.pop(i)
            if i >= len(self.boxes) or not prefix:
                break
            for j in range(i, min(i + 128, len(self.boxes))):
                if not re.match(prefix, self.boxes[j]["text"]):
                    continue
                for _ in range(i, j):
                    self.boxes.pop(i)
                break
        if found:
            return

        # fallback: pages dominated by dotted TOC leaders
        dirty_counts = [0] * len(self.pages)
        for b in self.boxes:
            if _DOT_LEADER.search(b["text"]):
                dirty_counts[b["page_number"] - 1] += 1
        dirty = {i + 1 for i, c in enumerate(dirty_counts) if c > 3}
        if not dirty:
            return
        self.boxes = [b for b in self.boxes if b["page_number"] not in dirty]

    def merge_same_bullet(self) -> None:
        i = 0
        while i + 1 < len(self.boxes):
            b, nxt = self.boxes[i], self.boxes[i + 1]
            if not b["text"].strip():
                self.boxes.pop(i)
                continue
            if not nxt["text"].strip():
                self.boxes.pop(i + 1)
                continue
            first, nfirst = b["text"].strip()[0], nxt["text"].strip()[0]
            if (
                first != nfirst
                or first.lower() in _CN_CONSONANTS
                or "一" <= first <= "鿿"
                or b["top"] > nxt["bottom"]
            ):
                i += 1
                continue
            nxt["text"] = b["text"] + "\n" + nxt["text"]
            nxt["x0"] = min(b["x0"], nxt["x0"])
            nxt["x1"] = max(b["x1"], nxt["x1"])
            nxt["top"] = b["top"]
            self.boxes.pop(i)

    # -- tables & figures ----------------------------------------------

    def _crop_ref(self, boxes: list[dict], kind: str, positions: list) -> str:
        """Deterministic media ref for a cropped region + positions.

        Stands in for the reference's PIL crop-and-upload
        (pdf_parser.py:782-827): region coordinates snap to the
        matching layout region when one overlaps.
        """
        page_numbers = sorted({b["page_number"] - 1 for b in boxes})
        if len(page_numbers) == 1:
            pn = page_numbers[0]
            off = self.page_cum_height[pn]
            region = {
                "x0": min(b["x0"] for b in boxes),
                "top": min(b["top"] for b in boxes) - off,
                "x1": max(b["x1"] for b in boxes),
                "bottom": max(b["bottom"] for b in boxes) - off,
            }
            louts = [lt for lt in self.page_layouts[pn] if lt["type"] == kind]
            ii = find_max_overlap(region, louts, naive=True)
            if ii is not None:
                region = louts[ii]
            left, top, right, bott = region["x0"], region["top"], region["x1"], region["bottom"]
            if right < left:
                right = left + 1
            positions.append((pn, left, right, top, bott))
            return f"crop://{self.doc_id}/p{pn}-{kind}-{left:.0f}x{top:.0f}"
        by_page: dict[int, list[dict]] = {}
        for b in boxes:
            by_page.setdefault(b["page_number"] - 1, []).append(b)
        refs = [
            self._crop_ref(arr, kind, positions)
            for _, arr in sorted(by_page.items(), key=lambda kv: kv[0])
        ]
        return "+".join(refs)

    def extract_tables_figures(
        self, need_figures: bool = True, return_html: bool = True,
        separate_figures: bool = False,
    ):
        """Pop table/figure boxes; → list of ((media_ref, content), positions).

        ``content`` is an HTML string (``return_html``) or a list of
        row-description strings for tables, and ``[caption_text]`` for
        figures.  When ``separate_figures``, figures come back as a
        second list.
        """
        tables: dict[str, list[dict]] = {}
        figures: dict[str, list[dict]] = {}
        i = 0
        last_layout = ""
        nomerge: list[str] = []
        while i < len(self.boxes):
            box = self.boxes[i]
            if "layoutno" not in box:
                i += 1
                continue
            key = f"{box['page_number']}-{box['layoutno']}"
            if is_caption(box) or box["layout_type"] in (
                "table caption", "title", "figure caption", "reference",
            ):
                nomerge.append(last_layout)
            if box["layout_type"] == "table":
                if _SRC_NOTE.match(box["text"]):
                    self.boxes.pop(i)
                    continue
                tables.setdefault(key, []).append(box)
                self.boxes.pop(i)
                last_layout = key
                continue
            if need_figures and box["layout_type"] == "figure":
                if _SRC_NOTE.match(box["text"]):
                    self.boxes.pop(i)
                    continue
                figures.setdefault(key, []).append(box)
                self.boxes.pop(i)
                last_layout = key
                continue
            i += 1

        # merge a table that continues onto the next page
        nomerge_set = set(nomerge)
        ordered = sorted(tables.items(), key=lambda kv: (kv[1][0]["top"], kv[1][0]["x0"]))
        i = len(ordered) - 1
        while i - 1 >= 0:
            k_prev, boxes_prev = ordered[i - 1]
            k_cur, boxes_cur = ordered[i]
            i -= 1
            if k_prev in nomerge_set:
                continue
            gap_pages = boxes_cur[0]["page_number"] - boxes_prev[0]["page_number"]
            if gap_pages == 0 or gap_pages > 1:
                continue
            mh = self.mean_height[boxes_cur[0]["page_number"] - 1]
            y_dis = (
                boxes_cur[0]["top"] + boxes_cur[0]["bottom"]
                - boxes_prev[-1]["top"] - boxes_prev[-1]["bottom"]
            ) / 2
            if y_dis > mh * 23:
                continue
            tables[k_prev].extend(tables[k_cur])
            del tables[k_cur]

        def x_overlapped(a: dict, b: dict) -> bool:
            return not (a["x1"] < b["x0"] or a["x0"] > b["x1"])

        # nearest-region caption assignment
        i = 0
        while i < len(self.boxes):
            c = self.boxes[i]
            if not is_caption(c):
                i += 1
                continue

            def nearest(groups: dict[str, list[dict]]):
                best_k, best_d = "", 1e9
                for k, arr in groups.items():
                    for b in arr:
                        if b.get("layout_type", "").find("caption") >= 0:
                            continue
                        y_dis = (b["top"] + b["bottom"] - c["top"] - c["bottom"]) / 2
                        x_dis = (
                            0
                            if x_overlapped(c, b)
                            else min(
                                abs(c["x1"] - b["x0"]),
                                abs(c["x0"] - b["x1"]),
                                abs(c["x0"] + c["x1"] - b["x0"] - b["x1"]) / 2,
                            )
                        )
                        d = y_dis * y_dis + x_dis * x_dis
                        if d < best_d:
                            best_k, best_d = k, d
                return best_k, best_d

            tk, tv = nearest(tables)
            fk, fv = nearest(figures)
            if tv < fv and tk:
                tables[tk].insert(0, c)
            elif fk:
                figures[fk].insert(0, c)
            self.boxes.pop(i)

        results = []
        positions = []
        figure_results = []
        figure_positions = []
        for _, arr in figures.items():
            txt = "\n".join(b["text"] for b in arr)
            if not txt:
                continue
            poss: list = []
            ref = self._crop_ref(arr, "figure", poss)
            if separate_figures:
                figure_results.append((ref, [txt]))
                figure_positions.append(poss)
            else:
                results.append((ref, [txt]))
                positions.append(poss)
        for _, arr in tables.items():
            if not arr:
                continue
            arr = sort_y_first(
                arr, sum((b["bottom"] - b["top"]) / 2 for b in arr) / len(arr)
            )
            poss = []
            ref = self._crop_ref(arr, "table", poss)
            results.append(
                (ref, construct_table(arr, is_english=self.is_english, html=return_html))
            )
            positions.append(poss)

        if separate_figures:
            return list(zip(results, positions)), list(
                zip(figure_results, figure_positions)
            )
        return list(zip(results, positions))

    # -- tagging / assembly ---------------------------------------------

    def line_tag(self, box: dict) -> str:
        """``@@pn\\tx0\\tx1\\ttop\\tbottom##`` position tag, multi-page
        spans joined with '-' (pdf_parser.py:905-920)."""
        pns = [box["page_number"]]
        top = box["top"] - self.page_cum_height[pns[0] - 1]
        bott = box["bottom"] - self.page_cum_height[pns[0] - 1]
        if pns[-1] - 1 >= len(self.pages):
            return ""
        while bott > self.page_heights[pns[-1] - 1]:
            bott -= self.page_heights[pns[-1] - 1]
            pns.append(pns[-1] + 1)
            if pns[-1] - 1 >= len(self.pages):
                return ""
        return "@@{}\t{:.1f}\t{:.1f}\t{:.1f}\t{:.1f}##".format(
            "-".join(map(str, pns)), box["x0"], box["x1"], top, bott
        )

    def positions_of(self, box: dict) -> list[tuple]:
        """(pn, x0, x1, top, bottom) per page the box spans."""
        poss = []
        pn = box["page_number"]
        top = box["top"] - self.page_cum_height[pn - 1]
        bott = box["bottom"] - self.page_cum_height[pn - 1]
        poss.append((pn, box["x0"], box["x1"], top, min(bott, self.page_heights[pn - 1])))
        while bott > self.page_heights[pn - 1]:
            bott -= self.page_heights[pn - 1]
            top = 0
            pn += 1
            poss.append((pn, box["x0"], box["x1"], top, min(bott, self.page_heights[pn - 1])))
        return poss

    def assemble_text_blocks(self) -> str:
        """Reading-order DFS re-assembly of the remaining boxes into
        tagged text blocks joined by blank lines (pdf_parser.py:922-992)."""
        boxes = [dict(b) for b in self.boxes]

        def width(b):
            return b["x1"] - b["x0"]

        def useful(b):
            if b.get("layout_type"):
                return True
            if width(b) > self.pages[b["page_number"] - 1].width / 3:
                return True
            return b["bottom"] - b["top"] > self.mean_height[b["page_number"] - 1]

        blocks: list[str] = []
        while boxes:
            lines: list[dict] = []
            widths: list[float] = []
            pw = self.pages[boxes[0]["page_number"] - 1].width
            mh = self.mean_height[boxes[0]["page_number"] - 1]
            anchored = proj_match(boxes[0]["text"]) or boxes[0].get("layout_type", "") == "title"

            def dfs(line: dict, start: int) -> None:
                lines.append(line)
                widths.append(width(line))
                structural = proj_match(line["text"]) or line.get("layout_type", "") == "title"
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
            if not widths:
                continue
            mw = sum(widths) / len(widths)
            if anchored or mw / pw >= 0.35 or mw > 200:
                blocks.append("\n".join(c["text"] + self.line_tag(c) for c in lines))
        return "\n\n".join(blocks)
