"""Box ↔ layout-region assignment and garbage dropping.

Behavioral parity with
/root/reference/deepdoc/vision/layout_recognizer.py:64-163:

* layouts below score 0.4 survive only for non-garbage classes;
* per page, layouts are y-sorted and cleaned up, then text boxes are
  assigned to overlapping layouts (threshold 0.4) class by class in a
  fixed priority order;
* garbage classes (footer/header/reference) drop their boxes unless
  positioned unusually (footer above 90% page height, header below
  10%);
* text matching garbage regexes (page numbers, bare bullets, urls)
  is dropped outright;
* figure/equation layouts with no text box get a synthetic empty box;
* finally, any text seen more than once inside garbage layouts is
  dropped globally (repeated running headers/footers).
"""

from __future__ import annotations

import re
from collections import Counter
from copy import deepcopy

from .geometry import cleanup_layouts, find_overlap_above, sort_y_first
from .page_model import Page

GARBAGE_LAYOUTS = ("footer", "header", "reference")

_GARBAGE_TEXT = [
    re.compile(p)
    for p in (
        r"^•+$",
        r"^[0-9]{1,2} / ?[0-9]{1,2}$",
        r"^[0-9]{1,2} of [0-9]{1,2}$",
        r"^http://[^ ]{12,}",
        r"\(cid *: *[0-9]+ *\)",
    )
]

_ASSIGN_ORDER = [
    "footer", "header", "reference", "figure caption", "table caption",
    "title", "table", "text", "figure", "equation",
]


def _is_garbage_text(box: dict) -> bool:
    return any(p.search(box["text"]) for p in _GARBAGE_TEXT)


def assign_layouts(pages: list[Page], drop: bool = True) -> tuple[list[dict], list[list[dict]]]:
    """→ (flat tagged box list, per-page cleaned layouts).

    Boxes gain ``layout_type`` and ``layoutno`` (``f"{type}-{idx}"``);
    garbage boxes are removed when ``drop``.
    """
    all_boxes: list[dict] = []
    page_layouts: list[list[dict]] = []
    garbage_texts: dict[str, list[str]] = {}

    for page in pages:
        bxs = [dict(b) for b in page.boxes]
        lts = [
            dict(lt)
            for lt in page.layouts
            if lt["score"] >= 0.4 or lt["type"] not in GARBAGE_LAYOUTS
        ]
        if lts:
            mean_h = sum(lt["bottom"] - lt["top"] for lt in lts) / len(lts)
            lts = sort_y_first(lts, mean_h / 2)
        lts = cleanup_layouts(bxs, lts)
        page_layouts.append(lts)

        for ty in _ASSIGN_ORDER:
            same_type = [lt for lt in lts if lt["type"] == ty]
            i = 0
            while i < len(bxs):
                box = bxs[i]
                if box.get("layout_type"):
                    i += 1
                    continue
                if _is_garbage_text(box):
                    bxs.pop(i)
                    continue
                ii = find_overlap_above(box, same_type, thr=0.4)
                if ii is None:
                    box["layout_type"] = ""
                    i += 1
                    continue
                same_type[ii]["visited"] = True
                keep = (
                    same_type[ii]["type"] == "footer"
                    and box["bottom"] < page.height * 0.9
                ) or (
                    same_type[ii]["type"] == "header"
                    and box["top"] > page.height * 0.1
                )
                if drop and same_type[ii]["type"] in GARBAGE_LAYOUTS and not keep:
                    garbage_texts.setdefault(same_type[ii]["type"], []).append(
                        box["text"]
                    )
                    bxs.pop(i)
                    continue
                box["layoutno"] = f"{ty}-{ii}"
                box["layout_type"] = (
                    same_type[ii]["type"]
                    if same_type[ii]["type"] != "equation"
                    else "figure"
                )
                i += 1

        # figure/equation layouts with no box get a synthetic empty box
        fig_layouts = [lt for lt in lts if lt["type"] in ("figure", "equation")]
        for i, lt in enumerate(fig_layouts):
            if lt.get("visited"):
                continue
            synthetic = deepcopy(lt)
            synthetic.pop("type", None)
            synthetic["text"] = ""
            synthetic["layout_type"] = "figure"
            synthetic["layoutno"] = f"figure-{i}"
            bxs.append(synthetic)

        all_boxes.extend(bxs)

    repeated = set()
    for texts in garbage_texts.values():
        for text, count in Counter(texts).items():
            if count > 1:
                repeated.add(text)
    all_boxes = [b for b in all_boxes if b["text"].strip() not in repeated]
    return all_boxes, page_layouts
