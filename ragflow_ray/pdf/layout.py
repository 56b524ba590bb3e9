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

import numpy as np

from .geometry import cleanup_layouts, sort_y_first
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


def _overlap_matrix(boxes: list[dict], lts: list[dict]) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized pairwise overlap: (n_boxes × n_layouts) forward
    (∩/area_box) and backward (∩/area_layout) ratio matrices — the
    batched form of ``geometry.overlap_ratio``."""
    bx0 = np.array([b["x0"] for b in boxes])[:, None]
    bx1 = np.array([b["x1"] for b in boxes])[:, None]
    bt = np.array([b["top"] for b in boxes])[:, None]
    bb = np.array([b["bottom"] for b in boxes])[:, None]
    lx0 = np.array([lt["x0"] for lt in lts])[None, :]
    lx1 = np.array([lt["x1"] for lt in lts])[None, :]
    lt_ = np.array([lt["top"] for lt in lts])[None, :]
    lb = np.array([lt["bottom"] for lt in lts])[None, :]
    iw = np.minimum(bx1, lx1) - np.maximum(bx0, lx0)
    ih = np.minimum(bb, lb) - np.maximum(bt, lt_)
    inter = np.where((iw > 0) & (ih > 0), iw * ih, 0.0)
    # zero-extent boxes overlap nothing (matches overlap_ratio)
    area_b = (bx1 - bx0) * (bb - bt)
    area_l = (lx1 - lx0) * (lb - lt_)
    fwd = np.divide(inter, area_b, out=np.zeros_like(inter), where=area_b != 0)
    bwd = np.divide(inter, area_l, out=np.zeros_like(inter), where=area_l != 0)
    return fwd, bwd


def _best_overlaps(fwd: np.ndarray, bwd: np.ndarray, thr: float) -> np.ndarray:
    """Per box, the layout index maximizing (fwd, bwd) lexicographically
    with last-index tie-break and fwd ≥ thr; −1 when none — the batched
    form of ``geometry.find_overlap_above``."""
    n, m = fwd.shape
    if m == 0:
        return np.full(n, -1, dtype=np.int64)
    best = np.full(n, -1, dtype=np.int64)
    # lexicographic argmax: sort keys (fwd, bwd, index); take the last
    order = np.lexsort((np.broadcast_to(np.arange(m), (n, m)), bwd, fwd), axis=1)
    cand = order[:, -1]
    rows = np.arange(n)
    ok = fwd[rows, cand] >= thr
    best[ok] = cand[ok]
    return best


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

        # garbage-text boxes are always consumed by the first type pass
        # before any assignment can claim them — drop upfront
        bxs = [b for b in bxs if not _is_garbage_text(b)]

        keep_flags = [True] * len(bxs)
        # the box and layout sets are constant across the type passes
        # (only flags/attributes mutate), so the pairwise overlap
        # matrices are computed ONCE per page and column-sliced per
        # type instead of rebuilt up to len(_ASSIGN_ORDER) times
        if bxs and lts:
            fwd_all, bwd_all = _overlap_matrix(bxs, lts)
        for ty in _ASSIGN_ORDER:
            cols = [k for k, lt in enumerate(lts) if lt["type"] == ty]
            same_type = [lts[k] for k in cols]
            if not bxs:
                break
            if not same_type:
                for b, kept in zip(bxs, keep_flags):
                    if kept and not b.get("layout_type"):
                        b["layout_type"] = ""
                continue
            fwd, bwd = fwd_all[:, cols], bwd_all[:, cols]
            best = _best_overlaps(fwd, bwd, thr=0.4)
            for i, box in enumerate(bxs):
                if not keep_flags[i] or box.get("layout_type"):
                    continue
                ii = int(best[i])
                if ii < 0:
                    box["layout_type"] = ""
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
                    keep_flags[i] = False
                    continue
                box["layoutno"] = f"{ty}-{ii}"
                box["layout_type"] = (
                    same_type[ii]["type"]
                    if same_type[ii]["type"] != "equation"
                    else "figure"
                )
        bxs = [b for b, kept in zip(bxs, keep_flags) if kept]

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
