"""Tolerance-aware geometry kernels for box/layout joins.

Behavioral parity with /root/reference/deepdoc/vision/recognizer.py:54-281
(sorting with y/x tolerance, overlap-area joins, layout cleanup) and
pdf_parser.py:182-195 (two-column restore sort).  Boxes are dicts with
``x0, x1, top, bottom`` (page coordinates) plus pipeline tags.
"""

from __future__ import annotations

from functools import cmp_to_key


def sort_y_first(boxes: list[dict], threshold: float) -> list[dict]:
    """Sort top-to-bottom; rows closer than ``threshold`` order by x."""

    def cmp(a: dict, b: dict) -> float:
        dy = a["top"] - b["top"]
        if abs(dy) < threshold:
            return a["x0"] - b["x0"]
        return dy

    return sorted(boxes, key=cmp_to_key(cmp))


def sort_x_first(boxes: list[dict], threshold: float) -> list[dict]:
    """Sort left-to-right; columns closer than ``threshold`` order by y."""

    def cmp(a: dict, b: dict) -> float:
        dx = a["x0"] - b["x0"]
        if abs(dx) < threshold:
            return a["top"] - b["top"]
        return dx

    return sorted(boxes, key=cmp_to_key(cmp))


def sort_by_column(boxes: list[dict], threshold: float = 0) -> list[dict]:
    """x-first sort, then bubble boxes with a smaller column tag ``C``
    (or same C and smaller top) leftwards — restores grid column order."""
    arr = sort_x_first(boxes, threshold)
    for i in range(len(arr) - 1):
        for j in range(i, -1, -1):
            if "C" not in arr[j] or "C" not in arr[j + 1]:
                continue
            if arr[j + 1]["C"] < arr[j]["C"] or (
                arr[j + 1]["C"] == arr[j]["C"] and arr[j + 1]["top"] < arr[j]["top"]
            ):
                arr[j], arr[j + 1] = arr[j + 1], arr[j]
    return arr


def sort_by_row(boxes: list[dict], threshold: float = 0) -> list[dict]:
    """y-first sort, then bubble boxes with a smaller row tag ``R``
    (or same R and smaller x0) upwards — restores grid row order."""
    arr = sort_y_first(boxes, threshold)
    for i in range(len(arr) - 1):
        for j in range(i, -1, -1):
            if "R" not in arr[j] or "R" not in arr[j + 1]:
                continue
            if arr[j + 1]["R"] < arr[j]["R"] or (
                arr[j + 1]["R"] == arr[j]["R"] and arr[j + 1]["x0"] < arr[j]["x0"]
            ):
                arr[j], arr[j + 1] = arr[j + 1], arr[j]
    return arr


def sort_two_column(boxes: list[dict], threshold: float) -> list[dict]:
    """Reading order for two-column pages: sort (page, x0, top) then
    bubble-restore vertical order within an x-threshold
    (pdf_parser.py:182-195).  The bubble pass runs on primitive arrays
    (the dict-lookup version dominated the paper-chunker profile)."""
    arr = sorted(boxes, key=lambda b: (b["page_number"], b["x0"], b["top"]))
    x0 = [b["x0"] for b in arr]
    top = [b["top"] for b in arr]
    pn = [b["page_number"] for b in arr]
    for i in range(len(arr) - 1):
        for j in range(i, -1, -1):
            if (
                abs(x0[j + 1] - x0[j]) < threshold
                and top[j + 1] < top[j]
                and pn[j + 1] == pn[j]
            ):
                arr[j], arr[j + 1] = arr[j + 1], arr[j]
                x0[j], x0[j + 1] = x0[j + 1], x0[j]
                top[j], top[j + 1] = top[j + 1], top[j]
                pn[j], pn[j + 1] = pn[j + 1], pn[j]
    return arr


def overlap_ratio(a: dict, b: dict, ratio: bool = True) -> float:
    """Area of a∩b; when ``ratio`` divide by area(a)."""
    top, btm, x0, x1 = a["top"], a["bottom"], a["x0"], a["x1"]
    if b["x0"] > x1 or b["x1"] < x0:
        return 0.0
    if b["bottom"] < top or b["top"] > btm:
        return 0.0
    ix0, ix1 = max(b["x0"], x0), min(b["x1"], x1)
    itp, ibt = max(b["top"], top), min(b["bottom"], btm)
    if x1 - x0 == 0 or btm - top == 0:
        return 0.0
    ov = (ibt - itp) * (ix1 - ix0)
    if ov > 0 and ratio:
        ov /= (x1 - x0) * (btm - top)
    return ov


def _disjoint(a: dict, b: dict) -> bool:
    return (
        a["x1"] < b["x0"]
        or a["x0"] > b["x1"]
        or a["bottom"] < b["top"]
        or a["top"] > b["bottom"]
    )


def find_max_overlap(box: dict, boxes_sorted_by_y: list[dict], naive: bool = False):
    """Index of the y-sorted box whose area overlaps ``box`` the most
    (binary-search narrowed unless ``naive``); None when no overlap."""
    if not boxes_sorted_by_y:
        return None
    bxs = boxes_sorted_by_y
    s, e, ii = 0, len(bxs), 0
    while s < e and not naive:
        ii = (e + s) // 2
        pv = bxs[ii]
        if box["bottom"] < pv["top"]:
            e = ii
            continue
        if box["top"] > pv["bottom"]:
            s = ii + 1
            continue
        break
    while s < ii:
        if box["top"] > bxs[s]["bottom"]:
            s += 1
        break
    while e - 1 > ii:
        if box["bottom"] < bxs[e - 1]["top"]:
            e -= 1
        break
    best_i, best = None, 0.0
    for i in range(s, e):
        ov = overlap_ratio(bxs[i], box)
        if ov > best:
            best_i, best = i, ov
    return best_i


def find_overlap_above(box: dict, boxes: list[dict], thr: float = 0.3):
    """Index of the box maximizing bi-directional overlap above ``thr``."""
    if not boxes:
        return None
    best_i, best_fwd, best_bwd = None, thr, 0.0
    for i, other in enumerate(boxes):
        fwd = overlap_ratio(box, other)
        bwd = overlap_ratio(other, box)
        if (fwd, bwd) < (best_fwd, best_bwd):
            continue
        best_i, best_fwd, best_bwd = i, fwd, bwd
    return best_i


def tightest_horizontal_fit(box: dict, boxes: list[dict]):
    """Index of the box (same layoutno) with minimal horizontal offset."""
    if not boxes:
        return None
    best_d, best_i = 1000000.0, None
    for i, b in enumerate(boxes):
        if box.get("layoutno", "0") != b.get("layoutno", "0"):
            continue
        d = min(
            abs(box["x0"] - b["x0"]),
            abs(box["x1"] - b["x1"]),
            abs(box["x0"] + box["x1"] - b["x1"] - b["x0"]) / 2,
        )
        if d < best_d:
            best_i, best_d = i, d
    return best_i


def cleanup_layouts(
    boxes: list[dict], layouts: list[dict], far: int = 2, thr: float = 0.7
) -> list[dict]:
    """De-duplicate near-identical layout regions.

    Within a lookahead of ``far``, same-type overlapping layouts above
    ``thr`` mutual overlap keep the higher-score one (or the one
    covering more text-box area).
    """
    i = 0
    while i + 1 < len(layouts):
        j = i + 1
        while j < min(i + far, len(layouts)) and (
            layouts[i].get("type", "") != layouts[j].get("type", "")
            or _disjoint(layouts[i], layouts[j])
        ):
            j += 1
        if j >= min(i + far, len(layouts)):
            i += 1
            continue
        if (
            overlap_ratio(layouts[i], layouts[j]) < thr
            and overlap_ratio(layouts[j], layouts[i]) < thr
        ):
            i += 1
            continue
        if layouts[i].get("score") and layouts[j].get("score"):
            if layouts[i]["score"] > layouts[j]["score"]:
                layouts.pop(j)
            else:
                layouts.pop(i)
            continue
        area_i = sum(
            overlap_ratio(b, layouts[i], False)
            for b in boxes
            if not _disjoint(b, layouts[i])
        )
        area_j = sum(
            overlap_ratio(b, layouts[j], False)
            for b in boxes
            if not _disjoint(b, layouts[j])
        )
        if area_i > area_j:
            layouts.pop(j)
        else:
            layouts.pop(i)
    return layouts
