"""Table-structure assembly: TSR component alignment, box tagging, and
grid construction to HTML / row-description text.

Behavioral parity with:

* /root/reference/deepdoc/vision/table_structure_recognizer.py:49-92
  (row/column coordinate alignment),
* deepdoc/parser/pdf_parser.py:205-294 (R/H/C/SP box tagging),
* table_structure_recognizer.py:104-587 (``blockType``,
  ``construct_table``, ``__html_table``, ``__desc_table``,
  ``__cal_spans``).

Live-path quirks preserved on purpose:

* the reference's column join (``find_horizontally_tightest_fit``)
  compares the box's string ``layoutno`` ("table-0") to the TSR
  component's integer table index, which never match — so ``C`` tags
  are never assigned in practice; we keep that comparison semantics;
* ``__cal_spans`` reads ``R_btm`` but the tagger writes ``R_bott``,
  so the row-span midpoints always fall back to the box bottoms.
"""

from __future__ import annotations

import re
from collections import Counter

from .geometry import (
    find_overlap_above,
    sort_by_column,
    sort_by_row,
    sort_x_first,
    sort_y_first,
    tightest_horizontal_fit,
    cleanup_layouts,
)

_CAPTION = re.compile(r"[图表]+[ 0-9:：]{2,}")

_BLOCK_TYPE_PATTERNS = [
    (re.compile(r"^(20|19)[0-9]{2}[年/-][0-9]{1,2}[月/-][0-9]{1,2}日*$"), "Dt"),
    (re.compile(r"^(20|19)[0-9]{2}年$"), "Dt"),
    (re.compile(r"^(20|19)[0-9]{2}[年-][0-9]{1,2}月*$"), "Dt"),
    (re.compile(r"^[0-9]{1,2}[月-][0-9]{1,2}日*$"), "Dt"),
    (re.compile(r"^第*[一二三四1-4]季度$"), "Dt"),
    (re.compile(r"^(20|19)[0-9]{2}年*[一二三四1-4]季度$"), "Dt"),
    (re.compile(r"^(20|19)[0-9]{2}[ABCDE]$"), "Dt"),
    (re.compile(r"^[0-9.,+%/ -]+$"), "Nu"),
    (re.compile(r"^[0-9A-Z/\._~-]+$"), "Ca"),
    (re.compile(r"^[A-Z]*[a-z' -]+$"), "En"),
    (re.compile(r"^[0-9.,+-]+[0-9A-Za-z/$￥%<>（）()' -]+$"), "NE"),
    (re.compile(r"^.{1}$"), "Sg"),
]

_WORD = re.compile(r"[A-Za-z0-9]+|[一-鿿]")


def is_caption(box: dict) -> bool:
    """Caption detection: 图/表-prefixed text or a *caption layout."""
    return bool(_CAPTION.match(box["text"].strip())) or (
        box.get("layout_type", "").find("caption") >= 0
    )


def cell_block_type(box: dict, tok=None) -> str:
    """Classify a cell: date / number / code / english / mixed / single /
    short text / long text / person-name / other
    (table_structure_recognizer.py:105-133).

    ``tok``: optional :class:`~ragflow_ray.text.ragtok.RagTok` built
    from a user dictionary — with it, tokenization matches the
    reference's ``rag_tokenizer.tokenize`` and a single token tagged
    ``nr`` classifies as 'Nr'; without it (the default), the
    regex-word fallback maps those cells to 'Ot'."""
    text = box["text"]
    for pat, label in _BLOCK_TYPE_PATTERNS:
        if pat.search(text.strip()):
            return label
    if tok is not None:
        tokens = [t for t in tok.tokenize(text).split() if len(t) > 1]
    else:
        tokens = [t for t in _WORD.findall(text) if len(t) > 1]
    if len(tokens) > 3:
        return "Tx" if len(tokens) < 12 else "Lx"
    if tok is not None and len(tokens) == 1 and tok.tag(tokens[0]) == "nr":
        return "Nr"
    return "Ot"


def align_table_components(components: list[dict]) -> list[dict]:
    """Align row edges to the common left/right and column edges to the
    common top/bottom (TSR post-processing, tsr.py:52-91)."""
    if not components:
        return components
    lts = components

    lefts = [b["x0"] for b in lts if b["label"].find("row") > 0 or b["label"].find("header") > 0]
    rights = [b["x1"] for b in lts if b["label"].find("row") > 0 or b["label"].find("header") > 0]
    if not lefts:
        return lts
    left = sum(lefts) / len(lefts) if len(lefts) > 4 else min(lefts)
    right = sum(rights) / len(rights) if len(rights) > 4 else max(rights)
    for b in lts:
        if b["label"].find("row") > 0 or b["label"].find("header") > 0:
            b["x0"] = min(b["x0"], left)
            b["x1"] = max(b["x1"], right)

    tops = [b["top"] for b in lts if b["label"] == "table column"]
    bottoms = [b["bottom"] for b in lts if b["label"] == "table column"]
    if not tops:
        return lts
    from statistics import median

    top = median(tops) if len(tops) > 4 else min(tops)
    bottom = median(bottoms) if len(bottoms) > 4 else max(bottoms)
    for b in lts:
        if b["label"] == "table column":
            b["top"] = min(b["top"], top)
            b["bottom"] = max(b["bottom"], bottom)
    return lts


def tag_table_components(
    boxes: list[dict], components: list[dict]
) -> None:
    """Tag table-layout boxes with R / H / C / SP grid indices in place.

    ``components`` are page-coordinate TSR components carrying ``pn``
    and integer ``layoutno`` (table index on the page)
    (pdf_parser.py:251-294).
    """

    def gather(kwd: str, fzy: float = 10, ption: float = 0.6) -> list[dict]:
        pat = re.compile(kwd)
        eles = sort_y_first([r for r in components if pat.match(r["label"])], fzy)
        eles = cleanup_layouts(boxes, eles, 5, ption)
        return sort_y_first(eles, 0)

    headers = gather(r".*header$")
    rows = gather(r".* (row|header)")
    spans = gather(r".*spanning")
    columns = sorted(
        [r for r in components if re.match(r"table column$", r["label"])],
        key=lambda x: (x.get("pn", 0), x.get("layoutno", 0), x["x0"]),
    )
    columns = cleanup_layouts(boxes, columns, 5, 0.5)

    for b in boxes:
        if b.get("layout_type", "") != "table":
            continue
        ii = find_overlap_above(b, rows, thr=0.3)
        if ii is not None:
            b["R"] = ii
            b["R_top"] = rows[ii]["top"]
            b["R_bott"] = rows[ii]["bottom"]
        ii = find_overlap_above(b, headers, thr=0.3)
        if ii is not None:
            b["H_top"] = headers[ii]["top"]
            b["H_bott"] = headers[ii]["bottom"]
            b["H_left"] = headers[ii]["x0"]
            b["H_right"] = headers[ii]["x1"]
            b["H"] = ii
        ii = tightest_horizontal_fit(b, columns)
        if ii is not None:
            b["C"] = ii
            b["C_left"] = columns[ii]["x0"]
            b["C_right"] = columns[ii]["x1"]
        ii = find_overlap_above(b, spans, thr=0.3)
        if ii is not None:
            b["H_top"] = spans[ii]["top"]
            b["H_bott"] = spans[ii]["bottom"]
            b["H_left"] = spans[ii]["x0"]
            b["H_right"] = spans[ii]["x1"]
            b["SP"] = ii


def construct_table(boxes: list[dict], is_english: bool = False, html: bool = True,
                    tok=None):
    """Boxes (R/H/C/SP-tagged) → HTML table string or row-text list.
    ``tok``: optional trie tokenizer threaded to ``cell_block_type``
    so the person-name 'Nr' class resolves (reference behavior when
    its dictionary is loaded)."""
    caption = ""
    i = 0
    while i < len(boxes):
        if is_caption(boxes[i]):
            caption += boxes[i]["text"]
            boxes.pop(i)
            continue
        i += 1

    if not boxes:
        return []
    for b in boxes:
        b["btype"] = cell_block_type(b, tok=tok)
    type_counts = Counter(b["btype"] for b in boxes).items()
    max_type = max(type_counts, key=lambda kv: kv[1])[0] if type_counts else ""

    row_heights = [b["R_bott"] - b["R_top"] for b in boxes if "R" in b]
    rowh = min(row_heights) if row_heights else 0
    boxes = sort_by_row(boxes, rowh / 2)

    boxes[0]["rn"] = 0
    rows = [[boxes[0]]]
    btm = boxes[0]["bottom"]
    for b in boxes[1:]:
        b["rn"] = len(rows) - 1
        last_row = rows[-1]
        if last_row[-1].get("R", "") != b.get("R", "") or (
            b["top"] >= btm - 3 and last_row[-1].get("R", "-1") != b.get("R", "-2")
        ):
            btm = b["bottom"]
            b["rn"] += 1
            rows.append([b])
            continue
        btm = (btm + b["bottom"]) / 2.0
        rows[-1].append(b)

    col_widths = [b["C_right"] - b["C_left"] for b in boxes if "C" in b]
    colwm = min(col_widths) if col_widths else 0
    crosspage = len({b["page_number"] for b in boxes}) > 1
    boxes = sort_x_first(boxes, colwm / 2) if crosspage else sort_by_column(boxes, colwm / 2)
    boxes[0]["cn"] = 0
    cols = [[boxes[0]]]
    right = boxes[0]["x1"]
    for b in boxes[1:]:
        b["cn"] = len(cols) - 1
        last_col = cols[-1]
        new_col = (
            int(b.get("C", "1")) - int(last_col[-1].get("C", "1")) == 1
            and b["page_number"] == last_col[-1]["page_number"]
        ) or (b["x0"] >= right and last_col[-1].get("C", "-1") != b.get("C", "-2"))
        if new_col:
            right = b["x1"]
            b["cn"] += 1
            cols.append([b])
            continue
        right = (right + b["x1"]) / 2.0
        cols[-1].append(b)

    grid: list[list] = [[[] for _ in range(len(cols))] for _ in range(len(rows))]
    for b in boxes:
        grid[b["rn"]][b["cn"]].append(b)

    if len(rows) >= 4:
        _relocate_singleton_columns(grid, cols)
    assert len(cols) == len(grid[0]), "Column count mismatch: %d vs %d" % (
        len(cols), len(grid[0]))
    if len(cols) >= 4:
        _relocate_singleton_rows(grid, rows)

    # header rows: >50% of the occupied cells are H-tagged (or break the
    # dominant-Numeric pattern)
    header_rows: set[int] = set()
    for i in range(len(grid)):
        occupied, headerish = 0, 0
        for arr in grid[i]:
            if not arr:
                continue
            occupied += 1
            if max_type == "Nu" and arr[0]["btype"] == "Nu":
                continue
            if any(a.get("H") is not None for a in arr) or (
                max_type == "Nu" and arr[0]["btype"] != "Nu"
            ):
                headerish += 1
        if occupied and headerish / occupied > 0.5:
            header_rows.add(i)

    spanned = _resolve_spans(boxes, rows, cols, grid, html)
    if html:
        return _to_html(caption, header_rows, spanned)
    return _to_row_text(caption, header_rows, spanned, is_english)


def _relocate_singleton_columns(grid: list[list], cols: list) -> None:
    """Merge a column whose only occupied cell can slide into a
    horizontally-nearer neighbour (tsr.py:203-263)."""
    j = 0
    while j < len(grid[0]):
        occupied, ii = 0, 0
        for i in range(len(grid)):
            if grid[i][j]:
                occupied += 1
                ii = i
            if occupied > 1:
                break
        if occupied > 1:
            j += 1
            continue
        left_filled = (j > 0 and grid[ii][j - 1] and grid[ii][j - 1][0].get("text")) or j == 0
        right_filled = (
            j + 1 < len(grid[ii]) and grid[ii][j + 1] and grid[ii][j + 1][0].get("text")
        ) or j + 1 >= len(grid[ii])
        if left_filled and right_filled:
            j += 1
            continue
        bx = grid[ii][j][0]
        left_gap, right_gap = 100000.0, 100000.0
        if j > 0 and not left_filled:
            for i in range(len(grid)):
                if grid[i][j - 1]:
                    left_gap = min(
                        left_gap, min(bx["x0"] - a["x1"] for a in grid[i][j - 1])
                    )
        if j + 1 < len(grid[0]) and not right_filled:
            for i in range(len(grid)):
                if grid[i][j + 1]:
                    right_gap = min(
                        right_gap, min(a["x0"] - bx["x1"] for a in grid[i][j + 1])
                    )
        assert left_gap < 100000 or right_gap < 100000
        target = j - 1 if left_gap < right_gap else j + 1
        shift_from = j if left_gap < right_gap else j + 1
        for jj in range(shift_from, len(grid[0])):
            for i in range(len(grid)):
                for a in grid[i][jj]:
                    a["cn"] -= 1
        if grid[ii][target]:
            grid[ii][target].extend(grid[ii][j])
        else:
            grid[ii][target] = grid[ii][j]
        for i in range(len(grid)):
            grid[i].pop(j)
        cols.pop(j)


def _relocate_singleton_rows(grid: list[list], rows: list) -> None:
    """Row analogue of singleton-column relocation (tsr.py:266-324)."""
    i = 0
    while i < len(grid):
        occupied, jj = 0, 0
        for j in range(len(grid[i])):
            if grid[i][j]:
                occupied += 1
                jj = j
            if occupied > 1:
                break
        if occupied > 1:
            i += 1
            continue
        up_filled = (i > 0 and grid[i - 1][jj] and grid[i - 1][jj][0].get("text")) or i == 0
        down_filled = (
            i + 1 < len(grid) and grid[i + 1][jj] and grid[i + 1][jj][0].get("text")
        ) or i + 1 >= len(grid)
        if up_filled and down_filled:
            i += 1
            continue
        bx = grid[i][jj][0]
        up_gap, down_gap = 100000.0, 100000.0
        if i > 0 and not up_filled:
            for j in range(len(grid[i - 1])):
                if grid[i - 1][j]:
                    up_gap = min(
                        up_gap, min(bx["top"] - a["bottom"] for a in grid[i - 1][j])
                    )
        if i + 1 < len(grid) and not down_filled:
            for j in range(len(grid[i + 1])):
                if grid[i + 1][j]:
                    down_gap = min(
                        down_gap, min(a["top"] - bx["bottom"] for a in grid[i + 1][j])
                    )
        assert up_gap < 100000 or down_gap < 100000
        target = i - 1 if up_gap < down_gap else i + 1
        shift_from = i if up_gap < down_gap else i + 1
        for ii in range(shift_from, len(grid)):
            for j in range(len(grid[ii])):
                for a in grid[ii][j]:
                    a["rn"] -= 1
        if grid[target][jj]:
            grid[target][jj].extend(grid[i][jj])
        else:
            grid[target][jj] = grid[i][jj]
        grid.pop(i)
        rows.pop(i)


def _resolve_spans(boxes, rows, cols, grid, html: bool):
    """Compute col/rowspans for SP-tagged cells and collapse the grid
    (tsr.py:503-587)."""
    col_left = [sum(c.get("C_left", c["x0"]) for c in col) / len(col) for col in cols]
    col_right = [sum(c.get("C_right", c["x1"]) for c in col) / len(col) for col in cols]
    # reference reads "R_btm" (never written; tagger writes "R_bott") so
    # both midlines derive from the raw box edges
    row_top = [sum(c.get("R_top", c["top"]) for c in row) / len(row) for row in rows]
    row_btm = [sum(c.get("R_btm", c["bottom"]) for c in row) / len(row) for row in rows]

    for b in boxes:
        if "SP" not in b:
            continue
        b["colspan"] = [b["cn"]]
        b["rowspan"] = [b["rn"]]
        for j in range(len(col_left)):
            if j == b["cn"]:
                continue
            if col_left[j] + (col_right[j] - col_left[j]) / 2 < b["H_left"]:
                continue
            if col_right[j] - (col_right[j] - col_left[j]) / 2 > b["H_right"]:
                continue
            b["colspan"].append(j)
        for j in range(len(row_top)):
            if j == b["rn"]:
                continue
            if row_top[j] + (row_btm[j] - row_top[j]) / 2 < b["H_top"]:
                continue
            if row_btm[j] - (row_btm[j] - row_top[j]) / 2 > b["H_bott"]:
                continue
            b["rowspan"].append(j)

    def join(arr) -> str:
        return "".join(t["text"] for t in arr) if arr else ""

    for i in range(len(grid)):
        for j, arr in enumerate(grid[i]):
            if not arr:
                continue
            if all("rowspan" not in a and "colspan" not in a for a in arr):
                continue
            rowspan, colspan = [], []
            for a in arr:
                if isinstance(a.get("rowspan", 0), list):
                    rowspan.extend(a["rowspan"])
                if isinstance(a.get("colspan", 0), list):
                    colspan.extend(a["colspan"])
            rowspan, colspan = set(rowspan), set(colspan)
            if len(rowspan) < 2 and len(colspan) < 2:
                for a in arr:
                    a.pop("rowspan", None)
                    a.pop("colspan", None)
                continue
            rowspan, colspan = sorted(rowspan), sorted(colspan)
            rowspan = list(range(rowspan[0], rowspan[-1] + 1))
            colspan = list(range(colspan[0], colspan[-1] + 1))
            assert i in rowspan, rowspan
            assert j in colspan, colspan
            arr = []
            for r in rowspan:
                for c in colspan:
                    if grid[r][c] and join(grid[r][c]) != join(arr):
                        arr.extend(grid[r][c])
                    grid[r][c] = None if html else arr
            for a in arr:
                if len(rowspan) > 1:
                    a["rowspan"] = len(rowspan)
                else:
                    a.pop("rowspan", None)
                if len(colspan) > 1:
                    a["colspan"] = len(colspan)
                else:
                    a.pop("colspan", None)
            grid[rowspan[0]][colspan[0]] = arr
    return grid


def _to_html(cap: str, header_rows: set[int], grid) -> str:
    html = "<table>"
    if cap:
        html += f"<caption>{cap}</caption>"
    for i in range(len(grid)):
        row = "<tr>"
        texts = []
        for arr in grid[i]:
            if arr is None:
                continue
            if not arr:
                row += "<td></td>" if i not in header_rows else "<th></th>"
                continue
            h = min(min(c["bottom"] - c["top"] for c in arr) / 2, 10)
            txt = " ".join(c["text"] for c in sort_y_first(arr, h))
            texts.append(txt)
            sp = ""
            if arr[0].get("colspan"):
                sp = "colspan={}".format(arr[0]["colspan"])
            if arr[0].get("rowspan"):
                sp += " rowspan={}".format(arr[0]["rowspan"])
            cell_tag = "th" if i in header_rows else "td"
            row += f"<{cell_tag} {sp} >" + txt + f"</{cell_tag}>"
        if i in header_rows:
            if all(t in header_rows for t in texts):
                continue
            for t in texts:
                header_rows.add(t)
        html += "\n" + (row + "</tr>" if row != "<tr>" else "")
    html += "\n</table>"
    return html


def _to_row_text(cap: str, header_rows: set[int], grid, is_english: bool) -> list[str]:
    """Field-labeled row descriptions ("hdr：val; ...") with multi-row
    header composition (tsr.py:400-501)."""
    n_cols, n_rows = len(grid[0]), len(grid)
    headers: dict[int, list[str]] = {}
    last_header: list[str] = []
    glue = " for " if is_english else "的"
    for r in sorted(header_rows):
        headers[r] = ["" for _ in range(n_cols)]
        for i in range(n_cols):
            if not grid[r][i]:
                continue
            headers[r][i] = " ".join(a["text"].strip() for a in grid[r][i])
        if all(not t for t in headers[r]):
            del headers[r]
            header_rows.discard(r)
            continue
        for j in range(n_cols):
            if headers[r][j]:
                continue
            if j >= len(last_header):
                break
            headers[r][j] = last_header[j]
        last_header = headers[r]
    for i in range(n_rows):
        if i not in header_rows:
            continue
        for j in range(i + 1, n_rows):
            if j not in header_rows:
                break
            for k in range(n_cols):
                if not headers[j - 1][k]:
                    continue
                if headers[j][k].find(headers[j - 1][k]) >= 0:
                    continue
                if len(headers[j][k]) > len(headers[j - 1][k]):
                    headers[j][k] += (glue if headers[j][k] else "") + headers[j - 1][k]
                else:
                    headers[j][k] = (
                        headers[j - 1][k]
                        + (glue if headers[j - 1][k] else "")
                        + headers[j][k]
                    )

    row_txt: list[str] = []
    for i in range(n_rows):
        if i in header_rows:
            continue
        fields: list[str] = []
        r = 0
        if headers:
            above = [(i - r, r) for r in headers if r < i]
            if above:
                _, r = min(above, key=lambda x: x[0])
        if r not in headers and n_cols <= 2:
            for j in range(n_cols):
                if not grid[i][j]:
                    continue
                txt = "".join(a["text"].strip() for a in grid[i][j])
                if txt:
                    fields.append(txt)
            if fields:
                joined = "：".join(fields)
                if row_txt and len(row_txt[-1]) + len(joined) < 64:
                    row_txt[-1] += "\n" + joined
                else:
                    row_txt.append(joined)
            continue
        for j in range(n_cols):
            if not grid[i][j]:
                continue
            txt = "".join(a["text"].strip() for a in grid[i][j])
            if not txt:
                continue
            label = headers[r][j] if r in headers else ""
            if label:
                label += "："
            label += txt
            if label:
                fields.append(label)
        if fields:
            row_txt.append("; ".join(fields))

    if cap:
        source = " in " if is_english else "来自"
        row_txt = [t + f"\t——{source}“{cap}”" for t in row_txt]
    return row_txt
