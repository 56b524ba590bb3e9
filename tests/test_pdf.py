"""Unit tests: geometry kernels, layout assignment, box pipeline, tables."""

import json

from ragflow_ray.pdf import (
    DocBoxes,
    assign_layouts,
    construct_table,
    find_max_overlap,
    find_overlap_above,
    overlap_ratio,
    page_from_payload,
    sort_y_first,
)
from ragflow_ray.pdf.boxpipe import proj_match
from ragflow_ray.pdf.page_model import Page


def box(x0, top, x1, bottom, text="", pn=1, **kw):
    d = {"x0": x0, "top": top, "x1": x1, "bottom": bottom, "text": text, "page_number": pn}
    d.update(kw)
    return d


class TestGeometry:
    def test_sort_y_tolerance(self):
        a = box(100, 10, 200, 20, "right")
        b = box(10, 12, 90, 22, "left")
        out = sort_y_first([a, b], threshold=5)
        assert [o["text"] for o in out] == ["left", "right"]

    def test_sort_y_no_tolerance(self):
        a = box(100, 10, 200, 20, "first")
        b = box(10, 12, 90, 22, "second")
        out = sort_y_first([a, b], threshold=0)
        assert [o["text"] for o in out] == ["first", "second"]

    def test_overlap_ratio(self):
        a = box(0, 0, 10, 10)
        b = box(5, 0, 15, 10)
        assert overlap_ratio(a, b) == 0.5
        assert overlap_ratio(a, box(20, 20, 30, 30)) == 0

    def test_find_max_overlap(self):
        grid = [box(0, i * 10, 100, i * 10 + 9) for i in range(10)]
        probe = box(10, 42, 60, 47)
        assert find_max_overlap(probe, grid) == 4

    def test_find_overlap_above_threshold(self):
        rows = [box(0, 0, 100, 10), box(0, 12, 100, 22)]
        probe = box(0, 13, 50, 21)
        assert find_overlap_above(probe, rows, thr=0.3) == 1
        assert find_overlap_above(box(0, 200, 10, 210), rows, thr=0.3) is None


class TestLayoutAssignment:
    def _page(self):
        boxes = [
            {"x0": 10, "x1": 500, "top": 50, "bottom": 62, "text": "body line one", "page_number": 1},
            {"x0": 10, "x1": 500, "top": 20, "bottom": 30, "text": "Running Header", "page_number": 1},
            {"x0": 250, "x1": 350, "top": 770, "bottom": 780, "text": "3 / 9", "page_number": 1},
        ]
        layouts = [
            {"type": "text", "score": 0.9, "x0": 5, "x1": 505, "top": 45, "bottom": 66, "page_number": 1},
            {"type": "header", "score": 0.9, "x0": 5, "x1": 505, "top": 15, "bottom": 35, "page_number": 1},
        ]
        return Page(1, 612, 792, boxes, layouts, [])

    def test_text_box_tagged(self):
        bxs, _ = assign_layouts([self._page()])
        tagged = [b for b in bxs if b["text"] == "body line one"]
        assert tagged and tagged[0]["layout_type"] == "text"
        assert tagged[0]["layoutno"].startswith("text-")

    def test_header_dropped(self):
        bxs, _ = assign_layouts([self._page()])
        assert all(b["text"] != "Running Header" for b in bxs)

    def test_garbage_text_dropped(self):
        bxs, _ = assign_layouts([self._page()])
        assert all(b["text"] != "3 / 9" for b in bxs)

    def test_drop_false_keeps_header(self):
        bxs, _ = assign_layouts([self._page()], drop=False)
        assert any(b["text"] == "Running Header" for b in bxs)

    def test_repeated_garbage_removed_globally(self):
        pages = [self._page(), self._page()]
        for p in pages:
            p.boxes = [dict(b) for b in p.boxes]
        bxs, _ = assign_layouts(pages)
        assert all(b["text"] != "Running Header" for b in bxs)


class TestConstructTable:
    def _table_boxes(self):
        # 2x3 grid with a header row; R tags present, C absent (live-path parity)
        bxs = []
        headers = ["name", "qty", "price"]
        for ci, h in enumerate(headers):
            bxs.append(box(ci * 100, 0, ci * 100 + 90, 10, h, R=0, H=0,
                           R_top=0, R_bott=10, layout_type="table"))
        for ri in range(2):
            for ci in range(3):
                bxs.append(box(ci * 100, 20 + ri * 20, ci * 100 + 90, 30 + ri * 20,
                               f"v{ri}{ci}", R=ri + 1, R_top=20 + ri * 20,
                               R_bott=30 + ri * 20, layout_type="table"))
        return bxs

    def test_html_table(self):
        html = construct_table(self._table_boxes(), is_english=True, html=True)
        assert html.startswith("<table>")
        assert "<th" in html and "name" in html
        assert "v00" in html and "v12" in html

    def test_desc_rows(self):
        rows = construct_table(self._table_boxes(), is_english=True, html=False)
        assert isinstance(rows, list)
        assert any("name：v00" in r or "name：v10" in r for r in rows)

    def test_caption_extracted(self):
        bxs = self._table_boxes()
        bxs.insert(0, box(0, -20, 300, -10, "Table 1: results",
                          layout_type="table caption"))
        html = construct_table(bxs, is_english=True, html=True)
        assert "<caption>Table 1: results</caption>" in html


class TestProjMatch:
    def test_ladder(self):
        assert proj_match("第一章 总则") == 1
        assert proj_match("1. Introduction here") == 5
        assert proj_match("1.2 Details follow") == 6
        assert proj_match("plain body text") is None
        assert proj_match("123 456.78%") is False


class TestDocBoxes:
    def _doc(self, payload_pages):
        pages = [page_from_payload(json.dumps(p)) for p in payload_pages]
        return DocBoxes("doc-test", pages, is_english=True)

    def _simple_page(self, pn=1, lines=None):
        lines = lines or ["first line of text", "second line of text"]
        boxes = [
            {"x0": 20, "x1": 500, "top": 50 + 18 * i, "bottom": 62 + 18 * i, "text": t}
            for i, t in enumerate(lines)
        ]
        layouts = [
            {"type": "text", "score": 0.9, "x0": 15, "x1": 505,
             "top": 45, "bottom": 62 + 18 * len(lines)}
        ]
        return {"page_no": pn, "width": 612, "height": 792, "boxes": boxes,
                "layouts": layouts, "tables": []}

    def test_cumulative_page_offset(self):
        doc = self._doc([self._simple_page(1), self._simple_page(2)])
        doc.run_layouts()
        p2 = [b for b in doc.boxes if b["page_number"] == 2]
        assert p2 and all(b["top"] > 792 for b in p2)

    def test_line_tag_roundtrip(self):
        doc = self._doc([self._simple_page(1)])
        doc.run_layouts()
        tag = doc.line_tag(doc.boxes[0])
        assert tag.startswith("@@1\t") and tag.endswith("##")
        from ragflow_ray.text.merge import strip_position_tags

        assert strip_position_tags(doc.boxes[0]["text"] + tag) == doc.boxes[0]["text"]

    def test_horizontal_merge(self):
        page = self._simple_page(1)
        # two fragments on the same visual row, same layout
        page["boxes"] = [
            {"x0": 20, "x1": 200, "top": 50, "bottom": 62, "text": "left part "},
            {"x0": 210, "x1": 400, "top": 50, "bottom": 62, "text": "right part"},
        ]
        doc = self._doc([page])
        doc.run_layouts()
        doc.merge_horizontal()
        assert len(doc.boxes) == 1
        assert doc.boxes[0]["text"] == "left part right part"

    def test_vertical_merge_joins_continuation(self):
        page = self._simple_page(1, ["this line ends with a comma,", "and this one continues it."])
        doc = self._doc([page])
        doc.run_layouts()
        doc.merge_vertical()
        assert len(doc.boxes) == 1

    def test_vertical_merge_respects_sentence_end(self):
        page = self._simple_page(1, ["This sentence ends here.", "A new one starts."])
        doc = self._doc([page])
        doc.run_layouts()
        doc.merge_vertical()
        assert len(doc.boxes) == 2

    def test_assemble_text_blocks_tags(self):
        doc = self._doc([self._simple_page(1)])
        doc.run_layouts()
        text = doc.assemble_text_blocks()
        assert "@@" in text and "##" in text


class TestCrossPageTable:
    def _doc(self):
        """A table whose halves sit on adjacent pages (FIXTURES F7)."""
        import json

        from ragflow_ray.pdf.page_model import page_from_payload

        def page(pn, rows, y0):
            boxes, layouts, comps = [], [], []
            layouts.append({"type": "table", "score": .9, "x0": 45, "x1": 355,
                            "top": y0 - 5, "bottom": y0 + 16 * len(rows) + 5})
            for ri, row in enumerate(rows):
                comps.append({"label": "table row", "score": .9, "x0": 50,
                              "x1": 350, "top": y0 + 16 * ri,
                              "bottom": y0 + 16 * ri + 14})
                for ci, cell in enumerate(row):
                    boxes.append({"x0": 50 + 100 * ci, "x1": 140 + 100 * ci,
                                  "top": y0 + 16 * ri + 1,
                                  "bottom": y0 + 16 * ri + 13, "text": cell})
            return {"page_no": pn, "width": 612, "height": 792,
                    "boxes": boxes, "layouts": layouts, "tables": [comps]}

        p1 = page(1, [["name", "qty"], ["alpha", "1"]], 760)   # bottom of page 1
        p2 = page(2, [["beta", "2"], ["gamma", "3"]], 30)      # top of page 2
        return [page_from_payload(json.dumps(p)) for p in (p1, p2)]

    def test_halves_merge_into_one_table(self):
        from ragflow_ray.pdf.boxpipe import DocBoxes

        doc = DocBoxes("cross", self._doc(), is_english=True)
        doc.run_layouts()
        doc.run_table_structure()
        doc.merge_horizontal()
        tables = doc.extract_tables_figures(need_figures=True, return_html=True)
        assert len(tables) == 1
        (_ref, html), _poss = tables[0]
        for cell in ("alpha", "beta", "gamma"):
            assert cell in html


class TestTwoColumnOrder:
    def test_left_column_precedes_right(self):
        from ragflow_ray.chunkers import chunk_document
        from ragflow_ray.sources.corpus import generate_document

        doc = generate_document("paper_pdf", 2)
        spans = chunk_document(doc, "paper")
        joined = "\n".join(s["text"] for s in spans if s["kind"] == "text")
        assert joined  # two-column reorder produced readable text


class TestSpanningCells:
    def test_colspan_resolved(self):
        """An SP-tagged cell whose span region (H_left..H_right) covers
        two established columns gets colspan=2 (tsr.py:503-587).

        Columns must be established by narrow cells *before* the
        spanning box in x-order — a wide first-in-column cell instead
        drags the running column edge and merges columns (reference
        behavior, C tags never assigned on the live path)."""
        bxs = []
        # header row: three narrow cells with C geometry
        for ci, h in enumerate(("a", "b", "c")):
            bxs.append(box(ci * 100, 0, ci * 100 + 90, 10, h, R=0, H=0,
                           R_top=0, R_bott=10, layout_type="table",
                           C_left=ci * 100, C_right=ci * 100 + 90, C=ci))
        # data row: narrow cell in col 0 whose span region covers cols 0-1
        bxs.append(box(0, 20, 90, 30, "span cell", R=1, SP=0,
                       R_top=20, R_bott=30, H_top=20, H_bott=30,
                       H_left=0, H_right=190, layout_type="table"))
        bxs.append(box(200, 20, 290, 30, "v2", R=1,
                       R_top=20, R_bott=30, layout_type="table"))
        # second data row fills all columns
        for ci in range(3):
            bxs.append(box(ci * 100, 40, ci * 100 + 90, 50, f"w{ci}", R=2,
                           R_top=40, R_bott=50, layout_type="table"))
        html = construct_table(bxs, is_english=True, html=True)
        assert "colspan=" in html
        assert "span cell" in html
