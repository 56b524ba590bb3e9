"""Tests for the qa / table / manual / presentation chunkers."""

from ragflow_ray.chunkers import ChunkConfig, chunk_document
from ragflow_ray.chunkers.qa import qa_pairs_from_lines, qa_pairs_from_markdown
from ragflow_ray.chunkers.table import column_data_type
from ragflow_ray.sources.corpus import generate_document


class TestQa:
    def test_tab_pairs(self):
        pairs = qa_pairs_from_lines(["q one\ta one", "q two\ta two"])
        assert pairs == [("q one", "a one"), ("q two", "a two")]

    def test_continuation_extends_answer(self):
        pairs = qa_pairs_from_lines(["q1\ta1", "more answer", "q2\ta2"])
        assert pairs[0] == ("q1", "a1\nmore answer")

    def test_comma_fallback(self):
        pairs = qa_pairs_from_lines(["q one,a one", "q two,a two"])
        assert len(pairs) == 2

    def test_markdown_heading_stack(self):
        lines = ["# Topic", "## Sub", "answer body", "## Sub2", "other body"]
        pairs = qa_pairs_from_markdown(lines)
        assert pairs[0][0] == "Topic\nSub"
        assert "answer body" in pairs[0][1]
        assert pairs[1][0] == "Topic\nSub2"

    def test_code_fence_suspends_headings(self):
        lines = ["# Q", "```", "# not a heading", "```", "real answer"]
        pairs = qa_pairs_from_markdown(lines)
        assert len(pairs) == 1
        assert "# not a heading" in pairs[0][1]

    def test_chunker_output(self):
        doc = generate_document("qa_txt", 0)
        spans = chunk_document(doc, "qa", ChunkConfig(lang="English"))
        assert spans
        assert all(s["kind"] == "qa" for s in spans)
        assert all(s["text"].startswith("Question: ") for s in spans)
        # role prefixes are stripped from pair bodies
        assert all("Question: Q:" not in s["text"] for s in spans)


class TestTable:
    def test_column_typing(self):
        vals, ty = column_data_type(["1", "2", "33"])
        assert ty == "int" and vals == [1, 2, 33]
        vals, ty = column_data_type(["1.5", "2.25", "3.125"])
        assert ty == "float"
        _, ty = column_data_type(["yes", "no", "yes"])
        assert ty == "bool"
        _, ty = column_data_type(["hello world", "more text", "and more"])
        assert ty == "text"

    def test_row_chunks(self):
        doc = generate_document("table_tsv", 0)
        spans = chunk_document(doc, "table")
        assert spans
        assert all(s["kind"] == "row" for s in spans)
        assert all("name:" in s["text"] for s in spans)

    def test_header_count_matches_rows(self):
        doc = generate_document("table_tsv", 1)
        n_rows = len(doc["spans"][0]["text"].split("\n")) - 1
        spans = chunk_document(doc, "table")
        assert len(spans) == n_rows


class TestManual:
    def test_runs_on_pdf_family(self):
        doc = generate_document("manual_pdf", 0)
        spans = chunk_document(doc, "manual")
        assert spans
        kinds = {s["kind"] for s in spans}
        assert "text" in kinds and "table" in kinds

    def test_no_position_tags_in_output(self):
        doc = generate_document("manual_pdf", 0)
        spans = chunk_document(doc, "manual")
        assert all("@@" not in s["text"] for s in spans if s["kind"] == "text")


class TestPresentation:
    def test_one_chunk_per_slide(self):
        doc = generate_document("slides", 0)
        spans = chunk_document(doc, "presentation")
        n_slides = len([s for s in doc["spans"] if s["kind"] == "media"])
        assert len(spans) == n_slides
        assert all(s["kind"] == "slide" for s in spans)
        assert all(s["media_ref"].startswith("media://") for s in spans)

    def test_pdf_pages_as_slides(self):
        doc = generate_document("paper_pdf", 0)
        spans = chunk_document(doc, "presentation")
        n_pages = len([s for s in doc["spans"] if s["kind"] == "media"])
        assert len(spans) == n_pages


class TestExcel:
    def test_row_lines(self):
        doc = generate_document("excel", 0)
        spans = chunk_document(doc, "naive")
        assert spans
        assert "：" in spans[0]["text"]

    def test_html4excel(self):
        doc = generate_document("excel", 0)
        spans = chunk_document(doc, "naive", ChunkConfig(html4excel=True))
        assert spans and spans[0]["text"].startswith("<table><caption>")

    def test_one_template(self):
        doc = generate_document("excel", 0)
        spans = chunk_document(doc, "one")
        assert len(spans) == 1 and "<table>" in spans[0]["text"]


class TestPlainLayoutMode:
    def test_naive_plain_keeps_header_footer(self):
        # PlainParser has no layout model: garbage survives by design
        doc = generate_document("paper_pdf", 0)
        spans = chunk_document(doc, "naive", ChunkConfig(layout_mode="plain"))
        joined = "\n".join(s["text"] for s in spans)
        assert "proc of synthetic conf" in joined

    def test_book_laws_plain_run(self):
        doc = generate_document("book_pdf", 0)
        for t in ("book", "laws"):
            spans = chunk_document(doc, t, ChunkConfig(layout_mode="plain"))
            assert spans

    def test_deepdoc_vs_plain_differ(self):
        doc = generate_document("paper_pdf", 0)
        a = chunk_document(doc, "naive")
        b = chunk_document(doc, "naive", ChunkConfig(layout_mode="plain"))
        assert a != b


class TestQaPdf:
    def _doc(self, n_questions=4):
        import json

        boxes, layouts = [], []
        y = 50.0
        for i in range(1, n_questions + 1):
            boxes.append({"x0": 50, "x1": 400, "top": y, "bottom": y + 12,
                          "text": f"{i}. What is topic {i}?"})
            layouts.append({"type": "text", "score": .9, "x0": 45, "x1": 405,
                            "top": y - 3, "bottom": y + 15})
            y += 24
            boxes.append({"x0": 70, "x1": 400, "top": y, "bottom": y + 12,
                          "text": f"Answer body number {i}."})
            layouts.append({"type": "text", "score": .9, "x0": 65, "x1": 405,
                            "top": y - 3, "bottom": y + 15})
            y += 24
        payload = json.dumps({"page_no": 1, "width": 612, "height": 792,
                              "boxes": boxes, "layouts": layouts, "tables": []})
        return {"doc_id": "qa-pdf-t", "fmt": "pdf",
                "spans": [{"kind": "media", "text": payload,
                           "media_ref": "m", "offset": 0}]}

    def test_pairs_extracted(self):
        from ragflow_ray.chunkers.qa import qa_pairs_from_pdf

        pairs, _ = qa_pairs_from_pdf(self._doc(4))
        # reference quirk: the synthetic initial last_box adopts the
        # first box's coords, so question 1 is always rejected by the
        # indent heuristic (rag/nlp/__init__.py:96-103)
        assert len(pairs) == 3
        assert pairs[0][0].startswith("2.")
        assert "Answer body number 2." in pairs[0][1]

    def test_unrecognized_structure_raises(self):
        import json

        import pytest

        from ragflow_ray.chunkers.qa import qa_pairs_from_pdf

        payload = json.dumps({"page_no": 1, "width": 612, "height": 792,
                              "boxes": [{"x0": 50, "x1": 400, "top": 50,
                                         "bottom": 62, "text": "plain text"}],
                              "layouts": [{"type": "text", "score": .9, "x0": 45,
                                           "x1": 405, "top": 47, "bottom": 65}],
                              "tables": []})
        doc = {"doc_id": "x", "fmt": "pdf",
               "spans": [{"kind": "media", "text": payload, "media_ref": "m",
                          "offset": 0}]}
        with pytest.raises(ValueError):
            qa_pairs_from_pdf(doc)


class TestNumbers:
    def test_index_int_chain(self):
        from ragflow_ray.text.numbers import index_int

        assert index_int("17") == 17
        assert index_int("SEVEN") == 7
        assert index_int("二十一") == 21
        assert index_int("XIV") == 14
        assert index_int("junk") == -1


class TestManualOutlines:
    def test_outline_channel_sets_levels(self):
        """When page payloads carry PDF outlines covering >3% of
        sections, the manual chunker pivots on outline levels instead
        of bullet voting."""
        import json

        boxes, layouts = [], []
        headings = [("Overview of merges", 1), ("Details of sorting", 1)]
        y = 50.0
        outline = [[t, lvl] for t, lvl in headings]
        for t, _ in headings:
            boxes.append({"x0": 50, "x1": 400, "top": y, "bottom": y + 14, "text": t})
            layouts.append({"type": "title", "score": .9, "x0": 45, "x1": 405,
                            "top": y - 3, "bottom": y + 17})
            y += 26
            for _ in range(3):
                boxes.append({"x0": 50, "x1": 450, "top": y, "bottom": y + 12,
                              "text": "Body line with plain prose content here."})
                layouts.append({"type": "text", "score": .9, "x0": 45, "x1": 455,
                                "top": y - 3, "bottom": y + 15})
                y += 24
        payload = json.dumps({"page_no": 1, "width": 612, "height": 792,
                              "boxes": boxes, "layouts": layouts, "tables": [],
                              "outlines": outline})
        doc = {"doc_id": "m-out", "fmt": "pdf",
               "spans": [{"kind": "media", "text": payload, "media_ref": "m",
                          "offset": 0}]}
        spans = chunk_document(doc, "manual")
        assert spans
        joined = "\n".join(s["text"] for s in spans)
        assert "Overview of merges" in joined and "Details of sorting" in joined


class TestQaDocxExcel:
    """Round-2 qa paths (reference qa.py:36-76 Excel, :184-260 Docx)."""

    @staticmethod
    def _para(t, style="", offset=0):
        import json

        return {"kind": "text", "text": json.dumps({"t": t, "style": style}),
                "media_ref": "", "offset": offset}

    def test_docx_heading_stack(self):
        from ragflow_ray.chunkers import ChunkConfig
        from ragflow_ray.chunkers.qa import chunk_qa

        spans = [
            self._para("What is Ray?", "Heading 1", 0),
            self._para("A distributed runtime.", "", 1),
            self._para("What is Ray Data?", "Heading 2", 2),
            self._para("Datasets on Ray.", "", 3),
            self._para("What is Arrow?", "Heading 1", 4),
            self._para("A columnar format.", "", 5),
        ]
        doc = {"doc_id": "d1", "fmt": "docx", "spans": spans}
        out = chunk_qa(doc, ChunkConfig())
        texts = [s["text"] for s in out]
        # "A " is stripped by the role-prefix regex (reference rmPrefix quirk)
        assert texts[0] == "Question: What is Ray?\tAnswer: distributed runtime."
        # nested question keeps its ancestor in the stack
        assert texts[1] == ("Question: What is Ray?\nWhat is Ray Data?"
                            "\tAnswer: Datasets on Ray.")
        assert texts[2] == "Question: What is Arrow?\tAnswer: columnar format."

    def test_docx_tables_first_and_media_ref(self):
        import json

        from ragflow_ray.chunkers import ChunkConfig
        from ragflow_ray.chunkers.qa import chunk_qa

        spans = [
            self._para("Setup heading", "Heading 1", 0),
            {"kind": "media", "text": "", "media_ref": "media://d/img1", "offset": 1},
            self._para("the answer text", "", 2),
            {"kind": "text",
             "text": json.dumps({"table": {"rows": [["a", "b"], ["1", "1"]]}}),
             "media_ref": "", "offset": 3},
        ]
        doc = {"doc_id": "d2", "fmt": "docx", "spans": spans}
        out = chunk_qa(doc, ChunkConfig())
        assert out[0]["kind"] == "table"
        assert "<td colspan='2'>1</td>" in out[0]["text"]
        assert out[1]["kind"] == "qa"
        assert out[1]["media_ref"] == "media://d/img1"
        assert out[1]["text"] == "Question: Setup heading\tAnswer: the answer text"

    def test_excel_pairs(self):
        import json

        from ragflow_ray.chunkers import ChunkConfig
        from ragflow_ray.chunkers.qa import chunk_qa

        payload = {"sheets": [{"name": "Sheet1", "rows": [
            ["What is X?", "X is a thing."],
            ["", "orphan answer"],            # no question -> dropped
            [None, "Q2?", "A2."],             # leading empty cell skipped
            ["only question"],                # no answer -> dropped
            [0, "Q3?", "A3."],                # falsy 0 skipped (reference quirk)
        ]}]}
        spans = [{"kind": "text", "text": json.dumps(payload),
                  "media_ref": "", "offset": 0}]
        doc = {"doc_id": "d3", "fmt": "excel", "spans": spans}
        out = chunk_qa(doc, ChunkConfig())
        texts = [s["text"] for s in out]
        assert texts == [
            "Question: What is X?\tAnswer: X is a thing.",
            "Question: Q2?\tAnswer: A2.",
            "Question: Q3?\tAnswer: A3.",
        ]


class TestTagChunker:
    """rag/app/tag.py parity: two-column pair parser, no LLM."""

    def _doc(self, text, fmt="txt"):
        return {"doc_id": "t1", "fmt": fmt, "spans": [
            {"kind": "text", "text": text, "media_ref": "", "offset": 0}]}

    def test_tab_pairs_with_leading_newline_quirk(self):
        from ragflow_ray.chunkers import ChunkConfig, chunk_document

        out = chunk_document(
            self._doc("apple\tfruit,red\nstone\tmineral"), "tag", ChunkConfig()
        )
        # reference's unconditional content += "\n" + q keeps a leading \n
        assert [s["text"] for s in out] == [
            "\napple\tfruit,red", "\nstone\tmineral"
        ]
        assert all(s["kind"] == "tag" for s in out)

    def test_garbage_lines_accumulate_into_content(self):
        from ragflow_ray.chunkers import ChunkConfig, chunk_document

        out = chunk_document(
            self._doc("preamble line\napple\tfruit\ntrailing orphan"),
            "tag", ChunkConfig(),
        )
        # garbage joins the NEXT pair's content; trailing orphan is dropped
        assert [s["text"] for s in out] == ["\npreamble line\napple\tfruit"]

    def test_comma_delimiter_vote_and_dot_cleanup(self):
        from ragflow_ray.chunkers import ChunkConfig, chunk_document

        out = chunk_document(
            self._doc("apple,core.fruit\nstone,v1.2"), "tag", ChunkConfig()
        )
        # comma wins 2-0; dots in tags become underscores (beAdoc)
        assert [s["text"] for s in out] == [
            "\napple\tcore_fruit", "\nstone\tv1_2"
        ]

    def test_tab_wins_vote_ties(self):
        from ragflow_ray.chunkers.tag import tag_pairs_from_lines

        pairs = tag_pairs_from_lines(["a\tx", "b,y"])  # 1-1 tie -> tab
        assert pairs == [("\na", "x")]

    def test_csv_quoted_fields(self):
        from ragflow_ray.chunkers import ChunkConfig, chunk_document

        out = chunk_document(
            self._doc('"apple, inc","tech, big.co"\nplain,simple', fmt="csv"),
            "tag", ChunkConfig(),
        )
        # the tags cell itself splits on comma: two tags, dot cleaned
        assert [s["text"] for s in out] == [
            "\napple, inc\ttech,big_co", "\nplain\tsimple"
        ]

    def test_excel_path(self):
        import json

        from ragflow_ray.chunkers import ChunkConfig, chunk_document

        payload = {"sheets": [{"name": "S", "rows": [
            ["content a", "t1,t2.x"], ["", "orphan"], ["content b", "t3"],
        ]}]}
        doc = {"doc_id": "t2", "fmt": "excel", "spans": [
            {"kind": "text", "text": json.dumps(payload),
             "media_ref": "", "offset": 0}]}
        out = chunk_document(doc, "tag", ChunkConfig())
        # excel path has no leading-\n accumulation (qa.Excel pairing)
        assert [s["text"] for s in out] == [
            "content a\tt1,t2_x", "content b\tt3"
        ]


class TestAnalyticSpanCounts:
    """The corpus_extract fixture's analytic families (r3 verdict task
    7, extended through r5): for table_tsv / slides / qa_txt /
    laws_txt / excel / qa_pdf / html / markdown / book_txt / docx /
    txt / json the span count is derivable from the INPUT alone, so
    the pinned-golden surface shrinks — these rows prove 'is right',
    not 'didn't change'.  Only the three box-pipeline PDF families
    (paper_pdf / book_pdf / manual_pdf) remain pinned."""

    def test_models_match_engine_across_corpus(self):
        from ragflow_ray.chunkers import ChunkConfig, chunk_document
        from ragflow_ray.sources.corpus import generate_corpus
        from tools.make_extract_fixtures import analytic_n_spans

        docs = generate_corpus(150)
        checked = 0
        for d in docs:
            expect = analytic_n_spans(d)
            if expect is None:
                continue
            spans = chunk_document(d, d["template"], ChunkConfig())
            assert len(spans) == expect, d["doc_id"]
            checked += 1
        # all twelve analytic families must actually occur
        assert checked >= 12 * (150 // len(
            __import__("ragflow_ray.sources.corpus",
                       fromlist=["FAMILIES"]).FAMILIES))
