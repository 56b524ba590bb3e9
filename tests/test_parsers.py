"""Unit tests: per-format parsers."""

import json

from ragflow_ray.parsers import (
    extract_main_text,
    extract_tables_and_remainder,
    md_table_to_html,
    parse_docx_spans,
    parse_html,
    parse_json,
    parse_markdown,
    parse_txt,
)


class TestTxt:
    def test_single_small(self):
        assert parse_txt("hello world", 128) == ["hello world"]

    def test_delimiters_dropped(self):
        out = parse_txt("a!b?c", 128)
        assert out == ["abc"]

    def test_budget_opens_new_chunk(self):
        text = "\n".join("word " * 40 for _ in range(10))
        out = parse_txt(text, 30)
        assert len(out) > 1

    def test_escaped_delimiter(self):
        # literal backslash-n in the config decodes to newline
        out = parse_txt("a\nb", 128, r"\n")
        assert out == ["ab"]

    def test_type_error(self):
        import pytest

        with pytest.raises(TypeError):
            parse_txt(b"bytes", 128)


class TestHtml:
    HTML = (
        "<html><head><title>My Page</title></head><body>"
        '<nav><a href="/">Home</a><a href="/x">X</a><a href="/y">Y</a></nav>'
        "<article><p>First main paragraph, long enough to score properly for extraction.</p>"
        "<p>Second main paragraph, also long enough, with commas, to add points.</p></article>"
        '<footer><a href="/c">contact</a></footer></body></html>'
    )

    def test_title_first_line(self):
        assert parse_html(self.HTML)[0] == "My Page"

    def test_main_content_kept(self):
        joined = "\n".join(parse_html(self.HTML))
        assert "First main paragraph" in joined
        assert "Second main paragraph" in joined

    def test_boilerplate_stripped(self):
        joined = "\n".join(parse_html(self.HTML))
        assert "Home" not in joined
        assert "contact" not in joined

    def test_roundtrip_article_text(self):
        paras = [f"Paragraph number {i}, with plenty of words to score." for i in range(8)]
        html = (
            "<html><head><title>T</title></head><body><nav>"
            + "".join(f'<a href="/{i}">link {i}</a>' for i in range(6))
            + "</nav><article>"
            + "".join(f"<p>{p}</p>" for p in paras)
            + '</article><div class="sidebar">'
            + "".join(f'<a href="/s{i}">side {i}</a>' for i in range(6))
            + "</div></body></html>"
        )
        title, content = extract_main_text(html)
        assert content.split("\n") == paras

    def test_entities_unescaped(self):
        html = "<html><body><article><p>A &amp; B, plus enough words to pass the length filter.</p></article></body></html>"
        _, content = extract_main_text(html)
        assert "A & B" in content


class TestMarkdown:
    def test_border_table_extracted(self):
        md = "before\n\n| a | b |\n|---|---|\n| 1 | 2 |\n\nafter"
        remainder, tables = extract_tables_and_remainder(md + "\n")
        assert len(tables) == 1
        assert "| a | b |" in tables[0]
        assert "after" in remainder

    def test_html_table_extracted(self):
        md = "x\n<table><tr><td>1</td></tr></table>\ny"
        _, tables = extract_tables_and_remainder(md + "\n")
        assert len(tables) == 1

    def test_heading_fusion(self):
        secs, _ = parse_markdown("# Head\nbody line\n")
        assert secs[0][0].startswith("# Head\nbody line")

    def test_table_to_html(self):
        html = md_table_to_html("| a | b |\n|---|---|\n| 1 | 2 |")
        assert "<th>a</th>" in html and "<td>1</td>" in html

    def test_inline_render_when_not_separated(self):
        md = "before\n\n| a | b |\n|---|---|\n| 1 | 2 |\n\nafter"
        remainder, tables = extract_tables_and_remainder(md + "\n", separate_tables=False)
        assert "<table>" in remainder
        # reference quirk kept: the rendered-inline copy is re-captured
        # by the HTML-table pass, so the table lands in `tables` twice
        assert len(tables) == 2


class TestJson:
    def test_small_object_single_chunk(self):
        out = parse_json('{"a": 1, "b": 2}')
        assert len(out) == 1
        assert json.loads(out[0]) == {"a": 1, "b": 2}

    def test_lists_become_index_dicts(self):
        out = parse_json('{"xs": [10, 20]}')
        assert json.loads(out[0]) == {"xs": {"0": 10, "1": 20}}

    def test_large_object_splits(self):
        obj = {f"key{i}": "v" * 200 for i in range(40)}
        out = parse_json(json.dumps(obj), max_chunk_size=500)
        assert len(out) > 1
        merged = {}
        for c in out:
            merged.update(json.loads(c))
        assert merged == obj

    def test_jsonl(self):
        out = parse_json('{"a": 1}\n{"b": 2}\n')
        assert len(out) == 2

    def test_invalid(self):
        assert parse_json("not json at all") == []


class TestDocx:
    def _doc(self):
        spans = [
            {"kind": "text", "text": json.dumps({"t": "Title Here", "style": "Heading 1"}), "media_ref": "", "offset": 0},
            {"kind": "text", "text": json.dumps({"t": "intro para", "style": ""}), "media_ref": "", "offset": 1},
            {"kind": "media", "text": "", "media_ref": "media://d/0", "offset": 2},
            {"kind": "text", "text": json.dumps({"t": "Figure 1: a chart", "style": "Caption"}), "media_ref": "", "offset": 3},
            {"kind": "text", "text": json.dumps({"table": {"rows": [["h1", "h2"], ["a", "a"]]}}), "media_ref": "", "offset": 4},
        ]
        return spans

    def test_caption_pairs_with_preceding_image(self):
        lines, _ = parse_docx_spans(self._doc(), "mydoc")
        cap = [ln for ln in lines if ln[0].startswith("Figure 1")]
        assert cap and cap[0][1] == "media://d/0"

    def test_table_colspan_merge(self):
        _, tables = parse_docx_spans(self._doc(), "mydoc")
        assert "colspan='2'" in tables[0]

    def test_table_caption_heading_path(self):
        _, tables = parse_docx_spans(self._doc(), "mydoc")
        assert "Table Location: mydoc > Title Here" in tables[0]
