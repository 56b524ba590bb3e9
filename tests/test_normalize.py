"""Scalar normalizer parity tests (rmSpace / strQ2B / tradi2simp /
find_codec — reference file:line cited in ragflow_ray/text/normalize.py)."""

from __future__ import annotations

import pytest

from ragflow_ray.text.normalize import (
    find_codec,
    get_text,
    rm_space,
    str_q2b,
    tradi2simp,
)


class TestRmSpace:
    def test_cjk_despacing(self):
        assert rm_space("中文 分词 的 空格") == "中文分词的空格"

    def test_latin_words_keep_gap(self):
        assert rm_space("hello world") == "hello world"

    def test_mixed(self):
        # space after CJK char collapses; space between latin words stays
        assert rm_space("数据 value 表格") == "数据value表格"
        assert rm_space("中 文 a b 中") == "中文 a b中"

    def test_paren_quirk(self):
        # reference keeps a space after ')' (it's in the left-guard class)
        assert rm_space("A) b") == "A) b"

    def test_multi_space(self):
        assert rm_space("a  b") == "a b"


class TestStrQ2B:
    def test_fullwidth_ascii(self):
        assert str_q2b("ＡＢＣ１２３") == "ABC123"

    def test_ideographic_space(self):
        assert str_q2b("ａ　ｂ") == "a b"

    def test_cjk_passthrough(self):
        assert str_q2b("中文ＦＵＬＬ") == "中文FULL"

    def test_plain_unchanged(self):
        assert str_q2b("plain ascii") == "plain ascii"


class TestTradi2Simp:
    def test_common_chars(self):
        assert tradi2simp("萬國電話") == "万国电话"
        assert tradi2simp("臺灣鐵路") == "台湾铁路"
        assert tradi2simp("學習機器") == "学习机器"

    def test_ascii_passthrough(self):
        assert tradi2simp("abc 123") == "abc 123"

    def test_simplified_unchanged(self):
        assert tradi2simp("已经是简体") == "已经是简体"


class TestFindCodec:
    def test_utf8_first(self):
        assert find_codec(b"hello world") == "utf-8"
        assert find_codec("中文".encode("utf-8")) == "utf-8"

    def test_gbk_family(self):
        # gb2312 precedes gbk in the ladder and decodes common chars
        assert find_codec("中文测试".encode("gbk")) in ("gb2312", "gbk")

    def test_ladder_quirk_non_utf8_bytes(self):
        # a latin-1 blob with high bytes: utf-8 fails, the ladder walks
        # on (the reference lands on utf_16 for even-length blobs — a
        # pinned quirk of the codec ordering, kept as-is)
        blob = "café au lait".encode("latin-1")
        assert find_codec(blob) == "utf_16"

    def test_get_text_roundtrip(self):
        assert get_text("中文内容".encode("utf-8")) == "中文内容"
        assert get_text(b"plain") == "plain"


@pytest.mark.usefixtures("ray_session")
class TestIngest:
    def test_read_text_files(self, tmp_path):
        (tmp_path / "a.txt").write_bytes("line one\nline two".encode("utf-8"))
        (tmp_path / "b.html").write_bytes(
            "<html><body><p>中文页面内容在此处展开并继续</p></body></html>".encode("utf-8")
        )
        from ragflow_ray.sources.ingest import read_text_files

        rows = {r["doc_id"]: r for r in read_text_files(str(tmp_path)).take_all()}
        assert rows["a.txt"]["fmt"] == "txt"
        assert rows["a.txt"]["spans"][0]["text"] == "line one\nline two"
        assert rows["b.html"]["fmt"] == "html"
        assert "中文页面内容" in rows["b.html"]["spans"][0]["text"]

    def test_ingest_then_extract(self, tmp_path):
        (tmp_path / "doc.txt").write_bytes(b"alpha beta\ngamma delta")
        from ragflow_ray.chunkers import ChunkConfig, chunk_document
        from ragflow_ray.sources.ingest import read_text_files

        doc = read_text_files(str(tmp_path)).take_all()[0]
        doc["spans"] = list(doc["spans"])
        spans = chunk_document(doc, "naive", ChunkConfig(chunk_token_num=64))
        assert spans and "alpha beta" in spans[0]["text"]

    def test_ingest_real_pdf(self, tmp_path):
        """A real (self-written) PDF ingests through the text-layer
        extractor into the plain extraction path end-to-end."""
        from tests.test_pdfbytes import make_pdf
        from ragflow_ray.chunkers import ChunkConfig, chunk_document
        from ragflow_ray.sources.ingest import read_text_files

        (tmp_path / "doc.pdf").write_bytes(
            make_pdf([["first page line one", "line two"], ["second page text"]])
        )
        doc = read_text_files(str(tmp_path)).take_all()[0]
        assert doc["fmt"] == "pdf" and doc["n_media"] == 2
        doc["spans"] = [dict(s) for s in doc["spans"]]
        spans = chunk_document(doc, "naive", ChunkConfig(layout_mode="plain"))
        text = "".join(s["text"] for s in spans)
        assert "first page line one" in text and "second page text" in text
