"""Template-chunker behavior tests over the synthetic corpus families."""

import pytest

from ragflow_ray.chunkers import ChunkConfig, chunk_document
from ragflow_ray.sources.corpus import FAMILIES, generate_document


@pytest.mark.parametrize("family", FAMILIES)
def test_every_family_chunks(family):
    doc = generate_document(family, 0)
    spans = chunk_document(doc, doc["template"])
    assert spans, f"{family} produced no spans"
    # orders are a dense 0..n-1 sequence
    assert [s["order"] for s in spans] == list(range(len(spans)))
    assert all(s["text"].strip() for s in spans)


@pytest.mark.parametrize("family", FAMILIES)
def test_determinism(family):
    doc1 = generate_document(family, 3)
    doc2 = generate_document(family, 3)
    a = chunk_document(doc1, doc1["template"])
    b = chunk_document(doc2, doc2["template"])
    assert a == b


class TestNaive:
    def test_txt_roundtrip_minus_delimiters(self):
        """Concatenated chunks == original text with delimiters removed —
        the invariant the sf-oracle checks via SQL."""
        import re

        doc = generate_document("txt", 1)
        text = doc["spans"][0]["text"]
        spans = chunk_document(doc, "naive", ChunkConfig(chunk_token_num=128,
                                                         delimiter="\n!?;。；！？"))
        joined = "".join(s["text"] for s in spans)
        assert joined == re.sub(r"[\n!?;。；！？]", "", text)

    def test_chunk_budget(self):
        from ragflow_ray.text.tokens import token_count

        doc = generate_document("txt", 2)
        cfg = ChunkConfig(chunk_token_num=64)
        spans = chunk_document(doc, "naive", cfg)
        # greedy packing overshoots by at most one section/fragment
        for s in spans[:-1]:
            assert token_count(s["text"]) < 64 * 3

    def test_html_has_no_boilerplate(self):
        doc = generate_document("html", 0)
        spans = chunk_document(doc, "naive")
        joined = "\n".join(s["text"] for s in spans)
        assert "copyright" not in joined
        assert "contact" not in joined

    def test_markdown_emits_tables(self):
        doc = generate_document("markdown", 0)
        spans = chunk_document(doc, "naive")
        kinds = {s["kind"] for s in spans}
        assert "table" in kinds and "text" in kinds

    def test_docx_table_before_text(self):
        doc = generate_document("docx", 0)
        spans = chunk_document(doc, "naive")
        kinds = [s["kind"] for s in spans]
        assert kinds.index("table") < kinds.index("text")


class TestPdfChunkers:
    def test_paper_sections(self):
        doc = generate_document("paper_pdf", 0)
        spans = chunk_document(doc, "paper")
        kinds = {s["kind"] for s in spans}
        assert "title" in kinds
        assert "abstract" in kinds
        assert "table" in kinds
        assert "text" in kinds

    def test_paper_abstract_text(self):
        doc = generate_document("paper_pdf", 0)
        spans = chunk_document(doc, "paper")
        ab = [s for s in spans if s["kind"] == "abstract"]
        assert ab and ab[0]["text"].startswith("abstract")
        assert "@@" not in ab[0]["text"]

    def test_paper_header_footer_dropped(self):
        doc = generate_document("paper_pdf", 0)
        spans = chunk_document(doc, "paper")
        joined = "\n".join(s["text"] for s in spans)
        assert "proc of synthetic conf" not in joined

    def test_paper_table_media_ref(self):
        doc = generate_document("paper_pdf", 0)
        spans = chunk_document(doc, "paper")
        tbl = [s for s in spans if s["kind"] == "table" and s["text"].startswith("<table>")]
        assert tbl and tbl[0]["media_ref"].startswith("crop://")

    def test_book_pdf_toc_heading_dropped(self):
        # the reference's prefix heuristic removes the TOC heading and
        # first entry; same-prefix "Chapter ..." entries survive
        # (pdf_parser.py:593-626) — full removal needs distinct
        # prefixes (see tests/test_text.py::TestTocStrip::test_cn_toc)
        doc = generate_document("book_pdf", 0)
        spans = chunk_document(doc, "book")
        joined = "\n".join(s["text"] for s in spans)
        assert "Contents" not in joined

    def test_one_single_span(self):
        doc = generate_document("paper_pdf", 0)
        spans = chunk_document(doc, "one")
        assert len(spans) == 1
        assert spans[0]["kind"] == "text"


class TestBookLaws:
    def test_book_hierarchical_keeps_chapters(self):
        doc = generate_document("book_txt", 0)
        spans = chunk_document(doc, "book")
        joined = "\n".join(s["text"] for s in spans)
        assert "Chapter" in joined or "第" in joined

    def test_book_toc_heading_removed(self):
        doc = generate_document("book_txt", 0)
        spans = chunk_document(doc, "book")
        joined = "\n".join(s["text"] for s in spans)
        assert "Contents" not in joined and "目录" not in joined

    def test_cn_book_toc_fully_removed(self):
        # CN entries 第一章/第二章 differ within 3 chars → the prefix
        # scan pops the whole TOC block
        for i in range(12):
            doc = generate_document("book_txt", i)
            text = doc["spans"][0]["text"]
            if not text.startswith("目录"):
                continue
            spans = chunk_document(doc, "book")
            joined = "\n".join(s["text"] for s in spans)
            assert "……" not in joined and "........ " not in joined
            return
        raise AssertionError("no zh book_txt doc in first 12 indices")

    def test_laws_articles_grouped_under_chapters(self):
        doc = generate_document("laws_txt", 0)
        spans = chunk_document(doc, "laws")
        # every chunk with an Article/条 carries its chapter ancestor
        for s in spans:
            first = s["text"].split("\n")[0]
            assert first.startswith(("第", "PART", "Article", "Chapter")) or s["kind"] != "text"

    def test_unknown_template_raises(self):
        doc = generate_document("txt", 0)
        with pytest.raises(KeyError):
            chunk_document(doc, "nope")
