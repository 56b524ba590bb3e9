"""Email (.eml) chunker tests (reference rag/app/email.py:28-108)."""

from __future__ import annotations

from email.message import EmailMessage

from ragflow_ray.chunkers import ChunkConfig, chunk_document


def _eml_doc(msg: EmailMessage, doc_id: str = "m1") -> dict:
    raw = msg.as_bytes()
    return {
        "doc_id": doc_id,
        "fmt": "email",
        "spans": [
            {"kind": "text", "text": raw.decode("latin-1"), "media_ref": "",
             "offset": 0}
        ],
    }


def _base_msg() -> EmailMessage:
    msg = EmailMessage()
    msg["From"] = "alice@example.com"
    msg["To"] = "bob@example.com"
    msg["Subject"] = "quarterly sync"
    return msg


class TestEmailChunker:
    def test_headers_and_plain_body(self):
        msg = _base_msg()
        msg.set_content("hello bob\nsee the attached numbers")
        spans = chunk_document(_eml_doc(msg), "email", ChunkConfig(chunk_token_num=512))
        text = "\n".join(s["text"] for s in spans)
        assert "From: alice@example.com" in text
        assert "Subject: quarterly sync" in text
        assert "hello bob" in text and "see the attached numbers" in text

    def test_html_alternative_extracted(self):
        msg = _base_msg()
        msg.set_content("plain fallback body")
        msg.add_alternative(
            "<html><body><p>rich content paragraph with more words here"
            " to pass density</p></body></html>",
            subtype="html",
        )
        spans = chunk_document(_eml_doc(msg), "email", ChunkConfig(chunk_token_num=512))
        text = "\n".join(s["text"] for s in spans)
        # multipart/alternative walks into both branches
        assert "plain fallback body" in text
        assert "rich content paragraph" in text

    def test_txt_attachment_chunks(self):
        msg = _base_msg()
        msg.set_content("body line")
        msg.add_attachment(
            b"attachment alpha beta", maintype="text", subtype="plain",
            filename="notes.txt",
        )
        spans = chunk_document(_eml_doc(msg), "email", ChunkConfig(chunk_token_num=512))
        text = "\n".join(s["text"] for s in spans)
        assert "attachment alpha beta" in text

    def test_pdf_attachment_chunks(self):
        from tests.test_pdfbytes import make_pdf

        msg = _base_msg()
        msg.set_content("body line")
        msg.add_attachment(
            make_pdf([["pdf attachment line"]]),
            maintype="application", subtype="pdf", filename="doc.pdf",
        )
        spans = chunk_document(_eml_doc(msg), "email", ChunkConfig(chunk_token_num=512))
        text = "\n".join(s["text"] for s in spans)
        assert "pdf attachment line" in text

    def test_bad_attachment_skipped(self):
        msg = _base_msg()
        msg.set_content("body line")
        msg.add_attachment(
            b"\x00\x01garbage", maintype="application", subtype="octet-stream",
            filename="blob.bin",
        )
        spans = chunk_document(_eml_doc(msg), "email", ChunkConfig(chunk_token_num=512))
        text = "\n".join(s["text"] for s in spans)
        assert "body line" in text  # main content survives, blob ignored
